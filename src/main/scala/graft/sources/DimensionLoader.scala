package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Value-set / code-system dimension ingestion — the engine analogue of the
  * reference loading terminology value sets from files into its termite
  * service (/root/reference/value_sets/README.md,
  * /root/reference/code_systems/README.md,
  * /root/reference/docker-compose.yml:32-46). Referential rules name a
  * dimension ([[graft.rules.ReferentialRule.dimension]]); this loader turns
  * user-supplied config into the `Map[String, DataFrame]` the engine
  * resolves those names against, replacing hardcoded dimensions end to end.
  *
  * Two shapes:
  *  - inline JSON (`{"valueSets": {"name": ["A","N"], ...}}`) for small
  *    enumerations — each becomes a 1-column local-relation DataFrame that
  *    the referential check broadcast-anti-joins (no scan, no shuffle);
  *  - a parquet table per dimension for LARGE code systems — these flow to
  *    [[graft.engine.Validator.referentialViolationsBigDim]]'s shuffle-join
  *    path (a 10⁸-code system must never be collected or broadcast).
  */
object DimensionLoader {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  /** Parse inline value sets: `{"valueSets": {"name": ["v1", "v2"], ...}}`.
    * Malformed bodies FAIL (same policy as
    * [[graft.rules.RuleSetLoader.parse]]): a typo'd value set must never
    * silently become an empty dimension that flags every row.
    */
  def parse(spark: SparkSession, json: String): Map[String, DataFrame] = {
    import spark.implicits._
    val root = JsonMethods.parse(json)
    (root \ "valueSets") match {
      case JObject(fields) => fields.map {
        case (name, JArray(vs)) =>
          val values = vs.map {
            case JString(s) => s
            case JInt(i)    => i.toString
            case other => throw new IllegalArgumentException(
              s"value set '$name': unsupported element $other")
          }
          name -> values.toDF(s"${name}_value")
        case (name, other) => throw new IllegalArgumentException(
          s"value set '$name' must be a JSON array, got: $other")
      }.toMap
      case JNothing => Map.empty
      case other => throw new IllegalArgumentException(
        s"valueSets must be a JSON object, got: $other")
    }
  }

  /** A large dimension stored as parquet: `column` is projected as the
    * membership key (first column convention of the referential join).
    * Stays a lazy scan — partition pruning / pushdown apply as usual.
    */
  def fromParquet(spark: SparkSession, path: String, column: String,
      name: String): DataFrame =
    spark.read.parquet(path).select(
      org.apache.spark.sql.functions.col(column).as(s"${name}_value"))
}
