package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic token-sequence table `(doc_id, tokens, n_tok, source)`
  * derived from the driver's `lineitem.parquet` by pure arithmetic, so every
  * scalar fact about it is recomputable by the DuckDB oracle (FIXTURES.md §3).
  *
  * Violations are injected at fixed congruence classes of
  * `key = l_orderkey*7 + l_linenumber` (cf. FIXTURES.md §2):
  *   - key %  97 == 0  → `n_tok` off by one        (length-consistency rule)
  *   - key % 101 == 0  → collapsed `doc_id`         (uniqueness rule)
  *   - key % 103 == 0  → `source = 'bogus'`         (referential rule)
  *   - key % 107 == 0  → `tokens = NULL`            (not-null rule)
  *   - key % 109 == 0  → first token out of vocab   (token-bounds rule)
  *
  * Everything is a Catalyst expression over the scan — no driver-side data
  * generation — so the derivation itself distributes and scales with the
  * input (the 100 TB deployment would read the real pre-tokenized table and
  * skip this derivation entirely).
  */
object TokenTable {

  val Vocab = 50000

  /** Allowed values for `source` — the referential dimension (the analogue of
    * the reference's terminology-server value sets,
    * /root/reference/docker-compose.yml:32-46).
    */
  val AllowedSources: Seq[String] = Seq("A", "N", "R")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/lineitem.parquet")

  /** The token view. `snapshotFilter` carves deterministic sub-snapshots out
    * of the same table (used by the drift rule's baseline).
    */
  def tokens(spark: SparkSession, sfDir: String): DataFrame =
    fromLineitem(lineitem(spark, sfDir))

  /** Token view over an arbitrary lineitem slice (drift baselines carve
    * deterministic sub-snapshots by filtering the scan first).
    */
  def fromLineitem(li: DataFrame): DataFrame = {
    val key = (li("l_orderkey") * 7 + li("l_linenumber")).cast("bigint")
    val nTrue = li("l_quantity").cast("int")
    li.select(
      when(key % 101 === 0,
        concat(lit("dup-"), (li("l_orderkey") % 13).cast("string")))
        .otherwise(concat(li("l_orderkey").cast("string"), lit("-"),
          li("l_linenumber").cast("string")))
        .as("doc_id"),
      when(key % 107 === 0, lit(null))
        .otherwise(
          transform(sequence(lit(0), nTrue - 1), j =>
            when(j === 0 && key % 109 === 0,
              (lit(Vocab) + key % 7).cast("int"))
              .otherwise(((key * 31 + j * 17) % Vocab).cast("int"))))
        .as("tokens"),
      (nTrue + when(key % 97 === 0, lit(1)).otherwise(lit(0))).as("n_tok"),
      when(key % 103 === 0, lit("bogus")).otherwise(li("l_returnflag"))
        .as("source"))
  }

  /** DuckDB CTE producing the same scalar columns (token arrays included for
    * completeness; scalar oracles do not depend on them). Keep in lockstep
    * with [[tokens]].
    */
  val duckCte: String =
    """tok AS (
      |  SELECT
      |    CASE WHEN (l_orderkey*7 + l_linenumber) % 101 = 0
      |         THEN 'dup-' || CAST(l_orderkey % 13 AS VARCHAR)
      |         ELSE CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) END AS doc_id,
      |    CAST(l_quantity AS INT) + CASE WHEN (l_orderkey*7 + l_linenumber) % 97 = 0 THEN 1 ELSE 0 END AS n_tok,
      |    CASE WHEN (l_orderkey*7 + l_linenumber) % 103 = 0 THEN 'bogus' ELSE l_returnflag END AS source,
      |    (l_orderkey*7 + l_linenumber) AS key,
      |    CAST(l_quantity AS INT) AS n_true,
      |    ((l_orderkey*7 + l_linenumber) % 107 = 0) AS tokens_null,
      |    l_orderkey AS okey
      |  FROM lineitem
      |)""".stripMargin

  /** The allowed-source dimension as a DataFrame (broadcast-joined by the
    * referential rule; stand-in for an external dimension table).
    */
  def allowedDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    AllowedSources.toDF("allowed_source")
  }

  /** Closed-form replica of the generator for one row — the per-row
    * token-array-equality ground truth (BASELINE.json input_hint) checked by
    * the test suite against Spark's read-back of the same row.
    */
  def expectedTokens(orderkey: Long, linenumber: Int, quantity: Int): Option[Array[Int]] = {
    val key = orderkey * 7 + linenumber
    if (key % 107 == 0) None
    else Some(Array.tabulate(quantity) { j =>
      if (j == 0 && key % 109 == 0) (Vocab + key % 7).toInt
      else ((key * 31 + j * 17) % Vocab).toInt
    })
  }
}
