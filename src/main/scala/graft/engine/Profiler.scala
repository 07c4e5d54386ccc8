package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rules._

/** Constraint suggestion: profile a table and emit candidate rules — the
  * bootstrap path for onboarding a new source without a hand-written rule
  * set. The reference ships hand-authored StructureDefinition profiles
  * (the JSON files under /root/reference/fhir_profiles); at 10^12
  * sequences nobody
  * hand-writes per-source bounds, so the engine derives them: profile once,
  * review the suggestions, freeze them as the source's rule set. The
  * closure property (a table satisfies the rules suggested from itself —
  * see ProfilerSpec) is what makes the suggestions safe to freeze; they
  * then FAIL on future data that drifts outside the profiled envelope,
  * which is the point.
  *
  * Plan shape: ONE aggregate pass over the table computes every numeric
  * profile (min / max / null count) and the categorical distinct estimate
  * (`approx_count_distinct` — a sketch, so one pass regardless of
  * cardinality); only columns whose ESTIMATED cardinality clears
  * `dictionaryCap` get their exact dictionary collected in a second,
  * output-bounded aggregate. Both are map-side-combined hash aggregates —
  * total cost ~2 scans at any scale, and the suggestion table itself is
  * O(columns + small dictionaries).
  */
object Profiler {

  /** Suggested-rule rows `(rule_id, rule_type, column, lo, hi, values)`:
    * numeric columns yield a `not_null` suggestion (iff no nulls observed)
    * and a `range` over the observed [min, max]; categorical columns under
    * `dictionaryCap` estimated distincts yield a `value_set` with the
    * sorted dictionary, else a `cardinality` advisory row carrying the
    * estimate. The dictionary travels as an `array<string>` column —
    * NOT a joined string, so categorical values containing the separator
    * round-trip through [[compile]] intact (ADVICE r5). Everything is
    * derived distributed-side; the final frame is suggestion-sized.
    *
    * Degenerate inputs suggest nothing rather than something wrong
    * (ADVICE r5): an EMPTY table yields no rows at all (its "observed
    * envelope" is vacuous — a [0,0] range / unconditional not_null there
    * would reject every future row), and an all-null numeric column yields
    * no range (its min/max are NULL, not 0).
    */
  def suggest(df: DataFrame, numericCols: Seq[String],
      categoricalCols: Seq[String], dictionaryCap: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = Seq(count(lit(1)).as("__rows")) ++
      numericCols.flatMap { c =>
        Seq(min(col(c)).cast("long").as(s"__min_$c"),
          max(col(c)).cast("long").as(s"__max_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"))
      } ++
      categoricalCols.flatMap { c =>
        Seq(approx_count_distinct(col(c)).as(s"__adc_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"))
      }
    // one row; collect is O(columns) — config cardinality, not data
    val prof = df.agg(aggs.head, aggs.tail: _*).collect().head
    def l(n: String): Long = prof.getAs[Long](n)
    val nRows = l("__rows")

    // NOTE: a local type alias would defeat the TypeTag-driven product
    // encoder below, hence the spelled-out tuple type
    val numericRows: Seq[(String, String, String,
        Option[Long], Option[Long], Option[Seq[String]])] =
      if (nRows == 0L) Nil
      else numericCols.flatMap { c =>
        // min/max are NULL when the column is all-null: no range envelope
        // exists to freeze (getAs would silently unbox NULL to 0L)
        val allNull = prof.isNullAt(prof.fieldIndex(s"__min_$c"))
        val base: Seq[(String, String, String,
            Option[Long], Option[Long], Option[Seq[String]])] =
          if (allNull) Nil
          else Seq((s"range_$c", "range", c,
            Some(l(s"__min_$c")), Some(l(s"__max_$c")), None))
        if (l(s"__nulls_$c") == 0L)
          (s"not_null_$c", "not_null", c, None: Option[Long],
            None: Option[Long], None: Option[Seq[String]]) +: base
        else base
      }
    val catRows: Seq[(String, String, String,
        Option[Long], Option[Long], Option[Seq[String]])] =
      if (nRows == 0L) Nil
      else categoricalCols.flatMap { c =>
        val nn: Seq[(String, String, String,
            Option[Long], Option[Long], Option[Seq[String]])] =
          if (l(s"__nulls_$c") == 0L)
            Seq((s"not_null_$c", "not_null", c, None, None, None))
          else Nil
        if (l(s"__adc_$c") <= dictionaryCap) {
          // exact dictionary: output-bounded second aggregate
          val vals = df.select(col(c).cast("string").as("v"))
            .where(col("v").isNotNull)
            .distinct().orderBy("v").as[String].collect()
          nn :+ ((s"value_set_$c", "value_set", c, None: Option[Long],
            None: Option[Long], Some(vals.toSeq)))
        } else
          nn :+ ((s"cardinality_$c", "cardinality", c,
            Some(l(s"__adc_$c")), None: Option[Long],
            None: Option[Seq[String]]))
      }
    (numericRows ++ catRows)
      .toDF("rule_id", "rule_type", "column", "lo", "hi", "values")
      .orderBy("rule_id")
  }

  /** Compile suggestion rows into the engine's rule AST + dimensions — the
    * freeze step. `range` hi is observed-max INCLUSIVE, so the compiled
    * [[RangeRule]] gets `hi = max + 1` (RangeRule's hi is exclusive),
    * SATURATING at `Long.MaxValue` instead of overflowing (in that
    * degenerate envelope the single topmost value is excluded — the safe
    * direction: a too-tight rule flags, an overflowed one passes
    * everything); `value_set` becomes a [[ReferentialRule]] against a
    * generated broadcast dimension, read from the array column so values
    * containing commas survive. `cardinality` advisories don't compile
    * (they are for humans / drift monitors).
    */
  def compile(spark: SparkSession, suggestions: DataFrame)
      : (RuleSet, Map[String, DataFrame]) = {
    import spark.implicits._
    // suggestion-table cardinality collect (config-sized by construction)
    val rows = suggestions
      .select("rule_id", "rule_type", "column", "lo", "hi", "values")
      .collect()
    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    val dims = scala.collection.mutable.Map.empty[String, DataFrame]
    rows.foreach { r =>
      val (id, tpe, c) = (r.getString(0), r.getString(1), r.getString(2))
      tpe match {
        case "not_null" => rules += NotNullRule(id, c)
        case "range" =>
          val mx = r.getLong(4)
          val hi = if (mx == Long.MaxValue) Long.MaxValue else mx + 1L
          rules += RangeRule(id, c, r.getLong(3), hi)
        case "value_set" =>
          val dimName = s"dim_$c"
          dims(dimName) = r.getSeq[String](5).toDF("value")
          rules += ReferentialRule(id, c, dimName)
        case _ => () // cardinality advisories are not enforceable rules
      }
    }
    (RuleSet(s"suggested", rules.toSeq), dims.toMap)
  }
}
