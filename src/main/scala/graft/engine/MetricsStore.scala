package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rules.RuleSet

/** Cross-run validation-metrics table: one row per (run, rule) with the
  * run's violation count and corpus size, appended after each validation
  * run — the north-star "metrics persisted to a metrics table" made
  * queryable across runs. Where [[Checkpoint]]'s manifest answers "which
  * partitions of THIS run are done", the metrics table answers "how is
  * data quality MOVING run over run" — the trend a pipeline alerts on.
  *
  * Rows are zero-filled from the rule set (a rule with no violations
  * writes an explicit 0) so run-over-run deltas are total functions: a
  * rule that STOPPED firing shows a negative delta instead of a missing
  * join row.
  *
  * Scale shape: the appended frame is rule-cardinality (the caller's
  * `detailed` frame was already computed by the run's single rule pass);
  * the store itself is a tiny parquet append per run, and the trend query
  * reads only the metrics table — never the corpus.
  */
object MetricsStore {

  /** Append one run's per-rule metrics. `nRows` comes from the run's
    * existing row accounting (manifest / summary), not a fresh scan.
    */
  def append(spark: SparkSession, dir: String, runId: Long,
      snapshotId: Long, ruleSet: RuleSet, detailed: DataFrame,
      nRows: Long): Unit =
    appendIds(spark, dir, runId, snapshotId, ruleSet.rules.map(_.id),
      detailed, nRows)

  /** Same append anchored on an explicit rule-id list — the routed
    * lifecycle's form, where the suite spans several rule sets.
    */
  def appendIds(spark: SparkSession, dir: String, runId: Long,
      snapshotId: Long, ids: Seq[String], detailed: DataFrame,
      nRows: Long): Unit = {
    import spark.implicits._
    val ruleIds = ids.distinct.toDF("rule_id")
    val counts = detailed.groupBy("rule_id")
      .agg(count(lit(1)).as("n_violations"))
    ruleIds.join(counts, Seq("rule_id"), "left")
      .select(
        lit(runId).as("run_id"),
        lit(snapshotId).as("snapshot_id"),
        col("rule_id"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        lit(nRows).as("n_rows"))
      .coalesce(1)
      .write.mode("append").parquet(dir)
  }

  def history(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Run-over-run trend: per (run, rule) the current and previous counts,
    * their delta, and a `regressed` flag (rate strictly worsened). The lag
    * windows over per-RULE frames of run-cardinality rows — metrics-table
    * sized, corpus-free.
    */
  def trend(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byRule = Window.partitionBy("rule_id").orderBy("run_id")
    val rate = col("n_violations").cast("double") / col("n_rows")
    val prevRate = col("prev_violations").cast("double") / col("prev_rows")
    history(spark, dir)
      .withColumn("prev_violations", lag("n_violations", 1).over(byRule))
      .withColumn("prev_rows", lag("n_rows", 1).over(byRule))
      .select(
        col("run_id"), col("rule_id"), col("n_violations"),
        col("prev_violations"),
        (col("n_violations") - col("prev_violations")).as("delta"),
        when(col("prev_violations").isNull, lit(null).cast("boolean"))
          .otherwise(rate > prevRate).as("regressed"))
  }
}
