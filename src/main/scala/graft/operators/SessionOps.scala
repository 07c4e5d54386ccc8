package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the batch formulation of session windows:
  * consecutive events of one key belong to the same session while the gap
  * to the previous event stays under `gapUs`; a larger gap opens a new
  * session.
  *
  * Shape: ONE shuffle (window partitionBy key) and two running window
  * passes fused over the same sort — `lag` marks session starts,
  * a running sum numbers them (the classic gaps-and-islands rewrite; same
  * SQL runs in the DuckDB oracle). No state store, no iteration; the
  * streaming twin is `session_window` in Structured Streaming, this is
  * the backfill/batch path over the same data.
  *
  * Timestamps compare in exact integer MICROSECONDS (`unix_micros` here,
  * `epoch_us` in DuckDB) — no float seconds, no truncation mismatch. NTZ
  * inputs are cast (session-timezone epoch shift cancels: every emitted
  * quantity — gap flags, session numbers, spans — is a DIFFERENCE).
  */
object SessionOps {

  /** Per-event session assignment: adds `session` (1-based per key, in
    * time order) to the input's key/ts projection.
    */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
      gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol))
    val run = Window.partitionBy(keyCol).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("_us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("_new",
        (lag(col("_us"), 1).over(w).isNull ||
          col("_us") - lag(col("_us"), 1).over(w) > gapUs).cast("long"))
      .withColumn("session", sum(col("_new")).over(run))
      .drop("_us", "_new")
  }

  /** Session-level rollup: events, span, and value mass per (key, session).
    * Span is exact integer microseconds (0 for single-event sessions).
    */
  def sessionSummary(events: DataFrame, keyCol: String, tsCol: String,
      gapUs: Long): DataFrame =
    sessionize(events, keyCol, tsCol, gapUs)
      .groupBy(col(keyCol), col("session"))
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros(col(tsCol).cast("timestamp"))) -
          min(unix_micros(col(tsCol).cast("timestamp")))).as("span_us"))
}
