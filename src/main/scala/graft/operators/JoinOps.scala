package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators beyond Spark's built-in equi/range joins.
  *
  * The headline is the backward AS-OF join — "for every left event, the
  * latest right event at or before it, per key" — the alignment primitive
  * behind feature lookups (latest profile snapshot per interaction),
  * slowly-changing-dimension reads, and metric attribution. Spark has no
  * native ASOF; the naive formulations both collapse at scale: a range
  * join (`l.key = r.key AND r.ts <= l.ts` + per-row max) explodes to
  * O(|matches|) intermediate rows, and a per-key `max_by` subquery scans
  * the right side once per left timestamp.
  */
object JoinOps {

  /** Backward as-of join via UNION + one running window — the
    * merge-sorted formulation: tag both sides, union them, and carry the
    * most recent right-side row forward over a window ordered by
    * (ts, side) within each key. ONE shuffle (the window's partitionBy) of
    * left+right together, a per-key sort, and a running `last(…,
    * ignoreNulls)` — no row explosion, no second scan, no driver state;
    * the right row's picked columns travel as ONE struct so they always
    * come from the SAME matched row.
    *
    * Semantics: for each left row, the right row with the greatest
    * `tsCol` ≤ left's `tsCol` and equal `keyCol` (inclusive — a right row
    * AT the left timestamp matches, because side 0 sorts before side 1 at
    * equal ts); left rows with no prior right row keep NULL picks —
    * exactly DuckDB's `ASOF LEFT JOIN … ON l.key = r.key AND l.ts >= r.ts`,
    * which the `e_asof_join` oracle runs natively. Ties between several
    * right rows at the identical (key, ts) resolve to the last in
    * `tieBreak` order (pass a unique column for determinism; timestamps
    * are unique per key in the fixture).
    *
    * Scale shape: cost ≡ one sort-shuffle of both inputs keyed by
    * `keyCol` — the same price as the sort-merge join Spark would pick
    * for a plain equi-join of the two sides; per-key data need not fit in
    * memory (window running frames stream). Skewed keys salt the same way
    * any window does.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, pickCols: Seq[String],
      tieBreak: Option[String] = None): DataFrame = {
    require(pickCols.nonEmpty, "pickCols must name right-side columns to carry")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_pick", lit(null).cast(
        org.apache.spark.sql.types.StructType(pickCols.map(c =>
          org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))))
      // _tie orders RIGHT rows among themselves at an identical (key, ts);
      // the tie column lives on the right side, so left rows carry a typed
      // null (their mutual order never affects the carried value)
      .withColumn("_tie", lit(null).cast(tieBreak
        .map(c => right.schema(c).dataType)
        .getOrElse(org.apache.spark.sql.types.LongType)))
    val r = right.select(
      col(keyCol), col(tsCol),
      lit(0).as("_side"),
      struct(pickCols.map(col): _*).as("_pick"),
      tieBreak.map(col).getOrElse(lit(null).cast("long")).as("_tie"))
    // union only the columns the window needs plus the left's own payload
    val rAligned = leftCols.filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(r)((df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val all = l.select((leftCols.map(col) :+ col("_side") :+ col("_pick")
      :+ col("_tie")): _*)
      .unionByName(rAligned.select((leftCols.map(col) :+ col("_side")
        :+ col("_pick") :+ col("_tie")): _*))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all
      .withColumn("_r", last(col("_pick"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select((leftCols.map(col) ++
        pickCols.map(c => col(s"_r.$c").as(c))): _*)
  }

  /** Forward as-of join: the EARLIEST right row at or after each left row
    * (next-event attribution). Same machinery mirrored: descending
    * timestamp order, right side still first at equal ts.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, pickCols: Seq[String],
      tieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_pick", lit(null).cast(
        org.apache.spark.sql.types.StructType(pickCols.map(c =>
          org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))))
      // _tie orders RIGHT rows among themselves at an identical (key, ts);
      // the tie column lives on the right side, so left rows carry a typed
      // null (their mutual order never affects the carried value)
      .withColumn("_tie", lit(null).cast(tieBreak
        .map(c => right.schema(c).dataType)
        .getOrElse(org.apache.spark.sql.types.LongType)))
    val r = right.select(
      col(keyCol), col(tsCol),
      lit(0).as("_side"),
      struct(pickCols.map(col): _*).as("_pick"),
      tieBreak.map(col).getOrElse(lit(null).cast("long")).as("_tie"))
    val rAligned = leftCols.filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(r)((df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val all = l.select((leftCols.map(col) :+ col("_side") :+ col("_pick")
      :+ col("_tie")): _*)
      .unionByName(rAligned.select((leftCols.map(col) :+ col("_side")
        :+ col("_pick") :+ col("_tie")): _*))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col("_side").asc, col("_tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all
      .withColumn("_r", last(col("_pick"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select((leftCols.map(col) ++
        pickCols.map(c => col(s"_r.$c").as(c))): _*)
  }
}
