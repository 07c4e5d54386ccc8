package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of the token table — the piece that
  * turns the resumable lifecycle into an INCREMENTAL one: instead of
  * re-validating everything on a new snapshot (the reference re-pulls and
  * re-validates the full sample each run, /root/reference/extraction/
  * main.py:225-263), diff the snapshots and re-validate only the partitions
  * that actually changed.
  *
  * Diff semantics are multiset (`EXCEPT ALL`): a row counts as added /
  * removed per OCCURRENCE, so duplicate doc_ids — which the uniqueness rule
  * exists to catch — diff correctly (a snapshot that gains a second copy of
  * an existing row shows one `added` row, not zero). `exceptAll` plans as a
  * single hash-aggregate per side over the union (count per distinct tuple,
  * replicate the surplus) — one shuffle keyed by the full row, no join, no
  * driver-side state; AQE handles skewed tuples like any aggregate.
  */
object SnapshotDiff {

  /** Rows present in `cur` but not `prev` (`added`) and vice versa
    * (`removed`), multiset semantics, over the given comparison columns.
    * Columns default to the token table's scalar identity (tokens are
    * generated deterministically from doc_id in the fixture; at production
    * scale pass an explicit column list including a token digest).
    */
  def rowDiff(cur: DataFrame, prev: DataFrame,
      cols: Seq[String] = Seq("doc_id", "n_tok", "source", "okey")): DataFrame = {
    val c = cur.select(cols.map(col): _*)
    val p = prev.select(cols.map(col): _*)
    c.exceptAll(p).withColumn("change", lit("added"))
      .unionByName(p.exceptAll(c).withColumn("change", lit("removed")))
  }

  /** Per-(source, change) diff counts — the planning view: a source with any
    * diff rows must be re-validated, the rest resume from the manifest.
    */
  def diffBySource(cur: DataFrame, prev: DataFrame,
      cols: Seq[String] = Seq("doc_id", "n_tok", "source", "okey")): DataFrame =
    rowDiff(cur, prev, cols)
      .groupBy("source", "change").agg(count(lit(1)).as("n_rows"))

  /** Sentinel standing for the NULL source slice in [[changedSources]]
    * output. NULL is a real routing key — [[Validator.violationsRouted]]
    * sends null-source rows to the default rule set — so a changed
    * null-source row must flag its slice for re-validation rather than
    * silently escape it (ADVICE r5). Use [[sliceFilter]] to turn the
    * collected source list (sentinel included) back into a row predicate.
    */
  val NullSourceSentinel = "__null__"

  /** Sources whose content changed between the snapshots — feed this to the
    * resumable runner as the pending set (with unchanged sources marked ok
    * in the manifest) to make re-validation proportional to the CHANGE, not
    * the corpus. A changed NULL source surfaces as [[NullSourceSentinel]].
    */
  def changedSources(cur: DataFrame, prev: DataFrame,
      cols: Seq[String] = Seq("doc_id", "n_tok", "source", "okey")): DataFrame =
    rowDiff(cur, prev, cols)
      .select(coalesce(col("source"), lit(NullSourceSentinel)).as("source"))
      .distinct()

  /** Row predicate selecting exactly the slices named by a collected
    * [[changedSources]] list — translates [[NullSourceSentinel]] back into
    * an IS NULL test (an `isin` alone never matches NULL).
    */
  def sliceFilter(changed: Seq[String],
      sourceCol: org.apache.spark.sql.Column = col("source"))
      : org.apache.spark.sql.Column = {
    val named = changed.filterNot(_ == NullSourceSentinel)
    val base =
      if (named.isEmpty) lit(false) else sourceCol.isin(named: _*)
    if (changed.contains(NullSourceSentinel)) base || sourceCol.isNull
    else base
  }
}
