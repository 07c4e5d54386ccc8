package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assigning documents to fixed-token-budget training
  * "packs" (sample packing for pre-training: short sequences are
  * concatenated up to a context budget so padding doesn't dominate).
  *
  * Contiguous greedy policy: within each `source`, documents in a
  * deterministic total order are laid end to end and a document's pack is
  * `floor(tokens_before / budget)` — the standard streaming-concat shape
  * (a doc may straddle a boundary; real loaders split it across the two
  * packs, so boundary docs belong to the pack their first token lands in).
  *
  * Determinism: the order key includes every compared column (doc_id,
  * okey, n_tok), so rows that tie are identical in n_tok and their
  * cumulative sums are interchangeable — the (doc, pack) assignment is a
  * pure function of the data, row order and partitioning be damned, and
  * the DuckDB oracle reproduces it with the same window.
  *
  * Scale shape: one shuffle (the window's partitionBy source) and a linear
  * running sum — no self-join, no iteration. At 100 TB you would pack per
  * STORAGE partition (the window key is already the partition key, so the
  * shuffle disappears under storage-partitioned execution); bin-packing
  * variants (best-fit decreasing) buy ~1-2% less padding for a sort plus
  * a sequential pass and are deliberately not the default.
  */
object PackOps {

  /** Per-document pack assignment: (source, doc_id, n_tok, pack_id,
    * tokens_before). `budget` is the pack's token capacity.
    */
  def packAssignments(tokens: DataFrame, budget: Int): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy("doc_id", "okey", "n_tok")
      .rowsBetween(Window.unboundedPreceding, -1)
    tokens.select(col("source"), col("doc_id"), col("n_tok"),
        coalesce(sum(col("n_tok")).over(w), lit(0L)).as("tokens_before"))
      .select(col("source"), col("doc_id"), col("n_tok"),
        floor(col("tokens_before") / budget.toDouble).cast("bigint")
          .as("pack_id"),
        col("tokens_before"))
  }

  /** Pack-level summary: docs and token mass per (source, pack) — the
    * padding-efficiency view (every pack but the last should carry close
    * to `budget` tokens). Aggregates the assignment frame directly — never
    * a join back to the table (doc_id is not unique).
    */
  def packSummary(tokens: DataFrame, budget: Int): DataFrame =
    packAssignments(tokens, budget)
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("pack_tokens"))

  /** Two-level skew-safe packing (VERDICT r4 #5): [[packAssignments]]'s
    * window is one task per `source`, so a monolithic 10 TB source
    * serializes its cumulative sum through a single core. Here each doc
    * first gets a deterministic hash BUCKET ([[SampleOps.hashBucket]] of
    * (doc_id, okey) — layout-independent, oracle-reproducible); the
    * running sum windows over (source, bucket) — `nBuckets`-way parallel
    * per source — and each bucket's local offsets are lifted to global
    * ones by adding the token mass of all lower buckets (a per-(source,
    * bucket) aggregate, |sources|·nBuckets rows, broadcast back; the big
    * side shuffles once for the window, same as the flat form).
    *
    * Semantics: EXACTLY [[packAssignments]] under the total order (bucket,
    * doc_id, okey, n_tok) instead of (doc_id, okey, n_tok) — still a pure
    * function of the data with the same pack-shape guarantees (every
    * non-final pack is budget-filled up to its one boundary doc), proved
    * in spec against the flat form and by the `v_seq_packing2` oracle.
    * At 100 TB, nBuckets bounds the longest sequential cumsum at
    * |largest source| / nBuckets rows.
    */
  def packAssignmentsBucketed(tokens: DataFrame, budget: Int,
      nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be positive")
    val withB = tokens.select(col("source"), col("doc_id"), col("n_tok"),
      col("okey"),
      SampleOps.hashBucket(
        concat_ws(":", col("doc_id"), col("okey")), nBuckets).as("bucket"))
    val w = Window.partitionBy("source", "bucket")
      .orderBy("doc_id", "okey", "n_tok")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withB.select(col("source"), col("doc_id"), col("n_tok"),
      col("bucket"),
      coalesce(sum(col("n_tok")).over(w), lit(0L)).as("local_before"))
    // lower-bucket token mass per (source, bucket): windowing this TINY
    // aggregate is free; broadcasting it back keeps the big side where the
    // (source, bucket) shuffle already put it
    val bw = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = withB.groupBy("source", "bucket")
      .agg(sum(col("n_tok")).as("btok"))
      .select(col("source"), col("bucket"),
        coalesce(sum(col("btok")).over(bw), lit(0L)).as("bucket_prefix"))
    local.join(broadcast(prefix), Seq("source", "bucket"))
      .select(col("source"), col("doc_id"), col("n_tok"),
        floor((col("local_before") + col("bucket_prefix")) / budget.toDouble)
          .cast("bigint").as("pack_id"),
        (col("local_before") + col("bucket_prefix")).as("tokens_before"))
  }

  /** [[packSummary]] over the two-level assignment. */
  def packSummaryBucketed(tokens: DataFrame, budget: Int,
      nBuckets: Int = 32): DataFrame =
    packAssignmentsBucketed(tokens, budget, nBuckets)
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("pack_tokens"))
}
