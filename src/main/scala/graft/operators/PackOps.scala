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
}
