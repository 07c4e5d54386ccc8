package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training context-window chunking: split each pre-tokenized sequence into
  * fixed-size attention windows with a configurable stride (overlap =
  * window − stride), the step that turns validated corpus sequences into
  * model-ready training examples. Documents never share a window (the
  * per-document boundary is the attention boundary), and every token
  * appears in at least one window.
  *
  * Scale shape: a pure per-row projection — explode over the per-document
  * window count, then one bounded `slice` per emitted window. No shuffle,
  * no state, no driver involvement; the output inherits the input's
  * source partitioning, so a 100 TB chunking pass is one scan-dominated
  * map stage whose output volume is input × (window / stride) overlap
  * factor. Window checksum + endpoints (not the full token copy) keep the
  * verified output narrow; a production writer would emit the `win` array
  * itself from the same plan.
  */
object ChunkOps {

  /** One row per (document, window): window index, its true length (the
    * final window may be short), the token-sum checksum, and the first /
    * last token — enough to pin every window's exact content span against
    * an engine-independent oracle without materializing the token copies.
    */
  def contextWindows(tok: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val n = size(col("tokens"))
    // window starts at 0, stride, 2*stride, … while start < n:
    // count = floor((n-1)/stride) + 1 (n ≥ 1 guaranteed by the filter)
    val lastIdx = ((n - 1).cast("double") / lit(stride)).cast("int")
    tok
      .where(col("tokens").isNotNull && n > 0)
      .select(col("doc_id"), col("source"),
        col("tokens"), explode(sequence(lit(0), lastIdx)).as("win_idx"))
      // stage the slice once per window row so the derived stats below
      // don't re-slice (interpreted HOFs get no CSE — same trap as
      // TextOps.qualityScores)
      .select(col("doc_id"), col("source"), col("win_idx"),
        slice(col("tokens"), col("win_idx") * stride + 1, lit(window))
          .as("win"))
      .select(
        col("doc_id"), col("source"),
        col("win_idx").cast("int").as("win_idx"),
        size(col("win")).as("win_len"),
        aggregate(col("win"), lit(0L), (acc, x) => acc + x).as("win_sum"),
        element_at(col("win"), 1).as("f_tok"),
        element_at(col("win"), -1).as("l_tok"))
  }
}
