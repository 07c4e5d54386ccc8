package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting and sampling.
  *
  * Assignment is a PURE FUNCTION of the document id (an md5-derived
  * bucket), never `rand()`: a training pipeline must be able to recompute
  * which split any document landed in — across reruns, cluster layouts,
  * engines, and years — and `rand()` also breaks Spark's task-retry
  * determinism (a recomputed partition would re-roll its rows). The md5
  * bucket is reproducible bit-for-bit in any engine with an md5 function
  * (the DuckDB oracle recomputes it), and is independent of row order and
  * partitioning by construction.
  *
  * Scale shape: one codegen'd projection per row, no shuffle, no state —
  * the split of a 100 TB corpus costs one scan (and composes with any
  * other per-row work in the same pass).
  */
object SampleOps {

  /** Stable bucket in [0, nBuckets) from the id's md5: the first 8 hex
    * chars as an integer, mod nBuckets. 32 bits of hash for ≤10^4 buckets
    * keeps the modulo bias below 10^-5.
    */
  def hashBucket(id: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("bigint"), lit(nBuckets))

  /** Assign train/valid/test splits by hash bucket out of 100:
    * [0, trainPct) → train, [trainPct, trainPct+validPct) → valid,
    * rest → test. Adds `bucket` and `split` columns.
    */
  def assignSplits(df: DataFrame, idCol: String = "doc_id",
      trainPct: Int = 80, validPct: Int = 10): DataFrame = {
    require(trainPct + validPct <= 100, "split percentages exceed 100")
    df.withColumn("bucket", hashBucket(col(idCol), 100))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + validPct, "valid")
          .otherwise("test"))
  }

  /** Deterministic `pct`-percent sample: the same documents are selected on
    * every run over any layout (unlike `df.sample`, which seeds per
    * partition). The predicate evaluates inside the scan stage (codegen'd,
    * rows dropped before any shuffle) — but being a hash of the id it can
    * never prune row groups; to make a recurring sample I/O-proportional,
    * store the table bucketed/partitioned by `hashBucket` and the filter
    * becomes a directory prune.
    */
  def sampleFraction(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.where(hashBucket(col(idCol), 100) < pct)

  /** STRATIFIED deterministic sampling: a different keep-percentage per
    * stratum (domain/source/language mixing weights — the knob an LLM data
    * pipeline turns to up-sample rare domains and down-sample crawl bulk).
    * Same md5-bucket predicate as [[sampleFraction]], with the threshold a
    * per-stratum CASE — still one codegen'd scan-stage filter, no shuffle,
    * no `sampleBy` per-partition randomness, reproducible across engines
    * and years. Strata absent from `pctByStratum` keep `defaultPct`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int): DataFrame = {
    val threshold = pctByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPct)) { case (acc, (k, pct)) =>
        when(col(stratumCol) === k, lit(pct)).otherwise(acc)
      }
    df.where(hashBucket(col(idCol), 100) < threshold)
  }

  /** Temperature-scaled domain mixing weights — the upstream computation
    * that PRODUCES the per-stratum percentages [[stratifiedSample]]
    * consumes: per-source token share p_s, flattened to
    * w_s = p_s^alpha / Σ p_s^alpha (alpha < 1 up-weights rare domains, the
    * multilingual-sampling rule from the XLM/mT5 line of work; alpha = 1
    * is proportional, alpha = 0 uniform).
    *
    * Scale shape: one corpus aggregate to per-source totals, then window
    * normalization over the SOURCE-cardinality frame (a handful of rows —
    * the empty-partition window is free at that size; the corpus itself is
    * never windowed). Output rounds to 6 for cross-engine compare.
    */
  def mixingWeights(docs: DataFrame, alpha: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    val perSource = docs
      .select(col("source"),
        size(graft.operators.TextOps.words(col("text"))).as("n_words"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"))
    val share = col("n_words").cast("double") /
      sum(col("n_words")).over(all)
    perSource
      .withColumn("share", share)
      .withColumn("w_raw", pow(col("share"), lit(alpha)))
      .select(col("source"), col("n_docs"), col("n_words"),
        round(col("share"), 6).as("share"),
        round(col("w_raw") / sum(col("w_raw")).over(all), 6).as("weight"))
  }

  /** Per-source TOKEN BUDGET enforcement: keep each source's documents in
    * deterministic md5(doc_id) order until the source's cumulative token
    * count reaches `budget`, drop the rest — the hard cap a mixing recipe
    * applies after [[mixingWeights]] decides proportions. The order is a
    * pure function of the id (same selection across reruns, layouts,
    * engines); the running sum uses the default RANGE frame, so id-tied
    * rows (collapsed duplicates) share one cumulative value and are kept
    * or dropped TOGETHER — no tie-order nondeterminism can leak into the
    * kept set.
    *
    * Scale shape: one shuffle (repartition by source) + one running
    * window per source partition — the same single-pass shape as flat
    * sequence packing, with the same monolithic-source skew hazard (a
    * source holding most of the corpus serializes its window; the
    * two-level [[PackOps]] bucketing is the mitigation when budgets are
    * bucket-decomposable).
    */
  def tokenBudgetFlag(tok: DataFrame, budget: Long,
      tokCol: String = "n_tok"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    tok.withColumn("_cum_tok", sum(col(tokCol)).over(w))
      .withColumn("kept", col("_cum_tok") <= budget)
      .drop("_cum_tok")
  }

  /** Per-source budget summary: kept/dropped doc counts and the kept
    * token total (≤ budget by construction).
    */
  def tokenBudgetSummary(tok: DataFrame, budget: Long): DataFrame =
    tokenBudgetFlag(tok, budget)
      .groupBy("source")
      .agg(
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tok").cast("long")).otherwise(0L))
          .as("tok_kept"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("n_dropped"))

  /** Deterministic global TRAINING ORDER: assign every document a shard
    * and a position within it — shard by md5 bucket, position by md5
    * order — so the "shuffled" curriculum is a pure function of document
    * ids: reproducible across reruns/engines/layouts (the property
    * `orderBy(rand())` destroys), resumable mid-epoch (shard, pos) and
    * free of source/time locality (adjacent ids land in unrelated
    * shards).
    *
    * Scale shape: one shuffle (hash-partition by shard) + one row_number
    * window per shard; shard count chosen for the trainer's reader
    * parallelism bounds the window frames at corpus/nShards. The writer
    * side would `partitionBy(shard)` + sort by pos within files.
    */
  def shuffleOrder(docs: DataFrame, idCol: String, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("shard",
        hashBucket(col(idCol), nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col(idCol), col("shard"), col("pos"))
  }
}
