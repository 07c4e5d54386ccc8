package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary-induction statistics over PRE-TOKENIZED sequences (the
  * engine's native payload — `tokens: array<int>`): adjacent-pair
  * frequencies (the BPE merge-candidate table — one merge round of a
  * subword trainer is exactly "count adjacent pairs, take the top"),
  * and pointwise mutual information over those pairs (the collocation
  * strength signal that separates systematic token sequences from chance
  * co-occurrence).
  *
  * Shapes: per-row array work is codegen'd (`zip_with` over two slices —
  * no self-join, no window, no per-key materialized list); the only
  * corpus-keyed shuffles are the (t1, t2) / token hash aggregates, both
  * map-side combined and vocabulary-bounded (≤ |V|² pairs, in practice
  * the observed-pair count). PMI joins unigram counts INTO the pair
  * table — both sides read one persisted vocabulary-bounded aggregate, and
  * the join strategy is left to the planner (exact cached stats): broadcast
  * while the realized vocabulary fits, shuffle join when it does not.
  */
object VocabOps {

  /** Adjacent ordered pairs of each row's token array. */
  private def pairCol(t: Column): Column =
    zip_with(
      slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1),
      (a, b) => struct(a.as("t1"), b.as("t2")))

  /** (t1, t2, cnt): adjacent-pair frequencies over non-null arrays. */
  def bigramCounts(df: DataFrame, tokensCol: String = "tokens"): DataFrame = {
    val t = col(tokensCol)
    df.where(t.isNotNull && size(t) >= 2)
      .select(explode(pairCol(t)).as("p"))
      .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("cnt"))
  }

  /** Top-k BPE merge candidates: the most frequent adjacent pairs,
    * deterministic tie-break (cnt desc, t1, t2).
    */
  def mergeCandidates(df: DataFrame, k: Int,
      tokensCol: String = "tokens"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("cnt").desc, col("t1"), col("t2"))
    // single-partition window over the TOP SLICE only would be ideal;
    // rank-then-filter over the pair table is acceptable because the pair
    // aggregate is vocabulary-bounded — but avoid a global window anyway:
    // orderBy+limit compiles to TakeOrderedAndProject (no full sort).
    bigramCounts(df, tokensCol)
      .orderBy(col("cnt").desc, col("t1"), col("t2"))
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("int"))
  }

  /** Top-k adjacent pairs by PMI among pairs with `cnt ≥ minCount`:
    * `pmi = ln(p(t1,t2)) − ln(p(t1)) − ln(p(t2))` with probabilities from
    * exact integer counts (bigram mass for the pair, token mass for the
    * unigrams). Computed as a difference of logs — products of the raw
    * counts would overflow int64 at corpus scale.
    *
    * Plan shape (round 6): ONE corpus pass. Singles and adjacent pairs
    * explode together (2n−1 elements per row; a NULL `t2` marks a unigram
    * element) into ONE vocabulary-bounded hash aggregate, which is
    * persisted; the pair table, both unigram joins, and both corpus totals
    * all read that cached aggregate. The previous form paid two corpus
    * explodes plus two 1-row crossJoin subtrees per run. The totals are
    * collected once (input is the vocabulary-bounded cache, output is two
    * longs) and enter the plan as literals; the unigram joins carry no
    * hard broadcast hint — the cache's materialized stats are exact, so
    * the planner broadcasts when the realized vocabulary is small and
    * falls back to a shuffle join when it is not (the 100 TB-safe shape).
    */
  def pmiTopK(df: DataFrame, k: Int, minCount: Long,
      tokensCol: String = "tokens"): DataFrame = {
    val t = col(tokensCol)
    val pairT = "array<struct<t1:int,t2:int>>"
    val staged = df.where(t.isNotNull)
      .select(explode(concat(
        transform(t, x =>
          struct(x.as("t1"), lit(null).cast("int").as("t2"))).cast(pairT),
        when(size(t) >= 2, pairCol(t).cast(pairT))
          .otherwise(array().cast(pairT)))).as("p"))
    val agg = trackPmiCache(staged
      .groupBy(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // one tiny job over the cached aggregate → the totals become literals
    val totals = agg.agg(
      sum(when(col("t2").isNotNull, col("cnt"))).as("nb"),
      sum(when(col("t2").isNull, col("cnt"))).as("nu")).collect().head
    val nb = if (totals.isNullAt(0)) 0L else totals.getLong(0)
    val nu = if (totals.isNullAt(1)) 0L else totals.getLong(1)
    val uni = agg.where(col("t2").isNull).select(col("t1"), col("cnt"))
    val d = (c: Column) => c.cast("double")
    agg.where(col("t2").isNotNull && col("cnt") >= minCount)
      .join(uni.select(col("t1"), col("cnt").as("c1")), Seq("t1"))
      .join(uni.select(col("t1").as("t2"), col("cnt").as("c2")), Seq("t2"))
      .select(col("t1"), col("t2"), col("cnt"),
        round(log(d(col("cnt")) / lit(nb.toDouble)) -
          log(d(col("c1")) / lit(nu.toDouble)) -
          log(d(col("c2")) / lit(nu.toDouble)), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("t1"), col("t2"))
      .limit(k)
  }

  /** The cache is bounded at ONE live aggregate per JVM: each invocation
    * unpersists the previous one, so repeated runs in one session (bench
    * executes the whole registry twice) don't accumulate vocabulary-sized
    * caches in the block manager. A previously returned frame re-executed
    * after its cache is dropped simply recomputes — still correct.
    */
  private val lastPmiAgg =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  private def trackPmiCache(agg: DataFrame): DataFrame = {
    val prev = lastPmiAgg.getAndSet(agg)
    if (prev ne null) prev.unpersist(blocking = false)
    agg
  }
}
