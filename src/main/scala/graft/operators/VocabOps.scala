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
  * table — vocabulary-sized, so broadcast at any corpus scale.
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
    */
  def pmiTopK(df: DataFrame, k: Int, minCount: Long,
      tokensCol: String = "tokens"): DataFrame = {
    val t = col(tokensCol)
    val bi = bigramCounts(df, tokensCol)
    val uni = df.where(t.isNotNull)
      .select(explode(t).as("token"))
      .groupBy("token").agg(count(lit(1)).as("uc"))
    val nb = bi.agg(sum("cnt").as("nb"))
    val nu = uni.agg(sum("uc").as("nu"))
    val d = (c: Column) => c.cast("double")
    bi.where(col("cnt") >= minCount)
      .join(broadcast(uni.withColumnRenamed("token", "t1")
        .withColumnRenamed("uc", "c1")), Seq("t1"))
      .join(broadcast(uni.withColumnRenamed("token", "t2")
        .withColumnRenamed("uc", "c2")), Seq("t2"))
      .crossJoin(broadcast(nb)).crossJoin(broadcast(nu))
      .select(col("t1"), col("t2"), col("cnt"),
        round(log(d(col("cnt")) / d(col("nb"))) -
          log(d(col("c1")) / d(col("nu"))) -
          log(d(col("c2")) / d(col("nu"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("t1"), col("t2"))
      .limit(k)
  }
}
