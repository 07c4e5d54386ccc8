package graft

import org.apache.spark.sql.functions._
import graft.operators.{SimilarityOps, TextOps}

/** Unigram LM scoring, Zipf slope, and int8 quantization invariants. */
class ScoringOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("unigram log-probs are negative and word counts are exact") {
    val scored = TextOps.unigramLogProb(docs)
    assert(scored.where(col("avg_logprob") >= 0).count() === 0L)
    val n = docs.select(col("doc_id"),
        size(TextOps.words(col("text"))).as("n"))
      .join(scored, "doc_id")
      .where(col("n") =!= col("n_words")).count()
    assert(n === 0L)
  }

  test("a doc of corpus-dominant words outscores one of rare words") {
    val toy = Seq(
      (1L, "the the the the"), // dominant word
      (2L, "qux qux qux qux"), // rare word
      (3L, "the the the the the the the the the the the the")
    ).toDF("doc_id", "text")
    val s = TextOps.unigramLogProb(toy).orderBy("doc_id")
      .select("avg_logprob").as[Double].collect()
    assert(s(0) > s(1)) // p(the)=16/20 >> p(qux)=4/20
  }

  test("zipf slope is negative on skewed text, zero on a uniform corpus") {
    val slopes = TextOps.zipfSlope(docs).select("zipf_slope")
      .as[Double].collect()
    assert(slopes.nonEmpty && slopes.forall(_ < 0.0))
    // every word exactly once => all counts equal => slope 0
    val uniform = Seq((1L, "u", "a b c d e f g h"))
      .toDF("doc_id", "source", "text")
    val s0 = TextOps.zipfSlope(uniform).select("zipf_slope")
      .as[Double].collect().head
    assert(s0 === 0.0)
  }

  test("int8 quantization: codes in range, error bounded by half a step") {
    val q = SimilarityOps.quantizeInt8(embs)
    val bad = q.select(explode(col("q_embedding")).as("c"))
      .where(col("c") < -128 || col("c") > 127).count()
    assert(bad === 0L)
    // per-dim worst case error = (range/255/2)^2; embeddings are unit-ish
    // so range ≤ 2.5 ⇒ mse ≤ (2.5/510)^2 ≈ 2.4e-5 ⇒ ×1e6 ≤ 24.1
    val worst = q.agg(max(col("mse_x1e6"))).as[Double].collect().head
    assert(worst < 25.0, s"quantization mse too high: $worst")
    assert(q.select(size(col("q_embedding"))).distinct()
      .as[Int].collect().toSeq === Seq(64))
  }
}
