package graft

import org.apache.spark.sql.functions._
import graft.operators.VocabOps

class VocabOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bigram counts are ordered adjacent pairs; null/short arrays skipped") {
    val df = Seq(
      (1L, Seq(1, 2, 3, 2, 3)),
      (2L, Seq(9)),               // too short: no pairs
      (3L, null.asInstanceOf[Seq[Int]])
    ).toDF("doc_id", "tokens")
    val got = VocabOps.bigramCounts(df)
      .as[(Int, Int, Long)].collect().toSet
    assert(got === Set((1, 2, 1L), (2, 3, 2L), (3, 2, 1L)))
    val top = VocabOps.mergeCandidates(df, 2)
      .select("t1", "t2", "rank").as[(Int, Int, Int)].collect().toSeq
    assert(top.head === ((2, 3, 1))) // most frequent pair ranks first
  }

  test("pmi ranks an exclusive collocation above a chance pair") {
    // (7,8) always and only together; 1 pairs with everything
    val rows = (Seq.fill(6)(Seq(7, 8)) ++
      Seq(Seq(1, 2), Seq(1, 3), Seq(1, 4), Seq(1, 5), Seq(1, 2),
        Seq(1, 3), Seq(1, 4), Seq(1, 5), Seq(1, 2), Seq(1, 3)))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = rows.toDF("doc_id", "tokens")
    val top = VocabOps.pmiTopK(df, 3, minCount = 2)
      .select("t1", "t2").as[(Int, Int)].collect().toSeq
    assert(top.head === ((7, 8)))
  }

  test("registry query: top bigram beats or equals every other pair count") {
    val tok = graft.sources.TokenTable.tokens(spark, sf0001)
    val top = VocabOps.mergeCandidates(tok, 5)
    val cnts = top.select("cnt").as[Long].collect().toSeq
    assert(cnts === cnts.sorted.reverse) // ranks follow counts
    assert(cnts.nonEmpty && cnts.head >= cnts.last)
  }
}
