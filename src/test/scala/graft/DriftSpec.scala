package graft

import org.apache.spark.sql.functions._
import graft.engine.Drift
import graft.model.TokenRow

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def mk(src: String, lens: Seq[Int]) =
    lens.zipWithIndex.map { case (n, i) =>
      TokenRow(s"$src-$i", Array.fill(n)(1), n, src)
    }

  test("no drift when current == baseline") {
    val df = mk("A", 1 to 100).toDF
    val d = Drift.exactQuantileDrift(df, df, "n_tok", Seq(0.5, 0.9), 1.0)
      .collect().head
    assert(d.getAs[Double]("delta_avg") === 0.0)
    assert(!d.getAs[Boolean]("drifted"))
  }

  test("shifted distribution is flagged") {
    val base = mk("A", 1 to 100).toDF
    val cur = mk("A", 51 to 150).toDF
    val d = Drift.exactQuantileDrift(cur, base, "n_tok", Seq(0.5), 1.0)
      .collect().head
    assert(d.getAs[Boolean]("drifted"))
    assert(math.abs(d.getAs[Double]("delta_avg") - 50.0) < 1e-9)
  }

  test("sketch drift agrees with exact drift on clear shifts") {
    val base = mk("A", 1 to 2000).toDF
    val cur = mk("A", 1001 to 3000).toDF
    val s = Drift.sketchQuantileDrift(cur, base, "n_tok", 200, Seq(0.5), 100.0)
      .collect().head
    assert(s.getAs[Boolean]("drifted"))
    assert(math.abs(s.getAs[Double]("max_delta") - 1000.0) < 200.0)
  }

  test("rank-space sketch bound holds, and tightens with k") {
    // the bracket from the KLL rank guarantee (eps = 6/k): the sketch's
    // quantile value must lie between the exact quantiles at p∓eps — true
    // at the production k and at a coarser k (wider bracket)
    val df = mk("A", 1 to 5000).toDF.unionByName(mk("N", 500 to 4000).toDF)
    for (k <- Seq(32, 200)) {
      val rows = Drift.sketchRankBound(df, "n_tok", k, Seq(0.5, 0.95),
        integerValued = true).collect()
      assert(rows.length === 2)
      assert(rows.forall(r => r.getBoolean(1) && r.getBoolean(2)),
        s"k=$k bracket violated")
    }
    // eps really narrows as k grows
    assert(Drift.kllRankEps(2000) < Drift.kllRankEps(200))
  }

  test("token histogram drift: zero on identical, positive on disjoint") {
    val a = Seq(TokenRow("x", Array(10, 20, 30), 3, "A")).toDF
    val b = Seq(TokenRow("y", Array(5010, 5020, 5030), 3, "A")).toDF
    val same = Drift.tokenHistogramDrift(a, a, 1000).collect().head
    assert(same.getAs[Double]("l1_distance") === 0.0)
    val diff = Drift.tokenHistogramDrift(a, b, 1000).collect().head
    assert(math.abs(diff.getAs[Double]("l1_distance") - 2.0) < 1e-9)
  }
}
