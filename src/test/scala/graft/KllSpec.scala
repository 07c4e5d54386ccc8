package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{KllBuffer, KllFunctions}

class KllBufferSpec extends AnyFunSuite {

  test("exact for small streams (no compaction)") {
    val buf = new KllBuffer(200)
    (1 to 100).foreach(i => buf.update(i.toDouble))
    val qs = buf.quantiles(Seq(0.5, 0.95))
    assert(math.abs(qs(0) - 50) <= 1)
    assert(math.abs(qs(1) - 95) <= 1)
  }

  test("approximate within rank error for large streams") {
    val buf = new KllBuffer(200)
    val n = 100000
    // deterministic permuted insert order
    (0 until n).foreach(i => buf.update(((i.toLong * 48271) % n).toDouble))
    val qs = buf.quantiles(Seq(0.1, 0.5, 0.9))
    Seq(0.1, 0.5, 0.9).zip(qs).foreach { case (p, q) =>
      assert(math.abs(q / n - p) < 0.03, s"p=$p got=$q")
    }
    assert(buf.count === n)
  }

  test("merge ≈ single stream; serialization round-trips") {
    val a = new KllBuffer(200); val b = new KllBuffer(200)
    (0 until 50000).foreach { i =>
      if (i % 2 == 0) a.update(i.toDouble) else b.update(i.toDouble)
    }
    a.merge(KllBuffer.deserialize(b.serialize()))
    val qs = a.quantiles(Seq(0.5))
    assert(math.abs(qs(0) / 50000.0 - 0.5) < 0.03)
    assert(a.count === 50000)
  }

  test("determinism: same input → identical sketch bytes") {
    def build(): Array[Byte] = {
      val buf = new KllBuffer(100)
      (0 until 10000).foreach(i => buf.update(((i * 7919) % 1000).toDouble))
      buf.serialize()
    }
    assert(build().toSeq === build().toSeq)
  }

  test("property: quantiles are monotone and within observed range") {
    (1 to 50).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val xs = List.fill(500)(rnd.nextDouble() * 2e6 - 1e6)
      val buf = new KllBuffer(50)
      xs.foreach(buf.update)
      val qs = buf.quantiles(Seq(0.1, 0.5, 0.9))
      assert(qs(0) <= qs(1) && qs(1) <= qs(2), s"seed=$seed")
      assert(qs(0) >= xs.min && qs(2) <= xs.max, s"seed=$seed")
    }
  }
}

class KllAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("kll_quantiles as Catalyst aggregate matches exact percentile closely") {
    val df = (1 to 20000).map(i => (if (i % 2 == 0) "A" else "B", (i * 48271) % 997))
      .toDF("source", "v")
    val got = df.groupBy("source")
      .agg(KllFunctions.kllQuantiles(col("v"), 200, Seq(0.5)).as("qs"))
      .select(col("source"), col("qs")(0).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = df.groupBy("source")
      .agg(expr("percentile(v, 0.5)").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (s, e) =>
      assert(math.abs(got(s) - e) / 997.0 < 0.05, s"source $s: ${got(s)} vs $e")
    }
  }

  test("kll aggregate is deterministic across partitionings") {
    val df = (1 to 5000).map(i => ("A", i)).toDF("source", "v")
    def run(parts: Int) = df.repartition(parts).groupBy("source")
      .agg(KllFunctions.kllQuantiles(col("v"), 200, Seq(0.25, 0.75)).as("qs"))
      .select(col("qs")(0), col("qs")(1)).collect().head
    // partial merge order may differ, but results must stay within error
    val a = run(2); val b = run(8)
    assert(math.abs(a.getDouble(0) - b.getDouble(0)) / 5000.0 < 0.05)
    assert(math.abs(a.getDouble(1) - b.getDouble(1)) / 5000.0 < 0.05)
  }
}
