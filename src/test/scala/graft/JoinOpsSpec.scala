package graft

import org.apache.spark.sql.functions._
import graft.operators.JoinOps

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (100L, 1L, 10, 1.0), // latest prior right is ts=8
    (101L, 1L, 5, 2.0),  // right AT ts=5 matches (inclusive)
    (102L, 1L, 3, 3.0),  // nothing at or before → null
    (103L, 2L, 7, 4.0)   // key 2 has only a later right → null
  ).toDF("event_id", "user_id", "ts", "value")

  private def right = Seq(
    (1L, 5, "a", 50L),
    (1L, 8, "b", 51L),
    (2L, 9, "c", 52L)
  ).toDF("user_id", "ts", "v", "rid")

  test("backward as-of: inclusive latest-prior match, null when none") {
    val got = JoinOps.asofJoinBackward(left, right, "user_id", "ts",
        pickCols = Seq("v", "rid"), tieBreak = Some("rid"))
      .select("event_id", "v", "rid")
      .as[(Long, Option[String], Option[Long])].collect()
      .map { case (k, v, r) => k -> ((v, r)) }.toMap
    assert(got === Map(
      100L -> ((Some("b"), Some(51L))),
      101L -> ((Some("a"), Some(50L))),
      102L -> ((None, None)),
      103L -> ((None, None))))
  }

  test("forward as-of: earliest at-or-after match") {
    val got = JoinOps.asofJoinForward(left, right, "user_id", "ts",
        pickCols = Seq("v"), tieBreak = Some("rid"))
      .select("event_id", "v")
      .as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      100L -> None,        // no right at/after ts=10 for key 1
      101L -> Some("a"),   // right AT ts=5 (inclusive)
      102L -> Some("a"),   // earliest at/after ts=3 is ts=5
      103L -> Some("c")))  // ts=9 for key 2
  }

  test("sessionize: gap boundary is inclusive, sessions number per key") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, ts(0)), (1L, ts(100)),        // session 1
      (1L, ts(100 + 1800)),              // gap == 30min exactly → SAME session
      (1L, ts(100 + 1800 + 1801)),       // gap > 30min → session 2
      (2L, ts(50))                       // other key: own session 1
    ).toDF("user_id", "ts")
    val got = graft.operators.SessionOps.sessionSummary(
        ev, "user_id", "ts", gapUs = 30L * 60 * 1000000)
      .select("user_id", "session", "n_events", "span_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 3L, 1900L * 1000000),
      (1L, 2L, 1L, 0L),
      (2L, 1L, 1L, 0L)))
    // layout-invariant
    val re = graft.operators.SessionOps.sessionSummary(
        ev.repartition(5).orderBy(rand(3)), "user_id", "ts",
        gapUs = 30L * 60 * 1000000)
      .select("user_id", "session", "n_events", "span_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(re === got)
  }

  test("as-of picks travel as one row; ties resolve by tieBreak") {
    // two right rows at the SAME (key, ts): the larger tieBreak wins, and
    // BOTH picked columns must come from that same winning row
    val r2 = right.unionByName(Seq((1L, 8, "b2", 60L))
      .toDF("user_id", "ts", "v", "rid"))
    val got = JoinOps.asofJoinBackward(left, r2, "user_id", "ts",
        pickCols = Seq("v", "rid"), tieBreak = Some("rid"))
      .where(col("event_id") === 100L)
      .select("v", "rid").as[(String, Long)].collect().head
    assert(got === (("b2", 60L)))
    // layout invariance: shuffled inputs give identical assignments
    val a = JoinOps.asofJoinBackward(left, right, "user_id", "ts",
      Seq("v"), Some("rid")).select("event_id", "v")
      .as[(Long, Option[String])].collect().toMap
    val b = JoinOps.asofJoinBackward(
      left.repartition(7).orderBy(rand(1)),
      right.repartition(3).orderBy(rand(2)),
      "user_id", "ts", Seq("v"), Some("rid")).select("event_id", "v")
      .as[(Long, Option[String])].collect().toMap
    assert(a === b)
  }
}
