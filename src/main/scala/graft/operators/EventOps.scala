package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over an event stream
  * `(event_id, ts, user_id, event_type, value, props)` — the funnel / path
  * operators a product-analytics engine runs beside the validation pass
  * (the reference validates per-page resource batches sequentially,
  * /root/reference/extraction/main.py:164-199; the funnel is the same
  * "ordered steps per key" shape applied to events).
  */
object EventOps {

  /** Ordered funnel: for each key, the earliest time each step can be
    * reached such that steps occur IN ORDER (step i strictly after the
    * reached time of step i-1, and — with `withinSeconds` set — at most
    * that long after it, the windowed-conversion form every product funnel
    * uses). Returns one row per key with the reached timestamp per step
    * (null once the chain breaks).
    *
    * Formulation: step 1's reach time is `min(ts where type=step1)`; step
    * i's is `min(ts where type=stepᵢ AND ts > reach(i-1) [AND ts ≤
    * reach(i-1)+window])`. A per-key conditional min depends on the
    * previous step's min, so a single groupBy cannot express it; instead
    * each step is one hash aggregate of the events joined to the PREVIOUS
    * step's per-key frame — k-1 shuffles of key-cardinality frames, never
    * of the event table itself (the event table shuffles ONCE per step on
    * `keyCol`, map-side combined and filtered to that step's type first).
    *
    * Scale shape: every join and aggregate keys on the SAME `keyCol`, so
    * exchange reuse keeps them co-partitioned; with k steps the plan is k
    * aggregates of strictly shrinking frames. No windows, no collect_list
    * (a per-key event list would put a whole key in one task's memory —
    * this formulation never materializes one).
    */
  def funnelTimes(events: DataFrame, steps: Seq[String],
      keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type",
      withinSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(col(keyCol))
      .agg(min(col(tsCol)).as(s"t0"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"t${i - 1}"
      val deadline = withinSeconds
        .map(s => col("_ts") <= col("_prev") + expr(s"INTERVAL $s SECOND"))
        .getOrElse(lit(true))
      val nxt = events.where(col(typeCol) === step)
        .select(col(keyCol), col(tsCol).as("_ts"))
        .join(acc.select(col(keyCol), col(prev).as("_prev")), Seq(keyCol))
        .where(col("_ts") > col("_prev") && deadline)
        .groupBy(col(keyCol)).agg(min(col("_ts")).as(s"t$i"))
      acc.join(nxt, Seq(keyCol), "left")
    }
  }

  /** Schema-on-read extraction of the `props` JSON column: parse with an
    * EXPLICIT DDL schema (declared schema > inference at scale — one
    * malformed row yields typed nulls, never a corrupted inferred schema)
    * and surface each field as a typed top-level column beside the event.
    * `from_json` evaluates once per row; the struct's fields are then free
    * projections.
    */
  def extractProps(events: DataFrame, ddl: String,
      propsCol: String = "props"): DataFrame = {
    val parsed = events.withColumn("_p",
      from_json(col(propsCol), org.apache.spark.sql.types.StructType
        .fromDDL(ddl)))
    val fields = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      .fieldNames.toSeq
    fields.foldLeft(parsed)((df, f) =>
      df.withColumn(f, col(s"_p.$f"))).drop("_p")
  }

  /** Event-type transition counts (the Markov/path view: which step
    * follows which): per key, each event's SUCCESSOR type via one `lead`
    * window, then a global (type, next_type) count. One shuffle on the
    * key for the window (running frame — streams, never materializes a
    * per-key list), one map-side-combined aggregate on the tiny
    * |types|² result.
    */
  def transitionCounts(events: DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type",
      tieBreak: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol).asc, col(tieBreak).asc)
    events
      .select(col(keyCol), col(typeCol),
        lead(col(typeCol), 1).over(w).as("next_type"))
      .where(col("next_type").isNotNull)
      .groupBy(col(typeCol), col("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Inter-arrival statistics per event type: the gap between consecutive
    * occurrences of the SAME type for the SAME key (lag window), rolled up
    * to per-type totals in exact integer microseconds — the cadence /
    * anomaly view (a collapsed max gap flags an outage; a shrunken sum
    * flags a flood). Same one-shuffle window + tiny aggregate shape as
    * [[transitionCounts]].
    */
  def interArrivalStats(events: DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type",
      tieBreak: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol), col(typeCol))
      .orderBy(col(tsCol).asc, col(tieBreak).asc)
    // cast covers TIMESTAMP_NTZ event times (unix_micros accepts only
    // TIMESTAMP; the engine pins spark.sql.session.timeZone=UTC, so the
    // NTZ→LTZ reinterpretation is deterministic)
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    events
      .select(col(typeCol),
        (micros - lag(micros, 1).over(w)).as("gap_us"))
      .where(col("gap_us").isNotNull)
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_us")).as("sum_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
  }

  /** Funnel summary: how many keys reached each step (in order). The
    * conversion report built on [[funnelTimes]] — one row per step with
    * the step name, 1-based index, and distinct keys that reached it.
    *
    * All k step counts come from ONE aggregate over the funnel frame (a
    * union of per-step aggregates would re-execute the whole
    * [[funnelTimes]] subtree k times — k× the event scans for a k-row
    * result); the single count row then explodes into the per-step rows
    * driver-free.
    */
  def funnelSummary(events: DataFrame, steps: Seq[String],
      keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type",
      withinSeconds: Option[Long] = None): DataFrame = {
    val times = funnelTimes(events, steps, keyCol, tsCol, typeCol,
      withinSeconds)
    val counts = times.agg(
      count(col("t0")).as("c0"),
      steps.indices.drop(1).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step_idx"), lit(step).as("step"),
        col(s"c$i").as("n_keys"))
    }
    counts.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Hourly count anomalies per event type: bucket counts, z-score each
    * bucket against ITS type's hourly mean/stddev, keep |z| ≥ `zThreshold`
    * — the volume-anomaly monitor a validation pipeline runs beside the
    * content rules (a source that suddenly doubles its event rate is
    * suspect before any row rule fires).
    *
    * Two aggregates: hourly counts (one shuffle keyed by (type, hour)),
    * then per-type moments over the COUNT rows — |types|·|hours| rows, so
    * the second stage is broadcast-sized at any corpus scale. Counts are
    * integers: the mean is exact in doubles (< 2^53), only the z itself
    * rounds.
    */
  def hourlyAnomalies(events: DataFrame, zThreshold: Double = 2.0,
      tsCol: String = "ts", typeCol: String = "event_type"): DataFrame = {
    val hourly = events
      .groupBy(col(typeCol),
        date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("cnt"))
    val moments = hourly.groupBy(typeCol)
      .agg(avg(col("cnt")).as("mean_cnt"),
        stddev_pop(col("cnt")).as("std_cnt"))
    hourly.join(broadcast(moments), typeCol)
      .withColumn("z",
        round((col("cnt") - col("mean_cnt")) / col("std_cnt"), 6))
      // threshold the ROUNDED z: engines computing stddev by different
      // algorithms (Welford vs sum-of-squares) disagree at ~1e-12, which
      // must not flip membership for a bucket sitting on the threshold
      .where(col("std_cnt") > 0 && abs(col("z")) >= zThreshold)
      .select(col(typeCol),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("cnt"), col("z"))
  }

  /** Retention cohorts: users grouped by their FIRST active week (the
    * cohort), counted at each later week they were active — the classic
    * triangle a product-analytics engine emits, and the user-level
    * "does the population persist" monitor beside the per-type volume
    * anomalies.
    *
    * Shape: one distinct over (user, week) — the only corpus-keyed
    * shuffle; the cohort (min week per user) aggregate and the join back
    * both key on the SAME user column, so exchange reuse co-partitions
    * them; the final aggregate is |cohorts|·|weeks| rows. `count(*)` is
    * a distinct-user count by construction (each (user, week) pair occurs
    * once after the distinct, and a user's week maps to exactly one
    * offset). Week arithmetic is exact: date_trunc week-aligns both ends,
    * so the day difference is a multiple of 7.
    */
  def retentionCohorts(events: DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val userWeek = events
      .select(col(keyCol).as("k"),
        date_trunc("week", col(tsCol)).as("wk"))
      .distinct()
    val cohort = userWeek.groupBy("k").agg(min(col("wk")).as("cwk"))
    userWeek.join(cohort, Seq("k"))
      .groupBy(col("cwk"),
        (datediff(col("wk"), col("cwk")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("cwk"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
  }
}
