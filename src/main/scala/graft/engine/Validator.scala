package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rules._

/** The validation engine core.
  *
  * Design (SURVEY.md §3.1 "Spark equivalent"): one declarative job —
  *
  * {{{
  * scan(tokens) → single codegen pass evaluating ALL row rules
  *              → explode(filter(array(when(...)))) violation rows
  *   ∪ broadcast left_anti join (referential rules)
  *   ∪ two-phase hash aggregate (uniqueness rules)
  * → dedup/count aggregate → per-source summaries
  * }}}
  *
  * The reference's 4-service HTTP chain (mapper → marshal → blaze → termite,
  * /root/reference/docker-compose.yml:3-105) collapses into Catalyst
  * expression evaluation plus one BroadcastExchange. Every row rule is
  * evaluated in ONE scan (no per-rule passes): at 100 TB the scan dominates,
  * so rule count must not multiply I/O.
  */
object Validator {

  /** Violations from row-level rules: single pass, whole-stage codegen.
    * Output: (doc_id, rule_id, detail, severity, source).
    */
  def rowViolations(df: DataFrame, rules: Seq[Rule]): DataFrame =
    rowViolationsGated(df, rules.map(r => (r, None)))

  /** Row-rule pass with an optional extra gate per rule (the routed-dispatch
    * path: the gate is a `source`-membership predicate, so ALL rule sets
    * still evaluate in ONE scan — rule-set count must not multiply I/O, the
    * Spark analogue of the reference dispatching 827 per-code profiles
    * without re-reading pages, maps/validation_mapping.json:4-833).
    */
  def rowViolationsGated(
      df: DataFrame, rules: Seq[(Rule, Option[Column])]): DataFrame = {
    val hits = array(rules.map { case (rule, gate) =>
      val r = RuleCompiler.compileRow(rule)
      val violated = gate.map(_ && r.violated).getOrElse(r.violated)
      when(violated, struct(
        lit(r.id).as("rule_id"),
        r.detail.as("detail"),
        lit(r.severity).as("severity")))
    }: _*)
    // NOTE: no `where(size(hits) > 0)` — explode already drops empty
    // arrays, and an explicit filter gets pushed below the source
    // projection by PushDownPredicates, re-inlining the (non-codegen,
    // higher-order) hits expression into an interpreted Filter and
    // evaluating it twice per row (observed 24× slowdown at sf0.1).
    df.select(col("doc_id"), col("source"),
        filter(hits, h => h.isNotNull).as("hits"))
      .select(col("doc_id"), explode(col("hits")).as("v"), col("source"))
      .select(col("doc_id"), col("v.rule_id").as("rule_id"),
        col("v.detail").as("detail"), col("v.severity").as("severity"),
        col("source"))
  }

  /** Referential violations: broadcast hash anti-join against the dimension
    * (the reference's value-set membership check, SURVEY.md §2 row 10).
    * The dimension is small by definition (a value set) → broadcast, no
    * shuffle of the fact table.
    */
  def referentialViolations(
      df: DataFrame, rule: ReferentialRule, dim: DataFrame): DataFrame = {
    val dimCol = dim.columns.head
    df.join(broadcast(dim), df(rule.column) === dim(dimCol), "left_anti")
      .select(col("doc_id"), lit(rule.id).as("rule_id"),
        concat(lit(s"${rule.column}='"), col(rule.column),
          lit(s"' not in ${rule.dimension}")).as("detail"),
        lit(rule.severity).as("severity"), col("source"))
  }

  /** Referential violations against a LARGE dimension — the shuffle-join
    * path (SURVEY.md §2 row 10 at dimension sizes where a broadcast would
    * OOM the executors). The anti-join shuffles BOTH sides on the key: a
    * sort-merge (or shuffled-hash under AQE) join, never a broadcast — the
    * `merge` hint pins that so a misestimated dimension size can't flip the
    * plan into a driver-side collect of a TB-scale table. AQE skew-join
    * splitting handles hot FK values.
    */
  def referentialViolationsBigDim(
      df: DataFrame, rule: ReferentialRule, dim: DataFrame): DataFrame = {
    val dimCol = dim.columns.head
    df.join(dim.hint("merge"), df(rule.column) === dim(dimCol), "left_anti")
      .select(col("doc_id"), lit(rule.id).as("rule_id"),
        concat(lit(s"${rule.column}="), col(rule.column).cast("string"),
          lit(s" not in ${rule.dimension}")).as("detail"),
        lit(rule.severity).as("severity"), col("source"))
  }

  /** Uniqueness violations: two-phase hash aggregate on the key.
    *
    * Scale note: partial aggregation (map-side combine) collapses duplicate
    * keys before the exchange, so even a heavily duplicated key ships at most
    * one partial row per map task. AQE (enabled in [[graft.Sessions]])
    * re-splits any residual skewed reduce partition. One violation row per
    * duplicated key (not per duplicate row), matching the reference's
    * dedup-before-ship shape (IssueSet.py:9-26).
    *
    * Physical shape: `min(source)` (string buffer) forces SortAggregate
    * rather than HashAggregate. Measured (Explain --exp, 9.6M rows, 8
    * cores): 2.2s, vs 5.4s for the hash-agg-count + broadcast-rejoin
    * alternative — the rejoin loses because duplicate sets are NOT small
    * under skew (collapsed keys), which is exactly when uniqueness matters.
    */
  def uniqueViolations(df: DataFrame, rule: UniqueRule): DataFrame =
    df.groupBy(col(rule.column))
      .agg(count(lit(1)).as("cnt"), min(col("source")).as("source"))
      .where(col("cnt") > 1)
      .select(col(rule.column).cast("string").as("doc_id"),
        lit(rule.id).as("rule_id"),
        concat(lit(s"${rule.column} occurs "), col("cnt").cast("string"),
          lit(" times")).as("detail"),
        lit(rule.severity).as("severity"), col("source"))

  /** Full rule-set pass → detailed violations
    * (doc_id, rule_id, detail, severity, source).
    */
  def violations(
      df: DataFrame, ruleSet: RuleSet,
      dims: Map[String, DataFrame]): DataFrame = {
    val row = rowViolations(df, ruleSet.rowRules)
    val refs = ruleSet.referentialRules.map { r =>
      referentialViolations(df, r, dims(r.dimension))
    }
    val uniq = ruleSet.uniqueRules.map(uniqueViolations(df, _))
    (Seq(row) ++ refs ++ uniq).reduce(_ unionByName _)
  }

  /** Full pass under per-source rule-set ROUTING (SURVEY.md §2 rows 8/15;
    * the reference's validation_mapping.json dispatch). Semantics: a source
    * routed to rule set S is validated by S's rules only; unrouted sources
    * get `routing.defaultRuleSet`.
    *
    * Shape: every rule set's ROW rules evaluate in the same single scan,
    * gated by a source-membership predicate (no per-set passes). Dataset
    * rules (referential / uniqueness) run on the gated SLICE — uniqueness
    * under routing is per-slice by definition (a duplicate across
    * differently-routed sources is not a violation of either set).
    */
  def violationsRouted(
      df: DataFrame, routing: RuleSetLoader.Routing,
      dims: Map[String, DataFrame]): DataFrame = {
    // Fail fast on dangling config: a source routed to a nonexistent rule
    // set would otherwise be excluded from the default gate yet get no
    // rules — silently skipping validation for that slice.
    val unknown = routing.routing.collect {
      case (src, set) if !routing.ruleSets.contains(set) => s"$src -> $set"
    }
    require(unknown.isEmpty,
      s"routing targets missing from ruleSets: ${unknown.mkString(", ")}")
    require(routing.ruleSets.contains(routing.defaultRuleSet),
      s"defaultRuleSet '${routing.defaultRuleSet}' missing from ruleSets")
    val routedTo: Map[String, Seq[String]] =
      routing.routing.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted).toMap
    val routedElsewhere: Map[String, Seq[String]] =
      routing.ruleSets.keys.map { name =>
        name -> routing.routing.collect {
          case (src, s) if s != name => src
        }.toSeq.sorted
      }.toMap

    // Null-safe default gate: `!isin` yields NULL for a NULL source, which
    // would drop the row from EVERY rule set — a row silently escaping all
    // validation, the validator's core failure mode. A NULL source is by
    // definition unrouted, so it belongs to the default set (whose notNull
    // rules are exactly what should see it).
    def gateFor(setName: String): Option[Column] =
      if (setName == routing.defaultRuleSet) {
        val others = routedElsewhere(setName)
        if (others.isEmpty) None
        else Some(coalesce(!col("source").isin(others: _*), lit(true)))
      } else Some(col("source").isin(routedTo.getOrElse(setName, Nil): _*))

    val sets = routing.ruleSets.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        name == routing.defaultRuleSet || routedTo.contains(name)
      }
    val gatedRows = sets.flatMap { case (name, rs) =>
      rs.rowRules.map(r => (r, gateFor(name)))
    }
    val rowPart = rowViolationsGated(df, gatedRows)
    val slices = sets.map { case (name, rs) =>
      (rs, gateFor(name).map(df.where).getOrElse(df))
    }
    val refs = slices.flatMap { case (rs, slice) =>
      rs.referentialRules.map(r =>
        referentialViolations(slice, r, dims(r.dimension)))
    }
    val uniq = slices.flatMap { case (rs, slice) =>
      rs.uniqueRules.map(uniqueViolations(slice, _))
    }
    (Seq(rowPart) ++ refs ++ uniq).reduce(_ unionByName _)
  }

  /** Explicit salted two-phase uniqueness (north-star: "salted repartition
    * on skewed sources"). Phase 1 aggregates on (key, salt) — a hot key's
    * rows spread over `nSalt` reducers; phase 2 re-aggregates the ≤ nSalt
    * partials per key, so no reducer ever owns a whole hot key.
    *
    * When it matters: [[uniqueViolations]]'s single-phase aggregate is
    * already skew-safe for COUNT because map-side partial aggregation ships
    * at most one partial row per key per map task. Salting becomes necessary
    * when partial aggregation is ineffective or the per-key state is big —
    * distinct-style aggregates, collect_list, large sketch buffers — or when
    * a single reduce key would otherwise exceed executor memory. Output is
    * identical to [[uniqueViolations]] (asserted by ValidatorSpec).
    *
    * The salt derives from per-row payload (hash of n_tok, source, tokens)
    * PLUS `spark_partition_id()`, not from randomness — reruns over the same
    * layout are deterministic, and the partition-id term guarantees spread
    * even for the classic exact-dup skew case where a hot key's rows are
    * byte-identical (payload-only salt would collapse them all into ONE salt
    * bucket, degenerating the two-phase split back to single-phase).
    */
  def uniqueViolationsSalted(
      df: DataFrame, rule: UniqueRule, nSalt: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col("n_tok"), col("source"), col("tokens"),
        spark_partition_id()), lit(nSalt)))
    val phase1 = salted
      .groupBy(col(rule.column), col("_salt"))
      .agg(count(lit(1)).as("cnt1"), min(col("source")).as("src1"))
    val phase2 = phase1
      .groupBy(col(rule.column))
      .agg(sum(col("cnt1")).as("cnt"), min(col("src1")).as("source"))
      .where(col("cnt") > 1)
    phase2.select(col(rule.column).cast("string").as("doc_id"),
      lit(rule.id).as("rule_id"),
      concat(lit(s"${rule.column} occurs "), col("cnt").cast("string"),
        lit(" times")).as("detail"),
      lit(rule.severity).as("severity"), col("source"))
  }

  /** Ranked duplicate rows via a window function — the alternative
    * uniqueness formulation (SURVEY.md §2.6: `row_number().over(partitionBy
    * doc_id)`). Emits (doc_id, rn) for every row beyond the first per key.
    *
    * Scale trade-off vs [[uniqueViolations]]: the window shuffles EVERY row
    * by doc_id with no map-side combine (WindowExec needs all rows of a key
    * co-located), while the aggregate ships one partial row per key per map
    * task. At 10^12 rows the aggregate is the production path; the window
    * variant exists because it preserves the duplicate ROWS (not just
    * counts), which the report side sometimes wants.
    */
  def duplicatesRanked(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(col(keyCol), row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("n_tok"), col("source")))
        .as("rn"))
      .where(col("rn") > 1)
  }

  /** Top-k most-duplicated keys: hash aggregate then `TakeOrderedAndProject`
    * (orderBy + limit fuse into a per-partition top-k + driver merge — no
    * global sort, no full shuffle; SURVEY.md §2 row 4's `limit` combined
    * with row 31's sort).
    */
  def topDuplicatedKeys(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1)
      .orderBy(col("cnt").desc, col(keyCol))
      .limit(k)

  /** Error-contained rule-set pass (SURVEY.md §2 row 40): a rule that fails
    * to compile or resolve (unknown column, missing dimension, bad config)
    * becomes an `engine_error` violation row instead of aborting the run —
    * the reference's containment policy (HTTP/validation failures append a
    * processing issue and the run continues, main.py:225-263).
    *
    * Resolution is probed per rule against the frame's schema (cheap,
    * driver-side analysis only); healthy row rules still evaluate in ONE
    * batched scan — containment costs no extra passes.
    */
  def violationsContained(
      df: DataFrame, ruleSet: RuleSet,
      dims: Map[String, DataFrame]): DataFrame = {
    val spark = df.sparkSession

    def errorRow(ruleId: String, e: Throwable): DataFrame =
      spark.range(1).select(
        lit("-").as("doc_id"), lit(ruleId).as("rule_id"),
        lit(s"engine_error: ${e.getClass.getSimpleName}").as("detail"),
        lit("error").as("severity"), lit("-").as("source"))

    val (goodRows, badRows) = ruleSet.rowRules.partition { r =>
      try { df.select(RuleCompiler.compileRow(r).violated); true }
      catch { case _: Exception => false }
    }
    val rowPart =
      if (goodRows.nonEmpty) Seq(rowViolations(df, goodRows)) else Nil
    val rowErrs = badRows.map { r =>
      val err = try { df.select(RuleCompiler.compileRow(r).violated); null }
                catch { case e: Exception => e }
      errorRow(r.id, err)
    }
    val refs = ruleSet.referentialRules.map { r =>
      try referentialViolations(df, r, dims(r.dimension))
      catch { case e: Exception => errorRow(r.id, e) }
    }
    val uniq = ruleSet.uniqueRules.map { r =>
      try uniqueViolations(df, r)
      catch { case e: Exception => errorRow(r.id, e) }
    }
    (rowPart ++ rowErrs ++ refs ++ uniq).reduce(_ unionByName _)
  }

  /** Per-source validation with adaptive fallback (SURVEY.md §2 row 39, the
    * reference's `run_total_tests`, main.py:183-214): validate the slice for
    * `source`; if the filtered scan is EMPTY, record a warning and rerun
    * over the unfiltered table — the analogue of retrying a profile-filtered
    * search without `_profile` (main.py:191-206).
    *
    * Output: the per-source summary plus `fallback` and `note` columns. The
    * driver-side `isEmpty` branch is deliberate explicit control flow, not a
    * Catalyst concern (SURVEY.md §4).
    */
  def summaryWithFallback(
      df: DataFrame, source: String, ruleSet: RuleSet,
      dims: Map[String, DataFrame]): DataFrame = {
    val filtered = df.where(col("source") === lit(source))
    if (filtered.isEmpty) {
      summary(df, violations(df, ruleSet, dims))
        .withColumn("fallback", lit(true))
        .withColumn("note",
          lit(s"no rows for source '$source'; validated without filter"))
    } else {
      summary(filtered, violations(filtered, ruleSet, dims))
        .withColumn("fallback", lit(false))
        .withColumn("note", lit(""))
    }
  }

  /** Canonical 3-column violation projection. */
  def canonical(detailed: DataFrame): DataFrame =
    detailed.select("doc_id", "rule_id", "detail")

  /** Detail-string generalization before dedup: indices `[k]` → `[*]` and
    * quoted values `'v'` → `'?'`, the engine analogue of the reference's
    * location generalization (IssueSet.py:39-40) so per-row specifics don't
    * split dedup groups.
    */
  def generalize(detail: Column): Column =
    regexp_replace(
      regexp_replace(detail, "\\[[0-9]+\\]", "[*]"),
      "'[^']*'", "'?'")

  /** The reference's signature aggregate (IssueSet.py:9-26): dedup + count by
    * (severity, rule_id, generalized detail). Partial+final hash aggregate;
    * map-side combine compresses before the exchange exactly like the
    * reference dedups client-side before shipping the report.
    */
  def dedupIssues(detailed: DataFrame): DataFrame =
    detailed
      .select(col("severity"), col("rule_id"),
        generalize(col("detail")).as("detail_generic"))
      .groupBy("severity", "rule_id", "detail_generic")
      .agg(count(lit(1)).as("cnt"))

  /** Per-source rule matrix: violation count per (source, rule_id) — the
    * pass/fail matrix the driver compares (BASELINE.json metric).
    */
  def ruleMatrix(detailed: DataFrame): DataFrame =
    detailed.groupBy("source", "rule_id").agg(count(lit(1)).as("violations"))

  /** Per-source pass/fail summary (SURVEY.md §1.3 "report dict"). */
  def summary(df: DataFrame, detailed: DataFrame): DataFrame = {
    val rows = df.groupBy("source").agg(count(lit(1)).as("n_rows"))
    val viol = detailed.groupBy("source").agg(count(lit(1)).as("nv"))
    rows.join(viol, Seq("source"), "left")
      .select(col("source"), col("n_rows"),
        coalesce(col("nv"), lit(0L)).as("n_violations"),
        (coalesce(col("nv"), lit(0L)) === 0).as("pass"))
  }
}
