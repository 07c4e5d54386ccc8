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
  /** Above this many gated rules, the single-projection hits expression is
    * chunk-staged: whole-stage codegen inlines ALL expression code into one
    * `doConsume` method (variable-mode codegen cannot split), and past a few
    * hundred 3-part rules that method exceeds Janino's 64 KB limit
    * (measured: 1200 gated rules fail to compile in one WSCG projection).
    */
  private val GatedRuleChunkThreshold = 192

  /** >= spark.sql.codegen.maxFields (100): a staged projection this wide is
    * EXCLUDED from whole-stage codegen, so it compiles as a row-based
    * UnsafeProjection — which CAN split generated code into JIT-sized
    * methods. Row-based expression codegen, not interpretation: the cost vs
    * WSCG is the row-materialization boundary, not a 24× interpreter drop.
    */
  private val GatedRuleChunks = 101

  def rowViolationsGated(
      df: DataFrame, rules: Seq[(Rule, Option[Column])]): DataFrame = {
    // The hits array is a CONCAT of per-rule conditional sub-arrays (empty
    // when the rule passes), not `array(when…)` + a higher-order `filter`:
    // every HigherOrderFunction is CodegenFallback, and ONE such expression
    // in the projection bars the whole stage from whole-stage codegen — at
    // 827-profile dispatch cardinality that means evaluating hundreds of
    // interpreted CaseWhen branches per row. Concat/CaseWhen/CreateArray
    // all codegen, so the full multi-rule-set pass stays one compiled loop
    // (asserted by WideRoutingSpec at 400 rule sets / 1200 gated rules).
    val noHit = array().cast(
      "array<struct<rule_id:string,detail:string,severity:string>>")
    def hitsOf(rs: Seq[(Rule, Option[Column])]): Column =
      concat(rs.map { case (rule, gate) =>
        val r = RuleCompiler.compileRow(rule)
        val violated = gate.map(_ && r.violated).getOrElse(r.violated)
        when(violated, array(struct(
          lit(r.id).as("rule_id"),
          r.detail.as("detail"),
          lit(r.severity).as("severity"))))
          .otherwise(noHit)
      }: _*)

    // NOTE: no `where(size(hits) > 0)` — explode already drops empty
    // arrays, and an explicit filter gets pushed below the source
    // projection by PushDownPredicates, re-inlining the hits expression
    // into a Filter and evaluating it twice per row (observed 24×
    // slowdown at sf0.1 in the interpreted-HOF era; still 2× wasted today).
    val withHits =
      // empty rule list: concat() of zero typed arrays resolves as STRING
      // and breaks the explode — emit the typed empty array explicitly
      if (rules.isEmpty)
        df.select(col("doc_id"), col("source"), noHit.as("hits"))
      else if (rules.size <= GatedRuleChunkThreshold)
        df.select(col("doc_id"), col("source"), hitsOf(rules).as("hits"))
      else {
        // chunk-stage: ≥101 chunk columns push the projection out of WSCG
        // (splittable row-based codegen — Janino-safe at any rule count);
        // the re-concat references each chunk TWICE (when/otherwise, same
        // value) so CollapseProject cannot re-inline the non-cheap aliases
        // back into one giant single-method projection.
        val chunkSize = (rules.size + GatedRuleChunks - 1) / GatedRuleChunks
        val chunks = rules.grouped(chunkSize).toSeq
        val staged = df.select(
          col("doc_id") +: col("source") +:
            chunks.zipWithIndex.map { case (c, i) => hitsOf(c).as(s"_h$i") }: _*)
        // The always-empty NONDETERMINISTIC tail (slice start touches
        // spark_partition_id()) makes the hits alias non-pushable:
        // InferFiltersFromGenerate infers `size(hits) > 0` from the explode
        // and PushDownPredicates would otherwise substitute the ENTIRE rule
        // array into a scan-stage Filter — un-splittable in whole-stage
        // codegen, and the very 64 KB overflow the chunking exists to
        // prevent. With the tail, the inferred filter stays above this
        // projection as a cheap attribute check. (The slice(…,1,size) form
        // double-references each chunk so CollapseProject keeps the stage.)
        val nondetEmptyTail =
          slice(noHit, spark_partition_id() * 0 + 1, lit(0))
        staged.select(col("doc_id"), col("source"),
          concat(chunks.indices.map(i =>
            slice(col(s"_h$i"), lit(1), size(col(s"_h$i"))))
            :+ nondetEmptyTail: _*).as("hits"))
      }
    withHits
      .select(col("doc_id"), explode(col("hits")).as("v"), col("source"))
      .select(col("doc_id"), col("v.rule_id").as("rule_id"),
        col("v.detail").as("detail"), col("v.severity").as("severity"),
        col("source"))
  }

  /** Values a small dimension may hold before the predicate compilation
    * ([[referentialViolations]]) falls back to the broadcast anti-join.
    * Collecting up to this many values costs what the broadcast build
    * would have collected anyway.
    */
  private val SmallDimMaxValues = 10000

  /** Referential violations against a SMALL dimension (the reference's
    * value-set membership check, SURVEY.md §2 row 10).
    *
    * A value set is driver-small by definition — a broadcast join collects
    * it to the driver anyway — so the membership check compiles to a
    * STATIC `NOT IN` predicate instead of a broadcast anti-join. The
    * difference at scale is pruning: an anti-join cannot prune anything
    * (dynamic partition pruning does not apply to anti-joins), while the
    * static predicate prunes PARTITIONS when the checked column is the
    * partition key and pushes to row-group stats otherwise. Measured at
    * 38.4M rows / 8 threads: 0.12 s vs 3.1 s for the anti-join — and the
    * anti-join's cost was flat from 2 to 8 threads (it reads everything).
    *
    * NULL keys are violations (a null can't be in any value set) — the
    * `isNull ||` term matches the anti-join's null semantics exactly.
    * Dimensions larger than [[SmallDimMaxValues]] fall back to the
    * broadcast anti-join; truly large dimensions belong to
    * [[referentialViolationsBigDim]].
    */
  /** The dimension's non-null value list when it is small enough to
    * compile into a static predicate; None → anti-join territory. Null dim
    * entries are dropped: a NULL in the isin literal list makes `!isin`
    * NULL for every non-member (silently disarming the rule), while a null
    * dim entry can never whitelist anything under the anti-join semantics
    * the predicate replaces.
    */
  private def smallDimValues(dim: DataFrame): Option[Seq[Any]] = {
    val dimCol = dim.columns.head
    val values = dim.select(dimCol).limit(SmallDimMaxValues + 1)
      .collect().map(_.get(0)).filter(_ != null)
    if (values.length <= SmallDimMaxValues) Some(values.toSeq) else None
  }

  /** The small-dim membership check as a fusable ROW rule (round 7): the
    * compiled predicate+detail are identical to [[referentialViolations]]'s
    * small-dim leg, but riding the shared single-scan row pass saves one
    * corpus scan per referential rule in every composed violations plan.
    */
  private def valueSetRule(rule: ReferentialRule, values: Seq[Any]): Rule =
    ValueSetRule(rule.id, rule.column, values, rule.dimension, rule.severity)

  def referentialViolations(
      df: DataFrame, rule: ReferentialRule, dim: DataFrame): DataFrame = {
    val base = smallDimValues(dim) match {
      case Some(values) =>
        df.where(col(rule.column).isNull ||
          !col(rule.column).isin(values: _*))
      case None =>
        val dimCol = dim.columns.head
        df.join(broadcast(dim), df(rule.column) === dim(dimCol), "left_anti")
    }
    base.select(col("doc_id"), lit(rule.id).as("rule_id"),
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
  def uniqueViolations(df: DataFrame, rule: UniqueRule): DataFrame = {
    val keys = rule.keyColumns
    // the internal alias keeps the aggregate distinct from a grouping
    // column when `source` is itself part of a composite key
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), min(col("source")).as("_src"))
      .where(col("cnt") > 1)
      .select(uniqueKeyRendered(rule).as("doc_id"),
        lit(rule.id).as("rule_id"),
        concat(lit(s"${uniqueKeyLabel(rule)} occurs "),
          col("cnt").cast("string"), lit(" times")).as("detail"),
        lit(rule.severity).as("severity"), col("_src").as("source"))
  }

  /** Composite keys render `|`-joined into the violation's doc_id slot
    * (single-column keys keep the exact cast-to-string form, including
    * NULL → NULL); the detail labels the full key tuple.
    */
  private def uniqueKeyRendered(rule: UniqueRule): Column =
    if (rule.moreColumns.isEmpty) col(rule.column).cast("string")
    else concat_ws("|", rule.keyColumns.map(c => col(c).cast("string")): _*)

  private def uniqueKeyLabel(rule: UniqueRule): String =
    if (rule.moreColumns.isEmpty) rule.column
    else rule.keyColumns.mkString("(", ",", ")")

  /** Full rule-set pass → detailed violations
    * (doc_id, rule_id, detail, severity, source).
    *
    * Round 7: small-dimension referential rules compile into the SAME
    * single-scan row pass (guide §2.4 — each previously paid its own
    * corpus scan as a union branch; the value set was already collected
    * at plan time either way). Large dimensions keep the anti-join leg.
    */
  /** The rule set's row rules with every small-dimension referential rule
    * fused in as a [[graft.rules.ValueSetRule]], plus the big-dimension
    * referential rules left for the anti-join leg — the shared split
    * behind [[violations]] and the one-pass subset diff
    * ([[graft.report.ReportOps.diffReportSubset]]).
    */
  def fusedRowRules(ruleSet: RuleSet, dims: Map[String, DataFrame])
      : (Seq[Rule], Seq[ReferentialRule]) = {
    val resolved = ruleSet.referentialRules
      .map(r => r -> smallDimValues(dims(r.dimension)))
    (ruleSet.rowRules ++ resolved.collect {
      case (r, Some(values)) => valueSetRule(r, values)
    }, resolved.collect { case (r, None) => r })
  }

  def violations(
      df: DataFrame, ruleSet: RuleSet,
      dims: Map[String, DataFrame]): DataFrame = {
    val (fusedRow, bigRefs) = fusedRowRules(ruleSet, dims)
    val row = rowViolations(df, fusedRow)
    val refs = bigRefs.map(r => referentialViolations(df, r, dims(r.dimension)))
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
    // small-dim referential rules ride the shared row-rule scan with the
    // set's gate as their predicate gate (round 7 — previously one corpus
    // scan per (set, referential rule) as a union branch); large dims keep
    // the per-slice anti-join
    val resolvedRefs = sets.map { case (name, rs) =>
      (name, rs, rs.referentialRules
        .map(r => r -> smallDimValues(dims(r.dimension))))
    }
    val gatedRows = resolvedRefs.flatMap { case (name, rs, refs) =>
      rs.rowRules.map(r => (r, gateFor(name))) ++
        refs.collect { case (r, Some(values)) =>
          (valueSetRule(r, values), gateFor(name))
        }
    }
    val rowPart = rowViolationsGated(df, gatedRows)
    val bigRefs = resolvedRefs.flatMap { case (name, _, refs) =>
      refs.collect { case (r, None) =>
        referentialViolations(
          gateFor(name).map(df.where).getOrElse(df), r, dims(r.dimension))
      }
    }
    val uniq = sets.flatMap { case (name, rs) =>
      val slice = gateFor(name).map(df.where).getOrElse(df)
      rs.uniqueRules.map(uniqueViolations(slice, _))
    }
    (Seq(rowPart) ++ bigRefs ++ uniq).reduce(_ unionByName _)
  }

  /** Routed dispatch at HIGH rule-set cardinality — the reference's actual
    * shape: its 827 per-LOINC profiles share one structure and differ only
    * in parameters (maps/validation_mapping.json:4-833). Instead of gating
    * each set's rules (per-row cost O(#sets × #rules), and a generated-code
    * size that grows with the config), the family is CLUSTERED by rule-set
    * signature (the rule list with RangeRule bounds erased) and each
    * cluster compiles to one template instantiation:
    *
    *  - rules IDENTICAL across a cluster's sets → evaluated once, gated by
    *    cluster membership (`_grp` from the broadcast parameter dimension);
    *  - [[graft.rules.RangeRule]]s that differ only in bounds → ONE
    *    [[graft.rules.ColumnBoundsRule]] template per cluster whose bounds
    *    are joined from the same dimension (NULL bounds self-gate, so other
    *    clusters' rows never fire the template);
    *  - the default rule set's rules → gated by NOT-routed (null-safe).
    *
    * One scan + one broadcast hash join for ALL row rules; per-row cost
    * O(#signature-clusters × #template-rules), INDEPENDENT of rule-set
    * count — 827 or 80,000 profiles over a handful of shapes cost the same
    * per row, and the generated code grows with the cluster count, not the
    * config (WideRoutingSpec asserts whole-stage codegen with JIT-sized
    * methods at 400 sets). Dataset-level rules collapse per DISTINCT rule,
    * across clusters: uniqueness is per-slice BY DEFINITION, so every
    * cluster sharing a unique rule pools into ONE aggregate on the
    * compound key (set, column) — a single shuffle however many sets — and
    * referential rules (row-local) pool into one membership check over the
    * union of their clusters' rows. The gated path runs one aggregate per
    * SLICE; this runs one per distinct dataset rule.
    *
    * A fully heterogeneous config (every set its own signature) still
    * compiles — it degenerates to one gated template per set, the same
    * per-row work as [[violationsRouted]] with the gates supplied by the
    * broadcast join instead of literal source lists. Only an empty routed
    * family falls back.
    */
  def violationsRoutedWide(
      df: DataFrame, routing: RuleSetLoader.Routing,
      dims: Map[String, DataFrame]): DataFrame = {
    val dangling = routing.routing.collect {
      case (src, set) if !routing.ruleSets.contains(set) => s"$src -> $set"
    }
    require(dangling.isEmpty,
      s"routing targets missing from ruleSets: ${dangling.mkString(", ")}")
    val routedSets = routing.routing.values.toSet
    val family = routing.ruleSets.view
      .filterKeys(n => routedSets.contains(n) && n != routing.defaultRuleSet)
      .toMap
    val defaultSet = routing.ruleSets.get(routing.defaultRuleSet)
    if (family.isEmpty) return violationsRouted(df, routing, dims)

    val spark = df.sparkSession

    // Signature: the rule list with RangeRule bounds erased (id/column/
    // severity/appliesTo kept — a per-set appliesTo restriction is part of
    // the template, never silently dropped). Two sets cluster together iff
    // they instantiate the same template.
    def signature(rs: RuleSet): Seq[Any] = rs.rules.map {
      case r: RangeRule => ("range", r.id, r.column, r.severity, r.appliesTo)
      case other => other
    }
    // deterministic cluster order: by lexicographically-first member name
    val clusters: Seq[(Seq[(String, RuleSet)], Int)] =
      family.toSeq.sortBy(_._1)
        .groupBy { case (_, rs) => signature(rs) }
        .values.toSeq.sortBy(_.head._1).zipWithIndex
    val setToGrp: Map[String, Int] = clusters.flatMap {
      case (members, gi) => members.map { case (name, _) => name -> gi }
    }.toMap

    // Per cluster: the template, and which of its RangeRules actually VARY
    // in bounds across the cluster (constant ranges stay literal rules —
    // smaller generated code, pushable predicates).
    final case class Cluster(
        gi: Int, members: Seq[(String, RuleSet)],
        paramTpl: Seq[RangeRule], shared: RuleSet)
    val compiled = clusters.map { case (members, gi) =>
      val template = members.head._2.rules
      val paramTpl = template.collect {
        case r: RangeRule if members.exists(_._2.rules.exists {
          case o: RangeRule => o.id == r.id && (o.lo != r.lo || o.hi != r.hi)
          case _ => false
        }) => r
      }
      val paramIds = paramTpl.map(_.id).toSet
      Cluster(gi, members, paramTpl,
        RuleSet(s"_tpl$gi", template.filterNot(r => paramIds.contains(r.id))))
    }

    // parameter dimension: one row per ROUTED source carrying its set name
    // (the slice key for compound-key dataset rules), its cluster id, and
    // that source's bounds for every parameterized rule of ITS cluster
    // (null elsewhere) — config-sized (the analogue of
    // validation_mapping.json itself), broadcast to the scan
    val paramCols: Seq[(Int, RangeRule)] =
      compiled.flatMap(c => c.paramTpl.map(t => (c.gi, t)))
    val paramRows: Seq[org.apache.spark.sql.Row] =
      // a source explicitly routed to the DEFAULT set is not in the family:
      // it gets no dimension row, joins null, and lands in the default gate
      // below — the same semantics the gated path gives it
      routing.routing.toSeq.filter(e => family.contains(e._2))
        .sortBy(_._1).map { case (src, setName) =>
        val rs = routing.ruleSets(setName)
        val gi = setToGrp(setName)
        val bounds = paramCols.flatMap { case (g, t) =>
          if (g != gi) Seq(null, null)
          else {
            val r = rs.rules.collectFirst {
              case o: RangeRule if o.id == t.id => o
            }.get
            Seq(java.lang.Long.valueOf(r.lo), java.lang.Long.valueOf(r.hi))
          }
        }
        org.apache.spark.sql.Row.fromSeq(src +: setName +: gi +: bounds)
      }
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    def loCol(gi: Int, id: String) = s"_lo_g${gi}_$id"
    def hiCol(gi: Int, id: String) = s"_hi_g${gi}_$id"
    val paramSchema = StructType(
      StructField("source", StringType) ::
      StructField("_set", StringType) ::
      StructField("_grp", IntegerType) ::
      paramCols.flatMap { case (g, t) => Seq(
        StructField(loCol(g, t.id), LongType),
        StructField(hiCol(g, t.id), LongType))
      }.toList)
    val paramDim = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(paramRows).asJava,
      paramSchema)

    val joined = df.join(broadcast(paramDim), Seq("source"), "left")

    // cluster rules gate by `_grp`; default rules gate by NOT routed —
    // null-safe by construction (a NULL source joins nothing → _set null →
    // the row lands in the default set, whose notNull rules should see it)
    val routedGate = col("_set").isNotNull
    val paramRules: Seq[(Rule, Option[Column])] =
      paramCols.map { case (g, t) =>
        (ColumnBoundsRule(t.id, t.column, loCol(g, t.id), hiCol(g, t.id),
          t.severity, t.appliesTo): Rule) -> None // null bounds self-gate
      }
    val sharedRules = compiled.flatMap { c =>
      val gate: Option[Column] =
        if (clusters.size == 1) Some(routedGate)
        else Some(col("_grp") === lit(c.gi))
      c.shared.rowRules.map(r => r -> gate)
    }
    val defaultRows = defaultSet.toSeq.flatMap(_.rowRules.map(
      r => r -> (Some(!routedGate): Option[Column])))
    val rowPart =
      rowViolationsGated(joined, sharedRules ++ paramRules ++ defaultRows)

    // dataset rules collapse per DISTINCT rule across clusters: one
    // compound-key aggregate / membership check over the union of the
    // clusters that carry the rule (one shuffle per distinct rule, not per
    // set and not per cluster)
    def clusterGate(gis: Seq[Int]): Column =
      if (gis.size == clusters.size) routedGate
      else col("_grp").isin(gis: _*)
    val uniqJobs = compiled.flatMap(c => c.shared.uniqueRules.map(_ -> c.gi))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
      .sortBy(_._1.id)
    val uniqParts = uniqJobs.map { case (u, gis) =>
      joined.where(clusterGate(gis))
        .groupBy(col("_set"), col(u.column))
        .agg(count(lit(1)).as("cnt"), min(col("source")).as("source"))
        .where(col("cnt") > 1)
        .select(col(u.column).cast("string").as("doc_id"),
          lit(u.id).as("rule_id"),
          concat(lit(s"${u.column} occurs "), col("cnt").cast("string"),
            lit(" times")).as("detail"),
          lit(u.severity).as("severity"), col("source"))
    }
    val refJobs = compiled
      .flatMap(c => c.shared.referentialRules.map(_ -> c.gi))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
      .sortBy(_._1.id)
    val refParts = refJobs.map { case (r, gis) =>
      referentialViolations(joined.where(clusterGate(gis)), r,
        dims(r.dimension))
    }
    val defaultSlice = joined.where(!routedGate)
    val defaultUniq = defaultSet.toSeq.flatMap(_.uniqueRules.map(
      uniqueViolations(defaultSlice, _)))
    val defaultRefs = defaultSet.toSeq.flatMap(_.referentialRules.map(r =>
      referentialViolations(defaultSlice, r, dims(r.dimension))))
    (Seq(rowPart) ++ uniqParts ++ refParts ++ defaultUniq ++ defaultRefs)
      .reduce(_ unionByName _)
  }

  /** Row-rule union order note (round 7): fusing small-dim referential
    * rules into the row pass changes the ORDER violations appear in the
    * returned frame (they now interleave with row-rule hits instead of
    * following them as a union branch); every consumer aggregates or
    * applies a deterministic sort, so outputs are unchanged (multiset
    * identity pinned by the oracle on every registry query).
    */

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
    val keys = rule.keyColumns
    val salted = df.withColumn("_salt",
      pmod(hash(col("n_tok"), col("source"), col("tokens"),
        spark_partition_id()), lit(nSalt)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("cnt1"), min(col("source")).as("src1"))
    val phase2 = phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt1")).as("cnt"), min(col("src1")).as("_src"))
      .where(col("cnt") > 1)
    phase2.select(uniqueKeyRendered(rule).as("doc_id"),
      lit(rule.id).as("rule_id"),
      concat(lit(s"${uniqueKeyLabel(rule)} occurs "),
        col("cnt").cast("string"), lit(" times")).as("detail"),
      lit(rule.severity).as("severity"), col("_src").as("source"))
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

  /** Functional-dependency consistency (dataset-level): every occurrence of
    * a key must carry the SAME dependent value — the cross-row
    * generalization of the row-local fixed-value check (the reference's
    * per-instance profile validation cannot express this; it falls out of
    * the engine's aggregate form for free). One violation row per key whose
    * dependents disagree, with the distinct-value count in the detail.
    *
    * Plan: single hash aggregate keyed by `keyCol` (count_distinct partial
    * map-side like any aggregate) — same one-shuffle shape and skew
    * characteristics as [[uniqueViolations]], salting applies identically.
    */
  def fdViolations(df: DataFrame, ruleId: String,
      keyCol: String, dependentCol: String,
      severity: String = "error"): DataFrame =
    df.groupBy(col(keyCol))
      .agg(countDistinct(col(dependentCol)).as("nvals"),
        min(col("source")).as("source"))
      .where(col("nvals") > 1)
      .select(col(keyCol).cast("string").as("doc_id"),
        lit(ruleId).as("rule_id"),
        concat(lit(s"$dependentCol has "), col("nvals").cast("string"),
          lit(s" distinct values for one $keyCol")).as("detail"),
        lit(severity).as("severity"), col("source"))

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
  def summary(df: DataFrame, detailed: DataFrame): DataFrame =
    summaryFromCounts(
      df.groupBy("source").agg(count(lit(1)).as("n_rows")), detailed)

  /** Summary from PRE-COMPUTED per-source row counts — when the pipeline
    * already aggregated the table (column stats, a metrics table, Iceberg
    * manifest counts), re-scanning 100 TB just to count rows again is a
    * wasted full pass; feed those counts here instead. `rowCounts`:
    * (source, n_rows).
    */
  def summaryFromCounts(rowCounts: DataFrame, detailed: DataFrame): DataFrame = {
    val viol = detailed.groupBy("source").agg(count(lit(1)).as("nv"))
    // null-safe join key: NULL source is a real slice (the default-routed
    // one) — a plain equi-join drops its violation count on the floor and
    // reports the slice as passing (the summary-side face of the
    // null-source escape hole ADVICE r5 flagged in SnapshotDiff)
    rowCounts.select(col("source"), col("n_rows"))
      .join(viol.select(col("source").as("_vsrc"), col("nv")),
        col("source") <=> col("_vsrc"), "left")
      .select(col("source"), col("n_rows"),
        coalesce(col("nv"), lit(0L)).as("n_violations"),
        (coalesce(col("nv"), lit(0L)) === 0).as("pass"))
  }
}
