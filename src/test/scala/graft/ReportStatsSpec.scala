package graft

import org.apache.spark.sql.functions._
import graft.engine.StatsOps
import graft.model.DetailedViolation
import graft.operators.SampleOps
import graft.report.ReportOps

/** Round-5 operators: cross-snapshot violation diff, algebraic stats
  * rollup, stratified sampling.
  */
class ReportStatsSpec extends SparkSpec {
  import spark.implicits._

  private def v(id: String, rule: String, src: String) =
    DetailedViolation(id, rule, "d", "error", src)

  test("diffReport classifies new / resolved / persisting per rule") {
    val current = Seq(v("x", "r1", "A"), v("y", "r1", "A"), v("z", "r2", "N"),
      v("x", "r1", "A")).toDF() // duplicate rows collapse by identity
    val baseline = Seq(v("x", "r1", "A"), v("w", "r2", "N")).toDF()
    val got = ReportOps.diffReport(current, baseline)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("r1", "persisting", 1L), // x
      ("r1", "new", 1L),        // y
      ("r2", "new", 1L),        // z
      ("r2", "resolved", 1L)))  // w
    // identical snapshots → everything persisting, nothing new/resolved
    val same = ReportOps.diffReport(baseline, baseline)
      .as[(String, String, Long)].collect().toSet
    assert(same === Set(("r1", "persisting", 1L), ("r2", "persisting", 1L)))
  }

  test("mergeable stats roll up to direct global stats from ANY grouping") {
    val t = (0 until 500).map(i =>
      (s"d$i", if (i % 107 == 0) null else Array(1, 2), (i * 13) % 61 + 1,
        Seq("A", "N", "R", "Q")(i % 4)))
      .toDF("doc_id", "tokens", "n_tok", "source")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().head
    // direct single-level aggregation (the ground truth)
    val direct = rows(t.agg(
      count(lit(1)).as("n_rows"), sum(col("n_tok")).as("sum"),
      min(col("n_tok")).as("min"), max(col("n_tok")).as("max"),
      sum(col("tokens").isNull.cast("long")).as("nulls"),
      avg(col("n_tok")).as("avg"), var_pop(col("n_tok")).as("var")))
    // rolled up from per-source partials
    val merged = rows(StatsOps.mergeStatParts(StatsOps.mergeableStats(t)))
    assert(merged.getAs[Long]("n_rows") === direct.getAs[Long]("n_rows"))
    assert(merged.getAs[Long]("sum_n_tok") === direct.getAs[Long]("sum"))
    assert(merged.getAs[Int]("min_n_tok") === direct.getAs[Int]("min"))
    assert(merged.getAs[Int]("max_n_tok") === direct.getAs[Int]("max"))
    assert(merged.getAs[Long]("null_tokens") === direct.getAs[Long]("nulls"))
    assert(math.abs(merged.getAs[Double]("avg_n_tok")
      - direct.getAs[Double]("avg")) < 1e-12)
    assert(math.abs(merged.getAs[Double]("var_n_tok")
      - direct.getAs[Double]("var")) < 1e-9)
    // the rollup is grouping-invariant: partials keyed by a DIFFERENT
    // column merge to the identical global row (exact integer accumulators
    // — no float order dependence)
    val byDoc = rows(StatsOps.mergeStatParts(
      StatsOps.mergeableStats(t, by = "doc_id")))
    assert(byDoc.toSeq === merged.toSeq)
  }

  test("stratified sample: per-stratum thresholds, layout-invariant") {
    val t = (0 until 1000).map(i =>
      (s"d$i", Seq("A", "N", "R", "Q")(i % 4))).toDF("doc_id", "stratum")
    val pcts = Map("A" -> 50, "N" -> 10)
    val got = SampleOps.stratifiedSample(t, "doc_id", "stratum", pcts, 25)
    // equals the manual per-stratum hash predicate
    val expect = t.where(
      SampleOps.hashBucket(col("doc_id"), 100) <
        when(col("stratum") === "A", 50)
          .when(col("stratum") === "N", 10).otherwise(25))
      .as[(String, String)].collect().toSet
    assert(got.as[(String, String)].collect().toSet === expect)
    assert(expect.nonEmpty)
    // strata not in the map (R, Q) fall to the default threshold
    val kept = got.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(kept("A") > kept("N")) // 50% vs 10%, 250 docs each
    assert(kept.contains("R") && kept.contains("Q"))
    // layout-invariance: same documents kept under any partitioning
    val re = SampleOps.stratifiedSample(
        t.repartition(9).orderBy(col("doc_id").desc),
        "doc_id", "stratum", pcts, 25)
      .as[(String, String)].collect().toSet
    assert(re === expect)
  }

  test("ruleExemplars keeps the first k per rule by the total order") {
    val vs = Seq(
      v("d3", "r1", "A"), v("d1", "r1", "A"), v("d2", "r1", "B"),
      v("d4", "r1", "A"), v("d9", "r2", "N")).toDF()
    val got = ReportOps.ruleExemplars(vs, 2)
      .select("rule_id", "rank", "doc_id")
      .as[(String, Int, String)].collect().toSet
    assert(got === Set(
      ("r1", 1, "d1"), ("r1", 2, "d2"), ("r2", 1, "d9")))
    // layout-invariant: same exemplars under any partitioning
    val re = ReportOps.ruleExemplars(vs.repartition(7), 2)
      .select("rule_id", "rank", "doc_id")
      .as[(String, Int, String)].collect().toSet
    assert(re === got)
  }

  test("centroidShift is 1.0 for identical cohorts, lower for shifted") {
    import graft.operators.SimilarityOps
    val base = Seq(
      (0L, Seq(1.0f, 0.0f, 2.0f), 7),
      (2L, Seq(0.0f, 1.0f, 1.0f), 7))
    // cohort 1 = exact copies (odd vec_ids) → centroids identical
    val same = (base ++ base.map { case (id, e, l) => (id + 1, e, l) })
      .toDF("vec_id", "embedding", "label")
    val gotSame = SimilarityOps.centroidShift(same, "label",
        col("vec_id") % 2)
      .as[(Int, Double)].collect().toMap
    assert(gotSame(7) === 1.0)
    // cohort 1 orthogonal to cohort 0 → shift 0
    val shifted = (Seq((0L, Seq(1.0f, 0.0f), 5)) ++
      Seq((1L, Seq(0.0f, 1.0f), 5))).toDF("vec_id", "embedding", "label")
    val gotShift = SimilarityOps.centroidShift(shifted, "label",
        col("vec_id") % 2)
      .as[(Int, Double)].collect().toMap
    assert(gotShift(5) === 0.0)
  }

  test("markdown render: per-category sections, exact totals, escaped pipes") {
    import graft.engine.Validator
    import graft.report.ReportOps
    import graft.rules.RuleSet
    import graft.sources.TokenTable
    val tok = TokenTable.tokens(spark, sf0001)
    val detailed = Validator.violations(tok,
      RuleSet.default(TokenTable.Vocab),
      Map("allowed_sources" -> TokenTable.allowedDim(spark)))
    val report = ReportOps.assemble(detailed, Seq("ref_source"))
    val md = ReportOps.renderMarkdown(report, "validation report")
    assert(md.startsWith("# validation report"))
    assert(md.contains("## Fdpg") && md.contains("## General"))
    val total = report.agg(sum("cnt")).as[Long].collect().head
    assert(md.contains(s"Total findings: **$total**"))
    // one table row per report row
    assert(md.linesIterator.count(l =>
      l.startsWith("| ") && !l.startsWith("| severity")) ===
      report.count().toInt)
  }

  test("one-pass subset diff equals the two-pass diff, incl. min-source drift") {
    import graft.engine.Validator
    import graft.rules.{RuleSet, UniqueRule}
    import graft.sources.TokenTable

    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("rule_id", "status", "cnt")
        .as[(String, String, Long)].collect().toSet

    // corner fixture: dup key whose baseline min(source) differs from the
    // full table's — the base-only identity must appear as `resolved`
    val rules = RuleSet("t", Seq(UniqueRule("u", "doc_id")))
    val df = Seq(
      ("x", "A", false), ("x", "B", true), ("x", "C", true),
      ("y", "A", true), ("y", "A", true),
      ("z", "N", false)
    ).toDF("doc_id", "source", "is_base")
      .withColumn("tokens", array(lit(1))).withColumn("n_tok", lit(1))
    val onePass = ReportOps.diffReportSubset(
      df, rules, Map.empty, col("is_base"))
    val twoPass = ReportOps.diffReport(
      Validator.violations(df, rules, Map.empty),
      Validator.violations(df.where(col("is_base")), rules, Map.empty))
    assert(asSet(onePass) === asSet(twoPass))
    assert(asSet(onePass).exists(_._2 == "resolved"),
      "min-source drift corner must surface a resolved row")

    // and on the fixture corpus with the full default rule set
    val tok = TokenTable.tokens(spark, sf0001)
    val ruleSet = RuleSet.default(TokenTable.Vocab)
    val dims = Map("allowed_sources" -> TokenTable.allowedDim(spark))
    val op = ReportOps.diffReportSubset(tok, ruleSet, dims,
      col("okey") % 2 === 0)
    val tp = ReportOps.diffReport(
      Validator.violations(tok, ruleSet, dims),
      Validator.violations(tok.where(col("okey") % 2 === 0), ruleSet, dims))
    assert(asSet(op) === asSet(tp))
  }
}
