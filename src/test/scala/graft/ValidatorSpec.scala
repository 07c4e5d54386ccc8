package graft

import org.apache.spark.sql.functions._
import graft.engine.Validator
import graft.model.TokenRow
import graft.rules._

/** Golden per-rule fixtures — the engine analogue of the reference's
  * pass/fail fixture pairs with exact expected diagnostics
  * (/root/reference/extraction/test/test_profiles.py).
  */
class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    TokenRow("ok-1", Array(1, 2, 3), 3, "A"),          // passes everything
    TokenRow("len-1", Array(1, 2), 3, "A"),            // length mismatch
    TokenRow("null-1", null, 2, "N"),                  // null tokens
    TokenRow("bound-1", Array(1, 50000), 2, "R"),      // token out of vocab
    TokenRow("dup-1", Array(7), 1, "A"),               // duplicate pair…
    TokenRow("dup-1", Array(8), 1, "N"),
    TokenRow("ref-1", Array(9), 1, "bogus")            // unknown source
  ).toDF

  private val ruleSet = RuleSet.default(50000)
  private def dims = Map("allowed_sources" ->
    graft.sources.TokenTable.allowedDim(spark))

  test("full rule set emits exactly the expected violation rows") {
    val got = Validator.canonical(
        Validator.violations(fixture, ruleSet, dims))
      .as[(String, String, String)].collect().toSet
    val expected = Set(
      ("len-1", "len_consistency", "n_tok=3 size=2"),
      ("null-1", "not_null_tokens",
        "tokens is null: minimum required = 1, but only found 0"),
      ("bound-1", "token_bounds", "token out of [0,50000)"),
      ("dup-1", "unique_doc_id", "doc_id occurs 2 times"),
      ("ref-1", "ref_source", "source='bogus' not in allowed_sources"))
    assert(got === expected)
  }

  test("per-source summary marks only clean sources as pass") {
    val v = Validator.violations(fixture, ruleSet, dims)
    // every source in the fixture has at least one violation
    val byName = Validator.summary(fixture, v).collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(byName === Map("A" -> false, "N" -> false, "R" -> false,
      "bogus" -> false))
    val clean = Seq(TokenRow("c1", Array(1), 1, "A")).toDF
    val vc = Validator.violations(clean, ruleSet, dims)
    val sc = Validator.summary(clean, vc).collect().head
    assert(sc.getString(0) == "A" && sc.getLong(1) == 1L &&
      sc.getLong(2) == 0L && sc.getBoolean(3))
  }

  test("violations are invariant under repartitioning and row order") {
    val base = Validator.canonical(
      Validator.violations(fixture, ruleSet, dims)).collect().toSet
    val shuffled = fixture.repartition(7).sortWithinPartitions(rand(seed = 1))
    val got = Validator.canonical(
      Validator.violations(shuffled, ruleSet, dims)).collect().toSet
    assert(got === base)
  }

  test("dedup aggregate counts and generalizes like IssueSet") {
    val v = Validator.violations(fixture, ruleSet, dims)
    val d = Validator.dedupIssues(v).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(d.contains(("ref_source", "source='?' not in allowed_sources", 1L)))
    assert(d.exists { case (id, _, _) => id == "len_consistency" })
  }

  test("rule-set dispatch: appliesTo restricts a rule to one source") {
    val rs = RuleSet("routed", Seq(
      LengthConsistencyRule("len_a_only", "tokens", "n_tok",
        appliesTo = Some("A"))))
    val df = Seq(
      TokenRow("a", Array(1), 2, "A"),   // violates, source matches
      TokenRow("n", Array(1), 2, "N")    // violates but not routed
    ).toDF
    val got = Validator.rowViolations(df, rs.rowRules)
      .select("doc_id").as[String].collect().toSet
    assert(got === Set("a"))
  }

  test("routed dispatch: each source validated by its routed set only") {
    val routing = RuleSetLoader.parse(
      """{ "ruleSets": {
        |   "strict": [
        |     {"type":"tokenBounds","id":"token_bounds","arrayColumn":"tokens","lo":0,"hi":50000,"severity":"warning"},
        |     {"type":"unique","id":"unique_doc_id","column":"doc_id","severity":"warning"},
        |     {"type":"referential","id":"ref_source","column":"source","dimension":"allowed_sources"}
        |   ],
        |   "lenient": [
        |     {"type":"lengthConsistency","id":"len_consistency","arrayColumn":"tokens","lengthColumn":"n_tok"}
        |   ]},
        |  "routing": { "A": "lenient" },
        |  "defaultRuleSet": "strict" }""".stripMargin)
    val got = Validator.canonical(
        Validator.violationsRouted(fixture, routing, dims))
      .as[(String, String, String)].collect().toSet
    // A rows: lenient only → len-1 fires, dup-1/dup-1(A) exempt from unique;
    // others: strict only → bound-1 (R), ref-1 (bogus); the dup pair is
    // split across slices (A routed away), so NO uniqueness violation
    val expected = Set(
      ("len-1", "len_consistency", "n_tok=3 size=2"),
      ("bound-1", "token_bounds", "token out of [0,50000)"),
      ("ref-1", "ref_source", "source='bogus' not in allowed_sources"))
    assert(got === expected)
  }

  test("small-dim referential compiles to a pushable predicate; null key violates") {
    import graft.sources.TokenTable
    val df = Seq(
      TokenRow("ok", Array(1), 1, "A"),
      TokenRow("bad", Array(1), 1, "nope"),
      TokenRow("nul", Array(1), 1, null)).toDF
    val v = Validator.referentialViolations(df,
      ReferentialRule("ref_source", "source", "allowed_sources"),
      TokenTable.allowedDim(spark))
    // null keys are violations, same as the anti-join semantics
    assert(v.select("doc_id").as[String].collect().toSet === Set("bad", "nul"))
    // and the plan is a predicate, not a join (pruning-capable at the scan)
    val plan = v.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(1200))
  }

  test("a NULL dim entry never disarms the compiled membership predicate") {
    // `!isin(values)` with a null in the literal list is NULL for every
    // non-member — where() would drop ALL violations and the rule silently
    // never fires. Null entries must be filtered before compilation (they
    // can't whitelist anything under the anti-join semantics either).
    val df = Seq(
      TokenRow("ok", Array(1), 1, "A"),
      TokenRow("bad", Array(1), 1, "nope")).toDF
    val dimWithNull = Seq(Some("A"), Some("N"), Some("R"), None)
      .toDF("allowed_source")
    val v = Validator.referentialViolations(df,
      ReferentialRule("ref_source", "source", "allowed_sources"), dimWithNull)
    assert(v.select("doc_id").as[String].collect().toSet === Set("bad"))
  }

  test("big-dimension referential: shuffle join, never broadcast") {
    // dimension too big to broadcast in production: the merge hint must pin
    // a sort-merge join regardless of the optimizer's size estimate
    val dim = spark.range(0, 1000).select(col("id").as("allowed_key"))
    val df = fixture.withColumn("okey", lit(5000L)) // nothing allowed
    val rule = ReferentialRule("ref_big", "okey", "allowed_key")
    val v = Validator.referentialViolationsBigDim(df, rule, dim)
    val plan = v.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(1500))
    assert(!plan.contains("BroadcastExchange"), plan.take(1500))
    assert(v.count() === fixture.count()) // every row violates
    // and allowed keys produce no violations
    val ok = Validator.referentialViolationsBigDim(
      fixture.withColumn("okey", lit(7L)), rule, dim)
    assert(ok.count() === 0)
  }

  test("rule-set JSON loader round-trips routing and rules") {
    val json =
      """{"ruleSets": {"default": [
        |   {"type":"notNull","id":"nn","column":"tokens"},
        |   {"type":"lengthConsistency","id":"lc","arrayColumn":"tokens","lengthColumn":"n_tok"},
        |   {"type":"tokenBounds","id":"tb","arrayColumn":"tokens","lo":0,"hi":100},
        |   {"type":"referential","id":"rf","column":"source","dimension":"allowed_sources"},
        |   {"type":"unique","id":"uq","column":"doc_id"}],
        |  "strict": [{"type":"range","id":"rg","column":"n_tok","lo":1,"hi":10,"severity":"warning"}]},
        | "routing": {"A": "strict"},
        | "defaultRuleSet": "default"}""".stripMargin
    val routing = RuleSetLoader.parse(json)
    assert(routing.forSource("A").name == "strict")
    assert(routing.forSource("Z").name == "default")
    assert(routing.ruleSets("default").rules.size == 5)
    assert(routing.ruleSets("strict").rules.head ==
      RangeRule("rg", "n_tok", 1, 10, "warning", None))
  }

  test("malformed rule-set body fails loudly, never an empty rule set") {
    val bad = """{"ruleSets": {"oops": {"type":"notNull"}},
                | "routing": {}, "defaultRuleSet": "oops"}""".stripMargin
    val e = intercept[IllegalArgumentException](RuleSetLoader.parse(bad))
    assert(e.getMessage.contains("oops"))
  }

  test("routing to a nonexistent rule set fails fast") {
    val routing = RuleSetLoader.parse(
      """{"ruleSets": {"default": [{"type":"notNull","id":"nn","column":"tokens"}]},
        | "routing": {"A": "no_such_set"}, "defaultRuleSet": "default"}""".stripMargin)
    val e = intercept[IllegalArgumentException](
      Validator.violationsRouted(fixture, routing, dims))
    assert(e.getMessage.contains("no_such_set"))
  }

  test("routed dispatch: NULL source rows fall to the default rule set") {
    val routing = RuleSetLoader.parse(
      """{ "ruleSets": {
        |   "strict": [
        |     {"type":"notNull","id":"not_null_source","column":"source","severity":"fatal"},
        |     {"type":"notNull","id":"not_null_tokens","column":"tokens","severity":"fatal"}
        |   ],
        |   "lenient": [
        |     {"type":"lengthConsistency","id":"len_consistency","arrayColumn":"tokens","lengthColumn":"n_tok"}
        |   ]},
        |  "routing": { "A": "lenient" },
        |  "defaultRuleSet": "strict" }""".stripMargin)
    val df = Seq(
      TokenRow("null-src", Array(1), 1, null), // must hit strict's notNull
      TokenRow("a-1", Array(1), 2, "A"),       // lenient: len mismatch
      TokenRow("n-null", null, 1, "N")         // strict: null tokens
    ).toDF
    val got = Validator.canonical(
        Validator.violationsRouted(df, routing, dims))
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("null-src", "not_null_source",
        "source is null: minimum required = 1, but only found 0"),
      ("a-1", "len_consistency", "n_tok=2 size=1"),
      ("n-null", "not_null_tokens",
        "tokens is null: minimum required = 1, but only found 0")))
  }
}
