package graft

import org.apache.spark.sql.functions._
import graft.engine.{Profiler, Validator}
import graft.sources.TokenTable

/** Constraint suggestion: the closure property (a table satisfies the
  * rules suggested from itself) is what makes frozen suggestions safe;
  * drifted data must then violate them.
  */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("suggested rules compile and hold on the profiled table (closure)") {
    val tok = TokenTable.tokens(spark, sf0001)
    val sugg = Profiler.suggest(tok, Seq("n_tok", "okey"), Seq("source"))
    val (ruleSet, dims) = Profiler.compile(spark, sugg)
    assert(ruleSet.rules.nonEmpty)
    assert(ruleSet.referentialRules.map(_.dimension).forall(dims.contains))
    val nViol = Validator.violations(tok, ruleSet, dims).count()
    assert(nViol === 0L, "closure: zero violations on the profiled table")
  }

  test("drifted data violates the frozen suggestions") {
    val tok = TokenTable.tokens(spark, sf0001)
    val sugg = Profiler.suggest(tok, Seq("n_tok"), Seq("source"))
    val (ruleSet, dims) = Profiler.compile(spark, sugg)
    // drift: a new source value and an out-of-envelope n_tok
    val drifted = tok.limit(5)
      .withColumn("source", lit("martian"))
      .unionByName(tok.limit(3).withColumn("n_tok", lit(1000000)))
    val viol = Validator.violations(drifted, ruleSet, dims)
      .select("rule_id").distinct().as[String].collect().toSet
    assert(viol.contains("value_set_source"))
    assert(viol.contains("range_n_tok"))
  }

  test("comma-bearing categorical values round-trip suggest→compile (closure)") {
    // ADVICE r5: the old comma-joined dictionary split 'acme, inc' into two
    // bogus members; the array<string> carrier must keep it whole
    val df = Seq(
      (1L, "acme, inc", 10L), (2L, "acme, inc", 11L), (3L, "plain", 12L))
      .toDF("doc_id", "vendor", "n")
    val sugg = Profiler.suggest(df, Seq("n"), Seq("vendor"))
    val dict = sugg.where(col("rule_type") === "value_set")
      .select("values").as[Seq[String]].collect().head
    assert(dict.toSet === Set("acme, inc", "plain"))
    val (ruleSet, dims) = Profiler.compile(spark, sugg)
    // compiled dimension has the VALUE, not its comma fragments
    val dim = dims("dim_vendor").as[String].collect().toSet
    assert(dim === Set("acme, inc", "plain"))
    val viol = Validator.violations(
      df.withColumn("source", col("vendor")), ruleSet, dims)
    assert(viol.count() === 0L, "closure with a comma-bearing dictionary")
  }

  test("degenerate inputs suggest nothing wrong (empty table, all-null column)") {
    val empty = Seq.empty[(Long, String, java.lang.Long)]
      .toDF("doc_id", "source", "n")
    // an empty profile window has no envelope: no rows at all (the old
    // behavior emitted not_null + range [0,0], rejecting all future data)
    assert(Profiler.suggest(empty, Seq("n"), Seq("source")).count() === 0L)
    // all-null numeric: null min/max must not unbox to a [0,0] range
    val allNull = Seq((1L, "A", null.asInstanceOf[java.lang.Long]),
      (2L, "B", null.asInstanceOf[java.lang.Long])).toDF("doc_id", "source", "n")
    val sugg = Profiler.suggest(allNull, Seq("n"), Seq("source"))
    val types = sugg.where(col("column") === "n")
      .select("rule_type").as[String].collect().toSet
    assert(!types.contains("range"), s"no range for an all-null column: $types")
    assert(!types.contains("not_null"))
  }

  test("compile saturates hi at Long.MaxValue instead of overflowing") {
    val df = Seq((1L, Long.MaxValue), (2L, 5L)).toDF("doc_id", "n")
    val sugg = Profiler.suggest(df, Seq("n"), Nil)
    val (ruleSet, _) = Profiler.compile(spark, sugg)
    val range = ruleSet.rules.collect {
      case r: graft.rules.RangeRule => r }.head
    assert(range.hi === Long.MaxValue, "hi saturates, never wraps negative")
  }

  test("dictionary cap downgrades a wide column to a cardinality advisory") {
    val tok = TokenTable.tokens(spark, sf0001)
    val sugg = Profiler.suggest(tok, Nil, Seq("doc_id"), dictionaryCap = 8)
    val types = sugg.select("rule_type").as[String].collect().toSet
    assert(types.contains("cardinality"))
    assert(!types.contains("value_set"))
    // advisories don't compile to enforceable rules
    val (ruleSet, _) = Profiler.compile(spark, sugg)
    assert(ruleSet.referentialRules.isEmpty)
  }
}
