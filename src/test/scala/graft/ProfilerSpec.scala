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
