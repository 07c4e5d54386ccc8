package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{StatsOps, Validator}
import graft.rules.RuleSet
import graft.sources.TokenTable

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator of the validation engine
  * (SURVEY.md §2) run over the token view derived from the driver's parquet
  * tables; [[oracleSql]] holds the equivalent DuckDB SQL. Column names and
  * row order are kept identical on both sides.
  */
object SparkEntry {

  private val Q = graft.Queries

  /** Flagship: full rule-set pass → per-source pass/fail summary.
    * Driver smoke-checks rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    Q.vSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Q.registry

  def oracleSql: Map[String, String] = Q.oracles
}

/** Query registry + DuckDB oracles, kept side by side so each pair stays in
  * lockstep. `tok` below is the deterministic token view (TokenTable.duckCte).
  */
object Queries {

  private def tok(spark: SparkSession, dir: String): DataFrame =
    TokenTable.tokens(spark, dir)
  private def dims(spark: SparkSession): Map[String, DataFrame] =
    Map("allowed_sources" -> TokenTable.allowedDim(spark))
  private def ruleSet: RuleSet = RuleSet.default(TokenTable.Vocab)

  private def detailed(spark: SparkSession, dir: String): DataFrame =
    Validator.violations(tok(spark, dir), ruleSet, dims(spark))

  // ---- engine queries ------------------------------------------------------

  def vViolations(spark: SparkSession, dir: String): DataFrame =
    Validator.canonical(detailed(spark, dir))
      .orderBy("doc_id", "rule_id", "detail")

  def vSummary(spark: SparkSession, dir: String): DataFrame =
    Validator.summary(tok(spark, dir), detailed(spark, dir)).orderBy("source")

  def vRuleMatrix(spark: SparkSession, dir: String): DataFrame =
    Validator.ruleMatrix(detailed(spark, dir)).orderBy("source", "rule_id")

  def vDedupIssues(spark: SparkSession, dir: String): DataFrame =
    Validator.dedupIssues(detailed(spark, dir))
      .orderBy("severity", "rule_id", "detail_generic")

  def vStats(spark: SparkSession, dir: String): DataFrame =
    StatsOps.columnStats(tok(spark, dir)).orderBy("source")

  def vHistogram(spark: SparkSession, dir: String): DataFrame =
    StatsOps.lengthHistogram(tok(spark, dir)).orderBy("source", "bucket")

  def vQuantiles(spark: SparkSession, dir: String): DataFrame =
    StatsOps.lengthQuantiles(tok(spark, dir), Seq(0.25, 0.5, 0.75, 0.95))
      .orderBy("source")

  def vResumePending(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val completed = Seq("A", "N").toDF("completed")
    tok(spark, dir).select("source").distinct()
      .join(broadcast(completed), col("source") === col("completed"), "left_anti")
      .select("source").orderBy("source")
  }

  // ---- registry ------------------------------------------------------------

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v_violations" -> (vViolations _),
    "v_summary" -> (vSummary _),
    "v_rule_matrix" -> (vRuleMatrix _),
    "v_dedup_issues" -> (vDedupIssues _),
    "v_stats" -> (vStats _),
    "v_histogram" -> (vHistogram _),
    "v_quantiles" -> (vQuantiles _),
    "v_resume_pending" -> (vResumePending _),
  )

  // ---- DuckDB oracles ------------------------------------------------------

  private val cte = TokenTable.duckCte

  /** All violations as a DuckDB CTE `v(doc_id, rule_id, detail, severity,
    * source)` — the closed-form recomputation of the injected violations.
    */
  private val violationsCte: String =
    s"""$cte, v AS (
       |  SELECT doc_id, 'not_null_tokens' AS rule_id,
       |         'tokens is null: minimum required = 1, but only found 0' AS detail,
       |         'error' AS severity, source
       |  FROM tok WHERE tokens_null
       |  UNION ALL
       |  SELECT doc_id, 'len_consistency',
       |         'n_tok=' || n_tok || ' size=' || n_true, 'error', source
       |  FROM tok WHERE NOT tokens_null AND n_tok <> n_true
       |  UNION ALL
       |  SELECT doc_id, 'token_bounds', 'token out of [0,50000)', 'error', source
       |  FROM tok WHERE NOT tokens_null AND key % 109 = 0
       |  UNION ALL
       |  SELECT doc_id, 'ref_source',
       |         'source=''' || source || ''' not in allowed_sources', 'error', source
       |  FROM tok WHERE source NOT IN ('A','N','R')
       |  UNION ALL
       |  SELECT doc_id, 'unique_doc_id',
       |         'doc_id occurs ' || cnt || ' times', 'error', minsrc
       |  FROM (SELECT doc_id, count(*) AS cnt, min(source) AS minsrc
       |        FROM tok GROUP BY doc_id) WHERE cnt > 1
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "v_violations" ->
      s"""WITH $violationsCte
         |SELECT doc_id, rule_id, detail FROM v
         |ORDER BY doc_id, rule_id, detail""".stripMargin,

    "v_summary" ->
      s"""WITH $violationsCte,
         |vc AS (SELECT source, count(*) AS nv FROM v GROUP BY source)
         |SELECT t.source, count(*) AS n_rows,
         |       coalesce(max(vc.nv), 0) AS n_violations,
         |       coalesce(max(vc.nv), 0) = 0 AS pass
         |FROM tok t LEFT JOIN vc ON t.source = vc.source
         |GROUP BY t.source ORDER BY t.source""".stripMargin,

    "v_rule_matrix" ->
      s"""WITH $violationsCte
         |SELECT source, rule_id, count(*) AS violations FROM v
         |GROUP BY source, rule_id ORDER BY source, rule_id""".stripMargin,

    "v_dedup_issues" ->
      s"""WITH $violationsCte
         |SELECT severity, rule_id,
         |       regexp_replace(regexp_replace(detail, '\\[[0-9]+\\]', '[*]', 'g'),
         |                      '''[^'']*''', '''?''', 'g') AS detail_generic,
         |       count(*) AS cnt
         |FROM v GROUP BY 1, 2, 3
         |ORDER BY severity, rule_id, detail_generic""".stripMargin,

    "v_stats" ->
      s"""WITH $cte
         |SELECT source, count(*) AS n_rows,
         |       min(n_tok) AS min_n_tok, max(n_tok) AS max_n_tok,
         |       avg(n_tok) AS avg_n_tok,
         |       CAST(sum(CASE WHEN tokens_null THEN 1 ELSE 0 END) AS BIGINT) AS null_tokens,
         |       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
         |FROM tok GROUP BY source ORDER BY source""".stripMargin,

    "v_histogram" ->
      s"""WITH $cte
         |SELECT source, CAST(floor(n_tok / 10.0) AS BIGINT) AS bucket,
         |       count(*) AS cnt
         |FROM tok GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin,

    "v_quantiles" ->
      s"""WITH $cte
         |SELECT source,
         |       quantile_cont(n_tok, 0.25) AS q0,
         |       quantile_cont(n_tok, 0.50) AS q1,
         |       quantile_cont(n_tok, 0.75) AS q2,
         |       quantile_cont(n_tok, 0.95) AS q3
         |FROM tok GROUP BY source ORDER BY source""".stripMargin,

    "v_resume_pending" ->
      s"""WITH $cte
         |SELECT DISTINCT source FROM tok
         |WHERE source NOT IN ('A','N') ORDER BY source""".stripMargin,
  )
}
