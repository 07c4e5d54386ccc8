package graft

/** Plan-shape audits: scan counts of composed queries must stay the sum of
  * their parts — Catalyst pushing a semi-join through a union once silently
  * re-embedded a whole summary subtree into every branch (39 scans for a
  * 7-scan query).
  */
class PlanAuditSpec extends SparkSpec {
  private def scans(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("FileScan parquet"))

  test("composed queries do not multiply scans") {
    assert(scans(Queries.vSummary(spark, sf001)) <= 4)
    assert(scans(Queries.vViolations(spark, sf001)) <= 3)
    // report assembly = summary (collected driver-side) + detailed(3)
    assert(scans(Queries.rReportFull(spark, sf001)) <= 4,
      s"report scans = ${scans(Queries.rReportFull(spark, sf001))}")
    // routed: one row-rule scan + one per dataset-rule slice
    assert(scans(Queries.vRoutedMatrix(spark, sf001)) <= 6)
  }
}
