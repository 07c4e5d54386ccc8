package graft

/** GraftExtensions: the KLL aggregate as a first-class SQL function. */
class ExtensionsSpec extends SparkSpec {

  test("kll_quantiles is SQL-callable through GraftExtensions") {
    val s = spark
    import s.implicits._
    Seq.tabulate(1001)(i => (i.toDouble, "A")).toDF("x", "src")
      .createOrReplaceTempView("kll_sql_test")
    val row = spark.sql(
      """SELECT src, kll_quantiles(x, 200, 0.5, 0.95) AS qs
        |FROM kll_sql_test GROUP BY src""".stripMargin).first()
    val qs = row.getSeq[Double](1)
    assert(math.abs(qs(0) - 500.0) <= 25.0)
    assert(math.abs(qs(1) - 950.0) <= 25.0)
  }

  test("kll_quantiles resolves in DESCRIBE FUNCTION and rejects bad args") {
    val desc = spark.sql("DESCRIBE FUNCTION kll_quantiles")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("kll_quantiles"))
    val err = intercept[Exception] {
      spark.sql("SELECT kll_quantiles(1.0, 200) ").collect()
    }
    assert(err.getMessage.contains("at least 3"))
  }
}
