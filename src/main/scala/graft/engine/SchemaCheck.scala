package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema conformance — the structural half of validation: before any row
  * rule runs, the TABLE must carry the expected columns at the expected
  * types. The reference gets this from FHIR StructureDefinition element
  * declarations (the validator rejects unknown/mistyped elements before
  * constraint evaluation, /root/reference/fhir_profiles/
  * FDPG_Einwilligung.json element types); here the contract is a plain
  * (column, type) spec checked against the DataFrame's resolved schema.
  *
  * Pure metadata: the schema comes from the catalog/file footers, no data
  * is scanned — at 100 TB this is the free first gate that stops a
  * mis-evolved table before a single executor spins up. Types compare on
  * Catalyst `simpleString` ("bigint", "string", "array<int>", …).
  */
object SchemaCheck {

  final case class SchemaIssue(column: String, issue: String, detail: String)

  /** Issues between the actual schema and the expected (column → type) spec:
    * `missing` (declared, absent), `unexpected` (present, undeclared),
    * `type_mismatch` (present at a different type). Conforming columns
    * produce no row; an empty result means the schema conforms.
    */
  def issues(actual: StructType,
      expected: Seq[(String, String)]): Seq[SchemaIssue] = {
    val act = actual.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val exp = expected.toMap
    val missing = expected.collect { case (c, t) if !act.contains(c) =>
      SchemaIssue(c, "missing", s"expected $t") }
    val unexpected = actual.fields.collect { case f if !exp.contains(f.name) =>
      SchemaIssue(f.name, "unexpected", s"found ${f.dataType.simpleString}") }
    val mismatched = expected.collect {
      case (c, t) if act.get(c).exists(_ != t) =>
        SchemaIssue(c, "type_mismatch", s"expected $t found ${act(c)}") }
    (missing ++ unexpected ++ mismatched).sortBy(i => (i.column, i.issue))
  }

  /** The issues as a DataFrame (column, issue, detail) for report plumbing. */
  def conformance(spark: SparkSession, df: DataFrame,
      expected: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    issues(df.schema, expected).toDF()
  }

  /** Throw unless the schema conforms — the fail-fast pre-gate a validation
    * job runs before submitting the rule pass.
    */
  def require(df: DataFrame, expected: Seq[(String, String)]): Unit = {
    val is = issues(df.schema, expected)
    if (is.nonEmpty) throw new IllegalArgumentException(
      "schema does not conform: " +
        is.map(i => s"${i.column}[${i.issue}: ${i.detail}]").mkString(", "))
  }
}
