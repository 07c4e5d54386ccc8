package graft.model

/** Core row + output types of the validation engine.
  *
  * The engine validates tables of pre-tokenized training sequences with the
  * schema `(doc_id:string, tokens:array<int>, n_tok:int, source:string)` and
  * emits typed violation rows plus per-partition (per-`source`) pass/fail
  * summaries — the Spark-native re-expression of the reference pipeline's
  * OperationOutcome issues and per-type reports
  * (cf. /root/reference/extraction/main.py:121-143, IssueSet.py:9-26).
  */
final case class TokenRow(
    doc_id: String,
    tokens: Array[Int],
    n_tok: Int,
    source: String)

/** A single constraint violation — the engine's canonical output tuple,
  * mirroring the reference issue `{severity, code, diagnostics, location}`
  * (/root/reference/extraction/main.py:90-93) collapsed to the north-star
  * 3-tuple `(doc_id, rule_id, detail)`.
  */
final case class Violation(
    doc_id: String,
    rule_id: String,
    detail: String)

/** Violation with routing metadata kept for summaries / dedup, before
  * projection to the canonical 3-column shape.
  */
final case class DetailedViolation(
    doc_id: String,
    rule_id: String,
    detail: String,
    severity: String,
    source: String)

/** Per-partition (per-source) verdict — the analogue of the reference's
  * per-resource-type report section (main.py:121-143): row count, violation
  * count, and an overall pass flag.
  */
final case class SourceSummary(
    source: String,
    n_rows: Long,
    n_violations: Long,
    pass: Boolean)

/** One row of the checkpoint manifest: a validated partition at a snapshot,
  * with per-partition lineage + metrics, enabling resume-by-anti-join
  * (north-star resumability; the reference reruns from scratch each time,
  * main.py:296-304).
  */
final case class ManifestEntry(
    partition: String,
    snapshot_id: Long,
    status: String,
    n_rows: Long,
    n_violations: Long,
    wall_ms: Long,
    /** Append-generation stamp (monotonic per appender): reconstruction
      * selects the LATEST ok entry per partition deterministically when the
      * append-only manifest holds several generations (a re-run at the same
      * snapshot after upstream data changed).
      */
    run_ts: Long = 0L)
