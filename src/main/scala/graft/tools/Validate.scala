package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Checkpoint, Validator}
import graft.model.ManifestEntry
import graft.report.ReportOps
import graft.rules.RuleSetLoader
import graft.sources.DimensionLoader

/** The spark-submit entry point — the engine's analogue of the reference's
  * `python main.py` run (/root/reference/extraction/main.py): load rule +
  * value-set config, validate the token table under routing with resume
  * from the checkpoint manifest, persist a snapshot-stamped report
  * artifact, and print one JSON summary line.
  *
  * {{{
  * spark-submit --class graft.tools.Validate engine.jar \
  *   --tokens  hdfs://…/tokens        \  (parquet dir, partitioned by source)
  *   --rules   /etc/graft/rules.json  \  (RuleSetLoader shape)
  *   --dims    /etc/graft/dims.json   \  (DimensionLoader shape, optional)
  *   --manifest hdfs://…/manifest     \  (checkpoint table)
  *   --snapshot 42                    \  (Iceberg-snapshot stand-in)
  *   --report  hdfs://…/reports          (artifact dir, optional)
  * }}}
  *
  * Re-submission with the same manifest + snapshot skips partitions already
  * validated (resume-by-anti-join); config errors fail fast (malformed rule
  * sets / dangling routes throw at parse, never validate-nothing).
  */
object Validate {

  final case class Args(
      tokens: String, rules: String, dims: Option[String],
      manifest: String, snapshot: Long, report: Option[String],
      violations: Option[String], prune: Boolean,
      /** `--pipeline <quarantineDir>`: run the composed lifecycle
        * ([[graft.engine.Pipeline]]) — schema gate → routed repair →
        * resumable validate → quarantine split into the given dir →
        * artifact report.
        */
      pipeline: Option[String],
      /** `--expect "col:type,col:type"`: (column, type) contract for the
        * pipeline's schema pre-gate; omitted = gate disabled.
        */
      expect: Option[Seq[(String, String)]],
      /** `--metrics <dir>`: append this run's per-rule violation counts to
        * the cross-run metrics table ([[graft.engine.MetricsStore]]).
        */
      metrics: Option[String] = None,
      /** `--runid N`: the metrics table's run key (defaults to the
        * snapshot id — distinct re-runs at one snapshot should pass it).
        */
      runId: Option[Long] = None,
      /** `--sla true`: evaluate the severity-derived expectation suite
        * over the run's stored violations and include it in the output.
        */
      sla: Boolean = false,
      /** `--drift <parquetPath>`: baseline snapshot for the pipeline's
        * PSI drift gate; drifted-source counts join the metrics table.
        */
      drift: Option[String] = None,
      /** `--bucketed <tableName>`: write the split in the bucketed clean
        * layout (repeat validations plan uniqueness exchange-free).
        */
      bucketed: Option[String] = None)

  def parseArgs(argv: Array[String]): Args = {
    val m = argv.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
    Args(
      tokens = m("tokens"),
      rules = m("rules"),
      dims = m.get("dims"),
      manifest = m("manifest"),
      snapshot = m.getOrElse("snapshot", "0").toLong,
      report = m.get("report"),
      violations = m.get("violations"),
      prune = m.get("prune").exists(_.toBoolean),
      pipeline = m.get("pipeline"),
      expect = m.get("expect").map(_.split(",").toSeq.map { kv =>
        kv.split(":") match {
          case Array(c, t) => c.trim -> t.trim
          case _ => throw new IllegalArgumentException(
            s"--expect entries must be col:type, got '$kv'")
        }
      }),
      metrics = m.get("metrics"),
      runId = m.get("runid").map(_.toLong),
      sla = m.get("sla").exists(_.toBoolean),
      drift = m.get("drift"),
      bucketed = m.get("bucketed"))
  }

  final case class RunOutcome(
      validated: Seq[String], skipped: Seq[String],
      summary: DataFrame, reportPath: Option[String],
      /** Partitions whose contained per-partition fallback FAILED — nonzero
        * means the run is partial; `main` prints the count and exits
        * nonzero so an orchestrator can't misread it as clean.
        */
      failed: Seq[String] = Nil,
      /** Superseded violation-store generations deleted (only when the run
        * was invoked with pruning on).
        */
      pruned: Int = 0)

  /** One resumable routed run (the testable core; `main` is arg plumbing).
    * Delegates the lifecycle — resume-by-anti-join, ONE batched job over
    * all pending partitions (partition pruning at the scan when stored by
    * `source`), per-partition containment fallback, manifest bookkeeping —
    * to [[graft.engine.ValidationRunner.runResumableWith]], with routed
    * dispatch as the violations pipeline (rule-set count never multiplies
    * I/O: every set batches into the scan).
    *
    * The run's single rule pass terminates in a [[ViolationStore]] write
    * (default layout `<manifest>_violations`), and `--report` assembles the
    * artifact from those persisted violations plus the manifest-
    * reconstructed summary — the reference's write-the-report-from-
    * collected-issues shape (main.py:296-304). A `--report` on a RESUMED
    * run therefore re-validates NOTHING: completed partitions contribute
    * their stored generations (one rule pass per partition per snapshot,
    * ever — CheckpointSpec pins the report plan token-scan-free).
    */
  def run(spark: SparkSession, tokens: DataFrame, rulesJson: String,
      dimsJson: Option[String], manifestPath: String, snapshotId: Long,
      reportDir: Option[String],
      metadataRules: Seq[String] = Nil,
      violationsDir: Option[String] = None,
      pruneSuperseded: Boolean = false): RunOutcome = {
    val routing = RuleSetLoader.parse(rulesJson)
    val dims = dimsJson.map(DimensionLoader.parse(spark, _))
      .getOrElse(Map.empty)
    val vDir = violationsDir.getOrElse(s"${manifestPath}_violations")

    // violationsRoutedWide: the signature-cluster compiler — identical
    // semantics to the gated form (WideRoutingSpec pins equality on
    // homogeneous, heterogeneous, and appliesTo configs) but per-row cost
    // independent of rule-set count; measured 162× faster at 400 sets /
    // 9.6M rows (Explain --scaled, BASELINE.md). The gated path remains
    // only as the empty-family fallback inside it.
    val result = graft.engine.ValidationRunner.runResumableWith(
      spark, tokens, df => Validator.violationsRoutedWide(df, routing, dims),
      manifestPath, snapshotId, Some(vDir))

    val reportPath = reportDir.map { dir =>
      val rep = ReportOps.assemble(
        graft.engine.ViolationStore.latest(spark, vDir, snapshotId),
        metadataRules)
      ReportOps.persistReport(rep, dir, snapshotId)
    }
    // after the generation this run appended (and the report, which reads
    // the store): reclaim generations every source of which has been
    // superseded — the scheduler hook that keeps a long-lived snapshot's
    // artifact directory from accumulating one gen= per resumed run.
    // Single-writer contract (ViolationStore Scaladoc): runs sequentially
    // with the validation itself, never beside another writer.
    val pruned =
      if (pruneSuperseded)
        graft.engine.ViolationStore.prune(spark, vDir, snapshotId)
      else 0
    RunOutcome(result.validatedPartitions, result.skippedPartitions,
      result.summary, reportPath, result.failedPartitions, pruned)
  }

  /** The composed lifecycle verb (`--pipeline <quarantineDir>`): delegates
    * to [[graft.engine.Pipeline.run]] with the parsed routing + dims.
    */
  def runPipeline(spark: SparkSession, tokens: DataFrame, rulesJson: String,
      dimsJson: Option[String], args: Args): graft.engine.Pipeline.Result = {
    val routing = RuleSetLoader.parse(rulesJson)
    val dims = dimsJson.map(DimensionLoader.parse(spark, _))
      .getOrElse(Map.empty)
    graft.engine.Pipeline.run(spark, tokens, routing, dims, args.expect,
      args.manifest, args.snapshot, args.pipeline.get, args.report,
      metricsDir = args.metrics,
      runId = args.runId.getOrElse(args.snapshot),
      expectations =
        if (args.sla) graft.engine.Expectations.defaultSuite(routing)
        else Nil,
      driftBaseline = args.drift.map(spark.read.parquet(_)),
      bucketedCleanTable = args.bucketed)
  }

  def main(argv: Array[String]): Unit = {
    // trend-only verb: `Validate --trend <metricsDir>` reads the metrics
    // table and prints the run-over-run trend — no corpus, no rules
    val ti = argv.indexOf("--trend")
    if (ti >= 0) {
      val cpusT = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
      val spark = graft.Sessions.local(cpusT, "graft-trend")
      try {
        val rows = graft.engine.MetricsStore.trend(spark, argv(ti + 1))
          .orderBy("run_id", "rule_id").collect().map { r =>
            s"""{"run_id":${r.getLong(0)},"rule_id":"${r.getString(1)}",""" +
              s""""n_violations":${r.getLong(2)},""" +
              s""""prev_violations":${if (r.isNullAt(3)) "null"
                else r.getLong(3)},""" +
              s""""delta":${if (r.isNullAt(4)) "null" else r.getLong(4)},""" +
              s""""regressed":${if (r.isNullAt(5)) "null"
                else r.getBoolean(5)}}"""
          }.mkString("[", ",", "]")
        println(s"""{"trend":$rows}""")
      } finally spark.stop()
      return
    }
    val args = parseArgs(argv)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.Sessions.local(cpus, "graft-validate")
    val failed =
      try {
        val rulesJson = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(args.rules)))
        val dimsJson = args.dims.map(p => new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))))
        if (args.pipeline.isDefined) {
          val out = runPipeline(spark, spark.read.parquet(args.tokens),
            rulesJson, dimsJson, args)
          val rows = out.summary.orderBy("source").collect().map { r =>
            s"""{"source":"${r.getString(0)}","n_rows":${r.getLong(1)},""" +
              s""""n_violations":${r.getLong(2)},"pass":${r.getBoolean(3)},""" +
              s""""n_repaired":${r.getLong(4)},""" +
              s""""n_quarantined":${r.getLong(5)}}"""
          }.mkString("[", ",", "]")
          val slaRows = out.suite.map { s =>
            s.orderBy("rule_id").collect().map { r =>
              s"""{"rule_id":"${r.getString(0)}",""" +
                s""""n_violations":${r.getLong(1)},""" +
                s""""violation_rate":${r.getDouble(3)},""" +
                s""""max_rate":${r.getDouble(4)},""" +
                s""""status":"${r.getString(5)}"}"""
            }.mkString(""","sla":[""", ",", "]")
          }.getOrElse("")
          println(s"""{"validated":${out.validated.size},""" +
            s""""skipped":${out.skipped.size},"failed":${out.failed.size},""" +
            s""""summary":$rows""" + slaRows +
            out.reportPath.map(p => s""","report":"$p"""").getOrElse("") + "}")
          out.failed.size
        } else {
          val out = run(spark, spark.read.parquet(args.tokens), rulesJson,
            dimsJson, args.manifest, args.snapshot, args.report,
            violationsDir = args.violations, pruneSuperseded = args.prune)
          val rows = out.summary.orderBy("source").collect().map { r =>
            s"""{"source":"${r.getString(0)}","n_rows":${r.getLong(1)},""" +
              s""""n_violations":${r.getLong(2)},"pass":${r.getBoolean(3)}}"""
          }.mkString("[", ",", "]")
          println(s"""{"validated":${out.validated.size},""" +
            s""""skipped":${out.skipped.size},"failed":${out.failed.size},""" +
            s""""pruned":${out.pruned},"summary":$rows""" +
            out.reportPath.map(p => s""","report":"$p"""").getOrElse("") + "}")
          out.failed.size
        }
      } finally spark.stop()
    // a contained-failure run is PARTIAL: exit nonzero so schedulers retry
    if (failed > 0) sys.exit(2)
  }
}
