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
      manifest: String, snapshot: Long, report: Option[String])

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
      report = m.get("report"))
  }

  final case class RunOutcome(
      validated: Seq[String], skipped: Seq[String],
      summary: DataFrame, reportPath: Option[String])

  /** One resumable routed run (the testable core; `main` is arg plumbing).
    * Delegates the lifecycle — resume-by-anti-join, ONE batched job over
    * all pending partitions (partition pruning at the scan when stored by
    * `source`), per-partition containment fallback, manifest bookkeeping —
    * to [[graft.engine.ValidationRunner.runResumableWith]], with routed
    * dispatch as the violations pipeline (rule-set count never multiplies
    * I/O: every set batches into the scan).
    */
  def run(spark: SparkSession, tokens: DataFrame, rulesJson: String,
      dimsJson: Option[String], manifestPath: String, snapshotId: Long,
      reportDir: Option[String],
      metadataRules: Seq[String] = Nil): RunOutcome = {
    val routing = RuleSetLoader.parse(rulesJson)
    val dims = dimsJson.map(DimensionLoader.parse(spark, _))
      .getOrElse(Map.empty)

    val result = graft.engine.ValidationRunner.runResumableWith(
      spark, tokens, df => Validator.violationsRouted(df, routing, dims),
      manifestPath, snapshotId)

    val reportPath = reportDir.map { dir =>
      // report over the FULL table at this snapshot (reference shape: one
      // report artifact per run, main.py:296-304)
      val detailedAll = Validator.violationsRouted(tokens, routing, dims)
      val rep = ReportOps.assemble(
        Validator.summary(tokens, detailedAll), detailedAll, metadataRules)
      ReportOps.persistReport(rep, dir, snapshotId)
    }
    RunOutcome(result.validatedPartitions, result.skippedPartitions,
      result.summary, reportPath)
  }

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.Sessions.local(cpus, "graft-validate")
    try {
      val rulesJson = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(args.rules)))
      val dimsJson = args.dims.map(p => new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))))
      val out = run(spark, spark.read.parquet(args.tokens), rulesJson,
        dimsJson, args.manifest, args.snapshot, args.report)
      val rows = out.summary.orderBy("source").collect().map { r =>
        s"""{"source":"${r.getString(0)}","n_rows":${r.getLong(1)},""" +
          s""""n_violations":${r.getLong(2)},"pass":${r.getBoolean(3)}}"""
      }.mkString("[", ",", "]")
      println(s"""{"validated":${out.validated.size},""" +
        s""""skipped":${out.skipped.size},"summary":$rows""" +
        out.reportPath.map(p => s""","report":"$p"""").getOrElse("") + "}")
    } finally spark.stop()
  }
}
