package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.DetailedViolation

/** Persisted per-partition violation artifacts — the piece that lets
  * `--report` on a RESUMED run cost zero extra rule passes.
  *
  * The reference writes its report from the issues it already collected
  * during the run (/root/reference/extraction/main.py:296-304); a naive
  * re-expression recomputes the full violations pipeline over the whole
  * table for the report even when the resumable runner just skipped every
  * completed partition — at 100 TB that doubles the run. Instead the runner
  * terminates its one rule pass in a WRITE of the detailed violations,
  * laid out
  *
  * {{{ baseDir/snap=<snapshotId>/gen=<runTs>/source=<partition>/part-….parquet }}}
  *
  * mirroring the checkpoint manifest's generations: each resumable run
  * appends one `gen=` directory holding the violations of the partitions it
  * actually validated. Reconstruction ([[latest]]) reads the snapshot
  * directory (Spark partition discovery turns `gen` and `source` into
  * columns) and keeps each source's newest generation — the same
  * latest-per-partition selection the manifest summary uses, so a partition
  * re-validated after a contained failure supersedes its stale rows.
  *
  * Violations are a small fraction of the input (~2% on the fixture; the
  * design assumption everywhere in this engine), so the store is cheap to
  * write and to re-read, and the latest-generation selection uses a
  * broadcast join on the per-source max generation — the big side never
  * shuffles.
  */
object ViolationStore {

  private def snapDir(baseDir: String, snapshotId: Long): String =
    s"$baseDir/snap=$snapshotId"

  /** Append one generation of detailed violations
    * (doc_id, rule_id, detail, severity, source). Executing this write IS
    * the run's single rule pass — callers read the persisted copy back
    * rather than re-running the pipeline.
    */
  def persist(detailed: DataFrame, baseDir: String, snapshotId: Long,
      runTs: Long): Unit =
    detailed
      .select(col("doc_id"), col("rule_id"), col("detail"), col("severity"),
        col("source"))
      .write.mode(SaveMode.Append)
      .partitionBy("source")
      .parquet(s"${snapDir(baseDir, snapshotId)}/gen=$runTs")

  private def emptyViolations(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[DetailedViolation].toDF()
  }

  /** Read ONE generation back (the rows just persisted by [[persist]]). */
  def generation(spark: SparkSession, baseDir: String, snapshotId: Long,
      runTs: Long): DataFrame = {
    val dir = s"${snapDir(baseDir, snapshotId)}/gen=$runTs"
    if (!graft.sources.Fs.successExists(spark, dir)) emptyViolations(spark)
    else
      // a clean run may have ZERO violations: the committed directory then
      // holds only _SUCCESS and schema inference has nothing to read
      try read(spark, dir)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        emptyViolations(spark) }
  }

  /** All violations at a snapshot, each source contributing its NEWEST
    * generation — the frame a report assembles from (zero rule passes).
    */
  def latest(spark: SparkSession, baseDir: String,
      snapshotId: Long): DataFrame = {
    val dir = snapDir(baseDir, snapshotId)
    if (!graft.sources.Fs.exists(spark, dir)) emptyViolations(spark)
    else {
      val df =
        try spark.read.parquet(dir)
        catch { case _: org.apache.spark.sql.AnalysisException =>
          return emptyViolations(spark) } // every generation violation-free
      if (!df.columns.contains("gen"))
        return read(spark, dir) // single flat generation (defensive)
      val perSource = df.select(col("source").cast("string").as("source"),
        col("gen").cast("bigint").as("gen"), col("doc_id"), col("rule_id"),
        col("detail"), col("severity"))
      // per-source max generation is partition-count cardinality: broadcast
      // it back rather than windowing (a window would shuffle every
      // violation row; the join ships none of the big side)
      val newest = perSource.groupBy("source")
        .agg(max(col("gen")).as("gen"))
      perSource.join(broadcast(newest), Seq("source", "gen"))
        .select("doc_id", "rule_id", "detail", "severity", "source")
    }
  }

  /** Parquet read that re-strings partition columns: partition-value type
    * inference would read a numeric-looking source directory as int and
    * break the unionByName with computed violation frames.
    */
  private def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .select(col("doc_id"), col("rule_id"), col("detail"), col("severity"),
        col("source").cast("string").as("source"))

  /** Delete generations that are fully SUPERSEDED — every source they hold
    * also appears in a newer generation, so [[latest]] can never select a
    * row from them. Long-lived snapshots accumulate one `gen=` directory
    * per resumed run (the same append-bloat the ANN indexes compact away);
    * pruning is a pure DIRECTORY-LISTING computation — which generation
    * wins each source is visible in the layout, no data is read. Returns
    * the number of generations deleted.
    */
  def prune(spark: SparkSession, baseDir: String, snapshotId: Long): Int = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(snapDir(baseDir, snapshotId))
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) return 0
    val gens: Seq[(Long, Path, Set[String])] = fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .flatMap { s =>
        scala.util.Try(s.getPath.getName.stripPrefix("gen=").toLong)
          .toOption.map { g =>
            val srcs = fs.listStatus(s.getPath)
              .filter(c => c.isDirectory &&
                c.getPath.getName.startsWith("source="))
              .map(_.getPath.getName).toSet
            (g, s.getPath, srcs)
          }
      }
    val winner: Map[String, Long] = gens
      .flatMap { case (g, _, srcs) => srcs.map(_ -> g) }
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    var removed = 0
    gens.foreach { case (g, p, srcs) =>
      if (srcs.nonEmpty && srcs.forall(src => winner(src) > g)) {
        fs.delete(p, true)
        removed += 1
      }
    }
    removed
  }
}
