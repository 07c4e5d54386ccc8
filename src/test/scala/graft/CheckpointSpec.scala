package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.{Checkpoint, ValidationRunner}
import graft.model.TokenRow
import graft.rules.RuleSet
import graft.sources.TokenTable

class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def dims = Map("allowed_sources" -> TokenTable.allowedDim(spark))
  private val ruleSet = RuleSet.default(50000)

  private def fixture = Seq(
    TokenRow("a1", Array(1, 2), 2, "A"),
    TokenRow("a2", Array(1), 2, "A"), // length violation
    TokenRow("n1", Array(3), 1, "N"),
    TokenRow("r1", null, 1, "R")      // null violation
  ).toDF

  test("first run validates all partitions; second run skips them") {
    val dir = Files.createTempDirectory("graft-manifest").toString + "/manifest"
    val r1 = ValidationRunner.runResumable(
      spark, fixture, ruleSet, dims, dir, snapshotId = 1L)
    assert(r1.validatedPartitions.toSet === Set("A", "N", "R"))
    assert(r1.skippedPartitions.isEmpty)

    val r2 = ValidationRunner.runResumable(
      spark, fixture, ruleSet, dims, dir, snapshotId = 1L)
    assert(r2.validatedPartitions.isEmpty)
    assert(r2.skippedPartitions.toSet === Set("A", "N", "R"))
    // summary reconstructed from the manifest matches the live run
    val fromManifest = r2.summary.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(fromManifest === Set(("A", 2L, 1L, false), ("N", 1L, 0L, true),
      ("R", 1L, 1L, false)))
  }

  test("a new snapshot re-validates; partial completion resumes the rest") {
    val dir = Files.createTempDirectory("graft-manifest2").toString + "/manifest"
    // pre-mark partition A as done at snapshot 7
    Checkpoint.append(spark, dir, Seq(
      graft.model.ManifestEntry("A", 7L, "ok", 2L, 1L, 0L)))
    val r = ValidationRunner.runResumable(
      spark, fixture, ruleSet, dims, dir, snapshotId = 7L)
    assert(r.validatedPartitions.toSet === Set("N", "R"))
    assert(r.skippedPartitions.toSet === Set("A"))
    // different snapshot → everything pending again
    val r2 = ValidationRunner.runResumable(
      spark, fixture, ruleSet, dims, dir, snapshotId = 8L)
    assert(r2.validatedPartitions.toSet === Set("A", "N", "R"))
  }

  test("stale error rows never pollute the manifest-reconstructed summary") {
    val dir = Files.createTempDirectory("graft-manifest4").toString + "/manifest"
    // a failed earlier attempt left error rows with zeroed metrics
    Checkpoint.append(spark, dir, Seq(
      graft.model.ManifestEntry("A", 1L, "error:Boom", 0L, 0L, 0L),
      graft.model.ManifestEntry("N", 1L, "error:Boom", 0L, 0L, 0L)))
    // successful resume validates everything
    ValidationRunner.runResumable(spark, fixture, ruleSet, dims, dir, 1L)
    // all-done call reconstructs from the manifest: one ok row per partition
    val r = ValidationRunner.runResumable(spark, fixture, ruleSet, dims, dir, 1L)
    assert(r.validatedPartitions.isEmpty)
    val rows = r.summary.collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(rows.length === 3)
    assert(rows.toSet === Set(("A", 2L, 1L, false), ("N", 1L, 0L, true),
      ("R", 1L, 1L, false)))
  }

  test("a poison partition is contained: error attributed, others complete") {
    val dir = Files.createTempDirectory("graft-manifest5").toString + "/manifest"
    // runtime failure confined to partition R: evaluating n_tok throws there
    // (source listing and the other partitions' scans never touch R rows
    // once the per-partition filter is pushed below the projection)
    val boom = udf((s: String, n: Int) =>
      if (s == "R") throw new RuntimeException("poison") else n)
    // block ConvertToLocalRelation (which would evaluate the UDF at plan
    // time on the driver): read the rows back from a real parquet scan
    val fdir = Files.createTempDirectory("graft-poison").toString + "/tok"
    fixture.write.parquet(fdir)
    val poisoned = spark.read.parquet(fdir)
      .withColumn("n_tok", boom(col("source"), col("n_tok")))
    val r = ValidationRunner.runResumable(
      spark, poisoned, ruleSet, dims, dir, snapshotId = 2L)
    // R failed and is attributed; A and N completed and are checkpointed
    val m = Checkpoint.read(spark, dir).collect()
      .map(x => (x.getAs[String]("partition"), x.getAs[String]("status")))
      .toMap
    assert(m("A") === "ok")
    assert(m("N") === "ok")
    assert(m("R").startsWith("error:"))
    assert(r.validatedPartitions.toSet === Set("A", "N"))
    // resume skips the healthy partitions and retries only R
    val done = Checkpoint.completedPartitions(spark, dir, 2L)
    assert(done.toSet === Set("A", "N"))
  }

  test("manifest records per-partition lineage + metrics") {
    val dir = Files.createTempDirectory("graft-manifest3").toString + "/manifest"
    ValidationRunner.runResumable(spark, fixture, ruleSet, dims, dir, 1L)
    val m = Checkpoint.read(spark, dir).collect()
    assert(m.length === 3)
    assert(m.forall(_.getAs[String]("status") == "ok"))
    val a = m.find(_.getAs[String]("partition") == "A").get
    assert(a.getAs[Long]("n_rows") === 2L)
    assert(a.getAs[Long]("n_violations") === 1L)
    assert(a.getAs[Long]("snapshot_id") === 1L)
  }
}
