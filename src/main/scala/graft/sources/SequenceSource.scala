package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Abstraction over the engine's input table (SURVEY.md §7.4): the
  * north-star input is an Iceberg table of pre-tokenized sequences with
  * snapshot history; this sandbox has no Iceberg jars, so the trait pins the
  * three capabilities the engine actually uses — read a snapshot, list
  * snapshots, list partitions — and the parquet implementation emulates
  * snapshot semantics with a deterministic snapshot column. A real Iceberg
  * (or Delta) source implements the same trait with time-travel reads
  * (`option("snapshot-id", ...)`) and metadata-table listings, and nothing
  * above this interface changes.
  */
trait SequenceSource {
  /** The token table at a snapshot; None = current. */
  def read(spark: SparkSession, snapshotId: Option[Long] = None): DataFrame
  /** Available snapshot ids, ascending (newest last). */
  def snapshotIds(spark: SparkSession): Seq[Long]
  /** Partition values (the `source` column domain) at the newest snapshot. */
  def partitions(spark: SparkSession): Seq[String]
}

/** Parquet-backed source with emulated snapshots: snapshot 0 = the even
  * half (the drift baseline), snapshot 1 = the full table — mirroring an
  * append between two Iceberg snapshots.
  */
final class ParquetSequenceSource(sfDir: String) extends SequenceSource {

  override def read(spark: SparkSession, snapshotId: Option[Long]): DataFrame =
    snapshotId match {
      case Some(0L) => TokenTable.tokensBaseline(spark, sfDir)
      case _ => TokenTable.tokens(spark, sfDir)
    }

  override def snapshotIds(spark: SparkSession): Seq[Long] = Seq(0L, 1L)

  override def partitions(spark: SparkSession): Seq[String] =
    read(spark, None).select("source").distinct()
      .orderBy("source").collect().map(_.getString(0)).toSeq
}
