package graft.sources

import org.apache.spark.sql.SparkSession

/** Multi-file materialization of the `documents` table for the streaming
  * file source (which consumes a DIRECTORY of files micro-batch by
  * micro-batch — the driver's single-file parquet would collapse to one
  * batch and exercise no cross-batch state).
  */
object DocSource {

  private val cacheBase =
    sys.env.getOrElse("GRAFT_TOK_CACHE", "/tmp/graft_tok_cache")

  /** Path of the 16-file documents cache (built on first use). */
  def materializedDocs(spark: SparkSession, sfDir: String): String =
    synchronized {
      val dir =
        s"$cacheBase/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}_docs"
      if (!Fs.successExists(spark, dir)) {
        spark.read.parquet(s"$sfDir/documents.parquet")
          .repartition(16)
          .write.mode("overwrite").parquet(dir)
      }
      dir
    }

  /** Path of the 16-file events cache (built on first use) — the
    * streaming-source view of the events table.
    */
  def materializedEvents(spark: SparkSession, sfDir: String): String =
    synchronized {
      val dir =
        s"$cacheBase/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}_events"
      if (!Fs.successExists(spark, dir)) {
        spark.read.parquet(s"$sfDir/events.parquet")
          .repartition(16)
          .write.mode("overwrite").parquet(dir)
      }
      dir
    }
}
