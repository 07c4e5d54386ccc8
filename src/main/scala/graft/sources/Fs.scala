package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem-agnostic existence checks through the Hadoop `FileSystem` API,
  * so cache/index/manifest gating works unchanged on HDFS/S3/local — the
  * deployment targets of the engine (a `java.io.File` check silently returns
  * false on any non-local URI and would rebuild caches forever).
  */
object Fs {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** True iff `dir` holds a committed Spark write (its `_SUCCESS` marker). */
  def successExists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_SUCCESS")
    fs(spark, p).exists(p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    fs(spark, p).exists(p)
  }

  /** Recursive delete (fixture/cache reset); no-op when absent. */
  def delete(spark: SparkSession, path: String): Unit = {
    val p = new Path(path)
    fs(spark, p).delete(p, true)
  }
}
