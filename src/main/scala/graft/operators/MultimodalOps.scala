package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extraction runs as
  * a partition-local batch transform.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * container): [[stubDecode]] derives deterministic fake dimensions/features
  * from the bytes. Everything Spark-side is real — schema, batching
  * (mapPartitions = one decoder init per partition, amortized like a Pandas
  * UDF batch), partitioning, and the column contract — so a real decoder
  * drops into [[stubDecode]] unchanged.
  */
object MultimodalOps {

  /** The typed record for a decoded media asset. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      feat: Array[Float])

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false)))

  /** Wrap the documents table as a fake media table: text bytes stand in
    * for an encoded image payload.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("image/stub").as("media_type"))

  /** STUB decoder — replace with a real codec. Deterministic: dimensions
    * and features are pure functions of the payload bytes.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    // ??? real decode goes here; deterministic fake below
    val n = payload.length
    val width = 16 + (n % 64)
    val height = 16 + ((n / 64) % 64)
    val feat = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < n) { acc += (payload(j) & 0xFF).toLong * (j + 1); j += 8 }
      (acc % 1000).toFloat / 1000.0f
    }
    (width, height, feat)
  }

  /** Decode + feature-extract over the media table. One decoder per
    * partition (mapPartitions), rows streamed — the Scala analogue of a
    * Pandas-UDF batch loop; at scale the input should be repartitioned so
    * each task holds O(100 MB) of payloads.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would happen here
        it.map { case (id, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val (w, h, feat) = stubDecode(bytes)
          MediaFeatures(id, bytes.length, w, h, feat)
        }
      }
  }

  /** One resized "image" summary. */
  final case class ResizedMedia(
      doc_id: Long, out_w: Int, out_h: Int, pix_sum: Long)

  /** Resize plumbing: nearest-neighbor downsample of the stub image grid
    * ([[stubDecode]]'s n-derived width×height) to `tw`×`th`, summarized as
    * the sum of sampled byte values. Same partition-batched mapPartitions
    * shape as [[decodeFeatures]] — a real resampler (and a real per-pixel
    * output instead of the checksum) drops in without touching the Spark
    * side. Deterministic byte arithmetic, so the DuckDB oracle replicates
    * the exact sampled indices (m_media_resize).
    */
  def resizeStub(spark: SparkSession, media: DataFrame,
      tw: Int, th: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val bytes = if (payload == null) Array.empty[Byte] else payload
          val n = bytes.length
          val w = 16 + (n % 64)
          val h = 16 + ((n / 64) % 64)
          var sum = 0L
          var ty = 0
          while (ty < th) {
            var tx = 0
            while (tx < tw) {
              val idx = (ty * h / th) * w + (tx * w / tw)
              if (idx < n) sum += (bytes(idx) & 0xFF)
              tx += 1
            }
            ty += 1
          }
          ResizedMedia(id, tw, th, sum)
        }
      }
  }

  /** Frame-sampling plumbing for video-like payloads: slice the payload
    * into fixed-size "frames" and emit every `stride`-th, each with its
    * index — the explode shape a real frame sampler produces. BYTE-SAFE:
    * `Substring` operates directly on the binary column (the earlier
    * string-round-trip formulation would corrupt non-UTF-8 payloads).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("payload"))
      .cast("double") / frameBytes).cast("int")
    media.where(length(col("payload")) > 0)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), nFrames - 1),
          i => struct(i.as("frame_idx"),
            col("payload").substr(i * frameBytes + 1, lit(frameBytes))
              .as("frame_payload")))).as("f"))
      .where(col("f.frame_idx") % stride === 0)
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.frame_payload").as("frame_payload"))
  }
}
