package graft.llmops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side design is real and tested: schema, partitioning, batch
  * shape, and the typed `mapPartitions` pipeline are exactly what a
  * production decode stage needs. The codec itself is a clearly marked
  * STUB (this container has no image/audio libraries): it derives
  * deterministic fake dimensions/features from the payload bytes, so
  * tests are reproducible. Swapping in a real decoder changes only the
  * body of [[stubDecode]].
  *
  * Scale notes: decode is the classic CPU-bound per-row stage — it runs
  * in `mapPartitions` so library/codec init happens once per partition
  * (the same reason PySpark uses mapInPandas batches), and upstream
  * `repartition(n)` controls decode parallelism independently of file
  * layout. Binary payloads never shuffle: metadata is projected first,
  * decode output is columnar features.
  */
object Multimodal {

  case class Blob(blob_id: Long, kind: String, payload: Array[Byte])
  case class DecodedMeta(blob_id: Long, kind: String, n_bytes: Long,
                         width: Int, height: Int, n_frames: Int,
                         features: Array[Float])

  /** Wrap a text corpus as fake binary media (payload = UTF-8 bytes,
    * kind from the source column) — the test harness for the binary
    * pipeline. */
  def asBlobs(df: DataFrame, idCol: String, textCol: String,
              kindCol: String): DataFrame =
    df.select(col(idCol).as("blob_id"),
      coalesce(col(kindCol), lit("unknown")).as("kind"),
      coalesce(col(textCol), lit("")).cast("binary").as("payload"))

  /** Cheap metadata pass — pure expressions, no decode, runs at scan
    * speed: byte length, content digest, leading "magic" bytes. */
  def blobMetadata(blobs: DataFrame): DataFrame =
    blobs.select(col("blob_id"), col("kind"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"),
      hex(substring(col("payload"), 1, 4)).as("magic"))

  /** STUB decoder ??? — deterministic fake: real implementation would
    * call an image/audio codec here. Dimensions and features are pure
    * functions of the payload so results are reproducible. */
  private def stubDecode(b: Blob): DecodedMeta = {
    val n = b.payload.length
    val h = java.util.Arrays.hashCode(b.payload)
    val width = 16 + math.abs(h % 1024)
    val height = 16 + math.abs((h / 1024) % 1024)
    val frames = 1 + n % 32
    // fake "embedding": mean byte value per 16-byte block, 8 blocks
    val feats = (0 until 8).map { blk =>
      val from = blk * 16
      val slice = b.payload.slice(from, from + 16)
      if (slice.isEmpty) 0f
      else slice.map(_.toInt & 0xFF).sum.toFloat / slice.length / 255f
    }.toArray
    DecodedMeta(b.blob_id, b.kind, n.toLong, width, height, frames, feats)
  }

  /** Decode stage: typed mapPartitions so per-partition codec init is
    * amortized (the Scala analogue of a mapInPandas batch UDF — the
    * iterator IS the batch). */
  def decode(spark: SparkSession, blobs: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    blobs.as[Blob].mapPartitions { it =>
      // real codec/library init would happen once, here
      it.map(stubDecode)
    }
  }

  /** Frame sampling: every `stride`-th 16-byte slice of the payload as a
    * fake "frame" — array-typed output, one row per blob, frames
    * exploded downstream only if needed (keeps the shuffle narrow). */
  def frameSample(blobs: DataFrame, stride: Int = 4): DataFrame =
    blobs.select(col("blob_id"),
      transform(
        sequence(lit(0),
          greatest(floor(octet_length(col("payload")) / (16 * stride))
            .cast("int") - 1, lit(0))),
        i => substring_index(base64(
          substring(col("payload"), i * lit(16 * stride) + lit(1), lit(16))), "=", 1))
        .as("frames"))
}
