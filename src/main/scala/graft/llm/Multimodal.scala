package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extraction /
  * frame-sampling as partition-local transforms.
  *
  * The decode step is a clearly-marked STUB (no media codecs in this
  * environment): `decodeStub` derives deterministic fake features from
  * the raw bytes. Everything around it — schema, batching, partition
  * shape, null handling — is the real distributed plumbing a codec-backed
  * implementation drops into (swap `fakeDecode` for the real library
  * call inside the same `mapPartitions`).
  */
object Multimodal {

  /** An opaque media blob + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      bytes: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      // STUB features: real impl returns decoded tensors/embeddings
      brightness: Double,
      n_frames_sampled: Int)

  /** STUB decode: deterministic pseudo-features from raw bytes.
    * Real implementation: replace body with an image/audio codec call —
    * the signature, batching, and partition-local execution stay. */
  private def fakeDecode(r: MediaRecord, frameCount: Int): MediaFeatures = {
    var checksum = 0L
    var sum = 0L
    var i = 0
    while (i < r.bytes.length) {
      checksum = checksum * 31 + (r.bytes(i) & 0xFF)
      sum += (r.bytes(i) & 0xFF)
      i += 1
    }
    val brightness = if (r.bytes.isEmpty) 0.0 else sum.toDouble / (255.0 * r.bytes.length)
    MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, checksum, brightness, frameCount)
  }

  /** Decode + featurize, partition-local (the Scala analog of a batched
    * `mapInPandas` decode: one iterator pass per partition, no driver
    * involvement, codec state reusable across rows within a partition). */
  def extractFeatures(media: Dataset[MediaRecord], frameCount: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init point: real impl opens the codec once here
      it.map(r => fakeDecode(r, frameCount))
    }
  }

  /** Deterministic frame sampling plumbing: pick `n` evenly-spaced byte
    * offsets as stand-ins for frame indices. Real impl: container
    * demuxing at the same offsets. */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = math.max(r.bytes.length, 1)
      (0 until n).map { i =>
        val off = (len.toLong * i / n).toInt
        val b = if (r.bytes.isEmpty) 0 else r.bytes(off) & 0xFF
        (r.media_id, i, off, b)
      }
    }.toDF("media_id", "frame_idx", "byte_offset", "sample_value")
  }

  /** Read a directory of media blobs through Spark's binary file source
    * — the real ingestion path for image/audio/video corpora: each file
    * becomes one row (path, modificationTime, length, content), scanned
    * distributed with pushable path-glob and length filters. */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(xxhash64(col("path")), lit(3)) + 1).cast("int")).as("kind"),
        col("content").as("bytes"),
        lit(0).as("width"), lit(0).as("height"), lit(0L).as("duration_ms"))
      .as[MediaRecord]
  }

  /** Build a synthetic media table from any table with an id + a string
    * column (test scaffolding: bytes = UTF-8 of the string). */
  def syntheticMedia(spark: SparkSession, src: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    import spark.implicits._
    src.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("bytes"),
      (pmod(col(idCol).cast("long"), lit(640)) + 1).cast("int").as("width"),
      (pmod(col(idCol).cast("long"), lit(480)) + 1).cast("int").as("height"),
      (pmod(col(idCol).cast("long"), lit(10000))).as("duration_ms"))
      .as[MediaRecord]
  }
}
