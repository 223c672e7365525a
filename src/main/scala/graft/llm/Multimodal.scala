package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode / feature-extraction /
  * frame-sampling as partition-local transforms.
  *
  * Images decode for REAL via `javax.imageio` (JPEG/PNG/BMP/GIF ship in
  * the JDK): true width/height and mean luminance from the decoded
  * pixels. Audio decodes for real via `javax.sound.sampled` (WAV/AIFF/AU
  * in the JRE): duration and RMS loudness from the PCM samples. Video
  * CONTAINER metadata decodes for real via a pure-JVM ISO-BMFF box walk
  * ([[IsoBmff]] — MP4/MOV/3GP duration + display dimensions); only the
  * pixel stream itself stays undecoded (the JDK ships no video codec),
  * so video brightness keeps the byte-derived value. Bytes no path can
  * decode fall back to the deterministic byte-derived features, so the
  * operator is total and the synthetic-media oracle query stays
  * reproducible. Everything around the decode — schema, batching,
  * partition shape, null handling — is shared by all paths (a real
  * codec call drops into the same `mapPartitions` seam).
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
      // image: mean pixel luminance; audio: RMS loudness — both [0, 1]
      brightness: Double,
      n_frames_sampled: Int,
      // decoded pixel dimensions (0 = not decodable / non-image)
      decoded_width: Int,
      decoded_height: Int,
      // decoded audio duration (0 = not decodable / non-audio)
      decoded_duration_ms: Long,
      decoded: Boolean)

  private def byteChecksum(bytes: Array[Byte]): Long = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum = checksum * 31 + (bytes(i) & 0xFF); i += 1 }
    checksum
  }

  /** Fallback decode: deterministic pseudo-features from raw bytes —
    * used for non-image kinds and undecodable blobs (keeps the operator
    * total and the synthetic-media oracle deterministic). */
  private def fakeDecode(r: MediaRecord, frameCount: Int): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < r.bytes.length) { sum += (r.bytes(i) & 0xFF); i += 1 }
    val brightness = if (r.bytes.isEmpty) 0.0 else sum.toDouble / (255.0 * r.bytes.length)
    MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, byteChecksum(r.bytes),
      brightness, frameCount, 0, 0, 0L, decoded = false)
  }

  /** Real audio decode (JDK `javax.sound.sampled` — WAV/AIFF/AU ship in
    * the JRE): duration from frame count / rate, loudness as RMS of the
    * normalized PCM samples (16- or 8-bit). None when the bytes aren't a
    * decodable audio stream. */
  private def audioDecode(r: MediaRecord, frameCount: Int): Option[MediaFeatures] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(r.bytes)))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val durationMs =
          if (frames >= 0 && fmt.getFrameRate > 0) (frames * 1000L / fmt.getFrameRate.toLong)
          else 0L
        val bits = fmt.getSampleSizeInBits
        if (bits != 16 && bits != 8) return None
        val data = in.readAllBytes()
        var sumSq = 0.0
        var n = 0
        if (bits == 16) {
          val le = !fmt.isBigEndian
          var i = 0
          while (i + 1 < data.length) {
            val s =
              if (le) ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
              else ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
            val x = s / 32768.0
            sumSq += x * x
            n += 1
            i += 2
          }
        } else {
          var i = 0
          while (i < data.length) {
            val x = ((data(i) & 0xFF) - 128) / 128.0
            sumSq += x * x
            n += 1
            i += 1
          }
        }
        val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
        Some(MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, byteChecksum(r.bytes),
          rms, frameCount, 0, 0, durationMs, decoded = true))
      } finally in.close()
    } catch { case _: Exception => None }

  /** Video metadata decode: minimal pure-JVM ISO-BMFF (MP4/MOV/3GP)
    * box walk — no JDK video codec exists, but the CONTAINER header is
    * plain big-endian struct parsing (ISO/IEC 14496-12 §8.2.2 mvhd,
    * §8.3.2 tkhd). Yields the presentation duration
    * (mvhd duration/timescale) and the first track's fixed-point 16.16
    * display dimensions. Pixel data stays undecoded (no codec), so
    * brightness keeps the deterministic byte-derived value; None when
    * the bytes aren't an ISO-BMFF container (then the byte-feature
    * fallback applies, keeping the operator total). */
  private def mp4Decode(r: MediaRecord, frameCount: Int): Option[MediaFeatures] =
    IsoBmff.parse(r.bytes).map { meta =>
      fakeDecode(r, frameCount).copy(
        decoded_duration_ms = meta.durationMs,
        decoded_width = meta.width,
        decoded_height = meta.height,
        decoded = true)
    }

  /** Real image decode (JDK `javax.imageio`): true dimensions + mean
    * luminance (R+G+B)/3 over all pixels, normalized to [0, 1]. Returns
    * None when the bytes aren't a decodable image. */
  private def imageIoDecode(r: MediaRecord, frameCount: Int): Option[MediaFeatures] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
            x += 1
          }
          y += 1
        }
        val brightness = if (w == 0 || h == 0) 0.0 else sum / (255.0 * w * h)
        Some(MediaFeatures(r.media_id, r.kind, r.bytes.length.toLong, byteChecksum(r.bytes),
          brightness, frameCount, w, h, 0L, decoded = true))
      }
    } catch { case _: Exception => None }

  /** Decode + featurize, partition-local (the Scala analog of a batched
    * `mapInPandas` decode: one iterator pass per partition, no driver
    * involvement, codec state reusable across rows within a partition).
    * Image rows go through the real `ImageIO` decoder; everything else
    * (and undecodable bytes) takes the deterministic fallback. */
  def extractFeatures(media: Dataset[MediaRecord], frameCount: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init: in-memory decode only, no ImageIO tmp-file
      // cache on executor disks
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        r.kind match {
          case "image" => imageIoDecode(r, frameCount).getOrElse(fakeDecode(r, frameCount))
          case "audio" => audioDecode(r, frameCount).getOrElse(fakeDecode(r, frameCount))
          case "video" => mp4Decode(r, frameCount).getOrElse(fakeDecode(r, frameCount))
          case _       => fakeDecode(r, frameCount)
        }
      }
    }
  }

  /** Resize decodable images to fit within `maxW`×`maxH` (aspect ratio
    * preserved, never upscaled) and re-encode as PNG, updating the
    * width/height metadata to the decoded output dimensions.
    * Partition-local like [[extractFeatures]] — the normalize step of an
    * image-training pipeline, running where the bytes already are (no
    * shuffle; one pass per partition). Non-image kinds and undecodable
    * bytes pass through untouched, so the operator is total. */
  def resizeImages(media: Dataset[MediaRecord], maxW: Int, maxH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(maxW > 0 && maxH > 0, s"resize bounds must be positive: ${maxW}x$maxH")
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        if (r.kind != "image") r
        else
          try {
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes))
            if (img == null) r
            else {
              val scale = math.min(1.0,
                math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
              val nw = math.max(1, math.floor(img.getWidth * scale).toInt)
              val nh = math.max(1, math.floor(img.getHeight * scale).toInt)
              if (nw == img.getWidth && nh == img.getHeight)
                r.copy(width = img.getWidth, height = img.getHeight)
              else {
                val out = new java.awt.image.BufferedImage(nw, nh,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = out.createGraphics()
                try {
                  g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                    java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                  g.drawImage(img, 0, 0, nw, nh, null)
                } finally g.dispose()
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(out, "png", bos)
                r.copy(bytes = bos.toByteArray, width = nw, height = nh)
              }
            }
          } catch { case _: Exception => r }
      }
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
