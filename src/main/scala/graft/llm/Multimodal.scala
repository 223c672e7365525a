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

  // ---- perceptual hashing (multimodal dedup) ------------------------------

  final case class MediaHash(media_id: Long, phash: Long, decoded: Boolean)

  /** Area-average grayscale resample to n×n — deterministic pure
    * arithmetic (no AWT rendering path), so the hash is a pure function
    * of the pixel data. */
  private def grayMatrix(img: java.awt.image.BufferedImage, n: Int): Array[Array[Double]] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      val y0 = h * i / n
      val y1 = math.max(h * (i + 1) / n, y0 + 1)
      var j = 0
      while (j < n) {
        val x0 = w * j / n
        val x1 = math.max(w * (j + 1) / n, x0 + 1)
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
            x += 1
          }
          y += 1
        }
        out(i)(j) = sum / ((y1 - y0).toDouble * (x1 - x0))
        j += 1
      }
      i += 1
    }
    out
  }

  /** Orthonormal 2D DCT-II (C = T·M·Tᵀ). StrictMath basis so the
    * coefficients — hence the hash bits — are bit-identical on every
    * JVM/platform (Math.cos may use platform intrinsics). */
  private def dct2(m: Array[Array[Double]]): Array[Array[Double]] = {
    val n = m.length
    val t = Array.tabulate(n, n) { (u, x) =>
      val a = if (u == 0) StrictMath.sqrt(1.0 / n) else StrictMath.sqrt(2.0 / n)
      a * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * n))
    }
    val tm = Array.ofDim[Double](n, n) // T·M
    var u = 0
    while (u < n) {
      var j = 0
      while (j < n) {
        var s = 0.0
        var x = 0
        while (x < n) { s += t(u)(x) * m(x)(j); x += 1 }
        tm(u)(j) = s
        j += 1
      }
      u += 1
    }
    val out = Array.ofDim[Double](n, n) // (T·M)·Tᵀ
    u = 0
    while (u < n) {
      var v = 0
      while (v < n) {
        var s = 0.0
        var j = 0
        while (j < n) { s += tm(u)(j) * t(v)(j); j += 1 }
        out(u)(v) = s
        v += 1
      }
      u += 1
    }
    out
  }

  /** Classic 64-bit pHash (the imagehash/pHash.org recipe): grayscale →
    * 32×32 area-average → 2D DCT-II → the 8×8 low-frequency block,
    * thresholded at its median (strict >, ties → 0); bit k = (u·8+v).
    * Robust to resize/re-encode/small edits — near-duplicate images land
    * within a few bits. */
  def pHash64(img: java.awt.image.BufferedImage): Long = {
    val c = dct2(grayMatrix(img, 32))
    val vals = new Array[Double](64)
    var k = 0
    while (k < 64) { vals(k) = c(k / 8)(k % 8); k += 1 }
    val sorted = vals.clone()
    java.util.Arrays.sort(sorted)
    val med = (sorted(31) + sorted(32)) / 2.0
    var hash = 0L
    k = 0
    while (k < 64) { if (vals(k) > med) hash |= (1L << k); k += 1 }
    hash
  }

  /** SplitMix64 finalizer — the byte-checksum fallback's mixer, so
    * undecodable blobs still get a well-spread deterministic 64-bit
    * identity (exact-dup bytes ⇒ equal hash; no perceptual meaning). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-media 64-bit perceptual hash: image rows that `ImageIO` can
    * decode get the real [[pHash64]] (`decoded = true`); everything
    * else gets the byte-checksum fallback through [[mix64]]
    * (`decoded = false` — exact dups still collide, the operator stays
    * total). Partition-local like [[extractFeatures]]. */
  def imagePHashes(media: Dataset[MediaRecord]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val real =
          if (r.kind != "image") None
          else
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.bytes)))
              .map(img => MediaHash(r.media_id, pHash64(img), decoded = true))
            catch { case _: Exception => None }
        real.getOrElse(MediaHash(r.media_id, mix64(byteChecksum(r.bytes)), decoded = false))
      }
    }
  }

  /** Perceptual near-duplicate image pairs: hamming ≤ `maxHamming` over
    * [[imagePHashes]] — multimodal dedup composed from the decode seam
    * and [[graft.llm.Dedup.sigHammingPairs]]'s distinct-signature
    * pigeonhole banding (complete for maxHamming ≤ 7, exact-verified).
    * The corpus's media BYTES never shuffle: only the thin
    * (media_id, 64-bit hash) projection enters the join. */
  def imageNearDupPairs(media: Dataset[MediaRecord], maxHamming: Int = 3): DataFrame =
    Dedup.sigHammingPairs(
      imagePHashes(media).toDF()
        .select(col("media_id").as("id"), col("phash").as("sig")),
      maxHamming)

  /** Normalized PCM samples from a decodable 16- or 8-bit audio stream
    * (the [[audioDecode]] sample path, returned whole) — None when the
    * bytes aren't decodable audio. */
  private def pcmSamples(bytes: Array[Byte]): Option[Array[Double]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(bytes)))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        if (bits != 16 && bits != 8) return None
        val data = in.readAllBytes()
        if (bits == 16) {
          val le = !fmt.isBigEndian
          val out = new Array[Double](data.length / 2)
          var i = 0
          while (i + 1 < data.length) {
            val s =
              if (le) ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
              else ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
            out(i / 2) = s / 32768.0
            i += 2
          }
          Some(out)
        } else Some(data.map(b => ((b & 0xFF) - 128) / 128.0))
      } finally in.close()
    } catch { case _: Exception => None }

  /** 64-bit energy-envelope audio fingerprint: the decoded PCM stream
    * splits into 64 equal windows, bit k = (window k's mean-square
    * energy > the median window energy) — the coarse shape of the
    * loudness envelope, the energy-difference family of audio
    * fingerprints (Haitsma–Kalker'02's robust-hash idea) reduced to
    * one 64-bit word so it rides the same pigeonhole machinery as
    * SimHash/pHash. Invariant to amplitude scaling? No — but to any
    * MONOTONE per-sample transform that preserves window-energy order,
    * including uniform gain; near-identical recordings land within a
    * few bits. None when the bytes aren't decodable audio or hold
    * fewer than 64 samples. */
  def audioFingerprint64(bytes: Array[Byte]): Option[Long] =
    pcmSamples(bytes).filter(_.length >= 64).map { s =>
      val energies = new Array[Double](64)
      var w = 0
      while (w < 64) {
        val x0 = s.length * w / 64
        val x1 = math.max(s.length * (w + 1) / 64, x0 + 1)
        var sum = 0.0
        var i = x0
        while (i < x1) { sum += s(i) * s(i); i += 1 }
        energies(w) = sum / (x1 - x0)
        w += 1
      }
      val sorted = energies.clone()
      java.util.Arrays.sort(sorted)
      val med = (sorted(31) + sorted(32)) / 2.0
      var hash = 0L
      w = 0
      while (w < 64) { if (energies(w) > med) hash |= (1L << w); w += 1 }
      hash
    }

  /** Per-media 64-bit audio fingerprint: audio rows that decode get the
    * real [[audioFingerprint64]] (`decoded = true`); everything else
    * the byte-checksum fallback (`decoded = false`) — the
    * [[imagePHashes]] contract for the audio column. */
  def audioFingerprints(media: Dataset[MediaRecord]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val real =
        if (r.kind != "audio") None
        else audioFingerprint64(r.bytes).map(MediaHash(r.media_id, _, decoded = true))
      real.getOrElse(MediaHash(r.media_id, mix64(byteChecksum(r.bytes)), decoded = false))
    })
  }

  /** Near-duplicate audio pairs: hamming ≤ `maxHamming` over
    * [[audioFingerprints]] through
    * [[graft.llm.Dedup.sigHammingPairs]] — the audio twin of
    * [[imageNearDupPairs]]; media bytes never shuffle. */
  def audioNearDupPairs(media: Dataset[MediaRecord], maxHamming: Int = 3): DataFrame =
    Dedup.sigHammingPairs(
      audioFingerprints(media).toDF()
        .select(col("media_id").as("id"), col("phash").as("sig")),
      maxHamming)

  /** Deterministic synthetic 16-bit mono WAV (8 kHz, 1 s = 64 windows
    * of 125 samples) for fingerprint tests and the t126 oracle query:
    * a 440 Hz carrier under a group-keyed two-level loudness envelope
    * (window w loud/quiet by a hash of (group, w) — decisive
    * median-threshold bits, the [[synthImagePng]] spectral-shape
    * lesson applied to energy), with four id-chosen windows pulled
    * toward the median so near-dup copies differ by a few bits. */
  def synthWavPcm(id: Long, nGroups: Int = 12): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val g = ((id % nGroups + nGroups) % nGroups).toInt
    val rate = 8000f
    val perWin = 125
    val nFrames = 64 * perWin
    val pcm = new Array[Byte](nFrames * 2)
    var w = 0
    while (w < 64) {
      val loud = (scala.util.hashing.MurmurHash3.productHash((g, w)) & 1) == 0
      val nudged = (0 until 4).exists(j =>
        w == (((id * 7 + j * 17) % 64 + 64) % 64).toInt)
      // loud 0.8 / quiet 0.2; a nudged window moves to 0.55 / 0.45 —
      // close enough to the median energy for per-id bit flips
      val amp =
        if (nudged) { if (loud) 0.55 else 0.45 }
        else { if (loud) 0.8 else 0.2 }
      var i = 0
      while (i < perWin) {
        val t = w * perWin + i
        val s = (StrictMath.sin(2 * StrictMath.PI * 440.0 * t / rate) * amp * 32767).toShort
        pcm(2 * t) = (s & 0xFF).toByte
        pcm(2 * t + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      w += 1
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic 32×32 synthetic PNG for perceptual-hash tests and
    * the t125 oracle query. Synthesized directly in DCT space: every
    * non-DC slot of the 8×8 low-frequency block carries a group-keyed
    * ±amplitude (each group is a random corner of {±A}⁶³, so two
    * groups differ in ~32 expected hash bits), while the per-id pixel
    * noise (±3 of 255) sits far below the slot amplitude — same-group
    * images land within a few bits. A flat-spectrum image (a single
    * sinusoid, say) would NOT work: 63 near-zero coefficients make
    * their bits coin flips under any noise — pHash separates images by
    * spectral SHAPE, so the fixture must have one. StrictMath so the
    * pixels are platform-identical. */
  def synthImagePng(id: Long, nGroups: Int = 12): Array[Byte] = {
    val g = ((id % nGroups + nGroups) % nGroups).toInt
    val signs = Array.tabulate(8, 8) { (u, v) =>
      if (u == 0 && v == 0) 0.0
      else if ((scala.util.hashing.MurmurHash3.productHash((g, u, v)) & 1) == 0) 1.0
      else -1.0
    }
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        var acc = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            acc += signs(u)(v) *
              StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 64.0) *
              StrictMath.cos((2 * y + 1) * v * StrictMath.PI / 64.0)
            v += 1
          }
          u += 1
        }
        val noise = ((id * 31 + x * 3 + y * 5) % 7).toInt - 3
        val p = math.min(255,
          math.max(0, StrictMath.round(127.5 + 6.0 * acc).toInt + noise))
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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
