package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def media = Multimodal.syntheticMedia(
    spark,
    Seq((0L, "hello world"), (1L, ""), (2L, "spark")).toDF("id", "txt"),
    "id", "txt")

  test("extractFeatures: deterministic stub decode, partition-local") {
    val a = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a(0).n_bytes == "hello world".getBytes("UTF-8").length)
    assert(a(1).n_bytes == 0 && a(1).brightness == 0.0)
    assert(a.forall(f => Set("image", "audio", "video").contains(f.kind)))
  }

  test("real ImageIO decode: true dimensions and brightness from PNG/JPEG pixels") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    // 8×6 PNG, left half black, right half white → brightness 0.5
    def halfAndHalf(w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
      img
    }
    def encode(img: BufferedImage, fmt: String): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    val png = encode(halfAndHalf(8, 6), "png")
    val jpg = encode(halfAndHalf(16, 10), "jpg")
    val ds = Seq(
      Multimodal.MediaRecord(1L, "image", png, 0, 0, 0L),
      Multimodal.MediaRecord(2L, "image", jpg, 0, 0, 0L),
      Multimodal.MediaRecord(3L, "image", "not an image".getBytes("UTF-8"), 0, 0, 0L)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)

    assert(f(0).decoded && f(0).decoded_width == 8 && f(0).decoded_height == 6)
    assert(math.abs(f(0).brightness - 0.5) < 1e-9) // PNG is lossless: exactly half white
    assert(f(1).decoded && f(1).decoded_width == 16 && f(1).decoded_height == 10)
    assert(math.abs(f(1).brightness - 0.5) < 0.05) // JPEG is lossy: near half
    assert(!f(2).decoded && f(2).decoded_width == 0) // fallback stays total
  }

  test("resizeImages: fit-within downscale, aspect preserved, pass-through for the rest") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, 0x808080)
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val ds = Seq(
      Multimodal.MediaRecord(1L, "image", png(64, 48), 0, 0, 0L), // downscale
      Multimodal.MediaRecord(2L, "image", png(16, 16), 0, 0, 0L), // already fits — no upscale
      Multimodal.MediaRecord(3L, "image", "junk".getBytes("UTF-8"), 0, 0, 0L), // undecodable
      Multimodal.MediaRecord(4L, "audio", "pcm".getBytes("UTF-8"), 7, 7, 0L)).toDS()
    val r = Multimodal.resizeImages(ds, 32, 32).collect().sortBy(_.media_id)

    assert((r(0).width, r(0).height) == (32, 24)) // 64×48 → ×0.5, aspect kept
    val decoded = ImageIO.read(new java.io.ByteArrayInputStream(r(0).bytes))
    assert(decoded.getWidth == 32 && decoded.getHeight == 24) // bytes really re-encoded
    assert((r(1).width, r(1).height) == (16, 16) && r(1).bytes.sameElements(png(16, 16)))
    assert(r(2).bytes.sameElements("junk".getBytes("UTF-8"))) // total: junk unchanged
    assert(r(3).width == 7 && r(3).bytes.sameElements("pcm".getBytes("UTF-8")))
  }

  test("real audio decode: duration and RMS loudness from WAV samples") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // 0.5 s of a full-scale 440 Hz sine at 8 kHz mono 16-bit → RMS ≈ 1/√2
    val rate = 8000f
    val nFrames = 4000
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * 32767).toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, out)
    val ds = Seq(
      Multimodal.MediaRecord(1L, "audio", out.toByteArray, 0, 0, 0L),
      Multimodal.MediaRecord(2L, "audio", "not audio".getBytes("UTF-8"), 0, 0, 0L)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)

    assert(f(0).decoded && f(0).decoded_duration_ms == 500L)
    assert(math.abs(f(0).brightness - 1.0 / math.sqrt(2)) < 0.01) // sine RMS
    assert(!f(1).decoded && f(1).decoded_duration_ms == 0L)
  }

  test("real ISO-BMFF video decode: mvhd duration + tkhd display dims from a synthetic MP4") {
    import java.io.ByteArrayOutputStream
    def box(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val size = payload.length + 8
      out.write(Array((size >>> 24).toByte, (size >>> 16).toByte, (size >>> 8).toByte, size.toByte))
      out.write(tpe.getBytes("US-ASCII"))
      out.write(payload)
      out.toByteArray
    }
    def u32(v: Long): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    // mvhd v0: version/flags, creation, modification, timescale=600,
    // duration=3000 ticks → 5000 ms; remaining fields zeroed
    val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++ u32(600) ++ u32(3000)
      ++ Array.fill[Byte](80)(0))
    // tkhd v0: 76 bytes up through the matrix, then 16.16 width/height
    val tkhdHead = u32(0) ++ u32(0) ++ u32(0) ++ u32(1) ++ u32(0) ++ u32(3000)
    val tkhd = box("tkhd", tkhdHead ++ Array.fill[Byte](76 - tkhdHead.length)(0)
      ++ u32(640L << 16) ++ u32(360L << 16))
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII") ++ u32(512) ++ "isomiso2".getBytes("US-ASCII")) ++
      box("moov", mvhd ++ box("trak", tkhd))

    val ds = Seq(
      Multimodal.MediaRecord(1L, "video", mp4, 0, 0, 0L),
      Multimodal.MediaRecord(2L, "video", "not a container".getBytes("UTF-8"), 0, 0, 0L)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(f(0).decoded && f(0).decoded_duration_ms == 5000L)
    assert(f(0).decoded_width == 640 && f(0).decoded_height == 360)
    assert(!f(1).decoded && f(1).decoded_duration_ms == 0L) // fallback stays total
  }

  test("binaryFile source: real media ingestion path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.bin"), Array[Byte](4, 5))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "skip.txt"), "no")
    val media = Multimodal.readBinaryDir(spark, dir, glob = "*.bin")
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.n_bytes)
    assert(feats.length == 2)
    assert(feats.map(_.n_bytes).toSeq == Seq(2L, 3L))
  }

  test("pHash64: identical images collide, small noise stays close, different frequency is far") {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO
    def hashOf(id: Long) = Multimodal.pHash64(
      ImageIO.read(new ByteArrayInputStream(Multimodal.synthImagePng(id))))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // same id → identical bytes → identical hash
    assert(hashOf(7L) == hashOf(7L))
    // same group (ids ≡ mod 12), different noise → within a few bits
    val sameGroup = for (i <- 0 until 4; j <- (i + 1) until 4)
      yield hamming(hashOf(12L * i + 3), hashOf(12L * j + 3))
    assert(sameGroup.forall(_ <= 6), s"same-group distances: $sameGroup")
    // different dominant frequency → far apart
    val crossGroup = for (g1 <- 0 until 6; g2 <- (g1 + 1) until 6)
      yield hamming(hashOf(g1.toLong), hashOf(g2.toLong))
    assert(crossGroup.forall(_ > 6), s"cross-group distances: $crossGroup")
  }

  test("imageNearDupPairs: banding equals brute-force hamming; fallback hashes for undecodable bytes") {
    val media = spark.createDataset((0L until 36L).map { id =>
      Multimodal.MediaRecord(id, "image", Multimodal.synthImagePng(id), 32, 32, 0L)
    })
    val hashes = Multimodal.imagePHashes(media).collect()
    assert(hashes.forall(_.decoded), "every synthetic PNG must really decode")
    val byId = hashes.map(h => h.media_id -> h.phash).toMap
    val maxH = 6
    val brute = (for {
      a <- 0L until 36L; b <- (a + 1) until 36L
      if java.lang.Long.bitCount(byId(a) ^ byId(b)) <= maxH
    } yield (a, b)).toSet
    val banded = Multimodal.imageNearDupPairs(media, maxHamming = maxH)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(banded == brute, s"banded ${banded.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "synthetic groups must produce near-dup pairs")
    // undecodable bytes: deterministic fallback, exact dups collide
    val junk = spark.createDataset(Seq(
      Multimodal.MediaRecord(100L, "image", Array[Byte](1, 2, 3), 0, 0, 0L),
      Multimodal.MediaRecord(101L, "image", Array[Byte](1, 2, 3), 0, 0, 0L),
      Multimodal.MediaRecord(102L, "audio", Array[Byte](9, 9), 0, 0, 0L)))
    val jh = Multimodal.imagePHashes(junk).collect().map(h => h.media_id -> h).toMap
    assert(!jh(100L).decoded && !jh(102L).decoded)
    assert(jh(100L).phash == jh(101L).phash, "identical bytes must collide")
    assert(jh(100L).phash != jh(102L).phash)
  }

  test("audioFingerprint64: identical WAVs collide, same-group near, cross-group far; banding == brute") {
    def fpOf(id: Long) = Multimodal.audioFingerprint64(Multimodal.synthWavPcm(id)).get
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fpOf(5L) == fpOf(5L))
    // same group (ids ≡ mod 12) differ only in the 4 id-nudged windows each
    val sameGroup = for (i <- 0 until 4; j <- (i + 1) until 4)
      yield hamming(fpOf(12L * i + 2), fpOf(12L * j + 2))
    assert(sameGroup.forall(_ <= 8), s"same-group distances: $sameGroup")
    // different envelope pattern → far apart
    val crossGroup = for (g1 <- 0 until 6; g2 <- (g1 + 1) until 6)
      yield hamming(fpOf(g1.toLong), fpOf(g2.toLong))
    assert(crossGroup.forall(_ > 8), s"cross-group distances: $crossGroup")

    val media = spark.createDataset((0L until 36L).map { id =>
      Multimodal.MediaRecord(id, "audio", Multimodal.synthWavPcm(id), 0, 0, 0L)
    })
    val hashes = Multimodal.audioFingerprints(media).collect()
    assert(hashes.forall(_.decoded), "every synthetic WAV must really decode")
    val byId = hashes.map(h => h.media_id -> h.phash).toMap
    val maxH = 7
    val brute = (for {
      a <- 0L until 36L; b <- (a + 1) until 36L
      if java.lang.Long.bitCount(byId(a) ^ byId(b)) <= maxH
    } yield (a, b)).toSet
    val banded = Multimodal.audioNearDupPairs(media, maxHamming = maxH)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(banded == brute && brute.nonEmpty)
    // undecodable bytes fall back deterministically
    val junk = spark.createDataset(Seq(
      Multimodal.MediaRecord(200L, "audio", "not audio".getBytes("UTF-8"), 0, 0, 0L)))
    assert(!Multimodal.audioFingerprints(junk).collect().head.decoded)
  }

  // ---- independent pins for the media hashes ------------------------------
  //
  // t125–t127's literal oracles are generated from the engine's own
  // output, so they pin regressions rather than prove the hash. These
  // two reimplement the PUBLIC recipes from scratch in the test tree —
  // direct-definition O(n⁴) DCT (vs production's T·M·Tᵀ matrix
  // factorization), separate gray/median/WAV-parsing code — and assert
  // bit-equality, so a production-side algebra or indexing slip cannot
  // hide behind a self-pinned oracle.

  /** Clean-room 64-bit pHash per the published recipe (imagehash /
    * pHash.org): 32×32 area-average gray → orthonormal 2D DCT-II by its
    * direct quadruple-sum definition → 8×8 low block, strict-> median
    * threshold, bit k = u·8+v. Shares no code with production. */
  private def refPHash64(img: java.awt.image.BufferedImage): Long = {
    val n = 32
    val g = Array.tabulate(n, n) { (i, j) =>
      val y0 = img.getHeight * i / n
      val y1 = math.max(img.getHeight * (i + 1) / n, y0 + 1)
      val x0 = img.getWidth * j / n
      val x1 = math.max(img.getWidth * (j + 1) / n, x0 + 1)
      val px = for (y <- y0 until y1; x <- x0 until x1) yield {
        val p = img.getRGB(x, y)
        (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3.0
      }
      px.sum / px.size
    }
    def alpha(u: Int) =
      if (u == 0) StrictMath.sqrt(1.0 / n) else StrictMath.sqrt(2.0 / n)
    val block = for (u <- 0 until 8; v <- 0 until 8) yield {
      var s = 0.0
      for (x <- 0 until n; y <- 0 until n)
        s += g(x)(y) * StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * n)) *
          StrictMath.cos((2 * y + 1) * v * StrictMath.PI / (2.0 * n))
      alpha(u) * alpha(v) * s
    }
    val med = { val s = block.sorted; (s(31) + s(32)) / 2.0 }
    block.zipWithIndex.foldLeft(0L) { case (h, (c, k)) =>
      if (c > med) h | (1L << k) else h
    }
  }

  test("pHash64 equals an independent clean-room reimplementation, bit for bit") {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO
    // synthetic corpus images across every spectral group + noise seeds
    for (id <- 0L until 36L) {
      val img = ImageIO.read(new ByteArrayInputStream(Multimodal.synthImagePng(id)))
      assert(Multimodal.pHash64(img) == refPHash64(img), s"id=$id")
    }
    // and arbitrary (non-synth-structured) deterministic RGB noise
    val rnd = new scala.util.Random(42)
    val img = new java.awt.image.BufferedImage(
      57, 43, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 43; x <- 0 until 57) img.setRGB(x, y, rnd.nextInt(1 << 24))
    assert(Multimodal.pHash64(img) == refPHash64(img))
  }

  /** Clean-room energy-envelope fingerprint: parse the WAV's `data`
    * chunk by hand (16-bit little-endian PCM), 64 equal windows,
    * mean-square energy, strict-> median threshold. */
  private def refAudioFp64(wav: Array[Byte]): Long = {
    // locate the data chunk: "data" tag then 4-byte LE size
    val at = (0 until wav.length - 8).find(i =>
      wav(i) == 'd' && wav(i + 1) == 'a' && wav(i + 2) == 't' && wav(i + 3) == 'a').get
    val len = ((wav(at + 4) & 0xFF) | ((wav(at + 5) & 0xFF) << 8) |
      ((wav(at + 6) & 0xFF) << 16) | ((wav(at + 7) & 0xFF) << 24))
    val pcm = wav.slice(at + 8, at + 8 + len)
    val samples = Array.tabulate(pcm.length / 2) { k =>
      ((pcm(2 * k + 1) << 8) | (pcm(2 * k) & 0xFF)).toShort / 32768.0
    }
    val energies = Array.tabulate(64) { w =>
      val x0 = samples.length * w / 64
      val x1 = math.max(samples.length * (w + 1) / 64, x0 + 1)
      var s = 0.0
      for (i <- x0 until x1) s += samples(i) * samples(i)
      s / (x1 - x0)
    }
    val sorted = energies.sorted
    val med = (sorted(31) + sorted(32)) / 2.0
    (0 until 64).foldLeft(0L) { (h, w) =>
      if (energies(w) > med) h | (1L << w) else h
    }
  }

  test("audioFingerprint64 equals an independent WAV-parse reimplementation, bit for bit") {
    for (id <- 0L until 36L) {
      val wav = Multimodal.synthWavPcm(id)
      assert(Multimodal.audioFingerprint64(wav).contains(refAudioFp64(wav)), s"id=$id")
    }
  }

  test("MediaHashStream: accumulated micro-batch pairs equal the batch run; index == rebuilt") {
    import java.nio.file.Files
    import graft.llm.Multimodal.MediaRecord
    // groups by id % 12 (synthImagePng): two same-group clusters split
    // across batches so cross-batch AND within-batch pairs both arise
    val ids1 = Seq(3L, 15L, 5L)          // batch 1: two of group 3, one of group 5
    val ids2 = Seq(27L, 17L, 2L)         // batch 2: group 3 (cross-batch), group 5 (cross-batch), group 2 (alone)
    def rec(id: Long) = MediaRecord(id, "image", Multimodal.synthImagePng(id), 32, 32, 0L)
    val dir = Files.createTempDirectory("graft_mhstream").toString
    ids1.map(rec).toDS().toDF().write.parquet(s"$dir/in1")
    ids2.map(rec).toDS().toDF().write.parquet(s"$dir/in2")
    val schema = spark.read.parquet(s"$dir/in1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in*")
    val q = graft.streaming.MediaHashStream.start(
      stream, s"$dir/wh", "media_sigs", s"$dir/ckpt", maxHamming = 6) {
      (pairs, _) => pairs.write.mode("append").parquet(s"$dir/out")
    }
    assert(q.awaitTermination(240000), "stream did not terminate in 240s")
    val streamed = spark.read.parquet(s"$dir/out")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val all = (ids1 ++ ids2).map(rec).toDS()
    val batch = Multimodal.imageNearDupPairs(all, maxHamming = 6)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    assert(batch.contains((3L, 27L)) || batch.contains((15L, 27L)),
      "expected a cross-batch near-dup pair")
    assert(batch.contains((3L, 15L)), "expected a within-batch near-dup pair")
    // maintained index equals a from-scratch hash of the latest corpus
    val cur = graft.sinks.ParquetMergeSink.readCurrent(spark, s"$dir/wh", "media_sigs").get
    val rebuilt = Multimodal.imagePHashes(all).toDF()
      .select($"media_id".as("id"), $"phash".as("sig"))
    assert(cur.select($"id", $"sig").as[(Long, Long)].collect().toSet ==
      rebuilt.as[(Long, Long)].collect().toSet)
    // and answers a fresh delta exactly: a new group-3 image pairs with
    // the three ingested group-3 ids through the maintained index
    val d = Multimodal.imagePHashes(Seq(rec(39L)).toDS()).toDF()
      .select($"media_id".as("id"), $"phash".as("sig"))
    val next = graft.llm.Dedup.sigHammingDeltaPairs(d, cur, maxHamming = 6)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(next.forall(p => p._1 == 39L || p._2 == 39L))
    assert(next.exists(p => Set(3L, 15L, 27L)(p._1) || Set(3L, 15L, 27L)(p._2)))
  }

  test("sampleFrames: n evenly spaced samples per item, empty-safe") {
    val frames = Multimodal.sampleFrames(media, 4)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == Map(0L -> 4L, 1L -> 4L, 2L -> 4L))
    val offsets = frames.filter($"media_id" === 0L).select("byte_offset")
      .as[Int].collect().sorted
    assert(offsets.toSeq == Seq(0, 2, 5, 8)) // 11 bytes, floor(11*i/4)
  }
}
