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
