package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.IngestStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("streaming ingest: versioned csv files flow through clean ops") {
    val root = Files.createTempDirectory("graft_stream").toString
    def put(rel: String, body: String): Unit = {
      val p = Paths.get(root, rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, body)
    }
    put("20250101_000001/student.csv",
      "StudentId,StudentName\n1,Asha\n1,Asha\n2,\n3,Chen\n")
    put("20250101_000002/student.csv",
      "StudentId,StudentName\n4,Dee\n")

    val schema = StructType(Seq(
      StructField("StudentId", LongType), StructField("StudentName", StringType)))
    val stream = IngestStream.readVersionedCsv(spark, root, schema)
    assert(stream.isStreaming)

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = IngestStream.start(stream,
        Files.createTempDirectory("graft_ckpt").toString) { (batch: DataFrame, _: Long) =>
      seen ++= batch.collect().map(r => (
        r.getAs[Long]("StudentId"), r.getAs[String]("StudentName"), r.getAs[Long]("load_ts")))
    }
    q.awaitTermination(60000)

    val rows = seen.sortBy(_._1)
    // dup collapsed, null dropped, both versions tagged correctly
    assert(rows.map(_._1).toSeq == Seq(1L, 3L, 4L))
    assert(rows.collect { case (4L, _, ts) => ts }.headOption.contains(20250101000002L))
  }

  test("ClassifierStream scores micro-batches identically to the batch kernel") {
    import spark.implicits._
    import graft.llm.Classifier
    val dir = Files.createTempDirectory("graft_clfstream").toString
    // labeled seed: 'good'-bearing docs positive
    val seed = Seq(
      (1L, "good clean prose text here", true),
      (2L, "good solid writing sample always", true),
      (3L, "spam junk noise garbage keyboard", false),
      (4L, "junk noise spam mash output", false)).toDF("doc_id", "text", "y")
    val model = Classifier.nbTrain(seed, "doc_id", "text", "y", nBuckets = 64)
    val prior = Classifier.nbPriorPpm(seed, "y")
    // model round-trips through parquet like a real deployment
    model.write.parquet(s"$dir/model")
    val persisted = spark.read.parquet(s"$dir/model")

    val docs = Seq(
      (10L, "good clean prose again"),
      (11L, "noise spam garbage junk"),
      (12L, "completely unrelated words")).toDF("doc_id", "text")
    docs.filter($"doc_id" <= 10).write.parquet(s"$dir/in1")
    docs.filter($"doc_id" > 10).write.parquet(s"$dir/in2")
    val schema = spark.read.parquet(s"$dir/in1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in*")
    val q = graft.streaming.ClassifierStream.start(
      stream, "doc_id", "text", persisted, prior, nBuckets = 64,
      checkpoint = s"$dir/ckpt") { (scored, _) =>
      scored.write.mode("append").parquet(s"$dir/out")
    }
    q.awaitTermination(60000)
    val streamed = spark.read.parquet(s"$dir/out")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val batch = Classifier.nbScore(docs, persisted, prior, "doc_id", "text", 64)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(streamed == batch && streamed.size == 3)
    // the seeded separation survives the stream path
    val byId = streamed.map(r => r._1 -> r._4).toMap
    assert(byId(10L) && !byId(11L))
  }
}
