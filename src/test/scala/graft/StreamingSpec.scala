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
}
