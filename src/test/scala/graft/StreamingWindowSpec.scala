package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Structured-Streaming analytics over the events shape: watermarked
  * tumbling-window aggregation and stateful dedup — the row-level
  * streaming surface the reference's file-level orchestration implies
  * (SURVEY.md §2.9). */
class StreamingWindowSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("watermarked tumbling window aggregation over a file stream") {
    val dir = Files.createTempDirectory("graft_sw").toString
    // two micro-batch files of (ts, user, value)
    Seq(
      ("2024-01-01 00:01:00", 1L, 10.0),
      ("2024-01-01 00:02:00", 1L, 5.0),
      ("2024-01-01 00:07:00", 2L, 1.0)
    ).toDF("ts", "user_id", "value")
      .withColumn("ts", $"ts".cast("timestamp"))
      .write.parquet(s"$dir/in1")
    val schema = spark.read.parquet(s"$dir/in1").schema

    val stream = spark.readStream.schema(schema).parquet(s"$dir/in*")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))

    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val out = spark.table("win_out")
      .select(col("window.start").cast("string"), $"user_id", $"n", $"v")
      .as[(String, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("2024-01-01 00:00:00", 1L, 2L, 15.0),
      ("2024-01-01 00:05:00", 2L, 1L, 1.0)))
    spark.sql("DROP TABLE IF EXISTS win_out")
  }

  test("streaming dropDuplicates is stateful across micro-batches") {
    val dir = Files.createTempDirectory("graft_sd").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(s"$dir/in1")
    val schema = spark.read.parquet(s"$dir/in1").schema
    Seq((2L, "b"), (3L, "c")).toDF("id", "s").write.parquet(s"$dir/in2")

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in*")
      .dropDuplicates("id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val ids = spark.table("dedup_out").select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L)) // 2 seen once despite arriving twice
    spark.sql("DROP TABLE IF EXISTS dedup_out")
  }

  test("streaming exact-dedup by content fingerprint (training-data intake)") {
    // the streaming form of Dedup.exactDedup: arriving documents dedup
    // on TextFunctions.fingerprint (md5 of normalized text), so
    // whitespace/case variants of already-seen docs drop across
    // micro-batches — the continuous-crawl intake path
    val dir = Files.createTempDirectory("graft_sf").toString
    Seq((1L, "The quick   brown fox"), (2L, "other doc"))
      .toDF("doc_id", "text").write.parquet(s"$dir/in1")
    val schema = spark.read.parquet(s"$dir/in1").schema
    Seq((3L, "the QUICK brown fox"), (4L, "fresh content"))
      .toDF("doc_id", "text").write.parquet(s"$dir/in2")

    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in*")
      .withColumn("fp", graft.functions.TextFunctions.fingerprint($"text"))
      .dropDuplicates("fp")
      .writeStream.outputMode("append")
      .format("memory").queryName("fp_dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val kept = spark.table("fp_dedup_out").select("doc_id").as[Long].collect().sorted
    // doc 3 is a case/whitespace variant of doc 1 → dropped
    assert(kept.toSeq == Seq(1L, 2L, 4L))
    spark.sql("DROP TABLE IF EXISTS fp_dedup_out")
  }
}
