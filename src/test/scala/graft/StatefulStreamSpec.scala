package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Custom stateful streaming via mapGroupsWithState — the per-key
  * register pattern the reference keeps in DynamoDB (max-version gate),
  * here as a running per-user state across micro-batches. */
class StatefulStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("mapGroupsWithState keeps per-key running state across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_state").toString
    Seq((1L, 10L), (1L, 5L), (2L, 7L)).toDF("user_id", "v").write.parquet(s"$dir/in1")
    val schema = spark.read.parquet(s"$dir/in1").schema
    Seq((1L, 20L), (2L, 3L)).toDF("user_id", "v").write.parquet(s"$dir/in2")

    val updates = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in*")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[(Long, Long)]) =>
          val (n0, max0) = state.getOption.getOrElse((0L, Long.MinValue))
          val vs = rows.map(_._2).toSeq
          val next = (n0 + vs.size, math.max(max0, vs.max))
          state.update(next)
          (user, next._1, next._2)
      }

    val q = updates.toDF("user_id", "n_seen", "max_v")
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("state_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    // last update per user reflects cumulative state over both batches
    val last = spark.table("state_out")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("n_seen").as("n"),
        org.apache.spark.sql.functions.max("max_v").as("m"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(last.toSeq == Seq((1L, 3L, 20L), (2L, 2L, 7L)))
    spark.sql("DROP TABLE IF EXISTS state_out")
  }
}
