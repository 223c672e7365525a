package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("binned range join equals naive between join, including bin-crossing intervals") {
    val points = Seq((1L, 5L), (2L, 15L), (3L, 25L), (4L, 99L)).toDF("pid", "ts")
    val intervals = Seq(
      (10L, 0L, 9L),    // within one bin
      (20L, 8L, 22L),   // crosses bins
      (30L, 24L, 26L),
      (40L, 50L, 60L)   // matches nothing
    ).toDF("iid", "s", "e")

    val naive = points.join(intervals, $"ts".between($"s", $"e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val binned = Relational.rangeJoin(points, "ts", intervals, "s", "e", binWidth = 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(naive == Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("binned range join plans as equi-join, not nested loop") {
    val points = Seq((1L, 5L)).toDF("pid", "ts")
    val intervals = Seq((10L, 0L, 9L)).toDF("iid", "s", "e")
    val p = Relational.rangeJoin(points, "ts", intervals, "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }
}
