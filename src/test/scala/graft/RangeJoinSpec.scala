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

  test("null and reversed bounds drop (match nothing) instead of raising; cap still fires") {
    val points = Seq((1L, 5L), (2L, 15L)).toDF("pid", "ts")
    val intervals = Seq(
      (10L, Some(0L), Some(9L)),   // normal: matches pid 1
      (20L, None, Some(9L)),       // null start: matches nothing, silently
      (30L, Some(0L), None),       // null end: matches nothing, silently
      (40L, Some(20L), Some(2L))   // reversed: matches nothing — and must
                                   // NOT reach sequence() (desc ramp)
    ).toDF("iid", "s", "e")
    val got = Relational.rangeJoin(points, "ts", intervals, "s", "e", binWidth = 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))

    // an interval genuinely wider than the cap raises an actionable error
    val wide = Seq((50L, 0L, 1000000L)).toDF("iid", "s", "e")
    val e = intercept[Exception] {
      Relational.rangeJoin(points, "ts", wide, "s", "e", binWidth = 1L,
        maxBinsPerInterval = 100L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("binWidth")), messages(e).mkString(" | "))
  }

  test("fractional points and bounds: exact semantics, no long truncation") {
    // 5.9 is NOT in [5.0, 5.1]; a trunc-to-long compare would say it is
    val points = Seq((1L, 5.9), (2L, 5.05), (3L, -5.9)).toDF("pid", "ts")
    val intervals = Seq(
      (10L, 5.0, 5.1),    // contains 5.05 only
      (20L, -6.0, -5.5)   // contains -5.9 only (floor-binning, not trunc)
    ).toDF("iid", "s", "e")
    val naive = points.join(intervals, $"ts".between($"s", $"e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val binned = Relational.rangeJoin(points, "ts", intervals, "s", "e", binWidth = 1L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(naive == Set((2L, 10L), (3L, 20L)))
  }

  test("binned range join plans as equi-join, not nested loop") {
    val points = Seq((1L, 5L)).toDF("pid", "ts")
    val intervals = Seq((10L, 0L, 9L)).toDF("iid", "s", "e")
    val p = Relational.rangeJoin(points, "ts", intervals, "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("keyed range join equals bin-only join + equality post-filter") {
    val points = Seq((1L, 100L, 5L), (2L, 100L, 15L), (3L, 200L, 5L), (4L, 200L, 99L))
      .toDF("pid", "lk", "ts")
    val intervals = Seq((10L, 100L, 0L, 9L), (20L, 100L, 8L, 22L), (30L, 200L, 0L, 9L))
      .toDF("iid", "rk", "s", "e")
    val keyless = Relational.rangeJoin(points, "ts", intervals, "s", "e", binWidth = 10L)
      .filter($"lk" === $"rk")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val keyed = Relational.rangeJoin(points, "ts", intervals, "s", "e", binWidth = 10L,
        keys = Seq("lk" -> "rk"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(keyed == keyless)
    assert(keyed == Set((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("keyed range join hashes on the key, not just the bin") {
    val points = Seq((1L, 100L, 5L)).toDF("pid", "lk", "ts")
    val intervals = Seq((10L, 100L, 0L, 9L)).toDF("iid", "rk", "s", "e")
    val p = Relational.rangeJoin(points, "ts", intervals, "s", "e", 10L,
        keys = Seq("lk" -> "rk"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // the join's equi-keys must include the user key (lk/rk), so k×
    // denser data cannot pile k² candidates into one bin's hash bucket
    assert(p.contains("lk") && p.contains("rk"), p)
  }
}
