package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("asOfJoin matches latest right row at or before left ts, per key") {
    val left = Seq(
      (1L, 100L, "p1"), (1L, 200L, "p2"), (1L, 50L, "p0"),
      (2L, 100L, "p3")
    ).toDF("k", "ts", "name")
    val right = Seq(
      (1L, 90L, "c1"), (1L, 100L, "c2"), (1L, 150L, "c3"),
      (3L, 10L, "cx")
    ).toDF("k", "ts", "tag")

    val out = Relational.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("tag"))
      .select("k", "ts", "name", "asof_ts", "tag")
      .as[(Long, Long, String, Option[Long], Option[String])]
      .collect().sortBy(r => (r._1, r._2))

    assert(out.toSeq == Seq(
      (1L, 50L, "p0", None, None),              // nothing precedes
      (1L, 100L, "p1", Some(100L), Some("c2")), // >= semantics: equal ts matches
      (1L, 200L, "p2", Some(150L), Some("c3")),
      (2L, 100L, "p3", None, None)              // key with no right rows
    ))
  }

  test("native AsOfJoinExec matches the composed form on the same fixture") {
    val left = Seq(
      (1L, 100L, "p1"), (1L, 200L, "p2"), (1L, 50L, "p0"), (2L, 100L, "p3")
    ).toDF("k", "ts", "name")
    val right = Seq(
      (1L, 90L, "c1"), (1L, 100L, "c2"), (1L, 150L, "c3"), (3L, 10L, "cx")
    ).toDF("k", "ts", "tag")

    val native = graft.plans.AsOfJoinNative(left, right, Seq("k"), "ts", "ts", Seq("tag"))
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin "))
    val out = native.select("k", "ts", "name", "asof_ts", "tag")
      .as[(Long, Long, String, Option[Long], Option[String])]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      (1L, 50L, "p0", None, None),
      (1L, 100L, "p1", Some(100L), Some("c2")),
      (1L, 200L, "p2", Some(150L), Some("c3")),
      (2L, 100L, "p3", None, None)))
  }

  test("optimizer rule: limit pushes through the as-of join to the left child") {
    val left = (1 to 100).map(i => (i.toLong % 5, i.toLong, s"p$i")).toDF("k", "ts", "name")
    val right = Seq((1L, 10L, "c")).toDF("k", "ts", "tag")
    val limited = graft.plans.AsOfJoinNative(left, right, Seq("k"), "ts", "ts", Seq("tag")).limit(7)
    val opt = limited.queryExecution.optimizedPlan.toString
    // LocalLimit must appear BELOW the AsOfJoin node (pushed into left)
    val asofIdx = opt.indexOf("AsOfJoin")
    val limitIdx = opt.indexOf("LocalLimit", asofIdx)
    assert(asofIdx >= 0 && limitIdx > asofIdx, opt)
    assert(limited.count() == 7)
  }

  test("native as-of join equals composed form on real events data") {
    import org.apache.spark.sql.functions._
    val e = SparkEntry.events(spark, "/root/testdata/sf0.001")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val clicks = Relational.latestPerKey(
      e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id").as("click_event_id")),
      Seq("user_id", "ts_us"), Seq(col("click_event_id")))

    val composed = Relational.asOfJoin(purchases, clicks, Seq("user_id"), "ts_us", "ts_us", Seq("click_event_id"))
      .select("user_id", "event_id", "ts_us", "asof_ts_us", "click_event_id")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet
    val native = graft.plans.AsOfJoinNative(purchases, clicks, Seq("user_id"), "ts_us", "ts_us", Seq("click_event_id"))
      .select("user_id", "event_id", "ts_us", "asof_ts_us", "click_event_id")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSet
    assert(native == composed)
    assert(native.nonEmpty)
  }
}
