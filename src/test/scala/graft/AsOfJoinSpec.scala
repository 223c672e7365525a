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
}
