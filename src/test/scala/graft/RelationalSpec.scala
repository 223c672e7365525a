package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("a"), Some(1.0)),
    (2L, None, Some(2.0)),
    (3L, Some("c"), None),
    (4L, Some("d"), Some(4.0)),
    (4L, Some("d"), Some(4.0)) // exact dup
  ).toDF("id", "s", "v")

  test("dropNullRows removes any-null rows (P2)") {
    assert(Relational.dropNullRows(fixture).count() == 3)
  }

  test("nullViolations is the complement side-output (P1)") {
    val v = Relational.nullViolations(fixture).select("id").as[Long].collect().sorted
    assert(v.toSeq == Seq(2L, 3L))
  }

  test("distinctRows removes exact dups (D1)") {
    assert(Relational.distinctRows(fixture).count() == 4)
  }

  test("latestPerKey keeps max-order row per key (P3 bulk)") {
    val df = Seq((1L, 10L, "old"), (1L, 20L, "new"), (2L, 5L, "only"))
      .toDF("k", "ver", "val")
    val out = Relational.latestPerKey(df, Seq("k"), Seq(col("ver")))
      .select("k", "val").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "new", 2L -> "only"))
  }

  test("mergeUpsert: incoming wins per key, unmatched existing survives (D2)") {
    val existing = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "s", "v")
    val incoming = Seq((2L, "B", 20.0), (3L, "C", 30.0)).toDF("id", "s", "v")
    val out = Relational.mergeUpsert(existing, incoming, Seq("id"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 1.0), (2L, "B", 20.0), (3L, "C", 30.0)))
  }

  test("mergeUpsert is idempotent (re-applying the same delta)") {
    val existing = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "s", "v")
    val incoming = Seq((2L, "B", 20.0)).toDF("id", "s", "v")
    val once = Relational.mergeUpsert(existing, incoming, Seq("id"))
    val twice = Relational.mergeUpsert(once, incoming, Seq("id"))
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
  }

  test("mergeUpsert refuses empty keys (reference bug D2 guarded)") {
    val df = Seq((1L, "a", 1.0)).toDF("id", "s", "v")
    intercept[IllegalArgumentException] {
      Relational.mergeUpsert(df, df, Nil)
    }
  }

  test("mergeUpsert Strict rejects added/dropped columns with a useful message") {
    val existing = Seq((1L, "a")).toDF("id", "s")
    val incoming = Seq((1L, "a", 9.0)).toDF("id", "s", "extra")
    val e = intercept[IllegalArgumentException] {
      Relational.mergeUpsert(existing, incoming, Seq("id"))
    }
    assert(e.getMessage.contains("extra"))
  }

  test("mergeUpsert AddColumns: new column null-backfills, missing column keeps existing value") {
    import Relational.SchemaPolicy
    val existing = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "s", "v")
    // incoming adds 'tag' and drops 'v'
    val incoming = Seq((2L, "B", "hot"), (3L, "C", "new")).toDF("id", "s", "tag")
    val out = Relational.mergeUpsert(existing, incoming, Seq("id"), SchemaPolicy.AddColumns)
      .select("id", "s", "v", "tag")
      .as[(Long, String, Option[Double], Option[String])].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a", Some(1.0), None),        // untouched existing row; new col null
      (2L, "B", Some(2.0), Some("hot")), // match: v survives, tag arrives
      (3L, "C", None, Some("new"))))     // insert: v null
  }

  test("mergeUpsert always rejects same-name type conflicts (any policy)") {
    import Relational.SchemaPolicy
    val existing = Seq((1L, 1.5)).toDF("id", "v")
    val incoming = Seq((1L, "x")).toDF("id", "v")
    Seq(SchemaPolicy.Strict, SchemaPolicy.AddColumns).foreach { p =>
      val e = intercept[IllegalArgumentException] {
        Relational.mergeUpsert(existing, incoming, Seq("id"), p)
      }
      assert(e.getMessage.contains("v: existing=double incoming=string"), e.getMessage)
    }
  }

  test("mergeReplaceGroups: incoming groups displace wholesale, others survive") {
    // multi-row-per-key index table: key 2's revision has FEWER rows —
    // a row-keyed upsert would orphan (2, "y"); group-replace must not
    val existing = Seq((1L, "a"), (2L, "x"), (2L, "y"), (3L, "c"))
      .toDF("id", "term")
    val incoming = Seq((2L, "z"), (4L, "d")).toDF("id", "term")
    val out = Relational.mergeReplaceGroups(existing, incoming, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "z"), (3L, "c"), (4L, "d")))
    val e = intercept[IllegalArgumentException] {
      Relational.mergeReplaceGroups(existing,
        incoming.withColumnRenamed("term", "word"), Seq("id"))
    }
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("mergeReplaceGroups displaces NULL-key groups (null-safe join)") {
    // With a plain `=` anti-join NULL keys never match: the existing
    // NULL group would survive every merge and accumulate a duplicate
    // per batch instead of being replaced.
    val existing = Seq((Some(1L), "a"), (None, "x"), (None, "y"))
      .toDF("id", "term")
    val incoming = Seq((Option.empty[Long], "z")).toDF("id", "term")
    val out = Relational.mergeReplaceGroups(existing, incoming, Seq("id"))
      .as[(Option[Long], String)].collect().toSet
    assert(out == Set((Some(1L), "a"), (None, "z")))
    // repeated merges stay stable (no NULL-group accumulation)
    val again = Relational.mergeReplaceGroups(
      Relational.mergeReplaceGroups(existing, incoming, Seq("id")),
      incoming, Seq("id")).as[(Option[Long], String)].collect().toSet
    assert(again == Set((Some(1L), "a"), (None, "z")))
  }

  test("topKPerGroup deterministic ranks") {
    val df = Seq((1L, 10.0, 100L), (1L, 10.0, 101L), (1L, 5.0, 102L), (2L, 1.0, 103L))
      .toDF("g", "score", "id")
    val out = Relational.topKPerGroup(df, Seq("g"), Seq(col("score").desc, col("id")), 2)
      .select("g", "rank", "id").as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq((1L, 1, 100L), (1L, 2, 101L), (2L, 1, 103L)))
  }
}
