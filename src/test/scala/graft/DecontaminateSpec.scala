package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Decontaminate

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // bench doc 10 is a verbatim slice of doc 1; doc 2 shares nothing
  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "tiny doc")
  ).toDF("doc_id", "text")
  private val bench = Seq(
    (10L, "beta gamma delta epsilon zeta eta theta iota"), // 8 tokens = one 8-gram, inside doc 1
    (11L, "totally unrelated benchmark prompt with its own words here now"),
    (12L, "tiny doc") // whole-sequence shingle matches doc 3 exactly
  ).toDF("bench_id", "text")

  test("overlapPairs counts distinct shared n-grams; short docs match whole-sequence") {
    val pairs = Decontaminate.overlapPairs(docs, "doc_id", "text",
        bench, "bench_id", "text", n = 8, minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    // doc 1 contains bench 10's single 8-gram; doc 3 == bench 12 via fallback shingle
    assert(pairs == Set((1L, 10L, 1L), (3L, 12L, 1L)))
  }

  test("minShared thresholds out weak overlaps") {
    val strict = Decontaminate.overlapPairs(docs, "doc_id", "text",
        bench, "bench_id", "text", n = 8, minShared = 2)
      .count()
    assert(strict == 0) // every overlap above is exactly one gram
    val loose = Decontaminate.overlapPairs(docs, "doc_id", "text",
        bench, "bench_id", "text", n = 3, minShared = 4)
      .as[(Long, Long, Long)].collect().toSet
    // bench 10's 8 tokens give 6 3-grams, all inside doc 1
    assert(loose == Set((1L, 10L, 6L)))
  }

  test("scrub drops flagged docs, keeps the rest with schema intact") {
    val clean = Decontaminate.scrub(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 8, minShared = 1)
    assert(clean.columns.toSeq == docs.columns.toSeq)
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("bench side is broadcast — the corpus never shuffles for the join") {
    val plan = Decontaminate.overlapPairs(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 8).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join, got:\n$plan")
  }
}
