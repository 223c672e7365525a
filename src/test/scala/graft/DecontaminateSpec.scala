package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Decontaminate

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.isolated // mutates session state (conf/listeners)
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

  test("scrubContaminatedSpans removes only the leaked windows; short docs scrub whole") {
    val idx = Decontaminate.benchGramIndex(bench, "text", n = 8)
    val out = Decontaminate.scrubContaminatedSpans(docs, "doc_id", "text", idx, n = 8)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // doc 1: bench 10's 8-gram covers tokens 1..8 ("beta".."iota") —
    // exactly those drop; "alpha" and "kappa" survive
    assert(out(1L) == ((1L, 10L, 8L, "alpha kappa")))
    // doc 2: untouched
    assert(out(2L) == ((2L, 10L, 0L, "one two three four five six seven eight nine ten")))
    // doc 3: whole-text shingle matches bench 12 — scrubs to empty
    assert(out(3L) == ((3L, 2L, 2L, "")))
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

  test("only the DISTINCT gram set is broadcast — never the exploded bench rows") {
    // Simulate exploded bench grams exceeding any broadcast budget:
    // threshold -1 disables every AUTOMATIC broadcast, so whatever
    // broadcast survives is one the operator explicitly forced. AQE off
    // so the executed plan is inspectable without running the query.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Decontaminate.overlapPairs(docs, "doc_id", "text",
        bench, "bench_id", "text", n = 8).queryExecution.executedPlan
      val broadcastOutputs = plan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
          b.output.map(_.name)
      }
      // exactly one broadcast: the deduped single-column gram set
      assert(broadcastOutputs == Seq(Seq("gram")),
        s"expected one gram-only broadcast, got $broadcastOutputs in:\n$plan")
      // the (doc, bench) attribution join is a shuffle join, and the
      // prefilter reaches the corpus side as a semi-join
      val s = plan.toString
      assert(s.contains("LeftSemi"), s)
      assert(s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin"), s)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  test("over-budget gram set degrades to a bloom prefilter: same results, no forced broadcast") {
    import org.apache.spark.sql.functions._
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // budget 0 forces the over-budget path regardless of bench size
      val bloomed = Decontaminate.overlapPairs(docs, "doc_id", "text",
        bench, "bench_id", "text", n = 8, minShared = 1, gramBroadcastBudget = 0L)
      // identical results: bloom false positives die in the stage-2 join
      assert(bloomed.as[(Long, Long, Long)].collect().toSet
        == Set((1L, 10L, 1L), (3L, 12L, 1L)))
      val plan = bloomed.queryExecution.executedPlan
      // the gram-set broadcast is gone — the corpus side sees only the
      // codegen bloom probe, and with auto-broadcast disabled no
      // BroadcastExchange exists anywhere in the plan
      val broadcasts = plan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
      }
      assert(broadcasts.isEmpty, s"expected no broadcast, got:\n$plan")
      assert(plan.toString.contains("bloom_might_contain"), plan.toString)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  test("bloom path equals broadcast path on a wide bench (false positives scrubbed)") {
    import org.apache.spark.sql.functions._
    val wideBench = spark.range(120).select(
      (col("id") + 100L).as("bench_id"),
      concat_ws(" ", (0 until 40).map(i =>
        concat(lit("w"), ((col("id") % 3) * 40 + i).cast("string"))): _*).as("text"))
    val corpus = spark.range(30).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(i =>
        concat(lit("w"), ((col("id") % 5) * 40 + i).cast("string"))): _*).as("text"))
    val viaBroadcast = Decontaminate.overlapPairs(corpus, "doc_id", "text",
        wideBench, "bench_id", "text", n = 8, minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    val viaBloom = Decontaminate.overlapPairs(corpus, "doc_id", "text",
        wideBench, "bench_id", "text", n = 8, minShared = 1, gramBroadcastBudget = 0L)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaBloom == viaBroadcast && viaBloom.nonEmpty)
  }

  test("scrubAgainstGramIndex equals scrub at minShared=1, on both prefilter paths") {
    val idx = Decontaminate.benchGramIndex(bench, "text", n = 8)
    val viaScrub = Decontaminate.scrub(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 8, minShared = 1)
      .select("doc_id").as[Long].collect().toSet
    val viaIndex = Decontaminate.scrubAgainstGramIndex(docs, "doc_id", "text",
      idx, n = 8, minShared = 1)
    assert(viaIndex.columns.toSeq == docs.columns.toSeq)
    assert(viaIndex.select("doc_id").as[Long].collect().toSet == viaScrub)
    // budget 0 forces the bloom path; the exact survivor semi-join must
    // scrub the bloom's false positives, so results are identical
    val viaBloom = Decontaminate.scrubAgainstGramIndex(docs, "doc_id", "text",
      idx, n = 8, minShared = 1, gramBroadcastBudget = 0L)
    assert(viaBloom.select("doc_id").as[Long].collect().toSet == viaScrub)
  }

  test("overlapGramCount counts against the gram UNION, not per bench doc") {
    // with n=3, bench 10's 8 tokens contribute 6 grams, all inside
    // doc 1 — union semantics must count 6 even though they span one
    // bench doc; doc 3's single whole-sequence shingle counts 1
    val idx = Decontaminate.benchGramIndex(bench, "text", n = 3)
    val got = Decontaminate.overlapGramCount(docs, "doc_id", "text", idx, n = 3)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 6L && got(3L) == 1L && !got.contains(2L))
  }

  test("streaming scrub: micro-batches against the persisted index equal the batch scrub") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_dstream").toString
    // persist the index, read it back — the production shape
    Decontaminate.benchGramIndex(bench, "text", n = 8).write.parquet(s"$dir/idx")
    val idx = spark.read.parquet(s"$dir/idx")
    // two micro-batch files: docs 1+2 then doc 3 (doc 3 is contaminated
    // only via the whole-sequence shingle — crosses into batch 2)
    docs.filter($"doc_id" <= 2).write.parquet(s"$dir/in1")
    docs.filter($"doc_id" === 3).write.parquet(s"$dir/in2")
    val schema = spark.read.parquet(s"$dir/in1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in*")
    val q = graft.streaming.DecontaminateStream.start(
      stream, "doc_id", "text", idx, s"$dir/ckpt", n = 8, minShared = 1) {
      (clean, _) => clean.write.mode("append").parquet(s"$dir/out")
    }
    q.awaitTermination(60000)
    val streamed = spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet
    val batch = Decontaminate.scrubAgainstGramIndex(docs, "doc_id", "text", idx)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch && batch == Set(2L))
  }

  test("two-stage plan matches a single brute-force gram join on a wide bench") {
    import org.apache.spark.sql.functions._
    // a bench big enough that its exploded grams dwarf its doc count:
    // 120 docs x 40 tokens => ~4k exploded 8-gram rows from 3 base docs
    val wideBench = spark.range(120).select(
      (col("id") + 100L).as("bench_id"),
      concat_ws(" ", (0 until 40).map(i =>
        concat(lit("w"), ((col("id") % 3) * 40 + i).cast("string"))): _*).as("text"))
    val corpus = spark.range(30).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 40).map(i =>
        concat(lit("w"), ((col("id") % 5) * 40 + i).cast("string"))): _*).as("text"))
    val got = Decontaminate.overlapPairs(corpus, "doc_id", "text",
        wideBench, "bench_id", "text", n = 8, minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    // brute force: plain exploded join, no prefilter
    val g = corpus.select(col("doc_id"),
      explode(graft.functions.TextFunctions.shingleSet(col("text"), 8)).as("gram"))
    val b = wideBench.select(col("bench_id"),
      explode(graft.functions.TextFunctions.shingleSet(col("text"), 8)).as("gram"))
    val want = g.join(b, "gram").groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n")).as[(Long, Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("crossSourceOverlap counts distinct shared grams per source pair") {
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa" // 10 toks → 3 8-grams
    val docs = Seq(
      ("srcA", s"$run lambda mu"),
      ("srcA", s"prefix words $run"),   // same grams again: distinct per source
      ("srcB", run),                    // shares all 3 run-grams with A
      ("srcB", "unrelated text that is entirely its own eight gram run here"),
      ("srcC", "nothing in common with anything else at all in this corpus row")
    ).toDF("source", "text")
    val out = Decontaminate.crossSourceOverlap(docs, "source", "text", n = 8)
      .as[(String, String, Long)].collect().toSet
    // the 12-token srcA docs contain the run's 3 8-grams plus shifted
    // ones; srcB's bare run has exactly 3 — all 3 shared, C untouched
    assert(out == Set(("srcA", "srcB", 3L)))
  }
}
