package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the properties that make these operators hold
  * at 100 TB — filters/projections reach the parquet scan, small dims
  * broadcast instead of shuffling the fact table, hot paths stay inside
  * WholeStageCodegen. Regressions here are performance bugs even when
  * results stay correct. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.isolated // mutates session state (conf/listeners)
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
  }

  test("q01: shipdate filter is pushed to the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q02: only referenced columns are read (column pruning)") {
    val p = plan("q02_revenue_filter")
    val scanLine = p.linesIterator.find(_.contains("ReadSchema")).get
    // 4 referenced columns, not the 11-column lineitem schema
    assert(scanLine.contains("l_shipdate") && scanLine.contains("l_discount")
      && scanLine.contains("l_quantity") && scanLine.contains("l_extendedprice"))
    assert(!scanLine.contains("l_orderkey") && !scanLine.contains("l_returnflag"), scanLine)
  }

  test("q05: dimension tables broadcast; fact table never shuffles for them") {
    val p = plan("q05_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q04: semi join stays a join, not an aggregate-distinct rewrite") {
    val p = plan("q04_priority_exists")
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("q06: anti join planned as broadcast or shuffled hash join") {
    val p = plan("q06_anti_join")
    assert(p.contains("LeftAnti"), p.take(2000))
  }

  test("hot scans run inside WholeStageCodegen") {
    Seq("q01_pricing_summary", "t21_fingerprint", "t30_simhash").foreach { q =>
      assert(formatted(q).contains("WholeStageCodegen subtree"), q)
    }
  }

  test("t26: similarity join has no cartesian product anywhere") {
    val p = plan("t26_jaccard_pairs")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("t28: knn broadcasts the query side") {
    val p = plan("t28_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("t110: incremental postings merge anti-joins with a broadcast delta key set") {
    val p = plan("t110_bm25_incremental")
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("t112: incremental IVF merge anti-joins broadcast; search probe broadcasts") {
    val p = plan("t112_knn_ivf_incremental")
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(p.contains("BroadcastExchange"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("t113/t114: sweep and source-pref plans have no cartesian product") {
    assert(!plan("t113_threshold_sweep").contains("CartesianProduct"))
    assert(!plan("t114_source_pref_survivors").contains("CartesianProduct"))
  }

  test("t122: capped containment anti-joins the hot set, no cartesian or nested loop") {
    val p = plan("t122_containment_capped")
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("t123: incremental containment broadcasts the delta id set, no cartesian") {
    val p = plan("t123_containment_delta")
    assert(p.contains("LeftAnti"), p.take(2000))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("t124: rerank joins the shortlist without a cartesian or nested loop") {
    val p = plan("t124_bm25_rerank")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q36: as-of join is one shuffle + window, not a join explosion") {
    val p = plan("q36_asof_join")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q60: SQL BETWEEN join auto-rewrites to a binned equi-join, no nested loop") {
    val p = plan("q60_sql_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q60: rewrite is semantics-preserving vs the unrewritten nested-loop plan") {
    import graft.plans.IntervalJoinRewrite
    val rewritten = SparkEntry.queries("q60_sql_interval_join")(spark, dir).collect().toSeq
    spark.conf.set(IntervalJoinRewrite.BinWidthKey, "0") // disable
    try {
      val q = SparkEntry.queries("q60_sql_interval_join")(spark, dir)
      // the query function re-sets binWidth; force-disable after building
      spark.conf.set(IntervalJoinRewrite.BinWidthKey, "0")
      val naive = q.collect().toSeq
      assert(rewritten == naive)
    } finally spark.conf.unset(IntervalJoinRewrite.BinWidthKey)
  }

  test("interval rewrite leaves equi-joins and non-interval conditions alone") {
    import graft.plans.AsOfJoinNative
    AsOfJoinNative.register(spark)
    import spark.implicits._
    Seq((1L, 5L), (2L, 15L)).toDF("id", "p").createOrReplaceTempView("pts")
    Seq((10L, 0L, 10L), (20L, 10L, 20L)).toDF("iid", "s", "e").createOrReplaceTempView("iv")
    // equi conjunct present → untouched (no Generate/explode in plan)
    val equi = spark.sql("SELECT * FROM pts JOIN iv ON id = iid AND p BETWEEN s AND e")
    assert(!equi.queryExecution.optimizedPlan.toString.contains("explode"))
    // one-sided bound only → not an interval, untouched
    val half = spark.sql("SELECT * FROM pts JOIN iv ON p >= s")
    assert(!half.queryExecution.optimizedPlan.toString.contains("explode"))
    // true interval join → rewritten, and results exact on boundaries
    val iv = spark.sql("SELECT id, iid FROM pts JOIN iv ON p BETWEEN s AND e")
    assert(iv.queryExecution.optimizedPlan.toString.contains("explode"))
    assert(iv.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L), (2L, 20L)))
  }

  test("interval rewrite pins shuffle-hash when the interval side's estimate nears the broadcast threshold") {
    import graft.plans.AsOfJoinNative
    AsOfJoinNative.register(spark)
    import spark.implicits._
    Seq((1L, 5L), (2L, 15L)).toDF("id", "p").createOrReplaceTempView("pts_h")
    Seq((10L, 0L, 10L), (20L, 10L, 20L)).toDF("iid", "s", "e").createOrReplaceTempView("iv_h")
    def planFor() = spark
      .sql("SELECT id, iid FROM pts_h JOIN iv_h ON p BETWEEN s AND e")
      .queryExecution.executedPlan.toString
    // tiny threshold ⇒ the 4×-margin guard trips ⇒ shuffled hash join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try assert(planFor().contains("ShuffledHashJoin"), planFor().take(2000))
    finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    // default threshold, tiny interval side ⇒ broadcast plan retained
    assert(planFor().contains("BroadcastHashJoin"), planFor().take(2000))
  }

  test("interval rewrite stays transparent for null and reversed bounds") {
    import graft.plans.AsOfJoinNative
    AsOfJoinNative.register(spark)
    import spark.implicits._
    Seq((1L, 5L), (2L, 15L)).toDF("id", "p").createOrReplaceTempView("pts_nb")
    Seq(
      (10L, Some(0L), Some(10L)),  // matches p=5
      (20L, None, Some(10L)),      // null start: BETWEEN is never true
      (30L, Some(0L), None),       // null end: same
      (40L, Some(1000000000L), Some(0L)) // reversed: never true, and must
                                   // not feed Sequence a descending ramp
    ).toDF("iid", "s", "e").createOrReplaceTempView("iv_nb")
    val q = spark.sql("SELECT id, iid FROM pts_nb JOIN iv_nb ON p BETWEEN s AND e")
    assert(q.queryExecution.optimizedPlan.toString.contains("explode")) // rewritten
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 10L)))
  }

  test("auto binWidth: epoch-micros BETWEEN join is correct with the conf unset") {
    // 30-day intervals in epoch MICROS: any fixed default in "domain
    // units" is wrong here (1000 ⇒ 2.6e9 bins/interval ⇒ the fail-fast
    // valve); the `auto` probe derives width ≈ the median interval
    // length from the data, so the plain-SQL join just works.
    import graft.plans.{AsOfJoinNative, IntervalJoinRewrite}
    AsOfJoinNative.register(spark)
    import spark.implicits._
    spark.conf.unset(IntervalJoinRewrite.BinWidthKey)
    val day = 86400000000L
    val base = 1700000000000000L
    val pts = (0 until 200).map(i => (i.toLong, base + i * (day / 4))).toDF("id", "p")
    val ivs = (0 until 50).map(i => (i.toLong, base + i * day, base + (i + 30) * day))
      .toDF("iid", "s", "e")
    pts.createOrReplaceTempView("pts_us")
    ivs.createOrReplaceTempView("iv_us")
    val q = spark.sql("SELECT id, iid FROM pts_us JOIN iv_us ON p BETWEEN s AND e")
    assert(q.queryExecution.optimizedPlan.toString.contains("explode")) // rewritten
    val naive = pts.join(ivs, $"p".between($"s", $"e"))
      .select("id", "iid").as[(Long, Long)].collect().toSet
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && naive.nonEmpty)
  }

  test("auto binWidth: streaming interval side skips the probe, join still works") {
    // the width probe is a batch collect — on a streaming interval side
    // it must fall back to the fixed default instead of throwing at
    // plan time (streaming BETWEEN joins worked before `auto` existed)
    import graft.plans.{AsOfJoinNative, IntervalJoinRewrite}
    AsOfJoinNative.register(spark)
    import spark.implicits._
    spark.conf.unset(IntervalJoinRewrite.BinWidthKey)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivstream").toString
    Seq((10L, 0L, 100L), (20L, 500L, 600L)).toDF("iid", "s", "e")
      .write.parquet(s"$dir/in")
    val schema = spark.read.parquet(s"$dir/in").schema
    val ivs = spark.readStream.schema(schema).parquet(s"$dir/in")
    val pts = Seq((1L, 50L), (2L, 550L), (3L, 9999L)).toDF("id", "p")
    val q = pts.join(ivs, $"p".between($"s", $"e"))
      .select($"id", $"iid")
      .writeStream.outputMode("append")
      .format("memory").queryName("iv_stream_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("iv_stream_out").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 20L)))
    spark.sql("DROP TABLE IF EXISTS iv_stream_out")
  }

  test("interval rewrite fails fast with an actionable error past the bin cap") {
    import graft.plans.{AsOfJoinNative, IntervalJoinRewrite}
    AsOfJoinNative.register(spark)
    import spark.implicits._
    Seq((1L, 5L)).toDF("id", "p").createOrReplaceTempView("pts_cap")
    // a single interval spanning 10^9 domain units: with binWidth=1 that
    // is 10^9 bins per row — the silent-OOM shape the cap must reject
    Seq((10L, 0L, 1000000000L)).toDF("iid", "s", "e").createOrReplaceTempView("iv_cap")
    spark.conf.set(IntervalJoinRewrite.BinWidthKey, "1")
    try {
      val e = intercept[Exception] {
        spark.sql("SELECT id, iid FROM pts_cap JOIN iv_cap ON p BETWEEN s AND e").collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("rangeJoin.binWidth")),
        s"error should name the binWidth knob: ${messages(e).mkString(" | ")}")
    } finally spark.conf.unset(IntervalJoinRewrite.BinWidthKey)
  }
}
