package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-slope evidence for the RELATIONAL query family — the
  * q-side counterpart of [[ScaleBench]] (whose corpus covers the
  * t-side dedup/BPE family). Materializes a `factor`×-scaled sf dir
  * and times representative q-queries at base and scaled scale,
  * printing one JSON line per scale so the slope reads directly.
  *
  * Scaling scheme (keeps join structure realistic instead of
  * degenerate): fact tables get `factor` copies with copy-unique keys —
  * lineitem/orders shift their orderkey by `key*factor + copy` (a
  * lineitem copy joins exactly its own order copy, so join fan-out per
  * key is preserved while key cardinality grows 10×), events shift
  * event_id AND user_id (10× users, same sessions-per-user, so window
  * partition sizes stay realistic). Dimensions (region/nation/customer/
  * supplier/part) pass through unscaled — the TPC-H shape: facts grow,
  * dims don't, each customer just accrues 10× orders.
  *
  * Usage: `runMain graft.RelScaleBench [baseSfDir] [workDir] [factor] [repeat]`
  */
object RelScaleBench {

  /** Representative q-family members, one per plan archetype. */
  val Queries: Seq[String] = Seq(
    "q01_pricing_summary",        // full-scan hash agg
    "q03_top_revenue_orders",     // 3-way join + agg + top-k
    "q05_region_revenue",         // broadcast dims + shuffled fact join
    "q07_top_orders_per_customer",// window top-k per key
    "q16_merge_upsert",           // full-outer merge (upsert semantics)
    "q36_asof_join",              // as-of join (union-and-sweep)
    "q38_sessionize",             // gap-based sessionization windows
    "q53_range_join")             // interval join binned to equi-join

  def scaledDir(spark: SparkSession, baseDir: String, workDir: String, factor: Int): String = {
    val out = s"$workDir/rel_x$factor"
    // embeddings is written LAST — its _SUCCESS marks the whole dir
    if (!graft.fs.Fs.exists(s"$out/embeddings.parquet/_SUCCESS")) {
      val copies = spark.range(factor).select(col("id").as("copy"))
      def write(df: DataFrame, name: String): Unit =
        df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      def fanOut(name: String)(rekey: DataFrame => DataFrame): Unit =
        write(rekey(spark.read.parquet(s"$baseDir/$name.parquet").crossJoin(copies))
          .drop("copy"), name)
      fanOut("lineitem")(_.withColumn("l_orderkey",
        col("l_orderkey") * factor + col("copy")))
      fanOut("orders")(_.withColumn("o_orderkey",
        col("o_orderkey") * factor + col("copy")))
      fanOut("events")(_
        .withColumn("event_id", col("event_id") * factor + col("copy"))
        .withColumn("user_id", col("user_id") * factor + col("copy")))
      Seq("region", "nation", "customer", "supplier", "part", "documents", "embeddings")
        .foreach { t => write(spark.read.parquet(s"$baseDir/$t.parquet"), t) }
    }
    out
  }

  private def timeFamily(label: String, dir: String, spark: SparkSession): Unit = {
    val results = Queries.map { name =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      (name, (System.nanoTime() - t0) / 1e9, rows)
    }
    val qs = results.map { case (k, sec, rows) =>
      "\"" + k + "\":{\"sec\":" + sec + ",\"rows\":" + rows + "}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"rel_scale_family","scale":"$label","total_sec":$total,"queries":$qs}""")
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/root/repo/target/scalebench"
    val factor = if (args.length > 2) args(2).toInt else 10
    val repeat = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm-up

    timeFamily("base", baseDir, spark)
    val sd = scaledDir(spark, baseDir, workDir, factor)
    (1 to repeat).foreach { i => timeFamily(s"x$factor#$i", sd, spark) }
    spark.stop()
  }
}
