package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize a COMPLETE sf-layout directory at `factor`× a base sf
  * dir — the absolute-scale evidence run (an sf1-equivalent when factor
  * = 10 over sf0.1), so the FULL Bench suite can execute unchanged via
  * `SPARK_GRAFT_SF_DIR`. [[RelScaleBench]]/[[ScaleBench]] time
  * representative family members against partially-scaled inputs; this
  * builder scales every table into one directory:
  *
  *  - lineitem / orders / events: `factor` copies with copy-unique keys
  *    (RelScaleBench's scheme — join fan-out per key preserved, key
  *    cardinality grows, window partition sizes stay realistic)
  *  - documents: ScaleBench's junk-token extension (copies fall below
  *    near-dup thresholds, so pair counts grow ~linearly, the shape a
  *    real 10× crawl has)
  *  - embeddings: ScaleBench's norm-preserving rotation (same argument)
  *  - region / nation / customer / supplier / part: pass through — the
  *    TPC-H shape: facts grow, dims don't
  *
  * After the build, also smoke-runs every SparkEntry query once and
  * prints one JSON line per query with rows + seconds — unlike Bench
  * (which deliberately swallows per-query errors into timings), a
  * query that BREAKS at scale is reported loudly here.
  *
  * Usage: `runMain graft.ScaledSfDir [baseSfDir] [outDir] [factor] [skipSmoke]`
  */
object ScaledSfDir {

  def build(spark: SparkSession, baseDir: String, out: String, factor: Int): String = {
    // events.parquet is TIMESTAMP(NANOS); without this the plain read
    // below throws PARQUET_TYPE_ILLEGAL (queries set it themselves,
    // but the builder runs before any query)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
      Seq("region", "nation", "customer", "supplier", "part")
        .foreach { t => write(spark.read.parquet(s"$baseDir/$t.parquet"), t) }
      write(ScaleBench.scaledDocsDf(spark, baseDir, factor), "documents")
      write(ScaleBench.scaledEmbeddingsDf(spark, baseDir, factor), "embeddings")
    }
    out
  }

  /** Documents-only layout carrying [[ScaleBench.scaledFuzzyDocsDf]]'s
    * key-decorrelating alphabet rotation — the [[SlopeGate]] alternate
    * input for the fuzzy-KEY family, whose slope on the shared layout
    * is output-quadratic by corpus construction (identical 64-char
    * prefix keys across copies). Factor 1 is the identity rotation, so
    * the base side times the same per-doc work. Only
    * `documents.parquet` is written — the fuzzy queries read nothing
    * else. */
  def buildFuzzy(spark: SparkSession, baseDir: String, out: String, factor: Int): String = {
    if (!graft.fs.Fs.exists(s"$out/documents.parquet/_SUCCESS"))
      ScaleBench.scaledFuzzyDocsDf(spark, baseDir, factor)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
    out
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/root/repo/target/scalebench/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val skipSmoke = args.length > 3 && args(3).toBoolean
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

    val dir = build(spark, baseDir, outDir, factor)
    println(s"""{"metric":"scaled_sf_dir","dir":"$dir","factor":$factor}""")

    if (!skipSmoke) {
      var failed = 0
      // Dev loop: SPARK_GRAFT_ONLY=t94_...,t99_... smokes a subset
      // (same contract as Bench/Verify; the driver never sets it).
      val only = sys.env.get("SPARK_GRAFT_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      SparkEntry.queries.toSeq
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .sortBy(_._1).foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          val rows = fn(spark, dir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(s"""{"metric":"sf_smoke","query":"$name","rows":$rows,"sec":$sec}""")
        } catch {
          case e: Throwable =>
            failed += 1
            // full JSON string escape (backslash, quote, control chars)
            // — a \r, tab, or backslash in an exception message would
            // otherwise emit an invalid JSON line and break parsing
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              .take(200).flatMap {
                case '"'  => "\\\""
                case '\\' => "\\\\"
                case c if c < ' ' => f"\\u${c.toInt}%04x"
                case c => c.toString
              }
            println(s"""{"metric":"sf_smoke","query":"$name","error":"$msg"}""")
        }
      }
      println(s"""{"metric":"sf_smoke_done","failed":$failed}""")
    }
    spark.stop()
  }
}
