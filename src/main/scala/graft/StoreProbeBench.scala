package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.NearDupIndexStore

/** Selective-probe evidence for the UNIFIED dedup store at ×1/×10/×50
  * corpus scale — [[PrunedProbeBench]]'s question asked of the
  * [[graft.llm.NearDupIndexStore]] probes (r17 verdict item #7: the
  * five dedup families' delta-bounded claim had only ×10 slope
  * evidence; this adds the next half-decade on the store path).
  *
  * The claim under test: a CONSTANT-size delta batch's probe wall
  * grows with the DELTA (flat-ish), not the corpus. Two conditions a
  * real 100 TB corpus satisfies must hold in the synthetic one or the
  * claim is untestable (the [[PrunedProbeBench]] argument):
  *
  *  - VOCABULARY grows with the corpus (Heaps' law). The raw synthetic
  *    documents are word salad over 31 words — at any scale every
  *    shingle is corpus-hot and every probe key's postings grow
  *    linearly no matter the layout. Tokens are therefore suffixed
  *    with their doc's class residue (`doc_id mod (classesBase·f)`):
  *    class COUNT grows ∝ corpus, class SIZE stays constant, so a
  *    probed shingle's postings list is corpus-size-independent —
  *    the tail-shingle shape of a real crawl.
  *  - BUCKETS are sized to the corpus (`numBuckets ∝ f` — the
  *    [[graft.sources.PrunedIndex]] sizing rule: buckets track the
  *    index's file count). A fixed bucket count at ×50 means each
  *    touched bucket carries 50× the strangers; sized buckets keep
  *    per-bucket bytes constant, so the probe's touched-bucket reads
  *    are delta-proportional.
  *
  * Per factor: build ONE store carrying the jaccard + containment +
  * winnowing + minhash families (one-time cost, reported separately),
  * then probe each family with the SAME constant-size delta
  * (`nDelta` re-uploads with a trailer — near-dups of their source
  * docs) and report min-of-`reps` probe walls. The summary line's
  * `probe_over_x1` per family is the evidence NOTES_r{N} commits: a
  * value ≪ the corpus factor is the delta-bounded claim holding.
  *
  * Usage: `runMain graft.StoreProbeBench [baseSfDir] [workDir]
  *   [factorsCsv] [nDelta] [reps] [classesBase] [bucketsBase]` */
object StoreProbeBench {

  /** `factor` copies of the base docs with every token suffixed by the
    * doc's class residue — vocabulary ∝ corpus, class size constant. */
  def classedDocsDf(spark: SparkSession, baseDir: String, factor: Int,
                    classesBase: Int): DataFrame = {
    val base = spark.read.parquet(s"$baseDir/documents.parquet")
    val copies = spark.range(factor).select(col("id").cast("int").as("copy"))
    val nClasses = classesBase * factor
    base.crossJoin(copies)
      .select((col("doc_id") * factor + col("copy")).as("doc_id"), col("text"))
      .select(col("doc_id"), array_join(
        transform(split(col("text"), " "),
          t => concat(t, lit("_"),
            pmod(col("doc_id"), lit(nClasses)).cast("string"))), " ")
        .as("text"))
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/root/repo/target/storeprobe"
    val factors = (if (args.length > 2) args(2) else "1,10,50")
      .split(",").map(_.trim.toInt).toSeq
    val nDelta = if (args.length > 3) args(3).toInt else 100
    val reps = if (args.length > 4) args(4).toInt else 3
    val classesBase = if (args.length > 5) args(5).toInt else 50
    val bucketsBase = if (args.length > 6) args(6).toInt else 64
    val budget = if (args.length > 7) args(7).toDouble else 10.0
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

    def timeMin(run: () => Long): (Double, Long) = {
      var rows = 0L
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        rows = run()
        (System.nanoTime() - t0) / 1e9
      }
      (walls.min, rows)
    }

    val cells = factors.map { f =>
      val docsPath = s"$workDir/docs_c${classesBase}_x$f"
      if (!graft.fs.Fs.exists(s"$docsPath/_SUCCESS"))
        classedDocsDf(spark, baseDir, f, classesBase)
          .write.mode("overwrite").parquet(docsPath)
      val docs = spark.read.parquet(docsPath)
      val root = s"$workDir/store_c${classesBase}_x$f"
      val numBuckets = bucketsBase * f
      val buildSec =
        if (NearDupIndexStore.currentVersion(root).isEmpty) {
          val t0 = System.nanoTime()
          NearDupIndexStore.build(spark, docs, "doc_id", "text", root,
            numBuckets = numBuckets, withContainment = true,
            winnowing = Some((16, 8)), minhash = Some((64, 16)))
          (System.nanoTime() - t0) / 1e9
        } else -1.0
      // the CONSTANT-size delta: nDelta copy-0 docs re-uploaded with a
      // trailer — near-dups of their stored revision, vocabulary-matched
      // to their class
      val delta = docs
        .filter(pmod(col("doc_id"), lit(f.toLong)) === 0L)
        .filter(col("doc_id") < lit(nDelta.toLong * f))
        .select(col("doc_id"),
          concat(col("text"), lit(" storeprobe_rev2_trailer")).as("text"))
        .localCheckpoint()
      val families: Seq[(String, () => Long)] = Seq(
        ("jaccard", () => NearDupIndexStore.pairsForDelta(
          spark, root, delta, "doc_id", "text").count()),
        ("containment", () => NearDupIndexStore.containmentPairsForDelta(
          spark, root, delta, "doc_id", "text", maxDf = 16).count()),
        ("winnowing", () => NearDupIndexStore.winnowingPairsForDelta(
          spark, root, delta, "doc_id", "text", minShared = 8, maxDf = 16).count()),
        ("minhash", () => NearDupIndexStore.minhashPairsForDelta(
          spark, root, delta, "doc_id", "text").count()))
      val probes = families.map { case (fam, run) =>
        val (sec, rows) = timeMin(run)
        println(s"""{"metric":"store_probe","family":"$fam","factor":$f,""" +
          s""""num_buckets":$numBuckets,"probe_sec":$sec,"rows":$rows,""" +
          s""""build_sec":$buildSec,"n_delta":$nDelta}""")
        (fam, sec, rows)
      }
      NearDupIndexStore.releaseProbeCache(root, delta, "doc_id", "text")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (f, buildSec, probes)
    }
    val base = cells.head
    // SlopeGate-style budget: the delta-bounded claim is a per-round
    // regression gate (STOREPROBE contract), not a re-argued table —
    // any family whose xMax/x1 probe ratio exceeds `budget` breaches
    val breaches = cells.last._3.flatMap { case (fam, sec, _) =>
      val ratio = sec / base._3.find(_._1 == fam).get._2
      if (ratio > budget) Some(fam -> ratio) else None
    }
    val summary = cells.map { case (f, build, probes) =>
      val fams = probes.map { case (fam, sec, rows) =>
        val ratio = sec / base._3.find(_._1 == fam).get._2
        s""""$fam":{"probe_sec":$sec,"rows":$rows,"probe_over_x1":$ratio}"""
      }.mkString("{", ",", "}")
      s""""x$f":{"build_sec":$build,"families":$fams}"""
    }.mkString("{", ",", "}")
    val breachesJson = breaches
      .map { case (fam, r) => s"""{"family":"$fam","ratio":$r}""" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"store_probe_summary","n_delta":$nDelta,"reps":$reps,""" +
      s""""classes_base":$classesBase,"buckets_base":$bucketsBase,""" +
      s""""budget":$budget,"breaches":$breachesJson,""" +
      s""""pass":${breaches.isEmpty},"scales":$summary}""")
    spark.stop()
    if (breaches.nonEmpty) sys.exit(2)
  }
}
