package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.CurationLedgerStore

/** Selective-probe evidence for the CURATION-LEDGER store at ×1/×10/×50
  * corpus scale — [[StoreProbeBench]]'s question asked of
  * [[graft.llm.CurationLedgerStore.absorbBatch]]: a CONSTANT-size
  * intake batch's absorb wall must grow with the CHURN, not the
  * corpus, or the churn-bounded verdict-COMPUTE claim is ×10 folklore.
  *
  * Corpus realism, tuned for THIS store's two scale-sensitive axes:
  *
  *  - '''Vocabulary grows with the corpus''' (Heaps' law) so the
  *    near-dup probe's postings and the vocab component stay
  *    corpus-size-independent per key — but only HALF the tokens are
  *    class-suffixed (hash-selected): an all-suffixed corpus collapses
  *    every per-doc score onto one value (uniform class sizes ⇒ equal
  *    lp everywhere), making the LM band degenerate (empty or
  *    everything). The unsuffixed half keeps the base text's natural
  *    token-frequency mix, so scores spread and the band population is
  *    a real, narrow slice. Shingles still go class-local (a 3-gram
  *    nearly always contains a suffixed token), so pair postings stay
  *    bounded.
  *  - '''The quality floor sits IN the distribution at every factor''':
  *    total counts grow with f, so a fixed floor drifts out of the
  *    score range and stages 3–5 degenerate. The build derives the
  *    floor as the scaled corpus's own median score (one untimed thin
  *    pass), persisted in the store's `_PARAMS` like any other knob.
  *  - '''Buckets are sized to the corpus''' (`∝ f`, the PrunedIndex
  *    rule) so touched-bucket reads stay delta-proportional.
  *
  * Per factor: build ONE store (one-time cost, reported separately),
  * then time the operational `absorb` of a constant `nDelta`-doc
  * re-upload batch (trailer-token revisions — near-dups of their
  * stored selves, with real vocab/count churn) and a `lookup` of the
  * batch ids in the stored ledger. Reps 2+ of the absorb are replays
  * (idempotent by contract) exercising the same candidate machinery.
  * The summary carries the SlopeGate-style budget gate (exit 2 on
  * breach) — the per-round STOREPROBE contract.
  *
  * Usage: `runMain graft.LedgerStoreProbeBench [baseSfDir] [workDir]
  *   [factorsCsv] [nDelta] [reps] [classesBase] [bucketsBase]
  *   [budget]` */
object LedgerStoreProbeBench {

  /** `factor` copies of the base docs with HALF the tokens suffixed by
    * the doc's class residue — vocabulary ∝ corpus, class size
    * constant, score distribution non-degenerate (see object doc). */
  def halfClassedDocsDf(spark: SparkSession, baseDir: String, factor: Int,
                        classesBase: Int): DataFrame = {
    val base = spark.read.parquet(s"$baseDir/documents.parquet")
    val copies = spark.range(factor).select(col("id").cast("int").as("copy"))
    val nClasses = classesBase * factor
    base.crossJoin(copies)
      .select((col("doc_id") * factor + col("copy")).as("doc_id"),
        col("text"), col("source"), col("n_chars"))
      .select(col("doc_id"), array_join(
        transform(split(col("text"), " "),
          t => when(pmod(hash(t), lit(2)) === 0,
            concat(t, lit("_"), pmod(col("doc_id"), lit(nClasses)).cast("string")))
            .otherwise(t)), " ").as("text"),
        col("source"), col("n_chars"))
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/root/repo/target/ledgerstoreprobe"
    val factors = (if (args.length > 2) args(2) else "1,10,50")
      .split(",").map(_.trim.toInt).toSeq
    val nDelta = if (args.length > 3) args(3).toInt else 100
    val reps = if (args.length > 4) args(4).toInt else 3
    val classesBase = if (args.length > 5) args(5).toInt else 50
    val bucketsBase = if (args.length > 6) args(6).toInt else 8
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
      var rows = -1L
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val r = run()
        // keep the FIRST rep's row count: absorb reps 2+ are replays
        // whose changed set is empty by the idempotence contract
        if (rows < 0L) rows = r
        (System.nanoTime() - t0) / 1e9
      }
      (walls.min, rows)
    }

    val cells = factors.map { f =>
      val docsPath = s"$workDir/docs_c${classesBase}_x$f"
      if (!graft.fs.Fs.exists(s"$docsPath/_SUCCESS"))
        halfClassedDocsDf(spark, baseDir, f, classesBase)
          .write.mode("overwrite").parquet(docsPath)
      val docs = spark.read.parquet(docsPath)
      val root = s"$workDir/ledgerstore_x$f"
      val buildSec =
        if (CurationLedgerStore.currentVersion(root).isEmpty) {
          // the floor must sit IN the scaled distribution: one untimed
          // thin pass derives the median score (persisted in _PARAMS)
          val scores = graft.llm.TextAnalysis.unigramLogProbPpmFromCensus(
            graft.llm.TextAnalysis.unigramCensus(docs, "doc_id", "text"),
            "doc_id")
          val floor = scores.stat
            .approxQuantile("avg_logprob_ppm", Array(0.5), 0.001)(0).toLong
          val bench = docs.filter(pmod(col("doc_id"), lit(997L)) === 0L)
          val p = CurationLedgerStore.Params(
            idCol = "doc_id", textCol = "text", scoreCol = "n_chars",
            sourceCol = "source",
            minAvgLogProbPpm = floor,
            neardupBuckets = 64 * f,
            idBuckets = bucketsBase * f, tokBuckets = bucketsBase * f)
          val t0 = System.nanoTime()
          CurationLedgerStore.build(spark, docs, bench, "text", root, p)
          (System.nanoTime() - t0) / 1e9
        } else -1.0
      // the CONSTANT-size batch: nDelta copy-0 docs re-uploaded with a
      // trailer — real vocab/count/pair churn, corpus-independent size
      val delta = docs
        .filter(pmod(col("doc_id"), lit(f.toLong)) === 0L)
        .filter(col("doc_id") < lit(nDelta.toLong * f))
        .select(col("doc_id"),
          concat(col("text"), lit(" ledgerprobe rev2 trailer")).as("text"),
          col("source"), col("n_chars"))
        .localCheckpoint()
      val deltaIds = delta.select(col("doc_id")).localCheckpoint()
      val ops: Seq[(String, () => Long)] = Seq(
        ("absorb", () =>
          CurationLedgerStore.absorbBatch(spark, root, delta).count()),
        ("lookup", () => graft.sources.PrunedIndex.readPruned(spark,
          s"${CurationLedgerStore.currentPath(root).get}/ledger",
          deltaIds).count()))
      val probes = ops.map { case (op, run) =>
        val (sec, rows) = timeMin(run)
        println(s"""{"metric":"ledger_store_probe","op":"$op","factor":$f,""" +
          s""""id_buckets":${bucketsBase * f},"probe_sec":$sec,"rows":$rows,""" +
          s""""build_sec":$buildSec,"n_delta":$nDelta}""")
        (op, sec, rows)
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (f, buildSec, probes)
    }
    val base = cells.head
    val breaches = cells.last._3.flatMap { case (op, sec, _) =>
      val ratio = sec / base._3.find(_._1 == op).get._2
      if (ratio > budget) Some(op -> ratio) else None
    }
    val summary = cells.map { case (f, build, probes) =>
      val ops = probes.map { case (op, sec, rows) =>
        val ratio = sec / base._3.find(_._1 == op).get._2
        s""""$op":{"probe_sec":$sec,"rows":$rows,"probe_over_x1":$ratio}"""
      }.mkString("{", ",", "}")
      s""""x$f":{"build_sec":$build,"ops":$ops}"""
    }.mkString("{", ",", "}")
    val breachesJson = breaches
      .map { case (op, r) => s"""{"op":"$op","ratio":$r}""" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"ledger_store_probe_summary","n_delta":$nDelta,""" +
      s""""reps":$reps,"classes_base":$classesBase,"buckets_base":$bucketsBase,""" +
      s""""budget":$budget,"breaches":$breachesJson,""" +
      s""""pass":${breaches.isEmpty},"scales":$summary}""")
    spark.stop()
    if (breaches.nonEmpty) sys.exit(2)
  }
}
