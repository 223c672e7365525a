package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{normalizeText, tokens}

/** Selective-probe evidence for the [[graft.sources.PrunedIndex]]
  * layout — the measurement t119 cannot provide: t119's query set is
  * corpus-derived (every doc's lead tokens), so its probe terms hit
  * ~all buckets and the pruned read degenerates to the flat read by
  * design. The layout's reason to exist is the SELECTIVE probe — a
  * bounded online query batch whose terms hash into a small fraction
  * of buckets; this bench measures exactly that case against the flat
  * layout at ×1 and ×`factor` corpus scale.
  *
  * Corpus: the synthetic documents table is word salad over a 31-WORD
  * vocabulary, so every real term is corpus-hot and a 100-term probe
  * cannot exist; [[expandedDocsDf]] restores a realistic vocabulary
  * (Heaps' law — tens of thousands of terms at these doc counts) by
  * suffixing every token with its document's `doc_id mod vocabClasses`
  * residue: vocabulary grows ×vocabClasses, each expanded term's
  * document frequency is ~n_docs/vocabClasses, and a term's postings
  * still live wholly in one bucket. The probe is a FIXED 100-term set
  * drawn deterministically from the ×1 vocabulary (present at every
  * scale; terms do not grow with the corpus — the realistic online
  * shape, where t92's corpus-derived set is the stress shape).
  *
  * Each (layout, scale) cell runs `reps` times; the MIN is the
  * statistic (stall windows cannot produce a min — the SlopeGate
  * convention). The first pruned rep pays the one-time partition
  * listing that [[graft.sources.PrunedIndex]] caches thereafter (the
  * metastore-analog cost); min-of-reps measures the steady state an
  * online query service runs in. Prints one JSON line per cell plus a
  * summary with the pruned/flat ratio at each scale.
  *
  * Usage: `runMain graft.PrunedProbeBench [baseSfDir] [workDir] [factor]
  *   [numBuckets] [nTerms] [reps] [vocabClasses]`
  */
object PrunedProbeBench {

  /** `factor` copies of the base docs (copy-unique ids, no junk
    * extension — BM25 probing needs vocabulary, not near-dup realism)
    * with every token suffixed by the doc's id-residue class. */
  def expandedDocsDf(spark: SparkSession, baseDir: String, factor: Int,
                     vocabClasses: Int): DataFrame = {
    val base = spark.read.parquet(s"$baseDir/documents.parquet")
    val copies = spark.range(factor).select(col("id").cast("int").as("copy"))
    base.crossJoin(copies)
      .select((col("doc_id") * factor + col("copy")).as("doc_id"), col("text"))
      .select(col("doc_id"), array_join(
        transform(tokens(normalizeText(col("text"))),
          t => concat(t, lit("_"),
            pmod(col("doc_id"), lit(vocabClasses)).cast("string"))), " ")
        .as("text"))
  }

  /** Fixed probe: the first `nTerms` terms of the ×1 expanded
    * vocabulary by (md5(term), term) order — deterministic, spread
    * uniformly over term-hash buckets, and scale-independent. */
  def probeTerms(post: DataFrame, nTerms: Int): DataFrame =
    post.select(col("term")).distinct()
      .orderBy(md5(col("term")), col("term"))
      .limit(nTerms)

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/root/repo/target/prunedprobe"
    val factor = if (args.length > 2) args(2).toInt else 10
    val numBuckets = if (args.length > 3) args(3).toInt else 1024
    val nTerms = if (args.length > 4) args(4).toInt else 100
    val reps = if (args.length > 5) args(5).toInt else 3
    val vocabClasses = if (args.length > 6) args(6).toInt else 500
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

    def docsPath(f: Int): String = {
      val out = s"$workDir/docs_v${vocabClasses}_x$f"
      if (!graft.fs.Fs.exists(s"$out/_SUCCESS"))
        expandedDocsDf(spark, baseDir, f, vocabClasses)
          .write.mode("overwrite").parquet(out)
      out
    }

    val basePost = graft.llm.Retrieval.postings(
      spark.read.parquet(docsPath(1)), "doc_id", "text")
    val queries = probeTerms(basePost, nTerms)
      .select(monotonically_increasing_id().as("query_id"), col("term").as("qtext"))
      .localCheckpoint() // freeze the probe — identical rows for every cell
    val nQ = queries.count()

    def buildLayouts(path: String, tag: String): (String, String) = {
      val flat = s"$workDir/${tag}_flat"
      val bkt = s"$workDir/${tag}_bucketed"
      val post = graft.llm.Retrieval.postings(
        spark.read.parquet(path), "doc_id", "text")
      if (!graft.fs.Fs.exists(s"$flat/_SUCCESS"))
        post.write.mode("overwrite").parquet(flat)
      // pre-manifest layouts from earlier runs must rebuild, or the
      // first-probe measurement falls back to directory listing
      if (!graft.fs.Fs.exists(s"$bkt/postings/_SUCCESS") ||
          !graft.fs.Fs.exists(s"$bkt/postings/_PRUNE_MANIFEST"))
        graft.llm.Retrieval.writeBm25Index(post, bkt, numBuckets)
      (flat, bkt)
    }

    // (first rep, min rep, rows): the first/min split is the
    // first-probe evidence — with the manifest sidecar the FIRST probe
    // of an index version must cost ≈ the steady-state probe (no
    // 1024-bucket directory discovery left to amortize)
    def walls(run: () => Long): (Double, Double, Long) = {
      var rows = 0L
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        rows = run()
        (System.nanoTime() - t0) / 1e9
      }
      (t.head, t.min, rows)
    }

    val cells = Seq("x1" -> 1, s"x$factor" -> factor).map { case (scale, f) =>
      val (flat, bkt) = buildLayouts(docsPath(f), s"v${vocabClasses}_$scale")
      val (flatFirst, flatSec, flatRows) = walls(() =>
        graft.llm.Retrieval.bm25TopKFromIndex(
          spark.read.parquet(flat), queries, "query_id", "qtext", k = 5).count())
      val (prunedFirst, prunedSec, prunedRows) = walls(() =>
        graft.llm.Retrieval.bm25TopKFromPrunedIndex(
          spark, bkt, queries, "query_id", "qtext", k = 5).count())
      require(flatRows == prunedRows,
        s"layout changed results at $scale: flat=$flatRows pruned=$prunedRows")
      println(s"""{"metric":"pruned_probe","scale":"$scale","n_queries":$nQ,""" +
        s""""num_buckets":$numBuckets,"flat_sec":$flatSec,"pruned_sec":$prunedSec,""" +
        s""""pruned_first_sec":$prunedFirst,"flat_first_sec":$flatFirst,""" +
        s""""rows":$flatRows,"pruned_over_flat":${prunedSec / flatSec}}""")
      (scale, flatSec, prunedSec, prunedFirst)
    }
    val line = cells.map { case (s, f, p, pf) =>
      s""""$s":{"flat_sec":$f,"pruned_sec":$p,"pruned_first_sec":$pf,"pruned_over_flat":${p / f}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"pruned_probe_summary","n_queries":$nQ,"num_buckets":$numBuckets,"reps":$reps,"vocab_classes":$vocabClasses,"scales":$line}""")
    spark.stop()
  }
}
