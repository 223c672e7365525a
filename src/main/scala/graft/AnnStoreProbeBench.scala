package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.AnnIndexStore

/** [[StoreProbeBench]]'s ×1/×10/×50 selective-probe question asked of
  * the VERSIONED ANN STORE ([[graft.llm.AnnIndexStore]]) — the
  * embedding family's delta-bounded claim gets the same half-decade of
  * slope evidence the four shingle families got in r18.
  *
  * The claim under test: a CONSTANT-size operation's wall grows with
  * the operation (flat-ish), not the corpus, provided the store is
  * SIZED to the corpus the way a 100 TB deployment would size it:
  *
  *  - CELLS grow ∝ corpus ([[AnnIndexStore.autoCells]] at a constant
  *    `cellTarget`): per-task state (one cell's vectors + adjacency)
  *    stays bounded, and a constant `nprobe` touches a constant number
  *    of constant-sized cells;
  *  - BUCKETS grow ∝ corpus (the [[graft.sources.PrunedIndex]] sizing
  *    rule): a probed cell's bucket carries corpus-independent bytes.
  *
  * The corpus scales by [[ScaleBench.scaledEmbeddingsDf]]'s
  * norm-preserving rotation (copies are rotated, not duplicated — no
  * degenerate identical-vector cells). Three operations, each constant
  * size across factors:
  *
  *  - `search_graph`: a `nQueries`-query graph search (k=10, nprobe=8,
  *    ef=96 — the measured defaults);
  *  - `search_pq`: the IVF-PQ composition over the same queries (ADC
  *    shortlist + id-keyed exact re-rank — the r18 `vecsbyid` fetch);
  *  - `semdedup_delta`: SemDeDup pairs of the delta against the store
  *    ([[AnnIndexStore.semDedupPairsForDelta]] — cell-pruned
  *    assignment reads, the embedding family's dedup probe);
  *  - `append`: a `nQueries`-vector re-upload delta absorbed under
  *    frozen centroids (touched-cell graph recompute + delta-bounded
  *    bucket writes; each rep re-lands the same ids — replace-by-key
  *    replay, the operational batch shape);
  *  - `drift`: the per-batch drift check ([[AnnIndexStore.driftPpm]])
  *    — with the persisted `_DRIFTBASE` this must be flat: it scores
  *    the DELTA against k centroids and folds version metadata, never
  *    the stored corpus.
  *
  * A second, HIERARCHICAL store (`hier_*` ops) measures the two-level
  * routing at its declared scale shape: a CONSTANT coarse matrix
  * (driver state never grows) with `subCells` ∝ corpus, so fine cells
  * track the corpus exactly like the flat store's autoCells — the
  * regime where the flat driver-resident matrix stops existing.
  *
  * Build cost (train + assign + graph + PQ encode + id layout) is
  * one-time and reported separately, exactly like the dedup store's.
  *
  * The summary line carries a SlopeGate-style BUDGET gate: any op
  * whose ×maxFactor/×1 ratio exceeds `budget` (default 10) is a breach
  * and the process exits 2 — the delta-bounded claim is
  * regression-tested per round (STOREPROBE contract), not re-argued.
  *
  * Usage: `runMain graft.AnnStoreProbeBench [baseSfDir] [workDir]
  *   [factorsCsv] [nQueries] [reps] [cellTarget] [bucketsBase]
  *   [budget]` */
object AnnStoreProbeBench {

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/root/repo/target/annstoreprobe"
    val factors = (if (args.length > 2) args(2) else "1,10,50")
      .split(",").map(_.trim.toInt).toSeq
    val nQueries = if (args.length > 3) args(3).toInt else 100
    val reps = if (args.length > 4) args(4).toInt else 3
    val cellTarget = if (args.length > 5) args(5).toLong else 500L
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
      var rows = 0L
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        rows = run()
        (System.nanoTime() - t0) / 1e9
      }
      (walls.min, rows)
    }

    val cells = factors.map { f =>
      val corpusPath = ScaleBench.scaledEmbeddings(spark, baseDir, workDir, f)
      val corpus = spark.read.parquet(corpusPath)
      val root = s"$workDir/annstore_x$f"
      // maxFlatCells = 0: this store MEASURES the flat shape's slope —
      // the auto two-level switch must not quietly rescue it at ×50
      val p = AnnIndexStore.Params(nCells = 0, cellTarget = cellTarget,
        iters = 2, numBuckets = bucketsBase * f, m = 8, efConstruction = 48,
        multiAssign = 2, pqM = 8, pqKsub = 16, idBuckets = bucketsBase * f,
        maxFlatCells = 0)
      val buildSec =
        if (AnnIndexStore.currentVersion(root).isEmpty) {
          val t0 = System.nanoTime()
          AnnIndexStore.build(spark, corpus, "vec_id", "embedding", root, p)
          (System.nanoTime() - t0) / 1e9
        } else -1.0
      // constant-size probe/delta sets: the copy-0 rows of the first
      // nQueries base ids (deterministic at every factor)
      val headIds = corpus
        .filter(pmod(col("vec_id"), lit(f.toLong)) === 0L &&
          col("vec_id") < lit(nQueries.toLong * f))
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint()
      // the re-upload delta: same ids, vector rotated by one position —
      // a CHANGED revision, so the append exercises displacement
      val delta = headIds.select(col("vec_id"),
        concat(slice(col("embedding"), lit(2), size(col("embedding")) - 1),
          slice(col("embedding"), lit(1), lit(1))).as("embedding"))
        .localCheckpoint()
      // hierarchical twin: coarse matrix CONSTANT (4 cells — driver
      // state never grows), subCells ∝ corpus so fine cells track the
      // corpus like the flat store's autoCells
      val rootH = s"$workDir/annstore_hier_x$f"
      val nCorpus = corpus.count()
      val subCells = math.max(1L,
        (nCorpus + cellTarget * 4 - 1) / (cellTarget * 4)).toInt
      val pH = AnnIndexStore.Params(nCells = 4, iters = 2,
        numBuckets = bucketsBase * f, m = 8, efConstruction = 48,
        multiAssign = 2, subCells = subCells)
      val buildHierSec =
        if (AnnIndexStore.currentVersion(rootH).isEmpty) {
          val t0 = System.nanoTime()
          AnnIndexStore.build(spark, corpus, "vec_id", "embedding", rootH, pH)
          (System.nanoTime() - t0) / 1e9
        } else -1.0
      // ---- storage-amplification audit (r19 verdict #5): bytes per
      // component of the PURE BUILD version (v1 — always
      // self-contained; `current` may already be an appended stitch
      // from a cached prior invocation), against the raw corpus
      // parquet. The assigned component carries the raw vector
      // ×multiAssign, PQ builds add codes + vecsbyid + idcells — this
      // is the multiplier a 100 TB embedding bill pays for the
      // recall/latency posture, printed so NOTES can table it. ----
      def dirBytes(ds: String): Long = {
        val pth = java.nio.file.Paths.get(ds)
        if (!java.nio.file.Files.exists(pth)) 0L
        else {
          var b = 0L
          val walk = java.nio.file.Files.walk(pth)
          try walk.forEach { q =>
            if (java.nio.file.Files.isRegularFile(q))
              b += java.nio.file.Files.size(q)
          } finally walk.close()
          b
        }
      }
      val rawBytes = dirBytes(corpusPath)
      Seq(("flat", root), ("hier", rootH)).foreach { case (shape, r) =>
        val v1 = s"$r/v1"
        val comps = Option(new java.io.File(v1).listFiles()).getOrElse(Array.empty)
          .filter(_.isDirectory).sortBy(_.getName)
          .map(dd => dd.getName -> dirBytes(dd.toString))
        val total = comps.map(_._2).sum
        val compJson = comps.map { case (n, b) => s""""$n":$b""" }
          .mkString("{", ",", "}")
        println(s"""{"metric":"ann_store_bytes","shape":"$shape","factor":$f,""" +
          s""""raw_corpus_bytes":$rawBytes,"store_bytes":$total,""" +
          s""""amplification":${if (rawBytes > 0) total.toDouble / rawBytes else -1.0},""" +
          s""""components":$compJson}""")
      }
      val ops: Seq[(String, () => Long)] = Seq(
        ("search_graph", () => AnnIndexStore.searchGraph(spark, root, headIds,
          "vec_id", "embedding", k = 10, nprobe = 8, efSearch = 96).count()),
        ("search_pq", () => AnnIndexStore.searchPq(spark, root, headIds,
          "vec_id", "embedding", k = 10, nprobe = 8, refine = 4).count()),
        ("semdedup_delta", () => AnnIndexStore.semDedupPairsForDelta(spark,
          root, delta, "vec_id", "embedding", minCos = 0.35).count()),
        ("append", () => AnnIndexStore.appendDelta(spark, root, delta,
          "vec_id", "embedding", p)),
        ("drift", () => AnnIndexStore.driftPpm(spark, root, delta,
          "vec_id", "embedding")),
        ("hier_search", () => AnnIndexStore.searchGraph(spark, rootH, headIds,
          "vec_id", "embedding", k = 10, nprobe = 8, efSearch = 96,
          nprobeCoarse = 2).count()),
        ("hier_semdedup", () => AnnIndexStore.semDedupPairsForDelta(spark,
          rootH, delta, "vec_id", "embedding", minCos = 0.35).count()),
        ("hier_append", () => AnnIndexStore.appendDelta(spark, rootH, delta,
          "vec_id", "embedding", pH)),
        ("hier_drift", () => AnnIndexStore.driftPpm(spark, rootH, delta,
          "vec_id", "embedding")))
      val probes = ops.map { case (op, run) =>
        val (sec, rows) = timeMin(run)
        val bs = if (op.startsWith("hier_")) buildHierSec else buildSec
        println(s"""{"metric":"ann_store_probe","op":"$op","factor":$f,""" +
          s""""num_buckets":${bucketsBase * f},"cell_target":$cellTarget,""" +
          s""""sub_cells":$subCells,"probe_sec":$sec,"rows":$rows,""" +
          s""""build_sec":$bs,"n_queries":$nQueries}""")
        (op, sec, rows)
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (f, buildSec, buildHierSec, probes)
    }
    val base = cells.head
    val top = cells.last
    val breaches = top._4.flatMap { case (op, sec, _) =>
      val ratio = sec / base._4.find(_._1 == op).get._2
      if (ratio > budget) Some(op -> ratio) else None
    }
    val summary = cells.map { case (f, build, buildH, probes) =>
      val ops = probes.map { case (op, sec, rows) =>
        val ratio = sec / base._4.find(_._1 == op).get._2
        s""""$op":{"probe_sec":$sec,"rows":$rows,"probe_over_x1":$ratio}"""
      }.mkString("{", ",", "}")
      s""""x$f":{"build_sec":$build,"build_hier_sec":$buildH,"ops":$ops}"""
    }.mkString("{", ",", "}")
    val breachesJson = breaches
      .map { case (op, r) => s"""{"op":"$op","ratio":$r}""" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"ann_store_probe_summary","n_queries":$nQueries,""" +
      s""""reps":$reps,"cell_target":$cellTarget,"buckets_base":$bucketsBase,""" +
      s""""budget":$budget,"breaches":$breachesJson,""" +
      s""""pass":${breaches.isEmpty},"scales":$summary}""")
    spark.stop()
    // the gate: a probe slope past budget is a regression, not a datum
    if (breaches.nonEmpty) sys.exit(2)
  }
}
