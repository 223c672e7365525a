package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-vs-cost ablation over the PERSISTED graph-ANN path (the t131
  * deployment: [[graft.llm.AnnIndexStore]] build →
  * [[graft.llm.AnnIndexStore.searchGraph]] from stored adjacency).
  *
  * r16 swept m × nprobe × efSearch at fixed nCells=16 and found recall
  * ROUTING-BOUND: ~0.78 ceiling at ×10 regardless of m/ef, because the
  * coarse quantizer — not the per-cell graph — loses the true
  * neighbors (they live in unprobed cells). This round sweeps the two
  * standard IVF routing fixes against the same grid:
  *
  *  - `nCells` ∈ {16, 64, 256}: finer cells at fixed nprobe probe a
  *    smaller corpus fraction but a better-targeted one;
  *  - soft multi-assignment `multiAssign` ∈ {1, 2}
  *    ([[graft.llm.Similarity.ivfAssignedIndexMulti]]): boundary
  *    vectors land in BOTH near-equal cells, so a query probing either
  *    finds them — storage ×2, routing loss recovered.
  *
  * m is fixed at 8 (r16 showed recall insensitive to m here), search
  * sweeps nprobe ∈ {8, 16} × efSearch ∈ {48, 96}; nCells=16 × nprobe=16
  * is a FULL probe — its recall is the graph+ef ceiling, separating
  * routing loss from graph loss in the same table. Corpus at ×1 and
  * ×`factor` ([[ScaleBench.scaledEmbeddingsDf]]'s norm-preserving
  * rotation); queries are the 20 base vectors (identity rotation —
  * identical probes at both scales). Recall@10 grades against in-query
  * brute force.
  *
  * Statistic: min-of-`reps` wall per search cell; recall is
  * deterministic per cell, read once. Store builds are timed separately
  * and ALWAYS from scratch — the store root is deleted before the timed
  * build (a warm workDir would otherwise time a no-op and record a
  * near-zero build cost, skewing the build-vs-search tradeoff).
  *
  * Prints one JSON line per (scale, nCells, multiAssign, nprobe,
  * efSearch) cell plus `_summary` lines; the committed artifact is
  * `ABLATION_r{N}.json`.
  *
  * Usage: `runMain graft.GraphAblationBench [baseSfDir] [workDir]
  *   [factor] [reps]`
  */
object GraphAblationBench {

  private def timeMin[T](reps: Int)(body: => T): (Double, T) = {
    var best = Double.MaxValue
    var last: Option[T] = None
    (0 until reps).foreach { _ =>
      val t0 = System.nanoTime()
      last = Some(body)
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    (best, last.get)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/root/repo/target/graphablation"
    val factor = if (args.length > 2) args(2).toInt else 10
    val reps = if (args.length > 3) args(3).toInt else 2
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
    import spark.implicits._

    val cellValues = Seq(16, 64, 256)
    val assignValues = Seq(1, 2)
    val nprobeValues = Seq(8, 16)
    val efValues = Seq(48, 96)
    val m = 8
    val k = 10

    val results = scala.collection.mutable.ArrayBuffer[Map[String, Any]]()

    Seq(1, factor).foreach { scale =>
      // materialize the corpus once per scale (parquet, the honest read)
      val corpusPath = s"$workDir/embeddings_x$scale"
      if (!graft.fs.Fs.exists(s"$corpusPath/_SUCCESS")) {
        val df = if (scale == 1) spark.read.parquet(s"$baseDir/embeddings.parquet")
          else ScaleBench.scaledEmbeddingsDf(spark, baseDir, scale)
        df.write.mode("overwrite").parquet(corpusPath)
      }
      val corpus = spark.read.parquet(corpusPath)
      // copy-0 rows of the 20 lowest base ids: identical vectors at
      // every scale (identity rotation), fixed |Q| = 20
      val queries = (if (scale == 1) corpus.filter(col("vec_id") < 20)
        else corpus.filter(col("vec_id") % scale === 0 &&
          col("vec_id") < 20L * scale)).localCheckpoint()
      val brute = Similarity0.bruteTopK(corpus, queries, "vec_id", "embedding", k)
        .localCheckpoint()

      for (nCells <- cellValues; ma <- assignValues) {
        val root = s"$workDir/store_x${scale}_c${nCells}_a$ma"
        // ALWAYS build fresh: a surviving store would make the timed
        // body a no-op and record a near-zero build cost
        if (graft.fs.Fs.exists(root)) graft.fs.Fs.deleteRecursive(root)
        val (buildSec, _) = timeMin(1) {
          graft.llm.AnnIndexStore.build(spark, corpus, "vec_id", "embedding",
            root, graft.llm.AnnIndexStore.Params(nCells = nCells, m = m,
              efConstruction = 48, multiAssign = ma))
        }
        nprobeValues.foreach { nprobe =>
          efValues.foreach { ef =>
            val (wall, recall) = {
              var rec = 0.0
              val (w, _) = timeMin(reps) {
                val ann = graft.llm.AnnIndexStore.searchGraph(spark, root,
                  queries, "vec_id", "embedding", k, nprobe, ef)
                rec = Similarity0.recallAtK(ann, brute)
                  .agg(avg(col("recall_ppm"))).head().getDouble(0) / 1e6
              }
              (w, rec)
            }
            val cell = Map[String, Any]("scale" -> scale, "nCells" -> nCells,
              "multiAssign" -> ma, "m" -> m,
              "nprobe" -> nprobe, "efSearch" -> ef,
              "build_sec" -> f"$buildSec%.2f".toDouble,
              "search_sec" -> f"$wall%.3f".toDouble,
              "recall_at_10" -> f"$recall%.4f".toDouble)
            results += cell
            println(js(cell))
          }
        }
        // the sweep builds 6 stores per scale; drop each when its
        // cells are done so peak disk stays one-store-sized
        graft.fs.Fs.deleteRecursive(root)
      }

      // r18: the TWO-LEVEL router ([[graft.llm.HierarchicalRouting]])
      // against the same grid — fine-cell counts mirror the flat
      // sweep's (16/64/256 = coarse×sub), efSearch fixed at 96 (r17:
      // dominant on both recall and wall), nprobeCoarse ∈ {2, 4}
      // coarse cells resolve the fine probe set
      val hierConfigs = Seq((4, 4), (8, 8), (16, 16))
      for ((kc, ks) <- hierConfigs; ma <- assignValues) {
        val root = s"$workDir/hstore_x${scale}_c${kc}s${ks}_a$ma"
        if (graft.fs.Fs.exists(root)) graft.fs.Fs.deleteRecursive(root)
        val (buildSec, _) = timeMin(1) {
          graft.llm.AnnIndexStore.build(spark, corpus, "vec_id", "embedding",
            root, graft.llm.AnnIndexStore.Params(nCells = kc, m = m,
              efConstruction = 48, multiAssign = ma, subCells = ks))
        }
        for (npc <- Seq(2, 4); nprobe <- nprobeValues) {
          val ef = 96
          val (wall, recall) = {
            var rec = 0.0
            val (w, _) = timeMin(reps) {
              val ann = graft.llm.AnnIndexStore.searchGraph(spark, root,
                queries, "vec_id", "embedding", k, nprobe, ef,
                nprobeCoarse = npc)
              rec = Similarity0.recallAtK(ann, brute)
                .agg(avg(col("recall_ppm"))).head().getDouble(0) / 1e6
            }
            (w, rec)
          }
          val cell = Map[String, Any]("scale" -> scale,
            "coarse" -> kc, "sub" -> ks, "fine_cells" -> (kc * ks),
            "multiAssign" -> ma, "m" -> m, "nprobeCoarse" -> npc,
            "nprobe" -> nprobe, "efSearch" -> ef,
            "build_sec" -> f"$buildSec%.2f".toDouble,
            "search_sec" -> f"$wall%.3f".toDouble,
            "recall_at_10" -> f"$recall%.4f".toDouble)
          results += cell
          println(js(cell))
        }
        graft.fs.Fs.deleteRecursive(root)
      }
    }

    // summary: per scale, the cheapest cell reaching >= 0.9 recall, the
    // r16 defaults' position (nCells=16, single assign, nprobe=8,
    // ef=48), and the full-probe graph ceiling (nCells=16, nprobe=16)
    Seq(1, factor).foreach { scale =>
      val cells = results.filter(_("scale") == scale)
      val (hier, flat) = cells.partition(_.contains("coarse"))
      val good = flat.filter(_("recall_at_10").asInstanceOf[Double] >= 0.9)
      val cheapest = if (good.nonEmpty)
        Some(good.minBy(_("search_sec").asInstanceOf[Double])) else None
      val defaults = flat.find(c => c("nCells") == 16 && c("multiAssign") == 1 &&
        c("nprobe") == 8 && c("efSearch") == 48)
      val ceiling = flat.filter(c => c("nCells") == 16 && c("nprobe") == 16)
        .map(_("recall_at_10").asInstanceOf[Double]).maxOption
      val goodHier = hier.filter(_("recall_at_10").asInstanceOf[Double] >= 0.9)
      val cheapestHier = if (goodHier.nonEmpty)
        Some(goodHier.minBy(_("search_sec").asInstanceOf[Double])) else None
      println(js(Map("_summary" -> s"x$scale",
        "cheapest_recall_ge_090" -> cheapest.map(js).getOrElse("none"),
        "cheapest_hier_recall_ge_090" -> cheapestHier.map(js).getOrElse("none"),
        "r16_defaults_c16_a1_np8_ef48" -> defaults.map(js).getOrElse("none"),
        "full_probe_graph_ceiling" -> ceiling.map(r => f"$r%.4f").getOrElse("none"))))
    }
    spark.stop()
  }

  private def js(m: Map[String, Any]): String =
    m.map { case (k, v) =>
      val vs = v match {
        case s: String if s.startsWith("{") => s // nested pre-rendered JSON
        case s: String => s""""$s""""
        case other => other.toString
      }
      s""""$k": $vs"""
    }.mkString("{", ", ", "}")
}

/** Thin forwarders so the bench reads as the operators it measures. */
private object Similarity0 {
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame =
    graft.llm.Similarity.bruteTopK(corpus, queries, idCol, vecCol, k)
  def recallAtK(ann: DataFrame, brute: DataFrame): DataFrame =
    graft.llm.Similarity.recallAtK(ann, brute)
}
