package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-vs-cost ablation over the PERSISTED graph-ANN path (the t131
  * deployment: [[graft.llm.AnnIndexStore]] build →
  * [[graft.llm.AnnIndexStore.searchGraph]] from stored adjacency) —
  * the evidence behind the index defaults (m, efSearch, nprobe), which
  * until this run were inherited from the literature rather than
  * measured on this engine's corpus shape.
  *
  * Sweep: m ∈ {4, 8, 16} (one store build each — m is baked into the
  * stored adjacency), × nprobe ∈ {2, 4, 8} × efSearch ∈ {16, 48, 96}
  * (search-time knobs over the same store), at ×1 and ×`factor` corpus
  * scale ([[ScaleBench.scaledEmbeddingsDf]]'s norm-preserving rotation
  * — the SlopeGate corpus). Recall@10 grades against in-query brute
  * force over the same corpus; the query set is the 20 base vectors
  * (copy-0 rows carry the identity rotation, so the queries are
  * IDENTICAL vectors at both scales — recall moves because the corpus
  * grows, not because the probes changed).
  *
  * Statistic: min-of-`reps` wall per cell (a stall cannot produce a
  * min — the SlopeGate convention); recall is deterministic per cell
  * (decimal-exact centroids, id-ordered inserts, total-order
  * comparisons), so it is read once. Store builds are timed separately
  * (build cost amortizes over every later query batch; folding it into
  * the search wall would bias the sweep toward small m).
  *
  * Prints one JSON line per (scale, m, nprobe, efSearch) cell plus a
  * `_summary` line; the committed artifact is `ABLATION_r{N}.json`.
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

    val mValues = Seq(4, 8, 16)
    val nprobeValues = Seq(2, 4, 8)
    val efValues = Seq(16, 48, 96)
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

      mValues.foreach { m =>
        val root = s"$workDir/store_x${scale}_m$m"
        val (buildSec, _) = timeMin(1) {
          if (graft.llm.AnnIndexStore.currentVersion(root).isEmpty)
            graft.llm.AnnIndexStore.build(spark, corpus, "vec_id", "embedding",
              root, graft.llm.AnnIndexStore.Params(nCells = 16, m = m,
                efConstruction = 48))
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
            val cell = Map[String, Any]("scale" -> scale, "m" -> m,
              "nprobe" -> nprobe, "efSearch" -> ef,
              "build_sec" -> f"$buildSec%.2f".toDouble,
              "search_sec" -> f"$wall%.3f".toDouble,
              "recall_at_10" -> f"$recall%.4f".toDouble)
            results += cell
            println(js(cell))
          }
        }
      }
    }

    // summary: per scale, the cheapest cell reaching >= 0.9 recall, and
    // the defaults' (m=8, nprobe=8, ef=48) position
    Seq(1, factor).foreach { scale =>
      val cells = results.filter(_("scale") == scale)
      val good = cells.filter(_("recall_at_10").asInstanceOf[Double] >= 0.9)
      val cheapest = if (good.nonEmpty)
        Some(good.minBy(_("search_sec").asInstanceOf[Double])) else None
      val defaults = cells.find(c => c("m") == 8 && c("nprobe") == 8 && c("efSearch") == 48)
      println(js(Map("_summary" -> s"x$scale",
        "cheapest_recall_ge_090" -> cheapest.map(js).getOrElse("none"),
        "defaults_m8_np8_ef48" -> defaults.map(js).getOrElse("none"))))
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
