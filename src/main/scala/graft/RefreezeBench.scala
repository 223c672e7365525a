package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the refreeze-cadence recommendation for the versioned
  * dedup store ([[graft.llm.NearDupIndexStore.compact]]'s
  * `refreeze = true`): after a large append has drifted the df
  * distribution away from the frozen head, how much probe wall does
  * re-deriving the head + prefix layout from the stored sets buy, over
  * and above plain compaction (layout flattening)?
  *
  * Scenario: build over half the documents corpus, append the other
  * half (the worst realistic head-staleness — the frozen order saw
  * only 50 % of the final corpus), then time the same fresh-delta
  * probe (min-of-reps) against (a) the stitched store, (b) a plain
  * compact, (c) a refreeze compact. The frozen order is a
  * candidate-count heuristic, so (c) vs (b) isolates the refreeze
  * effect; answers are asserted identical across all three.
  *
  * Prints one JSON line; the committed reading lives in NOTES_r17.
  *
  * Usage: `runMain graft.RefreezeBench [sfDir] [workDir] [reps]` */
object RefreezeBench {

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
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/root/repo/target/refreeze"
    val reps = if (args.length > 2) args(2).toInt else 3
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
    import graft.llm.NearDupIndexStore

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val root = s"$workDir/store"
    if (graft.fs.Fs.exists(root)) graft.fs.Fs.deleteRecursive(root)
    NearDupIndexStore.build(spark, d.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", root)
    NearDupIndexStore.appendDelta(spark, root,
      d.filter(col("doc_id") % 2 === 1), "doc_id", "text")
    // fresh-delta probe: re-uploads of every %10==0 doc's text under new ids
    val probe = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 900000).as("doc_id"), col("text"))
      .localCheckpoint()
    def probeOnce(): Long =
      NearDupIndexStore.pairsForDelta(spark, root, probe, "doc_id", "text").count()
    val (stitchedSec, nStitched) = timeMin(reps)(probeOnce())
    NearDupIndexStore.compact(spark, root)
    val (flatSec, nFlat) = timeMin(reps)(probeOnce())
    NearDupIndexStore.compact(spark, root, refreeze = true)
    val (refrozenSec, nRefrozen) = timeMin(reps)(probeOnce())
    require(nStitched == nFlat && nFlat == nRefrozen,
      s"probe answers diverged: $nStitched / $nFlat / $nRefrozen")
    println(s"""{"metric":"refreeze_probe_sec","stitched":$stitchedSec,""" +
      s""""compacted":$flatSec,"refrozen":$refrozenSec,"pairs":$nStitched,""" +
      s""""reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
