package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{AnnIndexStore, CurationLedgerStore, Dedup}
import graft.llm.AnnIndexStore.Params

/** Driver-state BUDGET gates (r19 verdict #7): the file-I/O side has
  * strict-subset ScaleSpec gates everywhere, but driver-RESIDENT
  * control state (centroid matrices, df heads, per-source count
  * tables, drift baselines) is the classic silent 100× killer — it
  * never shows in a file listing. This suite measures the collected
  * state at ×1 vs ×10 corpora and gates it against the documented
  * budgets; the deliberate violation (a flat ANN store with cells ∝
  * corpus) is the red-team fixture proving the gate bites. */
class DriverStateSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dstate_$tag").toString + "/s"

  test("ANN router: auto shape caps driver-resident centroid rows at " +
      "max(maxFlatCells, ⌈√cells⌉); the pinned-flat red-team twin grows ∝ cells") {
    val x1 = embs.filter($"vec_id" < 50)
    val x10 = embs
    val small = Params(nCells = 0, cellTarget = 10, iters = 2, numBuckets = 4,
      m = 4, efConstruction = 12, multiAssign = 1)
    def driverRows(corpus: org.apache.spark.sql.DataFrame, p: Params): (String, Int) = {
      val root = tmp("ann")
      AnnIndexStore.build(spark, corpus, "vec_id", "embedding", root, p)
      (root, AnnIndexStore.centroids(spark, root).length)
    }
    // RED TEAM — the documented violation: flat shape pinned
    // (maxFlatCells = 0), cells auto-size ∝ corpus, so the
    // driver-resident matrix grows with the data. The gate must SEE
    // this growth (else it could never catch a real regression).
    val (_, flat1) = driverRows(x1, small.copy(maxFlatCells = 0))
    val (_, flat10) = driverRows(x10, small.copy(maxFlatCells = 0))
    assert(flat1 == 5 && flat10 == 50,
      s"fixture drifted: flat cells $flat1/$flat10 (want 5/50)")
    assert(flat10 >= 8 * flat1,
      "red-team fixture must show ∝-corpus driver growth")
    // THE BUDGET: under the automatic shape rule the driver-visible
    // matrix is capped at max(maxFlatCells, ⌈√resolvedCells⌉) — ×10
    // corpus, ≤ √ the flat twin's driver state
    def budget(resolved: Int, maxFlat: Int): Int =
      math.max(maxFlat, math.ceil(math.sqrt(resolved.toDouble)).toInt)
    val (r1, auto1) = driverRows(x1, small.copy(maxFlatCells = 8))
    val (r10, auto10) = driverRows(x10, small.copy(maxFlatCells = 8))
    assert(auto1 <= budget(flat1, 8), s"×1 driver rows $auto1 over budget")
    assert(auto10 <= budget(flat10, 8),
      s"×10 driver rows $auto10 over budget ${budget(flat10, 8)}")
    assert(!AnnIndexStore.isHierarchical(r1) && AnnIndexStore.isHierarchical(r10))
    // the drift BASELINE (driver-visible version metadata) rides the
    // same cap: one row per driver-visible cell, never per fine cell
    def driftRows(root: String): Int =
      graft.fs.Fs.readString(graft.fs.Fs.child(
        AnnIndexStore.currentPath(root).get, "_DRIFTBASE"))
        .split("\n").count(_.trim.nonEmpty)
    assert(driftRows(r10) <= auto10,
      "drift baseline must be keyed by driver-visible (coarse) cells")
  }

  test("near-dup df head: the collected head is capped at dfHeadSize " +
      "at ×1 and ×10 — corpus growth widens the shingle universe, not driver state") {
    val x1 = docs.filter($"doc_id" < 50)
    val x10 = docs
    def headRows(corpus: org.apache.spark.sql.DataFrame): Long = {
      val root = tmp("nd")
      Dedup.writeNearDupIndex(spark, corpus, "doc_id", "text", root,
        dfHeadSize = 40, numBuckets = 8)
      spark.read.parquet(s"$root/dfhead").count()
    }
    val h1 = headRows(x1)
    val h10 = headRows(x10)
    assert(h1 <= 40 && h10 <= 40, s"df head over budget: $h1/$h10 > 40")
    // the ×10 corpus has far more distinct shingles than the cap —
    // the budget is BINDING, not vacuous
    assert(h10 == 40, s"fixture drifted: ×10 head $h10 should hit the cap")
  }

  test("curation-ledger store: driver-side fold state is #sources rows " +
      "+ a ≤(batches+1)-entry bound ledger, corpus-size-independent") {
    val bench = docs.filter($"doc_id" % 50 === 0)
    val p = CurationLedgerStore.Params(
      idCol = "doc_id", textCol = "text", scoreCol = "n_chars",
      sourceCol = "source", neardupBuckets = 8, idBuckets = 4, tokBuckets = 4)
    def metaShape(corpus: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val root = java.nio.file.Files.createTempDirectory("graft_dstate_ls").toString
      CurationLedgerStore.build(spark, corpus, bench, "text", root, p)
      val delta = corpus.limit(5)
        .select($"doc_id", concat($"text", lit(" dstate rev")).as("text"),
          $"source", $"n_chars")
      CurationLedgerStore.absorbBatch(spark, root, delta).count()
      val meta = graft.fs.Fs.readString(graft.fs.Fs.child(
        CurationLedgerStore.currentPath(root).get, "_META"))
        .split("\n").map(_.trim).filter(_.nonEmpty)
      val srcRows = meta.count(_.startsWith("S\t"))
      val bounds = meta.find(_.startsWith("B\t")).get.drop(2).split(",").length
      (srcRows, bounds)
    }
    val x1 = docs.filter($"doc_id" < 120)
    val x4 = docs
    val (s1, b1) = metaShape(x1)
    val (s4, b4) = metaShape(x4)
    val nSources = docs.select($"source").distinct().count().toInt
    // the budget: #sources rows (data cardinality, not corpus size) and
    // one bound entry per absorbed batch + the base — identical shape
    // at both corpus sizes
    assert(s1 <= nSources && s4 <= nSources, s"source fold rows $s1/$s4 > $nSources")
    assert(b1 == 2 && b4 == 2, s"bound ledger $b1/$b4 entries (want base+1 batch)")
    Seq(x1, x4).foreach(Dedup.releaseShingleSetCache(_, "doc_id", "text"))
    spark.catalog.clearCache()
  }
}
