package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, (i * 37 % 90) + 1)).toDF("id", "n_tok")

  /** Driver-side reference: sorted sequential prefix sum. */
  private def reference(rows: Seq[(Long, Int)], block: Long): Map[Long, (Long, Long, Long, Long)] = {
    var off = 0L
    rows.sortBy(_._1).map { case (id, nt) =>
      val start = off
      off += nt
      val end = (start + math.max(nt, 1) - 1) / block
      id -> (start, start / block, end, end - start / block + 1)
    }.toMap
  }

  test("packBlocks matches the sequential prefix sum") {
    val n = 500
    val in = (0 until n).map(i => (i.toLong, (i * 37 % 90) + 1))
    val exp = reference(in, 64)
    val got = Packing.packBlocks(docs(n), "id", col("n_tok"), blockTokens = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got === exp)
  }

  test("offsets are partition-count independent") {
    val d = docs(300)
    val a = Packing.packBlocks(d, "id", col("n_tok"), 64, partitions = 3)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = Packing.packBlocks(d.repartition(17), "id", col("n_tok"), 64, partitions = 11)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("empty docs occupy a zero-width span in their start block") {
    val d = Seq((1L, 64), (2L, 0), (3L, 1)).toDF("id", "n_tok")
    val got = Packing.packBlocks(d, "id", col("n_tok"), 64)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 2 starts at token 64 (block 1), zero width — still block 1
    assert(got === Array((1L, 0L, 0L, 0L), (2L, 64L, 1L, 1L), (3L, 64L, 1L, 1L)))
  }

  test("repeated calls leak no persisted RDDs (NOTES_r3 discipline)") {
    // Suites share one SparkContext and run concurrently, so a global
    // block-count diff would pick up other suites' caches. packBlocks
    // must persist NOTHING (bucket is a pure function of the id — see
    // its scaladoc), so census exactly the blocks created from Packing
    // code: an RDD's toString carries its creation site.
    // "Packing" (no .scala suffix) matches BOTH creation-site spellings
    // a leak can take: an internal persist materializes at
    // Packing.scala, but a leaked cache on the RETURNED frame
    // materializes at the caller's action — PackingSpec.scala.
    val d = docs(200)
    def packingPersisted() = spark.sparkContext.getPersistentRDDs.values
      .count(_.toString.contains("Packing"))
    (1 to 3).foreach(_ => Packing.packBlocks(d, "id", col("n_tok"), 64).count())
    assert(packingPersisted() == 0, "packBlocks left persisted RDDs behind")
  }

  test("empty input returns empty output") {
    val d = Seq.empty[(Long, Int)].toDF("id", "n_tok")
    assert(Packing.packBlocks(d, "id", col("n_tok"), 64).count() === 0)
  }

  // ---- best-fit-decreasing bin packing ---------------------------------

  test("packBinsBFD: no bin over capacity, no doc split, bins near the lower bound") {
    val cap = 100L
    val rows = Packing.packBinsBFD(docs(400), "id", col("n_tok"), cap, nBuckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))
    assert(rows.length == 400)                     // every doc exactly once — never split
    assert(rows.forall(!_._5))                     // nothing oversize at this capacity
    val fills = rows.groupBy(r => (r._3, r._4)).view.mapValues(_.map(_._2).sum)
    assert(fills.values.forall(_ <= cap), s"overfull bin: ${fills.maxBy(_._2)}")
    // per bucket: bins used within 2x of the fractional lower bound
    rows.groupBy(_._3).foreach { case (b, ms) =>
      val lower = math.ceil(ms.map(_._2).sum.toDouble / cap).toInt
      val used = ms.map(_._4).distinct.length
      assert(used >= lower && used <= 2 * lower, s"bucket $b: used=$used lower=$lower")
    }
  }

  test("packBinsBFD is partitioning-independent") {
    val d = docs(300)
    val a = Packing.packBinsBFD(d, "id", col("n_tok"), 100, nBuckets = 4)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val b = Packing.packBinsBFD(d.repartition(13), "id", col("n_tok"), 100, nBuckets = 4)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("packBinsBFD: oversized docs get a bin of their own, flagged") {
    val d = Seq((1L, 250), (2L, 60), (3L, 50)).toDF("id", "n_tok")
    val rows = Packing.packBinsBFD(d, "id", col("n_tok"), 100, nBuckets = 1)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getBoolean(4))).toMap
    assert(rows(1L)._2)                            // flagged oversize
    assert(!rows(2L)._2 && !rows(3L)._2)
    // 60 and 50 do NOT fit together (110 > 100): distinct bins; and the
    // overfull oversize bin must absorb nothing
    assert(rows(2L)._1 != rows(3L)._1)
    assert(rows(1L)._1 != rows(2L)._1 && rows(1L)._1 != rows(3L)._1)
  }
}
