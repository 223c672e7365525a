package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("driver smoke contract: entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has either an oracle or a documented rows-only check") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
    val rowsOnly = qs -- os
    // rows-only set is intentional: approximate / probabilistic / stubbed ops
    assert(rowsOnly == Set("t29_minhash_lsh", "t30_simhash", "t31_knn_ivf",
      "t62_distinct_approx", "t45_embed_lsh", "t46_winnowing", "t48_multimodal",
      "t49_knn_ivf_kmeans", "t50_bpe_tokens"), rowsOnly)
  }

  test("all queries run at sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, name)
    }
  }
}
