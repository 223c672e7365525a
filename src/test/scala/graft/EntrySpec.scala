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
    // rows-only set is intentional: ANN recall < 1 (t31/t49), HLL
    // estimator internals (t62), 500-row token table whose deterministic
    // merge table is hash-checked as t61 (t50)
    assert(rowsOnly == Set("t31_knn_ivf", "t49_knn_ivf_kmeans",
      "t50_bpe_tokens", "t62_distinct_approx"), rowsOnly)
  }

  test("all queries run at sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, name)
    }
  }
}
