package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the properties that make these operators hold
  * at 100 TB — filters/projections reach the parquet scan, small dims
  * broadcast instead of shuffling the fact table, hot paths stay inside
  * WholeStageCodegen. Regressions here are performance bugs even when
  * results stay correct. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
  }

  test("q01: shipdate filter is pushed to the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q02: only referenced columns are read (column pruning)") {
    val p = plan("q02_revenue_filter")
    val scanLine = p.linesIterator.find(_.contains("ReadSchema")).get
    // 4 referenced columns, not the 11-column lineitem schema
    assert(scanLine.contains("l_shipdate") && scanLine.contains("l_discount")
      && scanLine.contains("l_quantity") && scanLine.contains("l_extendedprice"))
    assert(!scanLine.contains("l_orderkey") && !scanLine.contains("l_returnflag"), scanLine)
  }

  test("q05: dimension tables broadcast; fact table never shuffles for them") {
    val p = plan("q05_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q04: semi join stays a join, not an aggregate-distinct rewrite") {
    val p = plan("q04_priority_exists")
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("q06: anti join planned as broadcast or shuffled hash join") {
    val p = plan("q06_anti_join")
    assert(p.contains("LeftAnti"), p.take(2000))
  }

  test("hot scans run inside WholeStageCodegen") {
    Seq("q01_pricing_summary", "t21_fingerprint", "t30_simhash").foreach { q =>
      assert(formatted(q).contains("WholeStageCodegen subtree"), q)
    }
  }

  test("t26: similarity join has no cartesian product anywhere") {
    val p = plan("t26_jaccard_pairs")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("t28: knn broadcasts the query side") {
    val p = plan("t28_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q36: as-of join is one shuffle + window, not a join explosion") {
    val p = plan("q36_asof_join")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p.take(2000))
  }
}
