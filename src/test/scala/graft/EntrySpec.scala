package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("driver smoke contract: entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle — no rows-only checks remain") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
    // r7: the last four rows-only queries converted — t31/t49 emit
    // integer recall-vs-brute (literal oracle), t50's token table and
    // t62's HLL estimates are deterministic and pinned as literals
    assert((qs -- os).isEmpty, s"rows-only queries: ${qs -- os}")
  }

  test("all queries run at sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, name)
    }
  }

  test("no query plans a CartesianProduct (blanket structural gate)") {
    // PlanSpec asserts targeted shapes; this is the suite-wide backstop
    // for the scale contract "no cartesian in a query path". Non-equi
    // pair joins plan as BroadcastNestedLoopJoin (bounded side
    // broadcast), never CartesianProduct.
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val p = fn(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: $offenders")
  }
}
