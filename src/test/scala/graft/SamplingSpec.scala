package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def ids = (1L to 2000L).toDF("id")

  test("hashSample: deterministic membership, fraction approximately honored") {
    val a = Sampling.hashSample(ids, "id", 0.3).as[Long].collect().toSet
    val b = Sampling.hashSample(ids.repartition(13), "id", 0.3).as[Long].collect().toSet
    assert(a == b) // partitioning-independent
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
    // nested property: a 10% sample is a subset of the 30% sample
    val small = Sampling.hashSample(ids, "id", 0.1).as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("split: partitions are disjoint, exhaustive, and stable") {
    val s = Sampling.split(ids, "id", testFraction = 0.2, validFraction = 0.1)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(s.keySet == Set("train", "valid", "test"))
    assert(s.values.sum == 2000L)
    assert(math.abs(s("test") / 2000.0 - 0.2) < 0.05)
    assert(math.abs(s("valid") / 2000.0 - 0.1) < 0.04)
  }
}
