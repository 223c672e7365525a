package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.MetricsListener

class ListenerSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.isolated // mutates session state (conf/listeners)

  test("metrics listener records completed actions (K4 analog)") {
    val l = MetricsListener.attach(spark)
    try {
      import spark.implicits._
      Seq(1, 2, 3).toDF("x").count()
      // listener callbacks are async; poll for delivery
      var tries = 0
      var got = l.drain()
      while (got.isEmpty && tries < 50) { Thread.sleep(100); got = l.drain(); tries += 1 }
      assert(got.nonEmpty)
      assert(got.forall(_.success))
    } finally spark.listenerManager.unregister(l)
  }
}
