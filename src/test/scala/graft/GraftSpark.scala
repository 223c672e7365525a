package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (cheap suites, one JVM).
  *
  * Suites run CONCURRENTLY in the forked test JVM
  * (`Test / testForkedParallel` in build.sbt), all over this one
  * SparkContext. A suite that mutates session state — `spark.conf.set`
  * (AQE, broadcast threshold, codegen mode), listener registration —
  * must use [[isolated]] instead: `newSession()` shares the context
  * (no second JVM, no second scheduler) but owns an independent
  * SQLConf, listener manager, UDF registry, and temp-view catalog, so
  * its mutations can't bleed into concurrently running suites. */
object GraftSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** A session with private mutable state over the shared context —
    * for suites that set conf keys or register listeners. */
  def isolated: SparkSession = spark.newSession()
}
