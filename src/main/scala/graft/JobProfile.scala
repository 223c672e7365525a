package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-JOB wall-clock profile of named SparkEntry queries —
  * where a multi-job store/maintenance query actually spends its time
  * (the guide-§1 "measure first" view the SQL-plan dump cannot give for
  * imperative pipelines). Each Spark job is attributed by its call
  * site, so a query that runs 60 sequential jobs shows exactly which
  * collect/write/count they are and what each cost.
  *
  * Usage: runMain graft.JobProfile <sfDir> <name>[,<name>...]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PROFILE_REPS (default 1;
  * rep 2+ of a fixture-backed query profiles the warm operational path). */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Job(id: Int, site: String, startMs: Long, var endMs: Long)
    val jobs = new ConcurrentLinkedQueue[Job]()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // the result stage's name IS the action's call site (e.g.
        // "parquet at PrunedIndex.scala:177")
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("?")
        val j = Job(e.jobId, site, System.currentTimeMillis(), -1L)
        jobs.add(j); byId.put(e.jobId, j): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(byId.get(e.jobId)).foreach(_.endMs = System.currentTimeMillis())
      }
    })

    // same warm-up as Bench so job 0 noise stays out of the profile
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      SparkEntry.benchFixtures.get(name).foreach { f =>
        val t0 = System.nanoTime()
        f(spark, sfDir)
        println(f"===== $name fixture: ${(System.nanoTime() - t0) / 1e9}%.2f s (untimed in bench)")
      }
      (1 to reps).foreach { rep =>
        jobs.clear(); byId.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val snap = {
          val b = Vector.newBuilder[Job]
          jobs.forEach(j => b += j)
          b.result().sortBy(_.startMs)
        }
        val jobSum = snap.map(j => (j.endMs - j.startMs).max(0L)).sum / 1e3
        println(f"===== $name rep $rep: wall $wall%.2f s, ${snap.size} jobs, " +
          f"job-time sum $jobSum%.2f s (gap = driver/plan time)")
        // per-call-site rollup, descending total
        snap.groupBy(_.site).map { case (site, js) =>
          (site, js.size, js.map(j => (j.endMs - j.startMs).max(0L)).sum / 1e3)
        }.toSeq.sortBy(-_._3).foreach { case (site, n, sec) =>
          println(f"  $sec%8.2f s  x$n%-4d $site")
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
