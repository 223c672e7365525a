package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev loop: SPARK_GRAFT_ONLY=t90_c4_filter,t91_... dumps a subset
    // (the driver never sets it, so the contract run is unchanged).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val toRun = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val dumpErrors = scala.collection.mutable.ArrayBuffer.empty[String]
    toRun.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        dumpErrors += name
      }
      // release per-query persisted state (shared shingle projections,
      // localCheckpoint cuts) so pins don't accumulate across the suite
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Tail-survivable result marker (the BENCH_RESULT treatment — the
    // driver's parsed correctness artifact arrived empty in r17 and
    // r19, so the dump phase's outcome must be recoverable from the
    // captured stdout tail alone). "dumped" counts queries whose
    // parquet landed; the DuckDB value compare is the driver's (or
    // tools/verify_local.py's) phase and prints its own marker.
    val marker = s"""CORRECTNESS_RESULT {"phase":"dump","dumped":${
      toRun.size - dumpErrors.size},"total":${toRun.size},"errors":${
      dumpErrors.sorted.map(q).mkString("[", ",", "]")},"out":${q(outDir)}}"""
    Files.writeString(Paths.get(s"$outDir/verify_result.json"),
      marker.stripPrefix("CORRECTNESS_RESULT "))
    println(marker)
    // exit 0 even with per-query dump errors — the driver's compare
    // phase decides pass/fail per query; a non-zero exit here could
    // abort its artifact for the queries that DID land
    spark.stop()
  }
}
