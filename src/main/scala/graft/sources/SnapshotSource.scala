package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.fs.Fs
import graft.model.{IngestEvent, TableVersion}

/** Versioned-snapshot CSV source.
  *
  * Reproduces the reference's ingest layout `<YYYYMMDD_HHMMSS>/<table>.csv`
  * (S3 bucket layout in /root/reference screenshot 1737920487152.jpeg;
  * folder parsed as integer version, second_lambda_function.py:29-31)
  * over any filesystem Spark can read.
  */
object SnapshotSource {

  /** List every (table, version, path) under the ingest root.
    * Control-plane listing — driver-side, one stat per file; scheme-aware
    * through the Hadoop FS API, so the root may be `file://`, `hdfs://`
    * or `s3a://` (an object-store LIST, same shape as the reference's
    * S3 ingest bucket). */
  def listSnapshots(root: String): Seq[(TableVersion, String)] =
    Fs.list(root)
      .filter(_.isDirectory)
      .flatMap { folder =>
        val version = IngestEvent.versionOf(folder.getPath.getName)
        Fs.list(folder.getPath.toString)
          .filter(_.getPath.getName.endsWith(".csv"))
          .map { p =>
            (TableVersion(IngestEvent.tableOf(p.getPath.getName), version), p.getPath.toString)
          }
      }
      .sortBy { case (tv, _) => (tv.table, tv.version) }

  /** Read one snapshot file with full schema inference (S4 scan). */
  def readSnapshot(spark: SparkSession, path: String): DataFrame =
    graft.infer.TypeInference.readCsv(spark, path)

  /** Read *all* versions of one table as a single DataFrame with a
    * `load_ts` version column — the bulk/backfill path. Distributed:
    * one multi-path CSV scan, the version derived per-file. */
  def readAllVersions(spark: SparkSession, root: String, table: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val snaps = listSnapshots(root).filter(_._1.table == table)
    require(snaps.nonEmpty, s"no snapshots for table $table under $root")
    // One read per distinct schema-version is unnecessary: same table ⇒
    // same header. Single scan over all paths, version from the path.
    val df = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(snaps.map(_._2): _*)
    df.withColumn(
      "load_ts",
      regexp_replace(element_at(split(input_file_name(), "/"), -2), "[^0-9]", "").cast("long"))
  }
}
