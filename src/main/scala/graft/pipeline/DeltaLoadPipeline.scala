package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.TableVersion
import graft.operators.Relational
import graft.sinks.ParquetMergeSink
import graft.sources.SnapshotSource
import graft.tracker.Watermarks

/** The end-to-end incremental load pipeline — the engine's restatement of
  * the reference's E1/E3 flow (SURVEY.md §3):
  *
  *   discover snapshots → incremental gate (strict `>`) → CSV scan with
  *   inference → null-violation side-output → clean (dropna + distinct) →
  *   keyed MERGE into the curated parquet store → advance watermark →
  *   report.
  *
  * Reference stages: gate /root/reference/second_lambda_function.py:44-88;
  * scan+clean /root/reference/delta_load.py:62-98; upsert
  * delta_load.py:169-202; watermark delta_load.py:204-265; notify
  * delta_load.py:267-286 (here: the returned report, `LoadReport`).
  *
  * Scale posture: per-table, per-version processing is independent —
  * at cluster scale versions of distinct tables load in parallel; within
  * one load everything is a Spark plan (scan → filter → hash-dedup →
  * shuffle-on-keys merge join). The only driver-side state is the
  * watermark map and the bounded alert sample.
  */
final case class LoadReport(
    table: String,
    version: Long,
    processed: Boolean,
    inputRows: Long = 0,
    nullRows: Long = 0,
    dupRows: Long = 0,
    curatedRows: Long = 0,
    alerts: Seq[String] = Nil,
    // unique execution id (reference F9: UUID-named executions,
    // second_lambda_function.py:137)
    runId: String = java.util.UUID.randomUUID().toString)

final class DeltaLoadPipeline(
    spark: SparkSession,
    warehouse: String,
    trackerPath: String,
    keysFor: String => Seq[String],
    alerts: graft.sinks.AlertChannel = graft.sinks.AlertChannel.Noop) {

  private val tracker = new Watermarks(trackerPath)

  /** Process every pending snapshot under `ingestRoot`, oldest first
    * (FIFO-per-table ordering, SURVEY.md §2.9). */
  def runAll(ingestRoot: String): Seq[LoadReport] =
    SnapshotSource.listSnapshots(ingestRoot).map { case (tv, path) => runOne(tv, path) }

  /** Process a single (table, version) snapshot file. */
  def runOne(tv: TableVersion, path: String): LoadReport = {
    if (!tracker.shouldProcess(tv)) {
      // Reference else-branch: not newer ⇒ skip (idempotent replay).
      return LoadReport(tv.table, tv.version, processed = false)
    }
    val raw = SnapshotSource.readSnapshot(spark, path).cache()
    try {
      // exact accounting in one aggregate over the cached input:
      // inputRows and the TRUE null-violation count (the alert sample
      // below is bounded and must not be used for arithmetic). The
      // predicate is THE shared definition (Relational.anyNullPredicate)
      // so this count always matches what dropNullRows removes and what
      // the alert side-output samples.
      val anyNull = Relational.anyNullPredicate(raw.schema)
      val counts = raw.agg(
        count(lit(1)).as("input"),
        sum(when(anyNull, 1L).otherwise(0L)).as("nulls")).head()
      val inputRows = counts.getLong(0)
      val nullRows = if (counts.isNullAt(1)) 0L else counts.getLong(1)
      val alertMsgs = Relational.nullViolationSample(raw)
        .toSeq.map(r => s"null row in ${tv.table} v${tv.version}: $r")
      val clean = Relational.distinctRows(Relational.dropNullRows(raw))
      val cleanRows = clean.count()
      val curated = ParquetMergeSink.merge(spark, warehouse, tv.table, clean, keysFor(tv.table), tv.version)
      tracker.advance(tv)
      // K4/K5 out-of-band notify: bounded alert sample + one success
      // event per load (reference SNS publishes, delta_load.py:267-286)
      alertMsgs.foreach(m =>
        alerts.send(graft.sinks.AlertChannel.Event("alert", tv.table, tv.version, m)))
      alerts.send(graft.sinks.AlertChannel.Event("success", tv.table, tv.version,
        s"loaded $inputRows rows ($nullRows null, ${(inputRows - nullRows) - cleanRows} dup) -> $curated curated"))
      LoadReport(tv.table, tv.version, processed = true, inputRows,
        nullRows, dupRows = (inputRows - nullRows) - cleanRows,
        curatedRows = curated, alerts = alertMsgs)
    } finally raw.unpersist()
  }
}
