package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{IngestEvent, TableVersion}
import graft.pipeline.{DeltaLoadPipeline, LoadReport}
import graft.sinks.ParquetMergeSink
import graft.tracker.Watermarks

/** User-facing facade — what a user of the reference pipeline calls
  * instead of uploading to S3 and reading MySQL (SURVEY.md §3 entry
  * points):
  *
  *   E1  `loadAll(ingestRoot)`  — full incremental intake of a
  *       versioned snapshot layout `<ts>/<table>.csv`
  *   E2  `ensureTable(csvPath)` — schema inference + registration
  *   E3  `load(csvPath)`        — single-file validate→clean→merge
  *   query: `table(name)` / `sql(...)` over the curated store (the
  *       role MySQL Workbench played for the reference)
  */
final class Engine(
    val spark: SparkSession,
    warehouse: String,
    trackerPath: String,
    keysFor: String => Seq[String]) {

  private val pipeline = new DeltaLoadPipeline(spark, warehouse, trackerPath, keysFor)
  private val tracker = new Watermarks(trackerPath)

  /** E2 — infer schema from the CSV and register the (empty or
    * existing) table; first-writer-wins like the reference's
    * `CREATE TABLE IF NOT EXISTS`. Returns the inferred schema. */
  def ensureTable(csvPath: String): org.apache.spark.sql.types.StructType =
    infer.TypeInference.spark(spark, csvPath)

  /** E3 — load one snapshot file through gate→clean→merge→watermark. */
  def load(csvPath: String): LoadReport = {
    val p = new org.apache.hadoop.fs.Path(csvPath)
    val folder = p.getParent.getName
    val tv = TableVersion(IngestEvent.tableOf(p.getName), IngestEvent.versionOf(folder))
    pipeline.runOne(tv, csvPath)
  }

  /** E1 — process every pending snapshot under the ingest root. */
  def loadAll(ingestRoot: String): Seq[LoadReport] = pipeline.runAll(ingestRoot)

  // K6 — the SQS-FIFO analog (reference: second_lambda_function.py:104-124
  // posts {bucket, key} with MessageGroupId=<table>,
  // MessageDeduplicationId=<file>+<timestamp>): a durable queue between
  // "file landed" and "file loaded", so intake survives consumer crashes
  // and per-table processing stays serialized even across processes.
  // visibility timeout must exceed the slowest expected load — an
  // expired lease mid-load means the message redelivers and the load
  // runs twice (the gate absorbs it, but the duplicate Spark job and
  // report are waste); 15 min covers any single-snapshot CSV load
  private val queue = new sources.FifoQueue(graft.fs.Fs.child(warehouse, "_queue"),
    visibilityTimeoutMs = 15 * 60 * 1000L)

  /** Post a snapshot file's ingest event; group = table (serializes
    * per-table loads), dedup id = table@version (drops duplicate
    * notifications for one snapshot). False = duplicate, dropped. */
  def enqueue(csvPath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(csvPath)
    val tv = TableVersion(IngestEvent.tableOf(p.getName),
      IngestEvent.versionOf(p.getParent.getName))
    queue.send(tv.table, s"${tv.table}@${tv.version}", csvPath)
  }

  /** Drain the queue through the load pipeline: each message is acked
    * only after its load commits, so a crash mid-load redelivers (the
    * version gate then makes the replay a no-op — at-least-once intake,
    * exactly-once effect). A load that throws aborts the drain with its
    * message still leased; it redelivers after the visibility timeout,
    * and other groups keep draining on the next call. */
  def drainQueue(): Seq[LoadReport] = {
    val out = Seq.newBuilder[LoadReport]
    var msg = queue.receiveAny()
    while (msg.isDefined) {
      val m = msg.get
      out += load(m.body)
      queue.ack(m)
      msg = queue.receiveAny()
    }
    out.result()
  }

  /** K7 — the Step-Functions analog: managed executions over the same
    * load path (bounded retries, durable execution history, dead-letter
    * + redrive). `drainQueue` above is the bare-queue path; this is the
    * orchestrated one (reference second_lambda_function.py:135-150). */
  def orchestrator(maxAttempts: Int = 3): graft.pipeline.Orchestrator =
    new graft.pipeline.Orchestrator(graft.fs.Fs.child(warehouse, "_orchestrator"),
      load(_), maxAttempts)

  /** Current curated contents of a table. */
  def table(name: String): DataFrame =
    ParquetMergeSink.readCurrent(spark, warehouse, name)
      .getOrElse(throw new NoSuchElementException(s"table $name not loaded"))

  /** Registered-view SQL over every curated table + the engine's native
    * functions — the analyst surface.
    *
    * Trust assumption: callers are TRUSTED analysts. The registered
    * table functions ([[graft.functions.GraftTableFunctions]]) take
    * index/corpus PATH arguments resolved at analysis time, so SQL
    * submitted here can read any parquet path the Spark process can —
    * the same power `spark.read.parquet` gives any Scala caller of
    * this library, surfaced in SQL. Do NOT serve untrusted SQL through
    * this method; a multi-tenant deployment must front it with its own
    * path allow-listing (e.g. rewrite/validate string literals against
    * a configured data root before submission). */
  def sql(query: String): DataFrame = {
    functions.GraftFunctions.register(spark)
    functions.GraftTableFunctions.register(spark)
    listTables().foreach(t => table(t).createOrReplaceTempView(t))
    spark.sql(query)
  }

  def listTables(): Seq[String] =
    graft.fs.Fs.list(warehouse)
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(_.startsWith("_")) // control-plane dirs (_queue) aren't tables
      .sorted

  def watermarks(): Map[String, Long] = tracker.read()
}
