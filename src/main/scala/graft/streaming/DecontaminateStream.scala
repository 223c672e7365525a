package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Decontaminate

/** Streaming benchmark decontamination: the continuous-intake twin of
  * [[graft.llm.Decontaminate.scrubAgainstGramIndex]] (SURVEY.md §2.9
  * pattern — the reference's event-per-file trigger, applied to the
  * curation ops). Documents arrive as a stream (crawl drops, ingest
  * folders); each micro-batch is scrubbed against the PERSISTED
  * benchmark gram index ([[graft.llm.Decontaminate.benchGramIndex]],
  * built once per suite revision and read back from parquet) and the
  * clean rows are appended downstream via `foreachBatch`.
  *
  * Scale shape: per-batch cost is linear in the BATCH, not the corpus —
  * the already-ingested corpus is never rescanned (the reference's
  * watermark-gate idea, /root/reference/second_lambda_function.py:44-88,
  * applied to decontamination), and within a batch the corpus side
  * never shuffles (the index broadcasts, or bloom-degrades over
  * budget — same guarantees as the batch kernel). The file source's
  * checkpointed tracking gives file-level exactly-once, so re-runs
  * after failure neither drop nor double-scrub a batch.
  */
object DecontaminateStream {

  /** Start scrubbing `docsStream` against `gramIndex`, handing each
    * cleaned micro-batch to `sink` (e.g. append to the training-corpus
    * table). `gramIndex` is a batch DataFrame of distinct grams — load
    * it from the persisted index path once; it is reused across
    * micro-batches. */
  def start(docsStream: DataFrame, docIdCol: String, docTextCol: String,
            gramIndex: DataFrame, checkpoint: String,
            n: Int = 8, minShared: Int = 1)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(Decontaminate.scrubAgainstGramIndex(
          batch, docIdCol, docTextCol, gramIndex, n, minShared), id)
      }
      .start()
}
