package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Dedup
import graft.sinks.ParquetMergeSink

/** Streaming fuzzy-key dedup: the continuous-intake twin of
  * [[graft.llm.Dedup.fuzzyKeyPairs]] (SURVEY.md §2.9 pattern — the
  * reference's event-per-file trigger applied to the curation ops, with
  * the watermark-gate idea from
  * /root/reference/second_lambda_function.py:44-88 carried by the
  * persisted segment index). Each micro-batch probes the current
  * version of the segment index for near-duplicate key pairs touching
  * the batch, hands them to `sink`, then GROUP-UPSERTS its own segment
  * rows into the versioned store
  * ([[graft.sinks.ParquetMergeSink.mergeGroups]] with the batch's full
  * id set as the replace keys) — so a re-uploaded document's stale
  * segments are displaced, not appended beside (and a revision that
  * normalizes to a NULL key still deletes its old rows), and the index
  * always equals [[graft.llm.Dedup.fuzzyKeyIndex]] over the latest
  * revision of everything ingested (pinned by DedupSpec).
  *
  * Scale shape: per-batch cost is ∝ |batch| + matched segments — the
  * already-ingested corpus is probed through the thin index (id, key,
  * seg_i, seg), never re-keyed and never self-joined, and corpus text
  * is never read back. The file source's checkpointed tracking gives
  * file-level exactly-once intake; the index write is idempotent under
  * mid-batch replay (the store's version guard), while pair EMISSION is
  * at-least-once — a replayed batch re-emits its pair set, and pairs
  * already emitted downstream against a superseded revision are not
  * retractable (streams cannot retract; resolve at the consumer by
  * joining pairs back to current doc ids, the
  * [[graft.llm.Dedup.dedupByPairs]] step).
  */
object FuzzyDedupStream {

  /** Start mining near-dup key pairs from `docsStream`, handing each
    * micro-batch's pairs (a_id, b_id, dist) to `sink` and maintaining
    * the segment index at `<warehouse>/<table>` (created on the first
    * batch; version = batch id + 1). */
  def start(docsStream: DataFrame, idCol: String, textCol: String,
            warehouse: String, table: String, checkpoint: String,
            keyLen: Int = 64, maxDist: Int = 3)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val cached = batch.persist()
        try {
          val idx = ParquetMergeSink.readCurrent(spark, warehouse, table)
            .getOrElse(Dedup.fuzzyKeyIndex(cached.limit(0), idCol, textCol, keyLen, maxDist))
          sink(Dedup.fuzzyKeyDeltaPairs(cached, idCol, textCol, idx,
            keyLen, maxDist), id)
          ParquetMergeSink.mergeGroups(spark, warehouse, table,
            Dedup.fuzzyKeyIndex(cached, idCol, textCol, keyLen, maxDist),
            Seq("id"), id + 1,
            replaceKeySet = Some(cached.select(col(idCol).as("id")))): Unit
        } finally {
          cached.unpersist(): Unit
        }
      }
      .start()
}
