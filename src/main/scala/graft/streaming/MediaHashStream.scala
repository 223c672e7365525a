package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.{Dedup, Multimodal}

import graft.sinks.ParquetMergeSink

/** Streaming media-hash near-dup detection: the continuous-intake twin
  * of [[graft.llm.Multimodal.imageNearDupPairs]] /
  * [[graft.llm.Multimodal.audioNearDupPairs]], completing the
  * media-hash family's batch + incremental + streaming triple (the
  * [[WinnowingStream]] / [[ContainmentStream]] shape, t125–t127's
  * missing third form). Each micro-batch decodes and 64-bit-hashes ONLY
  * its own media (`hasher` — perceptual image hash by default, swap in
  * [[graft.llm.Multimodal.audioFingerprints]] for an audio intake),
  * probes the persisted (id, sig) index for hamming-≤k pairs touching
  * the batch ([[graft.llm.Dedup.sigHammingDeltaPairs]] — stale
  * re-upload signatures displaced, not matched), hands them to `sink`,
  * then GROUP-UPSERTS its own signatures into the versioned store with
  * the batch's full id set as the replace keys — so the index always
  * equals the batch hasher over the latest revision of everything
  * ingested (pinned by MultimodalSpec).
  *
  * Scale shape: per-batch cost ∝ |batch| decodes + banded probes of the
  * thin 16-byte/doc signature index — ingested media BYTES are decoded
  * once at intake and never re-read, re-decoded, or shuffled; only
  * signatures move. The per-batch merged-plan cache
  * [[graft.llm.Dedup.sigHammingDeltaPairs]] persists is released after
  * every batch ([[graft.llm.Dedup.releaseSigHammingDeltaCache]]) —
  * exactly the unbounded-accumulation case that helper exists for.
  * Intake is file-level exactly-once (checkpointed source); the index
  * write is idempotent under mid-batch replay (the store's version
  * guard); pair EMISSION is at-least-once (resolve at the consumer). */
object MediaHashStream {

  /** Start mining near-dup media pairs from `mediaStream` (rows shaped
    * like [[graft.llm.Multimodal.MediaRecord]]), handing each
    * micro-batch's pairs (a_id, b_id, hamming) to `sink` and
    * maintaining the signature index at `<warehouse>/<table>` (created
    * on the first batch; version = batch id + 1). */
  def start(mediaStream: DataFrame,
            warehouse: String, table: String, checkpoint: String,
            maxHamming: Int = 3,
            hasher: Dataset[Multimodal.MediaRecord] => Dataset[Multimodal.MediaHash] =
              Multimodal.imagePHashes)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    mediaStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        // decode once per batch: the persisted projection is the THIN
        // (id, sig) pair — bytes stay partition-local to the decode and
        // are never cached or shuffled
        val sigs = hasher(batch.as[Multimodal.MediaRecord])
          .toDF().select(col("media_id").as("id"), col("phash").as("sig"))
          .persist()
        try {
          val idx = ParquetMergeSink.readCurrent(spark, warehouse, table)
            .getOrElse(sigs.limit(0))
          sink(Dedup.sigHammingDeltaPairs(sigs, idx, maxHamming), id)
          ParquetMergeSink.mergeGroups(spark, warehouse, table, sigs,
            Seq("id"), id + 1,
            replaceKeySet = Some(sigs.select(col("id")))): Unit
          Dedup.releaseSigHammingDeltaCache(sigs, idx)
        } finally {
          sigs.unpersist(): Unit
        }
      }
      .start()
}
