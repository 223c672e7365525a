package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Dedup
import graft.sinks.ParquetMergeSink

/** Streaming winnowing near-copy detection: the continuous-intake twin
  * of [[graft.llm.Dedup.winnowingPairs]], completing the family's
  * batch + incremental + streaming triple (the [[FuzzyDedupStream]] /
  * [[PostingsStream]] shape). Each micro-batch probes the current
  * version of the persisted fingerprint index for near-copy pairs
  * touching the batch ([[graft.llm.Dedup.winnowingDeltaPairs]] — stale
  * re-upload rows excluded, df-cap over the post-batch corpus), hands
  * them to `sink`, then GROUP-UPSERTS its own (id, fp) rows into the
  * versioned store with the batch's full id set as the replace keys —
  * so a re-uploaded document's old fingerprints are displaced, not
  * appended beside (and a revision that fingerprints to nothing still
  * deletes its rows), and the index always equals
  * [[graft.llm.Dedup.winnowingIndex]] over the latest revision of
  * everything ingested (pinned by SketchSpec).
  *
  * Scale shape: per-batch cost ∝ |batch| + matched fingerprints — the
  * ingested corpus is probed through the thin (id, fp) index, never
  * re-fingerprinted and never self-joined. Intake is file-level
  * exactly-once (checkpointed source); the index write is idempotent
  * under mid-batch replay (the store's version guard); pair EMISSION
  * is at-least-once, and with `maxDf` engaged a pair's shared count is
  * evaluated against the corpus AS OF its emission batch (streams
  * cannot retract a pair whose fingerprints later go hot — resolve at
  * the consumer, or run the batch form for a final sweep). */
object WinnowingStream {

  /** Start mining near-copy pairs from `docsStream`, handing each
    * micro-batch's pairs (a_id, b_id, shared_fps) to `sink` and
    * maintaining the fingerprint index at `<warehouse>/<table>`
    * (created on the first batch; version = batch id + 1). */
  def start(docsStream: DataFrame, idCol: String, textCol: String,
            warehouse: String, table: String, checkpoint: String,
            k: Int = 12, w: Int = 8, minShared: Int = 3,
            maxDf: Int = Int.MaxValue)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val cached = batch.persist()
        try {
          val idx = ParquetMergeSink.readCurrent(spark, warehouse, table)
            .getOrElse(Dedup.winnowingIndex(cached.limit(0), idCol, textCol, k, w))
          sink(Dedup.winnowingDeltaPairs(cached, idCol, textCol, idx,
            k, w, minShared, maxDf), id)
          ParquetMergeSink.mergeGroups(spark, warehouse, table,
            Dedup.winnowingIndex(cached, idCol, textCol, k, w),
            Seq("id"), id + 1,
            replaceKeySet = Some(cached.select(col(idCol).as("id")))): Unit
        } finally {
          cached.unpersist(): Unit
        }
      }
      .start()

  /** Store-backed variant: probes and maintains the VERSIONED unified
    * dedup store ([[graft.llm.NearDupIndexStore]] with a winnowing
    * family) instead of a flat thin-index table. Batches inherit the
    * store's committed-read contract — every component flips behind
    * ONE atomic `_CURRENT` swap per batch, so no reader (this stream
    * included) can observe a torn view — and per-batch cost drops to
    * the indexed probe's (bucket-pruned reads of only the batch's fp
    * buckets, broadcast candidate join) instead of
    * [[graft.llm.Dedup.winnowingDeltaPairs]]' full-index shuffle. The
    * first non-empty batch builds the store (probe-after-build equals
    * the within-batch pairs, by probe/append order independence).
    * Mid-batch crash replay converges: the probe is order-independent
    * with the append, and the append is replace-by-key idempotent —
    * a replayed batch lands a new version with identical content.
    * The store carries ONLY the winnowing family (`jaccard = false`) —
    * this stream never probes Jaccard, so building the near-dup
    * prefix/sets layouts would pay their per-batch shingle + write cost
    * forever for an index nothing reads (r17 advice). Point other
    * consumers that DO need the Jaccard family at their own store (or
    * build this one with [[graft.llm.NearDupIndexStore.build]]
    * directly — appendDelta advances whatever families exist). */
  def startIndexed(docsStream: DataFrame, idCol: String, textCol: String,
                   storeRoot: String, checkpoint: String,
                   k: Int = 12, w: Int = 8, minShared: Int = 3,
                   maxDf: Int = Int.MaxValue)
                  (sink: (DataFrame, Long) => Unit): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        import graft.llm.NearDupIndexStore
        val spark = batch.sparkSession
        val cached = batch.localCheckpoint()
        if (NearDupIndexStore.currentVersion(storeRoot).isEmpty) {
          if (!cached.isEmpty) {
            NearDupIndexStore.build(spark, cached, idCol, textCol, storeRoot,
              winnowing = Some((k, w)), jaccard = false): Unit
            sink(NearDupIndexStore.winnowingPairsForDelta(spark, storeRoot,
              cached, idCol, textCol, minShared, maxDf), id)
          } else sink(Dedup.winnowingDeltaPairs(cached, idCol, textCol,
            Dedup.winnowingIndex(cached, idCol, textCol, k, w),
            k, w, minShared, maxDf).limit(0), id)
        } else {
          sink(NearDupIndexStore.winnowingPairsForDelta(spark, storeRoot,
            cached, idCol, textCol, minShared, maxDf), id)
          NearDupIndexStore.appendDelta(spark, storeRoot, cached,
            idCol, textCol): Unit
        }
      }
      .start()
}
