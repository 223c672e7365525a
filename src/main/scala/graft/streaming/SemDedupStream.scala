package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.AnnIndexStore

/** Streaming SemDeDup over the versioned ANN store: the
  * continuous-intake twin of
  * [[graft.llm.AnnIndexStore.semDedupPairsForDelta]], completing the
  * embedding family's batch + incremental + streaming triple (the
  * [[WinnowingStream.startIndexed]] shape for vectors instead of
  * shingles). Each micro-batch probes the CURRENT committed store
  * version for within-cell cosine pairs touching the batch, hands them
  * to `sink`, then absorbs the batch with
  * [[graft.llm.AnnIndexStore.appendDelta]] — under the store's OWN
  * persisted `_PARAMS`, so a stream restarted by a different operator
  * cannot drift the assignment fan-out or graph shape.
  *
  * The FIRST non-empty batch builds the store; its centroids FREEZE
  * the cell partition every later batch probes and appends under (the
  * SemDeDup answers are a function of those centroids — the contract
  * documented on `semDedupPairsForDelta`). Accumulated emissions
  * telescope: with no re-uploads, a pair (a < b) is emitted exactly
  * once — in the batch where the LATER of the two arrived — so the
  * union over batches equals the one-shot batch SemDeDup of everything
  * ingested at the frozen centroids (pinned in SketchSpec). Re-uploads
  * follow the store's replace semantics: the new revision pairs from
  * its arrival batch on; pair emission overall is at-least-once under
  * crash replay (resolve duplicates at the consumer), while the store
  * itself converges (replace-by-key appends land identical content on
  * replay).
  *
  * Scale shape: per-batch cost ∝ |batch| + matched cell members — the
  * ingested corpus is reached ONLY through the delta's cells' pruned
  * assignment buckets; it is never rescanned, never self-joined, and
  * maintenance stays with the store
  * ([[graft.llm.AnnIndexStore.maybeMaintain]] /
  * [[graft.llm.AnnIndexStore.reclusterIfDrifted]], between batches —
  * note a recluster CHANGES the frozen partition and thus future
  * emissions' cells). */
object SemDedupStream {

  /** Start mining semantic near-dup pairs from `embStream`, handing
    * each micro-batch's (cell, a_id, b_id, cos_sim) pairs to `sink`
    * and maintaining the ANN store at `storeRoot` (created on the
    * first non-empty batch with `p`; advanced after under the
    * persisted `_PARAMS`). */
  def startIndexed(embStream: DataFrame, idCol: String, vecCol: String,
                   storeRoot: String, checkpoint: String,
                   minCos: Double,
                   p: AnnIndexStore.Params = AnnIndexStore.Params())
                  (sink: (DataFrame, Long) => Unit): StreamingQuery =
    embStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val cached = batch.localCheckpoint()
        def emptyPairs: DataFrame = cached.select(lit(0).as("cell"),
          col(idCol).as("a_id"), col(idCol).as("b_id"),
          lit(0.0).as("cos_sim")).limit(0)
        if (AnnIndexStore.currentVersion(storeRoot).isEmpty) {
          if (!cached.isEmpty) {
            AnnIndexStore.build(spark, cached, idCol, vecCol, storeRoot, p)
            // probe-after-build == the batch's own within-cell pairs
            // (the member side anti-joins the batch's ids away, so
            // only the broadcast intra-delta pairs remain)
            sink(AnnIndexStore.semDedupPairsForDelta(spark, storeRoot,
              cached, idCol, vecCol, minCos), id)
          } else sink(emptyPairs, id)
        } else if (cached.isEmpty) {
          // an empty micro-batch must not commit a new stitched store
          // version (a zero-row append per idle trigger would grow the
          // reference chain for nothing) — mirror the first-batch guard
          sink(emptyPairs, id)
        } else {
          sink(AnnIndexStore.semDedupPairsForDelta(spark, storeRoot,
            cached, idCol, vecCol, minCos), id)
          AnnIndexStore.appendDelta(spark, storeRoot, cached,
            idCol, vecCol): Unit
        }
      }
      .start()
}
