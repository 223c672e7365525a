package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.CurationLedgerStore

/** Streaming intake for the versioned curation-LEDGER store — the
  * continuous-deployment twin of
  * [[graft.llm.CurationLedgerStore.absorbBatch]], closing the store
  * family's batch + incremental + streaming triple (the
  * [[SemDedupStream]] shape for the curation capstone). Each
  * micro-batch absorbs into the CURRENT committed store version —
  * churn-bounded candidate derivation, exact rescoring, splice — and
  * hands the batch's CHANGED ledger rows to `sink`.
  *
  * The FIRST non-empty batch builds the store (one-time corpus cost —
  * every component layout plus the near-dup index and the frozen
  * benchmark gram index) and emits the full initial ledger: against an
  * empty prior state every row is a changed row, so emissions
  * TELESCOPE from the very first trigger — upserting each batch's
  * emitted rows by id (latest batch wins) reproduces
  * [[graft.llm.Curation.fullPipelineLedger]] over everything ingested
  * (pinned in CurationLedgerStoreSpec, across a real restart). An
  * EMPTY micro-batch emits an empty frame and writes NOTHING — an idle
  * trigger must not commit a stitched store version (the
  * [[SemDedupStream]] guard).
  *
  * Crash semantics: the STORE converges under replay — a re-absorbed
  * batch's churn arithmetic cancels and its changed set is empty (the
  * store's replay-idempotence contract), so restarts never corrupt
  * state. The changed-rows EMISSION is tied to the store commit inside
  * one foreachBatch: a crash between the commit and the sink replays
  * the batch as a no-op, so that batch's diff reaches the sink
  * at-most-once — a consumer needing the lost diff reads it from the
  * store's retained version pair; consumers that only fold emissions
  * into current state lose nothing (the rows they missed are exactly
  * the rows the next lookup of the store returns).
  *
  * Batches must carry the store's column contract (id, text, score,
  * source — recorded in `_PARAMS` at build) with unique ids per batch
  * (the absorb intake contract; dedup upstream if the source can emit
  * an id twice per trigger). */
object CurationLedgerStream {

  /** Start absorbing `docStream` into the store at `storeRoot`
    * (created on the first non-empty batch with `p` and the frozen
    * `bench` gram set; advanced after under the persisted `_PARAMS`),
    * handing each micro-batch's changed (id, n_tokens, verdict) rows
    * to `sink`. */
  def start(docStream: DataFrame, storeRoot: String, checkpoint: String,
            bench: DataFrame, benchTextCol: String,
            p: CurationLedgerStore.Params)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val cached = batch.localCheckpoint()
        def emptyChanged: DataFrame = cached
          .select(col(p.idCol), lit(0L).as("n_tokens"), lit("").as("verdict"))
          .limit(0)
        if (CurationLedgerStore.currentVersion(storeRoot).isEmpty) {
          if (!cached.isEmpty) {
            CurationLedgerStore.build(spark, cached, bench, benchTextCol,
              storeRoot, p)
            // against an empty prior state EVERY ledger row is changed
            sink(CurationLedgerStore.ledger(spark, storeRoot), id)
          } else sink(emptyChanged, id)
        } else if (cached.isEmpty) {
          // idle trigger: no store commit (the SemDedupStream guard)
          sink(emptyChanged, id)
        } else {
          sink(CurationLedgerStore.absorbBatch(spark, storeRoot, cached), id)
        }
      }
      .start()
}
