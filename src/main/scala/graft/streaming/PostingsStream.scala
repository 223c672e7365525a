package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Retrieval
import graft.sinks.ParquetMergeSink

/** Streaming BM25 index maintenance: the continuous-intake twin of
  * [[graft.llm.Retrieval.mergePostings]] / t110. Documents arrive as a
  * stream; each micro-batch tokenizes ONCE into its own postings and
  * group-upserts them into the versioned curated store
  * ([[graft.sinks.ParquetMergeSink.mergeGroups]] — re-uploaded docs
  * displace their old postings wholesale, new docs append), so the
  * current index version always equals a from-scratch
  * [[graft.llm.Retrieval.postings]] over everything ingested (pinned by
  * RetrievalSpec) and any online query set can [[graft.llm.Retrieval
  * .bm25TopKFromIndex]] against it between batches.
  *
  * Scale shape: per-batch tokenize cost is ∝ |batch|; the corpus index
  * is anti-joined (batch key set broadcasts, index streams) and
  * rewritten columnar — the corpus TEXT is never re-read. The store's
  * pointer swap is atomic and versioned, so queries see a consistent
  * index version throughout their run and time travel reaches any
  * retained corpus version; `vacuum` bounds retention. The write
  * amplification of full-version rewrites is the store's documented
  * trade (same as [[IngestStream]]'s merge path) — at very high batch
  * rates, compact less often by batching upstream (the reference
  * batches via SQS, /root/reference/second_lambda_function.py:104-117).
  */
object PostingsStream {

  /** Start maintaining the postings index for `docsStream` at
    * `<warehouse>/<table>` (created on first batch; version = batch id
    * + 1 so the store's versions ascend from v1). */
  def start(docsStream: DataFrame, idCol: String, textCol: String,
            warehouse: String, table: String, checkpoint: String): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // replaceKeySet = the batch's FULL id set: a re-upload that
        // tokenizes to zero terms must still delete its old postings
        ParquetMergeSink.mergeGroups(batch.sparkSession, warehouse, table,
          Retrieval.postings(batch, idCol, textCol), Seq("doc_id"), id + 1,
          replaceKeySet = Some(batch.select(
            org.apache.spark.sql.functions.col(idCol).as("doc_id")))): Unit
      }
      .start()
}
