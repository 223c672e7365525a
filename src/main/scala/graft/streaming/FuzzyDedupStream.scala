package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Dedup

/** Streaming fuzzy-key dedup: the continuous-intake twin of
  * [[graft.llm.Dedup.fuzzyKeyPairs]] (SURVEY.md §2.9 pattern — the
  * reference's event-per-file trigger applied to the curation ops, with
  * the watermark-gate idea from
  * /root/reference/second_lambda_function.py:44-88 carried by the
  * persisted segment index). Each micro-batch probes the persisted
  * [[graft.llm.Dedup.fuzzyKeyIndex]] for near-duplicate key pairs
  * touching the batch, hands them to `sink`, then appends its own
  * segment rows to the index — so the accumulated pair stream equals
  * the one-shot batch `fuzzyKeyPairs` over everything ingested (pinned
  * by DedupSpec).
  *
  * Scale shape: per-batch cost is ∝ |batch| + matched segments — the
  * already-ingested corpus is probed through the thin index (id, key,
  * seg_i, seg), never re-keyed and never self-joined, and corpus text
  * is never read back. The file source's checkpointed tracking gives
  * file-level exactly-once intake; the index append is at-least-once
  * under mid-batch retry, which candidate `distinct()` absorbs on the
  * pair side (a duplicated index row cannot duplicate an output pair
  * within a batch).
  */
object FuzzyDedupStream {

  /** Start mining near-dup key pairs from `docsStream`, handing each
    * micro-batch's pairs (a_id, b_id, dist) to `sink` and growing the
    * segment index at `indexPath` (parquet, append — created on the
    * first batch). */
  def start(docsStream: DataFrame, idCol: String, textCol: String,
            indexPath: String, checkpoint: String,
            keyLen: Int = 64, maxDist: Int = 3)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val cached = batch.persist()
        try {
          val p = new org.apache.hadoop.fs.Path(indexPath)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val idx =
            if (fs.exists(p)) spark.read.parquet(indexPath)
            else Dedup.fuzzyKeyIndex(cached.limit(0), idCol, textCol, keyLen, maxDist)
          sink(Dedup.fuzzyKeyDeltaPairs(cached, idCol, textCol, idx,
            keyLen, maxDist), id)
          Dedup.fuzzyKeyIndex(cached, idCol, textCol, keyLen, maxDist)
            .write.mode("append").parquet(indexPath)
        } finally {
          cached.unpersist(): Unit
        }
      }
      .start()
}
