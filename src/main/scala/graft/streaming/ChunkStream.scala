package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Chunking

/** Streaming chunking: the continuous-intake twin of
  * [[graft.llm.Chunking.chunkWindows]]. Chunking is a STATELESS map, so
  * unlike the scorer/scrubber twins it needs no foreachBatch bridge —
  * the chunk transform applies directly to the streaming DataFrame and
  * the planner runs it per micro-batch with the file source's
  * checkpointed exactly-once tracking (re-runs neither drop nor
  * re-chunk a file). Per-batch cost is linear in the batch; no state
  * store, no watermark, nothing accumulates across batches. */
object ChunkStream {

  /** Start chunking `docsStream` into `outPath` (parquet, append). */
  def start(docsStream: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int,
            outPath: String, checkpoint: String): StreamingQuery =
    Chunking.chunkWindows(docsStream, idCol, textCol, chunkSize, stride)
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
