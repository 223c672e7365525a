package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Classifier

/** Streaming quality scoring: the continuous-intake twin of
  * [[graft.llm.Classifier.nbScore]] — the "train once on the labeled
  * seed, score every future delta" half of the fastText-class curation
  * pattern, run as a stream. Documents arrive as a file stream; each
  * micro-batch is scored against the PERSISTED ≤ B-row weight table
  * (built once by [[graft.llm.Classifier.nbTrain]], read back from
  * parquet) and handed to the sink with (id, n_feats, score_ppm, pred)
  * attached — route on `pred`/`score_ppm` downstream (keep, quarantine,
  * re-queue).
  *
  * Scale shape: per-batch cost is linear in the BATCH — the model table
  * broadcasts into every micro-batch join (≤ B rows by construction),
  * the already-scored corpus is never rescanned, and the file source's
  * checkpointed tracking gives file-level exactly-once, so re-runs
  * after failure neither drop nor double-score a batch. Scores are the
  * same exact ppm-integer sums as the batch kernel (pinned by
  * StreamingSpec's streaming==batch equivalence). */
object ClassifierStream {

  /** Start scoring `docsStream` against `model` (a batch DataFrame as
    * produced by [[graft.llm.Classifier.nbTrain]] — load it from the
    * persisted path once; it is reused across micro-batches), handing
    * each scored micro-batch to `sink`. */
  def start(docsStream: DataFrame, docIdCol: String, docTextCol: String,
            model: DataFrame, priorPpm: Long, nBuckets: Int,
            checkpoint: String)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(Classifier.nbScore(batch, model, priorPpm,
          docIdCol, docTextCol, nBuckets), id)
      }
      .start()
}
