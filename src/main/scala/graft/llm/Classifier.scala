package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** FastText-class quality classifier (Joulin et al., arXiv:1607.01759:
  * a linear model over hashed bag-of-ngrams features), trained as
  * multinomial Naive Bayes so training is a closed-form COUNT — one
  * distributed pass, no SGD, no RNG — and every weight is a
  * deterministic integer the DuckDB oracle re-derives bit-for-bit.
  * This is the GPT-3/CCNet data-curation pattern: label a small seed
  * (curated = positive, raw crawl = negative), train a cheap linear
  * classifier, score the whole corpus, keep high scorers.
  *
  * Weights: w(b) = ⌊(ln P̂(b|pos) − ln P̂(b|neg))·10⁶ + 1e-4⌋ with
  * add-one smoothing over the B-bucket hashed feature space
  * ([[hashBucket]]); prior = ⌊ln(n_pos/n_neg)·10⁶ + 1e-4⌋. A document
  * scores Σ_b f_b·w(b) + prior — an exact integer sum, so results are
  * partition-independent (the [[TextAnalysis.unigramLogProbPpm]] ppm
  * contract).
  *
  * Scale shape: training aggregates the thin (bucket, y) projection —
  * map-side combined, output ≤ B rows REGARDLESS of corpus size (the
  * point of feature hashing). Scoring joins per-document bucket counts
  * against that ≤ B-row model — Catalyst broadcasts it — then one thin
  * aggregation; document text never shuffles. The model table is the
  * persistable artifact: train once on the labeled seed, score every
  * future delta against it (the incremental-gate pattern,
  * /root/reference/second_lambda_function.py:44-88). */
object Classifier {

  /** Per-document hashed UNIGRAM bucket counts: (id, bucket, n). */
  def tokenBuckets(docs: DataFrame, idCol: String, textCol: String,
                   nBuckets: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(tokens(normalizeText(col(textCol)))).as("feat"))
      .select(col("id"), hashBucket(col("feat"), nBuckets).as("bucket"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("n"))

  /** Train on a labeled seed: returns the ≤ B-row weight table
    * (bucket, w_ppm). `labelCol` must be boolean. Buckets never seen in
    * training carry no row — an unseen bucket contributes the SMOOTHED
    * prior ratio, which for equal smoothing is the same constant for
    * every unseen bucket; we fold it to 0 (dropping it) so the model
    * table stays sparse — the standard hashed-NB treatment. */
  def nbTrain(labeled: DataFrame, idCol: String, textCol: String,
              labelCol: String, nBuckets: Int): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val perDoc = labeled.select(col(idCol).as("id"), col(labelCol).as("y"),
        explode(tokens(normalizeText(col(textCol)))).as("feat"))
      .select(col("y"), hashBucket(col("feat"), nBuckets).as("bucket"))
    // ONE counting job collects the ≤ B-row class-count table; totals
    // and the ppm floors are driver arithmetic (same java.lang.Math.log
    // as Spark's log codegen; the +1e-4 guard is the cross-engine
    // contract) — one labeled-corpus scan instead of two.
    val cls = perDoc.groupBy(col("bucket"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("y"), 0L).otherwise(1L)).as("c_neg"))
      .as[(Long, Long, Long)].collect()
    val nPos = cls.map(_._2).sum
    val nNeg = cls.map(_._3).sum
    cls.toSeq.map { case (b, cp, cn) =>
      (b, math.floor((math.log((cp + 1).toDouble / (nPos + nBuckets).toDouble)
        - math.log((cn + 1).toDouble / (nNeg + nBuckets).toDouble)) * 1e6 + 1e-4).toLong)
    }.toDF("bucket", "w_ppm")
  }

  /** The class prior term, ppm-floored: ⌊ln(nPosDocs/nNegDocs)·10⁶⌋.
    * Two driver-side longs — bounded control-plane state. */
  def nbPriorPpm(labeled: DataFrame, labelCol: String): Long = {
    val r = labeled.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)),
      sum(when(col(labelCol), 0L).otherwise(1L))).head()
    val (p, n) = (r.getLong(0), r.getLong(1))
    require(p > 0 && n > 0, s"need both classes in the seed, got pos=$p neg=$n")
    math.floor(math.log(p.toDouble / n.toDouble) * 1e6 + 1e-4).toLong
  }

  /** Score every document against a trained model: (id, n_feats,
    * score_ppm, pred). Documents whose buckets all miss the model (or
    * with no tokens) score exactly the prior. */
  def nbScore(docs: DataFrame, model: DataFrame, priorPpm: Long,
              idCol: String, textCol: String, nBuckets: Int): DataFrame = {
    val scored = tokenBuckets(docs, idCol, textCol, nBuckets)
      .join(model, "bucket")
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_feats"), sum(col("n") * col("w_ppm")).as("sum_w"))
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        (coalesce(col("sum_w"), lit(0L)) + lit(priorPpm)).as("score_ppm"))
      .withColumn("pred", col("score_ppm") > 0)
  }
}
