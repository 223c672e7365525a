package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
  * distribution looks like a TARGET domain sample, by importance weight
  * log w(x) = Σ_b f_b(x)·(log p̂_target(b) − log p̂_raw(b)) over a fixed
  * B-bucket hashed bigram feature space, then Gumbel-top-k resampling.
  *
  * Everything is engine-portable and partitioning-independent:
  *  - buckets come from [[hashBucket]] (md5-based, no JVM seed),
  *  - both bucket distributions use add-one smoothing and their log-
  *    ratio is floored to ppm integers per BUCKET (the same +1e-4
  *    boundary-guard contract as [[TextAnalysis.unigramLogProbPpm]]),
  *    so per-document weights are exact integer sums,
  *  - the Gumbel perturbation is derived from the document id's md5
  *    (−ln(−ln(u)), u ∈ (0,1) from 48 md5 bits), not an RNG — the
  *    selected set is reproducible across reruns and engines.
  *
  * Scale shape: document text is scanned once into the thin
  * (id, bucket, n) projection (map-side combined); both distribution
  * tables are ≤ B rows — driver/broadcast-sized BY CONSTRUCTION no
  * matter how large the corpus (that is the point of feature hashing) —
  * so scoring is a broadcast join against the corpus's aggregated
  * bucket counts, and the final top-k is Spark's TakeOrderedAndProject
  * (per-partition heaps + driver merge of k rows, no global sort). The
  * target sample is typically small (a curated domain set), mirroring
  * the reference's pattern of a small curated side driving a big scan
  * (/root/reference/second_lambda_function.py:44-88 gates a large load
  * with a small control table the same way). */
object Dsir {

  /** Per-document hashed-bigram bucket counts: (id, bucket, n). */
  def bucketCounts(docs: DataFrame, idCol: String, textCol: String,
                   nBuckets: Int): DataFrame = {
    def toks = tokens(normalizeText(col(textCol)))
    val nBg = greatest(size(toks) - 1, lit(0))
    docs.select(col(idCol).as("id"),
        explode(zip_with(slice(toks, lit(1), nBg), slice(toks, lit(2), nBg),
          (a, b) => concat(a, lit(" "), b))).as("feat"))
      .select(col("id"), hashBucket(col("feat"), nBuckets).as("bucket"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("n"))
  }

  /** The ppm-floored per-bucket log-ratio table
    * Δ(b) = ⌊(ln p̂_tgt(b) − ln p̂_raw(b))·10⁶ + 1e-4⌋ for every bucket
    * PRESENT in the raw corpus (absent buckets can never be referenced
    * by a corpus document). ≤ B rows — the persistable "importance
    * model": train once on a corpus snapshot, reuse against any delta
    * (the incremental-index pattern of [[Dedup.minHashBandIndex]]). */
  def importanceModel(corpus: DataFrame, target: DataFrame,
                      idCol: String, textCol: String, nBuckets: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val raw = bucketCounts(corpus, idCol, textCol, nBuckets)
      .groupBy(col("bucket")).agg(sum(col("n")).as("c_raw"))
    val tgt = bucketCounts(target, idCol, textCol, nBuckets)
      .groupBy(col("bucket")).agg(sum(col("n")).as("c_tgt"))
    // ONE job collects the ≤ B-row joined bucket table; the totals and
    // ppm floors are then driver arithmetic (bounded by construction —
    // the point of feature hashing), instead of two extra corpus-scan
    // jobs for the scalar totals. math.log here and Spark's log codegen
    // are the same java.lang.Math.log; the shared +1e-4 guard absorbs
    // any cross-ENGINE ulp vs the oracle either way.
    val buckets = raw.join(tgt, Seq("bucket"), "left")
      .select(col("bucket"), col("c_raw"), coalesce(col("c_tgt"), lit(0L)).as("c_tgt"))
      .as[(Long, Long, Long)].collect()
    val nRaw = buckets.map(_._2).sum
    val nTgt = buckets.map(_._3).sum
    buckets.toSeq.map { case (b, cr, ct) =>
      (b, math.floor((math.log((ct + 1).toDouble / (nTgt + nBuckets).toDouble)
        - math.log((cr + 1).toDouble / (nRaw + nBuckets).toDouble)) * 1e6 + 1e-4).toLong)
    }.toDF("bucket", "w_ppm")
  }

  /** Per-document integer importance weights against a trained model:
    * (id, n_feats, logw_ppm). `model` is the ≤ B-row output of
    * [[importanceModel]] — Catalyst broadcasts it. */
  def importanceWeights(docs: DataFrame, model: DataFrame,
                        idCol: String, textCol: String, nBuckets: Int): DataFrame =
    bucketCounts(docs, idCol, textCol, nBuckets)
      .join(model, "bucket")
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_feats"),
        sum(col("n") * col("w_ppm")).as("logw_ppm"))

  /** Deterministic Gumbel(0,1) perturbation from a key's md5: u from 48
    * bits (+½ to stay inside (0,1)), g = −ln(−ln u), ppm-floored with
    * the shared boundary guard. */
  private[llm] def gumbelPpm(key: Column): Column = {
    val u = (conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("double")
      + lit(0.5)) / lit(281474976710656.0) // 2^48
    floor(-log(-log(u)) * lit(1e6) + lit(1e-4)).cast("long")
  }

  /** Gumbel-top-k importance resampling (the paper's §2.3 sampler, made
    * deterministic): key = logw_ppm + gumbel_ppm(id); keep the k largest
    * keys. Returns (id, n_feats, logw_ppm, key_ppm) ordered by key desc,
    * id asc. */
  def select(corpus: DataFrame, target: DataFrame, idCol: String, textCol: String,
             nBuckets: Int, k: Int): DataFrame = {
    val model = importanceModel(corpus, target, idCol, textCol, nBuckets)
    importanceWeights(corpus, model, idCol, textCol, nBuckets)
      .select(col("id").as(idCol), col("n_feats"), col("logw_ppm"),
        (col("logw_ppm") + gumbelPpm(col("id"))).as("key_ppm"))
      .orderBy(col("key_ppm").desc, col(idCol))
      .limit(k)
  }
}
