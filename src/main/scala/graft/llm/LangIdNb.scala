package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.normalizeText

/** Trainable character-n-gram language identifier — multinomial Naive
  * Bayes over hashed char-n-gram features (the fastText-class model,
  * arXiv:1607.01759, reduced to closed-form counting like
  * [[Classifier]]). Unlike [[graft.functions.TextFunctions.langId]]'s
  * marker-word heuristic (6 fixed languages, ASCII function words),
  * this learns from any labeled sample, covers whatever languages the
  * sample carries, and separates on sub-word evidence (accents,
  * orthography) where marker words never fire.
  *
  * ppm contract: with add-one smoothing the log-likelihood of bucket b
  * under language L splits as ln P̂(b|L) = ln(c+1) − ln(T_L + B), so a
  * document's score decomposes into
  *
  *   score(d, L) = prior_ppm(L) + n_grams(d) · base_ppm(L)
  *                 + Σ_b n_b(d) · w_ppm(L, b)
  *
  * with w_ppm = ⌊ln(c+1)·10⁶ + 1e-4⌋ (zero for unseen buckets — the
  * sparsity that keeps the model table small), base_ppm =
  * ⌊−ln(T_L + B)·10⁶ + 1e-4⌋ and prior_ppm = ⌊ln(n_L/n)·10⁶ + 1e-4⌋.
  * Every term is a floored integer, so scores are exact integer sums —
  * partition-independent and mirrored bit-for-bit by the DuckDB oracle.
  *
  * Scale shape: training aggregates the thin (lang, bucket) projection
  * — map-side combined, ≤ nLangs·B rows collected once (bounded
  * control-plane, the [[Classifier.nbTrain]] pattern). Classification
  * joins per-doc bucket counts against the broadcastable model and
  * argmaxes over a per-doc window; document text never shuffles. */
object LangIdNb {

  /** Marker bucket ids for the per-language constant rows in the model
    * table (real feature buckets are ≥ 0). */
  val BaseBucket: Long = -1L
  val PriorBucket: Long = -2L

  /** Character n-grams of the normalized text as an array column
    * (empty when the text is shorter than n). Native expression
    * ([[graft.functions.expr.CharNGrams]]) — the composed
    * transform/substr form re-evaluated the normalization regex once
    * PER GRAM (22 s of the original 34 s t94 wall at sf0.1). */
  def charGrams(c: Column, n: Int): Column =
    graft.functions.expr.CharNGrams(normalizeText(c), n)

  private def bucketOf(gram: Column, nBuckets: Int): Column =
    graft.functions.expr.Md5Bucket(gram, nBuckets)

  /** Per-document hashed char-n-gram bucket counts: (id, bucket, n). */
  def charGramBuckets(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, nBuckets: Int): DataFrame =
    docs.select(col(idCol).as("id"), explode(charGrams(col(textCol), n)).as("g"))
      .select(col("id"), bucketOf(col("g"), nBuckets).as("bucket"))
      .groupBy(col("id"), col("bucket")).agg(count(lit(1)).as("n"))

  /** Train on (text, language) rows: returns the model table
    * (lang, bucket, w_ppm) — seen-bucket weights at bucket ≥ 0 plus the
    * per-language [[BaseBucket]]/[[PriorBucket]] constant rows. ONE
    * counting job collects the ≤ nLangs·B bucket table; totals, priors
    * and floors are driver arithmetic (same java.lang.Math.log as
    * Spark's codegen'd log — the shared cross-engine convention). */
  def train(labeled: DataFrame, textCol: String, langCol: String,
            n: Int, nBuckets: Int): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val cls = labeled
      .select(col(langCol).as("lang"), explode(charGrams(col(textCol), n)).as("g"))
      .select(col("lang"), bucketOf(col("g"), nBuckets).as("bucket"))
      .groupBy(col("lang"), col("bucket")).agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect()
    require(cls.nonEmpty, "training sample produced no char-grams")
    val totals = cls.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val docCounts = labeled.groupBy(col(langCol).as("lang"))
      .agg(count(lit(1)).as("nd")).as[(String, Long)].collect().toMap
    val nDocs = docCounts.values.sum
    def ppm(x: Double): Long = math.floor(x * 1e6 + 1e-4).toLong
    val weightRows = cls.toSeq.map { case (lang, b, c) =>
      (lang, b, ppm(math.log((c + 1).toDouble)))
    }
    val constRows = totals.keys.toSeq.sorted.flatMap { lang =>
      Seq(
        (lang, BaseBucket, ppm(-math.log((totals(lang) + nBuckets).toDouble))),
        (lang, PriorBucket,
          ppm(math.log(docCounts(lang).toDouble / nDocs.toDouble))))
    }
    (weightRows ++ constRows).toDF("lang", "bucket", "w_ppm")
  }

  /** Score every document against a trained model and keep the argmax
    * language: (id, pred_lang, score_ppm). Ties break on the
    * lexicographically smallest language; documents with no char-grams
    * score every language at its prior, so they predict the majority
    * training language (document if that matters — or filter short
    * docs upstream).
    *
    * Plan note: the per-language constant fan-out (every doc row ×
    * every lang's base/prior) plans as a BroadcastNestedLoopJoin whose
    * build side is the ≤ nLangs-row constant table — bounded
    * control-plane state, the intended mechanism for an all-langs
    * fan-out (this is NOT an unbounded cartesian; the corpus side
    * streams through once). */
  def classify(docs: DataFrame, model: DataFrame, idCol: String,
               textCol: String, n: Int, nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val consts = model.filter(col("bucket") === BaseBucket)
      .select(col("lang"), col("w_ppm").as("base_ppm"))
      .join(model.filter(col("bucket") === PriorBucket)
        .select(col("lang"), col("w_ppm").as("prior_ppm")), "lang")
    val gb = charGramBuckets(docs, idCol, textCol, n, nBuckets)
    val seen = gb.join(model.filter(col("bucket") >= 0), "bucket")
      .groupBy(col("id"), col("lang"))
      .agg(sum(col("n") * col("w_ppm")).as("sw"))
    val base = docs.select(col(idCol).as("id"),
        greatest(length(normalizeText(col(textCol))) - lit(n - 1), lit(0))
          .cast("long").as("n_grams"))
      .withColumn("one", lit(1))
      .join(consts.withColumn("one", lit(1)), "one").drop("one")
    val scored = base.join(seen, Seq("id", "lang"), "left")
      .select(col("id"), col("lang"),
        (col("prior_ppm") + col("n_grams") * col("base_ppm")
          + coalesce(col("sw"), lit(0L))).as("score_ppm"))
    val rn = row_number().over(Window.partitionBy(col("id"))
      .orderBy(col("score_ppm").desc, col("lang").asc))
    scored.withColumn("r", rn).filter(col("r") === 1)
      .select(col("id").as(idCol), col("lang").as("pred_lang"), col("score_ppm"))
  }

  /** Column-signature scorer over a COLLECTED model — the production
    * drop-in for [[graft.functions.TextFunctions.langId]]: weights
    * become codegen literals (bounded: the model is ≤ nLangs·B rows by
    * construction), so the returned Column inlines into any projection
    * with no join and no shuffle — the [[Similarity]] ADC-literal
    * pattern. Semantics identical to [[classify]]'s pred_lang (pinned
    * by spec). */
  def langIdColumn(model: Array[(String, Long, Long)], n: Int, nBuckets: Int)(
      c: Column): Column = {
    require(model.nonEmpty, "empty model")
    val langs = model.map(_._1).distinct.sorted
    val consts = model.filter(_._2 < 0)
      .map { case (l, b, w) => (l, b) -> w }.toMap
    val grams = charGrams(c, n)
    val buckets = transform(grams, g => bucketOf(g, nBuckets))
    val nGrams = size(grams).cast("long")
    val scores = langs.map { lang =>
      val wMap = model.collect { case (`lang`, b, w) if b >= 0 => b -> w }.toMap
      val seenSum =
        if (wMap.isEmpty) lit(0L)
        else aggregate(buckets, lit(0L),
          (acc, b) => acc + coalesce(element_at(typedLit(wMap), b), lit(0L)))
      lang -> (lit(consts((lang, PriorBucket))) + nGrams * lit(consts((lang, BaseBucket)))
        + seenSum)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // ties → lexicographically smallest lang: fold from the LAST lang so
    // earlier (smaller) languages overwrite on equality
    scores.reverse.foldLeft(lit(scores.last._1)) { case (acc, (lang, sc)) =>
      when(sc === best, lit(lang)).otherwise(acc)
    }
  }
}
