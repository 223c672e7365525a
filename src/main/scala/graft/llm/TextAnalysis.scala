package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis pass over a documents table: one narrow scan producing
  * the full per-document feature row (token counts, quality, language,
  * fingerprint) in a single WholeStageCodegen span — no shuffles. */
object TextAnalysis {

  def analyze(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      length(t).as("n_chars"),
      tokenCount(t).as("n_tokens"),
      subwordCount(t).as("n_subwords"),
      punctCount(t).as("n_punct"),
      digitCount(t).as("n_digits"),
      stopwordCount(t).as("n_stopwords"),
      qualityScore(t).as("quality"),
      langId(t).as("lang_pred"),
      fingerprint(t).as("fp"))
  }

  /** Pairwise n-gram overlap F1 between each document and its successor
    * within a source — the sliding self-similarity audit that surfaces
    * serial near-duplication a crawl ordering produces (mirror runs,
    * paginated articles), and the same set-F1 the decontamination
    * literature reports for eval overlap. Pairing is the LEAD window
    * over ascending id per source, so the metric is a deterministic
    * total function of the data with exactly one row per non-last doc.
    *
    * Set semantics over distinct word `n`-grams (the [[shingleSet]]
    * contract, short docs collapse to their whole token sequence);
    * precision = |A∩B|/|A|, recall = |A∩B|/|B| as integer ppm floors,
    * F1 = (2·P·R) div (P+R) on those ppm integers — all engine-portable
    * integer arithmetic, no doubles anywhere.
    *
    * Scale shape: ONE window shuffle on (source, id) moving the thin
    * distinct-shingle arrays; the intersect/size/F1 chain is a
    * codegen'd map stage. No join, no explode. At 100 TB the cost is
    * the same as any per-source sort — and the window key is the
    * natural write order of a crawl, so AQE-era sort elision applies
    * when the table is bucketed by source.
    */
  def consecutiveOverlapF1(docs: DataFrame, idCol: String, textCol: String,
                           sourceCol: String, n: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col(idCol))
    val withSets = docs.select(col(sourceCol), col(idCol),
      shingleSet(col(textCol), n).as("__sa"))
      .withColumn("__b_id", lead(col(idCol), 1).over(w))
      .withColumn("__sb", lead(col("__sa"), 1).over(w))
      .filter(col("__b_id").isNotNull)
    val inter = size(array_intersect(col("__sa"), col("__sb")))
    withSets.select(
      col(sourceCol), col(idCol).as("a_id"), col("__b_id").as("b_id"),
      inter.cast("long").as("n_shared"),
      size(col("__sa")).cast("long").as("__na"),
      size(col("__sb")).cast("long").as("__nb"))
      .withColumn("p_ppm", expr("n_shared * 1000000 div __na"))
      .withColumn("r_ppm", expr("n_shared * 1000000 div __nb"))
      .withColumn("f1_ppm", expr(
        "CASE WHEN p_ppm + r_ppm = 0 THEN 0L ELSE (2 * p_ppm * r_ppm) div (p_ppm + r_ppm) END"))
      .drop("__na", "__nb")
  }

  /** Corpus-frequency rarity (the OOV / rare-token quality signal): per
    * document, how many token OCCURRENCES have corpus frequency ≤
    * `maxCount`, plus the integer-exact fraction in ppm
    * (`n_rare·10⁶ DIV n_tokens` — no doubles, so the oracle compare is
    * bit-stable by construction).
    *
    * Scale shape: two map-side-combined shuffles of the thin
    * (id, token, n) projection — document text never moves, and the
    * vocabulary join runs against the per-(doc, token) AGGREGATED form,
    * not the raw token stream. The vocabulary table itself is
    * Heaps-law-small relative to the corpus, so Catalyst/AQE broadcasts
    * it when it fits and hash-joins otherwise. */
  def rareTokenStats(docs: DataFrame, idCol: String, textCol: String,
                     maxCount: Long): DataFrame = {
    val pairs = docs
      .select(col(idCol).as("id"),
        explode(tokens(normalizeText(col(textCol)))).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("n"))
    val vocab = pairs.groupBy(col("tok")).agg(sum(col("n")).as("c"))
    pairs.join(vocab, "tok")
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(when(col("c") <= maxCount, col("n")).otherwise(lit(0L))).as("n_rare"))
      .select(col("id").as(idCol), col("n_tokens"), col("n_rare"),
        expr("n_rare * 1000000L DIV n_tokens").as("rare_frac_ppm"))
  }

  /** Unigram LM scoring (the CCNet-class perplexity quality signal,
    * arXiv:1911.00359, with the LM reduced to the corpus's own unigram
    * distribution): per document, the mean token log₂-probability —
    * low (very negative) means rare-token-heavy / off-distribution
    * text. Per-TOKEN scores are floored to ppm integers BEFORE the
    * per-document sum, so document scores are exact integer sums —
    * independent of partition count and merge order (a double sum
    * would drift by ulps across topologies). Same two thin map-side-
    * combined shuffles as [[rareTokenStats]]; the corpus text never
    * moves. */
  def unigramLogProbPpm(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    unigramLogProbPpmFromCensus(unigramCensus(docs, idCol, textCol), idCol)

  /** The per-document token census (id, tok, n) [[unigramLogProbPpm]]
    * scores from — the LM state an incremental curation deployment
    * PERSISTS: it is mergeable (a delta's census rows union in; the
    * corpus-level counts are a thin re-aggregate of the doc-term
    * frame, no text re-scan), and scoring any corpus snapshot from its
    * census is bit-identical to scoring from text (the frames are
    * equal by construction — pinned in TextAnalysisSpec). */
  def unigramCensus(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(tokens(normalizeText(col(textCol)))).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("n"))

  /** [[unigramLogProbPpm]]'s scoring tail over a persisted (or merged)
    * [[unigramCensus]] — the LM "model update" of an incremental
    * pipeline: corpus counts re-aggregate from the census (thin), and
    * every document re-scores under the updated distribution without
    * its text ever being re-tokenized. */
  def unigramLogProbPpmFromCensus(pairs: DataFrame, idCol: String): DataFrame = {
    val vocab = pairs.groupBy(col("tok")).agg(sum(col("n")).as("c"))
    val total = lit(vocab.agg(sum(col("c"))).collect()(0).getLong(0))
    // +1e-4 ppm guard before the floor, mirrored verbatim in the oracle
    // SQL: engines' double log2 agree to ~1e-8 ppm at this magnitude, so
    // the guard keeps both sides of the compare on the same floor when a
    // score lands within an ulp of an integer boundary, and is far too
    // small (1e-10 of a token's score) to merge genuinely distinct
    // scores. The floor convention is the cross-engine CONTRACT.
    val tokPpm = floor(log2(col("c").cast("double") / total.cast("double")) * 1e6 + 1e-4)
      .cast("long").as("lp_ppm")
    pairs.join(vocab, "tok")
      .select(col("id"), col("n"), tokPpm)
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_tokens"),
        sum(col("n") * col("lp_ppm")).as("sum_lp_ppm"))
      .select(col("id").as(idCol), col("n_tokens"),
        expr("sum_lp_ppm DIV n_tokens").as("avg_logprob_ppm"))
  }

  /** Bigram LM scoring with add-one smoothing — the context-aware step
    * up from [[unigramLogProbPpm]] (closer to the CCNet perplexity
    * signal's intent: a doc of common-but-incoherently-ordered tokens
    * scores well under a unigram LM and badly here): per document, the
    * mean log₂ P(w₂|w₁) over its token bigrams, with
    * P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁·)+V) — Laplace smoothing over the
    * corpus's own bigram counts, V = unigram vocabulary size. All
    * counts integer; per-bigram scores ppm-floored (same +1e-4 guard
    * contract as the unigram form) before the exact integer sums, so
    * output is partition-independent. Docs with < 2 tokens emit no row
    * (they have no bigram evidence).
    *
    * Scale shape: thin (id, w₁, w₂, n) projections shuffle; text never
    * moves. The bigram vocabulary is larger than the unigram one but
    * still Heaps-law-sublinear in the corpus; its join against the
    * aggregated per-doc counts is Catalyst's choice (broadcast when it
    * fits). One extra row of driver state: V. */
  def bigramLogProbPpm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def toks = tokens(normalizeText(col(textCol)))
    val nBg = greatest(size(toks) - 1, lit(0))
    val pairs = docs
      .select(col(idCol).as("id"),
        explode(zip_with(slice(toks, lit(1), nBg), slice(toks, lit(2), nBg),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("id"), col("w1"), col("w2")).agg(count(lit(1)).as("n"))
    val bgVocab = pairs.groupBy(col("w1"), col("w2")).agg(sum(col("n")).as("c12"))
    val ctx = bgVocab.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val v = lit(docs.select(explode(toks).as("tok"))
      .agg(count_distinct(col("tok"))).head().getLong(0))
    val lpPpm = floor(log2((col("c12") + lit(1L)).cast("double")
        / (col("c1") + v).cast("double")) * 1e6 + 1e-4)
      .cast("long").as("lp_ppm")
    pairs.join(bgVocab, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .select(col("id"), col("n"), lpPpm)
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_bigrams"),
        sum(col("n") * col("lp_ppm")).as("sum_lp_ppm"))
      .select(col("id").as(idCol), col("n_bigrams"),
        expr("sum_lp_ppm DIV n_bigrams").as("avg_logprob_ppm"))
  }

  /** TF-IDF keyword extraction: the top `k` terms per document by
    * tf·idf (raw term count × ln(N/df), the classic SMART "ntn"
    * weighting), the standard corpus-exploration / domain-tagging
    * signal. Scores are ppm-floored per (doc, term) — the shared +1e-4
    * boundary-guard contract — and never summed, so output is
    * partition-independent; rank ties break on the term string.
    *
    * Scale shape: the same two thin map-side-combined shuffles as
    * [[rareTokenStats]] (per-doc term counts, then document
    * frequencies), a join against the Heaps-law-small df table, and a
    * per-DOCUMENT window for the top-k — partitioned by doc id, sizes
    * bounded by per-doc vocabulary, never a global sort. N is one
    * driver-side long. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = docs
      .select(col(idCol).as("id"),
        explode(tokens(normalizeText(col(textCol)))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("n"))
    val df = pairs.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = lit(docs.select(col(idCol)).distinct().count())
    val scored = pairs.join(df, "term")
      .select(col("id"), col("term"),
        floor(col("n") * log(nDocs.cast("double") / col("df").cast("double"))
          * lit(1e6) + lit(1e-4)).cast("long").as("tfidf_ppm"))
    val rn = row_number().over(
      Window.partitionBy(col("id")).orderBy(col("tfidf_ppm").desc, col("term")))
    scored.withColumn("rank", rn.cast("long")).filter(col("rank") <= k)
      .select(col("id").as(idCol), col("term"), col("tfidf_ppm"), col("rank"))
  }

  /** Gopher-style quality rule bundle (Rae et al., arXiv:2112.11446
    * §A1.1, thresholds adapted to the corpus at hand): ordered rules,
    * FIRST failing rule is the recorded reason, keep = all pass. One
    * narrow codegen'd scan — every signal is a `TextFunctions` column
    * with an existing oracle twin; no shuffle, no UDF. */
  def gopherFilter(docs: DataFrame, idCol: String, textCol: String,
                   minTokens: Long = 25, maxTokens: Long = 100000,
                   minMeanWordLenPpm: Long = 4300000L,
                   maxMeanWordLenPpm: Long = 4700000L,
                   maxDup2GramPpm: Long = 50000L,
                   minStopwordHits: Long = 1): DataFrame = {
    val t = col(textCol)
    val base = docs.select(col(idCol),
      tokenCount(t).cast("long").as("n_tokens"),
      meanWordLenPpm(t).as("mean_word_len_ppm"),
      dupShingleFracPpm(t, 2).as("dup_2gram_ppm"),
      stopwordCount(t).cast("long").as("n_stopwords"))
    val reason = when(col("n_tokens") < minTokens, "too_short")
      .when(col("n_tokens") > maxTokens, "too_long")
      .when(col("mean_word_len_ppm") < minMeanWordLenPpm, "word_len_low")
      .when(col("mean_word_len_ppm") > maxMeanWordLenPpm, "word_len_high")
      .when(col("dup_2gram_ppm") > maxDup2GramPpm, "repetitive")
      .when(col("n_stopwords") < minStopwordHits, "no_stopwords")
      .otherwise("ok")
    base.withColumn("reason", reason)
      .withColumn("keep", col("reason") === "ok")
  }

  /** Phrases whose presence marks a page as boilerplate policy text
    * (the C4 cookie/policy rule). Shared with the oracle SQL generator
    * so rule edits can never desync the two engines. */
  val C4PolicyPhrases: Seq[String] =
    Seq("terms of use", "privacy policy", "cookie policy", "uses cookies")

  /** C4-style heuristic cleaning (Raffel et al., arXiv:1910.10683
    * §2.2) — the LINE-oriented sibling of the document-level
    * [[gopherFilter]]. Line rules (a line survives only if it passes
    * all three): ends in terminal punctuation (`. ! ? "`), has at
    * least `minLineWords` words, does not mention "javascript".
    * Page rules (ordered; FIRST failing rule is the recorded reason):
    * contains "lorem ipsum"; contains a curly brace; contains a
    * cookie/policy phrase ([[C4PolicyPhrases]]); fewer than
    * `minSentences` sentence delimiters (`. ! ?` occurrences in the
    * raw text); no surviving lines. `keep = reason == "ok"`; `text` in
    * the output is the surviving lines re-joined.
    *
    * Scale shape: one narrow codegen'd scan — the line split, the
    * per-line predicate, and the re-join are all higher-order ARRAY
    * functions on the text column (no explode, so no row blow-up and
    * no shuffle), and every page rule is a scalar predicate. At 100 TB
    * this is a pure map stage that fuses into whatever scan feeds it. */
  def c4Filter(docs: DataFrame, idCol: String, textCol: String,
               minLineWords: Int = 5, minSentences: Int = 3): DataFrame = {
    val t = col(textCol)
    val lt = lower(t)
    val lines = split(t, "\n")
    val kept = filter(lines, l =>
      trim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minLineWords &&
        !contains(lower(l), lit("javascript")))
    val nSentences =
      (length(t) - length(regexp_replace(t, "[.!?]", ""))).cast("long")
    val policyHit = C4PolicyPhrases.map(p => contains(lt, lit(p))).reduce(_ || _)
    val base = docs.select(col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_lines_kept"),
      nSentences.as("n_sentences"),
      contains(lt, lit("lorem ipsum")).as("_lorem"),
      contains(lt, lit("{")).as("_brace"),
      policyHit.as("_policy"),
      array_join(kept, "\n").as(textCol))
    val reason = when(col("_lorem"), "lorem_ipsum")
      .when(col("_brace"), "curly_brace")
      .when(col("_policy"), "policy")
      .when(col("n_sentences") < minSentences, "too_few_sentences")
      .when(col("n_lines_kept") === 0, "no_lines")
      .otherwise("ok")
    base.withColumn("reason", reason)
      .withColumn("keep", col("reason") === "ok")
      .drop("_lorem", "_brace", "_policy")
      .select(col(idCol), col("n_lines"), col("n_lines_kept"),
        col("n_sentences"), col("reason"), col("keep"), col(textCol))
  }
}
