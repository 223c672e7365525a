package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination: find (and scrub) training documents that
  * share word n-grams with an evaluation/benchmark set — the standard
  * defense against test-set leakage in LLM training corpora (n-gram
  * overlap decontamination, e.g. GPT-3 §2.2 / PaLM app. — 8-to-13-gram
  * matches flag a document as contaminated).
  *
  * Scale shape (the part that matters at 100 TB): the benchmark side is
  * SMALL by construction (eval suites are thousands of documents, not
  * billions) — but its EXPLODED (bench_id, gram) rows are not: a
  * realistic suite explodes to millions of rows, past any broadcast
  * budget. So the corpus-side scan is prefiltered with only the
  * DISTINCT gram strings (one deduped column — the smallest object that
  * decides membership): one codegen'd pass over the corpus grams, no
  * corpus shuffle. The prefilter itself is size-guarded by a cheap
  * bench-side probe (count + summed gram length), because a forced
  * `broadcast()` hint bypasses `autoBroadcastJoinThreshold` entirely
  * and a pathological suite could still blow the driver: under the
  * budget the gram set broadcasts verbatim as a semi-join; over it the
  * prefilter degrades to a broadcast BLOOM FILTER of the gram set
  * (~1.2 MB per million grams at 1% fpp vs the strings themselves),
  * whose false positives are scrubbed by the stage-2 inner join — the
  * corpus still never shuffles, at any bench size. The survivors —
  * corpus grams that actually occur in the benchmark, typically a
  * vanishing fraction — then join the exploded bench rows for
  * per-(doc, bench) counting; that join is left to Catalyst and is
  * free to shuffle, because both of its inputs are small relative to
  * the corpus. Cost is linear in corpus tokens with no wide exchange
  * of the corpus; there is no all-pairs anything, and nothing forces
  * the exploded bench rows into a broadcast.
  *
  * N-grams come from the same native shingle expression the dedup
  * family uses ([[graft.functions.expr.WordShingles]] over normalized
  * whitespace tokens, distinct per document; documents shorter than n
  * tokens contribute their whole token sequence as one shingle), so
  * "shared grams" has one definition engine-wide.
  */
object Decontaminate {

  /** Default in-memory budget for broadcasting the distinct gram set
    * verbatim; above it the prefilter switches to a bloom filter. Far
    * under Spark's 8 GB broadcast hard cap — the gram set is held on
    * the driver AND every executor, so conservative is right. */
  val DefaultGramBroadcastBudget: Long = 256L << 20

  /** The persistable decontamination index: the DISTINCT n-gram set of
    * a benchmark suite, one `gram` column. Build it once when the suite
    * changes, `write.parquet` it, and scrub every later corpus batch
    * (or micro-batch — [[graft.streaming.DecontaminateStream]]) against
    * the saved table instead of re-shingling the benchmark per run —
    * the same persisted-index pattern as [[Dedup.fingerprintIndex]] /
    * [[Dedup.minHashBandIndex]]. */
  def benchGramIndex(bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame =
    bench.select(explode(TextFunctions.shingleSet(col(benchTextCol), n)).as("gram"))
      .distinct()

  /** Estimated in-memory broadcast footprint of a distinct gram set:
    * (row count, UTF-16 payload + ~48 B object/entry overhead). One
    * cheap bench-side aggregate. */
  private def gramSetFootprint(gramSet: DataFrame): (Long, Long) = {
    val probe = gramSet
      .agg(count(lit(1)), coalesce(sum(length(col("gram"))), lit(0L))).head()
    (probe.getLong(0), probe.getLong(1) * 2L + probe.getLong(0) * 48L)
  }

  /** Per-document count of distinct n-grams shared with the UNION of a
    * benchmark gram set — the membership form used for scrubbing, where
    * WHICH bench doc leaked doesn't matter (contrast [[overlapPairs]],
    * which attributes per (doc, bench) pair; for `minShared = 1` the
    * flagged-doc sets coincide). `gramIndex` must be a distinct-gram
    * table as produced by [[benchGramIndex]] — typically read back from
    * parquet. Output: (doc_id, n_shared_grams).
    *
    * Scale shape: same as [[overlapPairs]] stage 1 — the corpus never
    * shuffles. Under the broadcast budget the gram set semi-joins
    * verbatim; over it a broadcast bloom prefilter thins the corpus
    * grams first and the (tiny) survivor set is then exact-checked with
    * an unforced semi-join against the gram table, so bloom false
    * positives never reach the counts at any bench size. */
  def overlapGramCount(docs: DataFrame, docIdCol: String, docTextCol: String,
                       gramIndex: DataFrame, n: Int = 8,
                       gramBroadcastBudget: Long = DefaultGramBroadcastBudget): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val docGrams = docs.select(col(docIdCol).as("doc_id"),
      explode(TextFunctions.shingleSet(col(docTextCol), n)).as("gram"))
    val gramSet = gramIndex.select(col("gram"))
    val (nGrams, estBytes) = gramSetFootprint(gramSet)
    val matched =
      if (nGrams == 0L || estBytes <= gramBroadcastBudget)
        docGrams.join(broadcast(gramSet), Seq("gram"), "left_semi")
      else {
        val bf = gramSet.stat.bloomFilter("gram", nGrams, 0.01)
        val bfBc = docs.sparkSession.sparkContext.broadcast(bf)
        docGrams.filter(graft.functions.expr.BloomMightContain(col("gram"), bfBc))
          .join(gramSet, Seq("gram"), "left_semi")
      }
    matched.groupBy("doc_id").agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Span-level decontamination: remove ONLY the n-token windows that
    * appear in the benchmark gram index, keeping the rest of the
    * document — the data-preserving alternative to
    * [[scrubAgainstGramIndex]]'s whole-doc drop (at 100 TB most
    * contaminated docs carry one leaked paragraph; dropping the doc
    * wastes the rest). Documents shorter than `n` tokens contribute
    * their whole-text shingle (the
    * [[graft.functions.TextFunctions.shingleSet]] short-text contract,
    * so doc and bench sides agree) and scrub to empty when matched.
    * Output (docIdCol, n_tokens, n_removed, clean_text) over the
    * normalized token stream, one row per input doc; clean documents
    * pass through verbatim.
    *
    * Scale shape: the thin (id, pos, gram) window projection LEFT-SEMI
    * joins the gram index, so only matched windows move on; the
    * covered-position union is per-document (bounded by doc length,
    * one collect_set aggregation keyed by id); text is rebuilt once by
    * a codegen'd index filter — [[graft.llm.Dedup.scrubDupSpans]]'s
    * machinery pointed at benchmark contamination instead of
    * duplication. */
  def scrubContaminatedSpans(docs: DataFrame, docIdCol: String, docTextCol: String,
                             gramIndex: DataFrame, n: Int = 8): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val base = docs.select(col(docIdCol).as("id"),
        TextFunctions.tokens(TextFunctions.normalizeText(col(docTextCol))).as("tk"))
      .select(col("id"), col("tk"), size(col("tk")).as("nt"))
    val wins = base.select(col("id"), col("nt"),
      posexplode(when(col("nt") >= n,
        transform(sequence(lit(0), col("nt") - n),
          i => concat_ws(" ", slice(col("tk"), i + 1, lit(n)))))
        .otherwise(when(col("nt") > 0, array(concat_ws(" ", col("tk"))))
          .otherwise(array()))).as(Seq("pos", "gram")))
    val covered = wins.join(gramIndex.select(col("gram")), Seq("gram"), "left_semi")
      .select(col("id"),
        explode(sequence(col("pos"),
          least(col("pos") + lit(n - 1), col("nt") - 1))).as("p"))
      .groupBy(col("id"))
      .agg(sort_array(collect_set(col("p"))).as("cov"))
    base.join(covered, Seq("id"), "left")
      .select(col("id"), col("nt"),
        when(col("cov").isNull, col("tk"))
          .otherwise(filter(col("tk"), (t, i) => !array_contains(col("cov"), i)))
          .as("kept"))
      .select(col("id").as(docIdCol), col("nt").cast("long").as("n_tokens"),
        (col("nt") - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }

  /** The clean corpus against a prebuilt gram index: documents sharing
    * fewer than `minShared` distinct n-grams with the benchmark union
    * (anti-join on the flagged id set; docs pass through untouched).
    * The batch kernel of [[graft.streaming.DecontaminateStream]]. */
  def scrubAgainstGramIndex(docs: DataFrame, docIdCol: String, docTextCol: String,
                            gramIndex: DataFrame, n: Int = 8, minShared: Int = 1,
                            gramBroadcastBudget: Long = DefaultGramBroadcastBudget): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val flagged = overlapGramCount(docs, docIdCol, docTextCol, gramIndex, n, gramBroadcastBudget)
      .filter(col("n_shared_grams") >= minShared)
      .select(col("doc_id"))
    docs.join(flagged, docs(docIdCol) === flagged("doc_id"), "left_anti")
  }

  /** (doc, bench) pairs sharing at least `minShared` distinct n-grams,
    * with the shared-gram count. Both id columns pass through under
    * their own names (aliased to `doc_id` / `bench_id`).
    *
    * Note: unlike most operators here this one runs a small eager
    * action at build time (the bench-side size probe, plus the bloom
    * build when over budget) — both touch only the bench side, never
    * the corpus. */
  def overlapPairs(docs: DataFrame, docIdCol: String, docTextCol: String,
                   bench: DataFrame, benchIdCol: String, benchTextCol: String,
                   n: Int = 8, minShared: Int = 1,
                   gramBroadcastBudget: Long = DefaultGramBroadcastBudget): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val docGrams = docs.select(col(docIdCol).as("doc_id"),
      explode(TextFunctions.shingleSet(col(docTextCol), n)).as("gram"))
    val benchGrams = bench.select(col(benchIdCol).as("bench_id"),
      explode(TextFunctions.shingleSet(col(benchTextCol), n)).as("gram"))
    // Stage 1 — membership prefilter over only the deduped gram strings
    // (not the exploded (bench_id, gram) rows, which can be orders of
    // magnitude larger). Either form keeps exactly the corpus grams
    // that might occur in the benchmark; the corpus never shuffles.
    val benchGramSet = benchGrams.select(col("gram")).distinct()
    // Size probe: estimated in-memory footprint of the broadcast map
    // (UTF-16 payload + ~48 B object/entry overhead). One cheap
    // bench-side aggregate — the bench is small relative to the corpus
    // by construction, so the extra job is noise.
    val probe = benchGramSet
      .agg(count(lit(1)), coalesce(sum(length(col("gram"))), lit(0L))).head()
    val nGrams = probe.getLong(0)
    val estBytes = probe.getLong(1) * 2L + nGrams * 48L
    val survivors =
      if (nGrams == 0L || estBytes <= gramBroadcastBudget)
        docGrams.join(broadcast(benchGramSet), Seq("gram"), "left_semi")
      else {
        // Over budget: broadcast a bloom filter of the gram set instead
        // of the strings (orders of magnitude smaller). Its false
        // positives survive this filter but are dropped by the stage-2
        // inner join below (a gram not in the bench matches no bench
        // row), so results are identical — only the prefilter's
        // selectivity degrades, by fpp.
        val bf = benchGramSet.stat.bloomFilter("gram", nGrams, 0.01)
        val bfBc = docs.sparkSession.sparkContext.broadcast(bf)
        docGrams.filter(graft.functions.expr.BloomMightContain(col("gram"), bfBc))
      }
    // Stage 2 — attribution: join the (tiny) survivor set against the
    // exploded bench rows to recover WHICH bench doc each gram came
    // from. No broadcast is forced — Catalyst may shuffle both sides,
    // which is fine: both are bench-suite-sized, not corpus-sized.
    // shingleSet is distinct per document on BOTH sides, so each join
    // row is one distinct shared gram — count(1) == distinct overlap
    survivors.join(benchGrams, Seq("gram"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }

  /** The clean corpus: documents NOT flagged against any benchmark doc
    * (anti-join on the flagged id set — docs pass through untouched,
    * original schema preserved). */
  def scrub(docs: DataFrame, docIdCol: String, docTextCol: String,
            bench: DataFrame, benchIdCol: String, benchTextCol: String,
            n: Int = 8, minShared: Int = 1,
            gramBroadcastBudget: Long = DefaultGramBroadcastBudget): DataFrame = {
    val flagged = overlapPairs(docs, docIdCol, docTextCol,
      bench, benchIdCol, benchTextCol, n, minShared, gramBroadcastBudget)
      .select(col("doc_id")).distinct()
    docs.join(flagged, docs(docIdCol) === flagged("doc_id"), "left_anti")
  }

  /** Semantic decontamination: corpus documents whose EMBEDDING is
    * near an evaluation-set embedding (cosine ≥ `minCos`) — catches the
    * paraphrased/translated leakage that n-gram overlap misses (the
    * embedding analog of [[overlapPairs]]). The eval set is small by
    * construction and broadcasts; the corpus scans once and never
    * shuffles — same 100 TB posture as the n-gram path. Norms are
    * hoisted out of the pair stage. Output: (doc_id, bench_id,
    * cos_sim), one row per contaminated (corpus, eval) pair. */
  def semanticOverlapPairs(corpus: DataFrame, evalSet: DataFrame,
                           idCol: String, vecCol: String,
                           minCos: Double): DataFrame = {
    import graft.functions.VectorFunctions.{cosineWithNorms, dot, norm}
    val c = corpus.select(col(idCol).as("doc_id"), col(vecCol).as("c_v"),
      norm(col(vecCol)).as("c_n"))
    val e = evalSet.select(col(idCol).as("bench_id"), col(vecCol).as("e_v"),
      norm(col(vecCol)).as("e_n"))
    c.crossJoin(broadcast(e))
      .withColumn("cos", cosineWithNorms(dot(col("c_v"), col("e_v")), col("c_n"), col("e_n")))
      .filter(col("cos") >= minCos)
      .select(col("doc_id"), col("bench_id"), col("cos").as("cos_sim"))
  }

  /** Cross-source contamination matrix: for every pair of sources, the
    * number of DISTINCT word `n`-grams they share — the audit that
    * finds which corpus slices duplicate each other (mirror sites,
    * scraped re-posts, a benchmark leaked into a crawl slice) before
    * mixture weights are chosen. Full-document fingerprints miss this
    * (near-identical docs hash differently); shared long n-grams are
    * the standard overlap signal at partial-duplication granularity.
    *
    * Scale shape: the corpus collapses to the DISTINCT (source,
    * gram-md5) census — a thin wide shuffle, text itself never moves —
    * then a self-equi-join on the gram hash. Spark does not reuse the
    * census subplan across the two join sides, so the corpus is scanned
    * and aggregated twice; for repeated audits write the census to
    * parquet once per corpus version and self-join that (the same
    * offline-index pattern as [[graft.llm.Retrieval.postings]]).
    * Per-gram fan-out is
    * C(k, 2) for a gram present in k sources, bounded by the SOURCE
    * count (a mixture has tens of sources, not millions); the output is
    * at most C(nSources, 2) rows. No cross join, no driver state.
    */
  def crossSourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
                         n: Int = 8): DataFrame = {
    val census = docs
      .select(col(srcCol).as("__src"),
        explode(TextFunctions.shingleSet(col(textCol), n)).as("__gram"))
      .select(col("__src"), md5(col("__gram")).as("__gfp"))
      .distinct()
    census.as("a").join(census.as("b"),
        col("a.__gfp") === col("b.__gfp") && col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src"), col("b.__src"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("a.__src").as("src_a"), col("b.__src").as("src_b"), col("n_shared"))
  }
}
