package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** BM25 full-text retrieval over a distributed inverted index — the
  * corpus-exploration / seed-expansion primitive of a training-data
  * pipeline (find documents like these eval prompts, pull documents
  * for a domain query set).
  *
  * Engine-portability contract: per-(query, term, doc) BM25
  * contributions are ppm-floored (with the shared +1e-4 boundary
  * guard that absorbs cross-engine `ln` ulp divergence — the
  * unigramLogProbPpm convention) BEFORE the per-(query, doc) sum, so
  * document scores are exact integer sums, independent of partition
  * count and merge order. The float constants derived from (k1, b)
  * are propagated into the oracle SQL via `Double.toString` (shortest
  * round-trip form), so both engines evaluate the identical doubles.
  */
object Retrieval {

  /** The (doc_id, term, tf) postings list — the inverted index in its
    * set-oriented form. Thin: text explodes into tokens but is
    * immediately aggregated per (doc, term) with map-side combine. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(normalizeText(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  /** Incremental index maintenance: doc-level upsert of a delta batch's
    * postings (as produced by [[postings]] over the delta docs alone)
    * into a persisted corpus index. Documents re-uploaded in the delta
    * replace their old postings wholesale (anti-join on doc_id); new
    * documents append. Equal by construction to rebuilding [[postings]]
    * over the updated corpus (pinned by RetrievalSpec and t110).
    *
    * Scale shape: the delta's doc-id set is batch-sized, so it
    * broadcasts and the corpus index is NEVER re-tokenized or
    * re-shuffled — one streaming anti-join scan plus a union. The
    * df/dl side tables need no separate maintenance: [[bm25TopKFromIndex]]
    * re-aggregates both from the thin merged index, never from text.
    * This is the reference's incremental-load contract
    * (`second_lambda_function.py:64-66` — process only what the
    * watermark says is new) applied to the inverted index. */
  def mergePostings(index: DataFrame, deltaPost: DataFrame): DataFrame =
    graft.operators.Relational.mergeReplaceGroups(index, deltaPost, Seq("doc_id"))

  /** [[mergePostings]] from the delta DOCUMENTS rather than their
    * postings: the displaced doc-id set is the delta's full id set, so
    * a re-upload that tokenizes to ZERO terms (empty/NULL text) still
    * deletes its old postings — [[mergePostings]] alone cannot express
    * that (a zero-term doc contributes no rows, hence no key, and its
    * ghost postings would survive every merge). This form upholds the
    * merge == rebuild contract unconditionally (RetrievalSpec pins the
    * empty-re-upload case). */
  def mergePostingsForDelta(index: DataFrame, delta: DataFrame,
                            idCol: String, textCol: String): DataFrame =
    graft.operators.Relational.mergeReplaceGroups(
      index, postings(delta, idCol, textCol), Seq("doc_id"),
      Some(delta.select(col(idCol).as("doc_id"))))

  /** BM25 top-k: for each query, the `k` best documents by
    * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with the
    * Lucene non-negative idf ln((N − df + 0.5)/(df + 0.5) + 1); ties
    * break on doc id. Scores are summed as ppm integers (see object
    * doc); `rank` is a per-query row_number (1..k, gap-free — the
    * doc-id tie-break makes it deterministic).
    *
    * Scale shape: the corpus text is read once into the thin postings
    * projection; `df`/`dl` are Heaps-law-small / one-row-per-doc side
    * tables joined back at Catalyst's discretion (broadcast when they
    * fit); the distinct query-term table is tiny and broadcasts. The
    * only wide shuffle is the per-(query, doc) score aggregation,
    * whose size is bounded by matched postings — never |Q|·|corpus|.
    * The top-k is a per-QUERY window, no global sort. N and the token
    * total are the two driver-side longs. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, qTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKFromIndex(postings(docs, idCol, textCol),
      queries, qIdCol, qTextCol, k, k1, b)

  /** [[bm25TopK]] over a PREBUILT postings index (as produced by
    * [[postings]] — typically written to parquet once per corpus
    * version and read back, the [[Dedup.fingerprintIndex]] /
    * [[Decontaminate.benchGramIndex]] persisted-index pattern).
    *
    * Why this split matters at 100 TB: the inline form derives
    * postings, document lengths, AND document frequencies from the
    * same raw-text plan, so Spark tokenizes and shuffles the corpus
    * THREE times (no common-subplan reuse across different aggregation
    * keys). With a parquet-resident index the tokenize+explode runs
    * once at build time; every later query set (and there are many per
    * corpus version) re-reads only the compact columnar (doc_id, term,
    * tf) table — and the df/dl side aggregations scan that instead of
    * raw text. */
  def bm25TopKFromIndex(post: DataFrame,
                        queries: DataFrame, qIdCol: String, qTextCol: String,
                        k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val dl = post.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // coalesce: sum(dl) is NULL on an empty corpus. With nDocs = 0 the
    // postings side is empty, so the joins below produce the correct
    // empty result — the max(1) divisor guard only keeps the literal
    // constants finite on that path.
    val (nDocs, totalTokens) = {
      val r = dl.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
      (r.getLong(0), math.max(r.getLong(1), 1L))
    }
    bm25Rank(post, dl, nDocs, totalTokens,
      queryTerms(queries, qIdCol, qTextCol), k, k1, b)
  }

  /** The distinct (query_id, term) probe table — tiny, broadcastable. */
  private def queryTerms(queries: DataFrame, qIdCol: String, qTextCol: String): DataFrame =
    queries.select(col(qIdCol).as("query_id"),
        explode(tokens(normalizeText(col(qTextCol)))).as("term"))
      .distinct()

  /** The scoring core shared by the flat and pruned index paths.
    * `post` may be the full index or any subset containing EVERY row of
    * every query term (per-term df is computed from it, so partial
    * per-term postings would skew idf — the [[graft.sources.PrunedIndex]]
    * completeness contract).
    *
    * Probed shape: the index is semi-joined to the distinct probed
    * terms BEFORE df aggregation, so the df shuffle carries only the
    * probed terms' rows instead of dfs for every term nobody asked
    * about (the earlier form aggregated over the full index — a
    * corpus-wide shuffle that dominated the 10× query wall). df stays a
    * map-side-combined AGGREGATE, not a per-term count window: the
    * probe terms are each document's lead tokens, i.e. the corpus's
    * hottest terms, and a window would hand each hot term's postings to
    * one task (skew stall) where the partial aggregate shrinks them in
    * place. */
  private def bm25Rank(post: DataFrame, dl: DataFrame, nDocs: Long, totalTokens: Long,
                       qTerms: DataFrame, k: Int, k1: Double, b: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probed = post.join(broadcast(qTerms.select(col("term")).distinct()),
      Seq("term"), "left_semi")
    val dfT = probed.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(((lit(nDocs) - col("df")).cast("double") + lit(0.5))
      / (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val termPpm = floor(
      idf * (col("tf").cast("double") * lit(k1 + 1))
        / (col("tf").cast("double") + lit(k1 * (1 - b))
          + lit(k1 * b) * col("dl").cast("double")
            * lit(nDocs.toDouble) / lit(totalTokens.toDouble))
        * lit(1e6) + lit(1e-4)).cast("long").as("term_ppm")
    val scored = qTerms.join(probed, "term").join(dfT, "term").join(dl, "doc_id")
      .select(col("query_id"), col("doc_id"), termPpm)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_ppm")).as("score_ppm"))
    val rn = row_number().over(Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("doc_id")))
    scored.withColumn("rank", rn.cast("long")).filter(col("rank") <= k)
  }

  /** Re-rank a per-query retrieval shortlist with ANY per-document
    * score table — the reranker seam of a retrieve→rerank pipeline
    * (the shape a cross-encoder stage has): BM25 recalls a cheap
    * shortlist at |Q|·k scale, then a higher-fidelity scorer reorders
    * it. `shortlist` must carry the [[bm25TopK]] output schema
    * (query_id, doc_id, score_ppm); `docScores` is any frame with a
    * doc_id column and `scoreCol` — the hashed-NB quality classifier
    * here (t124), a fastText/cross-encoder score column in production.
    * A doc_id appearing on MULTIPLE scorer rows contributes its MAX
    * score once (aggregated after the join, so the dedup never
    * shuffles the scorer table and a duplicated scorer row cannot
    * duplicate shortlist rows or corrupt ranks). Ties break on doc_id;
    * `rank` is a per-query row_number 1..k over the reranked order.
    * Documents the scorer does not cover drop from the shortlist
    * (inner join — a reranker that cannot score a doc cannot rank it).
    *
    * Scale shape: the shortlist is |Q|·k rows — it broadcasts against
    * the corpus-sized score frame, so the scorer's table scans once
    * and never shuffles; the duplicate-score aggregate and the rerank
    * window both run over shortlist-sized data only. */
  def rerank(shortlist: DataFrame, docScores: DataFrame,
             scoreCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val sc = docScores.select(col("doc_id"), col(scoreCol).as("__rr"))
    val joined = shortlist.select(col("query_id"), col("doc_id"),
        col("score_ppm").as("bm25_ppm"))
      .join(sc, Seq("doc_id"))
      .groupBy(col("query_id"), col("doc_id"))
      // max on BOTH aggregates: first() is order-dependent, so a
      // shortlist that ever carried duplicate (query_id, doc_id) rows
      // with differing score_ppm would retain a nondeterministic bm25
      .agg(max(col("bm25_ppm")).as("bm25_ppm"), max(col("__rr")).as("__rr"))
    val rn = row_number().over(Window.partitionBy(col("query_id"))
      .orderBy(col("__rr").desc, col("doc_id")))
    joined.withColumn("rank", rn.cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("bm25_ppm"),
        col("__rr").as("rerank_ppm"), col("rank"))
  }

  /** Persist the BM25 index in its SCALE layout: term-hash-bucketed
    * postings ([[graft.sources.PrunedIndex]]) plus the two side tables
    * an online query batch must not re-derive from the corpus-sized
    * index — per-doc lengths and the one-row corpus stats. With the
    * flat layout every query batch scans all postings; bucketed, the
    * batch's terms prune the scan to their hash buckets — the 100×
    * fix for [[bm25TopKFromIndex]]'s full-index read.
    *
    * Maintenance composes with the existing merge path: read the full
    * view, [[mergePostingsForDelta]], re-write — only the buckets a
    * delta's terms touch change content, but the swap is whole-index
    * (the versioned-store contract). */
  def writeBm25Index(post: DataFrame, path: String, numBuckets: Int = 64): Unit = {
    val spark = post.sparkSession
    graft.sources.PrunedIndex.write(post, graft.fs.Fs.child(path, "postings"),
      Seq("term"), numBuckets)
    // doclen/stats derive from the JUST-WRITTEN postings, not from
    // `post`'s lineage: re-evaluating the lineage re-tokenizes the
    // whole corpus once per side table (3x the build cost at any
    // scale); the written index is the thin (doc_id, term, tf) table
    // and scanning it back is the cheap path.
    val written = graft.sources.PrunedIndex.read(
      spark, graft.fs.Fs.child(path, "postings"))
    val dl = written.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    dl.write.mode("overwrite").parquet(graft.fs.Fs.child(path, "doclen"))
    spark.read.parquet(graft.fs.Fs.child(path, "doclen"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("total_tokens"))
      .write.mode("overwrite").parquet(graft.fs.Fs.child(path, "stats"))
  }

  /** [[bm25TopKFromIndex]] over a [[writeBm25Index]] layout: the query
    * batch's terms prune the postings scan to their buckets (directory
    * partition pruning — reads a |query terms|/numBuckets fraction of
    * the index instead of all of it), df comes out exact because a
    * term's postings live wholly in one bucket, and dl / corpus stats
    * come from the persisted side tables. Result is row-identical to
    * the flat-index path (pinned by RetrievalSpec and t119's oracle). */
  def bm25TopKFromPrunedIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                              queries: DataFrame, qIdCol: String, qTextCol: String,
                              k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qTerms = queryTerms(queries, qIdCol, qTextCol)
    // Materialize the probed postings ONCE (the classic "fetch the
    // postings lists" step): bm25Rank references its input twice (df
    // aggregate + score join), and re-evaluating the pruned scan +
    // semi-join lineage per reference doubles the read. The subset is
    // probe-bounded — |probed terms' postings| — which is exactly the
    // working set an online query batch implies; a probe whose terms
    // hit every bucket degrades to the flat path's full read and
    // should use bm25TopKFromIndex instead (scaladoc above).
    // localCheckpoint (not persist) so the blocks are dropped by the
    // context cleaner when the result goes out of scope, rather than
    // pinning cache across a long session of query batches.
    val post = graft.sources.PrunedIndex.readPruned(
      spark, graft.fs.Fs.child(path, "postings"), qTerms.select(col("term")))
      .localCheckpoint()
    val dl = spark.read.parquet(graft.fs.Fs.child(path, "doclen"))
    val st = spark.read.parquet(graft.fs.Fs.child(path, "stats")).head()
    bm25Rank(post, dl, st.getAs[Long]("n_docs"),
      math.max(st.getAs[Long]("total_tokens"), 1L), qTerms, k, k1, b)
  }
}
