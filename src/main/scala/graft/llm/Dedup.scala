package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for large-scale text corpora.
  *
  * Four families, all shuffle-based set operations (no driver-side
  * state, no cross-product unless explicitly chosen):
  *
  *  - exact: group on a 128-bit fingerprint of normalized text.
  *  - near-dup by Jaccard: *complete* similarity self-join via an
  *    inverted shingle index + size-ratio pruning + exact verification.
  *  - MinHash + LSH banding: the sub-quadratic candidate generator for
  *    the same predicate at 100 TB (probabilistic recall), verified
  *    exactly after banding.
  *  - SimHash: 64-bit sketch + pigeonhole banding for hamming ≤ k.
  */
object Dedup {

  /** Exact dedup: one representative (min id) per identical normalized
    * text. Grouping key is the md5 fingerprint, not the text itself, so
    * shuffle rows stay small regardless of document size. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__fp", fingerprint(col(textCol)))
      .withColumn("__keep",
        row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("__fp")).orderBy(col(idCol))))
      .filter(col("__keep") === 1)
      .drop("__fp", "__keep")

  /** Exact-dup *groups*: (fingerprint, representative id, group size)
    * for groups with ≥ 2 members. */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))
      .filter(col("group_size") >= 2)

  /** Complete Jaccard similarity self-join: all pairs (a < b) of docs
    * whose word-`n`-shingle sets have Jaccard ≥ `threshold`.
    *
    * Plan shape (all distributed, no cross join):
    *   1. per-doc distinct shingle set + its size              (1 scan)
    *   2. explode → inverted index (shingle → docs)            (shuffle)
    *   3. self-join per shingle, `a.id < b.id`, with the
    *      size-ratio prune  min ≥ t·max  (complete: J ≥ t ⇒
    *      |A|≥t·|B| and |B|≥t·|A|)                             (shuffle)
    *   4. distinct candidate pairs                              (shuffle)
    *   5. exact verify: array_intersect/array_union on the two
    *      shingle sets, keep J ≥ t.
    *
    * `maxShingleDocFreq` (optional) drops shingles appearing in more
    * than that many docs from the *index* (step 2) — a recall-trading
    * throttle for adversarial corpora; completeness holds whenever every
    * near-dup pair shares at least one sub-threshold-frequency shingle.
    * Default 0 = off (fully complete). */
  def jaccardNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.8,
      maxShingleDocFreq: Long = 0L): DataFrame = {

    val withSets = docs
      .select(col(idCol).as("id"), shingleSet(col(textCol), n).as("sh"))
      .withColumn("sz", size(col("sh")))

    val index0 = withSets.select(col("id"), col("sz"), explode(col("sh")).as("shingle"))
    val index =
      if (maxShingleDocFreq <= 0) index0
      else {
        val freq = index0.groupBy("shingle").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDocFreq)
        index0.join(freq.select("shingle"), Seq("shingle"))
      }

    val a = index.select(col("shingle"), col("id").as("a_id"), col("sz").as("a_sz"))
    val b = index.select(col("shingle"), col("id").as("b_id"), col("sz").as("b_sz"))
    val candidates = a.join(b, Seq("shingle"))
      .filter(col("a_id") < col("b_id"))
      .filter(least(col("a_sz"), col("b_sz")) >= lit(threshold) * greatest(col("a_sz"), col("b_sz")))
      .select("a_id", "b_id")
      .distinct()

    verifyJaccard(candidates, withSets, threshold)
  }

  /** Exact-Jaccard verification of candidate (a_id, b_id) pairs. */
  private[llm] def verifyJaccard(candidates: DataFrame, withSets: DataFrame,
                                 threshold: Double): DataFrame = {
    val sa = withSets.select(col("id").as("a_id"), col("sh").as("a_sh"))
    val sb = withSets.select(col("id").as("b_id"), col("sh").as("b_sh"))
    candidates
      .join(sa, "a_id").join(sb, "b_id")
      .withColumn("jaccard",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** MinHash signatures: `numHashes` independent min-hash values over the
    * shingle set, computed as element-wise mins of a per-shingle hash
    * array — one explode + one groupBy, no UDFs. */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, numHashes: Int = 64): DataFrame = {
    val exploded = docs
      .select(col(idCol).as("id"), explode(shingleSet(col(textCol), n)).as("shingle"))
      .withColumn("hs", array((0 until numHashes).map(s => seededHash(col("shingle"), s)): _*))
    val minAggs = (0 until numHashes).map(i => min(element_at(col("hs"), i + 1)).as(s"h$i"))
    exploded.groupBy("id").agg(minAggs.head, minAggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** MinHash-LSH near-dup pairs: band the signature, bucket-join on
    * (band, band-hash), then exact-verify Jaccard. Sub-quadratic; recall
    * is probabilistic in the banding (standard LSH S-curve), precision
    * is exact thanks to verification. */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = minHashSignatures(docs, idCol, textCol, n, numHashes)

    val banded = sigs.select(
      col("id"),
      posexplode(array((0 until bands).map { b =>
        hash(slice(col("sig"), b * rows + 1, rows)).as(s"b$b")
      }: _*)).as(Seq("band", "bkey")))

    val l = banded.select(col("band"), col("bkey"), col("id").as("a_id"))
    val r = banded.select(col("band"), col("bkey"), col("id").as("b_id"))
    val candidates = l.join(r, Seq("band", "bkey"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()

    val withSets = docs.select(col(idCol).as("id"), shingleSet(col(textCol), n).as("sh"))
    verifyJaccard(candidates, withSets, threshold)
  }

  /** Per-token ±1 votes for each of the 64 SimHash bits (constant shift
    * distances — Spark's shiftright takes a literal bit count). */
  private def simHashVotes(textCol: Column): Column = {
    val toks = tokens(normalizeText(textCol))
    def bitVotes(tk: Column): Column = {
      val h = xxhash64(tk)
      array((0 until 64).map { b =>
        when(shiftright(h, b).bitwiseAND(1) === 1, lit(1L)).otherwise(lit(-1L))
      }: _*)
    }
    aggregate(toks, array_repeat(lit(0L), 64),
      (acc, tk) => zip_with(acc, bitVotes(tk), (v, bv) => v + bv))
  }

  /** 64-bit SimHash of the whitespace-token multiset — computed entirely
    * in expressions (no explode/shuffle): per-token ±1 bit votes are
    * summed element-wise, then the sign of each vote becomes the bit. */
  def simHashes(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sig = (0 until 64).map { b =>
      when(element_at(col("__votes"), b + 1) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    docs
      .select(col(idCol).as("id"), simHashVotes(col(textCol)).as("__votes"))
      .select(col("id"), sig.as("sig"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ `maxHamming` (≤ 7):
    * pigeonhole banding over eight 8-bit chunks (a pair within hamming
    * ≤ 7 must agree exactly on ≥ 1 chunk), then exact hamming filter. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 7, "8-chunk banding is complete only for maxHamming <= 7")
    val sigs = simHashes(docs, idCol, textCol)
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until 8).map { c =>
        shiftright(col("sig"), c * 8).bitwiseAND(0xFFL)
      }: _*)).as(Seq("chunk", "ckey")))
    val l = banded.select(col("chunk"), col("ckey"), col("id").as("a_id"), col("sig").as("a_sig"))
    val r = banded.select(col("chunk"), col("ckey"), col("id").as("b_id"), col("sig").as("b_sig"))
    l.join(r, Seq("chunk", "ckey"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup: all pairs (a < b) with cosine ≥ threshold.
    * Exact/complete variant — a blocked self-join (O(n²) compares but
    * fully distributed; use [[graft.llm.Similarity]] LSH buckets for the
    * approximate 100 TB path). */
  def embeddingNearDupPairs(embs: DataFrame, idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.{cosineWithNorms, dot, norm}
    // norms are per-vector: hoist them out of the O(n²) pair stage
    val withNorm = embs.select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("nrm"))
    val a = withNorm.select(col("id").as("a_id"), col("v").as("a_v"), col("nrm").as("a_n"))
    val b = withNorm.select(col("id").as("b_id"), col("v").as("b_v"), col("nrm").as("b_n"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", cosineWithNorms(dot(col("a_v"), col("b_v")), col("a_n"), col("b_n")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos").as("cos_sim"))
  }
}
