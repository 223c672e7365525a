package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer: distributed merge training + a native
  * encode/count expression.
  *
  * Training runs on the *distinct-word* table weighted by frequency —
  * the standard trick that makes BPE corpus-size-independent: a 100 TB
  * corpus has bounded distinct-word mass (Heaps' law), and each merge
  * iteration is one narrow scan + one small aggregation over it.
  */
object Bpe {

  /** Learn `numMerges` merges. Deterministic: ties on pair count break
    * by pair lexicographically. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._

    // distinct words with corpus frequency, symbols = characters.
    // Every iteration must cut lineage (localCheckpoint): the merge
    // rewrite nests another regexp_replace into the plan, and 40-deep
    // accumulated plans make analysis itself the bottleneck.
    var words = docs
      .select(explode(TextFunctions.tokens(TextFunctions.normalizeText(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("weight"))
      .select(concat_ws(" ", split(col("w"), "")).as("sym"), col("weight"))
      .localCheckpoint(true)

    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val syms = split(col("sym"), " ")
      val top = words
        .select(col("weight"),
          explode(arrays_zip(
            slice(syms, lit(1), size(syms) - 1).as("l"),
            slice(syms, lit(2), size(syms) - 1).as("r"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("weight")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, _) = top.head
        merges += ((l, r))
        val pat = "(?<=^| )" + java.util.regex.Pattern.quote(l + " " + r) + "(?=$| )"
        val prev = words
        words = words
          .withColumn("sym", regexp_replace(col("sym"), pat, java.util.regex.Matcher.quoteReplacement(l + r)))
          .localCheckpoint(true)
        // the superseded round's checkpoint blocks would otherwise stay
        // persisted until a JVM GC notices — numMerges rounds of word
        // tables is real executor memory at corpus scale
        Dedup.unpersistCheckpoint(prev)
      }
      i += 1
    }
    merges.result()
  }

  /** Token count per document under the learned merges (native
    * expression — greedy merge application per word, no shuffle). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol),
      graft.functions.expr.BpeTokenCount(
        TextFunctions.tokens(TextFunctions.normalizeText(col(textCol))), merges).as("n_bpe_tokens"))

  /** Reference (driver-side) encoder for tests: greedy highest-priority
    * adjacent merge until fixpoint. */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var symbols = word.map(_.toString).toVector
    var continue = symbols.size > 1
    while (continue) {
      var bestIdx = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < symbols.size - 1) {
        rank.get((symbols(j), symbols(j + 1))).foreach { rk =>
          if (rk < bestRank) { bestRank = rk; bestIdx = j }
        }
        j += 1
      }
      if (bestIdx < 0) continue = false
      else symbols = (symbols.take(bestIdx) :+ (symbols(bestIdx) + symbols(bestIdx + 1))) ++
        symbols.drop(bestIdx + 2)
    }
    symbols
  }
}
