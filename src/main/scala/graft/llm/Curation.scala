package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Staged corpus curation — the composed keep/drop decision a
  * pretraining corpus goes through, with a first-fail verdict per
  * document (the C4-filter reporting convention): length gate, then
  * repetition gate, then exact dedup (min-id canonical among the
  * SURVIVORS of the text gates — staging matters: a filtered-out doc
  * must not claim a canonical slot), then n-gram benchmark
  * decontamination of what remains.
  *
  * Scale shape: the text gates are one thin (id, n_tokens, rep_ppm,
  * fp) projection; dedup is a fingerprint groupBy + join-back;
  * decontamination is [[Decontaminate.overlapGramCount]]'s
  * broadcast-membership scan. Document text is scanned once per
  * gram/fingerprint derivation and never shuffled; every verdict is a
  * deterministic flag the DuckDB oracle re-derives stage for stage. */
object Curation {

  /** One row per input doc: (id, n_tokens, verdict) with verdict ∈
    * {too_short, repetitive, exact_dup, contaminated, kept}. */
  def stagedVerdicts(docs: DataFrame, idCol: String, textCol: String,
                     bench: DataFrame, benchTextCol: String,
                     minTokens: Int, maxRepPpm: Long = 0L,
                     n: Int = 8): DataFrame = {
    val stats = docs.select(col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast("long").as("n_tokens"),
      dupShingleFracPpm(col(textCol), 3).as("rep_ppm"),
      fingerprint(col(textCol)).as("fp"))
    val pass2 = stats.filter(col("n_tokens") >= minTokens
      && col("rep_ppm") <= maxRepPpm)
    val canon = pass2.groupBy(col("fp")).agg(min(col("doc_id")).as("canon_id"))
    val pass3 = pass2.join(canon, "fp").filter(col("doc_id") === col("canon_id"))
    val contam = Decontaminate.overlapGramCount(
        docs.select(col(idCol).as("doc_id"), col(textCol))
          .join(pass3.select(col("doc_id")), "doc_id"),
        "doc_id", textCol,
        Decontaminate.benchGramIndex(bench, benchTextCol, n), n)
      .filter(col("n_shared_grams") >= 1)
      .select(col("doc_id"), lit(true).as("is_contam"))
    stats
      .join(canon.select(col("canon_id")).withColumn("is_canon", lit(true)),
        stats("doc_id") === canon("canon_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol), col("n_tokens"),
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("rep_ppm") > maxRepPpm, "repetitive")
          .when(col("is_canon").isNull, "exact_dup")
          .when(col("is_contam"), "contaminated")
          .otherwise("kept").as("verdict"))
  }
}
