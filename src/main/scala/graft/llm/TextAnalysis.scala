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
}
