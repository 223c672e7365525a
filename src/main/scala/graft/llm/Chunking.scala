package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{normalizeText, tokens}

/** Token-window document chunking — the retrieval/context-window split
  * every RAG and long-context training pipeline runs before embedding
  * or packing (fixed-size overlapping windows; see e.g. the chunking
  * pass in arXiv:2004.04906 §3.1, 100-word passages).
  *
  * Contract (engine-portable, mirrored by the DuckDB oracle twin):
  * tokens are the house whitespace tokenization of normalized text;
  * chunk `i` covers token positions `[i*stride, i*stride + chunkSize)`;
  * the number of chunks for an `n`-token document is 1 for
  * `n <= chunkSize`, else `ceil((n - chunkSize) / stride) + 1` — every
  * token is covered, the last chunk may be short, and no chunk start
  * lies beyond the text. Zero-token documents produce zero chunks.
  *
  * Scale shape: a pure map stage — no shuffle, no join, no token
  * explode (the per-chunk text is `slice` + `array_join` over the
  * already-materialized token array); output rows ≈ input tokens /
  * stride, produced streaming per input partition. At 100 TB this is
  * embarrassingly parallel and bounded by scan + write throughput.
  */
object Chunking {

  /** Split every document into overlapping token windows.
    *
    * @return (idCol, chunk_id, n_chunk_tokens, chunk_text) — one row
    *         per chunk, chunk_id dense from 0 within each document.
    */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride")
    val tk = tokens(normalizeText(col(textCol)))
    // last chunk index: 0 when n <= chunkSize, else ceil((n-C)/S) via
    // positive integer arithmetic (exact in double far below 2^53)
    val lastChunk = when(col("__n") <= chunkSize, lit(0L))
      .otherwise(floor((col("__n") - chunkSize + (stride - 1)) / stride))
    docs
      .filter(length(normalizeText(col(textCol))) > 0)
      .select(col(idCol), tk.as("__tk"))
      .withColumn("__n", size(col("__tk")))
      .select(col(idCol), col("__tk"), col("__n"),
        explode(sequence(lit(0L), lastChunk)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        least(lit(chunkSize), col("__n") - col("chunk_id") * stride)
          .cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__tk"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkSize)), " ").as("chunk_text"))
  }
}
