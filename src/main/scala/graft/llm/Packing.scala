package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end-to-end in a deterministic order
  * (the id column) and chunk the concatenated token stream into
  * fixed-size context blocks — GPT-style concat-and-chunk packing. The
  * output gives each document its half-open token offset and the block
  * span it lands in, so a trainer can route documents to context
  * windows without ever materializing the concatenation.
  *
  * The global running offset is a distributed prefix sum, NOT a
  * single-partition `Window.orderBy` (the classic 100 TB degenerate
  * plan). Three steps:
  *   1. range-partition the thin (id, n_tokens) projection by id ONLY
  *      to pick balanced id boundaries; collect one (hi, subtotal) row
  *      per partition (#partitions rows, not data-sized);
  *   2. exclusive-prefix the subtotals on the driver;
  *   3. re-derive each row's bucket from the collected hi boundaries as
  *      a literal CASE over the id, then a bucket-local running-sum
  *      window on top of the broadcast base offsets.
  * Because the bucket is a pure function of the id (not of
  * `spark_partition_id()`), pass 2 is partitioning-independent by
  * construction — recomputation, AQE coalescing, or a different
  * RangePartitioner sample can never skew the offsets — and nothing
  * needs to stay persisted across the two passes. Only the two-column
  * projection shuffles; document text never moves.
  *
  * Ids must be unique (they define the packing order).
  */
object Packing {

  /** @param tokens      per-document token count (any long-castable column)
    * @param blockTokens context-window size in tokens
    * @param partitions  range-partition count; 0 = spark.sql.shuffle.partitions
    * @return (id, n_tokens, start_tok, start_block, end_block, n_blocks);
    *         empty documents occupy a zero-width span in their start block
    */
  def packBlocks(docs: DataFrame, idCol: String, tokens: Column,
                 blockTokens: Int, partitions: Int = 0): DataFrame = {
    require(blockTokens > 0, s"blockTokens must be positive, got $blockTokens")
    val spark = docs.sparkSession
    val nParts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val thin = docs.select(col(idCol).as("_id"), tokens.cast("long").as("n_tokens"))

    // Pass 1: balanced boundaries + per-range subtotals, one row per
    // non-empty partition, ordered by the range's low key.
    val stats = thin.repartitionByRange(nParts, col("_id"))
      .withColumn("_pid", spark_partition_id())
      .groupBy(col("_pid"))
      .agg(min(col("_id")).as("lo"), max(col("_id")).as("hi"),
        sum(col("n_tokens")).as("t"))
      .orderBy(col("lo"))
      .collect()

    val his = stats.map(_.get(2))
    var acc = 0L
    val bases = stats.map { r => val b = acc; acc += r.getLong(3); b }

    // Bucket + base offset as literal CASE chains over the id: rows in
    // range i (id <= hi_i, exclusive of earlier ranges) get bucket i.
    val bucket =
      if (his.length <= 1) lit(0)
      else his.init.zipWithIndex.foldRight(lit(his.length - 1): Column) {
        case ((hi, i), acc) => when(col("_id") <= lit(hi), lit(i)).otherwise(acc)
      }
    val baseOff =
      if (bases.isEmpty) lit(0L)
      else his.init.zip(bases.init).foldRight(lit(bases.last): Column) {
        case ((hi, b), acc) => when(col("_id") <= lit(hi), lit(b)).otherwise(acc)
      }

    // Pass 2: bucket-local running sum on top of the prefix base.
    val w = Window.partitionBy(col("_bucket")).orderBy(col("_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val b = blockTokens.toLong
    thin
      .withColumn("_bucket", bucket)
      .withColumn("start_tok", baseOff + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("start_block", expr(s"start_tok DIV $b"))
      .withColumn("end_block", expr(s"(start_tok + greatest(n_tokens, 1L) - 1L) DIV $b"))
      .withColumn("n_blocks", col("end_block") - col("start_block") + lit(1L))
      .select(col("_id").as(idCol), col("n_tokens"), col("start_tok"),
        col("start_block"), col("end_block"), col("n_blocks"))
  }
}
