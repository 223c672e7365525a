package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  *   1. range-partition the thin (id, n_tokens) projection by id;
  *   2. one subtotal row per partition to the driver (#partitions rows,
  *      not data-sized), exclusive-prefix them, broadcast the bases;
  *   3. partition-local running-sum window keyed on the partition id.
  * Only the two-column projection shuffles (twice: the range exchange
  * and the window's hash exchange); document text never moves.
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

    // Thin projection, range-partitioned so partition id order == id order.
    // Persisted because the subtotal pass and the offset pass must see the
    // SAME partition assignment (range boundaries are sampled).
    val base = docs
      .select(col(idCol).as("_id"), tokens.cast("long").as("n_tokens"))
      .repartitionByRange(nParts, col("_id"))
      .withColumn("_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Pass 1: one row per partition; exclusive prefix on the driver.
    val subtotals = base.groupBy(col("_pid"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    var acc = 0L
    val bases = subtotals.map { case (pid, t) => val b = acc; acc += t; (pid, b) }
    val baseDf = spark.createDataFrame(bases.toSeq).toDF("_bpid", "_base")

    // Pass 2: partition-local running sum on top of the broadcast base.
    val w = Window.partitionBy(col("_pid")).orderBy(col("_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val b = blockTokens.toLong
    base.join(broadcast(baseDf), col("_pid") === col("_bpid"))
      .withColumn("start_tok", col("_base") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("start_block", expr(s"start_tok DIV $b"))
      .withColumn("end_block", expr(s"(start_tok + greatest(n_tokens, 1L) - 1L) DIV $b"))
      .withColumn("n_blocks", col("end_block") - col("start_block") + lit(1L))
      .select(col("_id").as(idCol), col("n_tokens"), col("start_tok"),
        col("start_block"), col("end_block"), col("n_blocks"))
  }
}
