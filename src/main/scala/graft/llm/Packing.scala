package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One document's bin assignment from [[Packing.packBinsBFD]]. */
case class PackedDoc(id: Long, n_tokens: Long, bucket: Int, bin: Int, oversize: Boolean)

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

  /** Best-fit-decreasing bin packing into fixed-capacity context
    * windows — the "fewer truncations" alternative to [[packBlocks]]'s
    * concat-and-chunk (Ding et al., arXiv:2404.10830): no document is
    * ever split across windows; each goes whole into the fullest bin
    * that still fits it, largest documents first.
    *
    * Distributed shape: documents are hash-bucketed by id
    * (`xxhash64 mod nBuckets` — a pure function of the id, so the
    * assignment is partitioning-independent and reproducible), and BFD
    * runs independently per bucket via `flatMapGroups`. One shuffle of
    * the thin (id, n_tokens) projection; each bucket's member list is
    * held in executor memory — size `nBuckets` so corpus/nBuckets rows
    * fit (the packing quality loss vs global BFD is the usual
    * sharded-BFD bound: each bucket wastes at most one partially-filled
    * bin per fill level). Documents larger than `capacity` get a bin of
    * their own, flagged `oversize` (the trainer's truncate-or-reject
    * decision, not the packer's).
    *
    * Deterministic end-to-end: bucket is a hash of the id, in-bucket
    * order is (n_tokens desc, id), ties in best-fit resolve to the
    * lowest bin index — so the output is a pure function of the data,
    * independent of partitioning (pinned in PackingSpec). */
  def packBinsBFD(docs: DataFrame, idCol: String, tokens: Column,
                  capacity: Long, nBuckets: Int = 0): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    val nb =
      if (nBuckets > 0) nBuckets
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    docs
      .select(col(idCol).cast("long").as("id"), tokens.cast("long").as("n"),
        pmod(xxhash64(col(idCol).cast("long")), lit(nb.toLong)).cast("int").as("bucket"))
      .as[(Long, Long, Int)]
      .groupByKey(_._3)
      .flatMapGroups { (bucket, it) =>
        val members = it.toArray.sortBy { case (id, n, _) => (-n, id) }
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        members.map { case (id, n, _) =>
          var best = -1
          var bestRem = Long.MaxValue
          var j = 0
          while (j < fills.length) {
            val rem = capacity - fills(j)
            if (rem >= n && rem < bestRem) { best = j; bestRem = rem }
            j += 1
          }
          val bin =
            if (best >= 0) { fills(best) += n; best }
            else { fills += n; fills.length - 1 }
          PackedDoc(id, n, bucket, bin, n > capacity)
        }.iterator
      }
      .toDF()
      .select(col("id").as(idCol), col("n_tokens"), col("bucket"),
        col("bin"), col("oversize"))
  }
}
