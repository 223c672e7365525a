package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities: the knobs a 100 TB job needs that don't change
  * query semantics — skew salting and bucketed co-location. */
object Scale {

  /** Salted aggregation for skewed keys: two-phase groupBy.
    * Phase 1 groups on (key, salt) so one hot key spreads over
    * `saltBuckets` reducers; phase 2 merges the partials. `aggs` must be
    * decomposable (sum/count/min/max — the partial and final functions
    * given explicitly by the caller). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted join for a skewed left key: replicate the (small) right side
    * `saltBuckets` times, salt the left side randomly-but-deterministically,
    * join on (key, salt). Semantics identical to `left.join(right, keys)`
    * when `right` is unique per key. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBuckets: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(keys.map(col) :+ monotonically_increasing_id(): _*), lit(saltBuckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt").drop("__salt")
  }

  /** Write both sides bucketed by the join key so the subsequent join is
    * shuffle-free (SortMergeJoin over co-located buckets). Returns the
    * table names to join. */
  def bucketizeForJoin(df: DataFrame, table: String, keys: Seq[String],
                       numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
