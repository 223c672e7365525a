package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling — the reproducible-split
  * machinery a training-data pipeline needs: membership depends only on
  * the key's md5, never on partitioning, executor count, or Spark's
  * sample RNG, so a 100 TB split is stable across reruns, engines, and
  * cluster topologies. */
object Sampling {

  /** Uniform pseudo-random unit value in [0, 1) from a key: the first
    * 12 hex chars of md5 as a 48-bit integer / 2^48. */
  def hashUnit(key: Column): Column =
    (conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("double")
      / lit(281474976710656.0)) // 2^48

  /** Keep ≈ `fraction` of rows, deterministically by key. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashUnit(col(keyCol)) < fraction)

  /** Stable train/validation/test split: adds a `split` column from the
    * key hash. Fractions must sum to ≤ 1; the remainder goes to train. */
  def split(df: DataFrame, keyCol: String,
            testFraction: Double, validFraction: Double = 0.0): DataFrame = {
    val u = hashUnit(col(keyCol))
    df.withColumn("split",
      when(u < testFraction, "test")
        .when(u < testFraction + validFraction, "valid")
        .otherwise("train"))
  }
}
