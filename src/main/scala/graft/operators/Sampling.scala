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

  /** Per-stratum deterministic sampling — the per-source quota pass of a
    * training-mix rebalance: each stratum keeps its own fraction; strata
    * not in the map are dropped. Membership is still a pure function of
    * the key's md5, so the sample is identical across partitionings and
    * reruns; the fraction map folds into one literal CASE expression
    * (codegen'd, no join, no shuffle). */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1], got $fractions")
    val frac = fractions.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (k, f)) => when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(hashUnit(col(keyCol)) < frac)
  }

  /** Temperature-scaled source mixture (τ = ½, GPT-3-style): sampling
    * quotas per source ∝ √n_s, so small sources are upweighted relative
    * to their share — the standard training-mix rebalance. `targetPpm`
    * is the overall corpus fraction to keep, in ppm.
    *
    * A source whose √n-share exceeds its size saturates (keeps all its
    * rows); the unused surplus WATERFILLS to the remaining sources by
    * the same √n weights — iteratively, until a round saturates nothing
    * — so the total quota hits the target whenever the corpus is big
    * enough (Σ quotas = min(T, Σn)), instead of silently undershooting.
    *
    * Every derived quantity is integer-exact and engine-portable: the
    * per-source weight is floor(√n·10⁶) (IEEE sqrt is correctly
    * rounded, so any engine computes the same integer), quotas are
    * integer division over exact BigInt products — in every waterfill
    * round — and membership is the md5 [[hashUnit]] against the exact
    * double ratio quota/n (one division of two integers — identically
    * rounded everywhere). No float is ever accumulated, so the sample is
    * reproducible bit-for-bit across engines, partitionings, and reruns.
    *
    * Two passes: a #sources-row count aggregate to the driver (the
    * waterfill loop runs on those few rows driver-side), then one
    * codegen'd CASE-filter scan — the corpus never shuffles. */
  def temperatureMixtureSample(df: DataFrame, keyCol: String, sourceCol: String,
                               targetPpm: Long): DataFrame = {
    require(targetPpm >= 0 && targetPpm <= 1000000L,
      s"targetPpm must be in [0, 1e6], got $targetPpm")
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    if (counts.isEmpty) return df.filter(lit(false))
    val quotas = temperatureQuotas(counts.toSeq, targetPpm)
    val fracs = counts.map { case (s, n) =>
      s -> quotas(s).toDouble / n.toDouble
    }.toMap
    stratifiedHashSample(df, keyCol, sourceCol, fracs)
  }

  /** The integer-exact waterfill quota derivation behind
    * [[temperatureMixtureSample]], exposed for specs: per round, divide
    * the remaining target over unsaturated sources ∝ floor(√n·10⁶);
    * sources whose share reaches their size keep exactly n and leave
    * the pool. Terminates in ≤ #sources rounds (each round either
    * saturates someone or is final). Invariant: Σ quotas = min(T, Σn)
    * up to the final round's per-source floor-division remainders
    * (< #open sources rows) — the target is hit whenever feasible. */
  private[graft] def temperatureQuotas(counts: Seq[(String, Long)],
                                       targetPpm: Long): Map[String, BigInt] = {
    val w = counts.map { case (s, n) =>
      s -> BigInt(math.floor(math.sqrt(n.toDouble) * 1e6).toLong)
    }.toMap
    var tRem = counts.map(c => BigInt(c._2)).sum * targetPpm / 1000000
    var open = counts.toList
    var assigned = Map.empty[String, BigInt]
    var done = false
    while (!done && open.nonEmpty) {
      val sumW = open.map { case (s, _) => w(s) }.sum
      val round = open.map { case (s, n) => (s, n, tRem * w(s) / sumW) }
      val sat = round.filter { case (_, n, q) => q >= n }
      if (sat.isEmpty) {
        assigned ++= round.map { case (s, _, q) => s -> q }
        done = true
      } else {
        assigned ++= sat.map { case (s, n, _) => s -> BigInt(n) }
        tRem -= sat.map { case (_, n, _) => BigInt(n) }.sum
        val satNames = sat.map(_._1).toSet
        open = open.filterNot { case (s, _) => satNames(s) }
      }
    }
    counts.map { case (s, _) => s -> assigned.getOrElse(s, BigInt(0)) }.toMap
  }

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

  /** Exact CDF bin assignment WITHOUT a global corpus sort — the
    * curriculum / perplexity-bucket step (CCNet-style: bin documents by
    * an LM quality score, then sample or order training by bin). The
    * naive `ntile() OVER (ORDER BY score)` is a single-reducer global
    * sort — a scale-killer; this instead builds the exact score
    * HISTOGRAM (bounded by the score DOMAIN — ppm-integer scores have
    * ≤ ~10⁶ distinct values regardless of corpus rows), runs the
    * cumulative window over that bounded table (one small task —
    * control-plane, not corpus), and joins the per-score bin back
    * (broadcast-sized in practice). Every doc with the same score gets
    * the same bin — `bin = ⌈nBins · CDF(score)⌉` in pure integer math
    * (`(nBins·cum + tot − 1) DIV tot`), deterministic and
    * partition-independent by construction. Bins are 1..nBins and can
    * be unevenly sized exactly when scores tie across a boundary — the
    * price of determinism, and what any tie-coherent binning does. */
  def cdfBins(scores: DataFrame, idCol: String, scoreCol: String,
              nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    import org.apache.spark.sql.expressions.Window
    val cumW = Window.orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val binMap = scores.groupBy(col(scoreCol)).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("tot", sum(col("cnt")).over(totW))
      .select(col(scoreCol),
        expr(s"(${nBins}L * cum + tot - 1) DIV tot").as("bin"))
    scores.select(col(idCol), col(scoreCol))
      .join(binMap, scoreCol)
  }

  /** Exact per-group quantiles WITHOUT a global sort — the length-
    * distribution columns of a data card (p50/p90/p99 token length per
    * source). Same histogram-CDF shape as [[cdfBins]]: the value domain
    * of an integer metric (token counts, ppm scores) is bounded, so the
    * per-(group, value) histogram is control-plane-sized regardless of
    * corpus rows; the cumulative window runs per group over that
    * bounded table, and quantile q is the NEAREST-RANK statistic
    * min{ v : cum(v) ≥ ⌈q·n⌉ } in pure integer math
    * (`rank = (tot·qPpm + 999999) DIV 1000000`) — deterministic,
    * partition-independent, and engine-exact (no interpolation, no
    * doubles). One shuffle on (group, value), one on group; nothing
    * proportional to row count ever sorts.
    *
    * @param quantiles (outputColumn, qPpm) pairs, qPpm in (0, 1e6];
    *                  e.g. ("p50_tokens", 500000L).
    * @return one row per group: (groupCol, outputColumn...).
    */
  def exactQuantilesPpm(df: DataFrame, groupCol: String, valueCol: String,
                        quantiles: Seq[(String, Long)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.forall { case (_, q) => q > 0 && q <= 1000000L },
      s"qPpm must be in (0, 1000000], got $quantiles")
    // NULL values are EXCLUDED (standard quantile semantics): counted
    // in, they would inflate every rank denominator, and Spark's
    // nulls-first window order would additionally shift every
    // cumulative count — both biasing quantiles low (and diverging
    // from SQL engines that sort nulls last).
    val nonNull = df.filter(col(valueCol).isNotNull)
    import org.apache.spark.sql.expressions.Window
    val cumW = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col(groupCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val hist = nonNull.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(cumW))
      .withColumn("tot", sum(col("cnt")).over(totW))
    val aggs = quantiles.map { case (name, qPpm) =>
      min(when(col("cum") >= expr(s"(tot * ${qPpm}L + 999999L) DIV 1000000L"),
        col(valueCol))).as(name)
    }
    hist.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Filter-selectivity sweep — the tuning table behind every quality
    * threshold decision: for each candidate cutoff, how many documents
    * and how much weight (tokens) survive `score >= threshold`. Same
    * bounded-histogram shape as [[cdfBins]]/[[exactQuantilesPpm]]: the
    * corpus aggregates ONCE into the (score, count, weight) histogram,
    * the candidate thresholds explode over that control-plane-sized
    * table (a literal array — no join), and the sweep is one thin
    * groupBy. All integer math; adding thresholds costs nothing
    * corpus-sized.
    *
    * @return one row per threshold: (threshold, n_kept, n_total,
    *         kept_ppm, w_kept, w_total), kept_ppm = ⌊n_kept·10⁶/n_total⌋.
    */
  def thresholdSweep(df: DataFrame, scoreCol: String, weight: Column,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    val hist = df.groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("n"), sum(weight.cast("long")).as("w"))
    hist.select(col("s"), col("n"), col("w"),
        explode(typedlit(thresholds)).as("threshold"))
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("s") >= col("threshold"), col("n")).otherwise(lit(0L))).as("n_kept"),
        sum(col("n")).as("n_total"),
        sum(when(col("s") >= col("threshold"), col("w")).otherwise(lit(0L))).as("w_kept"),
        sum(col("w")).as("w_total"))
      .select(col("threshold"), col("n_kept"), col("n_total"),
        expr("n_kept * 1000000L DIV n_total").as("kept_ppm"),
        col("w_kept"), col("w_total"))
  }

  /** Deterministic global shuffle + fixed-shard assignment — the
    * reshard step before sequence packing / training-order
    * serialization: every row gets a `shard` in [0, nShards) and a
    * dense 0-based `pos` within its shard, both pure functions of the
    * key's md5 (shard = first 48 md5 bits mod nShards — the
    * [[graft.functions.TextFunctions.hashBucket]] convention; in-shard
    * order = (md5 hex, key)). The layout is therefore identical across
    * reruns, partitionings, and engines, and a training job can address
    * any (shard, pos) reproducibly — the md5 sort key IS the shuffle.
    *
    * Scale shape: one hash exchange on `shard` plus a PER-SHARD sort
    * (window partitioned by shard — no global ordering, no
    * single-reducer bottleneck). nShards is the parallelism/size knob:
    * pick it so one shard's rows fit a single task comfortably
    * (e.g. 100 TB / 256 MB ≈ 400 k shards). */
  def assignShards(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val hx = substring(md5(col(keyCol).cast("string")), 1, 12)
    val shard = conv(hx, 16, 10).cast("long") % nShards
    df.withColumn("shard", shard)
      .withColumn("pos",
        (row_number().over(
          Window.partitionBy(col("shard")).orderBy(hx.asc, col(keyCol).asc))
          - 1).cast("long"))
  }

  /** Physically materialize an [[assignShards]] layout: one output
    * directory per shard (`shard=<k>/`), rows inside each file in
    * ascending `pos` — i.e. a reproducible serialized training order.
    * `repartition` on shard co-locates each shard in one task;
    * `sortWithinPartitions` orders it; `partitionBy` names the dirs.
    *
    * The sort is on (shard, pos), not pos alone: the V1 write path
    * requires its input ordered by the partition columns and inserts
    * its own sort when it isn't. That inserted sort only orders by
    * `shard`, and rows with equal keys are NOT contractually stable
    * under spill merges — a pos-only pre-sort could silently interleave
    * within a shard at scale. Sorting (shard, pos) here satisfies the
    * writer's required ordering outright, so no extra sort is inserted
    * and the intra-shard pos order reaches the files intact. */
  def writeShards(df: DataFrame, keyCol: String, nShards: Int,
                  path: String): Unit =
    assignShards(df, keyCol, nShards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
