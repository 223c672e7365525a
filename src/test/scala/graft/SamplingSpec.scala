package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def ids = (1L to 2000L).toDF("id")

  test("hashSample: deterministic membership, fraction approximately honored") {
    val a = Sampling.hashSample(ids, "id", 0.3).as[Long].collect().toSet
    val b = Sampling.hashSample(ids.repartition(13), "id", 0.3).as[Long].collect().toSet
    assert(a == b) // partitioning-independent
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
    // nested property: a 10% sample is a subset of the 30% sample
    val small = Sampling.hashSample(ids, "id", 0.1).as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("temperatureMixtureSample: small sources upweighted, overall rate honored, deterministic") {
    // 1800 docs in 'big', 200 in 'small' — τ=½ should keep a HIGHER
    // fraction of 'small' than of 'big'
    val docs = (1L to 2000L).map(i => (i, if (i <= 1800) "big" else "small"))
      .toDF("id", "source")
    val kept = Sampling.temperatureMixtureSample(docs, "id", "source", targetPpm = 300000L)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val rBig = kept("big") / 1800.0
    val rSmall = kept("small") / 200.0
    assert(rSmall > rBig, s"small=$rSmall big=$rBig")
    // expected quotas: w ∝ √n → big 9× docs but only 3× weight
    val total = kept.values.sum
    assert(math.abs(total / 2000.0 - 0.3) < 0.06, s"total=$total")
    // partitioning-independent membership
    val a = Sampling.temperatureMixtureSample(docs, "id", "source", 300000L)
      .select("id").as[Long].collect().toSet
    val b = Sampling.temperatureMixtureSample(docs.repartition(17), "id", "source", 300000L)
      .select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("temperatureQuotas: waterfill hits the target exactly when feasible") {
    // tiny saturates in round 1 (√n gives it more than its size); its
    // surplus must re-divide over the big sources, not drop
    val counts = Seq(("a_tiny", 10L), ("src0", 400L), ("src1", 400L), ("src2", 400L))
    val q = Sampling.temperatureQuotas(counts, targetPpm = 600000L)
    val target = BigInt(1210) * 600000 / 1000000 // = 726
    assert(q("a_tiny") == BigInt(10)) // saturated: keeps everything
    // unsaturated quotas all under size, and the total hits the target
    // up to the final round's floor-division remainders (< #open sources)
    assert(Seq("src0", "src1", "src2").forall(s => q(s) < BigInt(400)))
    val sum = q.values.sum
    assert(sum <= target && target - sum < 3, s"sum=$sum target=$target")
    // equal-sized equal-weight sources get identical quotas
    assert(q("src0") == q("src1") && q("src1") == q("src2"))
  }

  test("temperatureQuotas: multi-round cascade saturates in order, keeps everything when target exceeds corpus") {
    // target > corpus: every source saturates over successive rounds
    val counts = Seq(("s1", 5L), ("s2", 50L), ("s3", 500L))
    val all = Sampling.temperatureQuotas(counts, targetPpm = 1000000L)
    assert(all == Map("s1" -> BigInt(5), "s2" -> BigInt(50), "s3" -> BigInt(500)))
    // two rounds of saturation: s1 then s2 clip, s3 absorbs the surplus
    val q = Sampling.temperatureQuotas(counts, targetPpm = 900000L)
    assert(q("s1") == BigInt(5) && q("s2") == BigInt(50))
    val target = BigInt(555) * 900000 / 1000000 // = 499
    assert(q("s3") == target - 55)
  }

  test("split: partitions are disjoint, exhaustive, and stable") {
    val s = Sampling.split(ids, "id", testFraction = 0.2, validFraction = 0.1)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(s.keySet == Set("train", "valid", "test"))
    assert(s.values.sum == 2000L)
    assert(math.abs(s("test") / 2000.0 - 0.2) < 0.05)
    assert(math.abs(s("valid") / 2000.0 - 0.1) < 0.04)
  }

  test("assignShards: dense 0-based positions per shard, partitioning-independent, balanced-ish") {
    import org.apache.spark.sql.functions._
    val a = Sampling.assignShards(ids, "id", 8)
      .select($"id", $"shard", $"pos").as[(Long, Long, Long)].collect()
    val byShard = a.groupBy(_._2)
    assert(byShard.keySet == (0L until 8L).toSet)
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        "positions must be dense 0..n-1 within each shard")
    }
    // md5 spreads 2000 ids over 8 shards within a loose tolerance
    assert(byShard.values.map(_.length).min > 150)
    val b = Sampling.assignShards(ids.repartition(13), "id", 8)
      .select($"id", $"shard", $"pos").as[(Long, Long, Long)].collect()
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq,
      "layout must not depend on input partitioning")
  }

  test("cdfBins: exact tie-coherent bins, no global sort of the input") {
    // 10 rows, scores 1..10 → with nBins=5 each score pair shares a bin
    val s1 = (1 to 10).map(i => (i.toLong, (i + 1) / 2 * 10L)).toDF("id", "score")
    val out = Sampling.cdfBins(s1, "id", "score", nBins = 5)
      .select($"id", $"bin").as[(Long, Long)].collect().toMap
    assert(out == (1 to 10).map(i => i.toLong -> ((i + 1) / 2).toLong).toMap)
    // all-ties: every row lands in the top bin (CDF = 1)
    val s2 = (1 to 6).map(i => (i.toLong, 42L)).toDF("id", "score")
    val ties = Sampling.cdfBins(s2, "id", "score", nBins = 4)
      .select($"bin").as[Long].collect().toSet
    assert(ties == Set(4L))
    // partitioning independence
    def run(nPart: Int) =
      Sampling.cdfBins(s1.repartition(nPart), "id", "score", nBins = 3)
        .orderBy($"id").as[(Long, Long, Long)].collect().toSeq
    assert(run(1) == run(7))
  }

  test("exactQuantilesPpm: hand-computed nearest-rank quantiles per group") {
    import org.apache.spark.sql.functions._
    // group a: values 1..10 -> p50 = ceil(0.5*10)=rank 5 -> 5,
    //          p90 = rank 9 -> 9, p99 = rank 10 -> 10.
    // group b: values [2,2,2,7] -> p50 = rank 2 -> 2, p90/p99 = rank 4 -> 7.
    val df = ((1L to 10L).map(("a", _)) ++ Seq(("b", 2L), ("b", 2L), ("b", 2L), ("b", 7L)))
      .toDF("g", "v")
    val r = Sampling.exactQuantilesPpm(df, "g", "v",
        Seq("p50" -> 500000L, "p90" -> 900000L, "p99" -> 990000L))
      .orderBy($"g").as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 5L, 9L, 10L), ("b", 2L, 7L, 7L)))
  }

  test("exactQuantilesPpm: partitioning-independent; p100 is the max; single row group") {
    import org.apache.spark.sql.functions._
    val df = ((1L to 10L).map(("a", _)) ++ Seq(("c", 42L))).toDF("g", "v")
    def run(nPart: Int) =
      Sampling.exactQuantilesPpm(df.repartition(nPart), "g", "v",
          Seq("p50" -> 500000L, "p100" -> 1000000L))
        .orderBy($"g").as[(String, Long, Long)].collect().toSeq
    val a = run(1)
    assert(a == run(7))
    assert(a == Seq(("a", 5L, 10L), ("c", 42L, 42L)))
  }

  test("exactQuantilesPpm: NULL values are excluded from ranks and counts") {
    import org.apache.spark.sql.functions._
    // two NULLs must neither inflate the denominator nor (nulls-first)
    // shift the cumulative counts: quantiles over [1..8] ignore them
    val df = ((1L to 8L).map(v => ("a", Some(v))) ++
        Seq(("a", None: Option[Long]), ("a", None: Option[Long])))
      .toDF("g", "v")
    val r = Sampling.exactQuantilesPpm(df, "g", "v",
        Seq("p50" -> 500000L, "p100" -> 1000000L))
      .as[(String, Long, Long)].collect().toSeq
    assert(r == Seq(("a", 4L, 8L)))
  }

  test("thresholdSweep: hand-computed keep counts/weights per cutoff") {
    import org.apache.spark.sql.functions._
    // scores 10,10,20,30 with weights 1,2,3,4
    val df = Seq((10L, 1L), (10L, 2L), (20L, 3L), (30L, 4L)).toDF("s", "w")
    val r = Sampling.thresholdSweep(df, "s", col("w"), Seq(5L, 15L, 25L, 35L))
      .orderBy($"threshold")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (5L, 4L, 4L, 1000000L, 10L, 10L),
      (15L, 2L, 4L, 500000L, 7L, 10L),
      (25L, 1L, 4L, 250000L, 4L, 10L),
      (35L, 0L, 4L, 0L, 0L, 10L)))
    // partitioning-independent
    val r7 = Sampling.thresholdSweep(df.repartition(7), "s", col("w"),
        Seq(5L, 15L, 25L, 35L))
      .orderBy($"threshold").as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r7 == r)
  }

  test("writeShards: one dir per shard, rows inside a shard ascend by pos") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    try {
      Sampling.writeShards(ids, "id", 4, dir)
      val back = spark.read.parquet(dir)
      assert(back.count() == 2000L)
      assert(back.select("shard").distinct().count() == 4L)
      // within each shard-dir file, rows are stored in pos order
      (0 until 4).foreach { k =>
        val pos = spark.read.parquet(s"$dir/shard=$k")
          .select("pos").as[Long].collect()
        assert(pos.toSeq == pos.sorted.toSeq, s"shard $k not stored in pos order")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }
}
