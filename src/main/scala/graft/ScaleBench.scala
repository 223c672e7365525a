package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-slope evidence for the shuffle-heavy operator family
  * (near-dup pair generation, connected components, BPE): times the
  * family at a base scale and at `factor`× that scale, printing one
  * JSON line per scale so the slope is directly readable.
  *
  * The scaled corpus is `factor` copies of the base `documents` table,
  * each copy's text extended with copy-unique junk tokens (~35% of the
  * doc's own token count). That keeps the workload realistic at 10×:
  * copies of one doc fall BELOW the 0.8 Jaccard threshold against each
  * other (J ≈ 1/1.35⁻ across copies), so pair/cluster counts grow
  * ~linearly with the corpus instead of degenerating into an all-pairs
  * blow-up of identical replicas — the shape a real 10× crawl has.
  *
  * Usage: `runMain graft.ScaleBench <baseSfDir> <workDir> [factor] [onlyPrefix] [repeat]`
  * (workDir holds the materialized scaled parquet; reused if present;
  * onlyPrefix filters the family by query-name prefix, repeat re-times
  * the scaled family N times — for separating host noise from real
  * slope).
  */
object ScaleBench {

  /** The scaled documents frame (schema-preserving: every base column
    * passes through; only doc_id is rekeyed and text extended). */
  def scaledDocsDf(spark: SparkSession, baseDir: String, factor: Int): DataFrame = {
    val base = spark.read.parquet(s"$baseDir/documents.parquet")
    val copies = spark.range(factor).select(col("id").cast("int").as("copy"))
    base.crossJoin(copies)
      .select(
        (col("doc_id") * factor + col("copy")).as("doc_id"),
        when(col("copy") === 0, col("text")).otherwise(concat(
          col("text"), lit(" "),
          array_join(transform(
            sequence(lit(1), greatest(lit(1),
              ceil(size(split(col("text"), " ")) * 0.35).cast("int"))),
            i => format_string("z%dc%dw%d", col("doc_id"), col("copy"), i)), " ")))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
  }

  def scaledDocs(spark: SparkSession, baseDir: String, workDir: String, factor: Int): String = {
    val out = s"$workDir/documents_x$factor"
    if (!graft.fs.Fs.exists(s"$out/_SUCCESS"))
      scaledDocsDf(spark, baseDir, factor).write.mode("overwrite").parquet(out)
    out
  }

  /** Scaled embeddings: `factor` copies, each copy's vector circularly
    * rotated by the copy index — norm-preserving, and rotated copies
    * decorrelate, so near-dup pair counts grow ~linearly with the
    * corpus (the realistic shape) instead of quadratically in factor. */
  /** The scaled embeddings frame (rotation scheme per the class doc). */
  def scaledEmbeddingsDf(spark: SparkSession, baseDir: String, factor: Int): DataFrame = {
    val base = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val copies = spark.range(factor).select(col("id").cast("int").as("copy"))
    base.crossJoin(copies)
      .select(
        (col("vec_id") * factor + col("copy")).as("vec_id"),
        // rotate by copy MOD dim: the raw copy index degenerates once
        // copy >= dim (empty head slice + full tail = exact duplicate
        // of copy 0 → quadratic pair growth, the opposite of the
        // stated linear design)
        when(pmod(col("copy"), size(col("embedding"))) === 0, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"),
              pmod(col("copy"), size(col("embedding"))) + 1,
              size(col("embedding")) - pmod(col("copy"), size(col("embedding")))),
            slice(col("embedding"), lit(1),
              pmod(col("copy"), size(col("embedding")))))).as("embedding"),
        col("label"))
  }

  def scaledEmbeddings(spark: SparkSession, baseDir: String, workDir: String, factor: Int): String = {
    val out = s"$workDir/embeddings_x$factor"
    if (!graft.fs.Fs.exists(s"$out/_SUCCESS"))
      scaledEmbeddingsDf(spark, baseDir, factor).write.mode("overwrite").parquet(out)
    out
  }

  /** Key-decorrelated scaled docs for the fuzzy-KEY family. The shared
    * scaled corpus appends its junk at the END of the text, so every
    * copy of a doc keeps an IDENTICAL 64-char prefix key — under the
    * all-pairs contract that is output-quadratic in factor by
    * definition (factor² cross-copy pairs per base doc), which measures
    * the contract, not the plan. Here each copy is instead passed
    * through a copy-unique ALPHABET ROTATION (`translate`, letters and
    * digits rotated by the copy index; copy 0 is the identity): within
    * a copy the key-diversity structure — segment values, hot-segment
    * skew, pair structure — is preserved bijectively, across copies
    * every alphanumeric key char differs, so Hamming distance between
    * copies ≈ key length ≫ maxDist and pair counts grow EXACTLY
    * linearly with the corpus (factor × base pairs), the real-crawl
    * shape. (A first cut prepended an 8-hex md5 copy marker instead;
    * that ate 9 of segment 0's 16 chars, collapsed its diversity, and
    * inflated the base itself 6.7× through hot-segment fan-out —
    * measuring the harness, not the operator.) */
  def scaledFuzzyDocsDf(spark: SparkSession, baseDir: String, factor: Int): DataFrame = {
    // The rotation is the identity whenever the copy index is a multiple
    // of lcm(26, 10) = 130 (and any two copies 130 apart share keys), so
    // past that the exactly-linear pair-growth claim silently breaks
    // back into cross-copy quadratic pairs. Bound the factor rather than
    // let the harness lie.
    require(factor >= 1 && factor <= 130,
      s"scaledFuzzyDocsDf factor must be in [1, 130] (alphabet rotation " +
        s"cycles at lcm(26,10)=130, collapsing cross-copy key distance); got $factor")
    val base = spark.read.parquet(s"$baseDir/documents.parquet")
    val copies = spark.range(factor).select(col("id").cast("int").as("copy"))
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val digits = "0123456789"
    def rot(s: String, k: Int): String = {
      val m = k % s.length; s.drop(m) + s.take(m)
    }
    val src = lower + lower.toUpperCase + digits
    def dst(c: Int): String =
      rot(lower, c) + rot(lower.toUpperCase, c) + rot(digits, c)
    val tx = (1 until factor)
      .foldLeft(when(col("copy") === 0, col("text"))) { (acc, c) =>
        acc.when(col("copy") === c, translate(col("text"), src, dst(c)))
      }
      .otherwise(col("text"))
    base.crossJoin(copies)
      .select(
        (col("doc_id") * factor + col("copy")).as("doc_id"),
        tx.as("text"),
        col("lang"), col("source"), col("n_chars"))
  }

  def scaledFuzzyDocs(spark: SparkSession, baseDir: String, workDir: String, factor: Int): String = {
    val out = s"$workDir/documents_fuzzy_x$factor"
    if (!graft.fs.Fs.exists(s"$out/_SUCCESS"))
      scaledFuzzyDocsDf(spark, baseDir, factor).write.mode("overwrite").parquet(out)
    out
  }

  /** Fuzzy-key family: timed on the prefix-decorrelated frames (base =
    * factor 1 of the same generator, so both scales pay the identical
    * per-doc prefix work). */
  private def fuzzyFamily(docs: DataFrame): Seq[(String, () => Long)] = Seq(
    "t100_fuzzy_key_pairs" -> (() =>
      graft.llm.Dedup.fuzzyKeyPairs(docs, "doc_id", "text",
        keyLen = 64, maxDist = 3).count()))

  private def embFamily(embs: DataFrame): Seq[(String, () => Long)] = Seq(
    "t72_semdedup" -> (() =>
      graft.llm.Dedup.semDedupPairs(embs, "vec_id", "embedding",
        nClusters = 8, minCos = 0.45).count()),
    "t74_semantic_decontaminate" -> (() =>
      graft.llm.Decontaminate.semanticOverlapPairs(embs,
        embs.filter(col("vec_id") % 50 === 0), "vec_id", "embedding", 0.35).count()))

  private def family(docs: DataFrame): Seq[(String, () => Long)] = Seq(
    "t69_rare_tokens" -> (() =>
      graft.llm.TextAnalysis.rareTokenStats(docs, "doc_id", "text", maxCount = 2).count()),
    "t75_bin_packing" -> (() =>
      graft.llm.Packing.packBinsBFD(docs, "doc_id",
        graft.functions.TextFunctions.tokenCount(col("text")), capacity = 128).count()),
    "t25_exact_dup_groups" -> (() =>
      graft.llm.Dedup.exactDupGroups(docs, "doc_id", "text").count()),
    "t26_jaccard_pairs" -> (() =>
      graft.llm.Dedup.jaccardNearDupPairs(docs, "doc_id", "text", n = 3, threshold = 0.8).count()),
    "t76_containment" -> (() =>
      graft.llm.Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.8).count()),
    // production form: hot container-side shingles capped. Registry
    // PARAMETERS (maxDf = 16) so slope numbers filed under the registry
    // key were measured at the registry's cap; the CORPUS still differs
    // (scaled plain documents here vs t122's boilerplate-injected
    // corpus, which exists to make the cap bite at sf0.01 — the scaled
    // frames exercise the same plan shape at 10x the rows).
    "t122_containment_capped" -> (() =>
      graft.llm.Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.8, maxDf = 16).count()),
    "t29_minhash_lsh" -> (() =>
      graft.llm.Dedup.minHashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 64, bands = 16, threshold = 0.8).count()),
    "t30_simhash" -> (() =>
      graft.llm.Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3).count()),
    // capped form only: uncapped winnowing is output-quadratic on hot
    // fingerprints by contract (167 s at ×10 in r11 — the scale-killer
    // the df-cap exists to remove), so the slope evidence times the
    // production path. Keyed by the REGISTRY name (t120) AND run at the
    // registry's parameters (maxDf = 16) so slope evidence
    // cross-references cleanly with SLOPES/CORRECTNESS; only the corpus
    // differs (scaled documents vs the sf0.01 base).
    "t120_winnowing_capped" -> (() =>
      graft.llm.Dedup.winnowingPairs(docs, "doc_id", "text",
        k = 16, w = 8, minShared = 8, maxDf = 16).count()),
    "t58_jaccard_clusters" -> { () =>
      val pairs = graft.llm.Dedup.jaccardNearDupPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      graft.llm.Dedup.nearDupClusters(pairs, "a_id", "b_id").count()
    },
    "t59_dedup_survivors" -> { () =>
      val pairs = graft.llm.Dedup.jaccardNearDupPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      graft.llm.Dedup.dedupByPairs(docs, "doc_id", pairs, "a_id", "b_id").count()
    },
    "t50_bpe_tokens" -> { () =>
      val merges = graft.llm.Bpe.train(docs, "text", numMerges = 24)
      graft.llm.Bpe.tokenCounts(docs, "doc_id", "text", merges).count()
    },
    "t103_chunk_pack" -> { () =>
      val chunks = graft.llm.Chunking.chunkWindows(docs, "doc_id", "text",
        chunkSize = 32, stride = 24)
      val keyed = chunks.select(
        (col("doc_id") * 4096 + col("chunk_id")).as("pack_key"),
        col("n_chunk_tokens"))
      graft.llm.Packing.packBlocks(keyed, "pack_key",
        col("n_chunk_tokens"), blockTokens = 64).count()
    })

  private def timeFamily(label: String, docs: DataFrame, nDocs: Long,
                         onlyPrefix: String = "", embs: Option[DataFrame] = None,
                         fuzzy: Option[DataFrame] = None): Unit = {
    val fam = family(docs) ++ embs.toSeq.flatMap(embFamily) ++
      fuzzy.toSeq.flatMap(fuzzyFamily)
    val results = fam.filter(_._1.startsWith(onlyPrefix)).map { case (name, run) =>
      val t0 = System.nanoTime()
      val rows = run()
      val sec = (System.nanoTime() - t0) / 1e9
      // release per-query persisted state (shared shingle projections)
      // so scaled-corpus caches don't pin executor storage session-long
      val spark = docs.sparkSession
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (name, sec, rows)
    }
    val qs = results.map { case (k, sec, rows) =>
      "\"" + k + "\":{\"sec\":" + sec + ",\"rows\":" + rows + "}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"scale_family","scale":"$label","n_docs":$nDocs,"total_sec":$total,"queries":$qs}""")
  }

  def main(args: Array[String]): Unit = {
    val baseDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/root/repo/target/scalebench"
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm-up

    val onlyPrefix = if (args.length > 3) args(3) else ""
    val repeat = if (args.length > 4) args(4).toInt else 1

    val base = spark.read.parquet(s"$baseDir/documents.parquet")
    val baseEmb = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val baseFuzzy = spark.read.parquet(scaledFuzzyDocs(spark, baseDir, workDir, 1))
    timeFamily("base", base, base.count(), onlyPrefix, Some(baseEmb), Some(baseFuzzy))

    val scaledPath = scaledDocs(spark, baseDir, workDir, factor)
    val scaled = spark.read.parquet(scaledPath)
    val scaledEmb = spark.read.parquet(scaledEmbeddings(spark, baseDir, workDir, factor))
    val scaledFuzzy = spark.read.parquet(scaledFuzzyDocs(spark, baseDir, workDir, factor))
    (1 to repeat).foreach { i =>
      timeFamily(s"x$factor#$i", scaled, scaled.count(), onlyPrefix,
        Some(scaledEmb), Some(scaledFuzzy))
    }
    spark.stop()
  }
}
