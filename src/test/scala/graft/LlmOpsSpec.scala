package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.llm.{Dedup, TextAnalysis}

/** Semantic tests for the round-8 LLM-pipeline operators — independent
  * of the DuckDB/literal oracles, which only see the sf corpus. */
class LlmOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // ---- SemDeDup --------------------------------------------------------

  test("semDedupPairs is a co-clustered subset of the exact pair set, with equal cosines") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Dedup.embeddingNearDupPairs(embs, "vec_id", "embedding", 0.45)
      .select($"a_id", $"b_id", floor($"cos_sim" * 1e6).cast("long").as("ppm"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val sem = Dedup.semDedupPairs(embs, "vec_id", "embedding", nClusters = 4, minCos = 0.45)
      .select($"a_id", $"b_id", floor($"cos_sim" * 1e6).cast("long").as("ppm"))
      .as[(Long, Long, Long)].collect()
    assert(sem.nonEmpty, "cluster-scoped search found nothing at sf0.001")
    sem.foreach { case (a, b, ppm) =>
      assert(exact.get((a, b)).contains(ppm),
        s"($a,$b) ppm=$ppm not in / not equal to the exact pair set")
    }
  }

  test("semDedupPairs with one cluster equals the exact pair set") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Dedup.embeddingNearDupPairs(embs, "vec_id", "embedding", 0.45)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val sem = Dedup.semDedupPairs(embs, "vec_id", "embedding", nClusters = 1, minCos = 0.45)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(sem == exact)
  }

  // ---- Gopher filter ----------------------------------------------------

  test("gopherFilter: each rule fires, in declaration order") {
    // mean word length must sit inside [4.3, 4.7] for later rules to be
    // reachable — mixes of 4- and 5-char words land at ~4.5
    def mix(n: Int, tag: String) =
      Seq.tabulate(n)(i => if (i % 2 == 0) f"$tag${i}%03d" else f"$tag${i}%04d")
    val docs = Seq(
      (1L, "tiny doc"),                                          // too_short (also no stopwords — order wins)
      (2L, ("the words thing other " * 10).trim),                // repetitive (dup 2-grams; words in range)
      (3L, "the " + Seq.tabulate(30)(i => s"internationalization$i").mkString(" ")), // word_len_high
      (4L, "a " + Seq.tabulate(30)(i => s"w$i").mkString(" ")),   // word_len_low
      (5L, mix(30, "q").mkString(" "))                            // no_stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFilter(docs, "doc_id", "text")
      .select($"doc_id", $"reason", $"keep").as[(Long, String, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ("too_short", false))
    assert(got(2L) == ("repetitive", false))
    assert(got(3L) == ("word_len_high", false))
    assert(got(4L) == ("word_len_low", false))
    assert(got(5L) == ("no_stopwords", false))
  }

  test("gopherFilter: too_long fires and a clean doc keeps") {
    def mix(n: Int, tag: String) =
      Seq.tabulate(n)(i => if (i % 2 == 0) f"$tag${i}%03d" else f"$tag${i}%04d")
    val docs = Seq(
      (1L, "the and of " + mix(40, "k").mkString(" ")),
      (2L, "the " + Seq.tabulate(60)(i => s"word$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFilter(docs, "doc_id", "text", maxTokens = 50)
      .select($"doc_id", $"reason", $"keep").as[(Long, String, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._1 == "ok" && got(1L)._2)
    assert(got(2L) == ("too_long", false))
  }

  // ---- rare tokens -------------------------------------------------------

  test("rareTokenStats counts occurrences, not types, and the ppm is exact") {
    val docs = Seq(
      (1L, "alpha alpha beta common common common"),
      (2L, "common common gamma gamma gamma")
    ).toDF("doc_id", "text")
    // corpus counts: alpha 2, beta 1, common 5, gamma 3 → rare (≤2): alpha, beta
    val got = TextAnalysis.rareTokenStats(docs, "doc_id", "text", maxCount = 2)
      .orderBy("doc_id")
      .select($"n_tokens", $"n_rare", $"rare_frac_ppm")
      .as[(Long, Long, Long)].collect()
    assert(got(0) == ((6L, 3L, 500000L)))  // alpha×2 + beta×1 of 6
    assert(got(1) == ((5L, 0L, 0L)))
  }

  // ---- unigram LM scoring --------------------------------------------------

  test("unigramLogProbPpm matches a driver-side reference and ranks rare-heavy docs lower") {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common rareword"),
      (3L, "rareword otherrare")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProbPpm(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // counts: common 5, rareword 2, otherrare 1, N = 8
    def lp(c: Long, n: Long = 8) = math.floor(math.log(c.toDouble / n) / math.log(2.0) * 1e6).toLong
    def avg(sum: Long, n: Long) = sum / n // JVM / truncates toward zero, like Spark DIV
    assert(got(1L) == ((4L, avg(4 * lp(5), 4))))
    assert(got(2L) == ((2L, avg(lp(5) + lp(2), 2))))
    assert(got(3L) == ((2L, avg(lp(2) + lp(1), 2))))
    // rare-token-heavy docs score lower (more negative)
    assert(got(3L)._2 < got(2L)._2 && got(2L)._2 < got(1L)._2)
  }

  test("bigramLogProbPpm: add-one smoothed counts, docs without bigrams drop") {
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b"),
      (3L, "x")
    ).toDF("doc_id", "text")
    // corpus bigrams: (a,b)×3 [2 in doc 1, 1 in doc 2], (b,a)×1; ctx:
    // a→3, b→1; V = 3 (a, b, x — the 1-token doc still feeds the vocab)
    def lp(c12: Long, c1: Long) =
      math.floor(math.log((c12 + 1.0) / (c1 + 3.0)) / math.log(2.0) * 1e6 + 1e-4).toLong
    val pAB = lp(3, 3) // log2(4/6)
    val pBA = lp(1, 1) // log2(2/4) = exactly -1e6
    assert(pBA == -1000000L)
    val got = TextAnalysis.bigramLogProbPpm(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!got.contains(3L)) // no bigram evidence → no row
    assert(got(1L) == ((3L, (2 * pAB + pBA) / 3)))
    assert(got(2L) == ((1L, pAB)))
  }

  // ---- containment --------------------------------------------------------

  test("containmentPairs finds quotes that Jaccard misses, in the right direction") {
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val long = ("many unrelated words " * 20) + quote + (" trailing different content " * 20)
    val docs = Seq(
      (1L, quote),                     // contained in 2
      (2L, long),                      // container
      (3L, "completely different text about spark query engines and joins")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs") // quote ⊂ long, never the reverse
    val jac = Dedup.jaccardNearDupPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(jac.isEmpty, s"Jaccard should miss the quote: $jac")
  }

  test("containmentPairs equals the naive all-pairs definition on a small corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val sets = docs.select($"doc_id",
      graft.functions.TextFunctions.shingleSet($"text", 3).as("sh"))
    val a = sets.select($"doc_id".as("a_id"), $"sh".as("a_sh"))
    val b = sets.select($"doc_id".as("b_id"), $"sh".as("b_sh"))
    val naive = a.crossJoin(b).filter($"a_id" =!= $"b_id")
      .withColumn("c", size(array_intersect($"a_sh", $"b_sh")).cast("double") /
        size($"a_sh").cast("double"))
      .filter($"c" >= 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val got = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("containment df-cap: capped ⊆ uncapped; equal when no shingle is hot; boilerplate-only pairs dropped") {
    // 6 carrier docs share a 12-word boilerplate trailer; 2 "quote" docs
    // are ~91% boilerplate (contained in EVERY carrier uncapped — the
    // df² candidate pathology); docs 20/21 are a genuine quote pair.
    val boiler = "this page is licensed under the creative commons attribution share alike"
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val docs = ((0L to 5L).map { i =>
      (i, s"unique$i alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i iota$i $boiler")
    } ++ Seq(
      (10L, s"$boiler uniqqa"),
      (11L, s"$boiler uniqqb"),
      (20L, quote),
      (21L, s"salad opening words here $quote and trailing salad content words")
    )).toDF("doc_id", "text")
    def pairSet(maxDf: Int) =
      Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.8, maxDf = maxDf)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val uncapped = pairSet(Int.MaxValue)
    val loose = pairSet(8)  // boiler df = 8 (6 carriers + 2 quotes): not hot at cap 8
    val tight = pairSet(4)  // boiler trigrams (df 8) are dropped
    assert(loose == uncapped, "cap at max df must be a no-op")
    assert(tight.subsetOf(uncapped), "capped output must be a subset")
    assert(tight.contains((20L, 21L)), "genuine quote pair must survive the cap")
    assert(uncapped.exists(p => p._1 >= 10L && p._1 <= 11L),
      "uncapped must see the boilerplate-only quote-doc pairs")
    assert(!tight.exists(p => p._1 >= 10L && p._1 <= 11L),
      "boilerplate-only pairs must be dropped by the cap")
  }

  test("incremental containment: delta probe == rebuild restricted to delta-touching pairs (incl. re-uploads and cap)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val revText = when($"doc_id" % 7 === 0,
      concat($"text", lit(" containment revision trailer"))).otherwise($"text")
    val halves = docs.filter($"doc_id" < 50).select(
      ($"doc_id" + 200000).as("doc_id"),
      expr("substring(text, 1, cast(n_chars div 2 as int))").as("text"))
    val corpus = docs.select($"doc_id", $"text") // v1, original text
    val delta = docs.filter($"doc_id" % 7 === 0)
      .select($"doc_id", revText.as("text")) // re-uploads with CHANGED text
      .unionByName(halves)                   // plus new docs
    val updated = docs.select($"doc_id", revText.as("text")).unionByName(halves)
    val deltaIds = delta.select("doc_id").as[Long].collect().toSet
    for (cap <- Seq(Int.MaxValue, 16)) {
      val full = Dedup.containmentPairs(updated, "doc_id", "text",
          n = 3, threshold = 0.8, maxDf = cap)
        .as[(Long, Long, Double)].collect().toSet
      val expected = full.filter(p => deltaIds(p._1) || deltaIds(p._2))
      val got = Dedup.containmentDeltaPairs(delta, "doc_id", "text",
          Dedup.containmentIndex(corpus, "doc_id", "text", n = 3),
          n = 3, threshold = 0.8, maxDf = cap)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected, s"cap=$cap")
      assert(got.nonEmpty, s"cap=$cap produced no pairs — test data too thin")
    }
  }

  test("streaming containment: accumulated micro-batch pairs equal the batch run; index == rebuilt") {
    import java.nio.file.Files
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val snippet = "winnowing and containment indexes maintain themselves incrementally"
    val docs = Seq(
      (0L, quote),                                                    // contained in 1 (and later 3, 6)
      (1L, s"alpha opening salad words around here $quote beta closing salad words follow now"),
      (2L, "gamma text sharing nothing with any other document in this corpus at all"),
      (3L, s"delta batch lead-in salad content $quote epsilon trailing salad content here"), // cross-batch container of 0
      (4L, snippet),                                                  // contained in 5, within batch 2
      (5L, s"zeta prefix salad tokens before $snippet eta suffix salad tokens after")
    ).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_cstream").toString
    docs.filter($"doc_id" <= 2).write.parquet(s"$dir/in1")
    docs.filter($"doc_id" >= 3).write.parquet(s"$dir/in2")
    val schema = spark.read.parquet(s"$dir/in1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in*")
    val q = graft.streaming.ContainmentStream.start(
      stream, "doc_id", "text", s"$dir/wh", "cont_idx", s"$dir/ckpt",
      n = 3, threshold = 0.8) {
      (pairs, _) => pairs.write.mode("append").parquet(s"$dir/out")
    }
    // assert the termination flag with headroom: a discarded false
    // under full-suite CPU contention silently truncates the output
    // and fails the equality below with a misleading diff
    assert(q.awaitTermination(240000), "stream did not terminate in 240s")
    val streamed = spark.read.parquet(s"$dir/out")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val batch = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    assert(batch.contains((0L, 3L)), "expected a cross-batch containment pair")
    assert(batch.contains((4L, 5L)), "expected a within-batch containment pair")
    // maintained index equals a from-scratch containmentIndex
    val cur = graft.sinks.ParquetMergeSink.readCurrent(spark, s"$dir/wh", "cont_idx").get
    val rebuilt = Dedup.containmentIndex(docs, "doc_id", "text", n = 3)
    assert(cur.select($"id", $"sz").as[(Long, Int)].collect().toSet ==
      rebuilt.select($"id", $"sz").as[(Long, Int)].collect().toSet)
    assert(cur.select($"id", explode($"sh")).as[(Long, String)].collect().toSet ==
      rebuilt.select($"id", explode($"sh")).as[(Long, String)].collect().toSet)
    // and answers a fresh delta exactly — doc 6 contains the quote
    val d6 = Seq((6L, s"theta salad opening words $quote iota salad closing words"))
      .toDF("doc_id", "text")
    val next = Dedup.containmentDeltaPairs(d6, "doc_id", "text", cur,
        n = 3, threshold = 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(next.contains((0L, 6L)) && next.forall(p => p._1 == 6L || p._2 == 6L))
  }

  test("store-backed streaming containment: pairs == batch across a RESTART; store == unified rebuild") {
    import java.nio.file.Files
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val snippet = "winnowing and containment indexes maintain themselves incrementally"
    val docs = Seq(
      (0L, quote),
      (1L, s"alpha opening salad words around here $quote beta closing salad words follow now"),
      (2L, "gamma text sharing nothing with any other document in this corpus at all"),
      (3L, s"delta batch lead-in salad content $quote epsilon trailing salad content here"),
      (4L, snippet),
      (5L, s"zeta prefix salad tokens before $snippet eta suffix salad tokens after")
    ).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_cstream_idx").toString
    val root = s"$dir/store"
    def run(): Unit = {
      val schema = docs.schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$dir/in*")
      val q = graft.streaming.ContainmentStream.startIndexed(
        stream, "doc_id", "text", root, s"$dir/ckpt", n = 3, threshold = 0.8) {
        (pairs, _) => pairs.write.mode("append").parquet(s"$dir/out")
      }
      assert(q.awaitTermination(240000), "stream did not terminate in 240s")
    }
    // run 1 drains batch 1; the process then "restarts" — run 2 with the
    // SAME checkpoint must process only the new file (exactly-once) and
    // probe the STORE's committed v1 for cross-batch pairs
    docs.filter($"doc_id" <= 2).write.parquet(s"$dir/in1")
    run()
    // one version per drained micro-batch (a parquet write may span
    // several part files → several batches); what matters is that a
    // version committed and the restart ADVANCES it
    val v1 = graft.llm.NearDupIndexStore.currentVersion(root)
    assert(v1.nonEmpty)
    docs.filter($"doc_id" >= 3).write.parquet(s"$dir/in2")
    run()
    assert(graft.llm.NearDupIndexStore.currentVersion(root).exists(_ > v1.get))
    val streamed = spark.read.parquet(s"$dir/out")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val batch = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    assert(batch.contains((0L, 3L)), "expected a cross-batch containment pair")
    // the committed store answers a fresh delta == the unified-rebuild
    // reference (doc 6 contains the quote)
    val d6 = Seq((6L, s"theta salad opening words $quote iota salad closing words"))
      .toDF("doc_id", "text")
    val next = graft.llm.NearDupIndexStore.containmentPairsForDelta(
        spark, root, d6, "doc_id", "text")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val refRoot = s"$dir/ref"
    graft.llm.Dedup.writeContainmentIndex(spark, docs, "doc_id", "text",
      refRoot, numBuckets = 16)
    val want = Dedup.containmentDeltaPairsIndexed(spark, refRoot, d6,
        "doc_id", "text")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(next == want && next.contains((0L, 6L)))
    Seq(d6).foreach(d => graft.llm.NearDupIndexStore.releaseProbeCache(root, d, "doc_id", "text"))
    Dedup.releaseIndexedProbeCache(refRoot, d6, "doc_id", "text")
  }

  // ---- URL hosts ----------------------------------------------------------

  test("urlHosts extracts hosts only, path and bare domains excluded") {
    val got = Seq(
      "see https://a.example.org/x/y?z=1 and http://b.net plus bare.domain.com",
      "no urls here",
      "edge https://end.io"
    ).toDF("text").select(TextFunctions.urlHosts($"text").as("h"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a.example.org", "b.net"))
    assert(got(1) == Seq())
    assert(got(2) == Seq("end.io"))
  }

  // ---- C4 filter ----------------------------------------------------------

  test("c4Filter: every page rule fires in declaration order; line rules drop lines") {
    val good = "this is a perfectly ordinary sentence of prose." // 8 words, terminal .
    val docs = Seq(
      (1L, s"$good\n$good\n$good"),                         // ok, all lines kept
      (2L, s"$good\nhas lorem ipsum inside it today.\n$good"), // lorem_ipsum
      (3L, s"$good\ncode { block } here it comes now.\n$good"), // curly_brace
      (4L, s"$good\nplease read our privacy policy first ok.\n$good"), // policy
      (5L, "too few. sentences?"),                          // too_few_sentences (2 < 3)
      (6L, "no terminal punctuation on this line at all\nshort one.\nanother line that! never? ends..." // 3 sentences but...
        + "\nuses javascript for the menu rendering."),     // ...line rules drop all but one
      (7L, s"$good\nthis javascript line gets dropped fine.\ntiny line.\n$good")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.c4Filter(docs, "doc_id", "text")
      .select($"doc_id", $"reason", $"keep", $"n_lines", $"n_lines_kept")
      .as[(Long, String, Boolean, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == (("ok", true, 3L, 3L)))
    assert(got(2L)._1 == "lorem_ipsum" && !got(2L)._2)
    assert(got(3L)._1 == "curly_brace")
    assert(got(4L)._1 == "policy")
    assert(got(5L)._1 == "too_few_sentences")
    // doc 6: line 1 no terminal punct, line 2 only 3 words ("short one." is 2),
    // line 4 mentions javascript → only line 3 survives; page has >= 3 sentence
    // delimiters so it keeps with 1/4 lines
    assert(got(6L) == (("ok", true, 4L, 1L)))
    assert(got(7L) == (("ok", true, 4L, 2L)))
  }

  test("consecutiveOverlapF1: hand-computed F1 on a planted serial near-dup") {
    val docs = Seq(
      // src a: docs 1→2 share most 3-grams; 2→3 share none
      (1L, "one two three four five", "a"),
      (2L, "one two three four six", "a"),
      (3L, "totally different words here now", "a"),
      // src b: single doc → no pair
      (9L, "lonely document in its own source", "b")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.consecutiveOverlapF1(docs, "doc_id", "text", "source", n = 3)
      .select($"a_id", $"b_id", $"n_shared", $"p_ppm", $"r_ppm", $"f1_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc1 grams {one two three, two three four, three four five},
    // doc2 grams {one two three, two three four, three four six} → 2 shared
    assert(got(1L) == ((1L, 2L, 2L, 666666L, 666666L, 666666L)))
    assert(got(2L)._3 == 0L && got(2L)._6 == 0L)
    assert(!got.contains(3L) && !got.contains(9L)) // last-in-source has no pair
  }

  test("consecutiveOverlapF1 is partitioning-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextAnalysis.consecutiveOverlapF1(docs, "doc_id", "text", "source")
      .collect().toSet
    val b = TextAnalysis.consecutiveOverlapF1(docs.repartition(13), "doc_id", "text", "source")
      .collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("c4Filter: no_lines fires when every line is dropped but sentences abound") {
    val docs = Seq((1L, "word! word! word! word!\nalso too short here.")).toDF("doc_id", "text")
    // both lines < 5 words → kept = 0; 5 sentence delimiters → page passes
    // the sentence rule, so the no_lines rule is the one that records
    val got = TextAnalysis.c4Filter(docs, "doc_id", "text")
      .select($"reason", $"keep", $"text").as[(String, Boolean, String)].head()
    assert(got == (("no_lines", false, "")))
  }
}
