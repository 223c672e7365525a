package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Retrieval

/** BM25 retrieval gates: postings shape, hand-computed tf/df/idf scores
  * on a 3-doc corpus, tie-break determinism, the empty-corpus guard,
  * and partitioning independence of the ppm contract. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // d1 dl=3, d2 dl=2, d3 dl=4; N=3, totalTokens=9, avgdl=3
  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry date date cherry")).toDF("doc_id", "text")

  test("postings: per-(doc, term) tf over normalized whitespace tokens") {
    val p = Retrieval.postings(corpus, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(p == Set(
      (1L, "apple", 2L), (1L, "banana", 1L),
      (2L, "banana", 1L), (2L, "cherry", 1L),
      (3L, "cherry", 2L), (3L, "date", 2L)))
  }

  test("bm25TopK: hand-computed scores and ranks on the 3-doc corpus") {
    // query "apple cherry"; k1=1.2, b=0.75 so c1=2.2, c2=0.3, c3=0.9.
    // idf(apple) = ln((3-1+0.5)/1.5 + 1) = ln(8/3); idf(cherry) = ln(1.6).
    // term_ppm = floor(idf * tf*2.2 / (tf + 0.3 + 0.9*dl*3/9) * 1e6 + 1e-4):
    //   d1/apple  (tf=2, dl=3): 1348640
    //   d3/cherry (tf=2, dl=4): 590861
    //   d2/cherry (tf=1, dl=2): 544214
    val q = Seq((10L, "apple cherry")).toDF("qid", "qtext")
    val r = Retrieval.bm25TopK(corpus, "doc_id", "text", q, "qid", "qtext", k = 5)
      .orderBy($"rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (10L, 1L, 1348640L, 1L),
      (10L, 3L, 590861L, 2L),
      (10L, 2L, 544214L, 3L)))
  }

  test("bm25TopK: k truncates, equal-score ties break on ascending doc id") {
    // two identical docs -> identical ppm scores; tie must go to doc 4
    val d = Seq((4L, "pear plum"), (5L, "pear plum"), (6L, "kiwi kiwi"))
      .toDF("doc_id", "text")
    val q = Seq((1L, "pear")).toDF("qid", "qtext")
    val r = Retrieval.bm25TopK(d, "doc_id", "text", q, "qid", "qtext", k = 1)
      .select($"doc_id", $"rank").as[(Long, Long)].collect().toSeq
    assert(r == Seq((4L, 1L)))
  }

  test("bm25TopK: empty corpus returns an empty result (no NPE)") {
    val d = corpus.filter($"doc_id" < 0)
    val q = Seq((1L, "apple")).toDF("qid", "qtext")
    val r = Retrieval.bm25TopK(d, "doc_id", "text", q, "qid", "qtext", k = 3)
    assert(r.columns.toSeq == Seq("query_id", "doc_id", "score_ppm", "rank"))
    assert(r.count() == 0)
  }

  test("bm25 seed-expansion: classifier trained on retrieved docs generalizes") {
    // two-topic corpus; a "quantum physics" query retrieves topic-A
    // seeds; the NB classifier trained on (retrieved = positive) must
    // score the UNRETRIEVED topic-A doc above every topic-B doc —
    // the point of the retrieval → classifier selection loop
    import graft.llm.{Classifier, Retrieval}
    val d = Seq(
      (1L, "quantum physics energy quantum states"),
      (2L, "quantum field physics theory lecture"),
      (3L, "football soccer goal match referee"),
      (4L, "banana market price fruit vendor"),
      (5L, "physics quantum experiment lab bench")).toDF("doc_id", "text")
    val q = Seq((1L, "quantum physics")).toDF("qid", "qtext")
    val seed = Retrieval.bm25TopK(d, "doc_id", "text", q, "qid", "qtext", k = 2)
      .select($"doc_id").distinct().withColumn("y", lit(true))
    val labeled = d.join(seed, Seq("doc_id"), "left")
      .withColumn("y", coalesce($"y", lit(false)))
    val model = Classifier.nbTrain(labeled, "doc_id", "text", "y", nBuckets = 64)
    val prior = Classifier.nbPriorPpm(labeled, "y")
    val scores = Classifier.nbScore(d, model, prior, "doc_id", "text", nBuckets = 64)
      .select($"doc_id", $"score_ppm").as[(Long, Long)].collect().toMap
    val seedIds = seed.select($"doc_id").as[Long].collect().toSet
    assert(seedIds.subsetOf(Set(1L, 2L, 5L)) && seedIds.size == 2)
    val unretrievedA = (Set(1L, 2L, 5L) -- seedIds).head
    assert(scores(unretrievedA) > scores(3L) && scores(unretrievedA) > scores(4L),
      s"topic-A doc $unretrievedA should outscore topic-B docs: $scores")
  }

  test("rerank: shortlist reorders by the score column, ties break on doc id, unscored docs drop") {
    val shortlist = Seq(
      // (query_id, doc_id, score_ppm, rank) — two queries, k=3 BM25 order
      (10L, 1L, 900L, 1L), (10L, 2L, 800L, 2L), (10L, 3L, 700L, 3L),
      (20L, 2L, 600L, 1L), (20L, 4L, 500L, 2L), (20L, 5L, 400L, 3L)
    ).toDF("query_id", "doc_id", "score_ppm", "rank")
    val scores = Seq(
      (1L, 5L), (2L, 50L), (3L, 50L), (4L, -10L) // doc 5 unscored → drops
    ).toDF("doc_id", "s")
    val got = Retrieval.rerank(shortlist, scores, "s", k = 2)
      .orderBy($"query_id", $"rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      // q10: docs 2 and 3 tie at 50 → doc id ascending; doc 1 (s=5) falls to rank 3 (cut)
      (10L, 2L, 800L, 50L, 1L), (10L, 3L, 700L, 50L, 2L),
      // q20: doc 5 dropped (unscored), 2 beats 4
      (20L, 2L, 600L, 50L, 1L), (20L, 4L, 500L, -10L, 2L)))
    // k covers the whole shortlist → every scored doc ranks
    val all = Retrieval.rerank(shortlist, scores, "s", k = 10)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(all.length == 5 && !all.exists(_._2 == 5L))
  }

  test("bm25TopKFromIndex over a parquet-roundtripped index equals the inline path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25idx").toString
    Retrieval.postings(corpus, "doc_id", "text").write.mode("overwrite").parquet(dir)
    val q = Seq((10L, "apple cherry"), (11L, "date")).toDF("qid", "qtext")
    val inline = Retrieval.bm25TopK(corpus, "doc_id", "text", q, "qid", "qtext", k = 3)
      .orderBy($"query_id", $"rank").as[(Long, Long, Long, Long)].collect().toSeq
    val indexed = Retrieval.bm25TopKFromIndex(spark.read.parquet(dir),
        q, "qid", "qtext", k = 3)
      .orderBy($"query_id", $"rank").as[(Long, Long, Long, Long)].collect().toSeq
    assert(inline.nonEmpty && inline == indexed)
  }

  test("bm25TopKFromPrunedIndex equals the flat-index path exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25bkt").toString
    val post = Retrieval.postings(corpus, "doc_id", "text")
    Retrieval.writeBm25Index(post, dir, numBuckets = 4)
    val q = Seq((10L, "apple cherry"), (11L, "date"), (12L, "banana fig")).toDF("qid", "qtext")
    val flat = Retrieval.bm25TopKFromIndex(post, q, "qid", "qtext", k = 3)
      .orderBy($"query_id", $"rank").as[(Long, Long, Long, Long)].collect().toSeq
    val pruned = Retrieval.bm25TopKFromPrunedIndex(spark, dir, q, "qid", "qtext", k = 3)
      .orderBy($"query_id", $"rank").as[(Long, Long, Long, Long)].collect().toSeq
    assert(flat.nonEmpty && pruned == flat)
  }

  test("mergePostings: doc-level upsert equals a from-scratch rebuild") {
    // v1 corpus = docs 1,2; delta re-uploads doc 2 (revised) and adds
    // doc 3 — merge must drop ALL of doc 2's old postings, keep doc 1
    // untouched, and append the new rows; i.e. equal postings(v2).
    val v1 = corpus.filter($"doc_id" <= 2)
    val delta = Seq((2L, "banana banana fig"), (3L, "cherry date date cherry"))
      .toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "apple banana apple"),
      (2L, "banana banana fig"),
      (3L, "cherry date date cherry")).toDF("doc_id", "text")
    val merged = Retrieval.mergePostings(
        Retrieval.postings(v1, "doc_id", "text"),
        Retrieval.postings(delta, "doc_id", "text"))
      .as[(Long, String, Long)].collect().toSet
    val rebuilt = Retrieval.postings(v2, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(merged == rebuilt && merged.contains((2L, "banana", 2L))
      && !merged.exists(r => r._1 == 2L && r._2 == "cherry"))
  }

  test("mergePostings: query answers from the merged index equal the rebuilt index") {
    val v1 = corpus.filter($"doc_id" <= 2)
    val delta = Seq((2L, "banana banana fig"), (3L, "cherry date date cherry"))
      .toDF("doc_id", "text")
    val v2 = Seq(
      (1L, "apple banana apple"),
      (2L, "banana banana fig"),
      (3L, "cherry date date cherry")).toDF("doc_id", "text")
    val q = Seq((10L, "banana cherry"), (11L, "fig date")).toDF("qid", "qtext")
    val merged = Retrieval.mergePostings(
      Retrieval.postings(v1, "doc_id", "text"),
      Retrieval.postings(delta, "doc_id", "text"))
    val a = Retrieval.bm25TopKFromIndex(merged, q, "qid", "qtext", k = 3)
      .orderBy($"query_id", $"rank").as[(Long, Long, Long, Long)].collect().toSeq
    val b = Retrieval.bm25TopK(v2, "doc_id", "text", q, "qid", "qtext", k = 3)
      .orderBy($"query_id", $"rank").as[(Long, Long, Long, Long)].collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("mergePostingsForDelta: a re-upload that tokenizes to zero terms deletes its ghost postings") {
    val v1 = corpus // docs 1,2,3
    // doc 2's revision has NULL text -> tokenizes to ZERO postings rows
    // (whitespace-only text still yields one empty-string term, in both
    // engines); mergePostings alone would keep doc 2's old rows forever
    val delta = Seq((2L, null: String), (4L, "fig tree")).toDF("doc_id", "text")
    val merged = Retrieval.mergePostingsForDelta(
        Retrieval.postings(v1, "doc_id", "text"), delta, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    val rebuilt = Retrieval.postings(
        v1.filter($"doc_id" =!= 2L).unionByName(delta), "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(merged == rebuilt && !merged.exists(_._1 == 2L)
      && merged.contains((4L, "fig", 1L)))
  }

  test("mergeGroups is idempotent under batch replay (same version re-applied)") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_replay").toString
    val p1 = Retrieval.postings(corpus.filter($"doc_id" <= 2), "doc_id", "text")
    val n1 = graft.sinks.ParquetMergeSink.mergeGroups(spark, dir, "idx", p1,
      Seq("doc_id"), version = 1L)
    // a crashed foreachBatch replays the SAME (batch, version) after
    // the pointer already swapped — must be a no-op, not a
    // read-while-overwriting failure
    val n1again = graft.sinks.ParquetMergeSink.mergeGroups(spark, dir, "idx", p1,
      Seq("doc_id"), version = 1L)
    assert(n1 == n1again)
    val p2 = Retrieval.postings(corpus.filter($"doc_id" === 3), "doc_id", "text")
    val n2 = graft.sinks.ParquetMergeSink.mergeGroups(spark, dir, "idx", p2,
      Seq("doc_id"), version = 2L)
    assert(n2 > n1)
    val cur = graft.sinks.ParquetMergeSink.readCurrent(spark, dir, "idx").get
      .as[(Long, String, Long)].collect().toSet
    val all = Retrieval.postings(corpus, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(cur == all)
  }

  test("PostingsStream: maintained index equals a from-scratch rebuild; versions time-travel") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_pstream").toString
    // batch 1: docs 1,2 (original); batch 2: doc 2 revised + doc 3 new —
    // the group-upsert must drop doc 2's old postings across batches.
    // coalesce(1): with maxFilesPerTrigger=1 a batch is ONE FILE, and
    // the v1 time-travel assertion below needs batch 1 == exactly in1
    corpus.filter($"doc_id" <= 2).coalesce(1).write.parquet(s"$dir/in1")
    Seq((2L, "banana banana fig"), (3L, "cherry date date cherry"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/in2")
    val schema = spark.read.parquet(s"$dir/in1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in*")
    val q = graft.streaming.PostingsStream.start(
      stream, "doc_id", "text", s"$dir/wh", "postings", s"$dir/ckpt")
    q.awaitTermination(60000)
    val v2docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana banana fig"),
      (3L, "cherry date date cherry")).toDF("doc_id", "text")
    val maintained = graft.sinks.ParquetMergeSink
      .readCurrent(spark, s"$dir/wh", "postings").get
      .as[(Long, String, Long)].collect().toSet
    val rebuilt = Retrieval.postings(v2docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(maintained == rebuilt && maintained.nonEmpty)
    // time travel: version 1 is the batch-1 index (doc 2 unrevised)
    val v1 = graft.sinks.ParquetMergeSink
      .readVersion(spark, s"$dir/wh", "postings", 1L).get
      .as[(Long, String, Long)].collect().toSet
    val b1 = Retrieval.postings(corpus.filter($"doc_id" <= 2), "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(v1 == b1 && v1.exists(r => r._1 == 2L && r._2 == "cherry"))
    // and online queries against the maintained index answer as rebuilt
    val qs = Seq((10L, "banana fig")).toDF("qid", "qtext")
    val a = Retrieval.bm25TopKFromIndex(
        graft.sinks.ParquetMergeSink.readCurrent(spark, s"$dir/wh", "postings").get,
        qs, "qid", "qtext", k = 3)
      .orderBy($"rank").as[(Long, Long, Long, Long)].collect().toSeq
    val b = Retrieval.bm25TopK(v2docs, "doc_id", "text", qs, "qid", "qtext", k = 3)
      .orderBy($"rank").as[(Long, Long, Long, Long)].collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("bm25TopK: scores are partitioning-independent (ppm contract)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = d.filter($"doc_id" % 20 === 0)
      .select($"doc_id".as("qid"), substring($"text", 1, 40).as("qtext"))
    def run(nPart: Int) =
      Retrieval.bm25TopK(d.repartition(nPart), "doc_id", "text",
          q.repartition(3), "qid", "qtext", k = 5)
        .orderBy($"query_id", $"rank")
        .as[(Long, Long, Long, Long)].collect().toSeq
    val a = run(2)
    val b = run(7)
    assert(a.nonEmpty && a == b)
  }
}
