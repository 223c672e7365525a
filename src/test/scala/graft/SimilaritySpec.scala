package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(-1.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f))
  ).toDF("vec_id", "embedding")

  test("bruteTopK returns exact cosine order, excluding self") {
    val out = Similarity.bruteTopK(vecs, vecs.filter($"vec_id" === 0L), "vec_id", "embedding", 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1, 1L), (2, 4L), (3, 2L)))
  }

  test("ivfTopK with full probing matches brute force") {
    val brute = Similarity.bruteTopK(vecs, vecs.filter($"vec_id" < 2), "vec_id", "embedding", 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" < 2), "vec_id", "embedding",
        k = 3, nCells = 5, nprobe = 5)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(ivf == brute)
  }

  test("k-means IVF: centroids converge and recall beats naive-cell IVF") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = embs.filter($"vec_id" < 10)
    val brute = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val km = Similarity.ivfKmeansTopK(embs, queries, "vec_id", "embedding",
        k = 5, nCells = 8, nprobe = 4, iters = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(km.subsetOf(brute.union(km))) // sanity
    val recall = km.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"k-means IVF recall $recall")
    // centroids deterministic across invocations
    val c1 = Similarity.kMeansCentroids(embs, "vec_id", "embedding", 4, 2).map(_._2.toSeq).toSeq
    val c2 = Similarity.kMeansCentroids(embs, "vec_id", "embedding", 4, 2).map(_._2.toSeq).toSeq
    assert(c1 == c2)
  }

  test("ivfAssignedIndex: incremental group-merge equals full re-assignment; search agrees") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val v1 = embs.filter($"vec_id" % 5 =!= 0)
    val delta = embs.filter($"vec_id" % 5 === 0)
    // centroids train on v1 only and are REUSED for the delta
    val cents = Similarity.kMeansCentroids(v1, "vec_id", "embedding", 8, 2)
    val merged = graft.operators.Relational.mergeReplaceGroups(
      Similarity.ivfAssignedIndex(v1, "vec_id", "embedding", cents),
      Similarity.ivfAssignedIndex(delta, "vec_id", "embedding", cents),
      Seq("vec_id"))
    val rebuilt = Similarity.ivfAssignedIndex(embs, "vec_id", "embedding", cents)
    val mA = merged.select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    val rA = rebuilt.select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    assert(mA == rA && mA.nonEmpty)
    // and search over the merged index equals search over the rebuilt one
    val q = embs.filter($"vec_id" < 5)
    def run(idx: org.apache.spark.sql.DataFrame) =
      Similarity.ivfSearchAssigned(idx, cents, q, "vec_id", "embedding", k = 5, nprobe = 3)
        .select($"query_id", $"rank", $"neighbor_id").as[(Long, Int, Long)]
        .collect().toSet
    assert(run(merged) == run(rebuilt) && run(merged).nonEmpty)
  }

  test("adaptive nprobe: per-query recall >= fixed minProbe; full escalation == full probing") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kMeansCentroids(embs, "vec_id", "embedding", 8, 2)
    val idx = Similarity.ivfAssignedIndex(embs, "vec_id", "embedding", cents)
    val q = embs.filter($"vec_id" < 10)
    val brute = Similarity.bruteTopK(embs, q, "vec_id", "embedding", k = 5)
    def recall(ann: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Similarity.recallAtK(ann, brute)
        .select($"query_id", $"n_hits").as[(Long, Long)].collect().toMap
    val fixed = recall(Similarity.ivfSearchAssigned(idx, cents, q,
      "vec_id", "embedding", k = 5, nprobe = 2))
    val adaptive = recall(Similarity.ivfSearchAssignedAdaptive(idx, cents, q,
      "vec_id", "embedding", k = 5, minProbe = 2, maxProbe = 6, ratioPpm = 3000000L))
    // escalation is monotone: never worse than the fixed-minProbe search
    assert(adaptive.forall { case (qid, h) => h >= fixed(qid) })
    // ratio wide enough to keep every cell == probing all cells == brute
    val full = recall(Similarity.ivfSearchAssignedAdaptive(idx, cents, q,
      "vec_id", "embedding", k = 5, minProbe = 8, maxProbe = 8, ratioPpm = 1000000L))
    assert(full.values.forall(_ == 5L))
  }

  test("ivfCellStats: hand-computed per-cell integer mean distances") {
    // centroids (1,0) and (0,1); vectors split 2/1 with known d²:
    //   (1,0) -> cell 0, d² = 0; (0.6,0.8) -> cell 1 (d²=0.4 vs 1.0... )
    //   (0.6,0.8): d² to (1,0) = 0.16+0.64 = 0.8; to (0,1) = 0.36+0.04 = 0.4 -> cell 1
    //   (0,1)     -> cell 1, d² = 0
    val cents = Array((0, Array(1.0, 0.0)), (1, Array(0.0, 1.0)))
    val vs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.6f, 0.8f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val r = Similarity.ivfCellStats(vs, "vec_id", "embedding", cents)
      .orderBy($"cell").as[(Int, Long, Long)].collect().toSeq
    // cell 0: n=1 mean=0; cell 1: n=2, d² ppm = {400000, 0} -> mean 200000
    assert(r == Seq((0, 1L, 0L), (1, 2L, 200000L)))
  }

  test("IvfStream: streamed assignment equals batch; drift stats read off the current version") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_ivfstream").toString
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val v1 = embs.filter($"vec_id" % 5 =!= 0)
    // centroids persist once, trained on v1
    Similarity.kMeansIndex(v1, "vec_id", "embedding", 8, 2)
      .write.parquet(s"$dir/centroids")
    val cents = Similarity.centroidsOf(spark.read.parquet(s"$dir/centroids"))
    // two micro-batches: v1 then the delta
    v1.write.parquet(s"$dir/in1")
    embs.filter($"vec_id" % 5 === 0).write.parquet(s"$dir/in2")
    val schema = spark.read.parquet(s"$dir/in1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in*")
    val q = graft.streaming.IvfStream.start(stream, "vec_id", "embedding",
      s"$dir/centroids", s"$dir/wh", "ivf", s"$dir/ckpt")
    q.awaitTermination(60000)
    val maintained = graft.sinks.ParquetMergeSink
      .readCurrent(spark, s"$dir/wh", "ivf").get
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    val rebuilt = Similarity.ivfAssignedIndex(embs, "vec_id", "embedding", cents)
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    assert(maintained == rebuilt && maintained.nonEmpty)
  }

  test("ivfTopK with partial probing returns deterministic rows") {
    val a = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0L), "vec_id", "embedding",
      k = 2, nCells = 3, nprobe = 2).collect().map(_.toSeq)
    val b = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0L), "vec_id", "embedding",
      k = 2, nCells = 3, nprobe = 2).collect().map(_.toSeq)
    assert(a.nonEmpty && a.toSeq == b.toSeq)
    // probing fewer cells can only shrink the candidate set (recall < 1)
    val full = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 0L), "vec_id", "embedding",
      k = 2, nCells = 3, nprobe = 3).collect()
    assert(a.length <= full.length)
  }

  test("PQ with one code per point recovers the exact L2 ranking") {
    // ksub = n: every vector becomes its own centroid, codes are exact,
    // so ADC distance == true distance and pqTopK == bruteTopKL2 — the
    // k=1-equals-exact style semantic gate (SemDeDup precedent)
    val brute = Similarity.bruteTopKL2(vecs, vecs, "vec_id", "embedding", k = 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    val pq = Similarity.pqTopK(vecs, vecs, "vec_id", "embedding",
        k = 3, m = 1, ksub = 5, iters = 3)
      .select("query_id", "rank", "neighbor_id").as[(Long, Int, Long)].collect().toSet
    assert(pq == brute)
  }

  test("pruned cell-bucketed assignment search equals the flat adaptive search") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = embs.filter($"vec_id" < 8)
    val cents = Similarity.kMeansCentroids(embs, "vec_id", "embedding", 8, 2)
    val assigned = Similarity.ivfAssignedIndex(embs, "vec_id", "embedding", cents)
    val root = java.nio.file.Files.createTempDirectory("graft_ivfprune").toString
    Similarity.writeAssignedPruned(assigned, "vec_id", "embedding", s"$root/a", numBuckets = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"rank", $"neighbor_id", $"cos_sim")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val flat = Similarity.ivfSearchAssignedAdaptive(assigned, cents, q,
      "vec_id", "embedding", k = 5, minProbe = 2, maxProbe = 5)
    val pruned = Similarity.ivfSearchPrunedAdaptive(spark, s"$root/a", cents, q,
      "vec_id", "embedding", k = 5, minProbe = 2, maxProbe = 5)
    // pruning changes what is read, never the answer — including cos bits
    assert(rows(pruned).nonEmpty && rows(pruned) == rows(flat))
  }

  test("PQ quality improves with codebook size; persisted index round-trips") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = embs.filter($"vec_id" < 10)
    val brute = Similarity.bruteTopKL2(embs, queries, "vec_id", "embedding", k = 10)
    def meanRecallPpm(m: Int, ksub: Int, refine: Int): Double = {
      val ann = Similarity.pqTopK(embs, queries, "vec_id", "embedding",
        k = 10, m = m, ksub = ksub, iters = 2, refine = refine)
      Similarity.recallAtK(ann, brute).agg(org.apache.spark.sql.functions.avg("recall_ppm"))
        .head().getDouble(0)
    }
    val raw = meanRecallPpm(m = 8, ksub = 16, refine = 1)
    val refined = meanRecallPpm(m = 8, ksub = 16, refine = 4)
    info(s"raw ADC recall@10 ppm: $raw, refined(4x): $refined")
    // exact re-rank of the ADC shortlist can only help: every true
    // neighbor inside the shortlist lands in the top-k afterward
    assert(refined >= raw, s"re-rank must not lose recall: $refined < $raw")
    assert(refined >= 500000.0, s"refined PQ recall@10 below 0.5: $refined")

    // joint (one-pass) training must equal m independent per-subspace
    // k-means runs bit-for-bit — same seeds, decimal means, and
    // vanishing-cell behavior — or the literal oracle drifts
    val joint = Similarity.pqCodebooks(embs, "vec_id", "embedding", m = 4, ksub = 8, iters = 2)
    val perSub = (0 until 4).map { j =>
      val sub = embs.select($"vec_id",
        org.apache.spark.sql.functions.slice($"embedding", j * 16 + 1, 16).as("embedding"))
      Similarity.kMeansCentroids(sub, "vec_id", "embedding", k = 8, iters = 2).map(_._2)
    }
    assert(joint.length == 4)
    joint.zip(perSub).foreach { case (a, b) =>
      assert(a.length == b.length)
      a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
    }

    // persisted index → loader → search equals the direct batch path
    val cbs = Similarity.pqCodebooks(embs, "vec_id", "embedding", m = 8, ksub = 16, iters = 2)
    val loaded = Similarity.codebooksOf3(
      Similarity.pqIndex(embs, "vec_id", "embedding", m = 8, ksub = 16, iters = 2))
    assert(loaded.length == cbs.length)
    assert(loaded.zip(cbs).forall { case (a, b) =>
      a.length == b.length && a.zip(b).forall { case (x, y) => x.sameElements(y) } })
  }
}
