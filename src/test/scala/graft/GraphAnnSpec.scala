package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{GraphAnn, Similarity}

class GraphAnnSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(-1.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f))
  ).toDF("vec_id", "embedding")

  test("nswTopK hand case: one cell, exhaustive ef recovers exact cosine order") {
    val out = GraphAnn.nswTopK(vecs, vecs.filter($"vec_id" === 0L), "vec_id", "embedding",
        k = 3, nCells = 1, nprobe = 1, iters = 1, m = 2, efConstruction = 16, efSearch = 16)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L), (2L, 4L), (3L, 2L)))
  }

  test("full escalation == brute: nprobe covers all cells, ef covers every cell") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = embs.filter($"vec_id" < 10)
    // the backbone guarantees each cell's graph is connected, so an
    // efSearch >= cell size beam visits the WHOLE cell and nprobe =
    // nCells makes the union the whole corpus: exact brute force,
    // including bit-equal cos_sim (shared left-to-right accumulation)
    val nsw = GraphAnn.nswTopK(embs, queries, "vec_id", "embedding",
        k = 5, nCells = 4, nprobe = 4, iters = 2, m = 2, efConstruction = 8, efSearch = 10000)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val brute = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id", "cos_sim")
      .as[(Long, Int, Long, Double)].collect().map(r => (r._1, r._2.toLong, r._3, r._4))
      .sortBy(r => (r._1, r._2))
    assert(nsw.toSeq == brute.toSeq)
  }

  test("output is partitioning-independent at approximate settings") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = embs.filter($"vec_id" < 8)
    def run(df: org.apache.spark.sql.DataFrame) =
      GraphAnn.nswTopK(df, queries, "vec_id", "embedding",
          k = 5, nCells = 8, nprobe = 3, iters = 2, m = 4, efConstruction = 8, efSearch = 8)
        .select("query_id", "rank", "neighbor_id", "cos_sim")
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run(embs.repartition(7)) == run(embs.coalesce(1)))
  }

  test("moderate-parameter recall beats the 0.5 IVF floor on the fixture corpus") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = embs.filter($"vec_id" < 10)
    val ann = GraphAnn.nswTopK(embs, queries, "vec_id", "embedding",
      k = 5, nCells = 8, nprobe = 4, iters = 3, m = 4, efConstruction = 16, efSearch = 16)
    val brute = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", 5)
    val rec = Similarity.recallAtK(ann, brute)
      .select($"recall_ppm").as[Long].collect()
    val avg = rec.sum.toDouble / rec.length / 1e6
    assert(avg >= 0.5, s"avg recall $avg")
  }

  test("search over the pruned cell-bucketed layout equals the flat assignment search") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = embs.filter($"vec_id" < 6)
    val cents = Similarity.kMeansCentroids(embs, "vec_id", "embedding", 4, 2)
    val assigned = Similarity.ivfAssignedIndex(embs, "vec_id", "embedding", cents)
    val root = java.nio.file.Files.createTempDirectory("graft_nswprune").toString
    Similarity.writeAssignedPruned(assigned, "vec_id", "embedding", s"$root/a", numBuckets = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cos_sim")
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val flat = GraphAnn.nswSearchAssigned(assigned, cents, queries,
      "vec_id", "embedding", k = 4, nprobe = 2, m = 4, efConstruction = 12, efSearch = 12)
    val pruned = GraphAnn.nswSearchPruned(spark, s"$root/a", cents, queries,
      "vec_id", "embedding", k = 4, nprobe = 2, m = 4, efConstruction = 12, efSearch = 12)
    assert(rows(pruned).nonEmpty && rows(pruned) == rows(flat))
  }

  test("persisted adjacency: search over stored edges == per-batch-build search, bit-equal") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = embs.filter($"vec_id" < 6)
    val cents = Similarity.kMeansCentroids(embs, "vec_id", "embedding", 4, 2)
    val assigned = Similarity.ivfAssignedIndex(embs, "vec_id", "embedding", cents)
    val root = java.nio.file.Files.createTempDirectory("graft_nswgraph").toString
    Similarity.writeAssignedPruned(assigned, "vec_id", "embedding", s"$root/a", numBuckets = 4)
    val edges = GraphAnn.buildGraphEdges(assigned, "vec_id", "embedding",
      m = 4, efConstruction = 12)
    GraphAnn.writeGraphIndex(edges, s"$root/g", numBuckets = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cos_sim")
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val rebuilt = GraphAnn.nswSearchAssigned(assigned, cents, queries,
      "vec_id", "embedding", k = 4, nprobe = 2, m = 4, efConstruction = 12, efSearch = 12)
    val fromEdges = GraphAnn.nswSearchGraph(spark, s"$root/a", s"$root/g", cents,
      queries, "vec_id", "embedding", k = 4, nprobe = 2, efSearch = 12)
    assert(rows(fromEdges).nonEmpty && rows(fromEdges) == rows(rebuilt))
  }

  test("delta edge maintenance == full rebuild: append-only continue AND interleaved rebuild") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kMeansCentroids(embs, "vec_id", "embedding", 4, 2)
    def assignedOf(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfAssignedIndex(df, "vec_id", "embedding", cents)
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.select("cell", "src", "dst", "pos")
        .as[(Int, Long, Long, Int)].collect().toSet
    // append-only: every delta id is greater than every old id, so every
    // touched cell CONTINUES its sequential build from the stored state
    val cut = 80L
    val old1 = assignedOf(embs.filter($"vec_id" < cut))
    val delta1 = assignedOf(embs.filter($"vec_id" >= cut))
    val root = java.nio.file.Files.createTempDirectory("graft_nswdelta").toString
    GraphAnn.writeGraphIndex(
      GraphAnn.buildGraphEdges(old1, "vec_id", "embedding", m = 4, efConstruction = 12),
      s"$root/g1", numBuckets = 4)
    val merged1 = GraphAnn.mergeGraphEdgesForDelta(spark, s"$root/g1",
      old1, delta1, "vec_id", "embedding", m = 4, efConstruction = 12)
    val rebuild1 = GraphAnn.buildGraphEdges(assignedOf(embs), "vec_id", "embedding",
      m = 4, efConstruction = 12)
    assert(edgeSet(merged1) == edgeSet(rebuild1))
    // interleaved ids: the continue shortcut is inapplicable; the touched
    // cells rebuild from scratch — determinism makes the result identical
    val old2 = assignedOf(embs.filter($"vec_id" % 2 === 0))
    val delta2 = assignedOf(embs.filter($"vec_id" % 2 =!= 0))
    GraphAnn.writeGraphIndex(
      GraphAnn.buildGraphEdges(old2, "vec_id", "embedding", m = 4, efConstruction = 12),
      s"$root/g2", numBuckets = 4)
    val merged2 = GraphAnn.mergeGraphEdgesForDelta(spark, s"$root/g2",
      old2, delta2, "vec_id", "embedding", m = 4, efConstruction = 12)
    assert(edgeSet(merged2) == edgeSet(rebuild1))
    // untouched cells: a delta confined to one cell leaves every other
    // cell's edges byte-identical to the stored frame (streamed through)
    val oneCellDelta = delta1.orderBy($"vec_id").limit(1)
    val touched = oneCellDelta.select("cell").as[Int].collect().toSet
    val merged3 = GraphAnn.mergeGraphEdgesForDelta(spark, s"$root/g1",
      old1, oneCellDelta, "vec_id", "embedding", m = 4, efConstruction = 12)
    val storedUntouched = graft.sources.PrunedIndex.read(spark, s"$root/g1")
      .filter(!$"cell".isin(touched.toSeq: _*))
    assert(edgeSet(merged3.filter(!$"cell".isin(touched.toSeq: _*))) ==
      edgeSet(storedUntouched))
  }

  test("replacement delta: re-uploaded ids displace stale nodes == rebuild on post-replace corpus") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.kMeansCentroids(embs, "vec_id", "embedding", 4, 2)
    def assignedOf(df: org.apache.spark.sql.DataFrame) =
      Similarity.ivfAssignedIndex(df, "vec_id", "embedding", cents)
    def edgeSet(df: org.apache.spark.sql.DataFrame) =
      df.select("cell", "src", "dst", "pos")
        .as[(Int, Long, Long, Int)].collect().toSet
    val root = java.nio.file.Files.createTempDirectory("graft_nswreup").toString
    GraphAnn.writeGraphIndex(
      GraphAnn.buildGraphEdges(assignedOf(embs), "vec_id", "embedding",
        m = 4, efConstruction = 12),
      s"$root/g", numBuckets = 4)
    // re-upload 3 existing ids with REVERSED vectors (different direction
    // → likely a different cell under the same centroids) plus one NEW id
    val reupIds = Seq(3L, 17L, 40L)
    val reup = embs.filter($"vec_id".isin(reupIds: _*))
      .select($"vec_id", org.apache.spark.sql.functions.reverse($"embedding").as("embedding"))
      .unionByName(embs.filter($"vec_id" === 0L)
        .select(($"vec_id" + org.apache.spark.sql.functions.lit(100000L)).as("vec_id"),
          $"embedding"))
    val thin = embs.select($"vec_id", $"embedding")
    val merged = GraphAnn.mergeGraphEdgesForDelta(spark, s"$root/g",
      assignedOf(embs), assignedOf(reup), "vec_id", "embedding", m = 4, efConstruction = 12)
    // the stale rows' cells really did move for at least one re-upload —
    // otherwise the displaced-old-cell path is untested
    val oldCells = assignedOf(embs.filter($"vec_id".isin(reupIds: _*)))
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val newCells = assignedOf(reup.filter($"vec_id".isin(reupIds: _*)))
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(reupIds.exists(id => oldCells(id) != newCells(id)),
      s"fixture too weak: no re-upload changed cell ($oldCells vs $newCells)")
    val postReplace = thin.filter(!$"vec_id".isin(reupIds: _*)).unionByName(reup)
    val rebuild = GraphAnn.buildGraphEdges(assignedOf(postReplace), "vec_id", "embedding",
      m = 4, efConstruction = 12)
    assert(edgeSet(merged) == edgeSet(rebuild))
    // no stale node survives: the replaced ids' edges in the merged frame
    // all come from their NEW cells
    val mergedCellsOfReup = merged.filter($"src".isin(reupIds: _*))
      .select("src", "cell").distinct().as[(Long, Int)].collect().toMap
    assert(reupIds.forall(id => mergedCellsOfReup.get(id).forall(_ == newCells(id))))
  }

  test("search over a persisted assignment equals the one-call form") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = embs.filter($"vec_id" < 6)
    val cents = Similarity.kMeansCentroids(embs, "vec_id", "embedding", 4, 2)
    val root = java.nio.file.Files.createTempDirectory("graft_nsw").toString
    Similarity.ivfAssignedIndex(embs, "vec_id", "embedding", cents)
      .write.mode("overwrite").parquet(s"$root/assigned")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cos_sim")
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val fromDisk = GraphAnn.nswSearchAssigned(spark.read.parquet(s"$root/assigned"),
      cents, queries, "vec_id", "embedding", k = 4, nprobe = 2, m = 4,
      efConstruction = 12, efSearch = 12)
    val oneCall = GraphAnn.nswTopK(embs, queries, "vec_id", "embedding",
      k = 4, nCells = 4, nprobe = 2, iters = 2, m = 4, efConstruction = 12, efSearch = 12)
    assert(rows(fromDisk) == rows(oneCall))
  }
}
