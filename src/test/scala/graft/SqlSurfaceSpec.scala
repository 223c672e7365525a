package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL table-function surface
  * ([[graft.functions.GraftTableFunctions]]): an analyst must reach the
  * flagship LLM operators from a pure SQL string, and the SQL plan must
  * BE the Scala-API plan — same rows, not a reimplementation.
  *
  * Uses an isolated session: table-function registration mutates the
  * session's function registry (temp functions), which must not bleed
  * into concurrently running suites. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.isolated
  import spark.implicits._

  private val docsPath = "/root/testdata/sf0.001/documents.parquet"

  test("graft_neardup_pairs from pure SQL == Dedup.jaccardNearDupPairs") {
    graft.functions.GraftTableFunctions.register(spark)
    val sqlRows = spark.sql(
      s"""SELECT a_id, b_id, CAST(floor(jaccard * 1000000.0) AS BIGINT) AS jaccard_ppm
          FROM graft_neardup_pairs('$docsPath', 'doc_id', 'text', 3, 0.8)
          ORDER BY a_id, b_id""")
      .as[(Long, Long, Long)].collect().toSeq
    val d = spark.read.parquet(docsPath)
    val api = graft.llm.Dedup.jaccardNearDupPairs(d, "doc_id", "text", n = 3, threshold = 0.8)
      .select($"a_id", $"b_id", floor($"jaccard" * 1e6).cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(sqlRows.nonEmpty && sqlRows == api)
    graft.llm.Dedup.releaseShingleSetCache(d, "doc_id", "text")
    spark.catalog.clearCache()
  }

  test("graft_bm25_topk from pure SQL == Retrieval.bm25TopK") {
    graft.functions.GraftTableFunctions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_sqlq").toString
    val d = spark.read.parquet(docsPath)
    val q = d.filter($"doc_id" % 100 === 0)
      .select($"doc_id".as("query_id"),
        substring($"text", 1, 40).as("qtext"))
    q.write.mode("overwrite").parquet(s"$root/queries")
    val sqlRows = spark.sql(
      s"""SELECT query_id, doc_id, score_ppm, rank
          FROM graft_bm25_topk('$docsPath', 'doc_id', 'text',
                               '$root/queries', 'query_id', 'qtext', 3)
          ORDER BY query_id, rank""")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val api = graft.llm.Retrieval.bm25TopK(d, "doc_id", "text",
        q, "query_id", "qtext", k = 3)
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._4)).toSeq
    assert(sqlRows.nonEmpty && sqlRows == api)
  }

  test("graft_ann_topk from pure SQL == AnnIndexStore.searchGraph") {
    graft.functions.GraftTableFunctions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_sqlann").toString
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.llm.AnnIndexStore.build(spark, e, "vec_id", "embedding",
      s"$root/store", graft.llm.AnnIndexStore.Params(nCells = 4))
    val q = e.filter($"vec_id" < 8)
    q.write.mode("overwrite").parquet(s"$root/queries")
    val sqlRows = spark.sql(
      s"""SELECT query_id, rank, neighbor_id
          FROM graft_ann_topk('$root/store', '$root/queries', 'vec_id', 'embedding',
                              5, 2, 32)
          ORDER BY query_id, rank""")
      .as[(Long, Long, Long)].collect().toSeq
    val api = graft.llm.AnnIndexStore.searchGraph(spark, s"$root/store",
        q, "vec_id", "embedding", k = 5, nprobe = 2, efSearch = 32)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(sqlRows.nonEmpty && sqlRows == api)
  }

  test("graft_ann_pq_topk from pure SQL == AnnIndexStore.searchPq") {
    graft.functions.GraftTableFunctions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_sqlpq").toString
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.llm.AnnIndexStore.build(spark, e, "vec_id", "embedding",
      s"$root/store", graft.llm.AnnIndexStore.Params(nCells = 4, pqM = 8))
    val q = e.filter($"vec_id" < 8)
    q.write.mode("overwrite").parquet(s"$root/queries")
    val sqlRows = spark.sql(
      s"""SELECT query_id, rank, neighbor_id
          FROM graft_ann_pq_topk('$root/store', '$root/queries', 'vec_id', 'embedding',
                                 5, 2, 4)
          ORDER BY query_id, rank""")
      .as[(Long, Long, Long)].collect().toSeq
    val api = graft.llm.AnnIndexStore.searchPq(spark, s"$root/store",
        q, "vec_id", "embedding", k = 5, nprobe = 2, refine = 4)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(sqlRows.nonEmpty && sqlRows == api)
  }

  test("table functions demand literal arity and builder-time registration works") {
    graft.functions.GraftTableFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_neardup_pairs('$docsPath', 'doc_id')").collect()
    }
    assert(e.getMessage.contains("5 arguments"))
    // builder-time path: a session built with GraftExtensions resolves
    // the functions without any runtime register() call
    assert(graft.functions.GraftTableFunctions.descriptions.map(_._1.funcName) ==
      Seq("graft_neardup_pairs", "graft_bm25_topk", "graft_curation_ledger",
        "graft_ann_topk", "graft_ann_pq_topk", "graft_neardup_delta",
        "graft_semdedup_delta"))
  }

  test("graft_semdedup_delta from pure SQL == AnnIndexStore.semDedupPairsForDelta") {
    graft.functions.GraftTableFunctions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_sqlsd").toString
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val stored = e.filter($"vec_id" % 5 =!= 0)
    val delta = e.filter($"vec_id" % 5 === 0)
    delta.select($"vec_id", $"embedding").write.mode("overwrite")
      .parquet(s"$root/delta")
    graft.llm.AnnIndexStore.build(spark, stored, "vec_id", "embedding",
      s"$root/store", graft.llm.AnnIndexStore.Params(nCells = 8, iters = 2,
        numBuckets = 8, m = 4, efConstruction = 12))
    val sqlRows = spark.sql(
      s"""SELECT cell, a_id, b_id, CAST(floor(cos_sim * 1000000.0) AS BIGINT) AS cos_ppm
          FROM graft_semdedup_delta('$root/store', '$root/delta', 'vec_id', 'embedding', 0.35)
          ORDER BY a_id, b_id""")
      .as[(Int, Long, Long, Long)].collect().toSeq
    val api = graft.llm.AnnIndexStore.semDedupPairsForDelta(spark, s"$root/store",
        spark.read.parquet(s"$root/delta"), "vec_id", "embedding", minCos = 0.35)
      .select($"cell", $"a_id", $"b_id", floor($"cos_sim" * 1e6).cast("long"))
      .as[(Int, Long, Long, Long)].collect().sortBy(r => (r._2, r._3)).toSeq
    assert(sqlRows.nonEmpty && sqlRows == api)
    spark.catalog.clearCache()
  }

  test("graft_neardup_delta from pure SQL == NearDupIndexStore.pairsForDelta") {
    graft.functions.GraftTableFunctions.register(spark)
    val root = java.nio.file.Files.createTempDirectory("graft_sqlnd").toString
    val d = spark.read.parquet(docsPath)
    val corpus = d.filter($"doc_id" % 4 =!= 3)
    val delta = d.filter($"doc_id" % 4 === 3)
    delta.select($"doc_id", $"text").write.mode("overwrite")
      .parquet(s"$root/delta")
    graft.llm.NearDupIndexStore.build(spark, corpus, "doc_id", "text",
      s"$root/store", numBuckets = 16)
    val sqlRows = spark.sql(
      s"""SELECT a_id, b_id, CAST(floor(jaccard * 1000000.0) AS BIGINT) AS jaccard_ppm
          FROM graft_neardup_delta('$root/store', '$root/delta', 'doc_id', 'text')
          ORDER BY a_id, b_id""")
      .as[(Long, Long, Long)].collect().toSeq
    val api = graft.llm.NearDupIndexStore.pairsForDelta(spark, s"$root/store",
        spark.read.parquet(s"$root/delta"), "doc_id", "text")
      .select($"a_id", $"b_id", floor($"jaccard" * 1e6).cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(sqlRows.nonEmpty && sqlRows == api)
    spark.catalog.clearCache()
  }
}
