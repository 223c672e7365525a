package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL-callable TABLE functions for the engine's flagship LLM-pipeline
  * operators — the reference's provisioned query capability (SQL over
  * curated tables; SURVEY.md §3's MySQL-Workbench role) extended to the
  * curation layer, so an analyst can run dedup / retrieval / curation
  * from a pure SQL string with no Scala in sight:
  *
  *   graft_neardup_pairs(docsParquet, idCol, textCol, n, threshold)
  *     → (a_id, b_id, jaccard): exact-Jaccard near-dup pairs
  *       ([[graft.llm.Dedup.jaccardNearDupPairs]] — prefix-filtered,
  *       df-capped, exact-verified)
  *   graft_bm25_topk(docsParquet, idCol, textCol,
  *                   queriesParquet, qIdCol, qTextCol, k)
  *     → (query_id, doc_id, score_ppm, rank): BM25 top-k per query
  *       ([[graft.llm.Retrieval.bm25TopK]])
  *   graft_curation_ledger(docsParquet, idCol, textCol, scoreCol,
  *                         sourceCol, benchParquet, benchTextCol)
  *     → (id, n_tokens, verdict): the staged first-fail curation
  *       ledger ([[graft.llm.Curation.fullPipelineLedger]] at its
  *       default thresholds)
  *   graft_ann_topk(storeRoot, queriesParquet, idCol, vecCol,
  *                  k, nprobe, efSearch)
  *     → (query_id, rank, neighbor_id, cos_sim): graph-ANN top-k over
  *       the CURRENT committed version of a persisted
  *       [[graft.llm.AnnIndexStore]] (probe-bounded bucket reads,
  *       graphs reconstructed from the stored adjacency — the t131
  *       deployment path, SQL-reachable)
  *   graft_ann_pq_topk(storeRoot, queriesParquet, idCol, vecCol,
  *                     k, nprobe, refine)
  *     → (query_id, rank, neighbor_id, cos_sim): IVF-PQ composed top-k
  *       over the CURRENT committed version of a persisted
  *       [[graft.llm.AnnIndexStore]] built with `Params(pqM > 0)` —
  *       codes-only ADC shortlist over the probed cells + exact
  *       re-rank of the k·refine shortlist (two-level routing when the
  *       store is hierarchical), SQL-reachable
  *   graft_neardup_delta(storeRoot, deltaParquet, idCol, textCol)
  *     → (a_id, b_id, jaccard): near-dup pairs of a DELTA batch
  *       against the CURRENT committed version of a persisted
  *       [[graft.llm.NearDupIndexStore]] ∪ the delta — the
  *       delta-bounded daily-batch probe (bucket-pruned reads,
  *       broadcast candidate join), SQL-reachable
  *   graft_semdedup_delta(storeRoot, deltaParquet, idCol, vecCol, minCos)
  *     → (cell, a_id, b_id, cos_sim): SemDeDup pairs of a DELTA batch
  *       against the CURRENT committed version of a persisted flat
  *       [[graft.llm.AnnIndexStore]] ∪ the delta — the embedding
  *       family's delta-bounded probe (cell-pruned assignment reads,
  *       primary-cell semantics), SQL-reachable
  *
  * Mechanics: each function is a Catalyst table-function — its builder
  * receives the call's argument expressions at ANALYSIS time, evaluates
  * them as literals, and returns the operator's full logical plan, so
  * the SQL caller gets the identical distributed plan (pushdown,
  * broadcasts, skew caps) as the Scala API — not a UDF wrapper.
  * Registered two ways: [[register]] on a live session (the
  * [[GraftFunctions.register]] idiom, used by `Engine.sql`) and
  * builder-time via [[graft.plans.GraftExtensions]]
  * (`injectTableFunction`). Arguments must be foldable literals — the
  * plan is fixed at analysis, exactly like a view definition. */
object GraftTableFunctions {

  private def str(e: Expression): String = {
    val v = e.eval()
    require(v != null, "graft table functions take non-null literal arguments")
    v.toString
  }

  private def int(e: Expression): Int = e.eval() match {
    case d: org.apache.spark.sql.types.Decimal => d.toInt
    case n: java.lang.Number => n.intValue()
    case other => sys.error(s"expected an integer literal, got $other")
  }

  private def dbl(e: Expression): Double = e.eval() match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
    case other => sys.error(s"expected a numeric literal, got $other")
  }

  private def arity(name: String, exprs: Seq[Expression], n: Int): Unit =
    require(exprs.length == n, s"$name takes $n arguments, got ${exprs.length}")

  private def nearDupPairs(exprs: Seq[Expression]): LogicalPlan = {
    arity("graft_neardup_pairs", exprs, 5)
    val s = SparkSession.active
    graft.llm.Dedup.jaccardNearDupPairs(s.read.parquet(str(exprs(0))),
        str(exprs(1)), str(exprs(2)), n = int(exprs(3)), threshold = dbl(exprs(4)))
      .queryExecution.logical
  }

  private def bm25TopK(exprs: Seq[Expression]): LogicalPlan = {
    arity("graft_bm25_topk", exprs, 7)
    val s = SparkSession.active
    graft.llm.Retrieval.bm25TopK(s.read.parquet(str(exprs(0))),
        str(exprs(1)), str(exprs(2)),
        s.read.parquet(str(exprs(3))), str(exprs(4)), str(exprs(5)),
        k = int(exprs(6)))
      .queryExecution.logical
  }

  private def curationLedger(exprs: Seq[Expression]): LogicalPlan = {
    arity("graft_curation_ledger", exprs, 7)
    val s = SparkSession.active
    graft.llm.Curation.fullPipelineLedger(s.read.parquet(str(exprs(0))),
        str(exprs(1)), str(exprs(2)), str(exprs(3)), str(exprs(4)),
        bench = s.read.parquet(str(exprs(5))), benchTextCol = str(exprs(6)))
      .queryExecution.logical
  }

  private def annTopK(exprs: Seq[Expression]): LogicalPlan = {
    arity("graft_ann_topk", exprs, 7)
    val s = SparkSession.active
    graft.llm.AnnIndexStore.searchGraph(s, str(exprs(0)),
        s.read.parquet(str(exprs(1))), str(exprs(2)), str(exprs(3)),
        k = int(exprs(4)), nprobe = int(exprs(5)), efSearch = int(exprs(6)))
      .queryExecution.logical
  }

  private def annPqTopK(exprs: Seq[Expression]): LogicalPlan = {
    arity("graft_ann_pq_topk", exprs, 7)
    val s = SparkSession.active
    graft.llm.AnnIndexStore.searchPq(s, str(exprs(0)),
        s.read.parquet(str(exprs(1))), str(exprs(2)), str(exprs(3)),
        k = int(exprs(4)), nprobe = int(exprs(5)), refine = int(exprs(6)))
      .queryExecution.logical
  }

  private def neardupDelta(exprs: Seq[Expression]): LogicalPlan = {
    arity("graft_neardup_delta", exprs, 4)
    val s = SparkSession.active
    graft.llm.NearDupIndexStore.pairsForDelta(s, str(exprs(0)),
        s.read.parquet(str(exprs(1))), str(exprs(2)), str(exprs(3)))
      .queryExecution.logical
  }

  private def semdedupDelta(exprs: Seq[Expression]): LogicalPlan = {
    arity("graft_semdedup_delta", exprs, 5)
    val s = SparkSession.active
    graft.llm.AnnIndexStore.semDedupPairsForDelta(s, str(exprs(0)),
        s.read.parquet(str(exprs(1))), str(exprs(2)), str(exprs(3)),
        minCos = dbl(exprs(4)))
      .queryExecution.logical
  }

  private val builders: Seq[(String, Seq[Expression] => LogicalPlan)] = Seq(
    "graft_neardup_pairs" -> (nearDupPairs _),
    "graft_bm25_topk" -> (bm25TopK _),
    "graft_curation_ledger" -> (curationLedger _),
    "graft_ann_topk" -> (annTopK _),
    "graft_ann_pq_topk" -> (annPqTopK _),
    "graft_neardup_delta" -> (neardupDelta _),
    "graft_semdedup_delta" -> (semdedupDelta _))

  /** Runtime registration on a live session (temp, session-scoped). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  /** Builder-time descriptions for `SparkSessionExtensions.injectTableFunction`. */
  def descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] =
    builders.map { case (name, b) =>
      (FunctionIdentifier(name),
        new ExpressionInfo(GraftTableFunctions.getClass.getCanonicalName, name), b)
    }
}
