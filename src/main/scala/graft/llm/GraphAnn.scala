package graft.llm

import scala.collection.mutable.{ArrayBuffer, PriorityQueue}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-based approximate nearest neighbor — the HNSW/NSW-class index
  * shape (Malkov & Yashunin, TPAMI'20), distributed the way SPANN /
  * sharded-FAISS deployments do it: the corpus is PARTITIONED into
  * k-means cells (the [[Similarity]] IVF machinery), each cell builds a
  * small navigable-small-world graph locally, and a query beam-searches
  * only the graphs of its `nprobe` nearest cells. A monolithic HNSW is
  * pointer-chasing over the whole corpus — it cannot shard; the
  * cell-partitioned form keeps each graph executor-memory-sized and
  * turns the global structure into driver-side centroid state (k·dim
  * doubles, the same control-plane class as a BPE merge table).
  *
  * Scale shape: the corpus moves through ONE shuffle (groupByKey on the
  * assigned cell — at scale this is a read of the persisted
  * [[Similarity.ivfAssignedIndex]], already bucketed by cell); queries
  * are probe-sized and broadcast as a cell-keyed map; output before the
  * final thin top-k merge is |Q|·nprobe·efSearch rows. Per-task memory
  * is one cell's vectors plus its adjacency (≈ cellRows·(dim·8 + 2m·4)
  * bytes) — the operator's documented bound, sized by nCells exactly
  * like SPANN's posting-length cap.
  *
  * Determinism (the literal-oracle contract): cell assignment is a pure
  * function of (vector, decimal-exact centroids); each cell's rows sort
  * by id before the SEQUENTIAL graph build; every comparison in build
  * and search uses the total order (cos desc, id asc), so heap ties
  * cannot exist; cosines use the same left-to-right double accumulation
  * as [[graft.functions.expr.FloatVecDot]], making Scala-side scores
  * bit-equal to the Catalyst-side ones [[Similarity.bruteTopK]] emits.
  *
  * Exactness escalation (the t112 full-escalation==brute contract,
  * pinned in SimilaritySpec): every node keeps an implicit BACKBONE
  * edge to its insertion-order neighbors (i−1, i+1), so a cell's graph
  * is connected no matter how degree pruning rewires it; with
  * `efSearch` ≥ cell size the beam never prunes and visits the whole
  * cell, and with `nprobe` ≥ nCells the probe set covers the corpus —
  * the search degrades gracefully to exact brute force.
  */
object GraphAnn {

  /** Build-and-search in one call: k-means route + per-cell NSW graphs
    * + beam search + thin global merge. Output matches
    * [[Similarity.bruteTopK]]: (query_id, rank, neighbor_id, cos_sim),
    * rank 1..k by (cos desc, id asc), self-matches excluded. Ids must
    * be integral (cast to long for the graph's arrays). `queries` is
    * probe-sized — its routed form is collected and broadcast. */
  def nswTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCells: Int = 16, nprobe: Int = 4, iters: Int = 3,
              m: Int = 8, efConstruction: Int = 48, efSearch: Int = 48): DataFrame = {
    val centroids = Similarity.kMeansCentroids(corpus, idCol, vecCol, nCells, iters)
    nswSearchAssigned(Similarity.ivfAssignedIndex(corpus, idCol, vecCol, centroids),
      centroids, queries, idCol, vecCol, k, nprobe, m, efConstruction, efSearch)
  }

  /** Search over a persisted cell assignment ([[Similarity
    * .ivfAssignedIndex]] — maintainable incrementally by group-merge,
    * the t112 story): graphs are (re)built per cell from the assigned
    * vectors, queries probe their `nprobe` nearest cells' graphs. Graph
    * build is deterministic from the assignment alone, so rebuilding
    * per query batch answers exactly what a persisted adjacency would
    * — build cost is the price of having no graph mutation protocol,
    * the right trade until per-batch query volume amortizes it. */
  def nswSearchAssigned(assigned: DataFrame, centroids: Array[(Int, Array[Double])],
                        queries: DataFrame, idCol: String, vecCol: String,
                        k: Int, nprobe: Int = 4, m: Int = 8,
                        efConstruction: Int = 48, efSearch: Int = 48): DataFrame = {
    require(k >= 1 && m >= 1 && efConstruction >= 1 && efSearch >= 1,
      s"need positive (k, m, efConstruction, efSearch); got ($k, $m, $efConstruction, $efSearch)")
    val spark = assigned.sparkSession
    import spark.implicits._

    // route queries to cells with the shared IVF rule, then collect the
    // probe set driver-side (|Q|·nprobe rows of dim doubles — bounded)
    val dvQ = queries.select(col(idCol).cast("long").as("qid"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val probeRows = Similarity.probeCells(dvQ, centroids, nprobe)
      .select(col("qid"), col("v"), col("cell"))
      .as[(Long, Seq[Double], Int)].collect()
    val byCell: Map[Int, Array[(Long, Array[Double])]] = probeRows
      .groupBy(_._3).map { case (c, xs) =>
        c -> xs.sortBy(_._1).map(t => (t._1, t._2.toArray))
      }
    val probesB = spark.sparkContext.broadcast(byCell)

    val rows = assigned.select(col("cell"), col(idCol).cast("long").as("nid"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[(Int, Long, Seq[Double])]
    val hits = rows.groupByKey(_._1).flatMapGroups { (cell, it) =>
      val qs = probesB.value.getOrElse(cell, Array.empty[(Long, Array[Double])])
      if (qs.isEmpty) Iterator.empty
      else {
        // one cell's vectors in memory — the operator's documented
        // per-task bound; id sort makes the sequential build canonical
        val nodes = it.map { case (_, id, v) => (id, v.toArray) }.toArray.sortBy(_._1)
        val g = new NswGraph(nodes.map(_._1), nodes.map(_._2), m, efConstruction)
        qs.iterator.flatMap { case (qid, qv) =>
          g.search(qv, efSearch).iterator.map { case (nid, cos) => (qid, nid, cos) }
        }
      }
    }.toDF("query_id", "neighbor_id", "cos")

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    hits.filter(col("query_id") =!= col("neighbor_id"))
      // a soft-multi-assigned vector lives in several cells' graphs; a
      // query probing two of them must not rank it twice. Duplicate
      // hits are identical triples (same vector ⇒ same cos), so the
      // collapse is deterministic — and a no-op under single
      // assignment, where cells partition the corpus.
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos").as("cos_sim"))
  }

  /** [[nswSearchAssigned]] over a PERSISTED cell-bucketed assignment
    * layout ([[Similarity.writeAssignedPruned]]): the probe's cell set
    * resolves first, then ONLY those cells' bucket files are read
    * (manifest-listed) before the per-cell graph build — so graph
    * construction work, not just the scan, is probe-bounded: cells no
    * query routes to are never read, never decoded, never graphed.
    * Results are identical to [[nswSearchAssigned]] over the flat
    * assignment (a vector's rows live in exactly one cell; pinned in
    * GraphAnnSpec). */
  def nswSearchPruned(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                      centroids: Array[(Int, Array[Double])],
                      queries: DataFrame, idCol: String, vecCol: String,
                      k: Int, nprobe: Int = 4, m: Int = 8,
                      efConstruction: Int = 48, efSearch: Int = 48): DataFrame = {
    val dvQ = queries.select(col(idCol), col(vecCol),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val probed = Similarity.probeCells(dvQ, centroids, nprobe)
    val assigned = graft.sources.PrunedIndex.readPruned(
      spark, indexPath, probed.select(col("cell")))
    nswSearchAssigned(assigned, centroids, queries, idCol, vecCol,
      k, nprobe, m, efConstruction, efSearch)
  }

  // ==== Persisted adjacency (the graph index as durable state) ====
  //
  // nswSearchAssigned rebuilds each probed cell's graph per query batch
  // — deterministic, but the build cost recurs with every batch. The
  // persisted form writes the adjacency ONCE as a cell-bucketed
  // [[graft.sources.PrunedIndex]] (edges: cell, src, dst, pos — the
  // same layout t130 uses for vectors), searches reconstruct the graph
  // from the stored edges (no per-batch build), and maintenance is
  // delta-bounded: only cells a delta touches re-derive their edges,
  // append-only deltas by CONTINUING the sequential build from the
  // stored state (id order makes insert-into-persisted == rebuild).

  /** The deterministic per-cell NSW adjacency as an edge frame:
    * (cell, src, dst, pos) with `pos` the edge's position in src's
    * adjacency list — enough to reconstruct each graph EXACTLY (the
    * persisted == rebuilt bit-equal contract, pinned in GraphAnnSpec).
    * One corpus shuffle (groupByKey on cell), per-task memory = one
    * cell, output ≈ rows·2m edges. */
  def buildGraphEdges(assigned: DataFrame, idCol: String, vecCol: String,
                      m: Int = 8, efConstruction: Int = 48): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    assigned.select(col("cell"), col(idCol).cast("long").as("nid"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[(Int, Long, Seq[Double])]
      .groupByKey(_._1).flatMapGroups { (cell, it) =>
        val nodes = it.map { case (_, id, v) => (id, v.toArray) }.toArray.sortBy(_._1)
        val g = new NswGraph(nodes.map(_._1), nodes.map(_._2), m, efConstruction)
        g.edgeRows.map { case (src, dst, pos) => (cell, src, dst, pos) }
      }.toDF("cell", "src", "dst", "pos")
  }

  /** Persist an edge frame in the cell-bucketed pruned layout
    * ([[graft.sources.PrunedIndex]], key = cell) — probes read only
    * their cells' edge files, exactly like the assignment layout. */
  def writeGraphIndex(edges: DataFrame, path: String, numBuckets: Int,
                      maxRecordsPerFile: Long = 0L): Unit =
    graft.sources.PrunedIndex.write(
      edges.select(col("cell"), col("src"), col("dst"), col("pos")),
      path, Seq("cell"), numBuckets, maxRecordsPerFile)

  /** Delta maintenance of a persisted graph index: recompute edges for
    * ONLY the cells the delta touches, CONTINUING each cell's
    * sequential build from the stored adjacency when the delta is
    * append-only there (every new id > every existing id in the cell —
    * the insertion-order rule then makes the continued build identical
    * to a from-scratch rebuild of old∪new, pinned in GraphAnnSpec).
    * Cells where ids interleave rebuild from scratch — the same final
    * edges by determinism, just without the shortcut. Untouched cells'
    * edges stream through unchanged. Returns the FULL new edge frame
    * (write it back with [[writeGraphIndex]] — derived state, whole-
    * index swap, delta-bounded compute; the t110/t112 maintenance
    * contract).
    *
    * Re-uploads (a delta id already present in `oldAssigned`) DISPLACE
    * the stale node — the [[graft.llm.Dedup.winnowingDeltaPairs]]
    * superseded-key contract: the touched set includes the replaced
    * ids' OLD cells (the updated vector may land elsewhere under the
    * same centroids), the stale nodes and their stored edges are
    * excluded from the rebuild, and any cell that lost a node rebuilds
    * from scratch (its stored adjacency reflects an insertion sequence
    * that no longer exists). The result equals a from-scratch
    * [[buildGraphEdges]] on the post-replace assignment — pinned in
    * GraphAnnSpec.
    *
    * `oldAssigned` is the PRE-delta assignment and `deltaAssigned` the
    * delta's rows under the same centroids; pass the same
    * (m, efConstruction) the index was built with. */
  def mergeGraphEdgesForDelta(spark: org.apache.spark.sql.SparkSession,
                              graphPath: String,
                              oldAssigned: DataFrame, deltaAssigned: DataFrame,
                              idCol: String, vecCol: String,
                              m: Int = 8, efConstruction: Int = 48): DataFrame = {
    val (touched, recomputed) = recomputedGraphEdgesForDelta(spark, graphPath,
      oldAssigned, deltaAssigned, idCol, vecCol, m, efConstruction)
    graft.sources.PrunedIndex.read(spark, graphPath)
      .join(touched, Seq("cell"), "left_anti")
      .unionByName(recomputed)
  }

  /** The delta-bounded core of [[mergeGraphEdgesForDelta]]: (touched
    * cells, their recomputed edges) WITHOUT streaming the untouched
    * cells' stored edges through — what a bucket-stitching writer
    * ([[graft.sources.PrunedIndex.writeDelta]], used by
    * [[AnnIndexStore.appendDelta]]) lands so write I/O, not just
    * compute, is O(delta), leaving untouched buckets' files in place. */
  def recomputedGraphEdgesForDelta(spark: org.apache.spark.sql.SparkSession,
                                   graphPath: String,
                                   oldAssigned: DataFrame, deltaAssigned: DataFrame,
                                   idCol: String, vecCol: String,
                                   m: Int = 8, efConstruction: Int = 48): (DataFrame, DataFrame) = {
    import spark.implicits._
    val deltaIds = deltaAssigned.select(col(idCol)).distinct()
    // stale rows a re-upload displaces — their OLD cells must recompute
    // even when the updated vector lands in a different cell
    val replacedOld = oldAssigned.join(broadcast(deltaIds), Seq(idCol), "left_semi")
    val touched = deltaAssigned.select(col("cell"))
      .unionByName(replacedOld.select(col("cell"))).distinct()
    val oldEdges = graft.sources.PrunedIndex.readPruned(spark, graphPath, touched)
    // one tagged frame so a single groupByKey(cell) co-locates a cell's
    // surviving old nodes (kind 0), stored edges (kind 1), new nodes
    // (kind 2), and displaced-node markers (kind 3)
    def nodeRows(df: DataFrame, kind: Int) = df
      .join(touched, Seq("cell"), "left_semi")
      .select(col("cell"), lit(kind).as("kind"),
        col(idCol).cast("long").as("a"),
        transform(col(vecCol), x => x.cast("double")).as("v"),
        lit(0L).as("b"), lit(0).as("p"))
    val tagged = nodeRows(
        oldAssigned.join(broadcast(deltaIds), Seq(idCol), "left_anti"), 0)
      .unionByName(oldEdges.select(col("cell"), lit(1).as("kind"),
        col("src").as("a"), lit(null).cast("array<double>").as("v"),
        col("dst").as("b"), col("pos").as("p")))
      .unionByName(nodeRows(deltaAssigned, 2))
      .unionByName(replacedOld
        .select(col("cell"), lit(3).as("kind"), col(idCol).cast("long").as("a"),
          lit(null).cast("array<double>").as("v"), lit(0L).as("b"), lit(0).as("p")))
      .as[(Int, Int, Long, Seq[Double], Long, Int)]
    val recomputed = tagged.groupByKey(_._1).flatMapGroups { (cell, it) =>
      val rows = it.toArray
      val oldNodes = rows.iterator.filter(_._2 == 0)
        .map(r => (r._3, r._4.toArray)).toArray.sortBy(_._1)
      val newNodes = rows.iterator.filter(_._2 == 2)
        .map(r => (r._3, r._4.toArray)).toArray.sortBy(_._1)
      val all = (oldNodes ++ newNodes).sortBy(_._1)
      // a cell that lost a node cannot continue its stored build: the
      // stored adjacency encodes an insertion sequence including the
      // displaced node (its edges reference it) — rebuild from scratch
      val lostNode = rows.exists(_._2 == 3)
      val appendOnly = !lostNode && (oldNodes.isEmpty || newNodes.isEmpty ||
        newNodes.head._1 > oldNodes.last._1)
      val g =
        if (appendOnly && oldNodes.nonEmpty && newNodes.nonEmpty) {
          // reconstruct the stored graph over the old prefix, then run
          // the same sequential rule over just the new suffix
          val idToIdx = oldNodes.iterator.map(_._1).zipWithIndex.toMap
          val adj = Array.fill(all.length)(new ArrayBuffer[Int]())
          rows.iterator.filter(_._2 == 1).toArray.sortBy(_._6).foreach { r =>
            adj(idToIdx(r._3)).insert(
              math.min(r._6, adj(idToIdx(r._3)).length), idToIdx(r._5))
          }
          new NswGraph(all.map(_._1), all.map(_._2), m, efConstruction,
            prebuilt = adj, buildFrom = oldNodes.length)
        } else new NswGraph(all.map(_._1), all.map(_._2), m, efConstruction)
      g.edgeRows.map { case (src, dst, pos) => (cell, src, dst, pos) }
    }.toDF("cell", "src", "dst", "pos")
    (touched, recomputed)
  }

  /** Search over PERSISTED assignment + adjacency layouts: the probe's
    * cell set resolves first, then ONLY those cells' assignment AND
    * edge bucket files are read (manifest-listed), each cell's graph is
    * RECONSTRUCTED from its stored edges — no per-batch build — and
    * beam-searched. Results are identical to [[nswSearchAssigned]] at
    * the same (m, efConstruction, efSearch): reconstruction restores
    * the exact adjacency the build produced (pinned bit-equal in
    * GraphAnnSpec). */
  def nswSearchGraph(spark: org.apache.spark.sql.SparkSession,
                     assignedPath: String, graphPath: String,
                     centroids: Array[(Int, Array[Double])],
                     queries: DataFrame, idCol: String, vecCol: String,
                     k: Int, nprobe: Int = 4, efSearch: Int = 48): DataFrame = {
    import spark.implicits._
    val dvQ = queries.select(col(idCol).cast("long").as("qid"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    nswSearchGraphRouted(spark, assignedPath, graphPath,
      Similarity.probeCells(dvQ, centroids, nprobe)
        .select(col("qid"), col("v"), col("cell")),
      idCol, vecCol, k, efSearch)
  }

  /** [[nswSearchGraph]] with an EXPLICIT probe frame (qid, v double
    * array, cell) instead of flat-centroid routing — the entry point
    * the two-level router ([[HierarchicalRouting.routeQueries]]) feeds.
    * The probe frame is query-sized (|Q|·nprobe rows) and is collected
    * to the driver exactly like the flat router's; (idCol, vecCol) name
    * the stored assignment component's columns. */
  def nswSearchGraphRouted(spark: org.apache.spark.sql.SparkSession,
                           assignedPath: String, graphPath: String,
                           probes: DataFrame,
                           idCol: String, vecCol: String, k: Int,
                           efSearch: Int = 48): DataFrame = {
    require(k >= 1 && efSearch >= 1, s"need positive (k, efSearch); got ($k, $efSearch)")
    import spark.implicits._
    val probeRows = probes.select(col("qid").cast("long"), col("v"),
        col("cell").cast("int"))
      .as[(Long, Seq[Double], Int)].collect()
    val byCell: Map[Int, Array[(Long, Array[Double])]] = probeRows
      .groupBy(_._3).map { case (c, xs) =>
        c -> xs.sortBy(_._1).map(t => (t._1, t._2.toArray))
      }
    val probesB = spark.sparkContext.broadcast(byCell)
    val cellsDf = byCell.keys.toSeq.toDF("cell")

    val nodes = graft.sources.PrunedIndex.readPruned(spark, assignedPath, cellsDf)
      .select(col("cell"), lit(0).as("kind"), col(idCol).cast("long").as("a"),
        transform(col(vecCol), x => x.cast("double")).as("v"),
        lit(0L).as("b"), lit(0).as("p"))
    val edges = graft.sources.PrunedIndex.readPruned(spark, graphPath, cellsDf)
      .select(col("cell"), lit(1).as("kind"), col("src").as("a"),
        lit(null).cast("array<double>").as("v"), col("dst").as("b"), col("pos").as("p"))
    val hits = nodes.unionByName(edges)
      .as[(Int, Int, Long, Seq[Double], Long, Int)]
      .groupByKey(_._1).flatMapGroups { (cell, it) =>
        val qs = probesB.value.getOrElse(cell, Array.empty[(Long, Array[Double])])
        if (qs.isEmpty) Iterator.empty
        else {
          val rows = it.toArray
          val ns = rows.iterator.filter(_._2 == 0)
            .map(r => (r._3, r._4.toArray)).toArray.sortBy(_._1)
          val idToIdx = ns.iterator.map(_._1).zipWithIndex.toMap
          val adj = Array.fill(ns.length)(new ArrayBuffer[Int]())
          rows.iterator.filter(_._2 == 1).toArray.sortBy(_._6).foreach { r =>
            adj(idToIdx(r._3)).insert(
              math.min(r._6, adj(idToIdx(r._3)).length), idToIdx(r._5))
          }
          val g = new NswGraph(ns.map(_._1), ns.map(_._2), m = 1,
            efConstruction = 1, prebuilt = adj, buildFrom = ns.length)
          qs.iterator.flatMap { case (qid, qv) =>
            g.search(qv, efSearch).iterator.map { case (nid, cos) => (qid, nid, cos) }
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    hits.filter(col("query_id") =!= col("neighbor_id"))
      // a soft-multi-assigned vector lives in several cells' graphs; a
      // query probing two of them must not rank it twice. Duplicate
      // hits are identical triples (same vector ⇒ same cos), so the
      // collapse is deterministic — and a no-op under single
      // assignment, where cells partition the corpus.
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos").as("cos_sim"))
  }

  /** One cell's navigable-small-world graph. Single-threaded,
    * insertion in id order, every choice tie-broken by the total order
    * (cos desc, id asc) — fully deterministic for a given (ids, vecs).
    *
    * Build: node i beam-searches the graph of nodes [0, i) with
    * ef = efConstruction, links to its `m` best, and any neighbor
    * exceeding degree 2m prunes back to its 2m best (the HNSW layer-0
    * M/M_max discipline). The implicit ±1 backbone keeps the graph
    * connected under any pruning (see the object scaladoc).
    *
    * `prebuilt`/`buildFrom`: reconstruction and incremental-insert
    * support — adopt `prebuilt` as the adjacency state (the stored
    * edges of nodes [0, buildFrom)) and run the sequential build only
    * for nodes [buildFrom, n). With buildFrom = n the graph is a pure
    * reconstruction (search-only); determinism makes the continued
    * build identical to a from-scratch build whenever `prebuilt` is
    * itself the from-scratch state of the prefix. */
  private final class NswGraph(ids: Array[Long], vecs: Array[Array[Double]],
                               m: Int, efConstruction: Int,
                               prebuilt: Array[ArrayBuffer[Int]] = null,
                               buildFrom: Int = 0) {
    private val n = ids.length
    private val mMax = 2 * m
    private val norms: Array[Double] = vecs.map(v => math.sqrt(dotD(v, v)))
    private val adj: Array[ArrayBuffer[Int]] =
      if (prebuilt != null) {
        require(prebuilt.length == n,
          s"prebuilt adjacency covers ${prebuilt.length} nodes, graph has $n")
        prebuilt
      } else Array.fill(n)(new ArrayBuffer[Int](mMax + 1))

    /** The adjacency as (src id, dst id, position) rows — the persisted
      * form [[writeGraphIndex]] stores and reconstruction replays. */
    def edgeRows: Iterator[(Long, Long, Int)] =
      (0 until n).iterator.flatMap { i =>
        adj(i).iterator.zipWithIndex.map { case (j, pos) => (ids(i), ids(j), pos) }
      }

    // Σ aᵢ·bᵢ left-to-right — bit-equal to expr.FloatVecDot's loop
    private def dotD(a: Array[Double], b: Array[Double]): Double = {
      val len = math.min(a.length, b.length)
      var acc = 0.0
      var i = 0
      while (i < len) { acc += a(i) * b(i); i += 1 }
      acc
    }

    // cos = dot/(na·nb), zero-norm guard — VectorFunctions.cosineWithNorms
    private def cosTo(node: Int, q: Array[Double], qn: Double): Double = {
      val nn = norms(node) * qn
      if (nn == 0.0) 0.0 else dotD(vecs(node), q) / nn
    }

    // total order: greater = better = (cos desc, id asc); never 0 for
    // distinct nodes, so heap behavior is order-independent
    private def cmp(c1: Double, i1: Int, c2: Double, i2: Int): Int =
      if (c1 != c2) java.lang.Double.compare(c1, c2)
      else java.lang.Long.compare(ids(i2), ids(i1))
    private val bestFirst: Ordering[(Int, Double)] =
      (a, b) => cmp(a._2, a._1, b._2, b._1)

    /** Beam search over nodes [0, bound): the ef best reachable nodes,
      * best-first. Neighbor expansion walks adj ∪ {c−1, c+1} (the
      * backbone), so with ef ≥ bound the whole range is visited. */
    private def searchBounded(q: Array[Double], qn: Double, ef: Int,
                              bound: Int): ArrayBuffer[(Int, Double)] = {
      val visited = new java.util.BitSet(bound)
      val cand = PriorityQueue.empty[(Int, Double)](bestFirst)
      val res = PriorityQueue.empty[(Int, Double)](bestFirst.reverse) // head = worst kept
      val e0 = (0, cosTo(0, q, qn))
      visited.set(0)
      cand.enqueue(e0)
      res.enqueue(e0)
      var done = false
      while (!done && cand.nonEmpty) {
        val (c, cCos) = cand.dequeue()
        val worst = res.head
        if (res.size >= ef && cmp(cCos, c, worst._2, worst._1) < 0) done = true
        else {
          def offer(nb: Int): Unit = if (nb >= 0 && nb < bound && !visited.get(nb)) {
            visited.set(nb)
            val nbCos = cosTo(nb, q, qn)
            val w = res.head
            if (res.size < ef || cmp(nbCos, nb, w._2, w._1) > 0) {
              cand.enqueue((nb, nbCos))
              res.enqueue((nb, nbCos))
              if (res.size > ef) { res.dequeue(): Unit }
            }
          }
          offer(c - 1); offer(c + 1)
          adj(c).foreach(offer)
        }
      }
      res.dequeueAll.reverseIterator.to(ArrayBuffer) // best-first
    }

    /** Public search over the whole cell. */
    def search(q: Array[Double], ef: Int): ArrayBuffer[(Long, Double)] =
      if (n == 0) ArrayBuffer.empty
      else searchBounded(q, math.sqrt(dotD(q, q)), ef, n).map { case (i, c) => (ids(i), c) }

    private def shrink(j: Int): Unit = if (adj(j).length > mMax) {
      // bestFirst orders "greater = better", so sorting under its
      // REVERSE lists best-first; keep the HEAD mMax — the best mMax
      // under the total order (the HNSW layer-0 M_max prune)
      val kept = adj(j)
        .map(nb => (nb, cosTo(nb, vecs(j), norms(j))))
        .sorted(bestFirst.reverse).take(mMax)
        .map(_._1)
      adj(j).clear()
      adj(j) ++= kept
    }

    // sequential build (from buildFrom when a prebuilt prefix is adopted)
    {
      var i = math.max(1, buildFrom)
      while (i < n) {
        val found = searchBounded(vecs(i), norms(i), efConstruction, i)
        found.take(m).foreach { case (j, _) =>
          adj(i) += j
          adj(j) += i
          shrink(j)
        }
        i += 1
      }
    }
  }
}
