package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two-level IVF routing — the ANN scale path past flat cells (r17
  * verdict item #4).
  *
  * The flat router ([[Similarity.assignCells]]) compiles the centroid
  * matrix into the assignment EXPRESSION and collects probe routing
  * driver-side — exactly right up to ~10³ cells, and structurally wrong
  * at the 10⁵–10⁶ cells a 10⁹-vector corpus needs: the driver cannot
  * hold (or compile) a million-row centroid matrix, and 16 flat cells
  * at 10⁹ vectors means 6·10⁷-vector cells (the per-task
  * `flatMapGroups` bound breaks first). The two-level form keeps the
  * driver's share at the COARSE level (k₁ rows — the same bounded
  * control-plane class as before) and pushes the fine level into a
  * coarse-keyed [[graft.sources.PrunedIndex]]:
  *
  *  - TRAIN: k₁ coarse centroids globally (the existing deterministic
  *    k-means); then per coarse cell, k₂ sub-centroids trained LOCALLY
  *    over a deterministic per-cell sample cap (the driver never sees
  *    them). Fine cell id = coarse·k₂ + sub; k₁·k₂ fine cells total
  *    with only k₁ driver-resident rows.
  *  - ASSIGN: a vector resolves its coarse cell (k₁-way argmin, the
  *    shared rule), then its `multiAssign` nearest sub-cells WITHIN
  *    that coarse cell via a cogroup — per-task state is one coarse
  *    cell's k₂ sub-centroids; vectors stream through.
  *  - ROUTE a query: `nprobeCoarse` nearest coarse cells driver-side
  *    (k₁-way, tiny), then ONLY those cells' sub-centroid buckets are
  *    read (pruned) and the query's global-best `nprobe` fine cells
  *    win — routing I/O is O(nprobeCoarse buckets), never O(k₁·k₂),
  *    and the fine-cell graphs probed stay
  *    corpus/(k₁·k₂)-sized, restoring the per-task memory bound.
  *
  * Vectors are float arrays with integral ids (the embeddings table's
  * shape — the same constraint [[GraphAnn]]'s long-id graphs already
  * impose). Everything is deterministic (decimal-mean coarse centroids,
  * id-ordered sub-seeds and samples, (d², cell) total-order ties), so a
  * hierarchical store replays bit-for-bit — the house literal-oracle
  * contract. */
object HierarchicalRouting {

  /** One (coarse, cell, centroid) row per sub-centroid; `cell` is the
    * GLOBAL fine id (coarse·nSub + sub). Persist with
    * [[writeSubCentroids]] (PrunedIndex keyed by coarse).
    * `corpusCoarse` carries (idCol, "v" double array, "coarse"). */
  def trainSubCentroids(corpusCoarse: DataFrame, idCol: String,
                        nSub: Int, iters: Int = 2,
                        sampleCap: Int = 100000): DataFrame = {
    require(nSub >= 1 && iters >= 0 && sampleCap >= nSub,
      s"need nSub >= 1, iters >= 0, sampleCap >= nSub; got ($nSub, $iters, $sampleCap)")
    val spark = corpusCoarse.sparkSession
    import spark.implicits._
    // the same seeding rule as the global k-means (lowest (xxhash64(id),
    // id)), applied per coarse cell; the Lloyd iterations run over the
    // SAME capped sample, so per-task memory is bounded by sampleCap
    // regardless of cell size — the sub-training analog of SPANN's
    // posting-length cap
    corpusCoarse
      .select(col("coarse").cast("int"), xxhash64(col(idCol)).as("h"),
        col(idCol).cast("long").as("id"), col("v"))
      .as[(Int, Long, Long, Seq[Double])]
      .groupByKey(_._1).flatMapGroups { (coarse, it) =>
        val sample = boundedSample(it.map(r => ((r._2, r._3), r._4.toArray)), sampleCap)
          .sortBy(_._1).map(_._2)
        localKMeans(sample, nSub, iters).zipWithIndex.map { case (c, s) =>
          (coarse, coarse * nSub + s, c.toSeq)
        }
      }.toDF("coarse", "cell", "centroid")
  }

  /** The `cap` rows with the LOWEST keys, in one streaming pass
    * (bounded max-heap — never materializes the group). */
  private def boundedSample[K: Ordering, V](it: Iterator[(K, V)],
                                            cap: Int): Array[(K, V)] = {
    val ord = implicitly[Ordering[K]]
    val heap = scala.collection.mutable.PriorityQueue.empty[(K, V)](
      Ordering.by[(K, V), K](_._1)) // max-heap: head = largest kept key
    it.foreach { kv =>
      if (heap.size < cap) heap.enqueue(kv)
      else if (ord.lt(kv._1, heap.head._1)) {
        heap.dequeue(); heap.enqueue(kv)
      }
    }
    heap.toArray
  }

  /** Deterministic local Lloyd over an id-ordered sample: seeds are the
    * first k sample rows, sums accumulate left-to-right in sample
    * order, argmin ties break toward the lower cell — the same total
    * order the assigner uses. An empty cluster keeps its centroid (the
    * global trainer's `next.isEmpty` guard, per cluster). */
  private def localKMeans(sample: Array[Array[Double]], k: Int,
                          iters: Int): Array[Array[Double]] = {
    if (sample.isEmpty) return Array.empty
    var cents = sample.take(k).map(_.clone)
    for (_ <- 0 until iters) {
      val sums = Array.fill(cents.length)(new Array[Double](sample.head.length))
      val counts = new Array[Long](cents.length)
      sample.foreach { v =>
        val c = nearestCell(v, cents)
        val s = sums(c)
        var i = 0
        while (i < v.length && i < s.length) { s(i) += v(i); i += 1 }
        counts(c) += 1
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0L) cents(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    cents
  }

  private def nearestCell(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = d2(v, cents(0))
    var c = 1
    while (c < cents.length) {
      val d = d2(v, cents(c))
      if (d < bestD) { best = c; bestD = d }
      c += 1
    }
    best
  }

  private def d2(a: Array[Double], b: Array[Double]): Double = {
    val len = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < len) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  /** Persist sub-centroids in the coarse-keyed pruned layout: a query
    * reads only its probed coarse cells' buckets. */
  def writeSubCentroids(subCents: DataFrame, path: String,
                        numBuckets: Int): Unit =
    graft.sources.PrunedIndex.write(
      subCents.select(col("coarse"), col("cell"), col("centroid")),
      path, Seq("coarse"), numBuckets)

  /** Fine assignment: each vector's `multiAssign` nearest sub-cells
    * WITHIN its (hard-assigned) coarse cell — (idCol, vecCol, cell)
    * rows with GLOBAL fine ids, the exact shape
    * [[Similarity.ivfAssignedIndexMulti]] emits for the flat router.
    * Cogroup on coarse: per task, one cell's k₂ sub-centroids in
    * memory, vectors streaming. The (d² asc, cell asc) tie rule
    * matches the flat assigner's struct argmin. `corpusCoarse` carries
    * (idCol, vecCol, "v", "coarse"); ids must be integral and vectors
    * float arrays (re-emitted as such). */
  def assignFine(corpusCoarse: DataFrame, subCents: DataFrame,
                 idCol: String, vecCol: String,
                 multiAssign: Int = 1): DataFrame =
    assignFineRanked(corpusCoarse, subCents, idCol, vecCol, multiAssign)
      .drop("rank")

  /** [[assignFine]] with the assignment RANK kept (1 = the within-
    * coarse argmin sub-cell — the SEMANTIC fine cluster; 2.. = routing
    * redundancy), the two-level twin of
    * [[Similarity.ivfAssignedIndexMultiRanked]]: persisting rank at
    * assignment time is what spares primary-cell consumers the
    * per-probe argmin re-derive. */
  def assignFineRanked(corpusCoarse: DataFrame, subCents: DataFrame,
                       idCol: String, vecCol: String,
                       multiAssign: Int = 1): DataFrame = {
    require(multiAssign >= 1, s"multiAssign must be >= 1, got $multiAssign")
    val spark = corpusCoarse.sparkSession
    import spark.implicits._
    val vecs = corpusCoarse.select(col("coarse").cast("int"),
        col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("float")).as("vec"),
        col("v"))
      .as[(Int, Long, Seq[Float], Seq[Double])]
    val cents = subCents.select(col("coarse").cast("int"),
        col("cell").cast("int"),
        transform(col("centroid"), x => x.cast("double")).as("c"))
      .as[(Int, Int, Seq[Double])]
    cents.groupByKey(_._1).cogroup(vecs.groupByKey(_._1)) { (_, cIt, vIt) =>
      val cs = cIt.toArray.sortBy(_._2)
      if (cs.isEmpty) Iterator.empty
      else {
        val cellIds = cs.map(_._2)
        val cellVecs = cs.map(_._3.toArray)
        vIt.flatMap { case (_, id, vec, vSeq) =>
          val v = vSeq.toArray
          cellVecs.indices.map(i => (d2(v, cellVecs(i)), cellIds(i)))
            .sorted.take(multiAssign)
            .iterator.zipWithIndex
            .map { case ((_, cell), i) => (id, vec, cell, i + 1) }
        }
      }
    }.toDF("__id", "__vec", "cell", "rank")
      .select(col("__id").as(idCol), col("__vec").as(vecCol),
        col("cell"), col("rank"))
  }

  /** Route queries to their global-best `nprobe` fine cells through the
    * two levels: `nprobeCoarse` coarse cells driver-side, then ONLY
    * those cells' sub-centroid buckets read (pruned), ranked by
    * (d² asc, cell asc) per query. Returns (qid, v, cell) — the probe
    * frame the graph search collects and broadcasts (|Q|·nprobe rows,
    * the same bound as the flat router's).
    *
    * Routing is CONTROL-PLANE work: the consumer
    * ([[GraphAnn.nswSearchGraphRouted]]) collects the probe frame
    * driver-side anyway, so when the probed coarse cells' sub-centroid
    * rows fit under `driverRouteCap` (|touched coarse| · k₂ rows — the
    * pruned read is the SAME either way), the fine ranking runs
    * driver-side too, skipping two distributed jobs (the broadcast
    * join + the per-qid window shuffle) — the constant extra hop
    * ABLATION_r18 measured against the flat router. Past the cap (a
    * huge query batch fanning over many coarse cells) the ranking runs
    * distributed, bit-identically: both paths evaluate the same d²
    * (sequential left-to-right double dot products — FloatVecDot's
    * contract) under the same (d² asc, cell asc) total order, pinned
    * equal in AnnIndexStoreSpec. `driverRouteCap = 0` forces the
    * distributed shape (ScaleSpec's file-gate uses it). */
  def routeQueries(spark: SparkSession, subCentsPath: String,
                   coarse: Array[(Int, Array[Double])],
                   queries: DataFrame, idCol: String, vecCol: String,
                   nprobeCoarse: Int, nprobe: Int,
                   driverRouteCap: Int = 65536): DataFrame = {
    require(nprobeCoarse >= 1 && nprobe >= 1,
      s"need positive (nprobeCoarse, nprobe); got ($nprobeCoarse, $nprobe)")
    import spark.implicits._
    if (driverRouteCap > 0) {
      // -0.0 orders below 0.0 in java.lang.Double.compare but equal in
      // SQL comparisons — normalize so both paths share one total order
      def norm(x: Double): Double = if (x == 0.0) 0.0 else x
      def dotd(a: Array[Double], b: Array[Double]): Double = {
        val n = math.min(a.length, b.length)
        var acc = 0.0; var i = 0
        while (i < n) { acc += a(i) * b(i); i += 1 }
        acc
      }
      val qRows = queries.select(col(idCol).cast("long").as("qid"),
          transform(col(vecCol), x => x.cast("double")).as("v"))
        .as[(Long, Seq[Double])].collect()
      // coarse level: the same d² formulation as Similarity.probeCells
      // (v·v − 2 v·c + Σc²; sums sequential left-to-right)
      val byQuery = qRows.map { case (qid, vSeq) =>
        val v = vSeq.toArray
        val v2 = dotd(v, v)
        val probed = coarse.map { case (cell, c) =>
          (norm(v2 - 2.0 * dotd(v, c) + c.map(x => x * x).sum), cell)
        }.sorted.take(nprobeCoarse).map(_._2)
        (qid, vSeq, v, v2, probed)
      }
      val touched = byQuery.flatMap(_._5).distinct.sorted
      val subRows = graft.sources.PrunedIndex.readPruned(spark, subCentsPath,
          touched.toSeq.toDF("coarse"))
        .select(col("coarse").cast("int"), col("cell").cast("int"),
          transform(col("centroid"), x => x.cast("double")).as("c"))
        .as[(Int, Int, Seq[Double])]
        .limit(driverRouteCap + 1).collect()
      if (subRows.length <= driverRouteCap) {
        val byCoarse = subRows.groupBy(_._1)
          .map { case (co, xs) => co -> xs.map(t => (t._2, t._3.toArray)) }
        val out = byQuery.iterator.flatMap { case (qid, vSeq, v, v2, probed) =>
          probed.iterator.flatMap(co =>
              byCoarse.getOrElse(co, Array.empty[(Int, Array[Double])]).iterator
                .map { case (cell, c) =>
                  (norm(v2 - 2.0 * dotd(v, c) + dotd(c, c)), cell)
                })
            .toArray.sorted.take(nprobe)
            .iterator.map { case (_, cell) => (qid, vSeq, cell) }
        }.toSeq
        return out.toDF("qid", "v", "cell")
      }
      // fell past the cap: fall through to the distributed ranking
      // (the pruned read below re-reads the same touched buckets)
    }
    import graft.functions.VectorFunctions.dot
    val dvQ = queries.select(col(idCol).cast("long").as("qid"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val coarseProbes = Similarity.probeCells(dvQ, coarse, nprobeCoarse)
      .select(col("qid"), col("v"), col("cell").as("coarse"))
    val subs = graft.sources.PrunedIndex.readPruned(spark, subCentsPath,
        coarseProbes.select(col("coarse")).distinct())
      .select(col("coarse"), col("cell").cast("int").as("cell"),
        transform(col("centroid"), x => x.cast("double")).as("c"))
    val scored = broadcast(coarseProbes).join(subs, Seq("coarse"))
      .withColumn("d2",
        dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("c")) +
          dot(col("c"), col("c")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("d2"), col("cell"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("v"), col("cell"))
  }
}
