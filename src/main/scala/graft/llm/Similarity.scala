package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over embedding columns.
  *
  *  - `bruteTopK`: exact top-k by cosine — broadcast the (small) query
  *    set against the corpus; one scan, no shuffle of the corpus beyond
  *    the final per-query top-k aggregation.
  *  - `ivfTopK`: IVF-style two-stage search — deterministic centroid
  *    selection, corpus pre-partitioned by nearest centroid, queries
  *    probe only `nprobe` cells. The 100 TB path: the corpus shuffle
  *    happens once at index build; each query touches a fraction of it.
  */
object Similarity {

  /** Exact top-k neighbors (by cosine, excluding self) for each query
    * vector. `queries` should be small — it is broadcast. Deterministic
    * total order: (cosine desc, neighbor id asc). */
  def bruteTopK(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_v"),
      norm(col(vecCol)).as("q_n"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_v"),
      norm(col(vecCol)).as("c_n"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosineWithNorms(dot(col("q_v"), col("c_v")), col("q_n"), col("c_n")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos").as("cos_sim"))
  }

  /** Deterministic IVF index: centroids = the `nCells` lowest-id vectors
    * (a fixed, seedless choice — swap in k-means for quality; the plan
    * shape is what matters), corpus assigned to nearest centroid. */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String, nCells: Int): DataFrame = {
    val centroids = corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("cell_id"), col(vecCol).as("cent_v"))
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(centroids), lit(true))
      .withColumn("cd", cosine(col(vecCol), col("cent_v")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("cd").desc, col("cell_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("cell_id"))
  }

  /** IVF search: probe the `nprobe` nearest cells per query, exact top-k
    * within the probed subset. Approximate (recall < 1 when a true
    * neighbor lives in an unprobed cell) but deterministic. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nCells: Int = 16, nprobe: Int = 4): DataFrame = {
    val assigned = ivfAssign(corpus, idCol, vecCol, nCells)
    val centroids = corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("cell_id"), col(vecCol).as("cent_v"))

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_v"))
    val qCells = q.join(broadcast(centroids), lit(true))
      .withColumn("cd", cosine(col("q_v"), col("cent_v")))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("cd").desc, col("cell_id"))
    val probes = qCells.withColumn("rn", row_number().over(wq)).filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q_v"), col("cell_id"))

    val scored = assigned.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_v"), col("cell_id"))
      .join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_v"), col("c_v")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      // a neighbor can appear via multiple probed cells only if assignment
      // were ambiguous — assignment is unique, so no distinct needed
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos").as("cos_sim"))
  }
}
