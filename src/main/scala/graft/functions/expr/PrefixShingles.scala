package graft.functions.expr

import java.util.Arrays

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Prefix selection for the prefix-filtered set-similarity join
  * (Chaudhuri et al., "A Primitive Operator for Similarity Joins",
  * ICDE'06): order the row's shingle set by the GLOBAL total order
  * (document frequency, shingle) and keep the first
  * |S| − ⌈t·|S|⌉ + 1 elements. Two sets with Jaccard ≥ t cannot have
  * disjoint prefixes under any shared total order, so joining on prefix
  * shingles alone is complete.
  *
  * The df head rides as a BROADCAST variable referenced by the
  * expression: shingles absent from it count as df = 1 — it only has to
  * cover the hot head for the ordering to prune well, so it is capped
  * (bounded state at any corpus size). Broadcasting (vs. a plain map
  * field) ships the up-to-100k-entry head once per executor instead of
  * Java-serializing it into the plan for every task, and keeps TreeNode
  * equality/canonicalization O(1) (Broadcast compares by reference).
  * This turns the prefix computation into ONE narrow map over the doc
  * scan — the composed form (explode → join df → regroup by doc)
  * shuffles the full inverted index twice before the similarity join
  * even starts. */
case class PrefixShingles(child: Expression, threshold: Double,
                          dfHeadBc: org.apache.spark.broadcast.Broadcast[Map[String, Long]])
    extends UnaryExpression {

  require(threshold > 0 && threshold <= 1, "threshold in (0, 1]")

  private lazy val dfHead: Map[String, Long] = dfHeadBc.value

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"prefix_shingles needs array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // global order key: (df, shingle); absent shingles have df = 1
    val keys = new Array[(Long, UTF8String)](n)
    var i = 0
    while (i < n) {
      val s = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      keys(i) = (dfHead.getOrElse(s.toString, 1L), s)
      i += 1
    }
    Arrays.sort(keys, PrefixShingles.ByDfThenShingle)
    val take = math.min(n, n - math.ceil(threshold * n).toInt + 1)
    val out = new Array[Any](take)
    i = 0
    while (i < take) { out(i) = keys(i)._2; i += 1 }
    new GenericArrayData(out)
  }

  // The df map can't inline into Janino source — pass the expression
  // instance as a reference object (BpeTokenCount pattern) so the call
  // still sits inside the surrounding WholeStageCodegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prefixExpr", this, classOf[PrefixShingles].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.evalPublic($c);")
  }

  /** Codegen entry (reference-object call). */
  def evalPublic(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PrefixShingles {
  import org.apache.spark.sql.graft.ColumnBridge

  // Re-use the broadcast across calls with an equal df-head (repeated
  // dedup jobs in one long-lived session — bench loops, cron drivers):
  // without this every call ships and retains a fresh multi-MB broadcast
  // for the session's lifetime. Keyed by the owning SparkContext too — a
  // cached Broadcast bound to a stopped context (test suites restart
  // sessions) would fail the query instead of re-broadcasting. Evicted
  // entries are unpersisted (not destroyed) so any still-running query
  // can refetch from the driver.
  private val bcCache = new java.util.LinkedHashMap[
      (org.apache.spark.SparkContext, Map[String, Long]),
      org.apache.spark.broadcast.Broadcast[Map[String, Long]]](
      8, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(org.apache.spark.SparkContext, Map[String, Long]),
          org.apache.spark.broadcast.Broadcast[Map[String, Long]]]): Boolean =
      if (size > 4 || stoppedProbe(e.getKey._1)) {
        if (!stoppedProbe(e.getKey._1)) e.getValue.unpersist(false)
        true
      } else false
  }

  // Test seam: suites can't stop the shared SparkContext, so the sweep
  // predicate is injectable. Production value: SparkContext.isStopped.
  private[graft] var stoppedProbe: org.apache.spark.SparkContext => Boolean = _.isStopped

  /** Drop every cache entry bound to a stopped context. The LRU
    * `removeEldestEntry` hook only ever inspects the eldest entry, so a
    * stopped-context entry that isn't eldest could otherwise linger for
    * the JVM's lifetime, pinning its multi-MB map on the driver. Called
    * on every [[apply]] (the monitor is reentrant). */
  private[graft] def sweepStopped(): Int = bcCache.synchronized {
    var removed = 0
    val it = bcCache.entrySet().iterator()
    while (it.hasNext) {
      if (stoppedProbe(it.next().getKey._1)) { it.remove(); removed += 1 }
    }
    removed
  }

  private[graft] def cacheSize: Int = bcCache.synchronized(bcCache.size)

  def apply(shingles: Column, threshold: Double, dfHead: Map[String, Long]): Column = {
    val sc = org.apache.spark.sql.SparkSession.active.sparkContext
    val bc = bcCache.synchronized {
      sweepStopped()
      val hit = bcCache.get((sc, dfHead))
      if (hit != null) hit
      else {
        val b = sc.broadcast(dfHead)
        bcCache.put((sc, dfHead), b)
        b
      }
    }
    ColumnBridge.column(PrefixShingles(ColumnBridge.expression(shingles), threshold, bc))
  }

  private[expr] object ByDfThenShingle extends java.util.Comparator[(Long, UTF8String)] {
    override def compare(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else a._2.compareTo(b._2)
    }
  }
}
