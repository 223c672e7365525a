package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.ColumnBridge

/** Native as-of join — the whole-operator Catalyst extension path
  * (logical node → planner strategy → physical exec), for the
  * point-in-time lookup Spark has no built-in operator for.
  *
  * Semantics: for each left row, the single right row with the greatest
  * `rightTs <= leftTs` in the same key group; unmatched left rows get
  * null payload (left-outer as-of). Identical results to
  * [[graft.operators.Relational.asOfJoin]] (the composed union-and-sweep
  * form); this version declares `ClusteredDistribution` on both
  * children, so Catalyst co-partitions the sides (and skips the shuffle
  * entirely when inputs are already hash-partitioned on the keys —
  * e.g., bucketed tables), then each partition does one hash-build over
  * its right rows + binary search per left row.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload.map(_.withNullability(true))

  /** Both sides clustered on the join keys ⇒ co-partitioned merge with
    * no broader movement; EnsureRequirements inserts the minimal
    * exchanges (none for pre-bucketed/pre-partitioned inputs). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val payloadExprs: Seq[Expression] = payload
    val rightOutput = right.output
    val leftOutput = left.output
    val lKeysB = leftKeys.map(BindReferences.bindReference(_, leftOutput))
    val rKeysB = rightKeys.map(BindReferences.bindReference(_, rightOutput))
    val lTsB = BindReferences.bindReference(leftTs, leftOutput)
    val rTsB = BindReferences.bindReference(rightTs, rightOutput)
    val payloadB = payloadExprs.map(BindReferences.bindReference(_, rightOutput))
    val schemaOut = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rKeyProj = UnsafeProjection.create(rKeysB)
      val rPayloadProj = UnsafeProjection.create(payloadB)
      // key → (sorted ts array, payload rows in the same order)
      val index = new java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])]()
      val builder = new java.util.HashMap[InternalRow, scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
      rIter.foreach { row =>
        val k = rKeyProj(row).copy()
        val ts = rTsB.eval(row).asInstanceOf[Number].longValue()
        val p = rPayloadProj(row).copy()
        val buf = builder.computeIfAbsent(k, _ => scala.collection.mutable.ArrayBuffer.empty)
        buf += ((ts, p))
      }
      builder.forEach { (k, buf) =>
        val sorted = buf.sortBy(_._1)
        index.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
      }

      val lKeyProj = UnsafeProjection.create(lKeysB)
      // bind against nullable payload attrs: unmatched left rows carry a
      // null payload row, and a non-nullable binding would read 0s
      val outProj = UnsafeProjection.create(schemaOut,
        leftOutput ++ payload.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(payload.size)

      lIter.map { lRow =>
        val entry = index.get(lKeyProj(lRow))
        val matched =
          if (entry == null) nullPayload
          else {
            val (tss, rows) = entry
            val lts = lTsB.eval(lRow).asInstanceOf[Number].longValue()
            // rightmost index with tss(i) <= lts
            var lo = 0; var hi = tss.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tss(mid) <= lts) { ans = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (ans < 0) nullPayload else rows(ans)
          }
        outProj(joined(lRow, matched))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule for the custom node: a limit above an as-of join can
  * run on the left child instead — the join emits exactly one row per
  * left row, so any-N output rows = any-N left rows joined. Catalyst
  * can't know that for a foreign node; this rule teaches it. */
object AsOfLimitPushdown extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LocalLimit
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case LocalLimit(expr, a: AsOfJoinPlan) if !a.left.isInstanceOf[LocalLimit] =>
      a.copy(left = LocalLimit(expr, a.left))
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, p) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, p) :: Nil
    case _ => Nil
  }
}

/** Builder-time registration: `SparkSession.builder().withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => AsOfLimitPushdown)
    e.injectOptimizerRule(_ => IntervalJoinRewrite)
    graft.functions.GraftTableFunctions.descriptions.foreach(e.injectTableFunction)
  }
}

object AsOfJoinNative {

  /** Runtime registration for sessions built without extensions. */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(AsOfLimitPushdown)) {
      spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ AsOfLimitPushdown
    }
    if (!spark.experimental.extraOptimizations.contains(IntervalJoinRewrite)) {
      spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ IntervalJoinRewrite
    }
  }

  /** As-of join `left` to `right` on `keys`, matching the greatest
    * `right.rightTs <= left.leftTs`; appends `payload` columns (renamed
    * `asof_<rightTs>` for the timestamp, as the composed form does). */
  def apply(left: DataFrame, right: DataFrame, keys: Seq[String],
            leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = ColumnBridge.analyzed(left)
    // Rename the payload ts like the composed asOfJoin output, and
    // re-alias every right column: fresh exprIds keep this node's key/
    // payload references valid when left and right share a source
    // relation (DeduplicateRelations rewrites the child subtree of a
    // custom node but not the node's own expressions).
    import org.apache.spark.sql.functions.col
    val rRenamed = right.withColumnRenamed(rightTs, s"asof_$rightTs")
    val rFresh = rRenamed.select(rRenamed.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val rPlan = ColumnBridge.analyzed(rFresh)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${plan.output.map(_.name)}"))
    val node = AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTs), attr(rPlan, s"asof_$rightTs"),
      (s"asof_$rightTs" +: payload).map(attr(rPlan, _)))
    ColumnBridge.ofRows(spark, node)
  }
}
