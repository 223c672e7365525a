package graft.functions.expr

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a broadcast [[BloomFilter]] — the prefilter
  * primitive for set-membership joins whose build side is too large to
  * broadcast verbatim but whose FILTER fits fine (a bloom of 100 M keys
  * at 1% fpp is ~120 MB vs multi-GB of strings). False positives are
  * the caller's contract: downstream must re-verify (e.g. an inner join
  * against the real key set), false negatives never occur.
  *
  * The filter rides as a Broadcast reference (PrefixShingles pattern):
  * shipped once per executor, O(1) TreeNode equality, and the codegen
  * path calls back through a reference object so the probe stays inside
  * the surrounding WholeStageCodegen span.
  *
  * Bytes probed are the string's UTF-8 bytes — the same encoding
  * `BloomFilter.putString` uses, so a filter built by
  * `DataFrameStatFunctions.bloomFilter` over the key column matches. */
case class BloomMightContain(child: Expression, bfBc: Broadcast[BloomFilter])
    extends UnaryExpression with Predicate {

  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_might_contain needs string, got $t")
  }

  private lazy val bf: BloomFilter = bfBc.value

  override protected def nullSafeEval(input: Any): Any =
    bf.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.evalPublic($c);")
  }

  /** Codegen entry (reference-object call). */
  def evalPublic(input: Any): Boolean = nullSafeEval(input).asInstanceOf[Boolean]

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.graft.ColumnBridge

  def apply(c: Column, bfBc: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bfBc))
}
