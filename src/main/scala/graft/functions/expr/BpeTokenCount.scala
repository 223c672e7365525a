package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** BPE token count of a word array under a learned merge list: each word
  * is split to characters, then the highest-priority adjacent pair
  * merges repeatedly until none applies; the output is the total symbol
  * count. The merge table rides inside the expression (serialized to
  * executors with the plan — no lookup side channel). */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bpe_token_count needs array<string>, got $t")
  }

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var total = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty) total += graft.llm.Bpe.encodeWord(w, rank).size
      }
      i += 1
    }
    total
  }

  // The merge table can't be inlined into generated java source; fall
  // back to interpreted eval for this expression (still inside the
  // surrounding WholeStageCodegen via the codegen fallback path).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeExpr", this, classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = (Long) $ref.evalPublic($c);")
  }

  /** Codegen entry (reference-object call). */
  def evalPublic(input: Any): Any = nullSafeEval(input)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokenCount {
  import org.apache.spark.sql.graft.ColumnBridge
  def apply(tokens: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(tokens), merges))
}
