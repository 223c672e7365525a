package graft.functions.expr

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles over a token array: space-joined windows of `n`
  * consecutive tokens; documents shorter than `n` tokens yield their
  * whole token sequence as one shingle. `distinct = true` keeps the
  * first occurrence of each shingle (set semantics for Jaccard).
  *
  * Native expression: the composed
  * `transform(sequence(...), i -> concat_ws(" ", slice(toks, i, n)))`
  * form allocates a lambda frame and an array slice per shingle —
  * ~5 s per 5k docs; this loop is ~50× cheaper and is recomputed freely
  * wherever the plan needs shingles (recompute beats cache at scale).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles needs array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.evalShingles(input.asInstanceOf[ArrayData], n, distinct)

  // NB: the companion method must NOT be named `eval` — the class inherits
  // eval(InternalRow) from Expression, which suppresses the static
  // forwarder, so Janino would fail to resolve the call and Spark would
  // silently fall back to InterpretedUnsafeProjection for the whole
  // projection. NativeExprSpec pins this with CODEGEN_ONLY factory mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.WordShingles.evalShingles($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  import org.apache.spark.sql.graft.ColumnBridge

  def apply(tokens: Column, n: Int, distinct: Boolean): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), n, distinct))

  private val Space = UTF8String.fromString(" ")

  def evalShingles(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = arr.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val out =
      if (m >= n) {
        val res = new Array[UTF8String](m - n + 1)
        var s = 0
        while (s <= m - n) {
          res(s) = join(toks, s, n)
          s += 1
        }
        res
      } else Array(join(toks, 0, m))
    if (!distinct) new GenericArrayData(out.asInstanceOf[Array[Any]])
    else {
      val seen = mutable.LinkedHashSet.empty[UTF8String]
      out.foreach(seen.add)
      new GenericArrayData(seen.toArray[Any])
    }
  }

  private def join(toks: Array[UTF8String], start: Int, len: Int): UTF8String = {
    if (len == 1) return toks(start)
    val parts = new Array[UTF8String](len)
    System.arraycopy(toks, start, parts, 0, len)
    UTF8String.concatWs(Space, parts: _*)
  }
}
