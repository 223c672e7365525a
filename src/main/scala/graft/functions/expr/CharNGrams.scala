package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-grams of a string: all `n`-character windows, in order;
  * strings shorter than `n` characters yield an empty array.
  *
  * Native expression for the same reason as [[WordShingles]], but the
  * composed form here is far worse than an allocation tax: in
  * `transform(sequence(1, length(t) - n + 1), i -> substr(t, i, n))`
  * the lambda body re-evaluates its whole subtree PER ELEMENT, so when
  * `t` is `normalizeText(text)` the regexp_replace runs once per gram —
  * O(len · regex) per row (measured: 22 s for 5k docs at sf0.1, ~95% of
  * the t94 wall). Here the child is evaluated once per row and the
  * gram loop walks the UTF-8 byte offsets in one O(len) pass.
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "char-gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_ngrams needs string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharNGrams.evalGrams(input.asInstanceOf[UTF8String], n)

  // companion method deliberately not named `eval` — see WordShingles
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.CharNGrams.evalGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNGrams {
  import org.apache.spark.sql.graft.ColumnBridge

  def apply(text: Column, n: Int): Column =
    ColumnBridge.column(CharNGrams(ColumnBridge.expression(text), n))

  private val Empty = new GenericArrayData(Array.empty[Any])

  def evalGrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val total = bytes.length
    // one pass: byte offset of every character start (UTF-8 aware)
    val offs = new Array[Int](total + 1)
    var chars = 0
    var off = 0
    while (off < total) {
      offs(chars) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      chars += 1
    }
    offs(chars) = total
    if (chars < n) return Empty
    val out = new Array[Any](chars - n + 1)
    var i = 0
    while (i + n <= chars) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
