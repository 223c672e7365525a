package graft.functions.expr

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD'03): rolling Rabin-Karp hashes of character `k`-grams; in
  * each window of `w` consecutive hashes keep the rightmost minimum;
  * consecutive duplicates collapse. Guarantees: any shared substring of
  * length ≥ w + k − 1 produces ≥ 1 shared fingerprint — the standard
  * near-copy detector for code/text corpora.
  *
  * Native expression: one pass over the bytes per row, output
  * `array<long>` of selected hashes (position-independent). */
case class Winnowing(child: Expression, k: Int, w: Int) extends UnaryExpression {

  require(k >= 2 && w >= 1, "need k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t          => TypeCheckResult.TypeCheckFailure(s"winnowing needs string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Winnowing.evalWinnow(input.asInstanceOf[UTF8String], k, w)

  // Companion method deliberately not named `eval` (see WordShingles) so
  // the static forwarder generates and the call codegens.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.Winnowing.evalWinnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnowing {
  import org.apache.spark.sql.graft.ColumnBridge

  def apply(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(Winnowing(ColumnBridge.expression(text), k, w))

  private val Base = 0x100000001b3L // FNV prime as the rolling base

  def evalWinnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])

    // rolling k-gram hashes
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xFF); i += 1 }
    hashes(0) = finalize(h)
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xFF) * pow) * Base + (bytes(i + k - 1) & 0xFF)
      hashes(i) = finalize(h)
      i += 1
    }

    // winnow: rightmost minimum of each w-window, dedup consecutive picks
    val out = ArrayBuffer.empty[Long]
    var lastPick = -1
    var start = 0
    while (start + w <= m || (start == 0 && m < w)) {
      val end = math.min(start + w, m)
      var minIdx = start
      var j = start + 1
      while (j < end) {
        if (hashes(j) <= hashes(minIdx)) minIdx = j // rightmost min
        j += 1
      }
      if (minIdx != lastPick) { out += hashes(minIdx); lastPick = minIdx }
      if (m < w) start = m else start += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out.toArray)
  }

  private def finalize(h: Long): Long = {
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z ^ (z >>> 31)
  }
}
