package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane sign sketch for cosine LSH: `numBits` pseudo-random
  * ±1 projections of the vector, packed into a long. Collision
  * probability of each bit is 1 − θ/π (θ = angle), so near-duplicate
  * vectors share most bits — banding the bits gives a sub-quadratic
  * candidate generator for embedding dedup at corpus scale.
  *
  * Projection weights derive from a splitmix64 mix of
  * (seed, bit, index) — no stored matrix, no broadcast; every executor
  * computes identical sketches statelessly. */
case class SignSketch(child: Expression, numBits: Int, seed: Long) extends UnaryExpression {

  require(numBits >= 1 && numBits <= 64, "numBits in [1, 64]")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sign_sketch needs array<float|double>, got $t")
  }

  // deferred: child.dataType is only valid after analysis resolves it
  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override protected def nullSafeEval(input: Any): Any =
    SignSketch.evalSketch(input.asInstanceOf[ArrayData], numBits, seed, isFloat)

  // Companion method deliberately not named `eval` (see WordShingles) so
  // the static forwarder generates and the call codegens.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expr.SignSketch.evalSketch($c, $numBits, ${seed}L, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignSketch {
  import org.apache.spark.sql.graft.ColumnBridge

  def apply(vec: Column, numBits: Int, seed: Long = 42L): Column =
    ColumnBridge.column(SignSketch(ColumnBridge.expression(vec), numBits, seed))

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def evalSketch(arr: ArrayData, numBits: Int, seed: Long, isFloat: Boolean): Long = {
    val n = arr.numElements()
    var sketch = 0L
    var b = 0
    while (b < numBits) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val w = if ((mix(seed * 0x100000001b3L + b.toLong * 0x10001L + i) & 1L) == 0L) 1.0 else -1.0
        acc += v * w
        i += 1
      }
      if (acc >= 0) sketch |= (1L << b)
      b += 1
    }
    sketch
  }
}
