package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding columns.
  *
  * Pure built-in compositions (`zip_with`/`aggregate`/`transform`) —
  * codegen-friendly, no UDFs, executor-side only. Accumulation is double,
  * left-to-right, matching the oracle's formulation.
  */
object VectorFunctions {

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Σ aᵢ·bᵢ with sequential double accumulation — a native codegen'd
    * expression ([[graft.functions.expr.FloatVecDot]]); the composed
    * `aggregate(zip_with(...))` form computes the identical value but
    * pays interpreted lambda dispatch per element. */
  def dot(a: Column, b: Column): Column = graft.functions.expr.FloatVecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm inputs. For pairwise workloads
    * precompute `norm` per side once and use [[cosineWithNorms]] — the
    * norms are per-vector, not per-pair. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(dot(a, b), norm(a), norm(b))

  /** cos = dot/(na·nb) with zero-norm guard; same double ops as
    * [[cosine]], letting callers hoist the norm computations. */
  def cosineWithNorms(dotAB: Column, normA: Column, normB: Column): Column = {
    val nn = normA * normB
    when(nn === 0.0, lit(0.0)).otherwise(dotAB / nn)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Sign-bit sketch of `numBits` pseudo-random projections — the cheap
    * LSH bucket key for cosine similarity at scale. Projection vectors
    * are derived deterministically from the element index via xxhash64,
    * so executors need no shared state/broadcast of random matrices. */
  def signSketch(v: Column, numBits: Int): Column = {
    val dv = toDouble(v)
    val bits = (0 until numBits).map { b =>
      // pseudo-random ±1 weights per (bit, index)
      val proj = aggregate(
        zip_with(dv, sequence(lit(0), size(dv) - 1),
          (x, i) => x * when(pmod(xxhash64(concat(lit(s"p$b:"), i.cast("string"))), lit(2)) === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0)) * lit(1L << b)
    }
    bits.reduce(_ + _)
  }
}
