package graft.functions

import org.apache.spark.sql.SparkSession

import graft.functions.expr.{FloatVecDot, MinHashSig, SimHash64, WordShingles}

/** SQL registration for the engine's native expressions, so `spark.sql`
  * users get them as first-class functions:
  *
  *   vec_dot(a, b)          — double dot product over float/double arrays
  *   simhash64(tokens)      — 64-bit SimHash of an array<string>
  *   minhash_sig(sh, n)     — n-minima MinHash signature (array<long>)
  *   word_shingles(toks, n) — distinct word n-gram shingles
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSig(exprs(0), exprs(1).eval().asInstanceOf[Int]), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      exprs => WordShingles(exprs(0), exprs(1).eval().asInstanceOf[Int], distinct = true), "built-in")
    reg.createOrReplaceTempFunction("sign_sketch",
      exprs => expr.SignSketch(exprs(0), exprs(1).eval().asInstanceOf[Int], 42L), "built-in")
    reg.createOrReplaceTempFunction("winnowing",
      exprs => expr.Winnowing(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]), "built-in")
  }
}
