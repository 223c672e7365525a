package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.{FloatVecDot, MinHashSig, SimHash64, WordShingles}
import graft.functions.TextFunctions

/** Edge cases for the native expressions: empty inputs, nulls, short
  * docs, and value equivalence with the composed built-in forms. */
class NativeExprSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.isolated // mutates session state (conf/listeners)
  import spark.implicits._

  test("FloatVecDot equals composed aggregate(zip_with) bit-for-bit") {
    val df = Seq(
      (Array(1.5f, -2.25f, 3.125f), Array(0.5f, 4.0f, -1.75f)),
      (Array.empty[Float], Array.empty[Float])
    ).toDF("a", "b")
    val composed = aggregate(
      zip_with(transform($"a", x => x.cast("double")), transform($"b", x => x.cast("double")),
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val rows = df.select(FloatVecDot($"a", $"b").as("fast"), composed.as("slow"))
      .as[(Double, Double)].collect()
    rows.foreach { case (f, s) => assert(f == s) }
  }

  test("FloatVecDot null propagation") {
    val df = Seq((Some(Array(1f)), None: Option[Array[Float]])).toDF("a", "b")
    assert(df.select(FloatVecDot($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("WordShingles: short docs, empty string, distinct order") {
    val df = Seq("one two", "", "a b c d").toDF("t")
    val out = df.select(WordShingles(TextFunctions.tokens(TextFunctions.normalizeText($"t")), 3,
      distinct = true)).as[Seq[String]].collect()
    assert(out(0) == Seq("one two"))   // shorter than n → whole sequence
    assert(out(1) == Seq(""))          // empty text → single empty shingle
    assert(out(2) == Seq("a b c", "b c d"))
  }

  test("WordShingles distinct keeps first occurrence once") {
    val df = Seq("x y x y x y").toDF("t") // shingle "x y x"/"y x y" repeat
    val s = df.select(WordShingles(TextFunctions.tokens($"t"), 3, distinct = true))
      .as[Seq[String]].collect()(0)
    assert(s == Seq("x y x", "y x y"))
  }

  test("MinHashSig: empty set gives MaxValue minima; equal sets equal sigs") {
    val df = Seq(Seq.empty[String], Seq("a", "b"), Seq("b", "a")).toDF("s")
    val sigs = df.select(MinHashSig($"s", 8)).as[Seq[Long]].collect()
    assert(sigs(0).forall(_ == Long.MaxValue))
    assert(sigs(1) == sigs(2)) // order-insensitive
  }

  test("SimHash64: empty tokens → 0; anagram token multisets equal") {
    val df = Seq(Seq.empty[String], Seq("x", "y"), Seq("y", "x")).toDF("s")
    val sigs = df.select(graft.functions.expr.SimHash64($"s")).as[Long].collect()
    assert(sigs(0) == 0L)
    assert(sigs(1) == sigs(2))
  }

  test("CharNGrams equals composed transform/substr form; multi-byte safe") {
    val df = Seq("abcdef", "ab", "", "héllo wörld", "日本語のテキスト").toDF("t")
    val composed = when(length($"t") >= 3,
      transform(sequence(lit(1), length($"t") - lit(2)), i => $"t".substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
    val rows = df.select(
      graft.functions.expr.CharNGrams($"t", 3).as("fast"), composed.as("slow"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (f, s) => assert(f == s, s"$f vs $s") }
  }

  test("Md5Bucket equals the composed conv(substring(md5)) form bit-for-bit") {
    val df = (Seq("", "a", "the quick brown fox", "héllo wörld", "日本語")
      ++ (0 until 500).map(i => s"tok$i")).toDF("t")
    for (n <- Seq(1, 2, 256, 1024, 65536)) {
      val rows = df.select(
        graft.functions.expr.Md5Bucket($"t", n).as("fast"),
        (conv(substring(md5($"t"), 1, 12), 16, 10).cast("long") % n).as("slow"))
        .as[(Long, Long)].collect()
      rows.foreach { case (f, s) => assert(f == s, s"n=$n: $f vs $s") }
    }
  }

  test("all native expressions compile under CODEGEN_ONLY (no interpreter fallback)") {
    // CODEGEN_ONLY makes any Janino failure throw instead of silently
    // dropping the projection to InterpretedUnsafeProjection — this is
    // the regression pin for the static-forwarder pitfall (a companion
    // method named `eval` collides with Expression.eval(InternalRow) and
    // never gets a forwarder, so generated code can't resolve it).
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog", Array(1.0f, -2.0f, 0.5f)),
      ("", Array.empty[Float])
    ).toDF("t", "v")
    val toks = TextFunctions.tokens(TextFunctions.normalizeText($"t"))
    val q = df.select(
      WordShingles(toks, 3, distinct = true).as("sh"),
      MinHashSig(WordShingles(toks, 3, distinct = true), 16).as("mh"),
      SimHash64(toks).as("simh"),
      graft.functions.expr.SignSketch($"v", 16).as("sk"),
      graft.functions.expr.Winnowing($"t", 4, 5).as("fp"),
      graft.functions.expr.CharNGrams($"t", 3).as("cg"),
      graft.functions.expr.Md5Bucket($"t", 1024).as("mb"),
      FloatVecDot($"v", $"v").as("d"))
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      assert(q.collect().length == 2)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("PrefixShingles broadcast cache sweeps stopped-context entries on apply") {
    import graft.functions.expr.PrefixShingles
    val df = Seq(Seq("a b c", "b c d")).toDF("sh")
    // populate with two live entries (distinct df-heads → distinct keys)
    PrefixShingles($"sh", 0.8, Map("a b c" -> 7L))
    PrefixShingles($"sh", 0.8, Map("b c d" -> 9L))
    assert(PrefixShingles.cacheSize >= 2)
    val prevProbe = PrefixShingles.stoppedProbe
    try {
      // simulate the owning context stopping: every cached key now reads
      // as stopped — the next apply must sweep them all, not just the
      // eldest, then insert the fresh entry
      PrefixShingles.stoppedProbe = _ => true
      val swept = PrefixShingles.sweepStopped()
      assert(swept >= 2)
      assert(PrefixShingles.cacheSize == 0)
    } finally PrefixShingles.stoppedProbe = prevProbe
    // live context again: apply repopulates and reuses on equal df-head
    PrefixShingles($"sh", 0.8, Map("a b c" -> 7L))
    val afterFirst = PrefixShingles.cacheSize
    PrefixShingles($"sh", 0.8, Map("a b c" -> 7L))
    assert(PrefixShingles.cacheSize == afterFirst) // cache hit, no new entry
    // query still works end-to-end after a sweep
    val out = df.select(PrefixShingles($"sh", 0.8, Map("a b c" -> 7L)).as("p"))
      .as[Seq[String]].collect()
    assert(out(0).nonEmpty)
  }

  test("native expressions survive both codegen and interpreted paths") {
    val df = Seq(("hello world program", Array(1f, 2f))).toDF("t", "v")
    val q = df.select(
      WordShingles(TextFunctions.tokens($"t"), 2, distinct = true).as("sh"),
      FloatVecDot($"v", $"v").as("d"))
    val viaCodegen = q.collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(q.collect().toSeq == viaCodegen.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }
}
