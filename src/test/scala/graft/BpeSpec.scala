package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, "low low low low low lower lower newest newest newest"),
    (1L, "newest newest newest widest widest wide wide")
  ).toDF("doc_id", "text")

  test("training learns frequent pairs first, deterministically") {
    val m1 = Bpe.train(corpus, "text", 10)
    val m2 = Bpe.train(corpus, "text", 10)
    assert(m1 == m2)
    assert(m1.size == 10)
    // the classic BPE example: frequent subwords coalesce early
    val joined = m1.map { case (a, b) => a + b }
    assert(joined.exists(s => "newest".startsWith(s) || "newest".endsWith(s) || s == "es" || s == "est"),
      joined.toString)
  }

  test("more merges => fewer tokens; enough merges collapse frequent words to one") {
    val few = Bpe.tokenCounts(corpus, "doc_id", "text", Bpe.train(corpus, "text", 2))
      .as[(Long, Long)].collect().toMap
    val many = Bpe.tokenCounts(corpus, "doc_id", "text", Bpe.train(corpus, "text", 30))
      .as[(Long, Long)].collect().toMap
    assert(many(0L) <= few(0L) && many(1L) <= few(1L))
    // with 30 merges this tiny vocab fully merges: token count = word count
    assert(many(0L) == 10L)
    assert(many(1L) == 7L)
  }

  test("distributed token count equals driver-side encoder") {
    val merges = Bpe.train(corpus, "text", 12)
    val rank = merges.zipWithIndex.toMap
    val expected = corpus.as[(Long, String)].collect().map { case (id, text) =>
      id -> text.toLowerCase.trim.split("\\s+").map(w => Bpe.encodeWord(w, rank).size).sum.toLong
    }.toMap
    val got = Bpe.tokenCounts(corpus, "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }
}
