package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Adversarial cases for the PII redaction chain — pins the rule ORDER
  * (email before IP before NUM) and the boundary semantics of each
  * pattern independently of the t66 oracle, which only sees synthetic
  * well-formed PII. */
class PiiSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def scrub(ss: String*): Seq[String] =
    ss.toDF("text").select(TextFunctions.redactPii(col("text")))
      .collect().map(_.getString(0)).toSeq

  test("email with a long digit run in the local part is ONE [EMAIL], not [NUM]") {
    // order matters: the NUM rule would eat '12345678' out of the local
    // part if it ran first, leaving a mangled non-email behind
    assert(scrub("mail 12345678@example.com end") === Seq("mail [EMAIL] end"))
  }

  test("ip at string edges (\\b against start/end anchors)") {
    assert(scrub("10.0.0.1") === Seq("[IP]"))
    assert(scrub("from 192.168.1.254") === Seq("from [IP]"))
    assert(scrub("10.0.0.1 leads") === Seq("[IP] leads"))
  }

  test("dotted runs with 4+ octets: \\b stops backtracking at 4") {
    // 5 octets: the first 4 match (leftmost), trailing '.5' survives —
    // identical leftmost-first semantics in Java regex and RE2
    assert(scrub("1.2.3.4.5") === Seq("[IP].5"))
  }

  test("version-ish three-part dotted numbers are NOT ips") {
    assert(scrub("v 1.2.3 ok") === Seq("v 1.2.3 ok"))
  }

  test("long digit runs redact; 6-digit runs survive") {
    assert(scrub("id 1234567 and 123456") === Seq("id [NUM] and 123456"))
    // embedded in a word: \d{7,} has no boundary requirement
    assert(scrub("x12345678y") === Seq("x[NUM]y"))
  }

  test("email host backtracks to the last dot-before-letters; dotted digits fall to the IP rule") {
    // 'a@b.co1.2.3.4' — the host class is greedy but the TLD tail needs
    // \.[a-zA-Z]{2,}, so the match is 'a@b.co'; the residual '1.2.3.4'
    // then redacts as an IP in the SECOND pass (order again observable)
    assert(scrub("a@b.co1.2.3.4") === Seq("[EMAIL][IP]"))
  }

  test("multiple occurrences all redact (global replace)") {
    assert(scrub("a@x.com b@y.org 1.2.3.4 5.6.7.8 99999999 88888888") ===
      Seq("[EMAIL] [EMAIL] [IP] [IP] [NUM] [NUM]"))
  }

  test("clean text passes through untouched") {
    val txt = "no pii here, just words and 123 small numbers 1.2"
    assert(scrub(txt) === Seq(txt))
  }
}
