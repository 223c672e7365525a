package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.infer.TypeInference
import graft.model.Identifiers

class InferenceSpec extends AnyFunSuite {

  test("reference lattice: digits → long, parseable → double, else string") {
    val s = TypeInference.referenceMode(
      Seq("id", "score", "name", "neg", "exp"),
      Seq("42", "3.14", "alice", "-7", "1e3"))
    assert(s("id").dataType == LongType)
    assert(s("score").dataType == DoubleType)
    assert(s("name").dataType == StringType)
    // reference quirk: isdigit-style test rejects the sign — falls to FLOAT
    assert(s("neg").dataType == DoubleType)
    assert(s("exp").dataType == DoubleType)
  }

  test("empty and whitespace values are strings") {
    val s = TypeInference.referenceMode(Seq("a", "b"), Seq("", " "))
    assert(s.fields.forall(_.dataType == StringType))
  }

  test("header shorter than row / row shorter than header") {
    assert(TypeInference.referenceMode(Seq("a", "b"), Seq("1")).fields.length == 2)
    assert(TypeInference.referenceMode(Seq("a"), Seq("1", "2")).fields.length == 2)
  }

  test("identifier sanitation strips BOM and bad chars (reference F7)") {
    assert(Identifiers.sanitize("﻿TeacherId") == "TeacherId")
    assert(Identifiers.sanitize("col\"quoted\"") == "col_quoted_")
    assert(Identifiers.sanitize("9lives") == "_9lives")
    assert(Identifiers.sanitize("") == "_")
  }

  test("spark inference reads csv with header") {
    val spark = GraftSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_infer").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "t.csv"),
      "id,score,name\n1,2.5,a\n2,3.5,b\n")
    val schema = TypeInference.spark(spark, s"$dir/t.csv")
    assert(schema("id").dataType == IntegerType)
    assert(schema("score").dataType == DoubleType)
    assert(schema("name").dataType == StringType)
  }
}
