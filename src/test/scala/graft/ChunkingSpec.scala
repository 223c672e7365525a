package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Chunking

class ChunkingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")

  private def chunks(text: String, c: Int, s: Int): Seq[(Long, Long, String)] =
    Chunking.chunkWindows(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", c, s)
      .select(col("chunk_id"), col("n_chunk_tokens"), col("chunk_text"))
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq

  test("short doc yields one chunk equal to the normalized text") {
    assert(chunks("Alpha  Beta\tGamma", 32, 24) ==
      Seq((0L, 3L, "alpha beta gamma")))
  }

  test("chunk boundaries, overlap, and short tail") {
    // 10 tokens, C=4, S=3: starts 0,3,6 cover [0,4) [3,7) [6,10) — and
    // ceil((10-4)/3)+1 = 3 chunks, last exactly reaching the end
    val out = chunks(doc(10), 4, 3)
    assert(out == Seq(
      (0L, 4L, "w1 w2 w3 w4"),
      (1L, 4L, "w4 w5 w6 w7"),
      (2L, 4L, "w7 w8 w9 w10")))
    // 11 tokens: one more start at 9, a 2-token tail
    val out2 = chunks(doc(11), 4, 3)
    assert(out2.last == (3L, 2L, "w10 w11"))
  }

  test("dropping the overlap prefix of each later chunk reconstructs the token stream") {
    for ((c, s, n) <- Seq((4, 3, 10), (4, 3, 11), (5, 2, 13), (7, 7, 20), (32, 24, 100))) {
      val out = chunks(doc(n), c, s)
      val rebuilt = out.head._3.split(" ").toSeq ++
        out.tail.flatMap(_._3.split(" ").drop(c - s))
      assert(rebuilt == (1 to n).map(i => s"w$i"),
        s"C=$c S=$s n=$n: $rebuilt")
      // every chunk but the last is full-size; ids are dense from 0
      assert(out.dropRight(1).forall(_._2 == c))
      assert(out.map(_._1) == out.indices.map(_.toLong))
    }
  }

  test("stride == chunkSize partitions exactly with no overlap") {
    val out = chunks(doc(12), 4, 4)
    assert(out.map(_._3).mkString(" ") == doc(12))
    assert(out.map(_._2) == Seq(4L, 4L, 4L))
  }

  test("empty and whitespace-only docs produce zero chunks") {
    val df = Seq((1L, ""), (2L, "   \t "), (3L, "one real doc"))
      .toDF("doc_id", "text")
    val out = Chunking.chunkWindows(df, "doc_id", "text", 8, 6)
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(out == Seq(3L))
  }

  test("streaming chunking equals the batch transform across micro-batches") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_cstream").toString
    val docs = Seq((1L, doc(10)), (2L, doc(3)), (3L, doc(25)), (4L, doc(7)))
      .toDF("doc_id", "text")
    docs.filter(col("doc_id") <= 2).write.parquet(s"$dir/in1")
    docs.filter(col("doc_id") > 2).write.parquet(s"$dir/in2")
    val schema = spark.read.parquet(s"$dir/in1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in*")
    val q = graft.streaming.ChunkStream.start(stream, "doc_id", "text",
      chunkSize = 8, stride = 6, outPath = s"$dir/out", checkpoint = s"$dir/ckpt")
    q.awaitTermination(60000)
    val streamed = spark.read.parquet(s"$dir/out")
      .as[(Long, Long, Long, String)].collect().toSet
    val batch = Chunking.chunkWindows(docs, "doc_id", "text", 8, 6)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }
}
