package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.model.TableVersion
import graft.pipeline.DeltaLoadPipeline
import graft.sinks.ParquetMergeSink
import graft.tracker.Watermarks

/** End-to-end replay of the reference's E1/E3 flow over the FIXTURES.md
  * §A.1 layout: first load, newer version wins, equal/older skipped,
  * null rows alerted+dropped, exact dups removed, replay idempotent. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def writeFixture(root: String): Unit = {
    def put(rel: String, body: String): Unit = {
      val p = Paths.get(root, rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, body)
    }
    // v1: one null row (index 1), one duplicated row
    put("20250108_074313/student.csv",
      """StudentId,StudentName,Class,Section,GPA
        |1,Asha,10,A,3.9
        |2,,10,B,3.1
        |3,Chen,9,A,3.5
        |3,Chen,9,A,3.5
        |""".stripMargin)
    // v2: updates id 1, adds id 4
    put("20250108_075503/student.csv",
      """StudentId,StudentName,Class,Section,GPA
        |1,Asha2,10,A,4.0
        |4,Dee,9,B,3.2
        |""".stripMargin)
  }

  test("E1/E3: versioned load with gate, clean, merge, watermark") {
    val root = Files.createTempDirectory("graft_ingest").toString
    val wh = Files.createTempDirectory("graft_wh").toString
    val tr = Files.createTempDirectory("graft_tr").toString + "/wm.tsv"
    writeFixture(root)

    val channel = new graft.sinks.AlertChannel.Recording
    val pipe = new DeltaLoadPipeline(spark, wh, tr, _ => Seq("StudentId"), channel)
    val reports = pipe.runAll(root)
    assert(reports.map(_.processed) == Seq(true, true))
    val first = reports.head
    assert(first.inputRows == 4)
    assert(first.nullRows == 1)      // alert side-output fired
    assert(first.dupRows == 1)       // the duplicated id-3 row, exactly
    assert(first.alerts.nonEmpty)
    val second = reports(1)
    assert(second.nullRows == 0 && second.dupRows == 0)

    // K4/K5: the pluggable channel saw one alert (v1's null row) and one
    // success event per processed load
    val events = channel.drain()
    assert(events.count(_.kind == "success") == 2)
    assert(events.count(_.kind == "alert") == 1)
    assert(events.filter(_.kind == "alert").forall(_.version == 20250108074313L))

    val cur = ParquetMergeSink.readCurrent(spark, wh, "student").get
    val rows = cur.orderBy("StudentId").collect().map(r =>
      (r.getAs[Any]("StudentId").toString, r.getAs[String]("StudentName")))
    // null row (2) dropped, dup (3) collapsed, v2 won for id 1, id 4 added
    assert(rows.toSeq == Seq(("1", "Asha2"), ("3", "Chen"), ("4", "Dee")))

    // replay: same versions are skipped entirely (strict > gate)
    val replay = pipe.runAll(root)
    assert(replay.forall(!_.processed))

    // older version arriving late is also skipped
    val wm = new Watermarks(tr)
    assert(!wm.shouldProcess(TableVersion("student", 20250108074313L)))
    assert(wm.shouldProcess(TableVersion("student", 20250108075504L)))
  }
}
