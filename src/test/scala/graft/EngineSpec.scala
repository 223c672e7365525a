package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("facade: ensureTable / loadAll / table / sql end-to-end") {
    val root = Files.createTempDirectory("graft_eng").toString
    def put(rel: String, body: String): Unit = {
      val p = Paths.get(root, rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, body)
    }
    put("20250101_000001/emp.csv", "EmpId,Name,Salary\n1,Ann,100.5\n2,Bob,90.0\n")
    put("20250102_000001/emp.csv", "EmpId,Name,Salary\n2,Bob,95.0\n3,Cee,80.0\n")

    val engine = new Engine(spark,
      Files.createTempDirectory("graft_eng_wh").toString,
      Files.createTempDirectory("graft_eng_tr").toString + "/wm.tsv",
      _ => Seq("EmpId"))

    val schema = engine.ensureTable(s"$root/20250101_000001/emp.csv")
    assert(schema.fieldNames.toSeq == Seq("EmpId", "Name", "Salary"))

    val reports = engine.loadAll(root)
    assert(reports.count(_.processed) == 2)
    assert(engine.listTables() == Seq("emp"))
    assert(engine.watermarks() == Map("emp" -> 20250102000001L))

    val rows = engine.table("emp").orderBy("EmpId").collect()
      .map(r => (r.getAs[Any]("EmpId").toString, r.getAs[Double]("Salary")))
    assert(rows.toSeq == Seq(("1", 100.5), ("2", 95.0), ("3", 80.0)))

    val viaSql = engine.sql("SELECT count(*) AS n, sum(Salary) AS s FROM emp").collect()(0)
    assert(viaSql.getLong(0) == 3 && viaSql.getDouble(1) == 275.5)

    // replay is a no-op (gate)
    assert(engine.loadAll(root).forall(!_.processed))
  }

  test("queued intake (K6 analog): enqueue dedups, drain loads per-table serially") {
    val root = Files.createTempDirectory("graft_engq").toString
    def put(rel: String, body: String): Unit = {
      val p = Paths.get(root, rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, body)
    }
    put("20250101_000001/emp.csv", "EmpId,Name,Salary\n1,Ann,100.5\n2,Bob,90.0\n")
    put("20250102_000001/emp.csv", "EmpId,Name,Salary\n2,Bob,95.0\n3,Cee,80.0\n")
    put("20250101_000001/dept.csv", "DeptId,Name\n1,Eng\n")

    val engine = new Engine(spark,
      Files.createTempDirectory("graft_engq_wh").toString,
      Files.createTempDirectory("graft_engq_tr").toString + "/wm.tsv",
      _ => Seq("EmpId"))

    assert(engine.enqueue(s"$root/20250101_000001/emp.csv"))
    assert(!engine.enqueue(s"$root/20250101_000001/emp.csv")) // dup notification dropped
    assert(engine.enqueue(s"$root/20250102_000001/emp.csv"))
    assert(engine.enqueue(s"$root/20250101_000001/dept.csv"))

    val reports = engine.drainQueue()
    assert(reports.count(_.processed) == 3)
    // emp versions applied in order: v2's row for Bob won
    assert(engine.table("emp").filter("Name = 'Bob'").collect()(0)
      .getAs[Double]("Salary") == 95.0)
    assert(engine.listTables() == Seq("dept", "emp")) // _queue is not a table
    assert(engine.drainQueue().isEmpty)               // queue fully drained
  }

  test("scheme-qualified paths: the whole flow runs on file:// URIs (s3a-shaped)") {
    // Every control-plane path goes through the Hadoop FS layer, so a
    // scheme-qualified root (file://, and by the same code path s3a://,
    // hdfs://) must work end-to-end: listing, watermark store, curated
    // store pointers, reads.
    val rootDir = Files.createTempDirectory("graft_s3a").toString
    def put(rel: String, body: String): Unit = {
      val p = Paths.get(rootDir, rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, body)
    }
    put("20250101_000001/emp.csv", "EmpId,Name,Salary\n1,Ann,100.5\n2,Bob,90.0\n")
    put("20250102_000001/emp.csv", "EmpId,Name,Salary\n2,Bob,95.0\n3,Cee,80.0\n")

    val root = s"file://$rootDir"
    val wh = "file://" + Files.createTempDirectory("graft_s3a_wh").toString
    val tr = "file://" + Files.createTempDirectory("graft_s3a_tr").toString + "/wm.tsv"
    val engine = new Engine(spark, wh, tr, _ => Seq("EmpId"))

    val reports = engine.loadAll(root)
    assert(reports.count(_.processed) == 2)
    assert(engine.listTables() == Seq("emp"))
    assert(engine.watermarks() == Map("emp" -> 20250102000001L))
    assert(engine.table("emp").count() == 3)
    // single-file load via a scheme-qualified path hits the gate too
    assert(!engine.load(s"$root/20250102_000001/emp.csv").processed)
    // versioned store ops are scheme-aware as well
    assert(graft.sinks.ParquetMergeSink.versions(wh, "emp").size == 2)
    graft.sinks.ParquetMergeSink.vacuum(wh, "emp", keep = 1)
    assert(graft.sinks.ParquetMergeSink.versions(wh, "emp").size == 1)
  }
}
