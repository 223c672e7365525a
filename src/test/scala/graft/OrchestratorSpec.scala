package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{LoadReport, Orchestrator}

class OrchestratorSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def ok(path: String) = LoadReport("t", 1L, processed = true)

  test("submit dedups duplicate events; drain records SUCCEEDED executions in order") {
    val loaded = collection.mutable.ArrayBuffer.empty[String]
    val orch = new Orchestrator(tmp("graft_orc"), p => { loaded += p; ok(p) })

    assert(orch.submit("/in/20250101_000001/emp.csv"))
    assert(!orch.submit("/in/20250101_000001/emp.csv")) // duplicate event dropped
    assert(orch.submit("/in/20250102_000001/emp.csv"))
    assert(orch.submit("/in/20250101_000001/dept.csv"))

    val recs = orch.drain()
    assert(recs.size == 3 && recs.forall(_.status == "SUCCEEDED"))
    assert(recs.forall(_.attempts == 1))
    // per-table FIFO: emp versions load oldest-first
    assert(loaded.filter(_.contains("emp")) ==
      Seq("/in/20250101_000001/emp.csv", "/in/20250102_000001/emp.csv"))
    assert(orch.executions().map(_.status) == Seq("SUCCEEDED", "SUCCEEDED", "SUCCEEDED"))
    assert(orch.deadLetterCount() == 0)
  }

  test("transient failure retries within one execution up to maxAttempts") {
    val tries = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val orch = new Orchestrator(tmp("graft_orc_rt"), p => {
      tries(p) += 1
      if (tries(p) < 3) sys.error(s"transient ${tries(p)}")
      ok(p)
    }, maxAttempts = 3)

    assert(orch.submit("/in/20250101_000001/emp.csv"))
    val recs = orch.drain()
    assert(recs.map(r => (r.status, r.attempts)) == Seq(("SUCCEEDED", 3)))
    assert(recs.head.error.isEmpty)
  }

  test("exhausted retries dead-letter the input WITHOUT blocking the group; redrive reruns it") {
    var broken = true
    val loaded = collection.mutable.ArrayBuffer.empty[String]
    val orch = new Orchestrator(tmp("graft_orc_dlq"), p => {
      if (broken && p.contains("20250101_000001/emp")) sys.error("schema mismatch")
      loaded += p; ok(p)
    }, maxAttempts = 2)

    assert(orch.submit("/in/20250101_000001/emp.csv")) // will fail
    assert(orch.submit("/in/20250102_000001/emp.csv")) // same group, behind the failure
    val recs = orch.drain()

    // the failed execution is recorded, the LATER version still loaded
    assert(recs.map(_.status) == Seq("FAILED", "SUCCEEDED"))
    assert(recs.head.attempts == 2 && recs.head.error.exists(_.contains("schema mismatch")))
    assert(loaded == Seq("/in/20250102_000001/emp.csv"))
    assert(orch.deadLetterCount() == 1)

    // operator fixes the cause and redrives: new execution, old record kept
    broken = false
    assert(orch.redrive() == Seq("/in/20250101_000001/emp.csv"))
    assert(orch.deadLetterCount() == 0)
    val redriven = orch.drain()
    assert(redriven.map(_.status) == Seq("SUCCEEDED"))
    assert(orch.executions().map(_.status).sorted == Seq("FAILED", "SUCCEEDED", "SUCCEEDED"))
  }

  test("input that fails again after redrive dead-letters again (no silent loss)") {
    // regression: a content-keyed DLQ dedup id dropped the second
    // dead-letter send inside the dedup window, acking the message into
    // oblivion — neither queue held it and redrive() returned nothing
    val orch = new Orchestrator(tmp("graft_orc_dlq2"),
      _ => sys.error("still broken"), maxAttempts = 1)

    assert(orch.submit("/in/20250101_000001/emp.csv"))
    assert(orch.drain().map(_.status) == Seq("FAILED"))
    assert(orch.deadLetterCount() == 1)

    assert(orch.redrive() == Seq("/in/20250101_000001/emp.csv"))
    assert(orch.drain().map(_.status) == Seq("FAILED"))
    // second failure must land back in the DLQ, immediately redrivable
    assert(orch.deadLetterCount() == 1)
    assert(orch.redrive() == Seq("/in/20250101_000001/emp.csv"))
  }

  test("crash between FAILED record/DLQ send and ack: redelivery duplicates, version gate absorbs") {
    // The documented at-least-once window (Orchestrator scaladoc): the
    // terminal record and DLQ entry are durable but the intake ack never
    // happens. The message MUST redeliver after the visibility timeout,
    // the DLQ MAY hold duplicates, and the duplicate redrive MUST be a
    // no-op under the version gate (exactly-once effect).
    var now = 0L
    var crash = true
    var broken = true
    val applied = collection.mutable.ArrayBuffer.empty[String]
    var committedVersion = 0L
    val input = "/in/20250101_000001/emp.csv"
    val orch = new Orchestrator(tmp("graft_orc_crash"),
      load = p => {
        if (broken) sys.error("schema mismatch")
        val v = 20250101000001L // version gate: strictly-greater commits
        if (v <= committedVersion) LoadReport("emp", v, processed = false)
        else { committedVersion = v; applied += p; LoadReport("emp", v, processed = true) }
      },
      maxAttempts = 1,
      visibilityTimeoutMs = 60000L,
      clock = () => now,
      onRecordPersisted = _ => if (crash) sys.error("crash before ack"))

    assert(orch.submit(input))
    intercept[RuntimeException](orch.drain()) // the crash

    // record + DLQ entry survived the crash; the message was never acked
    assert(orch.executions().map(_.status) == Seq("FAILED"))
    assert(orch.deadLetterCount() == 1)
    crash = false
    // before the visibility timeout the in-flight message is invisible
    assert(orch.drain().isEmpty)

    // past the timeout it redelivers: a SECOND FAILED execution and a
    // DUPLICATE DLQ entry (dedup id is per-execution) — at-least-once
    now += 60001L
    assert(orch.drain().map(_.status) == Seq("FAILED"))
    assert(orch.executions().map(_.status) == Seq("FAILED", "FAILED"))
    assert(orch.deadLetterCount() == 2)

    // operator fixes the cause; BOTH dlq copies redrive, the duplicate
    // run is a version-gate no-op: the load effect applies exactly once
    broken = false
    assert(orch.redrive() == Seq(input, input))
    val recs = orch.drain()
    assert(recs.map(_.status) == Seq("SUCCEEDED", "SUCCEEDED"))
    assert(applied == Seq(input)) // exactly-once effect
  }

  test("drain prunes expired dedup markers on intake and dlq (no unbounded growth)") {
    var now = 0L
    val root = tmp("graft_orc_prune")
    val orch = new Orchestrator(root, _ => sys.error("always fails"),
      maxAttempts = 1, clock = () => now)
    def markers(q: String): Long = {
      val d = Paths.get(root, q, "dedup")
      if (!Files.isDirectory(d)) 0L
      else Files.list(d) // exclude Hadoop .crc sidecars
        .filter(p => !p.getFileName.toString.startsWith(".")).count()
    }

    assert(orch.submit("/in/20250101_000001/emp.csv"))
    assert(orch.drain().map(_.status) == Seq("FAILED"))
    assert(markers("queue") == 1 && markers("dlq") == 1)

    // past the dedup window (default 5 min), the next drain sweeps both
    now += 5 * 60 * 1000L + 1
    assert(orch.submit("/in/20250102_000001/emp.csv"))
    orch.drain()
    // the old markers are gone; only the fresh ones (this submit/fail) remain
    assert(markers("queue") == 1 && markers("dlq") == 1)
  }

  test("engine integration: orchestrated load lands in the curated store with history") {
    val root = tmp("graft_orc_in")
    val p = Paths.get(root, "20250101_000001/emp.csv")
    Files.createDirectories(p.getParent)
    Files.writeString(p, "EmpId,Name,Salary\n1,Ann,100.5\n2,Bob,90.0\n")

    val engine = new Engine(spark, tmp("graft_orc_wh"),
      tmp("graft_orc_tr") + "/wm.tsv", _ => Seq("EmpId"))
    val orch = engine.orchestrator()
    assert(orch.submit(p.toString))
    val recs = orch.drain()
    assert(recs.map(_.status) == Seq("SUCCEEDED"))
    assert(engine.table("emp").count() == 2)
    // replayed submit is a fresh event (dedup window passed? no — same id):
    // dropped at the queue, so no second execution
    assert(!orch.submit(p.toString))
  }
}
