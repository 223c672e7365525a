package graft.pipeline

import graft.fs.Fs
import graft.model.{IngestEvent, TableVersion}
import graft.sources.FifoQueue

/** One orchestrated run of the load pipeline — the engine's analog of a
  * Step Functions execution (reference K7: UUID-named executions started
  * per file, /root/reference/second_lambda_function.py:135-150; the
  * console history shows per-execution status + duration and redriven
  * failures, screenshot 1737920487571.jpeg). */
final case class ExecutionRecord(
    name: String,          // UUID execution name (reference F9)
    input: String,         // the {"filePath"} input
    status: String,        // SUCCEEDED | FAILED
    attempts: Int,         // deliveries consumed (1 = first try worked)
    startedMs: Long,
    durationMs: Long,
    error: Option[String])

/** Step-Functions/Glue-trigger analog (SURVEY.md §2.8 K7): the control
  * loop between "file event queued" and "load committed".
  *
  *   submit(path)  — start an execution for a snapshot file: enqueue on
  *                   the intake FIFO (group = table ⇒ per-table
  *                   serialization, dedup id = table@version ⇒ duplicate
  *                   events dropped), mirroring the reference Lambda's
  *                   fan-out (second_lambda_function.py:104-124, 135-150).
  *   drain()       — run every queued input through the load pipeline
  *                   with a bounded retry policy. Each input becomes a
  *                   UUID-named [[ExecutionRecord]] persisted to the
  *                   history dir (atomic one-file-per-execution). A load
  *                   that still throws after `maxAttempts` is recorded
  *                   FAILED and its input moved to the dead-letter queue
  *                   — the group UNBLOCKS, later versions keep loading
  *                   (the reference's failed executions sit in history
  *                   while the pipeline continues).
  *   redrive()     — re-enqueue every dead-lettered input (the console
  *                   "redrive" on failed executions); the retried run
  *                   appears as a NEW execution, the FAILED record stays
  *                   (history is immutable, like the reference console).
  *
  * Crash safety is layered on the queue's at-least-once delivery: a
  * message is acked only after its terminal record is durably written,
  * so a crash anywhere mid-execution redelivers after the visibility
  * timeout and the version gate makes replays of committed loads no-ops
  * (at-least-once intake, exactly-once effect). A crash between the
  * FAILED record and the ack can duplicate the DLQ entry (the dedup id
  * is per-execution, so the redelivered execution dead-letters again);
  * the duplicate is tolerated as at-least-once — the extra redrive is a
  * no-op under the version gate.
  *
  * Scale posture: pure control plane — state is one tiny file per
  * execution/message, never data rows; each drained message runs one
  * Spark load job, so a cluster deployment runs one Orchestrator per
  * driver and fans loads across tables exactly as the reference fans
  * Glue runs.
  */
final class Orchestrator(
    root: String,
    load: String => LoadReport,
    maxAttempts: Int = 3,
    visibilityTimeoutMs: Long = 15 * 60 * 1000L,
    clock: () => Long = () => System.currentTimeMillis(),
    // retry spacing (attempt → ms); default immediate, cluster configs
    // plug exponential backoff here (Step Functions IntervalSeconds/
    // BackoffRate analog)
    retryDelayMs: Int => Long = _ => 0L,
    sleep: Long => Unit = ms => if (ms > 0) Thread.sleep(ms),
    // fault-injection point for the documented at-least-once window:
    // invoked AFTER the terminal record (and any DLQ send) is durable,
    // BEFORE the intake ack. A test that throws here models a crash in
    // that window (record + DLQ entry persisted, message redelivered
    // after the visibility timeout → duplicate history/DLQ rows, whose
    // replays the version gate must absorb).
    onRecordPersisted: ExecutionRecord => Unit = _ => ()) {

  private val intake = new FifoQueue(Fs.child(root, "queue"),
    visibilityTimeoutMs = visibilityTimeoutMs, clock = clock)
  private val deadLetters = new FifoQueue(Fs.child(root, "dlq"),
    visibilityTimeoutMs = visibilityTimeoutMs, clock = clock)
  private val historyDir = Fs.child(root, "executions")

  private def tvOf(csvPath: String): TableVersion = {
    val p = new org.apache.hadoop.fs.Path(csvPath)
    TableVersion(IngestEvent.tableOf(p.getName), IngestEvent.versionOf(p.getParent.getName))
  }

  /** Start an execution for one snapshot file. False = duplicate event
    * within the dedup window, dropped (reference D3 semantics). */
  def submit(csvPath: String): Boolean = {
    val tv = tvOf(csvPath)
    intake.send(tv.table, s"${tv.table}@${tv.version}", csvPath)
  }

  /** Drain the intake queue; returns the records of the executions this
    * call ran, in completion order. */
  def drain(): Seq[ExecutionRecord] = {
    val out = Seq.newBuilder[ExecutionRecord]
    var msg = intake.receiveAny()
    while (msg.isDefined) {
      out += execute(msg.get)
      msg = intake.receiveAny()
    }
    // opportunistic hygiene: expired dedup markers accumulate one tiny
    // file per distinct dedup id (intake) / per FAILED execution (dlq);
    // under repeated failures the dlq marker dir otherwise grows
    // without bound. Safe mid-flight: prune only drops markers older
    // than the window, which by definition no longer suppress sends.
    intake.pruneDedup()
    deadLetters.pruneDedup()
    out.result()
  }

  private def execute(msg: intake.Msg): ExecutionRecord = {
    val name = java.util.UUID.randomUUID().toString
    val started = clock()
    var attempt = 0
    var result: Either[Throwable, LoadReport] = null
    var done = false
    while (!done) {
      attempt += 1
      result =
        try Right(load(msg.body))
        catch { case scala.util.control.NonFatal(e) => Left(e) }
      result match {
        case Right(_) => done = true
        case Left(_) if attempt < maxAttempts => sleep(retryDelayMs(attempt))
        case Left(_) => done = true
      }
    }
    val rec = result match {
      case Right(_) =>
        ExecutionRecord(name, msg.body, "SUCCEEDED", attempt, started, clock() - started, None)
      case Left(e) =>
        ExecutionRecord(name, msg.body, "FAILED", attempt, started, clock() - started,
          Some(s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}"))
    }
    // terminal record durable BEFORE the ack: a crash in between only
    // redelivers (extra execution), never loses history or the message
    writeRecord(rec)
    // dedup id is per-EXECUTION (not per-input): a content-keyed id would
    // silently swallow the DLQ send when the same input fails again within
    // the dedup window (e.g. a fast redrive), leaving the message in
    // neither queue — breaking the redrive recovery path
    if (rec.status == "FAILED") deadLetters.send(msg.group, s"dlq:$name", msg.body)
    onRecordPersisted(rec)
    intake.ack(msg)
    rec
  }

  /** Re-enqueue every dead-lettered input as a fresh execution attempt.
    * Returns the inputs redriven. Dedup is bypassed deliberately — a
    * redrive is an explicit operator action, not a duplicate event. */
  def redrive(): Seq[String] = {
    val out = Seq.newBuilder[String]
    var msg = deadLetters.receiveAny()
    while (msg.isDefined) {
      val m = msg.get
      val tv = tvOf(m.body)
      intake.send(tv.table, s"redrive:${java.util.UUID.randomUUID()}", m.body)
      deadLetters.ack(m)
      out += m.body
      msg = deadLetters.receiveAny()
    }
    out.result()
  }

  /** All executions ever run, oldest first (the console history list). */
  def executions(): Seq[ExecutionRecord] =
    Fs.list(historyDir).map(st => readRecord(st.getPath.toString))
      .sortBy(r => (r.startedMs, r.name))

  /** Inputs currently dead-lettered (awaiting redrive), across groups. */
  def deadLetterCount(): Int =
    Fs.list(Fs.child(Fs.child(root, "dlq"), "groups"))
      .map(st => deadLetters.depth(st.getPath.getName)).sum

  // one file per execution; line layout (error free-form on lines 7+):
  // name / status / attempts / startedMs / durationMs / input / error…
  private def writeRecord(r: ExecutionRecord): Unit =
    Fs.writeStringAtomic(Fs.child(historyDir, f"${r.startedMs}%020d-${r.name}.rec"),
      Seq(r.name, r.status, r.attempts.toString, r.startedMs.toString,
        r.durationMs.toString, r.input, r.error.getOrElse("")).mkString("\n"))

  private def readRecord(path: String): ExecutionRecord = {
    val lines = Fs.readString(path).split("\r?\n", 7)
    ExecutionRecord(
      name = lines(0),
      input = lines(5),
      status = lines(1),
      attempts = lines(2).toInt,
      startedMs = lines(3).toLong,
      durationMs = lines(4).toLong,
      error = lines.lift(6).map(_.trim).filter(_.nonEmpty))
  }
}
