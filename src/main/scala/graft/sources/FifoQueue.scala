package graft.sources

import graft.fs.Fs

/** Durable file-backed FIFO queue with message groups and content
  * deduplication — the engine-side analog of the reference's SQS FIFO
  * queue (K6: message shape, dedup id and group id at
  * /root/reference/second_lambda_function.py:104-124). Semantics match
  * SQS FIFO:
  *
  *   - '''Per-group ordering + serialization.''' Messages in one group
  *     deliver in send order, and the next message is invisible until
  *     the current one is acked (or its visibility timeout lapses) —
  *     exactly the one-writer-per-table discipline the reference gets
  *     from `MessageGroupId=<table>`.
  *   - '''Content dedup.''' A `dedupId` seen within `dedupWindowMs` is
  *     dropped at send (returns false), matching
  *     `MessageDeduplicationId = base_name + timestamp`.
  *   - '''At-least-once.''' A received-but-unacked message reappears
  *     after `visibilityTimeoutMs` — crashed consumers lose nothing.
  *
  * Storage is one file per message under a scheme-aware [[Fs]] path, so
  * the queue lives wherever the warehouse lives (`file://`, `hdfs://`;
  * on object stores the create-exclusive seq allocation degrades to
  * last-writer-wins and a real queue service should back this API).
  * All state is tiny control-plane metadata — bodies are event JSON,
  * never data rows — so listing a group's directory stays cheap at any
  * corpus scale: queue depth tracks in-flight ''files'', not bytes.
  *
  * Concurrency follows the curated store's layered discipline
  * (Sinks.withTableLock): a JVM monitor serializes threads of one
  * process, an OS file lock (local FS only) serializes processes.
  */
final class FifoQueue(root: String,
                      dedupWindowMs: Long = 5 * 60 * 1000L,
                      visibilityTimeoutMs: Long = 30 * 1000L,
                      clock: () => Long = () => System.currentTimeMillis()) {

  import FifoQueue._

  /** A received message; `receipt` identifies this DELIVERY (the SQS
    * receipt-handle role): after a visibility-timeout redelivery, only
    * the newest delivery's ack is accepted — a crashed-and-recovered
    * consumer can't ack away a message another consumer now holds. */
  final case class Msg(group: String, seq: Long, body: String, receipt: String)

  private def groupDir(group: String) = Fs.child(Fs.child(root, "groups"), group)
  private def msgsDir(group: String) = Fs.child(groupDir(group), "msgs")
  private def leaseFile(group: String) = Fs.child(groupDir(group), "_INFLIGHT")
  private def dedupDir = Fs.child(root, "dedup")

  private def dedupMarker(dedupId: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(dedupId.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Fs.child(dedupDir, hex)
  }

  /** Enqueue `body` on `group`; false (dropped) when `dedupId` was sent
    * within the dedup window. */
  def send(group: String, dedupId: String, body: String): Boolean =
    withQueueLock(root, group) {
      val now = clock()
      val marker = dedupMarker(dedupId)
      val duplicate = Fs.exists(marker) &&
        (now - Fs.readString(marker).trim.toLong) < dedupWindowMs
      if (duplicate) false
      else {
        val dir = msgsDir(group)
        Fs.mkdirs(dir)
        val next = listSeqs(dir).lastOption.map(_ + 1).getOrElse(0L)
        // create-exclusive: a concurrent process that raced to the same
        // seq throws here and retries one higher (local/HDFS atomic).
        // Only an already-exists failure retries — any other IO error
        // (disk full, permissions) must propagate, not busy-loop
        var seq = next
        var done = false
        while (!done) {
          val p = new org.apache.hadoop.fs.Path(msgFile(group, seq))
          try {
            val out = Fs.fs(dir).create(p, false)
            try out.write(body.getBytes("UTF-8")) finally out.close()
            done = true
          } catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => seq += 1
            case e: java.io.IOException if Fs.fs(dir).exists(p) => seq += 1
          }
        }
        // marker AFTER the message lands: a crash between the two turns
        // a resend into a duplicate message (at-least-once — the version
        // gate downstream absorbs it); marker-first would LOSE the event
        // and then suppress its resends for the whole dedup window
        Fs.writeStringAtomic(marker, now.toString)
        true
      }
    }

  private def msgFile(group: String, seq: Long): String =
    Fs.child(msgsDir(group), f"$seq%012d.json")

  private def listSeqs(dir: String): Seq[Long] =
    Fs.list(dir).map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).sorted

  /** Oldest message of `group`, or None when the group is empty or
    * blocked by an unacked in-flight message (FIFO-group serialization).
    * Receiving starts the visibility timeout; an unacked message is
    * re-delivered after it lapses. */
  def receive(group: String): Option[Msg] = withQueueLock(root, group) {
    val now = clock()
    val lease = leaseFile(group)
    val blocked = Fs.exists(lease) && Fs.readString(lease).trim.split(" ")(1).toLong > now
    if (blocked) None
    else listSeqs(msgsDir(group)).headOption.map { seq =>
      val receipt = java.util.UUID.randomUUID().toString
      Fs.writeStringAtomic(lease, s"$seq ${now + visibilityTimeoutMs} $receipt")
      Msg(group, seq, Fs.readString(msgFile(group, seq)), receipt)
    }
  }

  /** Delete `msg` and unblock its group. False when the message's lease
    * was already lost to the visibility timeout (another delivery may
    * exist now — the at-least-once duplicate case; only the receipt of
    * the newest delivery can ack). */
  def ack(msg: Msg): Boolean = withQueueLock(root, msg.group) {
    val lease = leaseFile(msg.group)
    val owned = Fs.exists(lease) && {
      val Array(seq, expiry, receipt) = Fs.readString(lease).trim.split(" ")
      seq.toLong == msg.seq && expiry.toLong > clock() && receipt == msg.receipt
    }
    if (owned) {
      Fs.deleteRecursive(msgFile(msg.group, msg.seq))
      Fs.deleteRecursive(lease)
      true
    } else false
  }

  /** First available message across all groups (scan order; each group
    * still serialized). */
  def receiveAny(): Option[Msg] =
    Fs.list(Fs.child(root, "groups")).map(_.getPath.getName).sorted.iterator
      .flatMap(g => receive(g)).take(1).toList.headOption

  /** Messages waiting in `group` (in-flight included). */
  def depth(group: String): Int = listSeqs(msgsDir(group)).size

  /** Drop dedup markers older than the window (call opportunistically —
    * markers are tiny, this only bounds the directory listing). */
  def pruneDedup(): Unit = {
    val cutoff = clock() - dedupWindowMs
    Fs.list(dedupDir).foreach { st =>
      val p = st.getPath.toString
      if (Fs.readString(p).trim.toLong < cutoff) Fs.deleteRecursive(p)
    }
  }
}

object FifoQueue {
  // (root, group) monitors: JVM-thread serialization layer; the file
  // lock below only serializes across processes
  private val monitors = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def withQueueLock[T](root: String, group: String)(body: => T): T = {
    val key = s"$root#$group"
    val mon = monitors.computeIfAbsent(key, _ => new Object)
    mon.synchronized {
      val gdir = Fs.child(Fs.child(root, "groups"), group)
      Fs.mkdirs(gdir)
      Fs.localPath(Fs.child(gdir, "_LOCK")) match {
        case Some(lockFile) =>
          val ch = java.nio.channels.FileChannel.open(lockFile,
            java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
          try {
            val fl = ch.lock()
            try body finally fl.release()
          } finally ch.close()
        case None => body
      }
    }
  }
}
