package graft.sinks

import java.util.concurrent.ConcurrentLinkedQueue

/** Out-of-band notification channel — the pluggable seam where the
  * reference publishes to SNS (K4/K5,
  * /root/reference/delta_load.py:267-286: success summary + per-issue
  * alerts to an SNS topic). The engine keeps the *semantics* (structured
  * success/alert events per load) and leaves the transport to the host:
  * implement [[AlertChannel.send]] with whatever the deployment uses
  * (webhook, queue, log shipper).
  *
  * Control-plane only: one event per load plus a bounded alert sample —
  * never a per-row channel (the reference's per-row publish is the
  * pattern this replaces). */
trait AlertChannel extends Serializable {
  def send(event: AlertChannel.Event): Unit
}

object AlertChannel {

  /** One structured notification. `kind` is `"success"` or `"alert"` —
    * mirroring the reference's two SNS subjects. */
  final case class Event(
      kind: String,
      table: String,
      version: Long,
      message: String)

  /** Default: drop events (the LoadReport already carries them). */
  object Noop extends AlertChannel {
    override def send(event: Event): Unit = ()
  }

  /** Driver-side log channel. */
  object Logging extends AlertChannel {
    @transient private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.alerts")
    override def send(event: Event): Unit =
      log.info(s"[${event.kind}] ${event.table} v${event.version}: ${event.message}")
  }

  /** In-memory channel for tests / embedded hosts: drainable queue. */
  final class Recording extends AlertChannel {
    private val queue = new ConcurrentLinkedQueue[Event]()
    override def send(event: Event): Unit = queue.add(event)
    def drain(): Seq[Event] = {
      val out = Seq.newBuilder[Event]
      var e = queue.poll()
      while (e != null) { out += e; e = queue.poll() }
      out.result()
    }
  }
}
