package graft.sinks

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Observability hook — the engine's analog of the reference's SNS
  * success/failure notifications (K4, /root/reference/delta_load.py:267-286),
  * reframed as a `QueryExecutionListener`: every completed action emits
  * a (name, rows-ish metrics, duration, outcome) record the host app
  * can drain and ship to any alerting channel. */
final class MetricsListener extends QueryExecutionListener {

  final case class QueryMetric(
      funcName: String,
      durationNs: Long,
      success: Boolean,
      errorMessage: Option[String],
      outputRows: Option[Long])

  private val queue = new ConcurrentLinkedQueue[QueryMetric]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
    queue.add(QueryMetric(funcName, durationNs, success = true, None, rows))
  }

  override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit =
    queue.add(QueryMetric(funcName, 0L, success = false, Option(error.getMessage), None))

  /** Drain collected metrics (oldest first). */
  def drain(): Seq[QueryMetric] = {
    val out = Seq.newBuilder[QueryMetric]
    var m = queue.poll()
    while (m != null) { out += m; m = queue.poll() }
    out.result()
  }
}

object MetricsListener {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    l
  }
}
