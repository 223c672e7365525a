package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (score, id) pairs in a
  * bounded min-heap per group — the scalable replacement for
  * sort+limit-per-group when groups are huge (O(n log k) per partition,
  * merge is heap-union; a window row_number sorts every group fully).
  *
  * Returns ids ordered by (score desc, id asc). */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), mutable.PriorityQueue[(Double, Long)], Seq[Long]] {

  // min-heap: lowest (score, -id) on top so it evicts first
  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](ord)

  override def reduce(buf: mutable.PriorityQueue[(Double, Long)],
                      x: (Double, Long)): mutable.PriorityQueue[(Double, Long)] = {
    buf.enqueue(x)
    while (buf.size > k) buf.dequeue() // evict current worst
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(a.enqueue(_))
    while (a.size > k) a.dequeue()
    a
  }

  override def finish(buf: mutable.PriorityQueue[(Double, Long)]): Seq[Long] =
    buf.toSeq.sortBy { case (s, id) => (-s, id) }.map(_._2)

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
    Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
