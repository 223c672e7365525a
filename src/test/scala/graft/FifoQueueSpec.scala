package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FifoQueue

class FifoQueueSpec extends AnyFunSuite {

  private def freshDir() = Files.createTempDirectory("graft_q").toString

  test("per-group FIFO order") {
    val q = new FifoQueue(freshDir())
    (1 to 5).foreach(i => assert(q.send("orders", s"d$i", s"m$i")))
    val drained = Iterator.continually {
      val m = q.receive("orders")
      m.foreach(q.ack(_))
      m
    }.takeWhile(_.isDefined).flatten.map(_.body).toList
    assert(drained == List("m1", "m2", "m3", "m4", "m5"))
  }

  test("dedup id drops resends within the window, admits them after") {
    val now = new AtomicLong(1000L)
    val q = new FifoQueue(freshDir(), dedupWindowMs = 100L, clock = () => now.get())
    assert(q.send("t", "file1@v1", "a"))
    assert(!q.send("t", "file1@v1", "a (retry)")) // duplicate: dropped
    assert(q.send("t", "file1@v2", "b"))          // different id: admitted
    now.addAndGet(200L)                           // window lapses
    assert(q.send("t", "file1@v1", "a (late replay)"))
    assert(q.depth("t") == 3)
  }

  test("group serialization: next message hidden until ack") {
    val q = new FifoQueue(freshDir())
    q.send("t", "1", "m1"); q.send("t", "2", "m2")
    val first = q.receive("t").get
    assert(first.body == "m1")
    assert(q.receive("t").isEmpty) // blocked: m1 in flight
    assert(q.ack(first))
    assert(q.receive("t").map(_.body).contains("m2"))
  }

  test("visibility timeout redelivers the unacked message (at-least-once)") {
    val now = new AtomicLong(0L)
    val q = new FifoQueue(freshDir(), visibilityTimeoutMs = 50L, clock = () => now.get())
    q.send("t", "1", "m1")
    val first = q.receive("t").get
    now.addAndGet(100L) // consumer crashed; lease lapses
    val redelivered = q.receive("t").get
    assert(redelivered.body == "m1" && redelivered.seq == first.seq)
    assert(!q.ack(first)) // stale lease: the crashed consumer's ack is refused
    assert(q.ack(redelivered))
    assert(q.receive("t").isEmpty && q.depth("t") == 0)
  }

  test("groups are independent: one blocked group doesn't block others") {
    val q = new FifoQueue(freshDir())
    // dedup ids are queue-wide (as in SQS), so the two groups need
    // distinct ids for both sends to land
    q.send("a", "a@1", "a1"); q.send("b", "b@1", "b1")
    val inflightA = q.receive("a").get
    assert(q.receive("a").isEmpty)            // a is blocked...
    assert(q.receive("b").map(_.body).contains("b1")) // ...b is not
    q.ack(inflightA)
  }

  test("concurrent senders: no lost or duplicated sequence numbers") {
    val q = new FifoQueue(freshDir())
    val threads = (1 to 8).map { t =>
      new Thread(() => (1 to 25).foreach(i => q.send("t", s"$t-$i", s"$t-$i")))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(q.depth("t") == 200)
    val bodies = Iterator.continually {
      val m = q.receive("t"); m.foreach(q.ack(_)); m
    }.takeWhile(_.isDefined).flatten.map(_.body).toList
    assert(bodies.size == 200 && bodies.distinct.size == 200)
  }

  test("receiveAny drains across groups; dedup markers prune") {
    val now = new AtomicLong(0L)
    val q = new FifoQueue(freshDir(), dedupWindowMs = 100L, clock = () => now.get())
    q.send("a", "1", "a1"); q.send("b", "2", "b1")
    val got = Iterator.continually {
      val m = q.receiveAny(); m.foreach(q.ack(_)); m
    }.takeWhile(_.isDefined).flatten.map(_.body).toSet
    assert(got == Set("a1", "b1"))
    now.addAndGet(200L)
    q.pruneDedup()
    assert(q.send("a", "1", "a1 again")) // marker pruned → admitted
  }
}
