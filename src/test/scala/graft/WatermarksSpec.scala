package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.TableVersion
import graft.tracker.Watermarks

class WatermarksSpec extends AnyFunSuite {

  private def fresh() = new Watermarks(
    Files.createTempDirectory("graft_wm").toString + "/wm.tsv")

  test("empty store processes anything") {
    val w = fresh()
    assert(w.shouldProcess(TableVersion("t", 1L)))
  }

  test("strict > gate: equal and older are skipped (reference P3)") {
    val w = fresh()
    w.advance(TableVersion("t", 10L))
    assert(!w.shouldProcess(TableVersion("t", 10L)))
    assert(!w.shouldProcess(TableVersion("t", 9L)))
    assert(w.shouldProcess(TableVersion("t", 11L)))
    // independent per table
    assert(w.shouldProcess(TableVersion("other", 1L)))
  }

  test("advance is last-writer-wins and persistent") {
    val w = fresh()
    w.advance(TableVersion("a", 1L))
    w.advance(TableVersion("b", 2L))
    w.advance(TableVersion("a", 5L))
    val reread = new Watermarks(w.storePath)
    assert(reread.read() == Map("a" -> 5L, "b" -> 2L))
  }
}
