package graft.tracker

import graft.fs.Fs
import graft.model.TableVersion

/** Incremental-load watermark store — the engine's replacement for the
  * reference's single-item DynamoDB map
  * (`DeltaLoadTracker[FileName='database_list'] → {table: {folder_name}}`,
  * /root/reference/second_lambda_function.py:44-66,
  * /root/reference/delta_load.py:204-265).
  *
  * This is *control-plane* state: one row per table, tiny, read once per
  * pipeline run — so it lives as a plain sorted text file written
  * atomically (tmp + move), not a distributed dataset. At cluster scale
  * the same interface backs onto a catalog/Delta table; the gate logic
  * (strict `>`) is identical.
  */
final class Watermarks(val storePath: String) {

  /** table → latest loaded version. */
  def read(): Map[String, Long] =
    if (!Fs.exists(storePath)) Map.empty
    else
      Fs.readString(storePath).split("\r?\n").toSeq.filter(_.nonEmpty).map { line =>
        // \r?\n: a store file written/edited with CRLF endings must not
        // leave a trailing \r on the version field (toLong would throw)
        val Array(t, v) = line.split("\t", 2)
        t -> v.trim.toLong
      }.toMap

  /** The reference's incremental gate: process iff strictly newer
    * (second_lambda_function.py:76-88 — equal/older versions skipped). */
  def shouldProcess(tv: TableVersion): Boolean =
    read().get(tv.table).forall(tv.version > _)

  /** Advance the watermark for one table (last-writer-wins; tmp+rename,
    * atomic where the filesystem supports it — see [[graft.fs.Fs]]). */
  def advance(tv: TableVersion): Unit = {
    val next = read() + (tv.table -> tv.version)
    val body = next.toSeq.sortBy(_._1).map { case (t, v) => s"$t\t$v" }.mkString("", "\n", "\n")
    Fs.writeStringAtomic(storePath, body)
  }
}
