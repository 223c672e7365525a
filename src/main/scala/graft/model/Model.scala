package graft.model

/** Core model types for the ingest pipeline.
  *
  * Mirrors the reference's event/path/watermark vocabulary
  * (see /root/reference/second_lambda_function.py:18-31 for the S3-event →
  * (bucket, key, folder, table) decomposition and
  * /root/reference/delta_load.py:90-95 for path parsing) re-expressed as
  * plain Scala ADTs. No AWS types anywhere: an "object store path" is just
  * a URI-ish string and a version is the integer form of the snapshot
  * folder name `YYYYMMDD_HHMMSS`.
  */
final case class IngestEvent(bucket: String, key: String) {
  /** `<folder>/<table>.csv` → folder (snapshot version string). */
  def folder: String = key.split("/").dropRight(1).mkString("/")
  /** table name = file basename minus extension (reference: file-as-table). */
  def table: String = IngestEvent.tableOf(key)
  /** Integer-comparable version, e.g. "20250108_075503" → 20250108075503L. */
  def version: Long = IngestEvent.versionOf(folder)
  def path: String = s"$bucket/$key"
}

object IngestEvent {
  def tableOf(key: String): String = {
    val base = key.split("/").last
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }
  /** Reference semantics: folder name digits compared as one integer
    * (second_lambda_function.py:31,66 — `int(folder.replace('_',''))`). */
  def versionOf(folder: String): Long = {
    val digits = folder.filter(_.isDigit)
    if (digits.isEmpty) 0L else digits.toLong
  }

  /** Parse `scheme://bucket/key...` or a plain local path into an event.
    * Local dirs: bucket = root dir, key = relative path. */
  def parse(path: String): IngestEvent = {
    val noScheme = path.indexOf("://") match {
      case -1 => path
      case i  => path.substring(i + 3)
    }
    noScheme.split("/", 2) match {
      case Array(b, k) => IngestEvent(b, k)
      case Array(b)    => IngestEvent(b, "")
    }
  }
}

/** (table, version) — the unit of incremental intake. */
final case class TableVersion(table: String, version: Long)

/** JDBC sink configuration (reference: RDS credentials from Secrets
  * Manager, delta_load.py:100-113 — here just injected config).
  * `quoteChar` is the target dialect's identifier quote (backtick for
  * MySQL — the reference's RDS engine — double-quote for ANSI/Derby). */
final case class JdbcConfig(
    url: String,
    user: String,
    password: String,
    database: String,
    batchSize: Int = 1000,
    quoteChar: String = "`")

/** Identifier hygiene, matching the reference's BOM-strip + quote-escape
  * (first_lambda_function.py:97,103) and extending it to something safe. */
object Identifiers {
  /** Strip UTF-8 BOM, trim, collapse forbidden chars to `_`. */
  def sanitize(name: String): String = {
    val noBom = name.stripPrefix("﻿").trim
    noBom.replaceAll("[^A-Za-z0-9_]", "_") match {
      case s if s.isEmpty          => "_"
      case s if s.head.isDigit     => "_" + s
      case s                       => s
    }
  }
  /** SQL identifier quoting for generated DDL/DML (backtick dialect by
    * default; pass the dialect's quote char for ANSI double-quote). */
  def quote(name: String, q: String = "`"): String =
    q + name.replace(q, q + q) + q
}
