package graft.sinks

import java.nio.file.{Files, Paths}
import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.model.{Identifiers, JdbcConfig}
import graft.operators.Relational

/** Sinks: the curated-store writers (SURVEY.md §2.8).
  *
  * Two families:
  *  - `ParquetMergeSink` — the lakehouse-native curated store: keyed
  *    last-writer-wins MERGE into a parquet table (what the reference's
  *    RDS "refined store" becomes when the query engine is Spark itself).
  *  - `JdbcUpsertSink` — reference-shaped RDBMS sink (K2), but
  *    set-oriented: `foreachPartition` + batched upserts in one
  *    transaction per partition, replacing the reference's
  *    one-INSERT-one-commit-per-row loop
  *    (/root/reference/delta_load.py:180-193).
  */
object ParquetMergeSink {

  /** Table root = `<warehouse>/<table>`; versioned write dirs with a
    * `_CURRENT` pointer file give atomic swap without a transaction log
    * (single-writer-per-table discipline, as the reference's FIFO groups
    * enforce — SURVEY.md §2.9). */
  def currentPath(warehouse: String, table: String): Option[String] = {
    val ptr = Paths.get(warehouse, table, "_CURRENT")
    if (Files.exists(ptr)) Some(Paths.get(warehouse, table, Files.readString(ptr).trim).toString)
    else None
  }

  def readCurrent(spark: SparkSession, warehouse: String, table: String): Option[DataFrame] =
    currentPath(warehouse, table).map(spark.read.parquet(_))

  /** All retained versions of a table, ascending (time travel). */
  def versions(warehouse: String, table: String): Seq[Long] = {
    val dir = Paths.get(warehouse, table)
    if (!Files.isDirectory(dir)) Nil
    else {
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") && s.drop(1).forall(_.isDigit) => s.drop(1).toLong }
        .toSeq.sorted
    }
  }

  /** Read a table as of a given version (the latest retained version
    * ≤ `asOf`) — every merge keeps its full snapshot dir, so any past
    * state is one read away until `vacuum`. */
  def readVersion(spark: SparkSession, warehouse: String, table: String, asOf: Long): Option[DataFrame] =
    versions(warehouse, table).filter(_ <= asOf).lastOption
      .map(v => spark.read.parquet(Paths.get(warehouse, table, s"v$v").toString))

  /** Drop all but the newest `keep` versions (never the current one). */
  def vacuum(warehouse: String, table: String, keep: Int = 1): Unit = {
    val cur = currentPath(warehouse, table).map(p => Paths.get(p).getFileName.toString)
    val all = versions(warehouse, table)
    val drop = all.dropRight(math.max(keep, 1))
      .filterNot(v => cur.contains(s"v$v"))
    drop.foreach { v =>
      val dir = Paths.get(warehouse, table, s"v$v")
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  /** MERGE `incoming` into table on `keys` (insert-or-replace per key);
    * creates the table on first write. Returns the merged row count. */
  def merge(spark: SparkSession, warehouse: String, table: String,
            incoming: DataFrame, keys: Seq[String], version: Long): Long = {
    val merged = readCurrent(spark, warehouse, table) match {
      case Some(existing) => Relational.mergeUpsert(existing, incoming, keys)
      case None           => incoming
    }
    val dir = s"v$version"
    val target = Paths.get(warehouse, table, dir)
    merged.write.mode(SaveMode.Overwrite).parquet(target.toString)
    val ptrTmp = Paths.get(warehouse, table, "_CURRENT.tmp")
    Files.writeString(ptrTmp, dir)
    Files.move(ptrTmp, Paths.get(warehouse, table, "_CURRENT"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    spark.read.parquet(target.toString).count()
  }
}

object JdbcUpsertSink {

  /** K1 — first-writer-wins `CREATE TABLE IF NOT EXISTS` from a Spark
    * schema (reference /root/reference/first_lambda_function.py:92-132). */
  def ensureTableDdl(table: String, schema: StructType, dialectUpsert: Boolean = true): String = {
    val cols = schema.fields.map { f =>
      val sqlType = f.dataType.typeName match {
        case "long" | "integer" => "BIGINT"
        case "double" | "float" => "DOUBLE"
        case "timestamp"        => "TIMESTAMP"
        case _                  => "VARCHAR(255)"
      }
      s"${Identifiers.quote(Identifiers.sanitize(f.name))} $sqlType"
    }
    s"CREATE TABLE IF NOT EXISTS ${Identifiers.quote(table)} (${cols.mkString(", ")})"
  }

  /** Generic keyed upsert statement pair (UPDATE-then-INSERT), portable
    * across JDBC dialects without MERGE support. */
  private[sinks] def statements(table: String, cols: Seq[String], keys: Seq[String]): (String, String) = {
    val q = (s: String) => Identifiers.quote(s)
    val nonKeys = cols.filterNot(keys.contains)
    val update =
      s"UPDATE ${q(table)} SET ${nonKeys.map(c => s"${q(c)} = ?").mkString(", ")} " +
        s"WHERE ${keys.map(k => s"${q(k)} = ?").mkString(" AND ")}"
    val insert =
      s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    (update, insert)
  }

  /** K2 — distributed keyed upsert: per partition, one connection, one
    * transaction, batched statements. Executor-side; the driver never
    * sees a row. */
  def upsert(df: DataFrame, table: String, keys: Seq[String], cfg: JdbcConfig): Unit = {
    val cols = df.columns.toSeq
    val (updateSql, insertSql) = statements(table, cols, keys)
    val nonKeys = cols.filterNot(keys.contains)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(cfg.url, cfg.user, cfg.password)
        try {
          conn.setAutoCommit(false)
          val upd: PreparedStatement = conn.prepareStatement(updateSql)
          val ins: PreparedStatement = conn.prepareStatement(insertSql)
          var pending = 0
          rows.foreach { row =>
            nonKeys.zipWithIndex.foreach { case (c, i) => upd.setObject(i + 1, row.getAs[Any](c)) }
            keys.zipWithIndex.foreach { case (k, i) => upd.setObject(nonKeys.size + i + 1, row.getAs[Any](k)) }
            if (upd.executeUpdate() == 0) {
              cols.zipWithIndex.foreach { case (c, i) => ins.setObject(i + 1, row.getAs[Any](c)) }
              ins.addBatch()
              pending += 1
              if (pending >= cfg.batchSize) { ins.executeBatch(); pending = 0 }
            }
          }
          if (pending > 0) ins.executeBatch()
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }
}
