package graft.infer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV schema inference.
  *
  * Two modes:
  *  - `spark(...)`: full-file sampled inference via Spark's built-in
  *    `inferSchema` (strictly better than the reference).
  *  - `referenceMode(...)`: parity shim reproducing the reference's
  *    first-data-row, 3-type lattice (INTEGER / FLOAT / VARCHAR —
  *    /root/reference/first_lambda_function.py:59-70), including its
  *    quirks: `isdigit`-style integer test (rejects negatives and `+`),
  *    float fallback via parseability, string otherwise.
  */
object TypeInference {

  /** Spark-native inference: header + all-rows sampling. */
  def spark(session: SparkSession, path: String): StructType =
    session.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)
      .schema

  /** Read a CSV with full inference (the engine's S4/S3 scan). */
  def readCsv(session: SparkSession, path: String): DataFrame =
    session.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** Reference-parity inference from header + first data row only. */
  def referenceMode(header: Seq[String], firstRow: Seq[String]): StructType = {
    val fields = header.zipAll(firstRow, "", "").map { case (name, value) =>
      StructField(graft.model.Identifiers.sanitize(name), referenceType(value))
    }
    StructType(fields)
  }

  /** The 3-type lattice decision for a single sample value. */
  private[infer] def referenceType(value: String): DataType =
    if (value.nonEmpty && value.forall(_.isDigit)) LongType
    else if (parsesAsDouble(value)) DoubleType
    else StringType

  private def parsesAsDouble(v: String): Boolean =
    try { v.trim.nonEmpty && { v.trim.toDouble; true } }
    catch { case _: NumberFormatException => false }
}
