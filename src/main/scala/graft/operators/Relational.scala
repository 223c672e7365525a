package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's relational operator library: pure `DataFrame => DataFrame`
  * combinators over Spark built-ins, one per operator in SURVEY.md §2.
  *
  * Everything here is declarative — Catalyst gets the whole plan, so
  * predicate pushdown / column pruning / join strategy selection stay
  * free. No driver-side loops; the only `collect` in the package is the
  * bounded alert sample in `nullViolationSample`.
  */
object Relational {

  /** P2 — drop any row containing ≥1 null
    * (reference `df.dropna()`, /root/reference/delta_load.py:97-98). */
  def dropNullRows(df: DataFrame): DataFrame = df.na.drop("any")

  /** P1 — the violation set (rows with ≥1 null), the side-output the
    * reference alerts on per-row (/root/reference/delta_load.py:67-84).
    * Set-oriented: one vectorized filter, not a per-row loop. NaN counts
    * as null for float/double columns — [[dropNullRows]] (`na.drop`)
    * drops those rows too, and the violation set must match what the
    * cleaner removes. */
  def nullViolations(df: DataFrame): DataFrame = df.filter(anyNullPredicate(df.schema))

  /** The "row has ≥1 null" predicate `na.drop("any")` actually applies:
    * NaN counts as null in float/double columns. ONE definition, shared
    * by the violation side-output and the pipeline's accounting, so the
    * alert sample and the dropped-row counts can never disagree. */
  def anyNullPredicate(schema: org.apache.spark.sql.types.StructType): Column =
    schema.fields.map { f =>
      f.dataType match {
        case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
          col(f.name).isNull || isnan(col(f.name))
        case _ => col(f.name).isNull
      }
    }.reduce(_ || _)

  /** Bounded driver-side sample of violations for alerting (K5). */
  def nullViolationSample(df: DataFrame, max: Int = 100): Array[org.apache.spark.sql.Row] =
    nullViolations(df).limit(max).collect()

  /** D1 — full-row distinct (reference `drop_duplicates()`,
    * /root/reference/delta_load.py:97-98). Hash-aggregate over all
    * columns; shuffles once on the full row. */
  def distinctRows(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Key-based distinct — keeps an arbitrary-but-deterministic row per
    * key when `tieBreak` is given (first by ascending tieBreak). */
  def distinctByKey(df: DataFrame, keys: Seq[String], tieBreak: Seq[Column] = Nil): DataFrame =
    if (tieBreak.isEmpty) df.dropDuplicates(keys)
    else {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak: _*)
      df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    }

  /** P3 in bulk — latest version per key:
    * `row_number() OVER (PARTITION BY keys ORDER BY version DESC) = 1`.
    * `order` must be a total order for determinism (append unique
    * tie-breakers if the version column can tie). */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** D2 — keyed last-writer-wins merge ("upsert") as a full-outer join:
    * incoming wins per key, existing rows without a match survive.
    * This is the set-oriented MERGE the reference *intended* with
    * `INSERT ... ON DUPLICATE KEY UPDATE` (/root/reference/delta_load.py:182-186
    * — degenerate there because its DDL declares no keys;
    * our version takes keys explicitly).
    *
    * Scale: one shuffle on `keys` for each side; with both sides
    * bucketed/pre-partitioned on `keys` the shuffle is avoided. A small
    * `incoming` should be broadcast — Catalyst/AQE picks that up from
    * sizes, no hint needed for the common big-existing/small-delta case.
    */
  /** Schema-drift policy for [[mergeUpsert]]:
    *  - [[SchemaPolicy.Strict]] — identical column sets required
    *    (reference parity: schema frozen first-writer-wins,
    *    /root/reference/first_lambda_function.py:101-105).
    *  - [[SchemaPolicy.AddColumns]] — incoming may ADD columns (existing
    *    rows read null there); columns incoming lacks keep their
    *    existing value on key match. Same-named columns with different
    *    types are always rejected with the full conflict list — silent
    *    coercion at 100 TB corrupts a table no one can rebuild. */
  sealed trait SchemaPolicy
  object SchemaPolicy {
    case object Strict extends SchemaPolicy
    case object AddColumns extends SchemaPolicy
  }

  def mergeUpsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
                  policy: SchemaPolicy = SchemaPolicy.Strict): DataFrame = {
    require(keys.nonEmpty, "mergeUpsert needs explicit keys (reference bug D2: keyless upsert degenerates to append)")
    val exCols = existing.columns
    val inCols = incoming.columns
    keys.foreach { k =>
      require(exCols.contains(k) && inCols.contains(k), s"merge key '$k' missing from a side")
    }
    val conflicts = exCols.toSet.intersect(inCols.toSet).toSeq.sorted.flatMap { c =>
      val (et, it) = (existing.schema(c).dataType, incoming.schema(c).dataType)
      if (et != it) Some(s"$c: existing=${et.simpleString} incoming=${it.simpleString}") else None
    }
    require(conflicts.isEmpty, s"schema conflict on merge — rejected: ${conflicts.mkString("; ")}")
    policy match {
      case SchemaPolicy.Strict =>
        require(inCols.sorted.sameElements(exCols.sorted),
          s"schema mismatch between existing and incoming (policy Strict): " +
            s"existing-only=${exCols.diff(inCols).mkString(",")} incoming-only=${inCols.diff(exCols).mkString(",")}")
      case SchemaPolicy.AddColumns => // union of columns, handled below
    }
    val cols = exCols ++ inCols.filterNot(exCols.contains)
    val ex = existing.alias("ex")
    val in = incoming.alias("in")
    val cond = keys.map(k => col(s"ex.$k") <=> col(s"in.$k")).reduce(_ && _)
    val merged = ex.join(in, cond, "full_outer")
    val anyInKey = keys.map(k => col(s"in.$k").isNotNull).reduce(_ || _)
    val picked = cols.map { c =>
      val exSide =
        if (exCols.contains(c)) col(s"ex.$c")
        else lit(null).cast(incoming.schema(c).dataType)
      val inSide =
        if (inCols.contains(c)) col(s"in.$c")
        else exSide // incoming lacks it: existing value survives the match
      when(anyInKey, inSide).otherwise(exSide).as(c)
    }
    merged.select(picked: _*)
  }

  /** MERGE with GROUP-replace semantics: incoming rows replace ALL
    * existing rows sharing their group key(s) — the contract of
    * multi-row-per-key index tables (BM25 postings per doc_id, LSH band
    * keys, fuzzy-key segments), where a re-uploaded document's new rows
    * must displace its old rows wholesale and a row-keyed
    * [[mergeUpsert]] would leave stale orphans (old terms the revision
    * no longer contains). Schemas must match exactly.
    *
    * Scale shape: the incoming batch's key set is batch-sized, so it
    * broadcasts — one streaming anti-join scan of the existing table
    * plus a union; the existing side never shuffles. */
  /** `replaceKeys` (optional): the explicit group-key rows to displace
    * when they can be WIDER than `incoming`'s own key set — a group
    * whose re-upload produces zero incoming rows (a document that now
    * tokenizes to nothing) must still have its old rows deleted, and
    * deriving the key set from `incoming` alone cannot express that.
    * Must contain exactly the `groupKeys` columns. */
  def mergeReplaceGroups(existing: DataFrame, incoming: DataFrame,
                         groupKeys: Seq[String],
                         replaceKeys: Option[DataFrame] = None): DataFrame = {
    require(groupKeys.nonEmpty, "mergeReplaceGroups needs explicit group keys")
    require(incoming.columns.sorted.sameElements(existing.columns.sorted),
      s"schema mismatch: existing=${existing.columns.sorted.mkString(",")} " +
        s"incoming=${incoming.columns.sorted.mkString(",")}")
    replaceKeys.foreach { k =>
      require(k.columns.sorted.sameElements(groupKeys.sorted),
        s"replaceKeys must carry exactly the group keys $groupKeys, got ${k.columns.mkString(",")}")
    }
    val keys = replaceKeys.getOrElse(incoming.select(groupKeys.map(col): _*)).distinct()
    // Null-safe displacement: a plain `left_anti` on column names uses
    // `=`, under which NULL never matches — existing NULL-key groups
    // would survive every merge and duplicate beside each incoming
    // NULL-key batch. All current index producers emit non-null keys,
    // but the contract here is "incoming group displaces existing
    // group", including the NULL group, so join with `<=>`.
    val renamed = keys.toDF(groupKeys.map("__rk_" + _): _*)
    val cond = groupKeys.map(k => col(k) <=> col("__rk_" + k)).reduce(_ && _)
    existing.join(broadcast(renamed), cond, "left_anti")
      .unionByName(incoming)
  }

  /** Top-k per group with a deterministic total order. */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
                   rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Range (interval) join: pairs where `left.pointCol` ∈
    * `[right.startCol, right.endCol]`. Spark plans a raw BETWEEN join as
    * a broadcast-nested-loop — O(|L|·|R|). This version bins the domain:
    * each right interval explodes to the bins it covers, the left point
    * maps to one bin, and the join becomes an equi-join on bin followed
    * by the exact between filter. Complete (an overlapping interval
    * always covers the point's bin); cost O(|L| + |R|·avgBinsPerInterval)
    * shuffled on bin. Pick `binWidth` ≈ typical interval length — an
    * interval spanning more than `maxBinsPerInterval` bins fails fast
    * with an actionable error instead of exploding toward an executor
    * OOM (same valve as the `IntervalJoinRewrite` optimizer rule).
    *
    * `keys` (left-column → right-column equi-conjuncts) joins on
    * (keys…, bin) instead of bin alone. This matters under DENSITY, not
    * just volume: when both sides grow k× inside the same time domain,
    * a bin-only join forms k² candidate pairs per bin before any
    * post-filter can reject them (measured 6.2× wall-clock at 10× in
    * NOTES_r8 for q53), while the keyed join's candidates grow with the
    * true output. Always push an available equi-key into the join. */
  def rangeJoin(left: DataFrame, pointCol: String,
                right: DataFrame, startCol: String, endCol: String,
                binWidth: Long, maxBinsPerInterval: Long = 16384L,
                keys: Seq[(String, String)] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // floor of the RAW value (not a long-truncating cast): trunc rounds
    // toward zero, which both misbins fractional/negative points and —
    // in the exact filter — manufactured false matches (5.9 BETWEEN
    // [5.0, 5.1] after truncation); floor is monotone, so p ∈ [s, e] ⇒
    // bin(p) ∈ [bin(s), bin(e)] holds for every numeric type
    def binOf(c: Column): Column = floor(c / binWidth).cast("long")
    val lBinned = left.withColumn("__bin", binOf(col(pointCol)))
    val startBin = binOf(col(startCol))
    val endBin = binOf(col(endCol))
    val span = endBin - startBin
    // null or reversed bounds: the interval matches nothing — emit a
    // null sequence so the non-outer explode drops the row (raising
    // would punish data that the join semantics already exclude);
    // reversed bounds must NOT reach sequence(), whose default step -1
    // would happily generate the huge descending ramp the cap exists
    // to prevent
    val guardedEnd = when(span.isNull || span < 0, lit(null).cast("long"))
      .when(span < lit(maxBinsPerInterval), endBin)
      .otherwise(raise_error(lit(
        s"graft rangeJoin: interval spans more than $maxBinsPerInterval bins; " +
          "raise binWidth toward the typical interval length")))
    val rBinned0 = right.withColumn("__bin", explode(sequence(startBin, guardedEnd)))
    // Broadcast decision correction: Catalyst estimates the exploded
    // side at its PRE-explode size, so a large interval table can sail
    // under autoBroadcastJoinThreshold and broadcast millions of binned
    // rows (measured 1.8× slower than a shuffled hash join at 10× in
    // NOTES_r8). If the pre-explode estimate times a 4× expansion
    // margin (binWidth ≈ interval length ⇒ ~2 bins/interval) exceeds
    // the threshold — or broadcasting is disabled — pre-empt with a
    // shuffle-hash hint (hash beats sort-merge: no sort, and the
    // (keys, bin) composite distributes well). A genuinely small
    // interval table keeps Spark's broadcast plan: the point side then
    // never shuffles at all, which is the right 100 TB plan.
    val estBytes = rBinned0.queryExecution.optimizedPlan.stats.sizeInBytes
    val rawThresh = right.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    val bcDisabled = rawThresh.startsWith("-")
    val bcThresh =
      if (bcDisabled) -1L
      else try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(rawThresh)
      catch { case _: Exception => 10L << 20 }
    val rBinned =
      if (bcDisabled || estBytes * 4 > bcThresh) rBinned0.hint("shuffle_hash")
      else rBinned0
    val joined =
      if (keys.isEmpty) lBinned.join(rBinned, Seq("__bin"))
      else {
        val lA = lBinned.alias("__gl")
        val rA = rBinned.alias("__gr")
        val cond = keys.foldLeft(col("__gl.__bin") === col("__gr.__bin")) {
          case (acc, (lk, rk)) => acc && col(s"__gl.$lk") === col(s"__gr.$rk")
        }
        lA.join(rA, cond).drop(col("__gr.__bin"))
      }
    joined
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }

  /** As-of join: for each left row, the latest right row with
    * `rightTs <= leftTs` within the same `keys` group (the time-series
    * point-in-time lookup Spark has no built-in for).
    *
    * Implementation is the union-and-sweep pattern: tag both sides,
    * sort each key group by (ts, side), carry the last-seen right row
    * forward with `last(_, ignoreNulls)` — ONE shuffle on `keys` and one
    * sort, versus the naive join-then-filter which explodes to
    * |left|·|right| per key. Right rows sort before left rows at equal
    * ts, so an exactly-simultaneous right row matches (>= semantics).
    *
    * Right rows must be unique per (keys, rightTs) for determinism —
    * pre-aggregate with [[latestPerKey]] if they are not. Output: all
    * left columns plus `payload` columns from the matched right row
    * (null when nothing precedes ⇒ filter for inner semantics). */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val rTagged = right.select(
      keyCols :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        struct((rightTs +: payload).map(col): _*).as("__r") : _*)
    val lTagged = left.select(
      keyCols :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(rTagged.schema("__r").dataType).as("__r") :+
        struct(left.columns.map(col): _*).as("__l") : _*)
    val both = rTagged.withColumn("__l", lit(null).cast(lTagged.schema("__l").dataType))
      .unionByName(lTagged)
    val w = Window.partitionBy(keyCols: _*).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = both
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val matchCols = (rightTs +: payload).map(c =>
      col(s"__match.$c").as(if (c == rightTs) s"asof_$c" else c))
    swept.select(leftCols ++ matchCols: _*)
  }
}
