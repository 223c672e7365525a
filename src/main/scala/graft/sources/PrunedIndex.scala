package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fs.Fs

/** Hash-bucketed persisted-index layout: the 100×-scale answer to
  * "every online probe scans the whole index".
  *
  * The engine's persisted indexes — BM25 postings, fingerprint /
  * winnowing grams, MinHash band keys, fuzzy-key segments — are all
  * probed by a SMALL key set (a query batch's terms, a delta batch's
  * segments) against a corpus-sized table. Stored flat, every probe
  * reads the full index no matter how few keys it wants; at 100× the
  * corpus that read dominates the probe. Stored hash-bucketed on the
  * probe key (`part_bucket = pmod(hash(key…), numBuckets)` as a
  * PARTITION column), the probe computes its key set's buckets (a
  * bounded, probe-sized job) and reads only those buckets' files —
  * the fraction read falls as min(1, |probe buckets| / numBuckets),
  * independent of corpus size.
  *
  * This is the directory-layout dual of [[graft.operators.Scale.bucketizeForJoin]]
  * (which co-locates two corpus-sized sides via the metastore); here
  * one side is tiny, so pruning beats co-location and the layout stays
  * a plain parquet directory any reader can open (the bucket column is
  * dropped on read).
  *
  * Bucket-count choice at scale: buckets should be ≳ the index's file
  * count at the target SF so each bucket is ≥ one file, and ≤ the
  * probe-key cardinality above which pruning stops helping (a probe
  * touching every bucket reads everything regardless — then this
  * layout costs nothing over flat: same bytes, same pushdown).
  *
  * == Staleness contract ==
  * [[read]] / [[readPruned]] serve the layout AS OF the last completed
  * [[write]] — by this or any other process: each call re-reads the
  * tiny `_PRUNE_META` sidecar and re-parses the manifest when its
  * VERSION TOKEN (monotonic, compared by value — immune to coarse
  * filesystem mtime granularity) moved, so a concurrent rebuild
  * through [[write]] is picked up. A manifest whose meta is missing
  * (a write crashed between the two sidecar lands) degrades to the
  * listing fallback rather than erroring. What is NOT supported is
  * rewriting the
  * directory by any path that bypasses [[write]] (a bare
  * `df.write.parquet(path)` overwrite): such a rewrite updates neither
  * sidecar, and readers keep serving the old file list — use [[write]]
  * for every rewrite, or delete the sidecars to force the listing
  * fallback. */
object PrunedIndex {

  val BucketCol = "part_bucket"

  private def metaPath(path: String): String = Fs.child(path, "_PRUNE_META")
  private def manifestPath(path: String): String = Fs.child(path, "_PRUNE_MANIFEST")

  /** Parsed `_PRUNE_MANIFEST` (bucket → relative file paths), cached
    * per (session, path) and validated against the `_PRUNE_META`
    * VERSION TOKEN on EVERY access — a monotonic value the writer
    * stamps into the sidecar (epoch-ms + process counter), compared by
    * value, so two rebuilds inside one filesystem-mtime granule still
    * invalidate correctly (an mtime check cannot distinguish them on
    * second-granularity filesystems — object stores included). A stale
    * cached listing can outlive a same-JVM rebuild no longer than one
    * tiny sidecar read. The manifest
    * is what makes the FIRST probe of an index version listing-free:
    * without it Spark rediscovers all `numBuckets` partition
    * directories on the first fresh `read.parquet` (measured 2.5–4.7 s
    * at 1024 buckets on local disk, dwarfing the pruned scan); the
    * r13 in-process listing cache only amortized that over LATER
    * probes. The writer lists the tree ONCE at write time instead —
    * the in-process analog of a metastore partition catalog, in a
    * sidecar any process can read. */
  private final case class Manifest(version: String, files: Map[Int, Seq[String]])
  private val manifestCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), Manifest]

  /** Legacy fallback (pre-manifest layouts): cached listed base
    * relations, keyed by (session, path). Same staleness contract. */
  private val baseCache =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  private def sessionKey(spark: SparkSession): Int = System.identityHashCode(spark)

  private def listedBase(spark: SparkSession, path: String): DataFrame = {
    if (baseCache.size > 64) baseCache.clear()
    val key = (sessionKey(spark), path)
    val cached = baseCache.get(key).filter { df =>
      (df.sparkSession eq spark) && !df.sparkSession.sparkContext.isStopped
    }
    cached.getOrElse {
      val df = spark.read.parquet(path)
      baseCache.put(key, df)
      df
    }
  }

  /** Monotonic writer counter: epoch-ms alone repeats across two
    * rebuilds inside one millisecond; epoch-ms + this counter never
    * repeats within a process, and the epoch-ms prefix separates
    * processes in every realistic rebuild cadence. */
  private val versionCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  private def newVersionToken(): String =
    s"${System.currentTimeMillis()}-${versionCounter.incrementAndGet()}"

  /** The meta sidecar's lines: (keyCols, numBuckets, versionToken).
    * Pre-token layouts (two-line meta) fall back to the mtime as the
    * token — weaker (granularity-bound) but only for indexes written
    * by an older build. Absent meta → None: a manifest without its
    * meta is an incomplete write (the writer lands meta LAST), so the
    * reader must treat it as "no manifest" rather than throw. */
  private def metaLines(path: String): Option[(Seq[String], Int, String)] = {
    if (!Fs.exists(metaPath(path))) return None
    val lines = Fs.readString(metaPath(path)).split("\n")
    val token =
      if (lines.length >= 3 && lines(2).trim.nonEmpty) lines(2).trim
      else "mtime:" + Fs.fs(metaPath(path))
        .getFileStatus(new org.apache.hadoop.fs.Path(metaPath(path)))
        .getModificationTime
    Some((lines(0).split(",").toSeq, lines(1).trim.toInt, token))
  }

  private def manifestFor(spark: SparkSession, path: String): Option[Map[Int, Seq[String]]] = {
    if (!Fs.exists(manifestPath(path))) return None
    // manifest exists but meta is missing: a write crashed between the
    // two sidecar lands (manifest-first, meta-last) or a reader raced a
    // first write — serve the listing fallback, never throw
    val token = metaLines(path) match {
      case Some((_, _, t)) => t
      case None            => return None
    }
    if (manifestCache.size > 64) manifestCache.clear()
    val key = (sessionKey(spark), path)
    val cached = manifestCache.get(key).filter(_.version == token)
    Some(cached.getOrElse {
      val files = Fs.readString(manifestPath(path)).split("\n")
        .iterator.filter(_.nonEmpty).map { line =>
          val i = line.indexOf('\t')
          (line.substring(0, i).toInt, line.substring(i + 1))
        }.toSeq.groupMap(_._1)(_._2)
      val m = Manifest(token, files)
      manifestCache.put(key, m)
      m
    }.files)
  }

  /** Write `df` partitioned by `pmod(hash(keyCols…), numBuckets)`.
    * Layout metadata (key columns + bucket count) rides in a
    * `_PRUNE_META` sidecar so readers never guess the hash domain, and
    * the data-file tree rides in a `_PRUNE_MANIFEST` sidecar
    * (bucket → file list) so probes never list the directory — the
    * writer pays one listing here, at write time.
    *
    * The rows are repartitioned ON the bucket value first: a naive
    * `partitionBy` write fans out to (tasks × buckets) files — ~2 000
    * small files for a 32-task, 64-bucket index, which triples the
    * write wall and taxes every later listing. One shuffle of the thin
    * index keyed by bucket lands each bucket in one task → ~one file
    * per bucket. `maxRecordsPerFile` > 0 splits a fat (hot-key) bucket
    * into multiple files so no single probe task has to scan one giant
    * file — the per-write form of `spark.sql.files.maxRecordsPerFile`,
    * the knob a skewed cell/term distribution needs at corpus scale. */
  def write(df: DataFrame, path: String, keyCols: Seq[String], numBuckets: Int,
            maxRecordsPerFile: Long = 0L): Unit = {
    require(keyCols.nonEmpty, "PrunedIndex needs at least one key column")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    require(!df.columns.contains(BucketCol),
      s"input already carries a $BucketCol column")
    val writer = df
      .withColumn(BucketCol, pmod(hash(keyCols.map(col): _*), lit(numBuckets)))
      .repartition(numBuckets, col(BucketCol))
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0L)
       writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer)
      .partitionBy(BucketCol).parquet(path)
    val prefix = BucketCol + "="
    val lines = Fs.list(path)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap { d =>
        val bucket = d.getPath.getName.substring(prefix.length).toInt
        Fs.list(d.getPath.toString)
          .filter { f =>
            val n = f.getPath.getName
            f.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
          .map(f => s"$bucket\t${d.getPath.getName}/${f.getPath.getName}")
      }
    // manifest lands before meta: meta (the version/validation stamp)
    // only ever points at a complete manifest; the third line is the
    // monotonic version token readers compare BY VALUE (mtime
    // granularity is filesystem-dependent — see manifestFor)
    Fs.writeStringAtomic(manifestPath(path), lines.mkString("\n"))
    Fs.writeStringAtomic(metaPath(path),
      s"${keyCols.mkString(",")}\n$numBuckets\n${newVersionToken()}")
    // drop every session's cached state for this path (same-JVM
    // rebuild/compaction swaps are seen immediately)
    manifestCache.filterInPlace((k, _) => k._2 != path)
    baseCache.filterInPlace((k, _) => k._2 != path)
  }

  /** (key columns, bucket count) recorded at write time. A pruned
    * probe cannot run without them (the hash domain would be a guess),
    * so an absent meta — an uncommitted [[write]] — is a hard error
    * here, unlike [[read]]'s listing fallback. */
  def meta(path: String): (Seq[String], Int) =
    metaLines(path) match {
      case Some((cols, buckets, _)) => (cols, buckets)
      case None => throw new IllegalStateException(
        s"no _PRUNE_META at $path: the index write never completed " +
          "(meta lands last) — rebuild via PrunedIndex.write")
    }

  /** Resolve a manifest entry to a readable path: entries written by
    * [[write]] are relative to the index dir; [[writeDelta]] stitches
    * untouched buckets' files in by ABSOLUTE path (possibly under a
    * different index dir — the prior store version), detected by a
    * leading `/` or a URI scheme. */
  private def resolveEntry(path: String, e: String): String =
    if (e.startsWith("/") || e.contains("://")) e else Fs.child(path, e)

  /** Read a manifest-selected entry set. All-relative entries (every
    * [[write]]-produced layout) read under a `basePath` so the bucket
    * value stays visible as a partition column — the plan shape the
    * directory-pruning assertions pin. Once a [[writeDelta]] stitch
    * introduces ABSOLUTE entries under other roots, a single basePath
    * cannot span them: the files are passed as leaves (no
    * partition-column inference — the manifest already knows each
    * file's bucket, and the bucket column carries no data). */
  private def readEntries(spark: SparkSession, path: String,
                          entries: Seq[String]): DataFrame =
    if (entries.forall(e => !(e.startsWith("/") || e.contains("://"))))
      spark.read.option("basePath", path)
        .parquet(entries.map(Fs.child(path, _)): _*)
    else spark.read.parquet(entries.map(resolveEntry(path, _)): _*)

  /** Full (unpruned) view — identical to the flat layout for readers
    * that genuinely need every row (rebuild comparisons, compaction).
    * Listing-free when the manifest sidecar exists; see the staleness
    * contract above. */
  def read(spark: SparkSession, path: String): DataFrame =
    (manifestFor(spark, path) match {
      case Some(m) if m.nonEmpty =>
        readEntries(spark, path, m.valuesIterator.flatten.toSeq)
      case _ => listedBase(spark, path)
    }).drop(BucketCol)

  /** Pruned view for a probe: only the files of the buckets that
    * `probe`'s key rows can hash into are read (straight from the
    * manifest — no directory listing, even on the first probe of an
    * index version), then an exact broadcast semi-join on the key
    * columns drops same-bucket strangers. `probe` must carry the
    * index's key columns (extra columns are ignored) and is assumed
    * probe-sized — its bucket set is collected to the driver to become
    * the file selection (bounded by numBuckets, no corpus data moves).
    *
    * Completeness: a key's rows all live in exactly one bucket, so the
    * pruned view contains EVERY index row whose key appears in the
    * probe — per-key aggregates (e.g. document frequency) computed on
    * it are exact, not per-bucket approximations. */
  def readPruned(spark: SparkSession, path: String, probe: DataFrame): DataFrame = {
    val (keyCols, numBuckets) = meta(path)
    val probeKeys = probe.select(keyCols.map(col): _*).distinct()
    val buckets = probeKeys
      .select(pmod(hash(keyCols.map(col): _*), lit(numBuckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val base = manifestFor(spark, path) match {
      case Some(m) if m.nonEmpty =>
        val sel = m.iterator.collect { case (b, fs) if buckets(b) => fs }
          .flatten.toSeq
        if (sel.nonEmpty) readEntries(spark, path, sel)
        else {
          // no probed bucket holds rows: an empty frame with the stored
          // schema, read from one data file that still EXISTS — an
          // arbitrary pick could name a file retention (or a ScaleSpec
          // mutilation proof) legitimately removed from an untouched
          // bucket, turning a rows-free probe into a read error
          val one = m.valuesIterator.flatten
            .find(e => graft.fs.Fs.exists(resolveEntry(path, e)))
            .getOrElse(throw new IllegalStateException(
              s"no readable data file under $path to derive the stored schema"))
          readEntries(spark, path, Seq(one)).limit(0)
        }
      case _ => listedBase(spark, path)
    }
    // using-column joins reorder output (key columns first); re-select
    // the stored data-column order so the pruned view is schema-identical
    // to [[read]]. Manifest-selected reads carry no bucket column (the
    // file selection IS the bucket filter); the listing fallback does —
    // filter it there.
    val dataCols = base.columns.filterNot(_ == BucketCol)
    val bucketFiltered =
      if (base.columns.contains(BucketCol))
        base.where(col(BucketCol).isin(buckets.toSeq: _*))
      else base
    bucketFiltered
      .join(broadcast(probeKeys), keyCols, "left_semi")
      .select(dataCols.map(col): _*)
  }

  /** Delta write with REPLACE-by-key semantics and DELTA-BOUNDED write
    * I/O: the index after the call holds `newKeyRows` for every key in
    * `probe` and the stored rows for every other key, but only the
    * TOUCHED buckets (the probe keys' hash buckets) land new files —
    * untouched buckets' existing files are stitched into the new
    * manifest untouched, by absolute path. At corpus scale this turns
    * per-batch index maintenance from an O(index) rewrite into an
    * O(delta buckets) one; the manifest + version-token swap makes the
    * flip atomic for readers exactly as [[write]]'s is.
    *
    * `newKeyRows` must contain ONLY rows whose key is in `probe`
    * (checked); `probe` is probe-sized (its bucket set is collected).
    * Same-bucket strangers — stored rows of untouched keys sharing a
    * touched bucket — are read back (touched buckets only) and
    * re-landed with the new rows, since a bucket's file set is replaced
    * wholesale.
    *
    * New files land under a uniquely-named `delta-<token>/` subdir
    * (never clobbering live files: a crash before the manifest swap
    * leaves the old view fully intact), so replaced files become
    * unreferenced garbage — sweep with [[sweepUnreferenced]] or fold
    * the layout flat again with a full [[write]] (compaction). After
    * the first delta the directory is no longer a valid plain-parquet
    * partition tree: the sidecars are REQUIRED (the listing fallback
    * would double-count), which the staleness contract above already
    * demands for every [[write]]-maintained layout.
    *
    * `basePath`: stitch from a DIFFERENT index dir (e.g. the previous
    * store version) instead of `path` itself — `path` is then created
    * fresh, holding only the delta files + a manifest referencing the
    * base's untouched files. The base is never modified; retention of
    * its files becomes the caller's contract (see
    * [[graft.llm.AnnIndexStore]]'s versioned use). */
  def writeDelta(spark: SparkSession, path: String, newKeyRows: DataFrame,
                 probe: DataFrame, basePath: Option[String] = None,
                 maxRecordsPerFile: Long = 0L): Unit = {
    val base = basePath.getOrElse(path)
    val (keyCols, numBuckets) = meta(base)
    val old = manifestFor(spark, base).getOrElse(throw new IllegalStateException(
      s"writeDelta needs a _PRUNE_MANIFEST at $base — build the index with PrunedIndex.write"))
    val probeKeys = probe.select(keyCols.map(col): _*).distinct()
    val touched = probeKeys
      .select(pmod(hash(keyCols.map(col): _*), lit(numBuckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    require(!newKeyRows.columns.contains(BucketCol),
      s"input already carries a $BucketCol column")
    // stray keys would silently vanish (their bucket's files are not
    // rewritten) — fail loudly instead; newKeyRows is delta-bounded so
    // this check is one cheap job
    val strayNew = newKeyRows
      .join(broadcast(probeKeys), keyCols, "left_anti").limit(1).count()
    require(strayNew == 0L,
      "writeDelta: newKeyRows contains rows whose key is not in probe")
    // same-bucket strangers: untouched keys in touched buckets — their
    // rows must re-land because the bucket's file set is replaced
    val touchedEntries = old.iterator
      .collect { case (b, fs) if touched(b) => fs }
      .flatten.toSeq
    // the stored column order is the layout's schema; resolve it from
    // ONE manifest entry (a touched bucket's first, when any — those
    // files are read below anyway) — constructing the full view here
    // would enumerate and validate every index file per delta write:
    // O(index files) driver work per batch, and a hard failure when
    // untouched buckets' files are gone (retention, or the ScaleSpec
    // mutilation proof)
    val dataCols =
      (touchedEntries.headOption.orElse(old.valuesIterator.flatten.take(1)
          .toSeq.headOption) match {
        case Some(one) => readEntries(spark, base, Seq(one))
        case None      => read(spark, base)
      }).columns.filterNot(_ == BucketCol).toSeq
    val strangers =
      if (touchedEntries.isEmpty) None
      else Some(readEntries(spark, base, touchedEntries)
        .drop(BucketCol)
        .join(broadcast(probeKeys), keyCols, "left_anti"))
    val full = strangers
      .map(_.select(dataCols.map(col): _*)
        .unionByName(newKeyRows.select(dataCols.map(col): _*)))
      .getOrElse(newKeyRows.select(dataCols.map(col): _*))
    val token = newVersionToken()
    val deltaDirName = s"delta-$token"
    val deltaDir = Fs.child(path, deltaDirName)
    val writer = full
      .withColumn(BucketCol, pmod(hash(keyCols.map(col): _*), lit(numBuckets)))
      .repartition(math.max(touched.size, 1), col(BucketCol))
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0L)
       writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer)
      .partitionBy(BucketCol).parquet(deltaDir)
    val prefix = BucketCol + "="
    val newLines = Fs.list(deltaDir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap { d =>
        val bucket = d.getPath.getName.substring(prefix.length).toInt
        Fs.list(d.getPath.toString)
          .filter { f =>
            val n = f.getPath.getName
            f.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
          .map(f => s"$bucket\t$deltaDirName/${d.getPath.getName}/${f.getPath.getName}")
      }
    // untouched buckets: carry the old entries forward ABSOLUTIZED, so
    // chains of deltas collapse to direct pointers (entry resolution
    // never walks history)
    val kept = old.iterator.collect { case (b, fs) if !touched(b) =>
      fs.map(e => s"$b\t${resolveEntry(base, e)}")
    }.flatten.toSeq
    Fs.writeStringAtomic(manifestPath(path), (kept ++ newLines).mkString("\n"))
    Fs.writeStringAtomic(metaPath(path),
      s"${keyCols.mkString(",")}\n$numBuckets\n$token")
    manifestCache.filterInPlace((k, _) => k._2 != path)
    baseCache.filterInPlace((k, _) => k._2 != path)
  }

  /** APPEND-only delta: land `rows` as new files in their key buckets
    * and carry EVERY old manifest entry forward — no replacement, no
    * same-bucket stranger re-land, so per-batch write I/O is O(rows)
    * regardless of how hot the touched buckets are. The layout becomes
    * STALE-TOLERANT by contract: a key re-landed by a later append has
    * BOTH generations of rows in its bucket, and the reader owns the
    * dedup story (e.g. keep the max-stamp row per id, or treat the
    * row set as a candidate SUPERSET that a downstream exact check
    * resolves — [[graft.llm.CurationLedgerStore]]'s score-band and
    * hash-band components do the latter). Use [[writeDelta]] when the
    * reader needs replace-by-key truth; use a full [[write]]
    * (compaction) to fold the stale generations out.
    *
    * `basePath` stitches from a different index dir exactly as
    * [[writeDelta]]'s does — `path` is created fresh, referencing the
    * base's files by absolute path, and the base is never modified. */
  def appendRows(spark: SparkSession, path: String, rows: DataFrame,
                 basePath: Option[String] = None,
                 maxRecordsPerFile: Long = 0L): Unit = {
    val base = basePath.getOrElse(path)
    val (keyCols, numBuckets) = meta(base)
    val old = manifestFor(spark, base).getOrElse(throw new IllegalStateException(
      s"appendRows needs a _PRUNE_MANIFEST at $base — build the index with PrunedIndex.write"))
    require(!rows.columns.contains(BucketCol),
      s"input already carries a $BucketCol column")
    val token = newVersionToken()
    val deltaDirName = s"delta-$token"
    val deltaDir = Fs.child(path, deltaDirName)
    val writer = rows
      .withColumn(BucketCol, pmod(hash(keyCols.map(col): _*), lit(numBuckets)))
      .repartition(math.min(numBuckets, 32), col(BucketCol))
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0L)
       writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer)
      .partitionBy(BucketCol).parquet(deltaDir)
    val prefix = BucketCol + "="
    val newLines = Fs.list(deltaDir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap { d =>
        val bucket = d.getPath.getName.substring(prefix.length).toInt
        Fs.list(d.getPath.toString)
          .filter { f =>
            val n = f.getPath.getName
            f.isFile && !n.startsWith("_") && !n.startsWith(".")
          }
          .map(f => s"$bucket\t$deltaDirName/${d.getPath.getName}/${f.getPath.getName}")
      }
    val kept = old.iterator.flatMap { case (b, fs) =>
      fs.map(e => s"$b\t${resolveEntry(base, e)}")
    }.toSeq
    Fs.writeStringAtomic(manifestPath(path), (kept ++ newLines).mkString("\n"))
    Fs.writeStringAtomic(metaPath(path),
      s"${keyCols.mkString(",")}\n$numBuckets\n$token")
    manifestCache.filterInPlace((k, _) => k._2 != path)
    baseCache.filterInPlace((k, _) => k._2 != path)
  }

  /** Garbage-collect data files under `path` that the CURRENT manifest
    * no longer references (replaced by a [[writeDelta]]) and that are
    * older than `graceMs` — the grace spares readers still draining a
    * plan captured against the previous manifest. Files referenced by
    * absolute entries living under OTHER roots are out of scope (their
    * root's own sweep owns them). Returns the deleted count. */
  def sweepUnreferenced(path: String, graceMs: Long): Long = {
    if (!Fs.exists(manifestPath(path))) return 0L
    // compare fully-qualified forms: listStatus returns scheme-qualified
    // paths while manifest entries resolve scheme-less
    def qual(p: String): String =
      Fs.fs(p).makeQualified(new org.apache.hadoop.fs.Path(p)).toString
    val referenced = Fs.readString(manifestPath(path)).split("\n")
      .iterator.filter(_.nonEmpty)
      .map { line => qual(resolveEntry(path, line.substring(line.indexOf('\t') + 1))) }
      .toSet
    val now = System.currentTimeMillis()
    def sweep(dir: String): Long =
      Fs.list(dir).map { st =>
        val n = st.getPath.getName
        if (st.isDirectory) sweep(st.getPath.toString)
        else if (!n.startsWith("_") && !n.startsWith(".") &&
            !referenced.contains(qual(st.getPath.toString)) &&
            now - st.getModificationTime > graceMs) {
          Fs.deleteRecursive(st.getPath.toString); 1L
        } else 0L
      }.sum
    sweep(path)
  }
}
