package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.fs.Fs
import graft.sources.PrunedIndex

/** Versioned wrapper around the persisted near-dup index
  * ([[Dedup.writeNearDupIndex]] family) — the [[AnnIndexStore]] idiom
  * applied to the dedup layout: prefix index + sets index + frozen df
  * head land together under ONE version dir (`v<N>/`), committed by a
  * `_SUCCESS` marker and published with a single NIO-atomic `_CURRENT`
  * pointer swap. This closes the in-place form's only crash window (a
  * torn view between the two layout swaps,
  * [[Dedup.appendNearDupIndexDelta]]'s documented replay case): readers
  * of a store NEVER see a half-landed batch — the pointer flips only
  * after both layouts, the head and the meta are durable.
  *
  * Write I/O stays delta-bounded: [[appendDelta]] lands only the
  * touched buckets' files under the new version and stitches the
  * previous version's untouched files by absolute path
  * ([[graft.sources.PrunedIndex.writeDelta]]'s cross-root form) — so
  * retention is [[compact]] (fold the current version self-contained)
  * plus [[vacuum]] (reference-aware drop of old version dirs, sparing
  * any dir a retained manifest still points into).
  *
  * Mirrors the reference's versioned-snapshot storage discipline
  * (SURVEY.md §2.8's curated store) for the dedup index. */
object NearDupIndexStore {

  private def ptr(root: String): String = Fs.child(root, "_CURRENT")
  private def vPath(root: String, v: Long): String = Fs.child(root, s"v$v")

  /** Committed versions, ascending (`_SUCCESS`-gated — an in-flight
    * build is invisible). */
  def versions(root: String): Seq[Long] =
    if (!Fs.exists(root)) Seq.empty
    else Fs.list(root).map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.drop(1).nonEmpty &&
          s.drop(1).forall(_.isDigit) &&
          Fs.exists(Fs.child(Fs.child(root, s), "_SUCCESS")) => s.drop(1).toLong }
      .sorted

  def currentVersion(root: String): Option[Long] =
    if (Fs.exists(ptr(root))) Some(Fs.readString(ptr(root)).trim.drop(1).toLong)
    else None

  def currentPath(root: String): Option[String] =
    currentVersion(root).map(v => vPath(root, v))

  private def current(root: String): String =
    currentPath(root).getOrElse(
      throw new IllegalStateException(s"no committed version under $root"))

  private def commit(root: String, v: Long): Long = {
    Fs.writeStringAtomic(Fs.child(vPath(root, v), "_SUCCESS"), "")
    Fs.writeStringAtomic(ptr(root), s"v$v")
    v
  }

  private def nextVersion(root: String): Long =
    math.max(versions(root).lastOption.getOrElse(0L),
      currentVersion(root).getOrElse(0L)) + 1

  /** The winnowing family's components live under a `win/` subdir of
    * each version (their `postings`/`dfcensus` names clash with the
    * containment components' at the version root). */
  private def winDir(versionDir: String): String = Fs.child(versionDir, "win")

  /** The fuzzy-key family's components under `fuzzy/` — same
    * namespacing discipline. */
  private def fuzzyDir(versionDir: String): String = Fs.child(versionDir, "fuzzy")

  /** Build the store's first (or next, self-contained) version from a
    * corpus. Returns the committed version number.
    *
    * `withContainment` extends the version into the UNIFIED dedup
    * index (full postings + exact df census —
    * [[Dedup.writeContainmentIndex]]) so [[containmentPairsForDelta]]
    * probes work; `winnowing = Some((k, w))` additionally lands the
    * winnowing fingerprint index under `win/` for
    * [[winnowingPairsForDelta]]; `minhash = Some((numHashes, bands))`
    * lands the banded MinHash component (derived from the version's
    * sets — no second text pass) for [[minhashPairsForDelta]]. All
    * components of a version commit under the SAME `_SUCCESS` +
    * `_CURRENT` swap — one store, one commit, one retention story for
    * every dedup family.
    *
    * `jaccard = false` skips the near-dup (prefix/sets/dfhead) family
    * entirely — for winnowing- or fuzzy-only stores (e.g. a
    * [[graft.streaming.WinnowingStream]] that never probes Jaccard),
    * whose appends would otherwise pay the unused family's per-batch
    * shingle + write cost forever. Containment and minhash DERIVE from
    * the sets component, so they require `jaccard = true`. */
  def build(spark: SparkSession, docs: DataFrame,
            idCol: String, textCol: String, root: String,
            n: Int = 3, threshold: Double = 0.8,
            dfHeadSize: Int = 100000, numBuckets: Int = 64,
            withContainment: Boolean = false,
            winnowing: Option[(Int, Int)] = None,
            minhash: Option[(Int, Int)] = None,
            fuzzyKey: Option[(Int, Int)] = None,
            jaccard: Boolean = true): Long = {
    require(jaccard || (!withContainment && minhash.isEmpty),
      "containment and minhash families derive from the sets component — build them with jaccard = true")
    require(jaccard || winnowing.nonEmpty || fuzzyKey.nonEmpty,
      "a store needs at least one family")
    val v = nextVersion(root)
    val dir = vPath(root, v)
    // family builds are independent (distinct component subdirs of one
    // version) EXCEPT minhash, which derives from this version's sets —
    // it stays sequenced after the jaccard/containment write inside its
    // task; overlapping the rest cuts the commit wall to ~max of the
    // family walls (guide §2.6). The single _SUCCESS + _CURRENT swap
    // stays last, so the one-commit-for-all-families contract holds.
    val tasks = Seq.newBuilder[() => Unit]
    if (withContainment || jaccard) tasks += { () =>
      if (withContainment)
        Dedup.writeContainmentIndex(spark, docs, idCol, textCol, dir,
          n, threshold, dfHeadSize, numBuckets)
      else
        Dedup.writeNearDupIndex(spark, docs, idCol, textCol, dir,
          n, threshold, dfHeadSize, numBuckets)
      minhash.foreach { case (numHashes, bands) =>
        Dedup.writeMinHashIndex(spark, dir, numHashes, bands, numBuckets)
      }
    }
    winnowing.foreach { case (k, w) =>
      tasks += (() =>
        Dedup.writeWinnowingIndex(spark, docs, idCol, textCol, winDir(dir),
          k, w, numBuckets))
    }
    fuzzyKey.foreach { case (keyLen, maxDist) =>
      tasks += (() =>
        Dedup.writeFuzzyKeyIndex(spark, docs, idCol, textCol, fuzzyDir(dir),
          keyLen, maxDist, numBuckets))
    }
    graft.util.Par.runUnit(tasks.result())
    commit(root, v)
  }

  /** Near-dup pairs of `delta` against the CURRENT version ∪ `delta` —
    * [[Dedup.jaccardDeltaPairsIndexed]] over the committed view;
    * order-independent with [[appendDelta]] (probe before or after
    * absorbing the same batch gives the same answer). Release the
    * delta's shingle cache with [[releaseProbeCache]]. */
  def pairsForDelta(spark: SparkSession, root: String, delta: DataFrame,
                    idCol: String, textCol: String): DataFrame =
    Dedup.jaccardDeltaPairsIndexed(spark, current(root), delta, idCol, textCol)

  /** Containment pairs of `delta` against the CURRENT version ∪
    * `delta` — [[Dedup.containmentDeltaPairsIndexed]] over the
    * committed view (requires a `withContainment = true` build). */
  def containmentPairsForDelta(spark: SparkSession, root: String,
                               delta: DataFrame, idCol: String,
                               textCol: String,
                               maxDf: Int = Int.MaxValue,
                               dfHeadSize: Int = 100000): DataFrame =
    Dedup.containmentDeltaPairsIndexed(spark, current(root), delta,
      idCol, textCol, maxDf, dfHeadSize)

  /** Winnowing near-copy pairs of `delta` against the CURRENT version
    * ∪ `delta` — [[Dedup.winnowingDeltaPairsIndexed]] over the
    * committed view (requires a `winnowing = Some(...)` build). */
  def winnowingPairsForDelta(spark: SparkSession, root: String,
                             delta: DataFrame, idCol: String,
                             textCol: String, minShared: Int = 3,
                             maxDf: Int = Int.MaxValue): DataFrame =
    Dedup.winnowingDeltaPairsIndexed(spark, winDir(current(root)), delta,
      idCol, textCol, minShared, maxDf)

  /** MinHash-LSH near-dup pairs of `delta` against the CURRENT version
    * ∪ `delta` — [[Dedup.minHashDeltaPairsIndexed]] over the committed
    * view (requires a `minhash = Some(...)` build). */
  def minhashPairsForDelta(spark: SparkSession, root: String,
                           delta: DataFrame, idCol: String,
                           textCol: String,
                           threshold: Double = 0.8): DataFrame =
    Dedup.minHashDeltaPairsIndexed(spark, current(root), delta,
      idCol, textCol, threshold)

  /** Fuzzy-key Hamming pairs of `delta` against the CURRENT version ∪
    * `delta` — [[Dedup.fuzzyKeyDeltaPairsIndexed]] over the committed
    * view (requires a `fuzzyKey = Some(...)` build). */
  def fuzzyPairsForDelta(spark: SparkSession, root: String,
                         delta: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    Dedup.fuzzyKeyDeltaPairsIndexed(spark, fuzzyDir(current(root)), delta,
      idCol, textCol)

  /** Absorb a batch as a NEW committed version (REPLACE semantics for
    * re-uploaded ids; delta-bounded write I/O — untouched buckets
    * stitch the previous version's files). Every family present in the
    * current version is advanced — near-dup always, containment and
    * winnowing when their components exist — and the new version
    * commits atomically for all of them at once, so no reader can see
    * one family ahead of another. The previous version stays intact
    * and readable until [[vacuum]]. */
  def appendDelta(spark: SparkSession, root: String, delta: DataFrame,
                  idCol: String, textCol: String): Long = {
    val cur = current(root)
    val v = nextVersion(root)
    val dir = vPath(root, v)
    val hasJaccard = Fs.exists(Fs.child(cur, "prefix"))
    val hasContainment = Fs.exists(Fs.child(cur, "postings"))
    val hasBands = Fs.exists(Fs.child(cur, "bands"))
    // ONE shingling pass + ONE replaced-old read per batch, threaded
    // into every shingle-family appender (r17 advice: a
    // minhash+containment store re-shingled the delta up to 3× here)
    val pre = if (hasJaccard || hasContainment || hasBands)
      Some(Dedup.deltaProbeOf(spark, cur, delta, idCol, textCol))
    else None
    // the minhash append reads the OLD revisions from `cur`'s sets —
    // safe in any order here because every cross-root read anchors to
    // `cur`, never the half-written `dir`. That same anchoring makes
    // the four family appends fully independent (distinct component
    // subdirs, shared `pre` is a checkpointed probe) — overlap them
    // (guide §2.6); the single commit stays last.
    val tasks = Seq.newBuilder[() => Unit]
    if (hasBands)
      tasks += (() => Dedup.appendMinHashIndexDeltaInto(spark, cur, dir, delta,
        idCol, textCol, pre))
    if (hasContainment)
      tasks += (() => Dedup.appendContainmentIndexDeltaInto(spark, cur, dir, delta,
        idCol, textCol, pre))
    else if (hasJaccard)
      tasks += (() => Dedup.appendNearDupIndexDeltaInto(spark, cur, dir, delta,
        idCol, textCol, pre))
    if (Fs.exists(winDir(cur)))
      tasks += (() => Dedup.appendWinnowingIndexDeltaInto(spark, winDir(cur),
        winDir(dir), delta, idCol, textCol))
    if (Fs.exists(fuzzyDir(cur)))
      tasks += (() => Dedup.appendFuzzyKeyIndexDeltaInto(spark, fuzzyDir(cur),
        fuzzyDir(dir), delta, idCol, textCol))
    graft.util.Par.runUnit(tasks.result())
    commit(root, v)
  }

  /** Re-land the CURRENT version self-contained (every bucket's files
    * local to the new version dir — no stitched references), under the
    * SAME frozen head: probes are unchanged, only the layout folds
    * flat. The step that lets [[vacuum]] drop every older version.
    *
    * `refreeze = true` additionally re-derives the frozen df head and
    * the prefix layout from the folded sets
    * ([[Dedup.refreezeNearDupIndex]]) — the periodic maintenance for a
    * store whose df distribution has drifted across many appends. The
    * frozen order is a candidate-count heuristic, never a correctness
    * input (the prefix pigeonhole holds for ANY total order used
    * consistently by both sides), so refreezing changes probe COST,
    * not probe answers (pinned in NearDupIndexStoreSpec). Fold it into
    * the same compaction cadence that bounds the reference-chain
    * depth — both are O(index) passes, and sharing the pass means one
    * retention story. */
  def compact(spark: SparkSession, root: String,
              refreeze: Boolean = false): Long = {
    val cur = current(root)
    // bucket count from whichever component exists (a winnowing- or
    // fuzzy-only store has no prefix layout)
    val numBuckets = Seq("prefix", "sets", "postings", "win/byid",
        "fuzzy/segs")
      .map(c => Fs.child(cur, c)).find(Fs.exists)
      .map(p => PrunedIndex.meta(p)._2)
      .getOrElse(throw new IllegalStateException(
        s"no PrunedIndex component under $cur"))
    val v = nextVersion(root)
    val dir = vPath(root, v)
    import org.apache.spark.sql.functions.col
    // re-land a component flat under the new version, preserving the
    // stored key columns and schema
    def fold(comp: String, keyCols: Seq[String]): Unit = {
      val src = Fs.child(cur, comp)
      if (Fs.exists(src)) {
        val df = PrunedIndex.read(spark, src)
        PrunedIndex.write(df.select(df.columns.map(col).toIndexedSeq: _*),
          Fs.child(dir, comp), keyCols, numBuckets)
      }
    }
    val hasJaccard = Fs.exists(Fs.child(cur, "sets"))
    // refreeze re-lands the prefix layout and the frozen head itself —
    // folding/copying them here would be a wasted O(index) write
    // (r17 advice)
    if (!(refreeze && hasJaccard)) fold("prefix", Seq("shingle"))
    fold("sets", Seq("id"))
    fold("postings", Seq("shingle"))
    fold("dfcensus", Seq("shingle"))
    fold("bands", Seq("band", "bkey"))
    if (Dedup.hasCtHead(cur)) {
      val (headK, headComplete) = Dedup.readCtHeadMeta(cur)
      Dedup.writeCtHead(spark, dir, Dedup.readCtHeadRows(spark, cur),
        headK, headComplete)
    }
    if (hasJaccard && !refreeze)
      Dedup.writeFrozenHead(spark, dir, Dedup.readFrozenHead(spark, cur))
    if (Fs.exists(Dedup.nearDupMetaPath(cur)))
      Fs.writeStringAtomic(Dedup.nearDupMetaPath(dir),
        Fs.readString(Dedup.nearDupMetaPath(cur)))
    if (Fs.exists(Dedup.minHashMetaPath(cur))) {
      val (numHashes, bands) = Dedup.readMinHashMeta(cur)
      Fs.writeStringAtomic(Dedup.minHashMetaPath(dir), s"$numHashes\n$bands")
    }
    if (Fs.exists(winDir(cur))) {
      def foldWin(comp: String, keyCols: Seq[String]): Unit = {
        val df = PrunedIndex.read(spark, Fs.child(winDir(cur), comp))
        PrunedIndex.write(df.select(df.columns.map(col).toIndexedSeq: _*),
          Fs.child(winDir(dir), comp), keyCols, numBuckets)
      }
      foldWin("byid", Seq("id"))
      foldWin("postings", Seq("fp"))
      foldWin("dfcensus", Seq("fp"))
      val (k, w) = Dedup.readWinnowMeta(winDir(cur))
      Fs.writeStringAtomic(Dedup.winnowMetaPath(winDir(dir)), s"$k\n$w")
    }
    if (Fs.exists(fuzzyDir(cur))) {
      def foldFz(comp: String, keyCols: Seq[String]): Unit = {
        val df = PrunedIndex.read(spark, Fs.child(fuzzyDir(cur), comp))
        PrunedIndex.write(df.select(df.columns.map(col).toIndexedSeq: _*),
          Fs.child(fuzzyDir(dir), comp), keyCols, numBuckets)
      }
      foldFz("segs", Seq("seg_i", "seg"))
      foldFz("byid", Seq("id"))
      val (keyLen, maxDist) = Dedup.readFuzzyMeta(fuzzyDir(cur))
      Fs.writeStringAtomic(Dedup.fuzzyMetaPath(fuzzyDir(dir)), s"$keyLen\n$maxDist")
    }
    // after the folds: head + prefix re-derive from the folded sets
    // (winnowing and containment need nothing — the containment head
    // is EXACT maintained state, never stale)
    if (refreeze && hasJaccard) Dedup.refreezeNearDupIndex(spark, dir)
    commit(root, v)
  }

  /** Every PrunedIndex component a version dir can hold, as paths
    * relative to the version dir — the manifest scan set for
    * reference-aware retention. (`cthead` is not listed: it is a plain
    * parquet landed whole under every version, never stitched.) */
  private val AllComponents: Seq[String] =
    Seq("prefix", "sets", "postings", "dfcensus", "bands",
      "win/byid", "win/postings", "win/dfcensus",
      "fuzzy/segs", "fuzzy/byid")

  /** Reference-chain depth of the CURRENT version: 1 + the number of
    * OTHER version dirs its component manifests still stitch files
    * from. Manifest entries absolutize on every append (no history
    * walk), so one manifest scan sees the whole chain. A freshly built
    * or compacted version reports 1. */
  def chainDepth(root: String): Int = {
    val cur = current(root)
    // qualified prefix compare on both sides (the AnnIndexStore fix):
    // a scheme-qualified or relative caller root must still match the
    // absolutized manifest entries, or the depth under-reports and
    // maybeMaintain never compacts
    val qRoot = Fs.qualified(root)
    val referenced = AllComponents.flatMap { comp =>
      val mp = Fs.child(Fs.child(cur, comp), "_PRUNE_MANIFEST")
      if (!Fs.exists(mp)) Nil
      else Fs.readString(mp).split("\n").iterator.filter(_.nonEmpty)
        .map(l => l.substring(l.indexOf('\t') + 1))
        .filter(e => e.startsWith("/") || e.contains("://"))
        .map(Fs.qualified)
        .filter(_.startsWith(qRoot + "/"))
        .map(_.stripPrefix(qRoot + "/").takeWhile(_ != '/'))
        .toSeq
    }.toSet
    1 + (referenced - new java.io.File(cur).getName).size
  }

  /** How far the frozen df head has drifted: current doc count ÷ the
    * count the head was frozen over (recorded in the near-dup meta at
    * build/refreeze). None for stores without the Jaccard family or
    * with a legacy meta. The count reads parquet FOOTERS only (Spark's
    * metadata-only count), so the check is not an index scan. */
  def headStaleness(spark: SparkSession, root: String): Option[Double] = {
    val cur = current(root)
    if (!Fs.exists(Dedup.nearDupMetaPath(cur)) ||
        !Fs.exists(Fs.child(cur, "sets"))) None
    else Dedup.readFrozenDocs(cur).filter(_ > 0L).map { frozen =>
      PrunedIndex.read(spark, Fs.child(cur, "sets")).count().toDouble / frozen
    }
  }

  /** Self-triggering maintenance — the
    * [[AnnIndexStore.reclusterIfDrifted]] analog for the dedup store:
    * compact when the stitched reference chain exceeds `maxChainDepth`
    * versions, and fold a head refreeze into the same pass when the
    * corpus has grown `headStaleRatio`× past the frozen head's census
    * (RefreezeBench: 23 % probe-wall payoff at 2× staleness, zero
    * answer change — the head is a candidate-cost heuristic, never a
    * correctness input). Hysteresis is structural: a compaction resets
    * the chain depth to 1, and a refreeze resets the staleness
    * denominator to the current doc count, so the next call below the
    * thresholds is a no-op. Returns the new committed version when
    * maintenance ran, None when nothing crossed a threshold.
    * Single-writer contract like [[compact]]/[[vacuum]]. */
  def maybeMaintain(spark: SparkSession, root: String,
                    maxChainDepth: Int = 8,
                    headStaleRatio: Double = 1.5): Option[Long] = {
    val stale = headStaleness(spark, root).exists(_ >= headStaleRatio)
    if (stale || chainDepth(root) > maxChainDepth)
      Some(compact(spark, root, refreeze = stale))
    else None
  }

  /** Retention: drop committed versions beyond the newest `keep`
    * (always sparing the current pointer's), but NEVER a version dir
    * whose files a retained version's manifest still references
    * (delta-stitched chains — sparable only after [[compact]]). All
    * families' manifests are scanned — containment and winnowing
    * components stitch across versions exactly like prefix/sets do.
    *
    * Also sweeps ORPHANED version dirs: a crashed build/appendDelta
    * leaves an uncommitted `v<N>` (no `_SUCCESS`) that [[versions]]
    * hides and [[nextVersion]] would reuse — without this sweep its
    * stale files would never be garbage-collected (the retry writes a
    * fresh manifest that does not reference them). An orphan is only
    * swept once its newest file is older than `orphanGraceMs`, so an
    * accidentally concurrent vacuum cannot race a LIVE writer's
    * in-flight version (the single-writer contract still holds for
    * builds vs vacuum of committed versions). Returns the dropped
    * version numbers (orphans included). */
  def vacuum(root: String, keep: Int = 1,
             orphanGraceMs: Long = 3600000L): Seq[Long] = {
    val all = versions(root)
    val cur = currentVersion(root)
    val retained = (all.takeRight(math.max(keep, 1)) ++ cur.toSeq).distinct
    val refs: Set[String] = retained.flatMap { v =>
      AllComponents.flatMap { comp =>
        val mp = Fs.child(Fs.child(vPath(root, v), comp), "_PRUNE_MANIFEST")
        if (!Fs.exists(mp)) Nil
        else Fs.readString(mp).split("\n").iterator.filter(_.nonEmpty)
          .map(l => l.substring(l.indexOf('\t') + 1))
          .filter(e => e.startsWith("/") || e.contains("://"))
          // qualify (the chainDepth idiom): manifest entries carry the
          // writer's root spelling; the prefix test below must not
          // depend on the caller's
          .map(Fs.qualified).toSeq
      }
    }.toSet
    val cutoffMs = System.currentTimeMillis() - math.max(orphanGraceMs, 0L)
    def newestMtime(dir: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(p => p.toFile.lastModified()).max.orElse(0L)
      finally s.close()
    }
    val orphans =
      if (!Fs.exists(root)) Seq.empty[Long]
      else Fs.list(root).map(_.getPath.getName)
        .collect { case s if s.startsWith("v") && s.drop(1).nonEmpty &&
            s.drop(1).forall(_.isDigit) &&
            !Fs.exists(Fs.child(Fs.child(root, s), "_SUCCESS")) => s.drop(1).toLong }
        .filterNot(v => cur.contains(v))
        .filter(v => newestMtime(vPath(root, v)) <= cutoffMs)
    val dropped = all.filterNot(retained.contains) ++ orphans
    dropped.filter { v =>
      val dir = vPath(root, v)
      val qDir = Fs.qualified(dir) + "/"
      val stillReferenced = refs.exists(_.startsWith(qDir))
      if (!stillReferenced) Fs.deleteRecursive(dir)
      !stillReferenced
    }
  }

  /** Release the delta shingle cache a [[pairsForDelta]] call pinned. */
  def releaseProbeCache(root: String, delta: DataFrame,
                        idCol: String, textCol: String): Unit =
    Dedup.releaseIndexedProbeCache(current(root), delta, idCol, textCol)
}
