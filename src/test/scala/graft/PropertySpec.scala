package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.infer.TypeInference
import graft.model.{Identifiers, IngestEvent}

/** Property-based coverage promised in SURVEY.md §5: idempotence of the
  * intake/merge path, commutativity of the clean ops, upsert
  * convergence — plus the pure parsing/inference lattice. Pure
  * properties run the full default 100 cases; Spark-bound ones run a
  * reduced case count (each case is a real local job). */
class PurePropertySpec extends Properties("graft.pure") {

  property("sanitize is idempotent and yields a safe SQL identifier") =
    forAll { (s: String) =>
      val once = Identifiers.sanitize(s)
      Identifiers.sanitize(once) == once &&
        once.nonEmpty && !once.head.isDigit &&
        once.forall(c => c.isLetterOrDigit && c < 128 || c == '_')
    }

  property("quote doubles every embedded quote char") =
    forAll { (s: String) =>
      val q = Identifiers.quote(s)
      q.head == '`' && q.last == '`' &&
        q.substring(1, q.length - 1) == s.replace("`", "``")
    }

  private val tsFolder: Gen[String] = for {
    y <- Gen.choose(2000, 2099); mo <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); se <- Gen.choose(0, 59)
  } yield f"$y%04d$mo%02d$d%02d_$h%02d$mi%02d$se%02d"

  property("versionOf preserves snapshot-folder lexical order (the gate's total order)") =
    forAll(tsFolder, tsFolder) { (a, b) =>
      (a.compareTo(b).sign) == IngestEvent.versionOf(a).compareTo(IngestEvent.versionOf(b)).sign
    }

  private val baseName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("tableOf strips one extension and any folder prefix") =
    forAll(baseName, baseName, Gen.oneOf("csv", "parquet", "json")) { (dir, base, ext) =>
      IngestEvent.tableOf(s"$dir/$base.$ext") == base &&
        IngestEvent.tableOf(s"$base.$ext") == base
    }

  property("reference inference lattice: digits→LONG else parseable→DOUBLE else VARCHAR") =
    forAll { (s: String) =>
      import org.apache.spark.sql.types._
      val t = TypeInference.referenceMode(Seq("c"), Seq(s)).head.dataType
      val isDigits = s.nonEmpty && s.forall(_.isDigit)
      val isDouble = try { s.trim.nonEmpty && { s.trim.toDouble; true } }
                     catch { case _: NumberFormatException => false }
      if (isDigits) t == LongType
      else if (isDouble) t == DoubleType
      else t == StringType
    }

  // FIFO queue: per-group delivery order == send order, for any
  // interleaving of groups (the per-table serialization the reference
  // gets from MessageGroupId). File IO per case → reduced count.
  private val sends: Gen[List[(String, Int)]] =
    Gen.listOfN(12, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 999)))

  property("FIFO queue: per-group receive order equals send order") = Prop.forAllNoShrink(sends) { xs =>
    val root = java.nio.file.Files.createTempDirectory("graft_prop_q").toString
    val q = new graft.sources.FifoQueue(root)
    xs.zipWithIndex.foreach { case ((g, body), i) => q.send(g, s"id$i", s"$g:$body:$i") }
    Seq("a", "b", "c").forall { g =>
      val got = Iterator.continually(q.receive(g)).takeWhile(_.isDefined)
        .map { m => q.ack(m.get); m.get.body }.toList
      got == xs.zipWithIndex.collect { case ((`g`, body), i) => s"$g:$body:$i" }
    }
  }

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(60)
}

/** Crash-replay property over the FULL intake chain — FifoQueue
  * (at-least-once redelivery) → version gate (Watermarks, strict `>`) →
  * clean (dropNull + distinct) → ParquetMergeSink.merge (idempotent
  * replay guard + atomic pointer swap) → watermark advance. A seeded
  * schedule kills the consumer at arbitrary points between the chain's
  * durable steps:
  *
  *   - point 0: after receive, before any work (pure redelivery)
  *   - point 1: after the MERGE commits, before the watermark advances
  *     (the r11 finding-#1 window: store ahead of tracker — the replay
  *     passes the version gate and must be absorbed by the merge's
  *     `alreadyApplied` guard)
  *   - point 2: after the watermark advances, before the ack (tracker
  *     ahead of queue — the redelivery must be absorbed by the gate)
  *
  * plus a deliberate STALE REPLAY (the oldest version re-sent under a
  * fresh dedup id after the drain). The property: whatever the crash
  * schedule, the curated store and watermark converge to the no-crash
  * result. (The pointer-swap-mid-merge window itself is atomic-rename
  * + table-lock territory, pinned by SinksSpec's concurrency tests.) */
class CrashReplayPropertySpec extends Properties("graft.crashreplay") {
  private lazy val spark = GraftSpark.spark

  import graft.model.TableVersion
  import graft.operators.Relational
  import graft.sinks.ParquetMergeSink

  private final class InjectedCrash extends RuntimeException("injected crash")

  // 4 versioned batches; unique keys per batch (last write wins within
  // a send), Option values so the clean step genuinely drops rows
  private val batchGen: Gen[List[(Int, Option[Int])]] =
    Gen.listOfN(6, Gen.zip(Gen.choose(0, 5), Gen.option(Gen.choose(0, 99))))
      .map(_.groupBy(_._1).map(_._2.last).toList)
  private val batchesGen: Gen[List[List[(Int, Option[Int])]]] =
    Gen.listOfN(4, batchGen)
  // crash points consumed one per attempt; >= 3 = survive this attempt.
  // Finite schedule ⇒ eventually crash-free ⇒ the drain terminates.
  private val scheduleGen: Gen[List[Int]] = Gen.listOfN(10, Gen.choose(0, 8))

  property("crashed-and-replayed consumer converges to the no-crash store") =
    Prop.forAllNoShrink(batchesGen, scheduleGen) { (batches, schedule) =>
      import spark.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_crash").toString
      val warehouse = s"$root/warehouse"
      val tracker = new graft.tracker.Watermarks(s"$root/watermarks")
      var now = 0L
      val q = new graft.sources.FifoQueue(s"$root/queue",
        visibilityTimeoutMs = 1000L, clock = () => now)
      def dfFor(v: Int) = {
        import org.apache.spark.sql.Row
        import org.apache.spark.sql.types._
        import scala.jdk.CollectionConverters._
        val schema = StructType(Seq(
          StructField("k", IntegerType, nullable = false),
          StructField("v", IntegerType, nullable = true)))
        spark.createDataFrame(
          batches(v - 1).map { case (k, opt) =>
            Row(k, opt.map(Integer.valueOf).orNull) }.asJava, schema)
      }

      batches.indices.foreach { i => q.send("t", s"t@${i + 1}", s"${i + 1}") }

      val crashes = schedule.iterator
      def consumeAll(): Unit = {
        var iters = 0
        while (q.depth("t") > 0 && iters < 200) {
          iters += 1
          q.receive("t") match {
            case None => now += 1001 // blocked on a dead consumer's lease
            case Some(msg) =>
              val point = if (crashes.hasNext) crashes.next() else 99
              try {
                if (point == 0) throw new InjectedCrash
                val tv = TableVersion("t", msg.body.toLong)
                if (tracker.shouldProcess(tv)) {
                  val clean = Relational.distinctRows(
                    Relational.dropNullRows(dfFor(msg.body.toInt)))
                  ParquetMergeSink.merge(spark, warehouse, "t", clean, Seq("k"), tv.version)
                  if (point == 1) throw new InjectedCrash
                  tracker.advance(tv)
                }
                if (point == 2) throw new InjectedCrash
                q.ack(msg)
              } catch { case _: InjectedCrash => () } // death: no ack
          }
        }
        assert(q.depth("t") == 0, s"queue did not drain in $iters iterations")
      }
      consumeAll()
      // stale replay: oldest version re-sent under a fresh dedup id —
      // the version gate must absorb it without touching the store
      q.send("t", s"replay@1@${schedule.hashCode}", "1")
      consumeAll()

      val expected = batches.foldLeft(Map.empty[Int, Int]) { (acc, b) =>
        acc ++ b.collect { case (k, Some(v)) => k -> v }
      }.toSeq.map { case (k, v) => s"$k|$v" }.sorted
      val got = ParquetMergeSink.readCurrent(spark, warehouse, "t")
        .map(_.collect().map(_.mkString("|")).sorted.toSeq).getOrElse(Seq.empty)
      val wm = tracker.read().getOrElse("t", 0L)
      got == expected && wm == batches.size.toLong
    }

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)
}

/** Spark-bound properties — each case runs local jobs, so the case
  * count is small; the data shapes still vary enough to hit the
  * null/duplicate/key-collision corners. */
class SparkPropertySpec extends Properties("graft.spark") {
  private lazy val spark = GraftSpark.spark

  import graft.operators.{Relational, Sampling}

  private def rowsDf(rows: List[(Int, Option[Int], String)]) = {
    import spark.implicits._
    rows.toDF("k", "v", "s")
  }

  private def bag(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  private val rowGen: Gen[(Int, Option[Int], String)] =
    Gen.zip(Gen.choose(0, 6), Gen.option(Gen.choose(0, 3)), Gen.oneOf("x", "y", ""))

  property("clean ops commute: dropNull∘distinct == distinct∘dropNull (as multisets)") =
    forAll(Gen.listOfN(20, rowGen)) { rows =>
      val df = rowsDf(rows)
      bag(Relational.distinctRows(Relational.dropNullRows(df))) ==
        bag(Relational.dropNullRows(Relational.distinctRows(df)))
    }

  // Sequential keyed merges converge to driver-side last-writer-wins —
  // the D2 upsert semantics (and replaying the last delta is a no-op).
  private val batchGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(8, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 99)))
      .map(_.groupBy(_._1).map(_._2.last).toList) // unique keys per batch

  property("mergeUpsert converges to last-writer-wins and is idempotent per delta") =
    forAll(batchGen, batchGen, batchGen) { (b0, b1, b2) =>
      import spark.implicits._
      def df(b: List[(Int, Int)]) = b.toDF("k", "v")
      val m1 = Relational.mergeUpsert(df(b0), df(b1), Seq("k"))
      val m2 = Relational.mergeUpsert(m1, df(b2), Seq("k"))
      val expected = (b0.toMap ++ b1.toMap ++ b2.toMap).toList.map { case (k, v) => s"$k|$v" }.sorted
      val again = Relational.mergeUpsert(m2, df(b2), Seq("k"))
      bag(m2) == expected && bag(again) == expected
    }

  property("hashSample membership is partitioning-independent") =
    forAll(Gen.choose(1, 8), Gen.choose(0.1, 0.9)) { (parts, frac) =>
      import spark.implicits._
      val df = (0 until 200).toDF("k")
      bag(Sampling.hashSample(df.repartition(parts), "k", frac)) ==
        bag(Sampling.hashSample(df.coalesce(1), "k", frac))
    }

  // cdfBins: monotone in score, in [1, nBins], tie-coherent (equal
  // scores share a bin), and the top score always lands in bin nBins.
  property("cdfBins is monotone, ranged, and tie-coherent") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L)), Gen.choose(1, 12)) {
      (scores, nBins) =>
        import spark.implicits._
        val df = scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("id", "score")
        val out = Sampling.cdfBins(df, "id", "score", nBins)
          .select($"score", $"bin").as[(Long, Long)].collect().toSeq
        val byScore = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val sortedPairs = out.distinct.sortBy(_._1)
        byScore.values.forall(_.size == 1) &&
          out.forall { case (_, b) => b >= 1 && b <= nBins } &&
          sortedPairs.zip(sortedPairs.drop(1)).forall { case ((_, b1), (_, b2)) => b1 <= b2 } &&
          sortedPairs.last._2 == nBins
    }

  // exactQuantilesPpm: each quantile is an element of its group, the
  // quantile values are monotone in q, p100 is the max, and the
  // nearest-rank definition matches a driver-side sort.
  property("exactQuantilesPpm matches driver-side nearest-rank and is monotone in q") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("g1", "g2"), Gen.choose(-50L, 50L)))) {
      rows =>
        import spark.implicits._
        val df = rows.toDF("g", "v")
        val qs = Seq("p25" -> 250000L, "p50" -> 500000L, "p75" -> 750000L, "p100" -> 1000000L)
        val out = Sampling.exactQuantilesPpm(df, "g", "v", qs)
          .as[(String, Long, Long, Long, Long)].collect()
          .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
        rows.groupBy(_._1).forall { case (g, grp) =>
          val sorted = grp.map(_._2).sorted
          val expect = Seq(250000L, 500000L, 750000L, 1000000L).map { q =>
            val rank = ((sorted.size * q + 999999L) / 1000000L).toInt
            sorted(rank - 1)
          }
          out(g) == expect &&
            out(g).zip(out(g).drop(1)).forall { case (a, b) => a <= b } &&
            out(g).last == sorted.last
        }
    }

  // thresholdSweep: n_kept/w_kept are non-increasing in the threshold,
  // totals are constant, and each row matches a driver-side count.
  property("thresholdSweep matches driver-side counts and is monotone in the cutoff") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(-30L, 30L), Gen.choose(1L, 9L)))) {
      rows =>
        import org.apache.spark.sql.functions.col
        import spark.implicits._
        val df = rows.toDF("s", "w")
        val thrs = Seq(-40L, -10L, 0L, 10L, 40L)
        val out = Sampling.thresholdSweep(df, "s", col("w"), thrs)
          .as[(Long, Long, Long, Long, Long, Long)].collect()
          .sortBy(_._1).toSeq
        val ok = out.forall { case (t, nk, nt, kp, wk, wt) =>
          nk == rows.count(_._1 >= t) &&
            wk == rows.filter(_._1 >= t).map(_._2).sum &&
            nt == rows.size && wt == rows.map(_._2).sum &&
            kp == nk * 1000000L / nt
        }
        val mono = out.zip(out.drop(1)).forall { case ((_, nk1, _, _, wk1, _), (_, nk2, _, _, wk2, _)) =>
          nk1 >= nk2 && wk1 >= wk2
        }
        ok && mono
    }

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)
}

/** Concurrent-reader safety of the versioned store (VERDICT r13 #7):
  * with merges, time-travel reads, and vacuums interleaving freely,
  * every read that RETURNS must return exactly one committed version's
  * full row set — never a half-written or half-deleted snapshot. A
  * read that loses the race to vacuum may fail whole (it resolved a
  * version whose files vanished mid-scan); that failure mode is the
  * documented contract and is allowed here, silent partial data is
  * not. Two store mechanisms make this hold: [[graft.sinks
  * .ParquetMergeSink.versions]] lists only `_SUCCESS`-committed dirs
  * (readers can't resolve an in-flight write), and `vacuum` renames a
  * version out of its visible name atomically before deleting files
  * (readers can't list a half-deleted file set). */
class VacuumReaderPropertySpec extends Properties("graft.vacuumreader") {
  private lazy val spark = GraftSpark.spark

  import graft.sinks.ParquetMergeSink

  // per-version incoming batches: non-empty key subsets; the merged
  // value is the writing version, so every committed snapshot is
  // distinguishable and any row mix across versions is detectable
  private val subsetGen: Gen[List[Int]] =
    Gen.someOf(0 to 4).map(_.toList.sorted).suchThat(_.nonEmpty)

  property("interleaved readVersion/merge/vacuum reads are all-or-nothing") =
    Prop.forAllNoShrink(Gen.listOfN(6, subsetGen), Gen.choose(0L, Long.MaxValue)) {
      (subsets, seed) =>
        import spark.implicits._
        val warehouse = java.nio.file.Files.createTempDirectory("graft_vac").toString
        val nV = subsets.size
        // driver-side replay of the keyed-upsert semantics
        val expected: Map[Long, Set[(Int, Long)]] =
          (1 to nV).scanLeft(Map.empty[Int, Long]) { (acc, v) =>
            acc ++ subsets(v - 1).map(_ -> v.toLong)
          }.zipWithIndex.collect { case (m, v) if v > 0 => v.toLong -> m.toSet }.toMap

        val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        @volatile var writerDone = false

        val writer = new Thread(() => {
          (1 to nV).foreach { v =>
            val df = subsets(v - 1).map(k => (k, v.toLong)).toDF("k", "v")
            ParquetMergeSink.merge(spark, warehouse, "t", df, Seq("k"), v.toLong)
          }
          writerDone = true
        })
        val vacuumer = new Thread(() => {
          // must never throw: the `_CURRENT` swap is an atomic rename
          // (Fs.writeStringAtomic), so vacuum's unlocked pointer read
          // cannot catch the pointer mid-replacement
          while (!writerDone)
            try ParquetMergeSink.vacuum(warehouse, "t", keep = 2)
            catch { case e: Throwable => bad.add(s"vacuum threw: $e") }
        })
        val rng = new scala.util.Random(seed)
        val reader = new Thread(() => {
          while (!writerDone) {
            ParquetMergeSink.versions(warehouse, "t").lastOption.foreach { maxV =>
              val asOf = 1L + rng.nextLong(maxV)
              try {
                ParquetMergeSink.readVersion(spark, warehouse, "t", asOf).foreach { df =>
                  val got = df.as[(Int, Long)].collect().toSet
                  val matches = (1L to asOf).exists(v => expected(v) == got)
                  if (!matches) bad.add(s"asOf=$asOf got=$got")
                }
              } catch {
                // losing the race to vacuum fails WHOLE — allowed
                case _: Throwable => ()
              }
            }
          }
        })
        Seq(writer, vacuumer, reader).foreach(_.start())
        Seq(writer, vacuumer, reader).foreach(_.join(120000))

        // quiescent checks: the current snapshot is the full merge
        // result, and the keep=2 window retains the final version
        ParquetMergeSink.vacuum(warehouse, "t", keep = 2)
        val finalGot = ParquetMergeSink.readCurrent(spark, warehouse, "t")
          .map(_.as[(Int, Long)].collect().toSet).getOrElse(Set.empty)
        val retained = ParquetMergeSink.versions(warehouse, "t")
        Prop(bad.isEmpty && finalGot == expected(nV.toLong) &&
            retained.contains(nV.toLong) && retained.size <= 2) :| {
          s"bad=${bad.toArray.mkString("; ")} final=$finalGot retained=$retained"
        }
    }

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(4)
}
