package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.CommitTable

/** ScalaCheck properties for the commit log's round-15 write-side
  * contracts, vs driver-side models — the TemporalJoinsProps discipline
  * applied to storage semantics:
  *
  *  - idempotent transactional appends ([[CommitTable.appendIdempotent]]):
  *    over ANY interleaving of fresh and replayed `(appId, txnV)` markers,
  *    exactly the model-fresh batches land — content, version count, and
  *    per-app markers all match the driver fold;
  *  - time-based retention ([[CommitTable.vacuumRetain]]): after a vacuum
  *    at an arbitrary horizon, a version reads iff it is in-horizon or is
  *    the head; kept content is bit-identical to what was committed.
  */
object CommitLogProps extends Properties("CommitLog") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private def spark = TestSpark.spark

  // (app, txnV) streams with deliberately tiny ranges so replays, stale
  // late arrivals, and cross-app interleavings all occur
  private val genOps: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(0, 8)
    ops <- Gen.listOfN(n, for {
      app <- Gen.oneOf("app_a", "app_b")
      v <- Gen.choose(0L, 4L)
    } yield (app, v))
  } yield ops

  property("appendIdempotent == driver model over random (app, txnV) interleavings") =
    Prop.forAll(genOps) { ops =>
      val s = spark
      import s.implicits._
      val dir = Files.createTempDirectory("graft-txnprop").toString
      // checkpointEvery = 3 so marker resolution crosses checkpoint entries
      val t = new CommitTable(s, dir, "k", checkpointEvery = 3)
      val model = scala.collection.mutable.Map.empty[String, Long]
      var landed = 0
      var expect = Set.empty[Long]
      val perCall = ops.zipWithIndex.map { case ((app, v), i) =>
        val rows = Seq(i * 10L + 1, i * 10L + 2)
        val got = t.appendIdempotent(rows.map(k => (k, s"r$k")).toDF("k", "v"), app, v)
        val fresh = model.get(app).forall(_ < v)
        if (fresh) { model(app) = v; landed += 1; expect ++= rows }
        got.isDefined == fresh
      }
      val contentOk =
        if (landed == 0) t.latestVersion().isEmpty
        else t.read().collect().map(_.getLong(0)).toSet == expect &&
          t.versions().length == landed
      val markersOk = Seq("app_a", "app_b", "app_never")
        .forall(a => t.txnVersion(a) == model.get(a))
      perCall.forall(identity) && contentOk && markersOk
    }

  property("vacuumRetain: a version reads iff in-horizon or head; kept content intact") =
    Prop.forAll(Gen.choose(1, 5), Gen.choose(0L, 8000L)) { (nv, horizon) =>
      val s = spark
      import s.implicits._
      val dir = Files.createTempDirectory("graft-retainprop").toString
      val t = new CommitTable(s, dir, "k")
      // overwrites: every version owns its directory, so an expired
      // non-head version is exactly a reclaimed one (no carried files)
      (0 until nv).foreach { i =>
        t.overwrite(Seq((i.toLong, s"v$i")).toDF("k", "v"),
          tsMillis = Some(1000L * (i + 1)))
      }
      val now = 10000L
      t.vacuumRetain(horizon, now)
      val cutoff = now - horizon
      (0 until nv).forall { i =>
        val kept = 1000L * (i + 1) >= cutoff || i == nv - 1
        if (kept)
          t.asOf(i.toLong).collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
            Seq((i.toLong, s"v$i"))
        else scala.util.Try(t.asOf(i.toLong).collect()).isFailure
      }
    }

  // DV deletes vs a driver-side set model: over ANY sequence of range /
  // predicate DV deletes (overlapping, repeated, empty) interleaved with
  // an OPTIMIZE and a random-threshold PURGE (r18), every read — head,
  // asOf of every version, prunedRead — equals the model's surviving
  // keys, and data files never rewrite outside OPTIMIZE/purge. The
  // table runs checkpointEvery = 3, so longer delete runs cross the
  // sidecar's AUTO-FOLD boundary (a chain of 3 links folds to a
  // snapshot inside the history) and time travel resolves through
  // pre-fold chains.
  private val genDvOps: Gen[List[(Int, Long, Long)]] = for {
    n <- Gen.choose(0, 8)
    ops <- Gen.listOfN(n, for {
      // 0 = range DV, 1 = predicate DV, 2 = optimize, 3 = purge
      kind <- Gen.oneOf(0, 0, 0, 1, 2, 3)
      lo <- Gen.choose(1L, 30L)
      w <- Gen.choose(0L, 10L)
    } yield (kind, lo, lo + w))
  } yield ops

  property("deletion vectors match the set model at every version; files rewrite only on OPTIMIZE") =
    Prop.forAll(genDvOps) { ops =>
      val sp = spark
      import sp.implicits._
      val dir = Files.createTempDirectory("graft-prop-dv").toString
      // checkpointEvery = 3 doubles as the sidecar auto-fold bound: ≥4
      // consecutive DV deletes exercise the fold inside the history
      val t = new CommitTable(sp, dir, "k", checkpointEvery = 3)
      val all = (1L to 30L).map(i => (i, i * 7L))
      t.overwrite(all.toDF("k", "v").repartition(3))
      var live = all.map(_._1).toSet
      var filesAtLastRewrite = t.read().inputFiles.toSet.filterNot(_.contains("/_dv/"))
      val perVersion = scala.collection.mutable.Map(0L -> live)
      var ok = true
      ops.foreach { case (kind, lo, hi) =>
        val before = t.latestVersion().get
        kind match {
          case 0 =>
            t.deleteRangeDV(lo, hi)
            live = live.filterNot(k => k >= lo && k <= hi)
          case 1 =>
            t.deleteWhereDV(s"v >= ${lo * 7} AND v <= ${hi * 7}")
            live = live.filterNot(k => k * 7 >= lo * 7 && k * 7 <= hi * 7)
          case 2 =>
            t.compactClustered("k", 2)
            live = live // content-preserving
          case 3 =>
            // content-preserving like OPTIMIZE, but rewrites only the
            // files whose deleted fraction crosses the random threshold
            t.purgeDv((lo % 11L) / 10.0)
            live = live
        }
        val after = t.latestVersion().get
        perVersion(after) = live
        val files = t.read().inputFiles.toSet.filterNot(_.contains("/_dv/"))
        if (kind == 2 || kind == 3) filesAtLastRewrite = files
        else if (after != before) // a committed DV delete must not touch data files
          ok &&= files == filesAtLastRewrite
        ok &&= t.read().select("k").collect().map(_.getLong(0)).toSet == live
        ok &&= t.prunedRead(1L, 30L).select("k").collect().map(_.getLong(0)).toSet == live
      }
      // every recorded version still reads its own snapshot (time travel
      // through arbitrary DV histories)
      perVersion.foreach { case (v, expect) =>
        ok &&= t.asOf(v).select("k").collect().map(_.getLong(0)).toSet == expect
      }
      ok
    }

  // Column mapping vs a driver-side surface model: over ANY sequence of
  // renames, drops, appends (with fresh columns), and compactions, the
  // head's columns equal the model surface, every value projects through
  // correctly (spot-checked via a stable key aggregate), and every
  // recorded version still reads under ITS OWN historical names.
  private val genCmapOps: Gen[List[Int]] =
    Gen.choose(0, 7).flatMap(n => Gen.listOfN(n, Gen.oneOf(0, 1, 2, 3)))

  property("column mapping matches the surface model at every version over random histories") =
    Prop.forAll(genCmapOps) { ops =>
      val sp = spark
      import sp.implicits._
      val dir = Files.createTempDirectory("graft-prop-cmap").toString
      val t = new CommitTable(sp, dir, "k")
      t.overwrite((1L to 10L).map(i => (i, i * 3L)).toDF("k", "c0"))
      // model: ordered logical surface + retired physicals + next ids
      var surface = Vector("k", "c0")
      var renamed = 0
      var added = 0
      var nextKey = 11L
      val perVersion = scala.collection.mutable.Map(0L -> surface)
      var ok = true
      ops.foreach { op =>
        op match {
          case 0 => // rename a non-key column if any
            surface.find(_ != "k") match {
              case Some(c) =>
                renamed += 1
                val nn = s"r$renamed"
                t.renameColumn(c, nn)
                surface = surface.map(x => if (x == c) nn else x)
              case None => ()
            }
          case 1 => // drop a non-key column if any
            surface.find(_ != "k") match {
              case Some(c) =>
                t.dropColumn(c)
                surface = surface.filterNot(_ == c)
              case None => ()
            }
          case 2 => // append a row batch carrying a FRESH column
            added += 1
            val nn = s"a$added"
            val batch = Seq((nextKey, 99L)).toDF("k", nn)
            nextKey += 1
            t.append(batch)
            surface = surface :+ nn
          case 3 => t.compact(1)
        }
        perVersion(t.latestVersion().get) = surface
        ok &&= t.read().columns.toSeq == surface.toSeq
      }
      // historical surfaces hold verbatim
      perVersion.foreach { case (v, expect) =>
        ok &&= t.asOf(v).columns.toSeq == expect.toSeq
      }
      // the physical truth never drifted: the key aggregate is invariant
      val expectKeys = (1L until nextKey).sum
      ok && t.read().agg(org.apache.spark.sql.functions.sum("k")).head().getLong(0) == expectKeys
    }

  // Change-feed coherence over random histories (the CDC correctness
  // law): for ANY committed version pair i <= j, applying the feed to
  // the older snapshot reproduces the newer one as a MULTISET —
  // asOf(i) − deletes(i,j) + inserts(i,j) == asOf(j), with deletes
  // always contained in asOf(i) (a feed may never delete a row the
  // consumer doesn't hold). Histories mix appends, DV range/predicate
  // deletes, DV updates, CoW deletes, compactions, and restores, so the
  // windows cross every resolution shape: equal-stamp file diffs, pure
  // sidecar deltas, mixed delta+file windows, restore-REVERSED stamps
  // (inserts from the sidecar), and stamp-clearing rewrites.
  private val genCdfOps: Gen[List[(Int, Long, Long)]] = for {
    n <- Gen.choose(1, 5)
    ops <- Gen.listOfN(n, for {
      kind <- Gen.oneOf(0, 1, 2, 3, 4, 5, 6)
      lo <- Gen.choose(1L, 35L)
      w <- Gen.choose(0L, 8L)
    } yield (kind, lo, lo + w))
  } yield ops

  property("change feed reconstructs every version pair over random DV/CoW/restore histories") =
    Prop.forAll(genCdfOps, Gen.choose(0, Int.MaxValue)) { (ops, seed) =>
      val sp = spark
      import sp.implicits._
      val dir = Files.createTempDirectory("graft-prop-cdf").toString
      // checkpointEvery = 3: windows cross checkpoint entries too
      val t = new CommitTable(sp, dir, "k", checkpointEvery = 3)
      t.overwrite((1L to 30L).map(i => (i, i * 7L)).toDF("k", "v").repartition(3))
      var nextKey = 100L
      ops.foreach { case (kind, lo, hi) =>
        kind match {
          case 0 =>
            t.append(Seq((nextKey, nextKey * 7L),
              (nextKey + 1L, (nextKey + 1L) * 7L)).toDF("k", "v"))
            nextKey += 2L
          case 1 => t.deleteRangeDV(lo, hi)
          case 2 => t.deleteWhereDV(s"v >= ${lo * 7} AND v <= ${hi * 7}")
          case 3 => t.updateWhereDV(s"k >= $lo AND k <= $hi", "v", "v + 100000")
          case 4 => t.deleteRange(lo, hi)
          case 5 => t.compact(2)
          case 6 =>
            val vs = t.versions()
            t.restore(vs((lo % vs.length).toInt))
        }
      }
      def multiset(rows: Array[(Long, Long)]): Map[(Long, Long), Int] =
        rows.groupBy(identity).view.mapValues(_.length).toMap
      def snap(v: Long): Map[(Long, Long), Int] = multiset(
        t.asOf(v).select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))))
      val vs = t.versions().toVector
      val rnd = new scala.util.Random(seed)
      val pairs = ((0L, vs.last) +: Vector.fill(3) {
        val a = vs(rnd.nextInt(vs.length)); val b = vs(rnd.nextInt(vs.length))
        (a min b, a max b)
      }).distinct
      pairs.forall { case (i, j) =>
        val feed = t.changesBetween(i, j)
          .select("k", "v", "change_type").collect()
          .map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
        val ins = multiset(feed.collect { case (kv, "insert") => kv })
        val del = multiset(feed.collect { case (kv, "delete") => kv })
        val base = snap(i)
        val containment = del.forall { case (kv, n) => base.getOrElse(kv, 0) >= n }
        val applied = (base.keySet ++ ins.keySet).flatMap { kv =>
          val n = base.getOrElse(kv, 0) - del.getOrElse(kv, 0) + ins.getOrElse(kv, 0)
          if (n > 0) Some(kv -> n) else None
        }.toMap
        containment && applied == snap(j)
      }
    }
}
