package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.CommitTable

/** Deletion vectors for tables (f27, r15 verdict Next #4): DELETE as an
  * O(deleted) sidecar commit with ZERO data-file rewrites, exact reads
  * through every path, time travel per-version, and OPTIMIZE as the
  * materialization point — the s27/s28 tombstone discipline applied to
  * tables.
  */
class DeletionVectorSpec extends SparkSpec {

  private def kv(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("k", "v")
  }

  private def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("k").collect().map(_.getLong(0)).toSet

  test("DV delete: zero data-file rewrites, exact reads, per-version time travel, honest counters") {
    val dir = Files.createTempDirectory("graft-dv").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 10L).map(i => i -> i * 10L): _*).repartition(3)) // v0
    val filesBefore = t.read().inputFiles.toSet
    val v1 = t.deleteRangeDV(3L, 5L)
    assert(v1 === 1L)
    // ZERO data-file rewrites: the head references exactly the same files
    val headFiles = t.read().inputFiles.toSet.filterNot(_.contains("/_dv/"))
    assert(headFiles === filesBefore,
      "a DV delete must not add, remove, or rewrite any data file")
    // exact content
    assert(keys(t.read()) === Set(1L, 2L, 6L, 7L, 8L, 9L, 10L))
    assert(t.dvOutstanding() === 3L)
    // pre-delete version reads the full content (stamp is per-version)
    assert(keys(t.asOf(0L)) === (1L to 10L).toSet)
    // counters net out the vector
    val hist = t.history().collect().map(r => (r.getLong(0), r.getString(2), r.getLong(4))).toList
    assert(hist.contains((1L, "delete-dv", 7L)), s"history must net DV rows, got $hist")
    // a second DV delete accumulates (monotone), first delete still applied
    t.deleteRangeDV(8L, 8L)
    assert(keys(t.read()) === Set(1L, 2L, 6L, 7L, 9L, 10L))
    assert(t.dvOutstanding() === 4L)
    // pruned read paths honor the vector too
    assert(keys(t.prunedRead(1L, 10L)) === Set(1L, 2L, 6L, 7L, 9L, 10L))
    assert(keys(t.prunedReadIn(Seq(3L, 6L)).filter(col("k").isin(3L, 6L))) === Set(6L))
    // deleting an already-DV'd range is a provable no-op: no new commit
    val head = t.latestVersion().get
    assert(t.deleteRangeDV(3L, 5L) === head)
  }

  test("OPTIMIZE materializes the vector: stamp clears, content exact, consolidation rebuild-exact") {
    val dir = Files.createTempDirectory("graft-dv-opt").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 20L).map(i => i -> i): _*).repartition(4))
    t.deleteRangeDV(5L, 14L)
    assert(t.dvOutstanding() === 10L)
    t.compactClustered("k", 2)
    assert(t.dvOutstanding() === 0L, "a full rewrite materializes the deletes")
    assert(keys(t.read()) === ((1L to 4L) ++ (15L to 20L)).toSet)
    // appends AFTER materialization are vector-free and cheap again
    t.append(kv(100L -> 100L))
    assert(keys(t.read()) === ((1L to 4L) ++ (15L to 20L) :+ 100L).toSet)
  }

  test("DV composes with appends, CoW DML, merge, and restore") {
    val dir = Files.createTempDirectory("graft-dv-mix").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 8L).map(i => i -> i): _*).repartition(2)) // v0
    t.deleteRangeDV(2L, 3L)                                         // v1
    // append rolls the stamp forward: old deletes stay applied
    t.append(kv(21L -> 21L, 22L -> 22L))                            // v2
    assert(keys(t.read()) === Set(1L, 4L, 5L, 6L, 7L, 8L, 21L, 22L))
    // CoW deleteRange keeps the stamp and never resurrects DV'd rows
    t.deleteRange(21L, 21L)                                          // v3
    assert(keys(t.read()) === Set(1L, 4L, 5L, 6L, 7L, 8L, 22L))
    // updateRange on a DV'd key range: only live rows rewrite
    t.updateRange(4L, 5L, "v", "v * 100")                            // v4
    assert(t.read().filter(col("k") === 4L).select("v").head().getLong(0) === 400L)
    assert(keys(t.read()) === Set(1L, 4L, 5L, 6L, 7L, 8L, 22L))
    // merge materializes (full rewrite): stamp resets
    t.merge(kv(50L -> 50L), Seq("k"))                                // v5
    assert(t.dvOutstanding() === 0L)
    assert(keys(t.read()) === Set(1L, 4L, 5L, 6L, 7L, 8L, 22L, 50L))
    // restore to the DV'd v2 restores its vector state with the data
    t.restore(2L)
    assert(keys(t.read()) === Set(1L, 4L, 5L, 6L, 7L, 8L, 21L, 22L))
    assert(t.dvOutstanding() === 2L)
  }

  test("CDF across a DV boundary is exact (sidecar-delta composition); equal-stamp windows keep the file-diff path") {
    val dir = Files.createTempDirectory("graft-dv-cdf").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 6L).map(i => i -> i): _*).coalesce(1)) // v0
    t.deleteRangeDV(2L, 3L)                                      // v1
    t.append(kv(7L -> 7L).coalesce(1))                           // v2
    // window crossing the DV commit: deletes surface as 'delete'
    val cdf01 = t.changesBetween(0L, 1L).collect()
      .map(r => (r.getString(2), r.getLong(0))).toSet
    assert(cdf01 === Set(("delete", 2L), ("delete", 3L)))
    // window with EQUAL stamps on both ends: pure file-diff, insert only
    val cdf12 = t.changesBetween(1L, 2L).collect()
      .map(r => (r.getString(2), r.getLong(0))).toSet
    assert(cdf12 === Set(("insert", 7L)))
    // full window mixes both
    val cdf02 = t.changesBetween(0L, 2L).collect()
      .map(r => (r.getString(2), r.getLong(0))).toSet
    assert(cdf02 === Set(("delete", 2L), ("delete", 3L), ("insert", 7L)))
  }

  test("a DV'd source head refuses shallow clone until OPTIMIZE") {
    val dir = Files.createTempDirectory("graft-dv-clone").toString
    val t = new CommitTable(spark, dir + "/src", "k")
    t.overwrite(kv(1L -> 1L, 2L -> 2L))
    t.deleteRangeDV(1L, 1L)
    val cl = new CommitTable(spark, dir + "/clone", "k")
    val e = intercept[IllegalArgumentException](cl.shallowCloneFrom(dir + "/src"))
    assert(e.getMessage.contains("deletion vectors"))
    t.compact(1)
    cl.shallowCloneFrom(dir + "/src")
    assert(keys(cl.read()) === Set(2L))
  }

  test("orphaned sidecar versions are inert: a lost race never poisons later deletes") {
    val dir = Files.createTempDirectory("graft-dv-orphan").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 6L).map(i => i -> i): _*))
    // a racer loses AFTER its sidecar write: simulate by planting a stale
    // head so the main publish conflicts
    val stale = new CommitTable(spark, dir, "k") {
      override protected def nextVersion(): Long = 0L // head is already 0 → attempts v0
    }
    intercept[java.util.ConcurrentModificationException](stale.deleteRangeDV(5L, 6L))
    // the loser's sidecar overwrite exists but was never stamped — a
    // later DV delete snapshots from the STAMPED version (none), so the
    // orphan's rows are NOT deleted
    t.deleteRangeDV(2L, 2L)
    assert(keys(t.read()) === Set(1L, 3L, 4L, 5L, 6L),
      "orphaned sidecar content must never leak into the live vector")
  }

  test("vacuum keeps chain members of kept stamps; consolidation makes delta links reclaimable") {
    val dir = Files.createTempDirectory("graft-dv-vac").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 10L).map(i => i -> i): _*))  // v0
    t.deleteRangeDV(1L, 1L)                            // v1 -> dv 0 (chain start)
    t.deleteRangeDV(2L, 2L)                            // v2 -> dv 1 (0 → 1)
    t.deleteRangeDV(3L, 3L)                            // v3 -> dv 2 (0 → 1 → 2)
    def dvDirs() = new java.io.File(s"$dir/_dv").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("d"))
    assert(dvDirs() === 3)
    // keep the last two main versions (stamps dv 1 and dv 2): delta link
    // dv 0 is a CHAIN MEMBER of both kept stamps — its directory is
    // referenced through their carried file lists and must survive
    assert(t.vacuum(keepLast = 2) === 0L)
    assert(dvDirs() === 3)
    assert(keys(t.asOf(2L)) === (3L to 10L).toSet)
    // consolidation folds the chain to ONE snapshot version and restamps;
    // vacuuming to the head alone then reclaims every delta link
    t.consolidateDv()                                  // v4 -> dv 3 (snapshot)
    val reclaimed = t.vacuum(keepLast = 1)
    assert(reclaimed >= 3L, "all three delta links must be reclaimed after the fold")
    assert(dvDirs() === 1)
    assert(keys(t.read()) === (4L to 10L).toSet)
    // the consolidated stamp keeps composing: a further delete chains on it
    t.deleteRangeDV(4L, 4L)
    assert(keys(t.read()) === (5L to 10L).toSet)
  }

  test("idempotent appends enforce declared invariants (streaming-sink write path)") {
    val dir = Files.createTempDirectory("graft-dv-idem").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv(1L -> 1L))
    t.setInvariants("k BIGINT, v BIGINT", checks = Seq("v_pos" -> "v > 0"))
    assert(t.appendIdempotent(kv(2L -> 2L), "app", 1L).isDefined)
    intercept[graft.operators.InvariantViolationException](
      t.appendIdempotent(kv(3L -> -3L), "app", 2L))
    // the failed txn did NOT record its marker: the retry with clean data lands
    assert(t.appendIdempotent(kv(3L -> 3L), "app", 2L).isDefined)
    assert(keys(t.read()) === Set(1L, 2L, 3L))
  }

  test("predicate-form DV delete: arbitrary predicate over the logical surface, O(deleted) commit, SQL statement form") {
    val dir = Files.createTempDirectory("graft-dv-where").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 12L).map(i => i -> i * 10L): _*).repartition(3))
    val files0 = t.read().inputFiles.toSet
    // predicate touches the NON-key column — no stats cut possible, and
    // exactly what deleteRangeDV cannot express
    t.deleteWhereDV("v % 30 = 0")
    assert(t.read().inputFiles.toSet.filterNot(_.contains("/_dv/")) === files0,
      "a predicate DV delete must rewrite nothing")
    assert(keys(t.read()) === Set(1L, 2L, 4L, 5L, 7L, 8L, 10L, 11L))
    // composes with an existing vector and with a RENAMED surface
    t.renameColumn("v", "amount")
    t.deleteWhereDV("amount = 10")
    assert(keys(t.read()) === Set(2L, 4L, 5L, 7L, 8L, 10L, 11L))
    // no-op predicate commits nothing
    val head = t.latestVersion().get
    assert(t.deleteWhereDV("amount < 0") === head)
    // the SQL statement form over a registered name
    graft.plans.TableRegistry.register("dv_where_spec", dir, "k")
    val n = spark.sql(
      "SELECT COUNT(*) FROM log_delete_where_dv('dv_where_spec', 'k >= 10')")
      .head().getLong(0)
    assert(n === 5L)
    assert(keys(t.read()) === Set(2L, 4L, 5L, 7L, 8L))
  }

  test("counters stay net of the vector through checkpointed appends and CoW DML (r16 advice)") {
    val dir = Files.createTempDirectory("graft-dv-ctr").toString
    // checkpointEvery = 2 so the very next append after the DV delete is
    // a snapshot-complete recompute — the branch that used to resurrect
    // the deleted rows in history().n_rows
    val t = new CommitTable(spark, dir, "k", checkpointEvery = 2)
    t.overwrite(kv((1L to 10L).map(i => i -> i): _*).repartition(2)) // v0: 10
    t.deleteRangeDV(1L, 4L)                                          // v1: 6
    t.append(kv(11L -> 11L))                                         // v2: CHECKPOINT
    def nRows(v: Long): Long = t.history().collect()
      .find(_.getLong(0) == v).get.getLong(4)
    assert(nRows(2L) === 7L,
      "a checkpointed append after a DV delete must not resurrect deleted rows in n_rows")
    assert(t.read().count() === nRows(2L))
    // CoW range DML (carriedExplicit recompute) nets the vector too
    t.deleteRange(11L, 11L)                                          // v3
    assert(nRows(3L) === 6L)
    assert(t.read().count() === 6L)
    // and the vector's later deletes subtract from the NET base
    t.deleteRangeDV(5L, 5L)                                          // v4 (checkpoint)
    assert(nRows(4L) === 5L)
    assert(t.read().count() === 5L)
  }

  test("dvOutstanding counts only vector entries over still-active files (r16 advice)") {
    val dir = Files.createTempDirectory("graft-dv-inert").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 10L).map(i => i -> i): _*)
      .repartitionByRange(2, col("k")))                  // file A ~1-5, file B ~6-10
    t.deleteRangeDV(2L, 3L)                              // 2 marks in file A
    t.deleteRangeDV(7L, 7L)                              // 1 mark in file B
    assert(t.dvOutstanding() === 3L)
    // CoW delete rewrites file A (stats intersect), carrying the stamp:
    // file A's vector entries go INERT with the name — they must stop
    // counting, or the instrument schedules OPTIMIZE on a clean table
    t.deleteRange(1L, 5L)
    assert(keys(t.read()) === Set(6L, 8L, 9L, 10L))
    assert(t.dvOutstanding() === 1L,
      "entries over rewritten (inert) file names must not count as outstanding")
  }

  test("CDF across a DV delete is O(deleted): reads only the sidecar and the touched files") {
    val dir = Files.createTempDirectory("graft-dv-cdfio").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 100L).map(i => i -> i): _*)
      .repartitionByRange(4, col("k")))                  // 4 key-clustered files
    t.deleteWhereDV("k IN (10, 11)")                     // marks in ONE file
    val cdf = t.changesBetween(0L, 1L)
    assert(cdf.collect().map(r => (r.getString(2), r.getLong(0))).toSet ===
      Set(("delete", 10L), ("delete", 11L)))
    // the plan reads ONLY the one touched data file (plus the sidecar) —
    // the r16 full-snapshot fallback read all four
    val dataFiles = cdf.inputFiles.filterNot(_.contains("/_dv/")).toSet
    assert(dataFiles.size === 1,
      s"a DV-window CDF must read only the delta's files, got ${dataFiles.size}: $dataFiles")
  }

  test("CDF across a DV delete composed with a RENAME cancels unchanged rows; restore windows resurrect as inserts") {
    val dir = Files.createTempDirectory("graft-dv-cdfmix").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 6L).map(i => i -> i): _*).coalesce(1)) // v0
    t.deleteRangeDV(2L, 3L)                                      // v1
    t.renameColumn("v", "val")                                   // v2
    // v0 → v2 crosses BOTH the vector and the rename: the feed must be
    // the two deleted rows under the TO surface — not the whole table as
    // delete+insert (the r16 fallback's NULL-padding failure mode)
    val cdf = t.changesBetween(0L, 2L)
    assert(cdf.columns.toSet === Set("k", "val", "change_type"))
    assert(cdf.collect().map(r => (r.getString(2), r.getLong(0))).toSet ===
      Set(("delete", 2L), ("delete", 3L)))
    // a RESTORE to the pre-delete stamp resurrects the rows: the sidecar
    // delta runs in reverse and surfaces them as inserts
    t.restore(0L)                                                // v3
    val cdfR = t.changesBetween(1L, 3L)
    assert(cdfR.collect().map(r => (r.getString(2), r.getLong(0))).toSet ===
      Set(("insert", 2L), ("insert", 3L)))
    // ...and a mixed window (DV delta + an appended file) composes
    t.deleteRangeDV(4L, 4L)                                      // v4
    t.append(kv(7L -> 7L).coalesce(1))                           // v5
    val cdfM = t.changesBetween(3L, 5L)
    assert(cdfM.collect().map(r => (r.getString(2), r.getLong(0))).toSet ===
      Set(("delete", 4L), ("insert", 7L)))
  }

  test("updateWhereDV: mark + append in one commit — zero rewrites, equal to the CoW update, honest counters") {
    val dir = Files.createTempDirectory("graft-dv-upd").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 10L).map(i => i -> i * 10L): _*)
      .repartitionByRange(2, col("k")))                          // v0
    val files0 = t.read().inputFiles.toSet.filterNot(_.contains("/_dv/"))
    assert(t.updateWhereDV("k BETWEEN 3 AND 5", "v", "v + 1") === 1L)
    // ZERO existing files rewritten: every base file still referenced,
    // the changed rows arrive as NEW files only
    val files1 = t.read().inputFiles.toSet.filterNot(_.contains("/_dv/"))
    assert(files0.subsetOf(files1), "updateWhereDV must not rewrite base files")
    assert((files1 -- files0).nonEmpty, "the updated rows land as new files")
    // content equals the file-granular CoW update on a twin table
    val dir2 = Files.createTempDirectory("graft-dv-upd2").toString
    val t2 = new CommitTable(spark, dir2, "k")
    t2.overwrite(kv((1L to 10L).map(i => i -> i * 10L): _*)
      .repartitionByRange(2, col("k")))
    t2.updateRange(3L, 5L, "v", "v + 1")
    val got = t.read().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = t2.read().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    // counters honest (the marked rows are replaced, not added)
    val h = t.history().collect().find(_.getLong(0) == 1L).get
    assert(h.getString(2) === "update-dv")
    assert(h.getLong(4) === 10L)
    // time travel: v0 keeps the pre-update values
    assert(t.asOf(0L).filter(col("k") === 3L).select("v").head().getLong(0) === 30L)
    // composes with the renamed surface and a later DV delete
    t.renameColumn("v", "val")
    t.updateWhereDV("k = 6", "val", "val * 2")
    assert(t.read().filter(col("k") === 6L).select("val").head().getLong(0) === 120L)
    t.deleteRangeDV(1L, 1L)
    assert(t.read().count() === 9L)
    // OPTIMIZE materializes marks and appended rows into a clean layout
    t.compactClustered("k", 2)
    assert(t.dvOutstanding() === 0L)
    assert(t.read().count() === 9L)
    assert(t.read().filter(col("k") === 4L).select("val").head().getLong(0) === 41L)
    // no-op predicate commits nothing
    val head = t.latestVersion().get
    assert(t.updateWhereDV("k < 0", "val", "val") === head)
  }

  test("mergeDV: upsert + delete + insert in one commit — zero rewrites, equal to the join merge") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-dv-mrg").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 10L).map(i => i -> i * 10L): _*)
      .repartitionByRange(2, col("k")))                          // v0
    val files0 = t.read().inputFiles.toSet.filterNot(_.contains("/_dv/"))
    // all three MERGE actions in one change-set
    val src = Seq((3L, 999L, false), (5L, 0L, true), (20L, 200L, false))
      .toDF("k", "v", "__del")
    t.mergeDV(src, Seq("k"), deleteCol = Some("__del"))          // v1
    val files1 = t.read().inputFiles.toSet.filterNot(_.contains("/_dv/"))
    assert(files0.subsetOf(files1) && (files1 -- files0).nonEmpty,
      "mergeDV must append new files and rewrite none")
    // content equals the join-based merge on a twin
    val t2 = new CommitTable(spark, dir + "-twin", "k")
    t2.overwrite(kv((1L to 10L).map(i => i -> i * 10L): _*)
      .repartitionByRange(2, col("k")))
    t2.merge(src, Seq("k"), deleteCol = Some("__del"))
    def rows(tt: CommitTable) = tt.read().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(t) === rows(t2))
    assert(rows(t) === ((1L to 10L).filterNot(k => k == 3 || k == 5)
      .map(k => (k, k * 10L)).toSet + ((3L, 999L)) + ((20L, 200L))))
    // counters honest: 10 - 2 matched + 2 survivors = 10
    val h = t.history().collect().find(_.getLong(0) == 1L).get
    assert(h.getString(2) === "merge-dv" && h.getLong(4) === 10L)
    // time travel: v0 intact
    assert(keys(t.asOf(0L)) === (1L to 10L).toSet)
    // insert-only merge: no mark, the stamp carries UNTOUCHED
    val dvvBefore = t.dvVersionAt(t.latestVersion().get)
    t.mergeDV(Seq((30L, 300L)).toDF("k", "v"), Seq("k"))         // v2
    assert(t.dvVersionAt(t.latestVersion().get) === dvvBefore,
      "an insert-only merge must not write a new sidecar snapshot")
    assert(keys(t.read()).contains(30L))
    // no-op change-set commits nothing
    val head = t.latestVersion().get
    assert(t.mergeDV(Seq.empty[(Long, Long)].toDF("k", "v"), Seq("k")) === head)
    // OPTIMIZE materializes
    t.compactClustered("k", 2)
    assert(t.dvOutstanding() === 0L)
    assert(rows(t) === ((1L to 10L).filterNot(k => k == 3 || k == 5)
      .map(k => (k, k * 10L)).toSet + ((3L, 999L)) + ((20L, 200L)) + ((30L, 300L))))
  }

  test("updateWhereDV multi-assignment evaluates every expression against the PRE-update row") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-dv-updm").toString
    val t = new CommitTable(spark, dir, "k")
    Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 30L, 300L))
      .toDF("k", "a", "b").createOrReplaceTempView("dvm_src")
    t.overwrite(spark.table("dvm_src"))
    // SET a = b, b = a — swaps only under pre-update semantics
    t.updateWhereDV("k <= 2", Seq("a" -> "b", "b" -> "a"))
    val got = t.read().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 100L, 10L), (2L, 200L, 20L), (3L, 30L, 300L)))
    // duplicate targets rejected
    intercept[IllegalArgumentException](
      t.updateWhereDV("k = 3", Seq("a" -> "1", "a" -> "2")))
  }

  test("restore refuses a version whose DV sidecar files were vacuumed (r16 advice)") {
    val dir = Files.createTempDirectory("graft-dv-resvac").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 6L).map(i => i -> i): _*).coalesce(1)) // v0
    t.deleteRangeDV(2L, 2L)                                      // v1 → dv 0 (delta)
    t.deleteRangeDV(3L, 3L)                                      // v2 → dv 1 (0 → 1)
    t.consolidateDv()                                            // v3 → dv 2 (snapshot)
    // keep only the head: v1's DATA dir survives (shared with the head's
    // file list) but the delta links dv 0/1 are reclaimed (only the
    // consolidated snapshot is stamped by a kept version) — exactly the
    // case where restore(1) would commit a head whose every read fails
    t.vacuum(keepLast = 1)
    val e = intercept[IllegalArgumentException](t.restore(1L))
    assert(e.getMessage.contains("deletion-vector"),
      s"restore must fail loudly BEFORE committing, got: ${e.getMessage}")
    // nothing was committed; the table stays healthy and restorable
    assert(keys(t.read()) === Set(1L, 4L, 5L, 6L))
    t.restore(3L)
    assert(keys(t.read()) === Set(1L, 4L, 5L, 6L))
  }

  test("DV commits append O(newly deleted) sidecar bytes on a churn-heavy table (r17 verdict Next #1)") {
    val dir = Files.createTempDirectory("graft-dv-onew").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 2000L).map(i => i -> i): _*)
      .repartitionByRange(4, col("k")))                // v0
    t.deleteRangeDV(1L, 1000L)                         // v1 → dv 0: 1000 marks
    t.deleteRangeDV(1500L, 1501L)                      // v2 → dv 1: 2 marks
    // the second sidecar commit must stage ONLY its own 2 positions —
    // the old snapshot discipline rewrote all 1002 into one file. Links
    // are RANGE-encoded (file, pos_lo, pos_hi), so measure both the
    // covered POSITIONS and the raw row count.
    def staged(dvVer: Long): (Long, Long) = {
      val files = new java.io.File(s"$dir/_dv").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith(s"d$dvVer-"))
        .flatMap(_.listFiles().filter(_.getName.endsWith(".parquet")))
        .map(_.getPath.toString)
      if (files.isEmpty) (0L, 0L)
      else {
        val df = spark.read.parquet(files.toIndexedSeq: _*)
        val positions =
          if (df.columns.contains("pos")) df.count()
          else df.agg(sum(col("pos_hi") - col("pos_lo") + lit(1L))).head().getLong(0)
        (positions, df.count())
      }
    }
    assert(staged(0L)._1 === 1000L)
    assert(staged(1L)._1 === 2L,
      "a small DV delete must append only its own positions, not the accumulated set")
    // and the encoding is RANGE-compressed: the 1000-position link (four
    // key-clustered files) stores runs, far fewer rows than positions
    assert(staged(0L)._2 <= 100L,
      s"contiguous runs must compress, got ${staged(0L)._2} rows for 1000 positions")
    // resolution unions the chain exactly
    assert(t.read().count() === 998L)
    assert(t.dvOutstanding() === 1002L)
    assert(keys(t.read().filter(col("k") < 1003L)) === Set(1001L, 1002L))
    // and the per-window CDF reads only the window's appended link
    val cdf = t.changesBetween(1L, 2L)
    assert(cdf.collect().map(r => (r.getString(2), r.getLong(0))).toSet ===
      Set(("delete", 1500L), ("delete", 1501L)))
  }

  test("consolidateDv folds a long chain to one snapshot with identical content; no-op without a stamp") {
    val dir = Files.createTempDirectory("graft-dv-consol").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 30L).map(i => i -> i): _*).repartition(3)) // v0
    // no stamp → no-op
    assert(t.consolidateDv() === 0L)
    (1L to 6L).foreach(i => t.deleteRangeDV(i * 3, i * 3))          // v1..v6
    val before = keys(t.read())
    assert(before === (1L to 30L).toSet -- (1L to 6L).map(_ * 3L).toSet)
    val v = t.consolidateDv()                                        // v7
    assert(v === 7L)
    assert(keys(t.read()) === before, "the fold must not change content")
    assert(t.dvOutstanding() === 6L)
    // an immediate second fold is a no-op (already one snapshot)
    assert(t.consolidateDv() === v)
    // time travel through pre-fold versions still resolves their chains
    assert(keys(t.asOf(3L)) === (1L to 30L).toSet -- Set(3L, 6L, 9L))
    // further deletes chain on the consolidated snapshot base
    t.deleteRangeDV(1L, 1L)                                          // v8
    assert(keys(t.read()) === before - 1L)
    assert(t.dvOutstanding() === 7L)
  }

  test("mergeDV pure-delete change-set publishes metadata-only (r17 advice)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-dv-pdel").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 10L).map(i => i -> i * 10L): _*).coalesce(1)) // v0
    val src = Seq((3L, 0L, true), (7L, 0L, true)).toDF("k", "v", "__del")
    val v = t.mergeDV(src, Seq("k"), deleteCol = Some("__del"))        // v1
    assert(v === 1L)
    assert(keys(t.read()) === (1L to 10L).toSet -- Set(3L, 7L))
    // metadata-only: NO data directory was staged for v1
    val v1Dirs = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("d1-"))
    assert(v1Dirs === 0, "a pure-delete merge must not stage an empty data directory")
    // counters honest
    val h = t.history().collect().find(_.getLong(0) == 1L).get
    assert(h.getString(2) === "merge-dv" && h.getLong(4) === 8L)
  }

  test("mergeDV fails loudly on duplicate-key targets; allowDuplicateTargets opts into the SCD-1 collapse (r17 verdict Next #3)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-dv-dup").toString
    val t = new CommitTable(spark, dir, "k")
    // target holds TWO rows for k = 5
    t.overwrite(kv((1L to 6L).map(i => i -> i * 10L) :+ (5L -> 555L): _*))
    val src = Seq((5L, -1L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException](t.mergeDV(src, Seq("k")))
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    assert(t.latestVersion() === Some(0L), "the failed merge must not commit")
    // non-matching duplicate keys are fine — uniqueness is probed over
    // the MATCHED keys only
    t.mergeDV(Seq((2L, -2L)).toDF("k", "v"), Seq("k"))                // v1
    assert(t.read().filter(col("k") === 2L).select("v").head().getLong(0) === -2L)
    assert(t.read().filter(col("k") === 5L).count() === 2L)
    // the explicit opt-in collapses the duplicates to the one source row
    t.mergeDV(src, Seq("k"), allowDuplicateTargets = true)            // v2
    assert(t.read().filter(col("k") === 5L).collect().map(_.getLong(1)).toSeq === Seq(-1L))
  }

  test("mergeDV WITH SCHEMA EVOLUTION: new source columns widen the target atomically, NULL-backfilled (r17 verdict Next #6)") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-dv-evo").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 4L).map(i => i -> i * 10L): _*).coalesce(1))  // v0
    val src = Seq((2L, -2L, "up"), (9L, 90L, "new")).toDF("k", "v", "tag")
    // without the opt-in, the widened source rejects loudly
    val e = intercept[IllegalArgumentException](t.mergeDV(src, Seq("k")))
    assert(e.getMessage.contains("evolveSchema"), e.getMessage)
    t.mergeDV(src, Seq("k"), evolveSchema = true)                       // v1
    val head = t.read()
    assert(head.columns.toSet === Set("k", "v", "tag"))
    val byK = head.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), if (r.isNullAt(2)) null else r.getString(2))).toMap
    assert(byK(2L) === ((-2L, "up")))
    assert(byK(9L) === ((90L, "new")))
    assert(byK(1L) === ((10L, null)), "pre-merge rows read the new column as NULL")
    // v0 keeps its original two-column surface
    assert(t.asOf(0L).columns.toSet === Set("k", "v"))
    // a DECLARED schema widens through the same gate (f26 semantics)
    val t2 = new CommitTable(spark, dir + "-inv", "k")
    t2.overwrite(kv(1L -> 10L))
    t2.setInvariants("k BIGINT, v BIGINT", notNull = Seq("k"))
    t2.mergeDV(Seq((1L, -1L, "x")).toDF("k", "v", "tag"), Seq("k"), evolveSchema = true)
    assert(t2.read().columns.toSet === Set("k", "v", "tag"))
    assert(t2.invariants().get.schemaDdl.contains("tag"))
  }

  test("DV DML rejects predicates and assignments naming internal position columns (r17 advice)") {
    val dir = Files.createTempDirectory("graft-dv-int").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv(1L -> 10L, 2L -> 20L))
    intercept[IllegalArgumentException](t.deleteWhereDV("__dvp = 0"))
    intercept[IllegalArgumentException](t.updateWhereDV("__dvf = 'x'", "v", "1"))
    intercept[IllegalArgumentException](t.updateWhereDV("k = 1", "v", "__dvp + 1"))
    intercept[IllegalArgumentException](t.updateWhereDV("k = 1", "__dvp", "1"))
    assert(t.latestVersion() === Some(0L), "rejections must not commit")
    assert(keys(t.read()) === Set(1L, 2L))
  }

  test("DV chain auto-folds at checkpointEvery links: content exact, fold is a point-encoded snapshot, protocol drops (r18)") {
    val dir = Files.createTempDirectory("graft-dv-fold").toString
    val t = new CommitTable(spark, dir, "k", checkpointEvery = 3)
    t.overwrite(kv((1L to 40L).map(i => i -> i): _*).repartition(2)) // v0
    // fold threshold 3: deletes 4 and 8 land with a 3-link chain and
    // write SNAPSHOT sidecar versions instead of a fourth link
    (1L to 8L).foreach(i => t.deleteRangeDV(i, i))                   // v1..v8
    assert(keys(t.read()) === (9L to 40L).toSet)
    assert(t.dvOutstanding() === 8L)
    def header(v: Long): String = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "_log", f"$v%020d.json")).get(0)
    def dvvOf(v: Long): Long =
      """"dvv": (\d+)""".r.findFirstMatchIn(header(v)).get.group(1).toLong
    def staged(dvv: Long): (Long, Set[String]) = {
      val files = new java.io.File(s"$dir/_dv").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith(s"d$dvv-"))
        .flatMap(_.listFiles().filter(_.getName.endsWith(".parquet")))
        .map(_.getPath.toString)
      val df = spark.read.parquet(files.toIndexedSeq: _*)
      (df.count(), df.columns.toSet)
    }
    // a below-threshold commit stages only its own (range-encoded) link
    val (n3, cols3) = staged(dvvOf(3L))
    assert(n3 === 1L && cols3.contains("pos_lo"))
    // the fold stages the accumulated in-force set, POINT-encoded (the
    // protocol-2-readable snapshot form)
    val (n4, cols4) = staged(dvvOf(4L))
    assert(n4 === 4L, "the fold must hold the accumulated set")
    assert(cols4.contains("pos") && !cols4.contains("pos_lo"))
    // reader protocol: delta-chained stamps are 3, folded stamps drop to 2
    assert(header(3L).contains("\"proto\": 3"), header(3L))
    assert(header(4L).contains("\"proto\": 2"), header(4L))
    assert(header(7L).contains("\"proto\": 3"), header(7L))
    assert(header(8L).contains("\"proto\": 2"), header(8L))
    // time travel through pre-fold versions still resolves their chains
    assert(keys(t.asOf(2L)) === (3L to 40L).toSet)
    assert(keys(t.asOf(4L)) === (5L to 40L).toSet)
  }

  test("purgeDv rewrites ONLY delete-dense files, trims the stamp, clears it on a full purge (r18)") {
    val dir = Files.createTempDirectory("graft-dv-purge").toString
    val t = new CommitTable(spark, dir, "k")
    // four EXACT single-file commits (25 keys each)
    t.overwrite(kv((1L to 25L).map(i => i -> i * 10L): _*).coalesce(1))   // v0: A
    t.append(kv((26L to 50L).map(i => i -> i * 10L): _*).coalesce(1))     // v1: B
    t.append(kv((51L to 75L).map(i => i -> i * 10L): _*).coalesce(1))     // v2: C
    t.append(kv((76L to 100L).map(i => i -> i * 10L): _*).coalesce(1))    // v3: D
    t.deleteRangeDV(1L, 20L)    // v4: A is 80% deleted
    t.deleteRangeDV(30L, 31L)   // v5: B is 8% deleted
    val before = t.read().inputFiles.filterNot(_.contains("/_dv/")).toSet
    val expected = ((21L to 100L).toSet -- Set(30L, 31L))
    // threshold 0.5: only the dense file rewrites
    val v6 = t.purgeDv(0.5)
    assert(v6 === 6L)
    assert(keys(t.read()) === expected, "purge must never change content")
    val after = t.read().inputFiles.filterNot(_.contains("/_dv/")).toSet
    assert((before & after).size === 3, "clean files must carry untouched")
    assert((before -- after).size === 1 && (after -- before).size === 1,
      "exactly the one dirty file is dropped and rewritten")
    // the trimmed stamp holds ONLY the sparse file's two surviving entries
    assert(t.dvOutstanding() === 2L)
    // counters honest: 78 live rows
    val h6 = t.history().collect().find(_.getLong(0) == 6L).get
    assert(h6.getString(2) === "purge-dv" && h6.getLong(4) === 78L)
    // nothing crosses a 90% threshold now → provable no-op, no commit
    assert(t.purgeDv(0.9) === 6L)
    // full purge rewrites the remaining dirty file and CLEARS the stamp
    val v7 = t.purgeDv()
    assert(v7 === 7L)
    assert(t.dvOutstanding() === 0L)
    assert(keys(t.read()) === expected)
    val head7 = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "_log", f"${7L}%020d.json")).get(0)
    assert(!head7.contains("\"dvv\""), "a full purge must clear the stamp")
    // time travel: pre-purge versions still resolve through their stamps
    assert(keys(t.asOf(5L)) === expected)
    assert(keys(t.asOf(4L)) === ((21L to 100L).toSet))
    // no stamp at all → no-op
    assert(t.purgeDv() === 7L)
  }

  test("purgeDv drops a fully-deleted file without staging data (r18)") {
    val dir = Files.createTempDirectory("graft-dv-purgedrop").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 10L).map(i => i -> i): _*).coalesce(1))   // v0
    t.append(kv((11L to 20L).map(i => i -> i): _*).coalesce(1))     // v1
    t.append(kv((21L to 30L).map(i => i -> i): _*).coalesce(1))     // v2
    t.deleteRangeDV(1L, 10L)                                        // v3: file 1 fully dead
    val v4 = t.purgeDv()
    assert(v4 === 4L)
    assert(keys(t.read()) === (11L to 30L).toSet)
    assert(t.dvOutstanding() === 0L)
    // metadata-only: NO data directory staged for the purge version
    val v4Dirs = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("d4-"))
    assert(v4Dirs === 0, "a fully-deleted file must drop without empty staging")
    assert(t.read().inputFiles.count(!_.contains("/_dv/")) === 2)
    // counters honest after the drop
    val h4 = t.history().collect().find(_.getLong(0) == 4L).get
    assert(h4.getString(2) === "purge-dv" && h4.getLong(4) === 20L)
  }
}
