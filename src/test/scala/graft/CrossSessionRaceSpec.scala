package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.CommitTable

/** Cross-session writer races over the REAL filesystem LogStore (r17
  * verdict Next #7 — every prior race test either injected a stale head
  * deterministically or ran through the coordinated-put double; none
  * raced two INDEPENDENT SparkSessions through the actual
  * rename-without-overwrite primitive the way two cluster jobs sharing a
  * table path would). Two sessions with their own CommitTable instances
  * append concurrently while a third fires a maintenance compaction
  * mid-race; losers auto-rebase and EVERY row lands exactly once, with a
  * contiguous version chain — repeated rounds so the interleavings vary.
  * No test double anywhere on the racing path: conflicts here are real
  * lost renames on the shared filesystem.
  */
class CrossSessionRaceSpec extends SparkSpec {

  private def kv(s: SparkSession, pairs: Seq[(Long, Long)]) = {
    import s.implicits._
    pairs.toDF("k", "v")
  }

  test("two sessions race appends + one maintenance commit: losers rebase, all rows land exactly once, versions contiguous") {
    val rounds = 4
    val perWriter = 8
    for (round <- 1 to rounds) {
      val dir = Files.createTempDirectory(s"graft-xrace-$round").toString
      // independent sessions: separate SQLConf/state over one JVM's
      // SparkContext — the racing surface (the log directory) is the
      // shared FILESYSTEM, exactly as for two separate driver processes
      val sessionA = spark.newSession()
      val sessionB = spark.newSession()
      val seed = new CommitTable(spark, dir, "k")
      seed.overwrite(kv(spark, Seq(0L -> 0L)))        // v0
      @volatile var failure: Option[Throwable] = None
      // a CME means NO commit happened (the rename lost) — retrying the
      // same operation is the engine's own rebase discipline, applied
      // once more at the caller when a 3-way race exhausts the bounded
      // internal attempts; exactly-once still holds because only a
      // successful publish returns
      def withRetry(body: => Unit): Unit = {
        var attempts = 0
        var done = false
        while (!done) try { body; done = true }
        catch {
          case e: java.util.ConcurrentModificationException =>
            attempts += 1; if (attempts > 5) throw e
        }
      }
      def writer(s: SparkSession, base: Long): Thread = new Thread(() =>
        try {
          val t = new CommitTable(s, dir, "k")
          (0 until perWriter).foreach { i =>
            withRetry(t.append(kv(s, Seq((base + i) -> (base + i)))))
          }
        } catch { case e: Throwable => failure = failure.orElse(Some(e)) })
      val maintenance = new Thread(() =>
        try {
          Thread.sleep(50L * round) // vary where the rewrite lands per round
          withRetry(new CommitTable(sessionA, dir, "k").compactClustered("k", 2))
        } catch { case e: Throwable => failure = failure.orElse(Some(e)) })
      val a = writer(sessionA, 1000L)
      val b = writer(sessionB, 2000L)
      a.start(); b.start(); maintenance.start()
      a.join(120000); b.join(120000); maintenance.join(120000)
      failure.foreach(e => fail(s"round $round writer failed: $e", e))
      // every append landed exactly once — the auto-rebase contract
      val t = new CommitTable(spark, dir, "k")
      val got = t.read().select("k").collect().map(_.getLong(0)).sorted.toSeq
      val want = (Seq(0L) ++ (0 until perWriter).map(1000L + _) ++
        (0 until perWriter).map(2000L + _)).sorted
      assert(got === want, s"round $round: lost or doubled rows")
      // the version chain is contiguous: one winner per version, no holes
      val vs = t.versions()
      assert(vs === (0L to vs.last), s"round $round: version chain has holes: $vs")
      assert(vs.last === (2L * perWriter + 1L),
        s"round $round: expected exactly one commit per append + seed + compaction")
      // history stays coherent through the interleaved rewrite
      val hist = t.history().collect().map(_.getString(2))
      assert(hist.count(_ == "compact") === 1)
      assert(hist.count(_ == "append") === 2 * perWriter)
    }
  }

  test("a stale read-modify-write from another session surfaces the conflict instead of losing the race silently") {
    val dir = Files.createTempDirectory("graft-xrace-rmw").toString
    val sessionA = spark.newSession()
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv(spark, (1L to 6L).map(i => i -> i)))
    // session A computes a merge base, then THIS session commits first
    val tA = new CommitTable(sessionA, dir, "k") {
      override protected def nextVersion(): Long = {
        val v = super.nextVersion()
        // interleave a real commit from the OTHER session between base
        // resolution and publish — the cross-session lost-update window
        if (v == 1L) new CommitTable(spark, dir, "k").append(kv(spark, Seq(100L -> 100L)))
        v
      }
    }
    intercept[java.util.ConcurrentModificationException](
      tA.merge(kv(sessionA, Seq(2L -> 222L)), Seq("k")))
    // nothing from the losing merge leaked; the interleaved append is live
    val keys = t.read().select("k").collect().map(_.getLong(0)).toSet
    assert(keys === (1L to 6L).toSet + 100L)
  }
}
