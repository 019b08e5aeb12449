package graft

import graft.operators.Sessionization
import org.apache.spark.sql.functions._

class SessionizationSpec extends SparkSpec {

  private def evDF(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", "ts_us", "event_id")
  }

  private def sessions(rows: Seq[(Long, Long, Long)], gap: Long): Seq[(Long, Long, Long)] =
    Sessionization.assignSessions(evDF(rows), key = "user_id", time = "ts_us",
        gapUs = gap, tieBreak = Seq("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .toSeq.sorted // (user, event_id, session_seq)

  test("gap boundary is strict: exactly-gap-apart stays, gap+1 opens a session") {
    val got = sessions(Seq(
      (1L, 0L, 1L), (1L, 100L, 2L),  // gap == 100 -> same session
      (1L, 201L, 3L),                // gap == 101 -> new session
      (1L, 301L, 4L)), gap = 100L)
    assert(got === Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 2L)))
  }

  test("keys sessionize independently; first event always opens session 1") {
    val got = sessions(Seq(
      (1L, 0L, 1L), (2L, 1000000L, 2L), (1L, 5000L, 3L), (2L, 1000001L, 4L)), gap = 10L)
    assert(got === Seq((1L, 1L, 1L), (1L, 3L, 2L), (2L, 2L, 1L), (2L, 4L, 1L)))
  }

  test("equal timestamps fall in one session and order by the tie-break") {
    val got = sessions(Seq((1L, 50L, 9L), (1L, 50L, 3L)), gap = 1L)
    assert(got === Seq((1L, 3L, 1L), (1L, 9L, 1L)))
  }

  test("matches a brute-force sequential model") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 400L).map(i =>
      (i % 7, rnd.nextInt(100000).toLong, i))
    val gap = 5000L
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var seq = 0L
      var prev = Long.MinValue
      sorted.map { case (_, ts, id) =>
        if (prev == Long.MinValue || ts - prev > gap) seq += 1
        prev = ts
        (u, id, seq)
      }
    }.sorted
    assert(sessions(rows, gap) === expected)
  }

  test("both window passes share ONE exchange and ONE sort (lag + running sum co-planned)") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // AQE folds finalized shuffles into query stages the tree walk can't
    // see; the static plan is the one that shows operator sharing
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Sessionization.assignSessions(
        evDF((1L to 1000L).map(i => (i % 13, i * 37 % 10000, i))),
        key = "user_id", time = "ts_us", gapUs = 100L, tieBreak = Seq("event_id"))
      val plan = df.queryExecution.executedPlan
      val ex = plan.collectWithSubqueries { case e: ShuffleExchangeLike => e }
      val sorts = plan.collectWithSubqueries { case s: SortExec => s }
      assert(ex.size === 1, s"expected a single shared exchange, found ${ex.size}:\n$plan")
      assert(sorts.size === 1, s"expected a single shared sort, found ${sorts.size}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  private def ivDF(rows: Seq[(Long, Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("k", "s", "e", "id")
  }

  private def islands(rows: Seq[(Long, Long, Long, Long)]): Seq[(Long, Long, Long, Long, Long)] =
    Sessionization.mergeIntervals(ivDF(rows), key = "k", start = "s", end = "e",
        tieBreak = Seq("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sorted // (k, island_seq, start, end, n)

  test("mergeIntervals: overlap and touch merge, a gap of one opens a new island") {
    val got = islands(Seq(
      (1L, 0L, 10L, 1L),   // island 1
      (1L, 5L, 12L, 2L),   //   overlaps
      (1L, 12L, 20L, 3L),  //   touches (closed intervals) -> still island 1
      (1L, 22L, 25L, 4L),  // gap of 1 day -> island 2
      (2L, 0L, 1L, 5L)))   // other key: its own island 1
    assert(got === Seq((1L, 1L, 0L, 20L, 3L), (1L, 2L, 22L, 25L, 1L), (2L, 1L, 0L, 1L, 1L)))
  }

  test("mergeIntervals: an early long interval swallows later short ones (running max, not last end)") {
    val got = islands(Seq(
      (1L, 0L, 100L, 1L),  // covers everything below
      (1L, 10L, 20L, 2L),
      (1L, 50L, 60L, 3L),
      (1L, 101L, 102L, 4L))) // 101 > running max 100 -> new island
    assert(got === Seq((1L, 1L, 0L, 100L, 3L), (1L, 2L, 101L, 102L, 1L)))
  }

  test("mergeIntervals matches a brute-force sequential model") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i % 9, s, s + rnd.nextInt(300), i)
    }
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, ivs) =>
      val sorted = ivs.sortBy(v => (v._2, v._3, v._4))
      var seq = 0L; var maxE = Long.MinValue
      val tagged = sorted.map { case (_, s, e, _) =>
        if (maxE == Long.MinValue || s > maxE) seq += 1
        maxE = math.max(maxE, e)
        (seq, s, e)
      }
      tagged.groupBy(_._1).map { case (isl, g) =>
        (k, isl, g.map(_._2).min, g.map(_._3).max, g.size.toLong)
      }
    }.sorted
    assert(islands(rows) === expected)
  }

  test("mergeIntervals: inverted intervals raise instead of silently merging") {
    val ex = intercept[Exception] {
      Sessionization.mergeIntervals(ivDF(Seq((1L, 10L, 5L, 1L))),
        key = "k", start = "s", end = "e", tieBreak = Seq("id")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("mergeIntervals: both window passes and the aggregate share ONE exchange and ONE sort") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = Sessionization.mergeIntervals(
        ivDF((1L to 1000L).map(i => (i % 13, i * 37 % 10000, i * 37 % 10000 + i % 100, i))),
        key = "k", start = "s", end = "e", tieBreak = Seq("id"))
      val plan = df.queryExecution.executedPlan
      val ex = plan.collectWithSubqueries { case e: ShuffleExchangeLike => e }
      val sorts = plan.collectWithSubqueries { case so: SortExec => so }
      assert(ex.size === 1, s"expected a single shared exchange, found ${ex.size}:\n$plan")
      assert(sorts.size === 1, s"expected a single shared sort, found ${sorts.size}:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("eventPatternCounts: greedy non-overlap automaton — resets, skips, and mirror equality") {
    val s = spark
    import s.implicits._
    def df(rows: Seq[(Long, Long, Long, String)]) =
      rows.toDF("user_id", "ts_us", "event_id", "event_type")
    def run(rows: Seq[(Long, Long, Long, String)]) =
      Sessionization.eventPatternCounts(df(rows), Seq("a", "b", "c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // user 1: a b c a b c -> 2 matches; user 2: a a b b c -> 1 (greedy
    // consumes the FIRST a, extra symbols skipped); user 3: c b a -> 0
    // (order matters); user 4: a b -> 0 (incomplete)
    val rows = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "c"),
      (1L, 4L, 4L, "a"), (1L, 5L, 5L, "b"), (1L, 6L, 6L, "c"),
      (2L, 1L, 7L, "a"), (2L, 2L, 8L, "a"), (2L, 3L, 9L, "b"),
      (2L, 4L, 10L, "b"), (2L, 5L, 11L, "c"),
      (3L, 1L, 12L, "c"), (3L, 2L, 13L, "b"), (3L, 3L, 14L, "a"),
      (4L, 1L, 15L, "a"), (4L, 2L, 16L, "b"))
    assert(run(rows) === Seq((1L, 6L, 2L), (2L, 5L, 1L), (3L, 3L, 0L), (4L, 2L, 0L)))
    // NON-overlap: a b a c b c = 1 by greedy consumption (second 'a'
    // advances nothing while stage awaits 'c'... it is skipped), then the
    // trailing 'b c' has no 'a' left — asserts consumed-event semantics
    val tricky = Seq(
      (9L, 1L, 20L, "a"), (9L, 2L, 21L, "b"), (9L, 3L, 22L, "a"),
      (9L, 4L, 23L, "c"), (9L, 5L, 24L, "b"), (9L, 6L, 25L, "c"))
    assert(run(tricky) === Seq((9L, 6L, 1L)))
    // out-of-order input: ordering is by (ts_us, event_id), not input order
    val shuffled = rows.reverse
    assert(run(shuffled) === run(rows))
    // the independent sequential mirror agrees on a pseudo-random stream
    val rng = new scala.util.Random(5)
    val rand = (0 until 400).map(i =>
      ((i % 7).toLong, rng.nextInt(50).toLong, i.toLong, Seq("a", "b", "c", "x")(rng.nextInt(4))))
    assert(run(rand) ===
      graft.operators.SequentialEvents.patternCounts(rand, Seq("a", "b", "c")))
  }

  test("contract violations are rejected up front") {
    val df = evDF(Seq((1L, 0L, 1L)))
    intercept[IllegalArgumentException](
      Sessionization.assignSessions(df, "user_id", "ts_us", gapUs = 0L))
    intercept[IllegalArgumentException](
      Sessionization.assignSessions(df.withColumn("session_seq", lit(1L)),
        "user_id", "ts_us", gapUs = 10L))
    val ts = df.withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    intercept[IllegalArgumentException](
      Sessionization.assignSessions(ts, "user_id", "ts", gapUs = 10L))
  }
}
