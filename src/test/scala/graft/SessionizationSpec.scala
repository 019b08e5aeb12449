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
