package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.DataFrame

/** Edge-case tests for the temporal join operators behind `e6`/`e7`. */
class TemporalJoinsSpec extends SparkSpec {

  // (key, time, id)-shaped frames
  private def df3(rows: Seq[(Long, Long, Long)], tCol: String, idCol: String): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("user_id", tCol, idCol)
  }

  private def asof(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) =
    TemporalJoins.asofJoin(
      df3(left, "ts", "left_id"), df3(right, "ts", "event_id"),
      key = "user_id", leftTime = "ts", rightTime = "ts",
      rightValues = Seq("event_id" -> "matched_id"), rightTieBreak = Seq("event_id"))
      .select("left_id", "matched_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("asofJoin picks the latest right row at or before each left row") {
    val got = asof(
      left = Seq((1L, 100L, 10L), (1L, 250L, 11L), (2L, 50L, 20L)),
      right = Seq((1L, 90L, 1L), (1L, 200L, 2L), (1L, 300L, 3L), (2L, 60L, 4L)))
    // left 10 @100 -> right 1 @90; left 11 @250 -> right 2 @200 (not 3 @300);
    // left 20 @50 -> nothing precedes -> null
    assert(got === Map(10L -> Some(1L), 11L -> Some(2L), 20L -> None))
  }

  test("asofJoin matches a right row at EXACTLY the left timestamp (at-or-before)") {
    val got = asof(left = Seq((1L, 100L, 10L)), right = Seq((1L, 100L, 7L)))
    assert(got === Map(10L -> Some(7L)))
  }

  test("asofJoin breaks same-instant right ties by the tie-break column (last wins)") {
    val got = asof(
      left = Seq((1L, 100L, 10L)),
      right = Seq((1L, 90L, 5L), (1L, 90L, 9L), (1L, 90L, 7L)))
    assert(got === Map(10L -> Some(9L)))
  }

  test("asofJoin with an empty right side yields all-null matches; empty left yields no rows") {
    val got = asof(left = Seq((1L, 100L, 10L)), right = Seq.empty)
    assert(got === Map(10L -> None))
    assert(asof(left = Seq.empty, right = Seq((1L, 90L, 1L))).isEmpty)
  }

  test("asofJoin keys do not leak across users") {
    val got = asof(
      left = Seq((1L, 100L, 10L), (2L, 100L, 20L)),
      right = Seq((1L, 90L, 1L))) // user 2 has no views
    assert(got === Map(10L -> Some(1L), 20L -> None))
  }

  private def nearest(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
                      tol: Long) =
    TemporalJoins.asofJoinNearest(
      df3(left, "ts", "left_id"), df3(right, "ts", "event_id"),
      key = "user_id", leftTime = "ts", rightTime = "ts",
      rightValues = Seq("event_id" -> "matched_id"), tolerance = tol,
      rightTieBreak = Seq("event_id"))
      .select("left_id", "matched_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("asofJoinNearest picks the closer side; equidistant resolves backward") {
    val got = nearest(
      left = Seq((1L, 100L, 10L), (1L, 200L, 11L), (1L, 310L, 12L)),
      right = Seq((1L, 90L, 1L), (1L, 105L, 2L), (1L, 195L, 3L), (1L, 205L, 4L), (1L, 320L, 5L)),
      tol = 50L)
    // 10 @100: back 1 @90 (d10) vs fwd 2 @105 (d5) -> forward 2
    // 11 @200: back 3 @195 (d5) vs fwd 4 @205 (d5) -> tie -> backward 3
    // 12 @310: back 4 @205 (d105, out) vs fwd 5 @320 (d10) -> forward 5
    assert(got === Map(10L -> Some(2L), 11L -> Some(3L), 12L -> Some(5L)))
  }

  test("asofJoinNearest: tolerance is inclusive and binds both directions") {
    val got = nearest(
      left = Seq((1L, 100L, 10L), (1L, 300L, 11L)),
      right = Seq((1L, 50L, 1L), (1L, 360L, 2L)),
      tol = 50L)
    // 10 @100: back 1 @50 exactly at tolerance -> matches; fwd 2 @360 far
    // 11 @300: back 1 @50 (d250) and fwd 2 @360 (d60) both out -> null
    assert(got === Map(10L -> Some(1L), 11L -> None))
  }

  test("asofJoinNearest: exact-instant right row wins as backward; same-instant ties -> max id") {
    val got = nearest(
      left = Seq((1L, 100L, 10L)),
      right = Seq((1L, 100L, 3L), (1L, 100L, 8L), (1L, 101L, 9L)),
      tol = 10L)
    assert(got === Map(10L -> Some(8L)))
  }

  test("asofJoinNearest rejects a right side carrying the internal __neg_rt column") {
    val r = df3(Seq((1L, 90L, 1L)), "ts", "event_id")
      .withColumn("__neg_rt", org.apache.spark.sql.functions.lit(0L))
    intercept[IllegalArgumentException](
      TemporalJoins.asofJoinNearest(
        df3(Seq((1L, 100L, 10L)), "ts", "left_id"), r,
        key = "user_id", leftTime = "ts", rightTime = "ts",
        rightValues = Seq("event_id" -> "matched_id"), tolerance = 10L))
  }

  test("asofJoinNearest matches a brute-force nearest model on random data") {
    val rnd = new scala.util.Random(31)
    val left = (1L to 120L).map(i => (i % 5, rnd.nextInt(2000).toLong, 1000L + i))
    val right = (1L to 150L).map(i => (i % 5, rnd.nextInt(2000).toLong, i))
    val tol = 60L
    val expected = left.map { case (u, lt, lid) =>
      val cands = right.filter(r => r._1 == u && math.abs(r._2 - lt) <= tol)
      lid -> (if (cands.isEmpty) None else {
        // min distance; tie -> backward; same (dist, side) -> max id
        val best = cands.minBy { case (_, rt, id) =>
          (math.abs(rt - lt), if (rt <= lt) 0 else 1, -id)
        }
        Some(best._3)
      })
    }.toMap
    assert(nearest(left, right, tol) === expected)
  }

  private def range(left: Seq[(Long, Long)], right: Seq[(Long, Long)], w: Long) = {
    val s = spark
    import s.implicits._
    TemporalJoins.rangeJoin(
      left.toDF("user_id", "l_ts"), right.toDF("user_id", "r_ts"),
      key = "user_id", leftTime = "l_ts", rightTime = "r_ts", window = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("rangeJoin bounds are inclusive on both ends and pairs appear exactly once") {
    // window 100: right at l_ts (0 gap), l_ts+100 (== window) match; +101 doesn't
    val got = range(
      left = Seq((1L, 1000L)),
      right = Seq((1L, 1000L), (1L, 1100L), (1L, 1101L), (1L, 999L)), w = 100L)
    assert(got.sorted === Seq((1L, 1000L, 1000L), (1L, 1000L, 1100L)))
  }

  test("rangeJoin finds cross-bucket pairs (right lands in the next time bucket)") {
    // bucket width = window = 100; left at 95 (bucket 0), right at 130
    // (bucket 1): only reachable through the 2-bucket fan-out
    val got = range(left = Seq((1L, 95L)), right = Seq((1L, 130L)), w = 100L)
    assert(got === Seq((1L, 95L, 130L)))
  }

  test("rangeJoin respects keys and tolerates empty sides") {
    assert(range(left = Seq((1L, 100L)), right = Seq((2L, 150L)), w = 100L).isEmpty)
    assert(range(left = Seq.empty, right = Seq((1L, 100L)), w = 100L).isEmpty)
    assert(range(left = Seq((1L, 100L)), right = Seq.empty, w = 100L).isEmpty)
  }

  test("rangeJoin rejects a non-positive window") {
    intercept[IllegalArgumentException](range(Seq((1L, 1L)), Seq((1L, 1L)), 0L))
  }

  test("rangeJoin buckets negative (pre-1970) times correctly — floor, not truncate-toward-zero") {
    // truncating `div` would put left=-50 and right=40 both in bucket 0 (ok by
    // luck) but left=-150/right=-60 in buckets -1/0 vs floor's -2/-1 and drop
    // the pair; cover a spread straddling zero
    val got = range(
      left = Seq((1L, -50L), (1L, -150L), (1L, -250L)),
      right = Seq((1L, 40L), (1L, -60L), (1L, -245L), (1L, -355L)), w = 100L)
    assert(got.sorted === Seq((1L, -250L, -245L), (1L, -150L, -60L), (1L, -50L, 40L)))
  }

  test("TIMESTAMP time columns are rejected (silent cast would coarsen to seconds)") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 100L, 10L)).toDF("user_id", "ts_us", "left_id")
    val tsL = l.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros($"ts_us"))
      .select("user_id", "ts", "left_id")
    val r = Seq((1L, 90L, 1L)).toDF("user_id", "r_ts", "event_id")
    intercept[IllegalArgumentException](
      TemporalJoins.asofJoin(tsL, r, key = "user_id", leftTime = "ts", rightTime = "r_ts",
        rightValues = Seq("event_id" -> "matched_id")))
    intercept[IllegalArgumentException](
      TemporalJoins.rangeJoin(tsL, r, key = "user_id",
        leftTime = "ts", rightTime = "r_ts", window = 10L))
  }

  test("name collisions are rejected up front, not emitted as duplicate columns") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 1L, 1L)).toDF("user_id", "ts", "event_id")
    intercept[IllegalArgumentException]( // value output shadows a left column
      TemporalJoins.asofJoin(l, l, key = "user_id", leftTime = "ts", rightTime = "ts",
        rightValues = Seq("event_id" -> "event_id")))
    intercept[IllegalArgumentException]( // non-key overlap between sides
      TemporalJoins.rangeJoin(l, l, key = "user_id",
        leftTime = "ts", rightTime = "ts", window = 10L))
  }

  // ---- intervalOverlapSelfJoin ----

  private def intervals(rows: Seq[(Long, Long, Long, Long)], bucket: Long,
                        maxFanout: Int = 64): Set[(Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    TemporalJoins.intervalOverlapSelfJoin(
        rows.toDF("k", "id", "s", "e"), key = "k", id = "id",
        start = "s", end = "e", bucket = bucket, maxFanout = maxFanout)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  /** Brute-force model: all id_a < id_b same-key pairs with closed-interval
    * overlap, tagged with the inclusive intersection length. */
  private def bruteOverlaps(rows: Seq[(Long, Long, Long, Long)]): Set[(Long, Long, Long, Long)] =
    (for {
      a <- rows; b <- rows
      if a._1 == b._1 && a._2 < b._2 && a._3 <= a._4 && b._3 <= b._4
      if a._3 <= b._4 && b._3 <= a._4
    } yield (a._1, a._2, b._2, math.min(a._4, b._4) - math.max(a._3, b._3) + 1)).toSet

  test("intervalOverlapSelfJoin == brute force on random intervals (incl. cross-bucket spans)") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 120).map { i =>
      val s0 = rng.nextInt(400).toLong - 100 // negative starts too
      (rng.nextInt(4).toLong, i.toLong, s0, s0 + rng.nextInt(60))
    }
    val got = intervals(rows, bucket = 32L)
    assert(got === bruteOverlaps(rows) && got.nonEmpty)
  }

  test("intervalOverlapSelfJoin: touching endpoints overlap (closed), gap of 1 does not; pairs unique") {
    val rows = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 10L, 20L),  // touch at 10 -> overlap 1
      (1L, 3L, 21L, 30L),                     // gap of 1 after id 2 -> no pair
      (2L, 4L, 0L, 100L), (2L, 5L, 0L, 100L)) // identical long spans: once
    assert(intervals(rows, bucket = 8L) === Set(
      (1L, 1L, 2L, 1L), (2L, 4L, 5L, 101L)))
  }

  test("intervalOverlapSelfJoin: invalid intervals drop; fan-out guard trips loudly") {
    assert(intervals(Seq((1L, 1L, 50L, 40L), (1L, 2L, 0L, 100L)), bucket = 16L).isEmpty)
    val e = intercept[Exception]( // raise_error surfaces as SparkRuntimeException
      intervals(Seq((1L, 1L, 0L, 10000L), (1L, 2L, 5L, 6L)), bucket = 16L, maxFanout = 8))
    assert(e.getMessage.contains("spans more than"), e.getMessage)
  }
}
