package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators — the engine-surface API behind the `e6` (as-of)
  * and `e7` (range) declared queries. The reference has no temporal joins;
  * these are north-star engine surface (SURVEY §2.3) expressed in the two
  * shapes that survive 100 TB:
  *
  *  - [[asofJoin]] — one shuffle on the key, then a single ordered window
  *    pass. Never builds the (left × right-history) product an inequality
  *    join would: the union is linear in |left| + |right| and the window
  *    state is one row per value column.
  *  - [[rangeJoin]] — time-bucketed equi join: each left row fans out to
  *    exactly 2 buckets, so the join is equi on (key, bucket) with a bounded
  *    2× blow-up instead of a quadratic range explosion, and the exact range
  *    predicate is applied after the equi match.
  */
object TemporalJoins {

  /** Time columns must already be integral (e.g. epoch micros). Enforced,
    * not just documented: the internal `.cast("long")` would coarsen a
    * TIMESTAMP to epoch SECONDS, silently changing at-or-before tie
    * semantics for a caller who passed `ts` instead of `ts_us`.
    */
  private def requireIntegralTime(df: DataFrame, c: String, what: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case dt => throw new IllegalArgumentException(
        s"$what time column '$c' must be integral (e.g. epoch micros), got $dt — " +
          "convert first (unix_micros for timestamps) so tie semantics stay exact")
    }
  }

  /** As-of join: each left row picks up, per `rightValues` column, the value
    * from the LATEST right row with the same `key` and
    * `right(rightTime) <= left(leftTime)` (ties at the same instant DO
    * match — "at or before"). Output = all left columns plus one column per
    * `(rightCol, outName)` in `rightValues` (null when no right row
    * precedes).
    *
    * Plan: tag both sides, union, and take `last(..., ignoreNulls)` over a
    * key-partitioned window ordered by `(time, side, rightTieBreak…)` —
    * right rows sort before left rows at the same instant so same-time
    * matches are visible. One shuffle (the window partition), no range
    * join, no per-left scan of right history.
    *
    * Determinism: when several right rows share a timestamp, the one
    * greatest under `rightTieBreak` ascending order wins — pass a unique
    * column (e.g. an event id) for a deterministic result.
    *
    * Null caveat: a right row whose value column is null is skipped by
    * `ignoreNulls` (an earlier non-null value wins) — use a non-null
    * payload column (ids) or coalesce a sentinel beforehand. Time columns
    * are integral (e.g. epoch micros) like [[rangeJoin]]'s — a TIMESTAMP
    * would cast to epoch seconds and silently coarsen tie semantics;
    * convert with `unix_micros` first.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightValues: Seq[(String, String)],
               rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(rightValues.nonEmpty, "asofJoin needs at least one right value column")
    requireIntegralTime(left, leftTime, "asofJoin left")
    requireIntegralTime(right, rightTime, "asofJoin right")
    val leftCols = left.columns.toSeq
    // output = left.* + value columns: a value output name shadowing a left
    // column would produce duplicate column names downstream — reject it
    rightValues.foreach { case (_, out) =>
      require(!leftCols.contains(out),
        s"asofJoin output column '$out' collides with a left column — rename one side")
    }
    val rightValueTypes = rightValues.map { case (c, _) => c -> right.schema(c).dataType }
    val tieTypes = rightTieBreak.map(c => c -> right.schema(c).dataType)
    def nullAs(name: String, dt: org.apache.spark.sql.types.DataType) =
      lit(null).cast(dt).as(name)
    // internal slot names never collide with user columns
    val vSlots = rightValues.indices.map(i => s"__gv$i")
    val tSlots = rightTieBreak.indices.map(i => s"__gt$i")
    val lSlots = leftCols.indices.map(i => s"__gl$i")
    val rightSide = right.select(
      Seq(col(key).as("__gkey"), col(rightTime).cast("long").as("__gtime"), lit(0).as("__gside")) ++
        tieTypes.zip(tSlots).map { case ((c, _), s) => col(c).as(s) } ++
        rightValueTypes.zip(vSlots).map { case ((c, _), s) => col(c).as(s) } ++
        leftCols.zip(lSlots).map { case (c, s) => nullAs(s, left.schema(c).dataType) }: _*)
    val leftSide = left.select(
      Seq(col(key).as("__gkey"), col(leftTime).cast("long").as("__gtime"), lit(1).as("__gside")) ++
        tieTypes.zip(tSlots).map { case ((_, dt), s) => nullAs(s, dt) } ++
        rightValueTypes.zip(vSlots).map { case ((_, dt), s) => nullAs(s, dt) } ++
        leftCols.zip(lSlots).map { case (c, s) => col(c).as(s) }: _*)
    val w = Window.partitionBy("__gkey")
      .orderBy(col("__gtime") +: col("__gside") +: tSlots.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rightSide.unionByName(leftSide)
      .select(
        (lSlots.map(col) :+ col("__gside")) ++
          vSlots.zip(rightValues).map { case (s, (_, out)) =>
            last(when(col("__gside") === 0, col(s)), ignoreNulls = true).over(w).as(out)
          }: _*)
      .filter(col("__gside") === 1)
    matched.select(lSlots.zip(leftCols).map { case (s, c) => col(s).as(c) } ++
      rightValues.map { case (_, out) => col(out) }: _*)
  }

  /** Nearest-direction as-of join (pandas `merge_asof(direction='nearest')`
    * / polars `strategy='nearest'`): each left row picks up the right row
    * with the same key whose time is CLOSEST in either direction, within
    * `tolerance` (inclusive); equidistant candidates resolve BACKWARD
    * (the at-or-before side — matching the convention that past data is
    * the safer default for feature joins). Output = left.* plus one column
    * per `rightValues` entry, null when no right row is in tolerance.
    *
    * Composition, not new machinery: one [[asofJoin]] backward pass plus
    * one on the NEGATED time axis (forward = backward in mirrored time,
    * with the same max-tie-break-at-equal-instant rule), then a per-row
    * arbitration on the two carried match times. Two key shuffles total —
    * still linear in |left| + |right|, never the inequality-join product;
    * the per-direction semantics (latest-at-or-before / earliest-at-or-
    * after, ties by `rightTieBreak` maximum) are inherited verbatim, which
    * is what makes the SQL mirror exact.
    *
    * Same null caveat as [[asofJoin]]: null right VALUE columns are
    * skipped by the underlying `last(ignoreNulls)` — use non-null payloads.
    */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      rightValues: Seq[(String, String)], tolerance: Long,
                      rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(tolerance > 0, s"tolerance must be positive, got $tolerance")
    require(rightValues.nonEmpty, "asofJoinNearest needs at least one right value column")
    val reserved = Seq("__bk_t", "__fw_t", "__neg_lt", "__neg_rt")
    (reserved ++ rightValues.flatMap { case (_, out) => Seq(out + "__bk", out + "__fw") })
      .foreach(n => require(!left.columns.contains(n),
        s"asofJoinNearest uses internal column '$n' — rename the colliding left column"))
    // the right side gets its own internal column (the negated time axis);
    // a pre-existing __neg_rt would be silently replaced by withColumn,
    // changing the forward pass's join semantics without error
    require(!right.columns.contains("__neg_rt"),
      "asofJoinNearest uses internal column '__neg_rt' — rename the colliding right column")
    val withB = asofJoin(left, right, key, leftTime, rightTime,
      rightValues.map { case (c, out) => (c, out + "__bk") } :+ (rightTime -> "__bk_t"),
      rightTieBreak)
    val negL = withB.withColumn("__neg_lt", -col(leftTime))
    val negR = right.withColumn("__neg_rt", -col(rightTime))
    val withF = asofJoin(negL, negR, key, "__neg_lt", "__neg_rt",
      rightValues.map { case (c, out) => (c, out + "__fw") } :+ (rightTime -> "__fw_t"),
      rightTieBreak)
    val bd = col(leftTime) - col("__bk_t")
    val fd = col("__fw_t") - col(leftTime)
    val bOk = col("__bk_t").isNotNull && bd <= tolerance
    val fOk = col("__fw_t").isNotNull && fd <= tolerance
    val useB = bOk && (!fOk || bd <= fd) // tie -> backward
    val outs = rightValues.map { case (_, out) =>
      when(useB, col(out + "__bk"))
        .when(fOk, col(out + "__fw")).as(out)
    }
    withF.select(left.columns.toSeq.map(col) ++ outs: _*)
  }

  /** Range join: all pairs with equal `key` and
    * `left(leftTime) <= right(rightTime) <= left(leftTime) + window`
    * (both bounds INCLUSIVE). Output = left columns plus right's non-key
    * columns — callers keep the two sides' names disjoint (rename before
    * joining). Time columns are integral (e.g. epoch micros; enforced) and
    * may be negative (pre-1970); `window` is in the same unit.
    *
    * Plan: bucket width = `window`, left rows explode to (b, b+1), right
    * rows keep b — every qualifying pair shares exactly one bucket, so the
    * join is EQUI on (key, bucket) with the precise range predicate applied
    * post-match. Candidate volume is bounded at 2·|left| rows joined
    * against per-bucket right partitions: no quadratic per-key fan-out even
    * when a key's history is long, and skewed keys still split across
    * buckets (time spreads them).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTime: String, rightTime: String, window: Long): DataFrame = {
    require(window > 0, s"range window must be positive, got $window")
    requireIntegralTime(left, leftTime, "rangeJoin left")
    requireIntegralTime(right, rightTime, "rangeJoin right")
    // output = left.* + right's non-key columns: overlapping names (beyond
    // the join key) would be ambiguous — callers rename before joining
    val overlap = right.columns.filterNot(_ == key).toSet & left.columns.toSet
    require(overlap.isEmpty,
      s"rangeJoin sides share non-key column names $overlap — rename before joining")
    // Exact integer FLOOR division, not `/` + cast (float division of
    // epoch-micros-sized longs can land one ulp under an integer boundary)
    // and not bare `div` (which truncates toward zero, so pre-1970 negative
    // times would mis-bucket: left=-50 and right=40 with window=100 belong
    // to adjacent buckets -1 and 0, but `div` puts both in 0 ... while
    // left=-150 lands in -1 instead of -2 and silently loses its matches).
    // `(t - pmod(t, w)) div w` is floor division in pure int arithmetic:
    // pmod is the non-negative remainder, so the numerator is the largest
    // multiple of w at or below t.
    def floorDiv(t: String) =
      expr(s"(CAST($t AS BIGINT) - pmod(CAST($t AS BIGINT), $window)) div $window")
    val lb = floorDiv(leftTime)
    val l = left.withColumn("__gb", explode(array(lb, lb + 1)))
    val r = right.withColumn("__gb2", floorDiv(rightTime))
    val rightKeep = right.columns.filterNot(_ == key).toSeq
    l.join(r, l(key) === r(key) && col("__gb") === col("__gb2") &&
        r(rightTime).cast("long") >= l(leftTime).cast("long") &&
        r(rightTime).cast("long") - l(leftTime).cast("long") <= window)
      .select(left.columns.toSeq.map(l(_)) ++ rightKeep.map(r(_)): _*)
  }

  /** Interval-overlap self-join: all unordered pairs of rows with equal
    * `key` whose CLOSED intervals `[start, end]` overlap
    * (`s_a <= e_b AND s_b <= e_a`). Output
    * `(key, id_a, id_b, overlap)` with `id_a < id_b` (each pair once) and
    * `overlap` = the inclusive intersection length
    * `least(e_a,e_b) - greatest(s_a,s_b) + 1`. Interval and id columns are
    * integral (enforced — same reason as [[rangeJoin]]).
    *
    * Plan: each interval explodes to the `bucket`-width time buckets it
    * covers, the join is EQUI on (key, bucket), and each qualifying pair is
    * counted exactly once by attributing it to the bucket containing
    * `greatest(s_a, s_b)` — the later start lies inside BOTH intervals
    * (that is what overlap means), so both sides have that bucket row, and
    * it is unique. Unlike [[rangeJoin]]'s fixed 2-bucket fan-out, fan-out
    * here is `duration/bucket + 1` per row — pick `bucket` near the typical
    * interval length so it stays a small constant; `maxFanout` turns a
    * mis-sized bucket into a loud distributed error instead of a silent
    * 10⁶× row explosion. No quadratic per-key blow-up: candidates are
    * per-(key, bucket) partitions, i.e. intervals that are actually
    * concurrent, and time spreads skewed keys across buckets.
    */
  def intervalOverlapSelfJoin(df: DataFrame, key: String, id: String,
                              start: String, end: String, bucket: Long,
                              maxFanout: Int = 64): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    requireIntegralTime(df, start, "intervalOverlapSelfJoin start")
    requireIntegralTime(df, end, "intervalOverlapSelfJoin end")
    requireIntegralTime(df, id, "intervalOverlapSelfJoin id")
    // floor division in pure int arithmetic (see rangeJoin's derivation)
    def fd(c: String) =
      s"(CAST($c AS BIGINT) - pmod(CAST($c AS BIGINT), $bucket)) div $bucket"
    val base = df.select(col(key).as("__gkey"), col(id).cast("long").as("__gid"),
        col(start).cast("long").as("__gs"), col(end).cast("long").as("__ge"))
      .filter(col("__gs") <= col("__ge")) // empty/invalid intervals overlap nothing
    val exploded = base.withColumn("__gb",
      explode(when(expr(s"${fd("__ge")} - ${fd("__gs")} < $maxFanout"),
        expr(s"sequence(${fd("__gs")}, ${fd("__ge")})"))
        .otherwise(raise_error(format_string(
          s"intervalOverlapSelfJoin: interval [%d, %d] spans more than $maxFanout " +
            s"buckets of width $bucket — widen the bucket or split the interval",
          col("__gs"), col("__ge"))).cast("array<bigint>"))))
    val a = exploded.select(col("__gkey"), col("__gb"), col("__gid").as("id_a"),
      col("__gs").as("s_a"), col("__ge").as("e_a"))
    val b = exploded.select(col("__gkey"), col("__gb"), col("__gid").as("id_b"),
      col("__gs").as("s_b"), col("__ge").as("e_b"))
    a.join(b, Seq("__gkey", "__gb"))
      .filter(col("id_a") < col("id_b") &&
        col("s_a") <= col("e_b") && col("s_b") <= col("e_a") &&
        // attribution bucket: exactly one per pair, covered by both sides
        col("__gb") === expr(
          s"(greatest(s_a, s_b) - pmod(greatest(s_a, s_b), $bucket)) div $bucket"))
      .select(col("__gkey").as(key), col("id_a"), col("id_b"),
        (least(col("e_a"), col("e_b")) - greatest(col("s_a"), col("s_b")) + 1).as("overlap"))
  }
}
