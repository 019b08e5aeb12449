package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-level sessionization (gaps-and-islands): label every event with a
  * per-key session sequence number, where a new session starts whenever the
  * gap to the previous event exceeds `gapUs`. The aggregate cousin
  * (`session_window`, one row per session) is `EventStreams.sessionCounts` /
  * `st3`; this operator is the ENRICHMENT form — the original rows survive,
  * each stamped with its session — which is what feature pipelines join on.
  *
  * Absent from the reference (no time, no sessions anywhere in its C
  * surface); part of the engine's north-star event surface.
  *
  * Scale shape: one hash exchange on `key` and one sort serve BOTH window
  * passes (the lag and the running sum share partitioning + ordering, so
  * Catalyst plans a single Exchange + Sort); no driver participation, no
  * skew beyond what the key distribution already has. Session numbering is
  * per-key (not global), so ids never need a global sequence — the 100 TB
  * form of "give every session an id".
  */
object Sessionization {

  /** Append `session_seq` (1-based, per `key`, in `(time, tieBreak*)`
    * order): a new session opens at the first event and whenever
    * `time - previous time > gapUs` (events exactly `gapUs` apart stay in
    * one session — strict inequality, matching `session_window`'s
    * half-open `[start, last + gap)` bound).
    *
    * `(time, tieBreak*)` must totally order each key's rows for the
    * numbering to be deterministic — pass a unique column (e.g. event id)
    * when timestamps can collide. Time must be integral (epoch micros);
    * rejected otherwise, same contract as [[TemporalJoins]].
    */
  def assignSessions(df: DataFrame, key: String, time: String, gapUs: Long,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    require(gapUs > 0, s"session gap must be positive, got $gapUs")
    requireIntegralTime(df, time, "assignSessions")
    require(!df.columns.contains("session_seq"),
      "assignSessions appends a 'session_seq' column but the input already has one — rename it first")
    val order = (col(time) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(key).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // first row of a key has no lag -> null gap -> coalesce opens a session
    val opens = coalesce(col(time) - lag(col(time), 1).over(w) > gapUs, lit(true))
    df.withColumn("__open", opens.cast("int"))
      .withColumn("session_seq", sum(col("__open")).over(run).cast("long"))
      .drop("__open")
  }

  /** Interval islands (merge overlapping/touching intervals): collapse each
    * key's `[start, end]` intervals into maximal connected spans — the
    * interval cousin of [[assignSessions]] (points + gap there, explicit
    * extents here) and the classic gaps-and-islands operator: coverage
    * spans from bookings, outage windows from overlapping incidents,
    * contiguous validity ranges from versioned rows.
    *
    * An interval joins the current island when its start is ≤ the running
    * max END seen so far (touching counts as connected — closed-interval
    * semantics); otherwise it opens a new island. Output one row per
    * island: `(key, island_seq, island_start, island_end, n_intervals)`,
    * with `island_end` the max end (an early long interval may cover later
    * ones — running max, not last end).
    *
    * Inverted intervals (`end < start`) are rejected — a silent drop or
    * clamp would hide upstream data bugs; filter first (e.g. e17's
    * ship-before-order halves) if the domain produces them.
    *
    * Scale shape: identical to [[assignSessions]] — the lag-max and the
    * running island sum share one hash exchange on `key` and one sort
    * (same partitioning + ordering ⇒ Catalyst plans a single
    * Exchange + Sort), then a per-(key, island) hash aggregate. Nothing
    * driver-side, no self-join: linear in rows where the naive
    * overlap-pairs formulation is quadratic per key.
    */
  def mergeIntervals(df: DataFrame, key: String, start: String, end: String,
                     tieBreak: Seq[String] = Nil): DataFrame = {
    requireIntegralTime(df, start, "mergeIntervals")
    requireIntegralTime(df, end, "mergeIntervals")
    val order = (col(start) +: col(end) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(key).orderBy(order: _*)
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // first interval of a key has no prior -> null max -> opens island 1
    df.withColumn("__open",
        when(col(end) < col(start),
          raise_error(format_string(
            s"mergeIntervals: inverted interval [%d, %d] (end < start) — filter or fix upstream",
            col(start), col(end))).cast("boolean"))
          .otherwise(coalesce(col(start) > max(col(end)).over(prior), lit(true)))
          .cast("int"))
      .withColumn("island_seq", sum(col("__open")).over(run).cast("long"))
      .groupBy(col(key), col("island_seq"))
      .agg(min(col(start)).as("island_start"), max(col(end)).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** DuckDB mirror of [[mergeIntervals]] over an interval derivation
    * `intervalSql` producing `(k, s, e, tb)` columns — same running-max
    * open test, same closed-interval touch rule, same aggregate.
    */
  def mergeIntervalsSql(intervalSql: String): String =
    s"""WITH iv AS ($intervalSql),
       |fl AS (SELECT k, s, e, tb,
       |              COALESCE(s > MAX(e) OVER (PARTITION BY k ORDER BY s, e, tb
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), TRUE)::INT AS op
       |       FROM iv),
       |isl AS (SELECT k, s, e,
       |               SUM(op) OVER (PARTITION BY k ORDER BY s, e, tb
       |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_seq
       |        FROM fl)
       |SELECT k, island_seq::BIGINT AS island_seq, MIN(s)::BIGINT AS island_start,
       |       MAX(e)::BIGINT AS island_end, COUNT(*)::BIGINT AS n_intervals
       |FROM isl GROUP BY k, island_seq""".stripMargin

  /** Time columns must already be integral (epoch micros) — a silent
    * timestamp comparison in a mixed-unit gap would be wrong. Same
    * enforcement as `TemporalJoins.requireIntegralTime`.
    */
  /** Complex-event-processing pattern counts — the MATCH_RECOGNIZE /
    * Flink-CEP shape relational engines bolt on for "A followed by B
    * followed by C" questions: per key, count the GREEDY NON-OVERLAPPING
    * occurrences of `pattern` as a SUBSEQUENCE of the key's time-ordered
    * event-type stream (skip-till-next-match: unrelated events between
    * stages are ignored; each event is consumed by at most one
    * occurrence; after a completion the automaton resets). Greedy
    * left-to-right is the canonical deterministic choice — it maximizes
    * the disjoint-occurrence count for subsequence patterns.
    *
    * Input `events` needs `(user_id, ts_us, event_id, event_type)`;
    * returns `(user_id, n_events, n_matches)` for every key, ordered.
    *
    * Scale shape: ONE key-aggregate collecting each key's (ts, id, type)
    * stream, then the automaton runs as a codegen'd `aggregate` lambda
    * over the array-sorted stream — row-local, no second shuffle, no
    * driver involvement. Per-key state is the key's own event list (the
    * e26/EWMA residual shape — the honest cost of an order-dependent
    * fold; shard by (key, epoch) past ~10⁴ events/key). Not
    * SQL-window-expressible (the consumed-event constraint is a fold),
    * so the oracle is an independent sequential automaton's VALUES —
    * the g45/t38 discipline.
    */
  def eventPatternCounts(events: DataFrame,
                         pattern: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(pattern.nonEmpty, "eventPatternCounts: pattern must be non-empty")
    val n = pattern.length
    val pat = typedLit(pattern)
    val acc0 = struct(lit(0).as("stage"), lit(0L).as("cnt"))
    events
      .groupBy("user_id")
      .agg(collect_list(struct(col("ts_us"), col("event_id"), col("event_type"))).as("evs"))
      .select(col("user_id"), size(col("evs")).cast("long").as("n_events"),
        aggregate(
          transform(array_sort(col("evs")), e => e.getField("event_type")),
          acc0,
          (acc, t) => {
            val stage = acc.getField("stage")
            val cnt = acc.getField("cnt")
            val hit = t === element_at(pat, stage + 1)
            val nextStage = when(hit && stage === n - 1, 0)
              .when(hit, stage + 1).otherwise(stage)
            val nextCnt = when(hit && stage === n - 1, cnt + 1L).otherwise(cnt)
            struct(nextStage.as("stage"), nextCnt.as("cnt"))
          }).getField("cnt").as("n_matches"))
      .orderBy("user_id")
  }

  private def requireIntegralTime(df: DataFrame, c: String, what: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case dt => throw new IllegalArgumentException(
        s"$what time column '$c' must be integral (e.g. epoch micros), got $dt — " +
          "convert first (unix_micros for timestamps) so gap arithmetic stays exact")
    }
  }
}
