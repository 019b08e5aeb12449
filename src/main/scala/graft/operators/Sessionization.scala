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

  /** Time columns must already be integral (epoch micros) — a silent
    * timestamp comparison in a mixed-unit gap would be wrong. Same
    * enforcement as `TemporalJoins.requireIntegralTime`.
    */
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
