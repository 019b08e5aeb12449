package graft.operators

/** Independent sequential mirror for the CEP pattern operator
  * ([[Sessionization.eventPatternCounts]]) — a plain per-key automaton
  * loop sharing no code with the distributed fold, emitted as `VALUES`
  * by `SparkEntry.dynamicOracleSql` (the g45/t38 oracle discipline for
  * semantics a static SQL window cannot express).
  */
object SequentialEvents {

  /** `events` rows are `(user_id, ts_us, event_id, event_type)`; returns
    * `(user_id, n_events, n_matches)` sorted by user — greedy
    * non-overlapping subsequence occurrences of `pattern` over each
    * user's (ts, event_id)-ordered type stream.
    */
  def patternCounts(events: Seq[(Long, Long, Long, String)],
                    pattern: Seq[String]): Seq[(Long, Long, Long)] = {
    require(pattern.nonEmpty, "pattern mirror: pattern must be non-empty")
    events.groupBy(_._1).toSeq.map { case (u, evs) =>
      val types = evs.sortBy(e => (e._2, e._3)).map(_._4)
      var stage = 0
      var cnt = 0L
      types.foreach { t =>
        if (t == pattern(stage)) {
          stage += 1
          if (stage == pattern.length) { cnt += 1; stage = 0 }
        }
      }
      (u, evs.size.toLong, cnt)
    }.sortBy(_._1)
  }
}
