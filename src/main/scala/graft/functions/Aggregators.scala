package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (`Aggregator`) — the custom-aggregation surface of the
  * engine (SURVEY §2.3 "UDF/UDAF/UDTF" row; the scalar-function slot is
  * filled by the native codegen'd [[DotProduct]] expression, which beats a
  * `udf()` wrapper).
  *
  * [[TopKByScore]] is the canonical bounded-state example: top-k rows per
  * group by (score desc, id asc) with O(k) state per group — at 100 TB a
  * full per-group sort materializes the whole group per key, while this
  * carries at most k entries through the partial/merge path (classic
  * bounded-heap aggregation; Spark's own `TakeOrderedAndProject` does the
  * same trick for global top-k, but not per-group).
  */
object Aggregators {

  /** One scored row: the aggregation input and output element. */
  final case class ScoredId(score: Long, id: Long)

  /** Top-k by (score desc, id asc): deterministic under ties. The buffer is
    * a sorted Seq capped at k — small enough that Seq insertion beats heap
    * bookkeeping for the k this is meant for (top-N-per-group, N ≲ 100).
    */
  final class TopKByScore(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    require(k > 0, "k must be positive")

    private def better(a: ScoredId, b: ScoredId): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    private def insert(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
      if (buf.length == k && better(buf.last, x)) buf
      else {
        // buf stays sorted by `better`, so a positional splice is O(k) per
        // row — no per-row re-sort (round-3 verdict)
        val i = buf.indexWhere(e => better(x, e))
        val at = if (i < 0) buf.length else i
        val (pre, post) = buf.splitAt(at)
        ((pre :+ x) ++ post).take(k)
      }

    def zero: Seq[ScoredId] = Vector.empty
    def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = insert(buf, x)
    def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
      b.foldLeft(a)(insert)
    def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf
    // array<struct<score,id>> on the wire: structured (not kryo-opaque) so
    // the query can posexplode the finished value
    def bufferEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
    def outputEncoder: Encoder[Seq[ScoredId]] = bufferEncoder
  }

  /** KMV (k-minimum-values) distinct-count sketch state: the k smallest
    * DISTINCT values seen, kept sorted ascending. O(k) bounded state through
    * the partial/merge path, and union-mergeable — min-k of two sketches'
    * union IS the sketch of the combined input — so per-partition partials
    * combine associatively, and sketches of disjoint corpora (yesterday's
    * shard, today's shard) merge without re-reading either. That
    * mergeability is what an exact `COUNT(DISTINCT)` can never give you at
    * 100 TB: exact distinct must shuffle every distinct value; this carries
    * k longs per group. Estimate: (k-1) * 2^60 / kth_min for 60-bit uniform
    * hashes ([[graft.functions.Hashing.hash60]]), exact when fewer than k
    * values were seen (see [[graft.llm.Sketches]]).
    */
  /** Elementwise maximum of equal-length long arrays — the MaxSim rollup
    * ([[graft.llm.Retrieval.maxSimTopK]]): the per-group state is ONE
    * Q-long buffer through the partial/merge path, so the per-document
    * max never shuffles the |tokens| × Q row expansion a
    * posexplode/groupBy formulation would (measured 209s → seconds at
    * sf0.1). Empty buffer = identity; mixed lengths fail loudly.
    */
  final class ElemMaxLongs extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {
    private def mx(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        require(a.length == b.length,
          s"ElemMaxLongs: mixed array lengths ${a.length} vs ${b.length}")
        Vector.tabulate(a.length)(i => math.max(a(i), b(i)))
      }
    def zero: Seq[Long] = Vector.empty
    def reduce(buf: Seq[Long], x: Seq[Long]): Seq[Long] = mx(buf, x)
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = mx(a, b)
    def finish(buf: Seq[Long]): Seq[Long] = buf
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }

  final class MinKLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 0, "k must be positive")

    private def insert(buf: Seq[Long], x: Long): Seq[Long] =
      if (buf.length == k && x >= buf.last) buf
      else if (buf.contains(x)) buf // distinctness: a re-seen value is a no-op
      else {
        val i = buf.indexWhere(_ > x)
        val at = if (i < 0) buf.length else i
        val (pre, post) = buf.splitAt(at)
        ((pre :+ x) ++ post).take(k)
      }

    def zero: Seq[Long] = Vector.empty
    def reduce(buf: Seq[Long], x: Long): Seq[Long] = insert(buf, x)
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = b.foldLeft(a)(insert)
    def finish(buf: Seq[Long]): Seq[Long] = buf
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }
}
