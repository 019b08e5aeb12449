package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM (Spark startup is
  * ~5 s; per-suite sessions would dominate the run).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.create(master = "local[4]", cores = "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  def edgesDF(edges: Seq[(Long, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    edges.toDF("src", "dst")
  }

  /** Result rows of a (vertex, level)-shaped DF as a sorted Seq of pairs. */
  def vertexLevels(df: DataFrame): Seq[(Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted

  def vertexSet(df: DataFrame, col: String = "vertex"): Set[Long] =
    df.select(col).collect().map(_.getLong(0)).toSet
}

/** Driver-side sequential reference models — the "20-line oracles" of
  * SURVEY §5.2, mirroring the reference's semantics (`secondaryServer.c`)
  * with the engine's canonical deterministic ordering (SURVEY §2.2).
  */
object SequentialOracles {
  def adjacency(edges: Seq[(Long, Long)]): Map[Long, Seq[Long]] =
    edges.distinct.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).sorted }

  /** Min-hop levels from the sources (level-synchronous BFS). */
  def bfs(edges: Seq[(Long, Long)], sources: Seq[Long], maxDepth: Int = Int.MaxValue): Map[Long, Int] = {
    val adj = adjacency(edges)
    val level = scala.collection.mutable.Map.empty[Long, Int]
    var frontier = sources.distinct
    frontier.foreach(level(_) = 0)
    var l = 0
    while (frontier.nonEmpty && l < maxDepth) {
      l += 1
      frontier = frontier.flatMap(v => adj.getOrElse(v, Nil)).distinct.filterNot(level.contains)
      frontier.foreach(level(_) = l)
    }
    level.toMap
  }

  /** DFS preorder, lowest-id neighbor first. */
  def dfsPreorder(edges: Seq[(Long, Long)], start: Long): Seq[Long] = {
    val adj = adjacency(edges)
    val seen = scala.collection.mutable.LinkedHashSet.empty[Long]
    def go(v: Long): Unit = {
      seen += v
      adj.getOrElse(v, Nil).foreach(n => if (!seen(n)) go(n))
    }
    go(start)
    seen.toSeq
  }

  /** Reference leaf-set DFS (`secondaryServer.c:93-97`): vertices whose visit
    * spawned zero recursive calls, excluding the start; recursion is fine
    * here (test graphs are ≤ a few hundred vertices).
    */
  def dfsLeaves(edges: Seq[(Long, Long)], start: Long): Seq[Long] = {
    val adj = adjacency(edges)
    val seen = scala.collection.mutable.HashSet.empty[Long]
    val leaves = scala.collection.mutable.ArrayBuffer.empty[Long]
    def go(v: Long): Unit = {
      seen += v
      var spawned = 0
      adj.getOrElse(v, Nil).foreach(n => if (!seen(n)) { spawned += 1; go(n) })
      if (spawned == 0 && v != start) leaves += v
    }
    go(start)
    leaves.toSeq.sorted
  }

  /** SCC labels via brute-force mutual reachability: component = min id of
    * the mutually-reachable set (reachability is reflexive).
    */
  def scc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val vs = edges.flatMap(p => Seq(p._1, p._2)).distinct
    def reach(v: Long): Set[Long] = {
      val adj = adjacency(edges)
      var seen = Set(v)
      var frontier = Seq(v)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(u => adj.getOrElse(u, Nil)).distinct.filterNot(seen)
        seen ++= frontier
      }
      seen
    }
    val fwd = vs.map(v => v -> reach(v)).toMap
    vs.map(v => v -> fwd(v).filter(w => fwd(w).contains(v)).min).toMap
  }

  /** Hop-bounded Bellman-Ford: min cost over paths of ≤ maxHops edges. */
  def weightedSssp(edges: Seq[(Long, Long, Long)], start: Long, maxHops: Int): Map[Long, Long] = {
    var best = Map(start -> 0L)
    for (_ <- 1 to maxHops) {
      val relaxed = edges.flatMap { case (s, d, w) => best.get(s).map(c => d -> (c + w)) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).min }
      best = (best.keySet ++ relaxed.keySet).map(v =>
        v -> math.min(best.getOrElse(v, Long.MaxValue), relaxed.getOrElse(v, Long.MaxValue))).toMap
    }
    best
  }

  /** JVM mirror of graft.functions.Hashing.hash60 (first 15 md5 hex digits,
    * base-16) — lets sequential oracles replay hash-driven operators.
    */
  def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Fixed-iteration PageRank with the exact semantics of Analytics.pageRank. */
  def pageRank(edges: Seq[(Long, Long)], numIter: Int = 10): Map[Long, Double] = {
    val e = edges.distinct
    val vs = e.flatMap(p => Seq(p._1, p._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.size }
    var r = vs.map(_ -> 1.0).toMap
    for (_ <- 1 to numIter) {
      val in = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(p => r(p._1) / outdeg(p._1)).sum
      }
      r = vs.map(v => v -> (0.15 + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    r
  }
}
