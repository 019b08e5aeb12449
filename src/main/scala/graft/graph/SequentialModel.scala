package graft.graph

/** Driver-side sequential reference models of the DFS semantics
  * (`secondaryServer.c:56-108`, leaf record at `secondaryServer.c:93-97`,
  * start filtered at `secondaryServer.c:290`) with the engine's canonical
  * lowest-id-first schedule (SURVEY §2.2(1)).
  *
  * Purpose: generating the driver gate's `VALUES`-literal oracles for
  * `g8_dfs_preorder` / `g9_dfs_leaves` — DFS preorder is not expressible in
  * SQL (a recursive CTE cannot carry the visited set), so Verify computes
  * the expected rows HERE, with plain in-memory recursion that shares no
  * code with [[Traversals]]' Spark path (mirroring the independent model
  * that `TraversalProps` property-checks the same operators against).
  */
object SequentialModel {

  def adjacency(edges: Seq[(Long, Long)]): Map[Long, Seq[Long]] =
    edges.distinct.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).sorted }

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

  /** k-core by the classic QUEUE-based peeling (Matula–Beck shape): remove
    * one sub-k vertex at a time, decrementing neighbors and enqueueing any
    * that fall below k. Deliberately a different algorithm family from
    * [[Analytics.kCore]]'s simultaneous wave peeling — both provably reach
    * the same unique maximal subgraph, so this is an independent oracle for
    * the `g14` VALUES gate, not a mirror. Returns surviving vertex →
    * within-core degree.
    */
  def kCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      if (a != b) {
        adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
      }
    }
    val queue = scala.collection.mutable.Queue.empty[Long]
    adj.keys.foreach(v => if (adj(v).size < k) queue += v)
    while (queue.nonEmpty) {
      val v = queue.dequeue()
      adj.get(v).foreach { ns =>
        ns.foreach { n =>
          val nn = adj(n)
          nn -= v
          if (nn.size == k - 1) queue += n // just dropped below k
        }
        adj -= v
      }
    }
    adj.iterator.map { case (v, ns) => v -> ns.size }.toMap
  }

  /** Synchronous label propagation mirror for the `g15` oracle: same
    * deterministic semantics as [[Analytics.labelPropagation]] (most
    * frequent undirected-neighbor label, ties to the smallest, all
    * vertices updated simultaneously for `numIter` rounds) computed with
    * plain in-memory maps. Like the PageRank oracle, LPA's fixed-iteration
    * contract makes a sequential mirror exact — the operator's semantics
    * IS the iteration.
    */
  def labelPropagation(edges: Seq[(Long, Long)], numIter: Int): Map[Long, Long] = {
    val und = edges.collect { case (a, b) if a != b => (a min b, a max b) }.distinct
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var labels = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to numIter) {
      labels = adj.map { case (v, ns) =>
        val freq = ns.groupBy(labels).map { case (l, xs) => l -> xs.size }
        val best = freq.toSeq.minBy { case (l, n) => (-n, l) }._1
        v -> best
      }
    }
    labels
  }

  /** Reference leaf-set DFS: vertices whose visit spawned zero recursive
    * calls, excluding the start; sorted ascending.
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
}
