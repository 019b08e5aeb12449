package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph traversals, re-expressed Spark-first.
  *
  * Reference semantics (see SURVEY.md §2):
  *  - BFS is level-synchronous and includes the start vertex
  *    (`secondaryServer.c:111-179`, start recorded at `secondaryServer.c:380-385`).
  *    The reference's within-level order is a thread race; we canonicalize to
  *    ascending vertex id within level (SURVEY §2.2(2)).
  *  - DFS in the reference spawns a thread per unvisited neighbor and records
  *    only the vertices that spawned zero children — the traversal-tree leaves —
  *    excluding the start vertex (`secondaryServer.c:56-108`, leaf record at
  *    `secondaryServer.c:93-97`, start filtered at `secondaryServer.c:290`).
  *    We canonicalize to lowest-id-neighbor-first (SURVEY §2.2(1)) and expose
  *    both the full preorder (`dfsPreorder`) and the reference's leaf-set
  *    (`dfsLeaves`).
  *
  * Scale notes:
  *  - `bfs` / `shortestPathsFrom` are frontier-iterative DataFrame jobs: each
  *    superstep is one shuffle-join of the frontier against the edge table,
  *    with `localCheckpoint` truncating lineage (the classic iterative-join
  *    blowup fix — GraphX's Pregel does the same internally). The edge table is
  *    persisted once and reused across supersteps, so a 100 TB edge list is
  *    scanned from parquet once, not per level.
  *  - DFS is inherently sequential (each step depends on the full visited set),
  *    so `dfsPreorder` is explicitly scoped to graphs whose adjacency fits on
  *    the driver — faithful to the reference, whose graphs cap at 30 vertices
  *    (`utils.h:26`). For reachability at scale, use `bfs` (same visited set,
  *    level order instead of preorder).
  */
object Traversals {

  /** Level-synchronous BFS from `start` over `edges(src, dst)`.
    *
    * Returns `(vertex BIGINT, level INT)`, one row per reachable vertex with
    * its minimum hop distance, including `(start, 0)`; deterministic
    * regardless of execution order because min-distance is execution-invariant.
    *
    * @param maxDepth stop after this many supersteps (vertices farther than
    *                 maxDepth are omitted); Int.MaxValue for full closure.
    */
  def bfs(edges: DataFrame, start: Long, maxDepth: Int = Int.MaxValue): DataFrame =
    multiSourceBfs(edges, Seq(start), maxDepth)

  /** Multi-source BFS: level = min hops from any source. Same contract as
    * [[bfs]]; sources all sit at level 0.
    */
  def multiSourceBfs(edges: DataFrame, sources: Seq[Long], maxDepth: Int = Int.MaxValue): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    require(sources.nonEmpty, "BFS requires at least one start vertex")

    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var frontier = sources.distinct.toDF("vertex").localCheckpoint(true)
      var visited = frontier.withColumn("level", lit(0)).localCheckpoint(true)
      var level = 0
      var done = false
      while (!done && level < maxDepth) {
        // expand frontier one hop; anti-join drops already-visited vertices
        val next = frontier
          .join(e, frontier("vertex") === e("src"))
          .select(e("dst").as("vertex"))
          .distinct()
          .join(visited, Seq("vertex"), "left_anti")
          .localCheckpoint(true) // materialize: truncates lineage per superstep
        if (next.isEmpty) done = true
        else {
          level += 1
          visited = visited.union(next.withColumn("level", lit(level))).localCheckpoint(true)
          frontier = next
        }
      }
      visited.select($"vertex", $"level".cast("int").as("level")).orderBy("level", "vertex")
    } finally e.unpersist(blocking = false)
  }

  /** Vertices reachable from `start` (BFS visited set) as `(vertex BIGINT)`. */
  def reachable(edges: DataFrame, start: Long, maxDepth: Int = Int.MaxValue): DataFrame =
    bfs(edges, start, maxDepth).select("vertex")

  /** Deterministic sequential DFS preorder from `start`; lowest-id neighbor
    * first. Returns `(vertex BIGINT, pos INT)` with pos = 0-based visit order.
    *
    * Driver-side by design (see scale notes above): collects the adjacency of
    * the *reachable subgraph only* — for huge graphs call with a pre-filtered
    * edge set or use [[bfs]].
    */
  def dfsPreorder(edges: DataFrame, start: Long): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val adj = collectAdjacency(edges, start)
    val order = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.HashSet.empty[Long]
    // explicit stack (recursion depth unbounded); push children in reverse
    // sorted order so the lowest id is popped first
    val stack = scala.collection.mutable.Stack[Long](start)
    while (stack.nonEmpty) {
      val v = stack.pop()
      if (!seen(v)) {
        seen += v
        order += v
        adj.getOrElse(v, Array.empty[Long]).reverseIterator.foreach { n =>
          if (!seen(n)) stack.push(n)
        }
      }
    }
    order.toSeq.zipWithIndex.map { case (v, i) => (v, i) }.toDF("vertex", "pos")
  }

  /** Reference leaf-set DFS semantics (`secondaryServer.c:93-97`): the
    * vertices whose visit spawned zero recursive calls — i.e. every neighbor
    * was already visited at the moment of the visit — excluding the start
    * vertex (`secondaryServer.c:290`). Deterministic lowest-id-first schedule.
    * Returns `(vertex BIGINT)` ordered by id.
    */
  def dfsLeaves(edges: DataFrame, start: Long): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val adj = collectAdjacency(edges, start)
    val seen = scala.collection.mutable.HashSet.empty[Long]
    val leaves = scala.collection.mutable.ArrayBuffer.empty[Long]
    def visit(v: Long): Unit = {
      seen += v
      var spawned = 0
      adj.getOrElse(v, Array.empty[Long]).foreach { n =>
        if (!seen(n)) { spawned += 1; visit(n) }
      }
      if (spawned == 0 && v != start) leaves += v
    }
    visit(start)
    leaves.toSeq.sorted.map(Tuple1(_)).toDF("vertex")
  }

  /** Collect the reachable subgraph's adjacency to the driver, neighbors
    * sorted ascending. Restricting to the reachable set (computed
    * distributively first) bounds driver memory by the traversal's actual
    * footprint, not the full graph.
    */
  private def collectAdjacency(edges: DataFrame, start: Long): Map[Long, Array[Long]] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val reach = bfs(edges, start).select("vertex")
    edges
      .join(reach, edges("src") === reach("vertex"), "left_semi")
      .select(col("src").cast("long"), col("dst").cast("long"))
      .distinct()
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .map { case (s, arr) => s -> arr.map(_._2).sorted }
  }
}
