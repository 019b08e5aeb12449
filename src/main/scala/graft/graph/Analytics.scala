package graft.graph

import org.apache.spark.graphx.{Edge, Graph => XGraph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics beyond the reference's BFS/DFS surface (SURVEY §2.3):
  * degree stats, connected components, PageRank, triangle counting.
  *
  * The reference has no analytics beyond traversal (its whole compute surface
  * is `secondaryServer.c:56-179`); these are the natural extensions on the
  * same edge-list model, per the project north star (GraphX + Pregel).
  *
  * Implementation split:
  *  - connectedComponents / pageRank: GraphX built-ins (Pregel BSP — the same
  *    level-synchronous structure the reference hand-rolls with threads at
  *    `secondaryServer.c:150-161`).
  *  - degrees / triangles: plain DataFrame plans — they are joins/aggs, so
  *    Catalyst + AQE (broadcast, skew splitting) serve better than RDDs.
  */
object Analytics {

  /** Distinct vertex ids appearing as src or dst: `(vertex BIGINT)`. */
  def vertices(edges: DataFrame): DataFrame = {
    val s = edges.select(col("src").cast("long").as("vertex"))
    val d = edges.select(col("dst").cast("long").as("vertex"))
    s.union(d).distinct()
  }

  /** Per-vertex in/out degree over distinct edges:
    * `(vertex BIGINT, out_degree BIGINT, in_degree BIGINT)`.
    * One shuffle per side + one join; vertices with no in (resp. out) edges
    * get 0, matching the SQL oracle's FULL OUTER + COALESCE shape.
    */
  def degrees(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")).distinct()
    val out = e.groupBy(col("src").as("vertex")).agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("dst").as("vertex")).agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("vertex"), "full_outer")
      .select(
        col("vertex"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
  }

  /** Connected components over the underlying undirected graph.
    * Returns `(vertex BIGINT, component BIGINT)` where component = min vertex
    * id in the component (GraphX's labeling, which is also what the DuckDB
    * reachability-closure oracle computes). GraphX CC propagates labels in
    * both edge directions, i.e. treats the graph as undirected.
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val edgeRdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].rdd.map { case (s, d) => Edge(s, d, ()) }
    val g = XGraph.fromEdges(edgeRdd, (), StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
    val cc = g.connectedComponents().vertices.map { case (v, c) => (v, c) }
    val out = cc.toDF("vertex", "component")
    g.unpersist(blocking = false)
    out
  }

  /** Static PageRank (GraphX, `numIter` fixed iterations, reset 0.15).
    * `(vertex BIGINT, rank DOUBLE)`. Float iteration ⇒ no SQL oracle; checked
    * by rows-only + property tests (rank sums ≈ |V|).
    */
  def pageRank(edges: DataFrame, numIter: Int = 10, resetProb: Double = 0.15): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val edgeRdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].rdd.map { case (s, d) => Edge(s, d, ()) }
    val g = XGraph.fromEdges(edgeRdd, (), StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
    val pr = g.staticPageRank(numIter, resetProb).vertices.map { case (v, r) => (v, r) }
    val out = pr.toDF("vertex", "rank")
    g.unpersist(blocking = false)
    out
  }

  /** Per-vertex triangle count over the underlying undirected simple graph
    * (self-loops dropped, edges canonicalized to a<b, deduped):
    * `(vertex BIGINT, triangles BIGINT)`; only vertices in ≥1 triangle appear.
    *
    * Pure DataFrame plan: wedge join (e1 ⋈ e2 on shared low endpoint) then
    * closing-edge semi-check — the standard distributed triangle enumeration.
    * AQE handles the skew on high-degree vertices; at 100 TB add degree-based
    * vertex ordering (orient edges low-degree→high-degree) — noted, not needed
    * at test scale.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges
      .select(col("src").cast("long").as("s"), col("dst").cast("long").as("d"))
      .filter(col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"), greatest(col("s"), col("d")).as("b"))
      .distinct()
    val tri = und.as("e1")
      .join(und.as("e2"), col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .join(und.as("e3"), col("y") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
    tri.select(col("x").as("vertex"))
      .union(tri.select(col("y").as("vertex")))
      .union(tri.select(col("z").as("vertex")))
      .groupBy("vertex").agg(count(lit(1)).as("triangles"))
      .orderBy("vertex")
  }
}
