package graft.graph

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of named directed graphs, stored as sparse edge-list Parquet.
  *
  * Reference model: a "database" is a directory of graph files whose file
  * name is the graph's identity (`utils.h:35`, `client.c:47-51`); op 1 adds a
  * graph, op 2 blind-overwrites it (`primaryServer.c:40-63`). Per SURVEY
  * §2.2(4) we tighten to DB semantics: `add` fails if the graph exists,
  * `modify` requires existence — capability parity with saner errors.
  *
  * Layout: `<root>/<name>/edges` Parquet with schema `(src LONG, dst LONG)`.
  * Parquet replaces the reference's uncompressed text matrices
  * (`primaryServer.c:43-49`), which were re-parsed on every read query
  * (`secondaryServer.c:208-228`); here the columnar footer carries the schema
  * and readers prune/push down. A 100 TB graph is just a bigger directory —
  * writes go through the normal distributed `DataFrameWriter` path.
  */
class GraphCatalog(spark: SparkSession, root: String) {

  private def edgesPath(name: String) = s"$root/$name/edges"

  private def validateName(name: String): Unit =
    require(name.nonEmpty && name.matches("[A-Za-z0-9_.-]+"), s"invalid graph name: '$name'")

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(name: String): Boolean = {
    validateName(name)
    fs.exists(new Path(edgesPath(name)))
  }

  private def normalized(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))

  /** Op 1 (`client.c:77-94`, `primaryServer.c:59-60`): create a named graph.
    * Fails if it already exists (SURVEY §2.2(4)).
    */
  def addGraph(name: String, edges: DataFrame): Unit = {
    validateName(name)
    if (exists(name)) throw new AnalysisException(
      errorClass = "TABLE_OR_VIEW_ALREADY_EXISTS", messageParameters = Map("relationName" -> name))
    normalized(edges).write.mode("errorifexists").parquet(edgesPath(name))
  }

  /** Op 2 (`primaryServer.c:40-63`): full overwrite — last-writer-wins, no
    * merge, matching the reference's `fopen(..., "w")` truncate. Requires the
    * graph to exist (SURVEY §2.2(4)).
    */
  def modifyGraph(name: String, edges: DataFrame): Unit = {
    validateName(name)
    if (!exists(name)) throw new AnalysisException(
      errorClass = "TABLE_OR_VIEW_NOT_FOUND", messageParameters = Map("relationName" -> s"`$name`"))
    normalized(edges).write.mode("overwrite").parquet(edgesPath(name))
  }

  /** Read a graph's edge list. */
  def graph(name: String): DataFrame = {
    validateName(name)
    if (!exists(name)) throw new AnalysisException(
      errorClass = "TABLE_OR_VIEW_NOT_FOUND", messageParameters = Map("relationName" -> s"`$name`"))
    spark.read.parquet(edgesPath(name))
  }

  def dropGraph(name: String): Boolean = {
    validateName(name)
    fs.delete(new Path(s"$root/$name"), true)
  }

  def listGraphs(): Seq[String] = {
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  // ----- traversal / analytics API over named graphs (the reference's ops) --

  /** Op 4 (`secondaryServer.c:313-400`): BFS levels from a 1-based-id world;
    * validates the start vertex exists (SURVEY §2.2(3) — the reference never
    * checks and underflows on 0).
    */
  def bfs(name: String, start: Long, maxDepth: Int = Int.MaxValue): DataFrame = {
    val e = graph(name)
    requireVertex(e, start)
    Traversals.bfs(e, start, maxDepth)
  }

  /** Op 3 (`secondaryServer.c:237-311`): canonical deterministic DFS preorder. */
  def dfs(name: String, start: Long): DataFrame = {
    val e = graph(name)
    requireVertex(e, start)
    Traversals.dfsPreorder(e, start)
  }

  /** Op 3, reference leaf-set semantics (`secondaryServer.c:93-97`). */
  def dfsLeaves(name: String, start: Long): DataFrame = {
    val e = graph(name)
    requireVertex(e, start)
    Traversals.dfsLeaves(e, start)
  }

  private def requireVertex(edges: DataFrame, v: Long): Unit = {
    // isEmpty = take(1) under the hood — stops at the first matching row
    // instead of counting the whole scan
    val found = !edges.filter(col("src") === v || col("dst") === v).isEmpty
    if (!found) throw new IllegalArgumentException(s"start vertex $v not present in graph")
  }
}
