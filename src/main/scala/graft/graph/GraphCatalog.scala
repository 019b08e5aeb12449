package graft.graph

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{AnalysisException, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Catalog of named directed graphs, stored as sparse edge-list Parquet with
  * an explicit vertex set.
  *
  * Reference model: a "database" is a directory of graph files whose file
  * name is the graph's identity (`utils.h:35`, `client.c:47-51`); op 1 adds a
  * graph, op 2 blind-overwrites it (`primaryServer.c:40-63`). Per SURVEY
  * §2.2(4) we tighten to DB semantics: `add` fails if the graph exists,
  * `modify` requires existence — capability parity with saner errors.
  *
  * Layout: `<root>/<name>/edges` Parquet `(src LONG, dst LONG)` plus
  * `<root>/<name>/vertices` Parquet `(id LONG)`. The vertex table matters
  * for parity: the reference's dense matrix carries its vertex count in the
  * header (`primaryServer.c:43`), so a graph may contain ISOLATED vertices
  * (all-zero rows/columns) that an edge list alone cannot represent — and
  * traversing from one is legal (BFS from an isolated vertex returns just
  * that vertex, `secondaryServer.c:380`). When no vertex set is supplied,
  * it is derived from the edge endpoints.
  *
  * Parquet replaces the reference's uncompressed text matrices, which were
  * re-parsed on every read query (`secondaryServer.c:208-228`); here the
  * columnar footer carries the schema and readers prune/push down. A 100 TB
  * graph is just a bigger directory — writes go through the normal
  * distributed `DataFrameWriter` path.
  */
class GraphCatalog(spark: SparkSession, root: String) {

  private def edgesPath(name: String) = s"$root/$name/edges"
  private def verticesPath(name: String) = s"$root/$name/vertices"

  private def validateName(name: String): Unit =
    require(name.nonEmpty && name.matches("[A-Za-z0-9_.-]+"), s"invalid graph name: '$name'")

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(name: String): Boolean = {
    validateName(name)
    fs.exists(new Path(edgesPath(name)))
  }

  /** Endpoints normalized to LONG; every OTHER column rides along as an
    * edge attribute (property-graph support — the reference's dense matrix
    * cannot express attributes, `primaryServer.c:43`, but a graph engine
    * needs "BFS only over edges where type='follows'").
    */
  private def normalized(edges: DataFrame): DataFrame =
    edges.select(
      Seq(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")) ++
        edges.columns.filterNot(c => c == "src" || c == "dst").map(col).toSeq: _*)

  /** Explicit vertex sets keep their attribute columns too (first column is
    * the id, deduplicated on it); derived sets are bare endpoint ids.
    */
  private def vertexSetOf(edges: DataFrame, explicit: Option[DataFrame]): DataFrame =
    explicit match {
      case Some(v) => v.select(
          Seq(col(v.columns.head).cast("long").as("id")) ++ v.columns.tail.map(col).toSeq: _*)
        .dropDuplicates("id")
      case None => edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct()
    }

  private def write(name: String, edges: DataFrame, vertices: Option[DataFrame], mode: String): Unit = {
    val e = normalized(edges)
    e.write.mode(mode).parquet(edgesPath(name))
    vertexSetOf(e, vertices).write.mode("overwrite").parquet(verticesPath(name))
  }

  /** Op 1 (`client.c:77-94`, `primaryServer.c:59-60`): create a named graph.
    * Fails if it already exists (SURVEY §2.2(4)).
    *
    * @param vertices optional explicit vertex set (first column, cast to
    *                 long) — pass it to preserve isolated vertices, e.g.
    *                 `1..n` from a matrix header; defaults to the edge
    *                 endpoints.
    */
  def addGraph(name: String, edges: DataFrame, vertices: Option[DataFrame] = None): Unit = {
    validateName(name)
    if (exists(name)) throw new AnalysisException(
      errorClass = "TABLE_OR_VIEW_ALREADY_EXISTS", messageParameters = Map("relationName" -> name))
    write(name, edges, vertices, "errorifexists")
  }

  /** Op 2 (`primaryServer.c:40-63`): full overwrite — last-writer-wins, no
    * merge, matching the reference's `fopen(..., "w")` truncate. Requires the
    * graph to exist (SURVEY §2.2(4)).
    */
  def modifyGraph(name: String, edges: DataFrame, vertices: Option[DataFrame] = None): Unit = {
    validateName(name)
    if (!exists(name)) throw new AnalysisException(
      errorClass = "TABLE_OR_VIEW_NOT_FOUND", messageParameters = Map("relationName" -> s"`$name`"))
    write(name, edges, vertices, "overwrite")
  }

  /** Read a graph's edge list. */
  def graph(name: String): DataFrame = {
    validateName(name)
    if (!exists(name)) throw new AnalysisException(
      errorClass = "TABLE_OR_VIEW_NOT_FOUND", messageParameters = Map("relationName" -> s"`$name`"))
    spark.read.parquet(edgesPath(name))
  }

  /** Read a graph's vertex set `(id LONG)` — includes isolated vertices when
    * the graph was written with an explicit set. Graphs written by older
    * layouts (no vertices dir) fall back to edge endpoints.
    */
  def vertices(name: String): DataFrame = {
    validateName(name)
    if (!exists(name)) throw new AnalysisException(
      errorClass = "TABLE_OR_VIEW_NOT_FOUND", messageParameters = Map("relationName" -> s"`$name`"))
    if (fs.exists(new Path(verticesPath(name)))) spark.read.parquet(verticesPath(name))
    else vertexSetOf(normalized(graph(name)), None)
  }

  def dropGraph(name: String): Boolean = {
    validateName(name)
    fs.delete(new Path(s"$root/$name"), true)
  }

  // ----- single-partitioned-table layout (SURVEY §4.2) ---------------------
  //
  // All graphs' edges live in ONE table partitioned by graph_name
  // (`<root>/_edges_by_graph/graph_name=<n>/…`), the many-small-graphs shape:
  // a read for one graph partition-prunes to its directory for free (the
  // filter on the partition column never touches other graphs' files), while
  // cross-graph analytics can scan the whole table in a single pass — neither
  // is expressible over the per-directory layout without driver-side looping.
  // Writes overwrite ONLY the written graph's partition (dynamic partition
  // overwrite), so graphs stay independently replaceable.

  private val partEdgesTable = s"$root/_edges_by_graph"
  private val partVerticesTable = s"$root/_vertices_by_graph"
  private def partDir(table: String, name: String) = new Path(s"$table/graph_name=$name")

  private val partEdgesSchema = StructType(Seq(
    StructField("src", LongType), StructField("dst", LongType),
    StructField("graph_name", StringType)))
  private val partVerticesSchema = StructType(Seq(
    StructField("id", LongType), StructField("graph_name", StringType)))

  /** Read a partitioned table under an EXPLICIT schema. An empty-edge-set
    * graph's partition write leaves no parquet data files (just _SUCCESS),
    * so if every registered graph is edge-free the table has nothing to
    * infer a schema from and a bare `read.parquet` fails even though
    * [[existsPartitioned]] is true. The schema is fixed by the writer
    * anyway; an absent table reads as empty. Partition pruning on
    * `graph_name` is unaffected (asserted in `GraphCatalogSpec`).
    */
  private def readPart(table: String, schema: StructType): DataFrame =
    if (fs.exists(new Path(table))) spark.read.schema(schema).parquet(table)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  def existsPartitioned(name: String): Boolean = {
    validateName(name)
    fs.exists(partDir(partEdgesTable, name)) || fs.exists(partDir(partVerticesTable, name))
  }

  private def writePartitioned(name: String, edges: DataFrame, vertices: Option[DataFrame]): Unit = {
    // the partitioned table has a FIXED schema across all graphs (explicit
    // readPart schema, mergeCow upserts) — attributes live in the
    // per-directory layout, whose schema is per-graph
    val e = normalized(edges).select("src", "dst")
    // drop this graph's partitions up front: dynamic partition overwrite
    // only replaces partitions PRESENT in the written data, so modifying a
    // graph down to an EMPTY edge set would otherwise leave the old edges
    // partition silently in place (truncate-then-write matches the
    // reference's fopen("w") semantics, primaryServer.c:40-63)
    fs.delete(partDir(partEdgesTable, name), true)
    fs.delete(partDir(partVerticesTable, name), true)
    def out(df: DataFrame, table: String): Unit =
      df.withColumn("graph_name", lit(name))
        .write.partitionBy("graph_name")
        // replace only the partitions present in the data = this graph
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(table)
    out(e, partEdgesTable)
    out(vertexSetOf(e, vertices).select("id"), partVerticesTable)
  }

  /** [[addGraph]] semantics over the partitioned-table layout. An edge-free
    * graph still registers when it carries an explicit vertex set (its
    * vertex partition is written); with neither edges nor vertices there is
    * no partition to write and the graph does not register.
    */
  def addGraphPartitioned(name: String, edges: DataFrame, vertices: Option[DataFrame] = None): Unit = {
    validateName(name)
    if (existsPartitioned(name)) throw new AnalysisException(
      errorClass = "TABLE_OR_VIEW_ALREADY_EXISTS", messageParameters = Map("relationName" -> name))
    writePartitioned(name, edges, vertices)
  }

  /** [[modifyGraph]] semantics over the partitioned-table layout: replaces
    * exactly this graph's partition, other graphs' files untouched.
    */
  def modifyGraphPartitioned(name: String, edges: DataFrame, vertices: Option[DataFrame] = None): Unit = {
    validateName(name)
    if (!existsPartitioned(name)) throw new AnalysisException(
      errorClass = "TABLE_OR_VIEW_NOT_FOUND", messageParameters = Map("relationName" -> s"`$name`"))
    writePartitioned(name, edges, vertices)
  }

  /** One graph's edge list from the partitioned table. The `graph_name`
    * equality lands in the scan's PartitionFilters (asserted structurally in
    * `GraphCatalogSpec`): only this graph's files are listed or read.
    */
  def graphPartitioned(name: String): DataFrame = {
    validateName(name)
    if (!existsPartitioned(name)) throw new AnalysisException(
      errorClass = "TABLE_OR_VIEW_NOT_FOUND", messageParameters = Map("relationName" -> s"`$name`"))
    readPart(partEdgesTable, partEdgesSchema)
      .filter(col("graph_name") === name).select("src", "dst")
  }

  /** All graphs' edges as one DataFrame `(graph_name, src, dst)` — the
    * cross-graph analytics entry the per-directory layout cannot express in
    * a single scan.
    */
  def allGraphsPartitioned(): DataFrame =
    readPart(partEdgesTable, partEdgesSchema).select("graph_name", "src", "dst")

  /** One graph's vertex set from the partitioned layout (explicit set when
    * written, else derived from edge endpoints — same fallback as
    * [[vertices]]).
    */
  def verticesPartitioned(name: String): DataFrame = {
    validateName(name)
    if (!existsPartitioned(name)) throw new AnalysisException(
      errorClass = "TABLE_OR_VIEW_NOT_FOUND", messageParameters = Map("relationName" -> s"`$name`"))
    if (fs.exists(partDir(partVerticesTable, name)))
      readPart(partVerticesTable, partVerticesSchema)
        .filter(col("graph_name") === name).select("id")
    else vertexSetOf(graphPartitioned(name), None)
  }

  /** Edge-level mutation over the partitioned layout — the row-level upsert
    * the reference's whole-graph overwrite (`primaryServer.c:40-63`) cannot
    * express, bound to the engine's copy-on-write MERGE
    * ([[graft.operators.MergeInto.mergeCow]]): `changes` is a change-set of
    * `(src, dst)` edge rows, plus — when `deleteCol` is given — a BOOLEAN
    * flag marking edges to remove. Insert-if-absent / delete-if-present /
    * no-op otherwise; edges carry no data columns, so "matched update" is
    * the identity.
    *
    * CoW shape: `graph_name` is both the partition column and a merge key,
    * so mergeCow's touched-partition discovery is FREE (no target scan) and
    * exactly ONE partition — this graph's — is read, merged, and rewritten;
    * every other graph's files stay byte-identical on disk (asserted in
    * `GraphCatalogSpec`). The graph's vertex partition is then refreshed to
    * old set ∪ new edge endpoints (edge deletion never drops vertices —
    * the standard property-graph convention; an explicitly-registered
    * isolated vertex survives any mutation).
    *
    * Contract (inherited from mergeCow): `changes` is key-unique per
    * (src, dst) with non-null endpoints.
    */
  def upsertEdges(name: String, changes: DataFrame,
                  deleteCol: Option[String] = None): Unit = {
    validateName(name)
    if (!existsPartitioned(name)) throw new AnalysisException(
      errorClass = "TABLE_OR_VIEW_NOT_FOUND", messageParameters = Map("relationName" -> s"`$name`"))
    val source = changes.select(
      Seq(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")) ++
        deleteCol.map(d => col(d).cast("boolean").as(d)): _*)
      .withColumn("graph_name", lit(name))
    graft.operators.MergeInto.mergeCow(spark, partEdgesTable, source,
      keys = Seq("src", "dst", "graph_name"), partCol = "graph_name", deleteCol)
    // refresh the vertex partition: old set ∪ post-merge edge endpoints,
    // materialized BEFORE the path it reads from is overwritten. The
    // refreshed set is never empty (it contains the old set), so dynamic
    // partition overwrite alone replaces this graph's partition — no manual
    // pre-delete, hence no crash window where the partition is gone
    val refreshed = verticesPartitioned(name)
      .union(vertexSetOf(graphPartitioned(name), None))
      .distinct()
      .localCheckpoint(true)
    refreshed.withColumn("graph_name", lit(name))
      .write.partitionBy("graph_name")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(partVerticesTable)
  }

  /** Traversal API over the partitioned layout — same semantics (and the
    * same start-vertex validation) as the per-directory [[bfs]]/[[dfs]];
    * the edge scan partition-prunes to the named graph.
    */
  def bfsPartitioned(name: String, start: Long, maxDepth: Int = Int.MaxValue): DataFrame = {
    requireVertexPartitioned(name, start)
    Traversals.bfs(graphPartitioned(name), start, maxDepth)
  }

  def dfsPartitioned(name: String, start: Long): DataFrame = {
    requireVertexPartitioned(name, start)
    Traversals.dfsPreorder(graphPartitioned(name), start)
  }

  private def requireVertexPartitioned(name: String, v: Long): Unit = {
    val found = !verticesPartitioned(name).filter(col("id") === v).isEmpty
    if (!found) throw new IllegalArgumentException(s"start vertex $v not present in graph")
  }

  def listGraphs(): Seq[String] = {
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
  }

  // ----- traversal / analytics API over named graphs (the reference's ops) --

  /** Edges of `name` with `edgeFilter` applied BEFORE any traversal builds
    * its structures, then projected to endpoints: the predicate sits
    * directly on the parquet scan, so Catalyst pushes it down (asserted
    * structurally in `GraphCatalogSpec`) — the attribute-filtered subgraph
    * never materializes unfiltered edges.
    */
  private def filteredEdges(name: String,
                            edgeFilter: Option[org.apache.spark.sql.Column]): DataFrame = {
    val g = graph(name)
    edgeFilter.map(g.filter).getOrElse(g).select("src", "dst")
  }

  /** Op 4 (`secondaryServer.c:313-400`): BFS levels from a 1-based-id world;
    * validates the start vertex exists in the vertex set (SURVEY §2.2(3) —
    * the reference never checks and underflows on 0). BFS from an isolated
    * vertex legitimately returns just `(start, 0)`.
    *
    * @param edgeFilter optional predicate over the graph's edge ATTRIBUTE
    *                   columns ("traverse only type='follows' edges") —
    *                   pushed down to the edge scan, see [[filteredEdges]].
    */
  def bfs(name: String, start: Long, maxDepth: Int = Int.MaxValue,
          edgeFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    requireVertex(name, start)
    Traversals.bfs(filteredEdges(name, edgeFilter), start, maxDepth)
  }

  /** Op 3 (`secondaryServer.c:237-311`): canonical deterministic DFS
    * preorder; `edgeFilter` as in [[bfs]].
    */
  def dfs(name: String, start: Long,
          edgeFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    requireVertex(name, start)
    Traversals.dfsPreorder(filteredEdges(name, edgeFilter), start)
  }

  /** Op 3, reference leaf-set semantics (`secondaryServer.c:93-97`);
    * `edgeFilter` as in [[bfs]].
    */
  def dfsLeaves(name: String, start: Long,
                edgeFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    requireVertex(name, start)
    Traversals.dfsLeaves(filteredEdges(name, edgeFilter), start)
  }

  /** Per-vertex degrees of the (optionally attribute-filtered) subgraph —
    * [[Analytics.degrees]] over [[filteredEdges]].
    */
  def degrees(name: String,
              edgeFilter: Option[org.apache.spark.sql.Column] = None): DataFrame =
    Analytics.degrees(filteredEdges(name, edgeFilter))

  private def requireVertex(name: String, v: Long): Unit = {
    // isEmpty = take(1) under the hood — stops at the first matching row
    val found = !vertices(name).filter(col("id") === v).isEmpty
    if (!found) throw new IllegalArgumentException(s"start vertex $v not present in graph")
  }
}
