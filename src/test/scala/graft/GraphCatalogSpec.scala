package graft

import java.nio.file.Files
import graft.graph.GraphCatalog
import org.apache.spark.sql.AnalysisException

/** Add/modify/read semantics of SURVEY §2.2(4): add fails on existing,
  * modify requires existence (vs the reference's blind overwrite,
  * `primaryServer.c:40-63`), plus traversal-API start-vertex validation
  * (§2.2(3) — the reference underflows on 0, `secondaryServer.c:266`).
  */
class GraphCatalogSpec extends SparkSpec {

  private def freshCatalog(): GraphCatalog =
    new GraphCatalog(spark, Files.createTempDirectory("graft-cat").toString)

  private val triangle = Seq((1L, 2L), (2L, 3L), (3L, 1L))

  test("addGraph then graph round-trips the edge list") {
    val cat = freshCatalog()
    cat.addGraph("g", edgesDF(triangle))
    assert(cat.exists("g"))
    assert(cat.graph("g").collect().map(r => (r.getLong(0), r.getLong(1))).toSet === triangle.toSet)
  }

  test("addGraph fails if the graph already exists") {
    val cat = freshCatalog()
    cat.addGraph("g", edgesDF(triangle))
    intercept[AnalysisException](cat.addGraph("g", edgesDF(triangle)))
  }

  test("modifyGraph overwrites wholesale (last-writer-wins, no merge)") {
    val cat = freshCatalog()
    cat.addGraph("g", edgesDF(triangle))
    cat.modifyGraph("g", edgesDF(Seq((7L, 8L))))
    assert(cat.graph("g").collect().map(r => (r.getLong(0), r.getLong(1))).toSet === Set((7L, 8L)))
  }

  test("modifyGraph requires the graph to exist") {
    val cat = freshCatalog()
    intercept[AnalysisException](cat.modifyGraph("nope", edgesDF(triangle)))
  }

  test("graph of a missing name fails; drop removes; list is sorted") {
    val cat = freshCatalog()
    intercept[AnalysisException](cat.graph("nope"))
    cat.addGraph("b", edgesDF(triangle))
    cat.addGraph("a", edgesDF(triangle))
    assert(cat.listGraphs() === Seq("a", "b"))
    assert(cat.dropGraph("b"))
    assert(cat.listGraphs() === Seq("a"))
    assert(!cat.exists("b"))
  }

  test("invalid graph names are rejected up front") {
    val cat = freshCatalog()
    intercept[IllegalArgumentException](cat.addGraph("", edgesDF(triangle)))
    intercept[IllegalArgumentException](cat.addGraph("../escape", edgesDF(triangle)))
    intercept[IllegalArgumentException](cat.graph("a/b"))
  }

  test("explicit vertex set preserves isolated vertices; BFS from one returns itself") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    cat.addGraph("g", edgesDF(Seq((1L, 2L))), vertices = Some(Seq(1L, 2L, 3L).toDF("id")))
    assert(vertexSet(cat.vertices("g"), "id") === Set(1L, 2L, 3L))
    // vertex 3 is isolated but queryable — the reference's matrix header
    // makes such graphs legal (an all-zero row), secondaryServer.c:380
    assert(vertexLevels(cat.bfs("g", 3L)) === Seq((3L, 0)))
    // derived set when no explicit vertices are given
    cat.addGraph("h", edgesDF(Seq((7L, 8L))))
    assert(vertexSet(cat.vertices("h"), "id") === Set(7L, 8L))
  }

  test("partitioned-table layout: add/modify/read semantics match, other graphs untouched") {
    val cat = freshCatalog()
    cat.addGraphPartitioned("pa", edgesDF(triangle))
    cat.addGraphPartitioned("pb", edgesDF(Seq((7L, 8L))))
    intercept[AnalysisException](cat.addGraphPartitioned("pa", edgesDF(triangle)))
    intercept[AnalysisException](cat.modifyGraphPartitioned("nope", edgesDF(triangle)))
    assert(cat.graphPartitioned("pa").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === triangle.toSet)
    // replacing pa's partition must not disturb pb's
    cat.modifyGraphPartitioned("pa", edgesDF(Seq((9L, 10L))))
    assert(cat.graphPartitioned("pa").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((9L, 10L)))
    assert(cat.graphPartitioned("pb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((7L, 8L)))
    // cross-graph single-scan entry sees every graph tagged by name
    assert(cat.allGraphsPartitioned().select("graph_name").distinct()
      .collect().map(_.getString(0)).toSet === Set("pa", "pb"))
    // traversal API works over the partitioned layout with the same
    // start-vertex validation as the per-directory one
    assert(vertexLevels(cat.bfsPartitioned("pb", 7L)) === Seq((7L, 0), (8L, 1)))
    assert(cat.dfsPartitioned("pb", 7L).collect().map(_.getLong(0)).toSeq === Seq(7L, 8L))
    intercept[IllegalArgumentException](cat.bfsPartitioned("pb", 99L))
    // modifying down to an EMPTY edge set must not leave stale edges behind
    // (dynamic partition overwrite alone would: no partition in the data,
    // nothing replaced)
    val s = spark
    import s.implicits._
    cat.modifyGraphPartitioned("pa", edgesDF(Seq.empty),
      vertices = Some(Seq(9L).toDF("id")))
    assert(cat.graphPartitioned("pa").count() === 0L, "stale edges survived the empty modify")
    assert(vertexSet(cat.verticesPartitioned("pa"), "id") === Set(9L))
  }

  test("upsertEdges: insert/delete semantics; untouched graph's files byte-identical") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-cat-ups")
    val cat = new GraphCatalog(spark, root.toString)
    cat.addGraphPartitioned("mut", edgesDF(Seq((1L, 2L), (2L, 3L), (3L, 4L))))
    cat.addGraphPartitioned("bystander", edgesDF(Seq((7L, 8L), (8L, 9L))))
    def snapshot(sub: String): Map[String, (Long, Long, String)] = {
      val dir = root.resolve(sub)
      val md = java.security.MessageDigest.getInstance("MD5")
      val stream = Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .map { p =>
            val bytes = Files.readAllBytes(p)
            dir.relativize(p).toString ->
              ((bytes.length.toLong, Files.getLastModifiedTime(p).toMillis,
                md.digest(bytes).map("%02x".format(_)).mkString))
          }.toMap
      } finally stream.close()
    }
    val before = snapshot("_edges_by_graph/graph_name=bystander")
    assert(before.nonEmpty)
    // delete 2->3, insert 4->5 and a no-op re-insert of 1->2
    val changes = Seq((2L, 3L, true), (4L, 5L, false), (1L, 2L, false))
      .toDF("src", "dst", "is_delete")
    cat.upsertEdges("mut", changes, Some("is_delete"))
    assert(cat.graphPartitioned("mut").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L), (3L, 4L), (4L, 5L)))
    // vertex set: old endpoints survive edge deletion; new endpoint joins
    assert(vertexSet(cat.verticesPartitioned("mut"), "id") === Set(1L, 2L, 3L, 4L, 5L))
    // the sibling graph's partition: same files, same bytes, same mtimes
    assert(snapshot("_edges_by_graph/graph_name=bystander") === before,
      "bystander graph files must survive the upsert byte-identical")
    // traverse the mutated graph end to end
    assert(vertexLevels(cat.bfsPartitioned("mut", 3L)) === Seq((3L, 0), (4L, 1), (5L, 2)))
    // change-set without a delete column is pure insert
    cat.upsertEdges("mut", Seq((9L, 1L)).toDF("src", "dst"))
    assert(vertexLevels(cat.bfsPartitioned("mut", 9L))
      === Seq((1L, 1), (2L, 2), (9L, 0)))
    intercept[AnalysisException](cat.upsertEdges("nope", Seq((1L, 2L)).toDF("src", "dst")))
  }

  test("property graph: attributes round-trip; filtered bfs/dfs/degrees; predicate pushed to scan") {
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    // 0-[a]->1-[a]->2, 0-[b]->3, plus vertex attributes
    val e = Seq((0L, 1L, "a"), (1L, 2L, "a"), (0L, 3L, "b"))
      .toDF("src", "dst", "etype")
    cat.addGraph("p", e, vertices = Some(
      Seq((0L, "root"), (1L, "mid"), (2L, "leaf"), (3L, "leaf")).toDF("id", "role")))
    // attributes survive the round-trip on both tables
    assert(cat.graph("p").columns.toSeq === Seq("src", "dst", "etype"))
    assert(cat.vertices("p").columns.toSeq === Seq("id", "role"))
    assert(cat.vertices("p").where("role = 'leaf'").count() === 2L)
    // filtered traversals see only the matching subgraph
    import org.apache.spark.sql.functions.col
    assert(vertexLevels(cat.bfs("p", 0L, edgeFilter = Some(col("etype") === "a")))
      === Seq((0L, 0), (1L, 1), (2L, 2)))
    assert(cat.dfs("p", 0L, edgeFilter = Some(col("etype") === "b"))
      .collect().map(_.getLong(0)).toSeq === Seq(0L, 3L))
    assert(cat.dfsLeaves("p", 0L, edgeFilter = Some(col("etype") === "a"))
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
    val deg = cat.degrees("p", Some(col("etype") === "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(deg === Set((0L, 1L, 0L), (1L, 1L, 1L), (2L, 0L, 1L)))
    // unfiltered behavior unchanged
    assert(vertexLevels(cat.bfs("p", 0L)) ===
      Seq((0L, 0), (1L, 1), (2L, 2), (3L, 1)))
    // the attribute predicate must reach the parquet scan as a pushed filter
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val filtered = cat.graph("p").filter(col("etype") === "a").select("src", "dst")
    val plan = filtered.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collectWithSubqueries { case sc: FileSourceScanExec => sc }
    assert(scans.nonEmpty, s"no file scan in\n$plan")
    assert(scans.head.metadata("PushedFilters").contains("EqualTo(etype,a)"),
      s"etype predicate not pushed: ${scans.head.metadata("PushedFilters")}")
  }

  test("partitioned-table reads survive a table whose ONLY graphs are edge-free") {
    // an empty-edge-set write leaves no parquet data files (just _SUCCESS),
    // so schema inference has nothing to work with — the explicit-schema
    // read must still serve the registered graph
    val s = spark
    import s.implicits._
    val cat = freshCatalog()
    cat.addGraphPartitioned("lonely", edgesDF(Seq.empty),
      vertices = Some(Seq(1L, 2L).toDF("id")))
    assert(cat.existsPartitioned("lonely"))
    assert(cat.graphPartitioned("lonely").count() === 0L)
    assert(cat.allGraphsPartitioned().count() === 0L)
    assert(vertexSet(cat.verticesPartitioned("lonely"), "id") === Set(1L, 2L))
    assert(vertexLevels(cat.bfsPartitioned("lonely", 2L)) === Seq((2L, 0)))
  }

  test("partitioned-table read prunes to ONE graph's partition (structural)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val cat = freshCatalog()
    cat.addGraphPartitioned("pa", edgesDF(triangle))
    cat.addGraphPartitioned("pb", edgesDF(Seq((7L, 8L))))
    val df = cat.graphPartitioned("pa")
    df.collect() // execute so scan metrics (numFiles) are populated
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no file scan in\n$plan")
    val scan = scans.head
    // the graph_name equality must be a PARTITION filter (pruned at file
    // listing), not a post-scan data filter
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "graph_name")),
      s"graph_name not in partition filters: ${scan.partitionFilters}")
    // and pruning must actually bite: only pa's files are read, fewer than
    // the table holds across both graphs
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = spark.read.parquet(cat.allGraphsPartitioned().inputFiles.head
      .replaceAll("/graph_name=[^/]*/.*$", "")).inputFiles.length
    assert(filesRead < totalFiles,
      s"scan read $filesRead of $totalFiles files — partition pruning did not bite")
  }

  test("bfsPartitioned traverses only the named graph, through a pruned scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val cat = freshCatalog()
    // disjoint id ranges: any leakage of "other" edges into the traversal
    // would surface as extra reachable vertices
    cat.addGraphPartitioned("even2", edgesDF(Seq((0L, 2L), (2L, 4L))))
    cat.addGraphPartitioned("odd2", edgesDF(Seq((0L, 1L), (1L, 3L))))
    assert(vertexLevels(cat.bfsPartitioned("even2", 0L)) === Seq((0L, 0), (2L, 1), (4L, 2)))
    // the traversal consumes exactly graphPartitioned(name)'s DataFrame —
    // assert the graph_name equality lands in its PARTITION filters (file
    // listing prunes to one graph before any traversal superstep runs)
    val plan = cat.graphPartitioned("even2").queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no file scan in\n$plan")
    assert(scans.head.partitionFilters.exists(_.references.exists(_.name == "graph_name")),
      s"graph_name not in partition filters on the traversal path: ${scans.head.partitionFilters}")
  }

  test("dfsPartitioned traverses only the named graph, through a pruned scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val cat = freshCatalog()
    // disjoint id ranges again: leakage would add vertices to the preorder
    cat.addGraphPartitioned("deven", edgesDF(Seq((0L, 2L), (2L, 4L), (0L, 6L))))
    cat.addGraphPartitioned("dodd", edgesDF(Seq((0L, 1L), (1L, 3L))))
    // preorder: 0, then lowest-id child first (2 -> 4), then 6
    assert(cat.dfsPartitioned("deven", 0L).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((0L, 0), (2L, 1), (4L, 2), (6L, 3)))
    // the adjacency collect consumes graphPartitioned(name) — graph_name
    // must land in the scan's PARTITION filters (file-listing pruning)
    val plan = cat.graphPartitioned("deven").queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no file scan in\n$plan")
    assert(scans.head.partitionFilters.exists(_.references.exists(_.name == "graph_name")),
      s"graph_name not in partition filters on the DFS path: ${scans.head.partitionFilters}")
  }

  test("bfs/dfs validate the start vertex instead of underflowing") {
    val cat = freshCatalog()
    cat.addGraph("g", edgesDF(triangle))
    intercept[IllegalArgumentException](cat.bfs("g", 99L))
    intercept[IllegalArgumentException](cat.dfs("g", 0L))
    assert(vertexLevels(cat.bfs("g", 1L)) === Seq((1L, 0), (2L, 1), (3L, 2)))
    assert(cat.dfs("g", 1L).collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(vertexSet(cat.dfsLeaves("g", 1L)) === Set(3L))
  }
}
