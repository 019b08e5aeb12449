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
