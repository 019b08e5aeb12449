package graft

import graft.graph.{Analytics, GraphCatalog, Traversals}

/** SQL table-valued-function surface (`graph_bfs` / `graph_degrees` /
  * `graph_pagerank`): the TVF route through spark.sql must produce exactly
  * what the Scala API produces, compose with outer SQL, and reject
  * non-literal arguments loudly.
  */
class GraphTvfSpec extends SparkSpec {

  private lazy val root = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tvf-spec")
    val cat = new GraphCatalog(spark, dir.toString)
    // 0 -> 1 -> 2 -> 3, 0 -> 4; 5 -> 6 disconnected
    cat.addGraph("t", edgesDF(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 4L), (5L, 6L))))
    dir.toString
  }

  test("graph_bfs TVF equals the Scala API and composes with outer SQL") {
    val viaSql = spark.sql(
      s"SELECT vertex, level FROM graph_bfs('$root', 't', 0, 10) ORDER BY vertex")
    val viaApi = new GraphCatalog(spark, root).bfs("t", 0L, 10).orderBy("vertex")
    assert(viaSql.collect().toSeq === viaApi.collect().toSeq)
    // outer SQL composes over the TVF relation
    val filtered = spark.sql(
      s"SELECT COUNT(*) AS n FROM graph_bfs('$root', 't', 0, 10) WHERE level = 1")
    assert(filtered.collect().head.getLong(0) === 2L) // vertices 1 and 4
  }

  test("graph_degrees TVF equals the Scala API") {
    val viaSql = spark.sql(
      s"SELECT * FROM graph_degrees('$root', 't') ORDER BY vertex")
    val viaApi = new GraphCatalog(spark, root).degrees("t").orderBy("vertex")
    assert(viaSql.collect().toSeq === viaApi.collect().toSeq)
  }

  test("graph_pagerank TVF equals the Scala API") {
    val viaSql = spark.sql(
      s"SELECT * FROM graph_pagerank('$root', 't', 5) ORDER BY vertex")
    val viaApi = Analytics.pageRank(new GraphCatalog(spark, root).graph("t"), numIter = 5)
      .orderBy("vertex")
    assert(viaSql.collect().toSeq === viaApi.collect().toSeq)
  }

  test("graph_cc TVF equals the Scala API (disconnected component labeled apart)") {
    val viaSql = spark.sql(s"SELECT * FROM graph_cc('$root', 't') ORDER BY vertex")
    val viaApi = Analytics.connectedComponents(new GraphCatalog(spark, root).graph("t"))
      .orderBy("vertex")
    assert(viaSql.collect().toSeq === viaApi.collect().toSeq)
    // 5-6 is its own component
    val comps = viaSql.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(5L) === 5L && comps(6L) === 5L && comps(3L) === 0L)
  }

  test("graph_shortest_path TVF equals the Scala API hop sequence") {
    val viaSql = spark.sql(
      s"SELECT pos, vertex FROM graph_shortest_path('$root', 't', 0, 10) ORDER BY pos")
    val viaApi = Traversals.shortestPathTo(new GraphCatalog(spark, root).graph("t"),
      start = 0L, maxDepth = 10).orderBy("pos")
    assert(viaSql.collect().toSeq === viaApi.collect().toSeq)
    // target = highest-id reachable from 0 = 4... (4 > 3); path 0 -> 4
    assert(viaSql.collect().map(_.getLong(1)).toSeq === Seq(0L, 4L))
  }

  test("graph_motif TVF equals the Scala API and takes outer predicates") {
    val viaSql = spark.sql(
      s"""SELECT a, b FROM graph_motif('$root', 't', '(a)-(b)') WHERE a >= 1 ORDER BY a, b""")
    val viaApi = graft.graph.Motifs.find(new GraphCatalog(spark, root).graph("t"), "(a)-(b)")
      .filter("a >= 1").orderBy("a", "b")
    assert(viaSql.collect().toSeq === viaApi.collect().toSeq)
    assert(viaSql.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (2L, 3L), (5L, 6L)))
  }

  test("TVF argument validation: wrong arity and unknown graph fail loudly") {
    val e1 = intercept[Exception](spark.sql(s"SELECT * FROM graph_bfs('$root', 't')").collect())
    assert(e1.getMessage.contains("4 arguments"))
    val e2 = intercept[Exception](
      spark.sql(s"SELECT * FROM graph_bfs('$root', 'nope', 0, 5)").collect())
    assert(e2.getMessage.toLowerCase.contains("nope"))
  }
}
