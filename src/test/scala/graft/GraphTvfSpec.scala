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

  test("TVF argument validation: wrong arity and unknown graph fail loudly") {
    val e1 = intercept[Exception](spark.sql(s"SELECT * FROM graph_bfs('$root', 't')").collect())
    assert(e1.getMessage.contains("4 arguments"))
    val e2 = intercept[Exception](
      spark.sql(s"SELECT * FROM graph_bfs('$root', 'nope', 0, 5)").collect())
    assert(e2.getMessage.toLowerCase.contains("nope"))
  }
}
