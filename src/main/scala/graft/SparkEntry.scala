package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.{Analytics, DerivedGraphs, Traversals}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY §2's inventory gets a `queries` entry; those whose
  * semantics are ANSI-SQL-expressible also get an `oracleSql` entry the driver
  * runs in DuckDB over the same parquet tables. Column names and deterministic
  * ORDER BY are kept identical on both sides (the driver sorts columns by name
  * and hash-compares values).
  *
  * Float discipline: every oracle-checked money aggregate is computed in
  * exact DECIMAL arithmetic and cast to DOUBLE only at the end, so Spark's
  * partial-aggregation order cannot perturb the result (double summation is
  * order-sensitive; decimal summation is exact).
  */
object SparkEntry {

  // decimal casts shared by the money queries (exact, overflow-safe chain:
  // (12,2)*(4,2)*(4,2) -> DECIMAL(22,6), well inside 38 digits)
  private def dec12(c: String) = col(c).cast("decimal(12,2)")
  private def dec4(c: String) = col(c).cast("decimal(4,2)")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * BFS levels over the derived graph — the reference's headline read op
    * (`secondaryServer.c:313-400`) on the engine's edge-list model.
    */
  def entry(spark: SparkSession): DataFrame =
    Traversals.bfs(DerivedGraphs.big(spark, "/root/testdata/sf0.001"), start = 0L, maxDepth = 12)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- graph operators (reference surface + analytics extensions) ----
    "g1_bfs_levels" -> ((s, dir) =>
      Traversals.bfs(DerivedGraphs.big(s, dir), start = 0L, maxDepth = 12)),
    "g2_reachable_stats" -> ((s, dir) =>
      Traversals.bfs(DerivedGraphs.big(s, dir), start = 0L, maxDepth = 12)
        .agg(count(lit(1)).as("n_reachable"), max("level").cast("int").as("max_level"))),
    "g3_connected_components" -> ((s, dir) =>
      Analytics.connectedComponents(DerivedGraphs.small(s, dir)).orderBy("vertex")),
    "g4_shortest_paths_multi" -> ((s, dir) =>
      Traversals.multiSourceBfs(DerivedGraphs.big(s, dir), Seq(0L, 1L, 2L), maxDepth = 12)),
    "g5_triangle_counts" -> ((s, dir) =>
      Analytics.triangleCounts(DerivedGraphs.small(s, dir))),
    "g6_degrees" -> ((s, dir) => // DerivedGraphs output is already distinct
      Analytics.degrees(DerivedGraphs.big(s, dir), dedup = false).orderBy("vertex")),
    "g7_pagerank" -> ((s, dir) =>
      Analytics.pageRank(DerivedGraphs.small(s, dir), numIter = 10)),
    "g8_dfs_preorder" -> ((s, dir) => // sequential by nature: rows-only check
      Traversals.dfsPreorder(DerivedGraphs.small(s, dir), start = 0L)),

    // ---- relational: aggregation ----
    "q1_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec12("l_quantity")).cast("double").as("sum_qty"),
          sum(dec12("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec12("l_extendedprice") * (lit(1) - dec4("l_discount"))).cast("double").as("sum_disc_price"),
          sum(dec12("l_extendedprice") * (lit(1) - dec4("l_discount")) * (lit(1) + dec4("l_tax")))
            .cast("double").as("sum_charge"),
          (sum(dec12("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q6_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= expr("TIMESTAMP'1996-01-01 00:00:00'") &&
          col("l_shipdate") < expr("TIMESTAMP'1997-01-01 00:00:00'") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(dec12("l_extendedprice") * dec4("l_discount")).cast("double").as("revenue"))),

    // ---- relational: joins ----
    "q3_top_revenue" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(col("o_orderdate") < expr("TIMESTAMP'1998-01-01 00:00:00'"))
      val l = Tables.lineitem(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec12("l_extendedprice") * (lit(1) - dec4("l_discount"))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "g1_bfs_levels" ->
      s"""WITH RECURSIVE e AS (${DerivedGraphs.bigSql}),
         |walk(vertex, level) AS (
         |  SELECT CAST(0 AS BIGINT) AS vertex, 0 AS level
         |  UNION
         |  SELECT e.dst, walk.level + 1 FROM walk JOIN e ON e.src = walk.vertex WHERE walk.level < 12)
         |SELECT vertex, CAST(MIN(level) AS INT) AS level FROM walk GROUP BY vertex ORDER BY level, vertex""".stripMargin,
    "g2_reachable_stats" ->
      s"""WITH RECURSIVE e AS (${DerivedGraphs.bigSql}),
         |walk(vertex, level) AS (
         |  SELECT CAST(0 AS BIGINT) AS vertex, 0 AS level
         |  UNION
         |  SELECT e.dst, walk.level + 1 FROM walk JOIN e ON e.src = walk.vertex WHERE walk.level < 12)
         |SELECT COUNT(*) AS n_reachable, CAST(MAX(ml) AS INT) AS max_level
         |FROM (SELECT vertex, MIN(level) AS ml FROM walk GROUP BY vertex)""".stripMargin,
    "g3_connected_components" ->
      s"""WITH RECURSIVE e AS (${DerivedGraphs.smallSql}),
         |ue AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
         |v AS (SELECT a AS vertex FROM ue UNION SELECT b AS vertex FROM ue),
         |r(vertex, reach) AS (
         |  SELECT vertex, vertex FROM v
         |  UNION
         |  SELECT r.vertex, ue.b FROM r JOIN ue ON ue.a = r.reach)
         |SELECT vertex, MIN(reach) AS component FROM r GROUP BY vertex ORDER BY vertex""".stripMargin,
    "g4_shortest_paths_multi" ->
      s"""WITH RECURSIVE e AS (${DerivedGraphs.bigSql}),
         |walk(vertex, level) AS (
         |  SELECT CAST(v AS BIGINT) AS vertex, 0 AS level FROM (VALUES (0),(1),(2)) AS t(v)
         |  UNION
         |  SELECT e.dst, walk.level + 1 FROM walk JOIN e ON e.src = walk.vertex WHERE walk.level < 12)
         |SELECT vertex, CAST(MIN(level) AS INT) AS level FROM walk GROUP BY vertex ORDER BY level, vertex""".stripMargin,
    "g5_triangle_counts" ->
      s"""WITH e AS (${DerivedGraphs.smallSql}),
         |und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM e WHERE src <> dst),
         |tri AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM und e1 JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b
         |  WHERE EXISTS (SELECT 1 FROM und e3 WHERE e3.a = e1.b AND e3.b = e2.b))
         |SELECT vertex, COUNT(*) AS triangles FROM (
         |  SELECT x AS vertex FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
         |GROUP BY vertex ORDER BY vertex""".stripMargin,
    "g6_degrees" ->
      s"""WITH e AS (${DerivedGraphs.bigSql}),
         |o AS (SELECT src AS vertex, COUNT(*) AS out_degree FROM e GROUP BY 1),
         |i AS (SELECT dst AS vertex, COUNT(*) AS in_degree FROM e GROUP BY 1)
         |SELECT COALESCE(o.vertex, i.vertex) AS vertex,
         |       COALESCE(out_degree, 0) AS out_degree, COALESCE(in_degree, 0) AS in_degree
         |FROM o FULL OUTER JOIN i ON o.vertex = i.vertex ORDER BY vertex""".stripMargin,
    "g7_pagerank" -> Analytics.pageRankSql(DerivedGraphs.smallSql, numIter = 10),
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q3_top_revenue" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate
        |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
  )
}
