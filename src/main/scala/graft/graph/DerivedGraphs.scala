package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic graphs derived from the TESTDATA `lineitem` table, so graph
  * operators can be oracle-checked: the DuckDB side derives the identical
  * edge list with the same integer arithmetic (see SparkEntry.oracleSql).
  *
  * `big`  — src = l_orderkey % 14983, dst = (l_partkey*7+3) % 14983; ~15k
  *          vertices / ~60k distinct edges at sf0.01, BFS diameter ~8.
  * `small`— sampled 1-in-16 orderkeys folded to 1499 ids; sparser, multiple
  *          connected components — used where the oracle computes a
  *          reachability closure (quadratic in component size).
  */
object DerivedGraphs {
  val BigMod = 14983L
  val SmallMod = 1499L

  def big(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).select(
      (col("l_orderkey") % BigMod).as("src"),
      ((col("l_partkey") * 7 + 3) % BigMod).as("dst")
    ).distinct()

  /** SQL fragment deriving the same edges in DuckDB. */
  val bigSql: String =
    s"SELECT DISTINCT l_orderkey % $BigMod AS src, (l_partkey*7+3) % $BigMod AS dst FROM lineitem"

  def small(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % 16 === 0)
      .select(
        expr("l_orderkey div 16").%(SmallMod).as("src"),
        ((col("l_partkey") * 13 + 7) % SmallMod).as("dst")
      ).distinct()

  val smallSql: String =
    s"SELECT DISTINCT (l_orderkey // 16) % $SmallMod AS src, (l_partkey*13+7) % $SmallMod AS dst " +
      "FROM lineitem WHERE l_orderkey % 16 = 0"

  /** Long-haul weighted graph for the UNBOUNDED shortest-path gate: a
    * 25-vertex chain over the nation keys (`k → k+1`, w = k%5+1) plus
    * never-cheaper shortcut edges (`k → k+5+r`, w = 6·(5+r) — strictly
    * above any chain segment it spans, since chain steps weigh ≤ 5).
    * Shortest paths therefore follow the chain for up to 24 HOPS — far
    * past g12's 12-hop bound — while the shortcuts give Bellman-Ford
    * rounds genuine improvements to supersede (a cheap-looking early
    * shortcut path must be beaten by the longer-hop cheaper chain, the
    * exact case a silent hop cap gets wrong). `(src, dst, w)`.
    */
  def longHaul(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long").as("k"),
        col("n_regionkey").cast("long").as("r"))
    val chain = n.filter(col("k") < 24)
      .select(col("k").as("src"), (col("k") + 1).as("dst"),
        (pmod(col("k"), lit(5)) + 1).as("w"))
    val short = n.filter(col("k") + 5 + col("r") <= 24)
      .select(col("k").as("src"), (col("k") + 5 + col("r")).as("dst"),
        ((lit(5) + col("r")) * 6).as("w"))
    chain.union(short)
  }

  /** Driver-side mirror of [[longHaul]] for VALUES oracles — same
    * arithmetic over the collected nation rows (25 by table contract).
    */
  def longHaulSeq(spark: SparkSession, sfDir: String): Seq[(Long, Long, Long)] = {
    val rows = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val chain = rows.collect { case (k, _) if k < 24 => (k, k + 1, k % 5 + 1) }
    val short = rows.collect { case (k, r) if k + 5 + r <= 24 =>
      (k, k + 5 + r, (5 + r) * 6)
    }
    chain ++ short
  }
}
