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
}
