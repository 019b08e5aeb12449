package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates: approx_count_distinct (HLL++) can't hash-match a
  * DuckDB oracle (different sketch), so its contract — bounded relative
  * error — is asserted here instead.
  */
class AggregatesSpec extends SparkSpec {

  test("approx_count_distinct stays within its error bound") {
    val s = spark
    import s.implicits._
    val n = 200000L
    val df = (1L to n).map(i => i * 2654435761L % 1000003L).toDF("v")
    val exact = df.select(countDistinct("v")).head.getLong(0)
    val approx = df.select(approx_count_distinct("v", rsd = 0.02)).head.getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.05, s"exact=$exact approx=$approx relErr=$relErr")
  }
}
