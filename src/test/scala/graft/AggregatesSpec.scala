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

  test("approx_percentile honors its accuracy contract vs the exact percentile") {
    val s = spark
    import s.implicits._
    // skewed data (squares): rank error <= n/accuracy translates to a value
    // window we can check against the exact sorted array
    val n = 100000
    val vals = (1 to n).map(i => (i.toLong * i.toLong) % 999983L)
    val df = vals.toDF("v")
    val accuracy = 1000
    val got = df.select(expr(s"approx_percentile(v, array(0.5D, 0.9D), $accuracy)"))
      .head.getSeq[Long](0)
    val sorted = vals.sorted
    val maxRankErr = n / accuracy // the documented guarantee
    for ((p, g) <- Seq(0.5, 0.9).zip(got)) {
      val target = (p * (n - 1)).toInt
      val lo = sorted(math.max(0, target - maxRankErr))
      val hi = sorted(math.min(n - 1, target + maxRankErr))
      assert(g >= lo && g <= hi, s"p=$p got $g outside rank-error window [$lo, $hi]")
    }
  }
}
