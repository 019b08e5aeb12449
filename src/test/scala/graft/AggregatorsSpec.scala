package graft

import graft.functions.Aggregators
import graft.functions.Aggregators.ScoredId
import org.apache.spark.sql.functions._

/** TopKByScore typed Aggregator: semantics (ordering, ties, k-cap) and the
  * algebraic properties partial aggregation relies on.
  */
class AggregatorsSpec extends SparkSpec {

  private def agg3 = new Aggregators.TopKByScore(3)

  test("top-k orders by score desc then id asc, capped at k") {
    val xs = Seq(ScoredId(5, 9), ScoredId(7, 2), ScoredId(5, 1), ScoredId(7, 8), ScoredId(1, 1))
    val got = xs.foldLeft(agg3.zero)(agg3.reduce)
    assert(agg3.finish(got) === Seq(ScoredId(7, 2), ScoredId(7, 8), ScoredId(5, 1)))
  }

  test("merge(reduce(a), reduce(b)) == reduce(a ++ b) on random splits") {
    val rng = new scala.util.Random(31)
    for (_ <- 1 to 200) {
      val xs = List.fill(rng.nextInt(40))(ScoredId(rng.nextInt(20).toLong, rng.nextInt(50).toLong))
      val k = new Aggregators.TopKByScore(4)
      val (a, b) = xs.splitAt(if (xs.isEmpty) 0 else rng.nextInt(xs.length + 1))
      val merged = k.merge(a.foldLeft(k.zero)(k.reduce), b.foldLeft(k.zero)(k.reduce))
      val direct = xs.foldLeft(k.zero)(k.reduce)
      assert(merged === direct)
      // reference semantics: full multiset sort, take k (ties are dense
      // here — score range 0..19 over up to 40 rows — exercising the rule)
      assert(direct === xs.sortBy(x => (-x.score, x.id)).take(4))
    }
  }

  test("udaf registration: per-group top-k over a DataFrame matches window top-k") {
    val s = spark
    import s.implicits._
    val rows = (1L to 500L).map(i => (s"g${i % 4}", i % 23, i)).toDF("g", "score", "id")
    val topk = udaf(new Aggregators.TopKByScore(3))
    val got = rows.groupBy("g").agg(topk(col("score"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("t.score"), col("t.id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("id"))
    val want = rows.withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select("g", "rank", "score", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want && want.nonEmpty)
  }
}
