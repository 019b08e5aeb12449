package graft

import org.apache.spark.sql.functions._
import graft.functions.Aggregators.MinKLongs
import graft.llm.Sketches

class SketchesSpec extends SparkSpec {

  test("MinKLongs keeps the k smallest distinct values, sorted") {
    val agg = new MinKLongs(4)
    val buf = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 2L, 5L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) === Seq(1L, 2L, 3L, 5L))
  }

  test("MinKLongs under-full sketch holds the whole distinct set") {
    val agg = new MinKLongs(10)
    val buf = Seq(4L, 4L, 2L, 9L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) === Seq(2L, 4L, 9L))
  }

  test("MinKLongs merge ≡ sketch of the union (the mergeability contract)") {
    val agg = new MinKLongs(5)
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val xs = Seq.fill(rng.nextInt(30))(rng.nextInt(40).toLong)
      val ys = Seq.fill(rng.nextInt(30))(rng.nextInt(40).toLong)
      val direct = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
      val merged = agg.merge(xs.foldLeft(agg.zero)(agg.reduce), ys.foldLeft(agg.zero)(agg.reduce))
      assert(merged === direct, s"xs=$xs ys=$ys")
    }
  }

  test("kmvDistinctShingles: under-full groups are exact; estimator stays within KMV error") {
    val s = spark
    import s.implicits._
    // 'small' lang: 3 docs sharing few shingles -> m < k, est == exact.
    // 'big' lang: enough distinct shingles to overflow k=16 -> estimator path;
    // KMV relative standard error is ~1/sqrt(k-2) ≈ 27%, assert within 4 RSE.
    val small = (0 until 3).map(i => (i.toLong, s"alpha beta gamma delta epsilon token$i", "sm"))
    val big = (0 until 60).map(i =>
      (100L + i, (0 until 12).map(j => s"w${(i * 31 + j * 7) % 997} x$i y$j").mkString(" "), "bg"))
    val docs = (small ++ big).toDF("doc_id", "text", "lang")
    val rows = Sketches.kmvDistinctShingles(docs, k = 16).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val (mSm, estSm, exactSm) = rows("sm")
    assert(mSm === exactSm && estSm === exactSm, "under-full sketch must be exact")
    val (mBg, estBg, exactBg) = rows("bg")
    assert(mBg === 16L && exactBg > 16L)
    val rse = 1.0 / math.sqrt(16 - 2)
    assert(math.abs(estBg.toDouble / exactBg - 1.0) < 4 * rse,
      s"est=$estBg exact=$exactBg outside 4·RSE")
  }
}
