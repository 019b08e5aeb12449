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

  test("histogramQuantiles: edges bound the exact quantiles within one bin width") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(17)
    val rows = (1 to 4000).map(i =>
      (Seq("A", "B")(i % 2), 1000.0 + rng.nextDouble() * 400000.0))
    val df = rows.toDF("o_orderpriority", "o_totalprice")
    val bw = 16384L
    val got = Sketches.histogramQuantiles(df, bw).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((prio, vals) <- rows.groupBy(_._1)) {
      val sorted = vals.map(_._2).sorted
      val n = sorted.length
      val (exact50, exact90) = (sorted((n + 1) / 2 - 1), sorted((9 * n + 9) / 10 - 1))
      val (gn, p50, p90) = got(prio)
      assert(gn === n.toLong)
      assert(p50 <= exact50 && exact50 < p50 + bw, s"$prio p50 edge $p50 vs exact $exact50")
      assert(p90 <= exact90 && exact90 < p90 + bw, s"$prio p90 edge $p90 vs exact $exact90")
    }
  }

  test("histogramQuantiles: quantiles from merged partial histograms equal the direct run") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(23)
    val rows = (1 to 1000).map(i => ("X", 1000.0 + rng.nextDouble() * 100000.0))
    val (h1, h2) = rows.splitAt(400)
    // the sketch state is (bin -> count); merging = unioning the halves'
    // rows before binning ≡ summing their bin counts, so running the
    // operator on the union IS the partial-merge result
    val direct = Sketches.histogramQuantiles(rows.toDF("o_orderpriority", "o_totalprice")).collect()
    val merged = Sketches.histogramQuantiles(
      h1.toDF("o_orderpriority", "o_totalprice")
        .union(h2.toDF("o_orderpriority", "o_totalprice"))).collect()
    assert(direct.map(_.toSeq).toSeq === merged.map(_.toSeq).toSeq)
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

  test("kmvSetOps: under-full pairs exact; overlapping sources estimate within KMV error") {
    val s = spark
    import s.implicits._
    // sources A and B share half their docs' text; C is disjoint.
    val shared = (0 until 30).map(i => (0 until 10).map(j => s"s${(i * 13 + j) % 211} c$i d$j").mkString(" "))
    val aOnly = (0 until 30).map(i => (0 until 10).map(j => s"a${(i * 17 + j) % 211} e$i f$j").mkString(" "))
    val bOnly = (0 until 30).map(i => (0 until 10).map(j => s"b${(i * 19 + j) % 211} g$i h$j").mkString(" "))
    val docs = (shared.zipWithIndex.map { case (t, i) => (i.toLong, t, "A") } ++
      shared.zipWithIndex.map { case (t, i) => (100L + i, t, "B") } ++
      aOnly.zipWithIndex.map { case (t, i) => (200L + i, t, "A") } ++
      bOnly.zipWithIndex.map { case (t, i) => (300L + i, t, "B") } ++
      Seq((400L, "zeta eta theta iota kappa lambda", "C"),
        (401L, "mu nu xi omicron pi rho sigma", "D")))
      .toDF("doc_id", "text", "source")
    val k = 64
    val got = Sketches.kmvSetOps(docs, k).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // exact sets for reference
    def shingleSet(src: String) = docs.filter(col("source") === src)
      .select(explode(graft.llm.TextOps.shingles3(graft.llm.TextOps.tokens(col("text")))))
      .distinct().collect().map(_.getString(0)).toSet
    val (sa, sb) = (shingleSet("A"), shingleSet("B"))
    val rse = 1.0 / math.sqrt(k - 2)
    val (_, unionEst, interNum, interEst, _) = got(("A", "B"))
    assert(interNum > 0L, "overlapping sources must intersect in the sketch")
    assert(math.abs(unionEst.toDouble / (sa ++ sb).size - 1.0) < 4 * rse)
    assert(math.abs(interEst.toDouble / (sa & sb).size - 1.0) < 6 * rse,
      s"interEst=$interEst exact=${(sa & sb).size}")
    // disjoint big pair: no sketch intersection
    val (_, _, inAC, ieAC, jAC) = got(("A", "C"))
    assert(inAC === 0L && ieAC === 0L && jAC === 0L)
    // C and D are both tiny and disjoint: the pair is under-full -> exact
    val (mCD, uCD, inCD, _, _) = got(("C", "D"))
    assert(mCD < k && uCD === (shingleSet("C") ++ shingleSet("D")).size.toLong && inCD === 0L)
  }

  test("hllRegisters: merge(a, b) by register MAX == sketch(a ∪ b); estimate within HLL error") {
    val s = spark
    import s.implicits._
    // two disjoint daily slices of one corpus, plus a shared doc (merging
    // must be duplicate-insensitive)
    val dayA = (0 until 40).map(i =>
      (i.toLong, (0 until 15).map(j => s"a${(i * 31 + j * 7) % 1499} u$i v$j").mkString(" "), "en"))
    val dayB = (0 until 40).map(i =>
      (100L + i, (0 until 15).map(j => s"b${(i * 29 + j * 11) % 1499} p$i q$j").mkString(" "), "en"))
    val shared = Seq((200L, "alpha beta gamma delta epsilon", "en"))
    val a = (dayA ++ shared).toDF("doc_id", "text", "lang")
    val b = (dayB ++ shared).toDF("doc_id", "text", "lang")
    val union = (dayA ++ dayB ++ shared).toDF("doc_id", "text", "lang")
    def regMap(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val (ra, rb, ru) = (regMap(a), regMap(b), regMap(union))
    val merged = (ra.keySet ++ rb.keySet).map(k =>
      k -> math.max(ra.getOrElse(k, 0), rb.getOrElse(k, 0))).toMap
    assert(merged === ru, "pairwise register MAX must equal the union-corpus sketch")
    // estimate accuracy: HLL relative standard error ≈ 1.04/sqrt(m)
    val est = Sketches.hllDistinctTokens(union).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    val (estE6, exact) = est("en")
    val rse = 1.04 / math.sqrt(256.0)
    assert(math.abs(estE6.toDouble / 1e6 / exact - 1.0) < 4 * rse,
      s"est=${estE6 / 1e6} exact=$exact outside 4·RSE")
    // duplicate-insensitivity: doubling every doc leaves the sketch unchanged
    val doubled = (dayA ++ dayB ++ shared ++ dayA).toDF("doc_id", "text", "lang")
    assert(regMap(doubled) === ru, "HLL state must ignore duplicates")
  }

  test("countMinHeavyHitters matches a sequential grid replay; est dominates exact") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(23)
    // Zipf-ish: token w<j> appears with frequency ~ 1/(j+1)
    val docs = (0 until 80).map { i =>
      val words = Seq.fill(20)(s"w${(rng.nextInt(1000) % (rng.nextInt(30) + 1))}")
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val depth = 4; val width = 64; val topN = 10
    val got = Sketches.countMinHeavyHitters(docs, depth, width, topN).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // sequential mirror: same fingerprints, same (a,b) grid, same min readout
    val P = graft.functions.Hashing.MinHashP
    val prm = graft.functions.Hashing.minHashParams(depth)
    val counts = docs.collect().flatMap(_.getString(1).split(" ")).toSeq
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val grid = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    for ((t, c) <- counts; d <- 0 until depth) {
      val fp = SequentialOracles.hash60(t) % P
      val b = ((prm(d)._1 * fp + prm(d)._2) % P) % width
      grid((d, b)) += c
    }
    def est(t: String): Long = {
      val fp = SequentialOracles.hash60(t) % P
      (0 until depth).map(d => grid((d, ((prm(d)._1 * fp + prm(d)._2) % P) % width))).min
    }
    val expTop = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(topN)
    assert(got.map(r => (r._1, r._2)).toSeq === expTop)
    got.foreach { case (t, exact, cms) =>
      assert(cms === est(t), s"grid mismatch for $t")
      assert(cms >= exact, s"CMS must never underestimate ($t: $cms < $exact)")
    }
  }

  private def uv(rows: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("uid", "val")
  }

  private def sketchRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .sortBy(x => (x._1, x._2)).toSeq

  test("adaptiveQuantileSketch: merge(a, b) == sketch(a ∪ b) EXACTLY, any split, associative") {
    val rng = new scala.util.Random(53)
    val all = (1L to 3000L).map(i => (i, math.abs(rng.nextLong()) % 1000000L))
    val direct = sketchRows(Sketches.adaptiveQuantileSketch(uv(all), k = 64))
    // uneven split
    val (a, b) = all.partition(_._1 % 3 == 0)
    val merged = Sketches.mergeQuantileSketches(
      Sketches.adaptiveQuantileSketch(uv(a), k = 64),
      Sketches.adaptiveQuantileSketch(uv(b), k = 64), k = 64)
    assert(sketchRows(merged) === direct, "merge must equal the direct sketch row-for-row")
    // three-way associative composition
    val parts = Seq(all.filter(_._1 % 3 == 0), all.filter(_._1 % 3 == 1), all.filter(_._1 % 3 == 2))
    val chained = parts.map(p => Sketches.adaptiveQuantileSketch(uv(p), k = 64))
      .reduce((x, y) => Sketches.mergeQuantileSketches(x, y, k = 64))
    assert(sketchRows(chained) === direct, "chained merge must equal the direct sketch")
    // order-independence: retention is a pure function of uid
    assert(sketchRows(Sketches.adaptiveQuantileSketch(uv(rng.shuffle(all)), k = 64)) === direct)
  }

  test("groupedAdaptiveQuantiles: distributed closed-form level == the driver path, groups isolated") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(61)
    val rows = (1L to 4000L).map(i =>
      (Seq("A", "B", "C")((i % 3).toInt), i, math.abs(rng.nextLong()) % 1000000L))
    val df = rows.toDF("grp", "uid", "val")
    val k = 64
    val qs = Seq(500000L, 900000L)
    val got = Sketches.groupedAdaptiveQuantiles(df, k = k, qPpms = qs)
      .collect().map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // per group, the fully distributed path must equal the ungrouped
    // operator (whose level comes from the driver-side chooseLevel walk)
    Seq("A", "B", "C").foreach { g =>
      val solo = rows.filter(_._1 == g).map(t => (t._2, t._3))
      val expect = Sketches.sketchQuantiles(
          Sketches.adaptiveQuantileSketch(uv(solo), k = k), qs)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      qs.foreach { q =>
        assert(got((g, q)) === expect(q),
          s"group $g q=$q: grouped path diverged from the per-slice ungrouped sketch")
      }
    }
    // a group that fits the budget is exact (level 0) even when others spill
    val mixed = ((1L to 2000L).map(i => ("big", i, i)) ++ (1L to 40L).map(i => ("tiny", 10000L + i, i * 5L)))
      .toDF("grp", "uid", "val")
    val tiny = Sketches.groupedAdaptiveQuantiles(mixed, k = 64, qPpms = Seq(500000L))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(5))).toMap
    assert(tiny("tiny") === ((0L, 40L, 100L)), "an under-budget group must be exact at level 0")
    assert(tiny("big")._1 > 0L, "the spilling group must have risen above level 0")
  }

  test("adaptiveQuantileSketch: rank error stays within the sampling bound; exact when n <= k") {
    val rng = new scala.util.Random(59)
    val n = 5000
    val all = (1L to n.toLong).map(i => (i, math.abs(rng.nextLong()) % 10000000L))
    val sorted = all.map(_._2).sorted
    val k = 512
    val qs = Seq(250000L, 500000L, 900000L)
    val got = Sketches.sketchQuantiles(
        Sketches.adaptiveQuantileSketch(uv(all), k = k), qs)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    qs.foreach { q =>
      val est = got(q)
      // true rank of the estimate (how many values are <= it)
      val trueRank = sorted.count(_ <= est).toDouble / n
      val err = math.abs(trueRank - q.toDouble / 1e6)
      // uniform hash-sample of ~k/2..k rows: rank error O(1/sqrt(k)); the
      // constant is generous but the bound is real (deterministic here —
      // fixed seed, fixed hash)
      assert(err <= 4.0 / math.sqrt(k.toDouble),
        s"q=$q: rank error $err exceeds bound ${4.0 / math.sqrt(k.toDouble)}")
    }
    // n <= k: level 0, the sketch is the exact multiset, quantiles exact
    val small = (1L to 100L).map(i => (i, i * 10L))
    val exact = Sketches.sketchQuantiles(
        Sketches.adaptiveQuantileSketch(uv(small), k = 256), Seq(500000L, 900000L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    exact.foreach { case (q, level, nRet, nEst, est) =>
      assert(level === 0L && nRet === 100L && nEst === 100L)
      val target = math.ceil(q.toDouble / 1e6 * 100).toInt
      assert(est === small(target - 1)._2, s"q=$q must be the exact order statistic")
    }
  }
}
