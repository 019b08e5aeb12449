package graft

import graft.graph.{Analytics, SequentialModel}
import org.apache.spark.sql.functions.{col, sum}

class AnalyticsSpec extends SparkSpec {

  private val k4 = // complete graph on {0,1,2,3}, one direction per pair
    Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))

  test("pageRankConverged: stops on the mirror's round; tighter tol iterates longer") {
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 2L), (1L, 3L), (4L, 0L))
    def run(tolE6: Long) = Analytics.pageRankConverged(edgesDF(g), tolE6 = tolE6, maxIter = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // bit-equality with the independent sequential power iteration,
    // INCLUDING the data-dependent iteration count
    val loose = run(1000L)
    assert(loose === SequentialModel.pageRankConverged(g, tolE6 = 1000L, maxIter = 80))
    val tight = run(1L)
    assert(tight === SequentialModel.pageRankConverged(g, tolE6 = 1L, maxIter = 80))
    assert(tight.head._3 > loose.head._3, "tighter tolerance must take more rounds")
    assert(tight.head._3 < 80L, "the gate graph must actually converge, not hit the cap")
    // converged ranks sum to ~|V| (the PageRank mass invariant, sinks aside)
    intercept[IllegalArgumentException](Analytics.pageRankConverged(edgesDF(g), tolE6 = 0L))
  }

  test("katzConverged: mirror equality; hubs pass full (unnormalized) influence") {
    // star INTO vertex 9 plus a chain: Katz must rank 9 above everything
    val g = Seq((0L, 9L), (1L, 9L), (2L, 9L), (3L, 9L), (9L, 4L), (4L, 5L))
    val got = Analytics.katzConverged(edgesDF(g), alphaE3 = 100L, tolE6 = 1L, maxIter = 80)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === SequentialModel.katzConverged(g, alphaE3 = 100L, tolE6 = 1L, maxIter = 80))
    val byV = got.map(r => r._1 -> r._2).toMap
    assert(byV(9L) === got.map(_._2).max, "the in-star center must carry the top Katz score")
    // unlike PageRank there is no out-degree split: 4 inherits 9's full
    // attenuated mass, so katz(4) > katz(5) > katz(0)
    assert(byV(4L) > byV(5L) && byV(5L) > byV(0L))
    intercept[IllegalArgumentException](Analytics.katzConverged(edgesDF(g), alphaE3 = 1000L))
  }

  test("degrees: counts in/out with zero-fill") {
    val d = Analytics.degrees(edgesDF(Seq((0L, 1L), (0L, 2L), (2L, 0L))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(d === Set((0L, 2L, 1L), (1L, 0L, 1L), (2L, 1L, 1L)))
  }

  test("degrees: dedup=true collapses duplicate edges; dedup=false counts them") {
    val dup = edgesDF(Seq((0L, 1L), (0L, 1L)))
    val deduped = Analytics.degrees(dup).filter("vertex = 0").head.getLong(1)
    val raw = Analytics.degrees(dup, dedup = false).filter("vertex = 0").head.getLong(1)
    assert(deduped === 1L && raw === 2L)
  }

  test("connectedComponents: undirected, labeled by min vertex id") {
    val cc = Analytics.connectedComponents(edgesDF(Seq((1L, 0L), (1L, 2L), (5L, 6L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cc === Set((0L, 0L), (1L, 0L), (2L, 0L), (5L, 5L), (6L, 5L)))
  }

  test("triangleCounts: single triangle credits all three vertices") {
    val t = Analytics.triangleCounts(edgesDF(Seq((0L, 1L), (1L, 2L), (2L, 0L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t === Set((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("triangleCounts: K4 gives 3 per vertex; duplicate/reversed/self edges ignored") {
    val noisy = k4 ++ Seq((1L, 0L), (2L, 2L), (0L, 1L))
    val t = Analytics.triangleCounts(edgesDF(noisy))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(t === Set((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
  }

  test("triangleCounts: square has no triangles") {
    val sq = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(Analytics.triangleCounts(edgesDF(sq)).count() === 0L)
  }

  test("pageRank matches the sequential fixed-iteration oracle") {
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L), (0L, 2L))
    val got = Analytics.pageRank(edgesDF(g), numIter = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = SequentialOracles.pageRank(g, numIter = 10)
    assert(got.keySet === want.keySet)
    // engine output is rounded to 1e-6; allow the half-grain
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 6e-7, s"vertex $v") }
  }

  test("pageRank: dangling mass is dropped (GraphX convention), floor is 0.15") {
    val got = Analytics.pageRank(edgesDF(Seq((0L, 1L))), numIter = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 0 never receives: stays at 0.15 after iter 1; 1 receives 0.85*r(0)
    assert(got(0L) === 0.15)
    assert(math.abs(got(1L) - (0.15 + 0.85 * 0.15)) < 1e-9)
  }

  test("stronglyConnectedComponents labels each SCC by its min vertex id") {
    // cycle {1,2,3} --bridge--> cycle {4,5}; bridges do NOT merge SCCs
    // (that is what distinguishes SCC from undirected CC)
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 4L))
    val got = Analytics.stronglyConnectedComponents(edgesDF(g)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L))
    // sanity: undirected CC would merge everything into one component
    val cc = Analytics.connectedComponents(edgesDF(g)).collect()
      .map(r => r.getLong(1)).toSet
    assert(cc === Set(1L))
  }

  test("kCore: clique survives with its degree, pendant tail peels off transitively") {
    // K4 on 0-3 plus a chain 3-4-5: removing 5 (deg 1) drops 4 to deg 1,
    // which drops too — the fixpoint, not single-pass, behavior
    val g = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L))
    val got = Analytics.kCore(edgesDF(g), k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 3L), (1L, 3L), (2L, 3L), (3L, 3L)))
    // k=3: same core; k=4: nothing qualifies
    assert(Analytics.kCore(edgesDF(g), k = 3).count() === 4L)
    assert(Analytics.kCore(edgesDF(g), k = 4).count() === 0L)
  }

  test("labelPropagation: two cliques with a bridge settle into two communities") {
    // K4 on 0-3 and K4 on 10-13 joined by one bridge 3-10: after a few
    // rounds each clique agrees on its min id; the bridge endpoints stay
    // with their own clique (3 of 4 neighbors inside)
    val k4a = for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)
    val k4b = for (i <- 10L to 13L; j <- i + 1 to 13L) yield (i, j)
    val g = k4a ++ k4b ++ Seq((3L, 10L))
    val got = Analytics.labelPropagation(edgesDF(g), numIter = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(got(_) == 0L), s"left clique: $got")
    assert((10L to 13L).forall(got(_) == 10L), s"right clique: $got")
  }

  test("labelPropagation: numIter=0 returns self-labels; matches the sequential mirror") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L))
    val zero = Analytics.labelPropagation(edgesDF(g), numIter = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
    val got = Analytics.labelPropagation(edgesDF(g), numIter = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === graft.graph.SequentialModel.labelPropagation(g, numIter = 3))
  }

  test("kCore: duplicate/reversed/self edges don't inflate degrees") {
    val noisy = Seq((0L, 1L), (1L, 0L), (0L, 1L), (0L, 0L), (1L, 1L))
    // true undirected degree is 1 each — no 2-core
    assert(Analytics.kCore(edgesDF(noisy), k = 2).count() === 0L)
    val got = Analytics.kCore(edgesDF(noisy), k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L), (1L, 1L)))
  }

  test("personalizedPageRank: mass concentrates at the source; off-component is zero") {
    // two components: 0->1->2 (cycle back 2->0) and 10->11. Restarting at 0
    // keeps all mass in the first component; 10/11 must be exactly 0.
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (10L, 11L))
    val got = Analytics.personalizedPageRank(edgesDF(e), source = 0L, numIter = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(10L) === 0.0 && got(11L) === 0.0)
    // fixed-iteration PPR is NOT the stationary vector — in a 3-cycle mass
    // oscillates, so rank ordering is iteration-dependent; the contract is
    // the recurrence itself, checked against the sequential mirror below
    assert(got(0L) > 0.15) // the source keeps its restart mass plus the cycle's return
    // sequential mirror: same recurrence in plain Scala
    val vs = Seq(0L, 1L, 2L, 10L, 11L)
    val out = Map(0L -> Seq(1L), 1L -> Seq(2L), 2L -> Seq(0L), 10L -> Seq(11L))
    var r = vs.map(v => v -> (if (v == 0L) 1.0 else 0.0)).toMap
    for (_ <- 1 to 10) {
      val in = vs.map(v => v -> out.filter(_._2.contains(v)).keys.map(u => r(u) / out(u).size).sum).toMap
      r = vs.map(v => v -> ((if (v == 0L) 0.15 else 0.0) + 0.85 * in(v))).toMap
    }
    vs.foreach(v => assert(math.abs(got(v) - r(v)) < 1e-6, s"vertex $v: ${got(v)} vs ${r(v)}"))
  }

  test("hits: pure hub / pure authority structure; matches the sequential mirror") {
    // star: 0,1,2 all link to 3 and 4. 0-2 are pure hubs (auth 0),
    // 3-4 pure authorities (hub 0), symmetric within each group.
    val e = Seq((0L, 3L), (0L, 4L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    val got = Analytics.hits(edgesDF(e), numIter = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toList
    val byV = got.map(t => t._1 -> (t._2, t._3)).toMap
    assert(Seq(0L, 1L, 2L).map(byV(_)._1).forall(_ == 0.0)) // hubs: no in-edges
    assert(Seq(3L, 4L).map(byV(_)._2).forall(_ == 0.0))     // auths: no out-edges
    assert(byV(0L) === byV(1L) && byV(1L) === byV(2L) && byV(3L) === byV(4L))

    // sequential mirror of the exact recurrence on an asymmetric graph
    val e2 = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L))
    val got2 = Analytics.hits(edgesDF(e2), numIter = 5)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val vs = Seq(0L, 1L, 2L, 3L)
    val out = Map(0L -> Seq(1L, 2L), 1L -> Seq(2L), 2L -> Seq(0L), 3L -> Seq(2L))
    var hub = vs.map(_ -> 1.0).toMap
    var auth = vs.map(_ -> 1.0).toMap
    for (_ <- 1 to 5) {
      // .keys.toSeq before mapping: a Set.map would collapse TIED hub
      // scores (vertices 1 and 3 tie here) and silently drop mass
      val aRaw = vs.map(v => v -> out.filter(_._2.contains(v)).keys.toSeq.map(hub).sum).toMap
      val at = aRaw.values.sum
      auth = aRaw.map { case (v, m) => v -> m / at }
      val hRaw = vs.map(v => v -> out.getOrElse(v, Nil).map(auth).sum).toMap
      val ht = hRaw.values.sum
      hub = hRaw.map { case (v, m) => v -> m / ht }
    }
    vs.foreach { v =>
      assert(math.abs(got2(v)._1 - auth(v)) < 6e-7, s"auth $v")
      assert(math.abs(got2(v)._2 - hub(v)) < 6e-7, s"hub $v")
    }
  }

  test("commonNeighbors: non-adjacent pair found, adjacent pair suppressed") {
    // 0 and 1 share neighbors {2,3,4} and are NOT adjacent -> reported (so
    // are 3,4 via {0,1,2}). 0 and 2 share {3,4} but 0-2 IS an edge ->
    // suppressed even at minCommon=2.
    val e = Seq((0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    val got3 = Analytics.commonNeighbors(edgesDF(e), minCommon = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got3 === Seq((0L, 1L, 3L), (3L, 4L, 3L)))
    val got2 = Analytics.commonNeighbors(edgesDF(e), minCommon = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got2.contains((0L, 2L)) && got2.contains((0L, 1L)))
  }

  test("adamicAdar: hand-computed weights, adjacency suppression, rare centers weigh more") {
    // undirected: 1-3, 2-3, 1-4, 2-4, 4-5. Degrees: 1:2, 2:2, 3:2, 4:3, 5:1.
    // pair (1,2): common {3 (deg 2), 4 (deg 3)} -> aa = 1/ln2 + 1/ln3
    // pair (3,4): common {1 (deg 2), 2 (deg 2)} -> aa = 2/ln2 (rarer centers,
    // HIGHER score than (1,2) despite equal common-neighbor count)
    val e = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (4L, 5L))
    val got = Analytics.adamicAdar(edgesDF(e), minCommon = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) === Seq((1L, 2L, 2L), (3L, 4L, 2L)))
    val aa12 = 1.0 / math.log(2) + 1.0 / math.log(3)
    val aa34 = 2.0 / math.log(2)
    assert(math.abs(got(0)._4 - aa12) < 1e-6 && math.abs(got(1)._4 - aa34) < 1e-6)
    assert(got(1)._4 > got(0)._4)
  }

  test("neighborJaccard: hand-computed permille, full degrees in the union denominator") {
    // same fixture as commonNeighbors: 0 and 1 share {2,3,4}, not adjacent.
    // deg(0)=3, deg(1)=3 -> union = 3+3-3 = 3 -> jaccard = 1000.
    // 3 and 4 share {0,1,2}, deg(3)=3, deg(4)=3 -> 1000 as well.
    val e = Seq((0L, 2L), (0L, 3L), (0L, 4L), (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    val got = Analytics.neighborJaccard(edgesDF(e), minCommon = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((0L, 1L, 3L, 1000L), (3L, 4L, 3L, 1000L)))
    // partial overlap: star center 10 links 11..14; 11 and 12 also link 15.
    // pair (11,12): common {10,15}=2, deg(11)=deg(12)=2 -> union 2 -> 1000;
    // add edge 11-16: deg(11)=3, union = 3+2-2 = 3 -> 2000/3 -> 666.
    val e2 = Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L), (11L, 15L), (12L, 15L), (11L, 16L))
    val got2 = Analytics.neighborJaccard(edgesDF(e2), minCommon = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got2.contains((11L, 12L, 2L, 666L)), s"got $got2")
  }

  test("neighborJaccard matches a brute-force model (cap on centers, full degrees in unions)") {
    val rng = new scala.util.Random(29)
    val edges = Seq.fill(120)((rng.nextInt(25).toLong, rng.nextInt(25).toLong))
    val maxDeg = 6
    val und = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val allowed = nbrs.filter(_._2.size <= maxDeg).keySet
    val vs = nbrs.keySet.toSeq.sorted
    val expected = (for {
      a <- vs; b <- vs if a < b && !und.contains((a, b))
      common = (nbrs(a) & nbrs(b)) & allowed
      if common.size >= 2
    } yield (a, b, common.size.toLong,
      common.size.toLong * 1000 / (nbrs(a).size + nbrs(b).size - common.size))).toSet
    val got = Analytics.neighborJaccard(edgesDF(edges), minCommon = 2, maxDegree = maxDeg)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
  }

  test("commonNeighbors matches a brute-force model, degree cap honored") {
    val rng = new scala.util.Random(13)
    val edges = Seq.fill(120)((rng.nextInt(25).toLong, rng.nextInt(25).toLong))
    val maxDeg = 6
    val und = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val allowed = nbrs.filter(_._2.size <= maxDeg).keySet // centers under the cap
    val vs = nbrs.keySet.toSeq.sorted
    val expected = (for {
      a <- vs; b <- vs if a < b && !und.contains((a, b))
      common = (nbrs(a) & nbrs(b)) & allowed
      if common.size >= 2
    } yield (a, b, common.size.toLong)).toSet
    val got = Analytics.commonNeighbors(edgesDF(edges), minCommon = 2, maxDegree = maxDeg)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("weightedPageRank: uniform weights reproduce pageRank bit-exactly; skew shifts mass; floats rejected") {
    import org.apache.spark.sql.functions.{expr, lit}
    val e = edgesDF(Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 0L)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // c/(c·n) divides to the same correctly-rounded double as 1/n, so a
    // CONSTANT weight must reproduce the uniform walk exactly
    val base = rows(Analytics.pageRank(e, numIter = 6))
    val unif = rows(Analytics.weightedPageRank(e.withColumn("ew", lit(7L)), "ew", numIter = 6))
    assert(unif === base)
    // skew 0->1 heavily: vertex 1 must outrank vertex 2's share of 0's mass
    val skewed = Analytics.weightedPageRank(
      e.withColumn("ew", expr("CASE WHEN src = 0 AND dst = 1 THEN 100 ELSE 1 END")),
      "ew", numIter = 6).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val even = base.toMap
    assert(skewed(1L) > even(1L), s"skewed weight did not raise rank(1): $skewed vs $even")
    intercept[IllegalArgumentException](
      Analytics.weightedPageRank(e.withColumn("ew", lit(1.5)), "ew", numIter = 3))
    // non-positive weights fail loudly row-wise instead of silently
    // NULLing the division (zero out-weight total)
    val ex = intercept[RuntimeException](
      Analytics.weightedPageRank(e.withColumn("ew", lit(0L)), "ew", numIter = 2).collect())
    assert(ex.getMessage.contains("must be positive"))
    // parallel (src, dst) edges with DISTINCT weights sum (multigraph):
    // duplicating every edge with weight 2w on top of w must equal one
    // edge of weight 3w — same transition matrix, bit-identical ranks
    val tripled = rows(Analytics.weightedPageRank(
      e.withColumn("ew", lit(7L)).union(e.withColumn("ew", lit(14L))), "ew", numIter = 6))
    assert(tripled === unif)
  }

  test("commonNeighbors: adaptive percentile cap equals the fixed cap at the model-computed value") {
    val rnd = new scala.util.Random(41)
    val edges = Seq.fill(80)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
    // model: undirected simple degrees, cap = min d with cum*100 >= tot*p
    val und = edges.map(e => (e._1 min e._2, e._1 max e._2)).distinct
    val degs = (und ++ und.map(_.swap)).groupBy(_._1).map(_._2.size).toSeq.sorted
    val p = 80
    val cap = degs.find(d => degs.count(_ <= d) * 100 >= degs.size * p).get
    assert(cap < degs.max, "test graph too uniform — cap must exercise the capped path")
    val adaptive = Analytics.commonNeighbors(edgesDF(edges), minCommon = 2,
      capPercentile = Some(p)).collect().map(_.toSeq).toSeq
    val fixed = Analytics.commonNeighbors(edgesDF(edges), minCommon = 2,
      maxDegree = cap).collect().map(_.toSeq).toSeq
    assert(adaptive === fixed)
  }

  test("betweennessProfile: path, star, and bridge hand-checks") {
    def bc(edges: Seq[(Long, Long)], seeds: Seq[Long]) =
      Analytics.betweennessProfile(edgesDF(edges), seeds)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // directed path 0->1->2->3, all seeds: δ from 0: v1 gets (1+δ2)=2, v2
    // gets 1; from 1: v2 gets 1; from 2,3: nothing downstream of interior
    assert(bc(Seq((0L, 1L), (1L, 2L), (2L, 3L)), Seq(0L, 1L, 2L, 3L))
      === Map(1L -> 2.0, 2L -> 2.0))
    // out-star from center 9: leaves are endpoints only — no betweenness
    assert(bc(Seq((9L, 1L), (9L, 2L), (9L, 3L)), Seq(9L, 1L, 2L, 3L)) === Map.empty)
    // diamond + tail 0->{1,2}->3->4: from seed 0, σ(3)=2 so
    // δ(3)=(2/2)(1+0)=1 and each of 1,2 gets (1/2)(1+δ(3))=1;
    // adding seed 1 contributes δ(3)=1 more via 1->3->4
    val g = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    assert(bc(g, Seq(0L)) === Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0))
    assert(bc(g, Seq(0L, 1L)) === Map(1L -> 1.0, 2L -> 1.0, 3L -> 2.0))
  }

  test("betweennessProfile: agrees with the sequential Brandes model on random graphs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val n = 14
      val edges = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val seeds = Seq(0L, 1L, 2L)
      val got = Analytics.betweennessProfile(edgesDF(edges), seeds, maxDepth = 12)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      val want = SequentialModel.betweenness(edges, seeds, maxDepth = 12)
      assert(got === want, s"trial $trial diverged on edges $edges")
    }
  }

  test("betweennessProfile: maxDepth truncates dependency beyond the bound") {
    // path 0->1->2->3 with maxDepth=2: seed 0 reaches 1,2 only; δ(1)=2, δ(2)=0...
    // model mirrors the same bound, so just cross-check
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val got = Analytics.betweennessProfile(edgesDF(e), Seq(0L), maxDepth = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got === SequentialModel.betweenness(e, Seq(0L), maxDepth = 2))
    assert(got === Map(1L -> 1.0)) // 2 is reached but contributes only as endpoint
  }

  test("harmonicProfile: hand-computed permilles on a path; unreached seeds emit no row") {
    // 0 -> 1 -> 2: seed 0 reaches 1 at d=1 (1000) and 2 at d=2 (500);
    // seed 2 reaches nothing -> no output row (harmonic sum over the
    // empty set — the disconnection-robust convention)
    val got = Analytics.harmonicProfile(edgesDF(Seq((0L, 1L), (1L, 2L))),
        seeds = Seq(0L, 2L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 2L, 1500L)))
  }

  test("topoLayers: diamond + chain layers are longest-path depths; sources are 0") {
    // diamond 0->{1,2}->3 plus a long chain 3->4->5: layer = longest path
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (0L, 5L)) // shortcut edge must NOT shorten 5's layer (longest, not shortest)
    val got = Analytics.topoLayers(edgesDF(e)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 0L), (1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L)))
  }

  test("topoLayers: a cycle trips the round cap loudly instead of spinning") {
    val ex = intercept[IllegalArgumentException] {
      Analytics.topoLayers(edgesDF(Seq((1L, 2L), (2L, 3L), (3L, 1L))), maxRounds = 10)
    }
    assert(ex.getMessage.contains("cycle"))
  }

  test("topoLayers matches the independent sequential model on random DAGs") {
    for (seed <- Seq(5, 23)) {
      val rng = new scala.util.Random(seed)
      val edges = Seq.fill(200)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
        .filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))) // orient -> DAG
      val expected = SequentialModel.topoLayers(edges).toSeq.sorted
      val got = Analytics.topoLayers(edgesDF(edges)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === expected, s"seed $seed")
    }
  }

  test("kTruss: K4 survives at k=4, a pendant triangle survives only at k=3, bridges never") {
    // K4 on {0,1,2,3} (every edge closes 2 triangles), a pendant triangle
    // {3,4,5} (support 1 each), and a bridge 5-6 (support 0)
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 4L), (4L, 5L), (3L, 5L), (5L, 6L))
    val got4 = Analytics.kTruss(edgesDF(e), k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got4 === Seq((0L, 1L, 2L), (0L, 2L, 2L), (0L, 3L, 2L),
      (1L, 2L, 2L), (1L, 3L, 2L), (2L, 3L, 2L)))
    val got3 = Analytics.kTruss(edgesDF(e), k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got3.size === 9 && !got3.contains((5L, 6L)), s"k=3 truss wrong: $got3")
  }

  test("kTruss: peeling cascades — a triangle strip dissolves entirely at k=4") {
    val strip = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    // (1,2) and (2,3) start at support 2, but dropping the support-1 edges
    // leaves them triangle-less -> second wave empties the graph
    assert(Analytics.kTruss(edgesDF(strip), k = 4).collect().isEmpty)
  }

  test("kTruss matches the independent sequential model on random graphs") {
    for (seed <- Seq(3, 17)) {
      val rng = new scala.util.Random(seed)
      val edges = Seq.fill(160)((rng.nextInt(30).toLong, rng.nextInt(30).toLong))
      val expected = SequentialModel.kTruss(edges, k = 4).toSeq
        .map { case ((a, b), sp) => (a, b, sp.toLong) }.sorted
      val got = Analytics.kTruss(edgesDF(edges), k = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === expected, s"seed $seed")
    }
  }

  test("bipartiteCheck: even cycle yes, odd cycle no, per-component verdicts") {
    // component 0: square 0-1-2-3-0 (even cycle -> bipartite)
    // component 10: triangle 10-11-12 (odd cycle -> not)
    // component 20: single edge (trivially bipartite)
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L), (20L, 21L))
    val got = Analytics.bipartiteCheck(edgesDF(e)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === Seq((0L, 4L, true), (10L, 3L, false), (20L, 2L, true)))
  }

  test("bipartiteCheck: odd cycle found through a long bipartite limb; dups/self-loops ignored") {
    // pentagon 0..4 (odd) with a path 4-5-6-7 hanging off it: the whole
    // component is non-bipartite even though the limb alone is 2-colorable
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L),
      (4L, 5L), (5L, 6L), (6L, 7L),
      (1L, 0L), (0L, 1L), (5L, 5L)) // reversed dup, dup, self-loop
    val got = Analytics.bipartiteCheck(edgesDF(e)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got === Seq((0L, 8L, false)))
  }

  test("bipartiteCheck matches a brute-force 2-coloring model on a random graph") {
    val rng = new scala.util.Random(29)
    val edges = Seq.fill(60)((rng.nextInt(40).toLong, rng.nextInt(40).toLong))
    val und = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).toSet }.withDefaultValue(Set.empty[Long])
    // sequential BFS 2-coloring per component
    var color = Map.empty[Long, Int]
    var comp = Map.empty[Long, Long]
    var nonBip = Set.empty[Long]
    nbrs.keySet.toSeq.sorted.foreach { s =>
      if (!comp.contains(s)) {
        var frontier = Set(s); color += s -> 0
        var members = Set(s)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap { v =>
            nbrs(v).flatMap { w =>
              if (!color.contains(w)) { color += w -> (1 - color(v)); members += w; Some(w) }
              else { if (color(w) == color(v)) nonBip += s; None }
            }
          }
        }
        members.foreach(m => comp += m -> members.min)
      }
    }
    val roots = comp.values.toSet
    val expected = roots.map { r =>
      val members = comp.collect { case (v, c) if c == r => v }
      (r, members.size.toLong, !nonBip.exists(s => comp(s) == r))
    }
    val got = Analytics.bipartiteCheck(edgesDF(edges)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === expected)
  }

  test("clusteringCoefficient: hand-computed triangle/degree profile") {
    // K3 on {0,1,2} plus a pendant 2-3: coeff(0)=coeff(1)=1,
    // coeff(2)=2*1e6/(3*2)=333333, 3 has deg 1 (excluded)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L))
    val got = Analytics.clusteringCoefficient(edgesDF(edges)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (0L, 2L, 1L, 1000000L),
      (1L, 2L, 1L, 1000000L),
      (2L, 3L, 1L, 333333L)))
  }

  test("closenessProfile matches the sequential BFS oracle per seed") {
    // path 0->1->2->3 plus a branch 1->4; seed 9 isolated (no row beyond itself)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (1L, 4L))
    val seeds = Seq(0L, 1L, 9L)
    val expected = seeds.flatMap { s0 =>
      val lv = SequentialOracles.bfs(edges, Seq(s0), maxDepth = 12) - s0
      if (lv.isEmpty) None
      else Some((s0, lv.size.toLong, lv.values.map(_.toLong).sum))
    }.toSet
    // seed 9 is absent from the edge set -> bfs from it must not blow up;
    // it reaches nothing, so it contributes no row
    val got = Analytics.closenessProfile(edgesDF(edges), seeds, maxDepth = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // sanity on the known shape: from 0 -> reaches {1,2,3,4} at depths 1,2,3,2
    assert(got.contains((0L, 4L, 8L)))
  }

  test("eccentricityProfile: max hop distance per seed on a known path") {
    // path 0->1->2->3 plus branch 1->4; seed 2 reaches only 3
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (1L, 4L))
    val got = Analytics.eccentricityProfile(edgesDF(edges), Seq(0L, 2L), maxDepth = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 4L, 3L), (2L, 1L, 1L)))
    // the hop bound caps the reported eccentricity
    val bounded = Analytics.eccentricityProfile(edgesDF(edges), Seq(0L), maxDepth = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(bounded === Seq((0L, 3L, 2L)))
  }

  test("neighborStats: hand-computed one-hop aggregates, sinks count as degree 0") {
    // 0 -> {1, 2}, 1 -> {2}, 2 -> nothing (sink); self-loop and duplicate dropped
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 2L), (1L, 2L), (2L, 2L))
    val got = Analytics.neighborStats(edgesDF(edges))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // 0: nbrs {1, 2} with out-degrees {1, 0} -> mean permille = 1*1000 div 2 = 500
    // 1: nbr {2} out-degree 0 -> 0
    assert(got === Seq((0L, 2L, 1L, 2L, 500L), (1L, 1L, 2L, 2L, 0L)))
  }

  test("minimumSpanningForest: hand-computed MST; forest spans disconnected parts") {
    val s = spark
    import s.implicits._
    // square 0-1-2-3 with a heavy diagonal, plus a separate component {8, 9}:
    // MST of the square = the three lightest sides; diagonal and heavy side drop
    val edges = Seq(
      (0L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 3L), (3L, 0L, 9L), (0L, 2L, 8L),
      (8L, 9L, 5L)).toDF("src", "dst", "w")
    val got = Analytics.minimumSpanningForest(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 3L), (8L, 9L, 5L)))
  }

  test("minimumSpanningForest matches sequential Kruskal; duplicate weights rejected") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val pairs = (1 to 150).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val weighted = pairs.map { case (a, b) =>
      (a, b, math.min(a, b) * 31 + math.max(a, b)) } // unique per canonical pair
    val got = Analytics.minimumSpanningForest(weighted.toDF("src", "dst", "w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = SequentialModel.minimumSpanningForest(weighted)
      .sortBy { case (a, b, _) => (a, b) }
    assert(got === expected)
    // tree invariant: |forest| = |vertices| - |components|
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct.size
    assert(got.size < verts)
    val dup = Seq((0L, 1L, 7L), (1L, 2L, 7L)).toDF("src", "dst", "w")
    val ex = intercept[IllegalArgumentException](Analytics.minimumSpanningForest(dup))
    assert(ex.getMessage.contains("unique edge weights"))
  }

  test("louvainSweep converges two triangles to two communities") {
    // triangles {0,1,2} and {3,4,5}, bridge 2-3: the modularity optimum is
    // one community per triangle; the parity-alternating sweep finds it
    // from singleton init (simultaneous moves would oscillate 0<->1)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (5L, 3L), (2L, 3L))
    val got = Analytics.louvainSweep(edgesDF(edges), rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(Set(got(0L), got(1L), got(2L)).size === 1, s"triangle A split: $got")
    assert(Set(got(3L), got(4L), got(5L)).size === 1, s"triangle B split: $got")
    assert(got(0L) !== got(3L), s"triangles merged: $got")
  }

  test("louvainSweep matches the sequential mirror on a random graph") {
    val rnd = new scala.util.Random(31)
    val edges = (1 to 120).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
    val got = Analytics.louvainSweep(edgesDF(edges), rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === SequentialModel.louvainSweep(edges, rounds = 5))
  }

  test("louvain (full, with coarsening) matches the sequential mirror on random graphs") {
    val rnd = new scala.util.Random(53)
    for (seed <- 1 to 3) {
      val edges = (1 to 100 + seed * 20)
        .map(_ => (rnd.nextInt(22).toLong, rnd.nextInt(22).toLong))
        .filter { case (a, b) => a != b }
      val got = Analytics.louvain(edgesDF(edges), rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === SequentialModel.louvain(edges, rounds = 4), s"seed $seed diverged")
    }
  }

  test("louvain coarsening merges what the sweep leaves split: ring of cliques") {
    // four 4-cliques in a ring, each pair bridged by ONE edge: the sweep
    // finds the cliques; the level-2 sweep then considers merging whole
    // cliques — and must at minimum not lose modularity on the way
    def clique(base: Long) = for {
      i <- 0 until 4; j <- i + 1 until 4
    } yield (base + i, base + j)
    val edges = (Seq(0L, 4L, 8L, 12L).flatMap(clique) ++
      Seq((3L, 4L), (7L, 8L), (11L, 12L), (15L, 0L))).map { case (a, b) => (a, b) }
    val l1 = Analytics.louvainSweep(edgesDF(edges), rounds = 4)
    val full = Analytics.louvain(edgesDF(edges), rounds = 4)
    def q(labels: org.apache.spark.sql.DataFrame): Double =
      Analytics.modularity(edgesDF(edges),
          labels.select(col("vertex"), col("label")))
        .agg(sum("q_6")).head.getDouble(0)
    val (q1, qF) = (q(l1), q(full))
    // modularity is non-decreasing across levels (level-2 moves relocate
    // whole communities and only execute on positive exact-integer gain)
    assert(qF >= q1 - 1e-9, s"coarsening lost modularity: sweep=$q1 full=$qF")
    // and the full pass still assigns every vertex
    assert(full.count() === 16L)
  }

  test("louvain modularity is non-decreasing across levels on the gate graph shape") {
    val rnd = new scala.util.Random(61)
    val edges = (1 to 300).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    def q(labels: org.apache.spark.sql.DataFrame): Double =
      Analytics.modularity(edgesDF(edges), labels.select(col("vertex"), col("label")))
        .agg(sum("q_6")).head.getDouble(0)
    val q1 = q(Analytics.louvainSweep(edgesDF(edges), rounds = 4))
    val qF = q(Analytics.louvain(edgesDF(edges), rounds = 4))
    assert(qF >= q1 - 1e-9, s"coarsening lost modularity: sweep=$q1 full=$qF")
  }

  test("modularity: hand-computed two triangles joined by a bridge") {
    // triangles {0,1,2} and {3,4,5}, bridge 2-3; communities = the triangles.
    // m = 7, in_c = 3 each, d_c = 7 each:
    // Q_c = 3/7 - (7/14)^2 = 0.17857142... -> 0.178571
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (5L, 3L), (2L, 3L))
    val s = spark
    import s.implicits._
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 3L), (4L, 3L), (5L, 3L))
      .toDF("vertex", "label")
    val got = Analytics.modularity(edgesDF(edges), labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq((0L, 3L, 3L, 7L, 0.178571), (3L, 3L, 3L, 7L, 0.178571)))
  }

  test("modularity: one community scores exactly zero; direction/duplicates ignored") {
    // duplicate + reversed edges collapse to the same undirected simple graph
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (1L, 2L))
    val s = spark
    import s.implicits._
    val labels = Seq((0L, 9L), (1L, 9L), (2L, 9L)).toDF("vertex", "label")
    val got = Analytics.modularity(edgesDF(edges), labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    // m = 2, in = 2, deg_sum = 4: Q = 2/2 - (4/4)^2 = 0
    assert(got === Seq((9L, 3L, 2L, 4L, 0.0)))
  }

  test("maximalIndependentSet: independent, maximal, and equals sequential greedy on random graphs") {
    val rnd = new scala.util.Random(71)
    for (seed <- 1 to 4) {
      val edges = (1 to 80 + seed * 30)
        .map(_ => (rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
        .filter { case (a, b) => a != b }
      val got = Analytics.maximalIndependentSet(edgesDF(edges))
        .collect().map(_.getLong(0)).toSeq
      assert(got === SequentialModel.greedyMis(edges), s"seed $seed diverged from greedy")
      val mis = got.toSet
      val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // independence: no edge inside the set
      assert(!und.exists { case (a, b) => mis(a) && mis(b) }, s"seed $seed: not independent")
      // maximality: every non-member has a member neighbor
      val verts = und.flatMap(e => Seq(e._1, e._2)).toSet
      val adj = (und ++ und.map(_.swap)).groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
      assert((verts -- mis).forall(v => adj(v).exists(mis)), s"seed $seed: not maximal")
    }
  }

  test("maximalIndependentSet: isolated pair and triangle — hand-checked") {
    // triangle 0-1-2 plus disjoint edge 3-4: MIS has one triangle vertex + one of the pair
    val got = Analytics.maximalIndependentSet(edgesDF(Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L))))
      .collect().map(_.getLong(0)).toSet
    assert(got.intersect(Set(0L, 1L, 2L)).size === 1)
    assert(got.intersect(Set(3L, 4L)).size === 1)
  }

  test("greedyColoring: proper, equals sequential greedy, colors ≤ maxdeg+1 on random graphs") {
    val rnd = new scala.util.Random(83)
    for (seed <- 1 to 4) {
      val edges = (1 to 80 + seed * 30)
        .map(_ => (rnd.nextInt(22).toLong, rnd.nextInt(22).toLong))
        .filter { case (a, b) => a != b }
      val got = Analytics.greedyColoring(edgesDF(edges))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === SequentialModel.greedyColoring(edges), s"seed $seed diverged from greedy")
      val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      assert(und.forall { case (a, b) => got(a) != got(b) }, s"seed $seed: improper coloring")
      val maxDeg = (und ++ und.map(_.swap)).groupBy(_._1).values.map(_.size).max
      assert(got.values.max <= maxDeg, s"seed $seed: exceeded greedy bound")
    }
  }

  test("greedyColoring: odd cycle needs 3 colors, even cycle 2") {
    val odd = Analytics.greedyColoring(edgesDF(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 0L))))
      .collect().map(_.getLong(1)).toSet
    assert(odd === Set(0L, 1L, 2L))
    val even = Analytics.greedyColoring(edgesDF(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))))
      .collect().map(_.getLong(1)).toSet
    assert(even === Set(0L, 1L))
  }

  test("hyperBall matches the register-exact mirror; estimates track exact ball sizes") {
    val rnd = new scala.util.Random(127)
    val edges = (1 to 160).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val got = Analytics.hyperBall(edgesDF(edges), t = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === SequentialModel.hyperBall(edges, t = 8))
    // exact 8-hop out-ball per vertex for the accuracy check
    val adj = edges.distinct.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).distinct }
    def ball(v: Long): Int = {
      var cur = Set(v)
      for (_ <- 1 to 8) cur = cur ++ cur.flatMap(u => adj.getOrElse(u, Nil))
      cur.size
    }
    val errs = got.map { case (v, e3) =>
      val exact = ball(v).toDouble
      math.abs(e3.toDouble / 1000 - exact) / exact
    }
    // m = 16 registers: typical rel. error ~26%; assert a loose band on the MEAN
    val mean = errs.sum / errs.size
    assert(mean < 0.5, s"mean relative error $mean too high for m=16")
  }

  test("hyperBall: t = 0 estimates singleton balls") {
    val got = Analytics.hyperBall(edgesDF(Seq((0L, 1L), (1L, 2L))), t = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // a single item in an HLL with 16 registers: small-range correction
    // gives 16·ln(16/15) = 1.0328…, i.e. 1033 in thousandths
    assert(got.values.toSet === Set(1033L))
  }

  test("neighborhoodFunction matches the mirror; monotone N(t); one effective-diameter flag") {
    val rnd = new scala.util.Random(51)
    val edges = (1 to 120).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val got = Analytics.neighborhoodFunction(edgesDF(edges), tMax = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(got === SequentialModel.neighborhoodFunction(edges, tMax = 6))
    assert(got.map(_._2) === got.map(_._2).sorted, "N(t) must be non-decreasing in t")
    assert(got.map(_._3).sum === 1L, "exactly one effective-diameter row")
    val effT = got.find(_._3 == 1L).get._1
    assert(10L * got(effT.toInt)._2 >= 9L * got.last._2)
    if (effT > 0) assert(10L * got(effT.toInt - 1)._2 < 9L * got.last._2,
      "flagged t must be the SMALLEST qualifying t")
  }

  test("neighborhoodFunction: directed path saturates at its diameter") {
    // 0→1→2→3: every t ≥ 3 reaches all pairs; N grows strictly until then
    val got = Analytics.neighborhoodFunction(edgesDF(Seq((0L, 1L), (1L, 2L), (2L, 3L))), tMax = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1).map(_._2)
    assert(got(3) === got(4) && got(4) === got(5), "registers saturate at the diameter")
    assert(got(0) < got(1) && got(1) < got(2) && got(2) < got(3))
  }

  test("localCommunitySweep: two cliques with one bridge — the best cut is the seed's clique") {
    // K4 on 0..3 bridged to K4 on 10..13: conductance bottoms exactly at
    // the seed-side clique {0,1,2,3}
    val c1 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val c2 = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val got = Analytics.localCommunitySweep(edgesDF(c1 ++ c2 :+ (3L, 10L)), source = 0L, sweepK = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq.sortBy(_._1)
    val best = got.find(_._6 == 1L).get
    assert(best._1 === 4L, s"best prefix must be the 4-vertex seed clique, got $got")
    assert(got.take(4).map(_._2).toSet === Set(0L, 1L, 2L, 3L),
      "the first four ranked vertices must be the seed clique")
    // at the clique prefix: vol = 3+3+3+4 = 13, cut = the single bridge
    assert(best._3 === 13L && best._4 === 1L)
    assert(best._5 === (1000000L / 13L), "phi = cut/min(vol, total-vol) = 1/13")
    // monotone prefix contract: vol strictly increases, exactly one best
    assert(got.map(_._3) === got.map(_._3).sorted)
    assert(got.count(_._6 == 1L) === 1)
    intercept[IllegalArgumentException](
      Analytics.localCommunitySweep(edgesDF(c1), 0L, sweepK = 0))
  }

  test("richClub: K4 with a pendant — the club is the clique") {
    // K4 on 0..3 (all deg 3; vertex 0 also holds the pendant -> deg 4), pendant 9
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val got = Analytics.richClub(edgesDF(k4 :+ (0L, 9L)), kMax = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((4L, 6L, 1000000L)), "deg>1 = the K4, fully connected: phi = 1")
    assert(got(2L) === ((4L, 6L, 1000000L)))
    assert(got(3L) === ((1L, 0L, 0L)), "only vertex 0 has deg > 3; n_k < 2 gives phi 0")
    assert(got(4L) === ((0L, 0L, 0L)))
    // direction/duplication invariance: reversing and duplicating edges changes nothing
    val noisy = Analytics.richClub(edgesDF(k4 ++ k4.map(_.swap) :+ (0L, 9L)), kMax = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(noisy === got)
    intercept[IllegalArgumentException](Analytics.richClub(edgesDF(k4), kMax = 0))
  }

  test("densestSubgraph: clique + sparse tail — the peel isolates the clique") {
    // K5 (density 10/5 = 2) with a long path attached (pulls density down)
    val k5 = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val tail = (4L to 14L).map(v => (v, v + 1))
    val got = Analytics.densestSubgraph(edgesDF(k5 ++ tail)).collect().head
    // best snapshot is exactly the K5: 5 vertices, 10 edges, density 2.0
    assert((got.getLong(1), got.getLong(2), got.getLong(3)) === ((5L, 10L, 2000000L)))
    assert(got === Analytics.densestSubgraph(edgesDF(scala.util.Random.shuffle(k5 ++ tail))).collect().head)
  }

  test("maximalMatching: valid, maximal, equals sequential greedy on random graphs") {
    val rnd = new scala.util.Random(103)
    for (seed <- 1 to 4) {
      val edges = (1 to 70 + seed * 30)
        .map(_ => (rnd.nextInt(26).toLong, rnd.nextInt(26).toLong))
        .filter { case (a, b) => a != b }
      val got = Analytics.maximalMatching(edgesDF(edges))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === SequentialModel.greedyMatching(edges), s"seed $seed diverged from greedy")
      // validity: no vertex matched twice
      val vs = got.flatMap { case (a, b) => Seq(a, b) }
      assert(vs.distinct.size === vs.size, s"seed $seed: vertex matched twice")
      // maximality: every unmatched edge touches a matched vertex
      val matched = vs.toSet
      val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      assert(und.forall { case (a, b) => matched(a) || matched(b) }, s"seed $seed: not maximal")
      // matched endpoints form a vertex cover (the 2-approx guarantee's premise)
      assert(und.forall { case (a, b) => matched(a) || matched(b) })
    }
  }

  test("maximalMatching: path of four vertices matches one or two edges, never adjacent ones") {
    val got = Analytics.maximalMatching(edgesDF(Seq((0L, 1L), (1L, 2L), (2L, 3L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 1L), (2L, 3L)) || got === Seq((1L, 2L)))
  }

  test("coreness: H-index fixpoint equals Batagelj–Zaversnik peeling on random graphs") {
    val rnd = new scala.util.Random(109)
    for (seed <- 1 to 4) {
      val edges = (1 to 90 + seed * 40)
        .map(_ => (rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
        .filter { case (a, b) => a != b }
      val got = Analytics.coreness(edgesDF(edges))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === SequentialModel.coreness(edges), s"seed $seed diverged from peeling")
    }
  }

  test("coreness: clique vertices score k-1, pendant path scores 1") {
    // K4 {0,1,2,3} with a path 3-4-5 hanging off
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val got = Analytics.coreness(edgesDF(k4 ++ Seq((3L, 4L), (4L, 5L))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 1L, 5L -> 1L))
  }

  test("densestSubgraph matches the sequential peeling mirror on random graphs") {
    val rnd = new scala.util.Random(97)
    for (seed <- 1 to 4) {
      val edges = (1 to 60 + seed * 40)
        .map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
        .filter { case (a, b) => a != b }
      val got = Analytics.densestSubgraph(edgesDF(edges)).collect().head
      val want = SequentialModel.densestSubgraph(edges)
      assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) === want,
        s"seed $seed diverged")
      // the reported density is never below the whole-graph density (round 0 is a candidate)
      val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val v0 = und.flatMap(e => Seq(e._1, e._2)).distinct.size.toLong
      assert(got.getLong(3) >= und.size.toLong * 1000000L / v0, s"seed $seed: worse than round 0")
    }
  }

  test("degreeAssortativity matches hand-computed Newman r on star and path") {
    // star K1,4: every edge joins the hub (deg 4) to a leaf (deg 1) —
    // perfectly disassortative, r = -1
    val star = Analytics.degreeAssortativity(
      edgesDF(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L))).collect().head
    assert(star.getLong(0) === 4L)
    assert(star.getDouble(4) === -1.0)
    // path P4 (0-1-2-3): m=3, Σjk=8, Σ(j+k)=10, Σ(j²+k²)=18
    // → num = 4·3·8 − 100 = −4, den = 2·3·18 − 100 = 8, r = −0.5
    val path = Analytics.degreeAssortativity(
      edgesDF(Seq(0L -> 1L, 1L -> 2L, 2L -> 3L))).collect().head
    assert((path.getLong(0), path.getLong(1), path.getLong(2), path.getLong(3))
      === ((3L, 8L, 10L, 18L)))
    assert(path.getDouble(4) === -0.5)
    // direction, duplicates, and self-loops don't change the undirected metric
    val noisy = Analytics.degreeAssortativity(
      edgesDF(Seq(1L -> 0L, 1L -> 2L, 2L -> 3L, 2L -> 1L, 3L -> 3L))).collect().head
    assert(noisy.getDouble(4) === -0.5)
  }

  test("reciprocity counts mutual directed edges, ignoring loops and duplicates") {
    // 0→1 and 1→0 are mutual; 1→2, 2→3 are not; 3→3 is a loop (dropped);
    // duplicate 0→1 collapses — n_edges=4, n_recip=2, ratio=0.5
    val got = Analytics.reciprocity(edgesDF(
      Seq(0L -> 1L, 1L -> 0L, 0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 3L))).collect().head
    assert((got.getLong(0), got.getLong(1), got.getDouble(2)) === ((4L, 2L, 0.5)))
    // a DAG has zero reciprocity; a symmetric graph has 1.0
    val dag = Analytics.reciprocity(edgesDF(Seq(0L -> 1L, 1L -> 2L, 0L -> 2L))).collect().head
    assert((dag.getLong(1), dag.getDouble(2)) === ((0L, 0.0)))
    val sym = Analytics.reciprocity(edgesDF(
      Seq(0L -> 1L, 1L -> 0L, 1L -> 2L, 2L -> 1L))).collect().head
    assert((sym.getLong(1), sym.getDouble(2)) === ((4L, 1.0)))
  }
}
