package graft

import graft.graph.Traversals

/** Golden BFS/DFS tests on the canonical small graphs of SURVEY §5.1:
  * chain, star, cycle, disconnected, self-loop, single vertex — hand-derived
  * from the reference's semantics (`secondaryServer.c:56-179`, SURVEY §2.2).
  */
class TraversalsSpec extends SparkSpec {

  private val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
  private val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
  private val cycle = Seq((0L, 1L), (1L, 2L), (2L, 0L))
  private val disconnected = Seq((0L, 1L), (5L, 6L))
  private val diamond = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))

  test("bfs: chain gives one vertex per level") {
    assert(vertexLevels(Traversals.bfs(edgesDF(chain), 0L)) ===
      Seq((0L, 0), (1L, 1), (2L, 2), (3L, 3), (4L, 4)))
  }

  test("bfs: star from hub reaches all leaves at level 1") {
    assert(vertexLevels(Traversals.bfs(edgesDF(star), 0L)) ===
      Seq((0L, 0), (1L, 1), (2L, 1), (3L, 1), (4L, 1)))
  }

  test("bfs: star from a leaf reaches nothing (directed)") {
    assert(vertexLevels(Traversals.bfs(edgesDF(star), 3L)) === Seq((3L, 0)))
  }

  test("bfs: cycle terminates and assigns min levels") {
    assert(vertexLevels(Traversals.bfs(edgesDF(cycle), 1L)) ===
      Seq((0L, 2), (1L, 0), (2L, 1)))
  }

  test("bfs: disconnected component is not reached") {
    assert(vertexLevels(Traversals.bfs(edgesDF(disconnected), 0L)) ===
      Seq((0L, 0), (1L, 1)))
  }

  test("bfs: self-loop does not revisit") {
    assert(vertexLevels(Traversals.bfs(edgesDF(Seq((0L, 0L), (0L, 1L))), 0L)) ===
      Seq((0L, 0), (1L, 1)))
  }

  test("bfs: isolated start vertex reports (start, 0) — reference records start unconditionally") {
    assert(vertexLevels(Traversals.bfs(edgesDF(chain), 42L)) === Seq((42L, 0)))
  }

  test("bfs: diamond takes min level on reconvergence") {
    assert(vertexLevels(Traversals.bfs(edgesDF(diamond), 0L)) ===
      Seq((0L, 0), (1L, 1), (2L, 1), (3L, 2)))
  }

  test("bfs: maxDepth = 0 returns just the sources at level 0") {
    assert(vertexLevels(Traversals.bfs(edgesDF(chain), 0L, maxDepth = 0)) === Seq((0L, 0)))
    assert(vertexLevels(Traversals.multiSourceBfs(edgesDF(chain), Seq(0L, 2L), maxDepth = 0)) ===
      Seq((0L, 0), (2L, 0)))
  }

  test("bfs: maxDepth truncates the traversal") {
    assert(vertexLevels(Traversals.bfs(edgesDF(chain), 0L, maxDepth = 2)) ===
      Seq((0L, 0), (1L, 1), (2L, 2)))
  }

  test("multiSourceBfs: level is min over sources") {
    assert(vertexLevels(Traversals.multiSourceBfs(edgesDF(chain), Seq(0L, 3L))) ===
      Seq((0L, 0), (1L, 1), (2L, 2), (3L, 0), (4L, 1)))
  }

  test("bfs: output is sorted by (level, vertex)") {
    val rows = Traversals.bfs(edgesDF(diamond), 0L).collect()
      .map(r => (r.getInt(1), r.getLong(0))).toSeq
    assert(rows === rows.sorted)
  }

  test("dfsPreorder: lowest-id neighbor first") {
    // from 0: 0, then 1 (lowest), its child 3, backtrack, then 2
    assert(Traversals.dfsPreorder(edgesDF(diamond), 0L).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((0L, 0), (1L, 1), (3L, 2), (2L, 3)))
  }

  test("dfsPreorder: cycle visits each vertex once") {
    assert(Traversals.dfsPreorder(edgesDF(cycle), 0L).collect()
      .map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
  }

  test("dfsLeaves: chain's only traversal-tree leaf is the end") {
    assert(vertexSet(Traversals.dfsLeaves(edgesDF(chain), 0L)) === Set(4L))
  }

  test("dfsLeaves: star from hub — every leaf spawned nothing") {
    assert(vertexSet(Traversals.dfsLeaves(edgesDF(star), 0L)) === Set(1L, 2L, 3L, 4L))
  }

  test("dfsLeaves: start excluded even when it is a leaf (cycle back to start)") {
    // 0->1->2->0: 2 spawns nothing (0 already seen) => leaf {2}; start never a leaf
    assert(vertexSet(Traversals.dfsLeaves(edgesDF(cycle), 0L)) === Set(2L))
  }

  test("dfsLeaves: deep path does not overflow the JVM stack") {
    val n = 20000L
    val path = (0L until n).map(i => (i, i + 1))
    assert(vertexSet(Traversals.dfsLeaves(edgesDF(path), 0L)) === Set(n))
  }

  test("bfs matches sequential oracle on a hand-made tangle") {
    val g = Seq((0L, 3L), (3L, 1L), (1L, 0L), (3L, 4L), (4L, 5L), (5L, 3L),
      (2L, 0L), (5L, 6L), (6L, 6L), (7L, 8L))
    val expected = SequentialOracles.bfs(g, Seq(0L)).toSeq.map { case (v, l) => (v, l) }.sorted
    assert(vertexLevels(Traversals.bfs(edgesDF(g), 0L)) === expected)
  }

  /** Sequential replay of randomWalks' next-hop rule (same md5 hash). */
  private def replayWalks(edges: Seq[(Long, Long)], numSteps: Int,
                          startMod: Long): Set[(Long, Long, Long)] = {
    val adj = SequentialOracles.adjacency(edges)
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for (start <- adj.keySet.filter(_ % startMod == 0).toSeq.sorted) {
      var v = start
      out += ((start, 0L, v))
      var t = 1
      var alive = true
      while (t <= numSteps && alive) {
        adj.get(v) match {
          case Some(ns) if ns.nonEmpty =>
            v = ns(((SequentialOracles.hash60(s"${start}_${t}_$v") % ns.size).toInt))
            out += ((start, t.toLong, v))
          case _ => alive = false // sink: walk ends early
        }
        t += 1
      }
    }
    out.toSet
  }

  test("randomWalks replays the deterministic next-hop rule; sinks end walks") {
    val g = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (2L, 4L), (3L, 1L),
      (4L, 0L), (4L, 5L), (6L, 5L), (2L, 6L)) // 5 is a sink
    val got = Traversals.randomWalks(edgesDF(g), numSteps = 5, startMod = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === replayWalks(g, numSteps = 5, startMod = 2L))
    // starts are exactly the even srcs; every start contributes its step-0 row
    assert(got.filter(_._2 == 0L).map(_._1) === Set(0L, 2L, 4L, 6L))
    // edge-validity: every consecutive hop is a real edge
    val adj = SequentialOracles.adjacency(g)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byStep = rows.toSeq.sortBy(_._2).map(_._3)
      byStep.sliding(2).foreach {
        case Seq(a, b) => assert(adj(a).contains(b), s"$a -> $b is not an edge")
        case _ => ()
      }
    }
  }

  /** Sequential replay of node2vecWalks' biased rule — own adjacency, own
    * cumulative-interval arithmetic, same md5 hash contract. */
  private def replayN2v(edges: Seq[(Long, Long)], numSteps: Int, startMod: Long,
                        pE3: Long, qE3: Long): Set[(Long, Long, Long)] = {
    val wRet = 1000000L / pE3
    val wFar = 1000000L / qE3
    val eSet = edges.toSet
    val adj = SequentialOracles.adjacency(edges)
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    for (start <- adj.keySet.filter(_ % startMod == 0).toSeq.sorted) {
      out += ((start, 0L, start))
      adj.get(start).filter(_.nonEmpty).foreach { ns0 =>
        var prev = start
        var v = ns0((SequentialOracles.hash60(s"${start}_n2v1_$start") % ns0.size).toInt)
        out += ((start, 1L, v))
        var t = 2
        var alive = true
        while (t <= numSteps && alive) {
          adj.get(v).filter(_.nonEmpty) match {
            case Some(ns) =>
              val opts = ns.sorted.map { x =>
                val w = if (x == prev) wRet
                        else if (eSet.contains((prev, x))) 1000L else wFar
                (x, w)
              }
              val tot = opts.map(_._2).sum
              val r = SequentialOracles.hash60(s"${start}_n2v${t}_${v}_$prev") % tot
              var cum = 0L
              var picked = -1L
              opts.foreach { case (x, w) =>
                if (picked < 0) { cum += w; if (r < cum) picked = x }
              }
              prev = v; v = picked
              out += ((start, t.toLong, v))
            case None => alive = false
          }
          t += 1
        }
      }
    }
    out.toSet
  }

  test("node2vecWalks replays the biased pick; p suppresses and amplifies returns") {
    val g = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (2L, 4L), (3L, 1L),
      (4L, 0L), (4L, 5L), (6L, 5L), (2L, 6L), (1L, 0L), (2L, 0L), (5L, 4L))
    def run(pE3: Long, qE3: Long) =
      Traversals.node2vecWalks(edgesDF(g), numSteps = 5, startMod = 2L, pE3 = pE3, qE3 = qE3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // bit-equality with the independent sequential replay at two (p, q) settings
    assert(run(4000L, 250L) === replayN2v(g, 5, 2L, 4000L, 250L))
    assert(run(250L, 4000L) === replayN2v(g, 5, 2L, 250L, 4000L))
    // every consecutive hop is a real edge
    val adj = SequentialOracles.adjacency(g)
    run(4000L, 250L).groupBy(_._1).foreach { case (_, rows) =>
      rows.toSeq.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Seq(a, b) => assert(adj(a).contains(b), s"$a -> $b is not an edge")
        case _ => ()
      }
    }
    // directional bias: immediate 2-step returns (v -> x -> v) should be
    // no more frequent under high p (return-averse) than under low p
    def returns(rows: Set[(Long, Long, Long)]): Int =
      rows.groupBy(_._1).values.map { ws =>
        val seq = ws.toSeq.sortBy(_._2).map(_._3)
        seq.sliding(3).count { case Seq(a, _, c) => a == c; case _ => false }
      }.sum
    assert(returns(run(1000000L, 250L)) <= returns(run(1L, 250L)),
      "return-averse p must not produce more immediate returns than return-seeking p")
    intercept[IllegalArgumentException](
      Traversals.node2vecWalks(edgesDF(g), pE3 = 0L))
  }

  test("weightedSssp: the hop bound trades path length for cost") {
    val s = spark
    import s.implicits._
    // direct hop 0->1 costs 10; the 2-hop detour through 2 costs 2
    val w = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    def costs(hops: Int) = Traversals.weightedSssp(w, 0L, hops).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(costs(1) === Map(0L -> 0L, 1L -> 10L, 2L -> 1L))
    assert(costs(2) === Map(0L -> 0L, 1L -> 2L, 2L -> 1L))
    // non-positive weights are rejected (cost monotonicity is the contract)
    val bad = Seq((0L, 1L, 0L)).toDF("src", "dst", "w")
    intercept[org.apache.spark.SparkException](
      Traversals.weightedSssp(bad, 0L, 2).collect())
  }

  test("weightedSsspFixpoint: long-hop cheap path beats the bounded answer") {
    val s = spark
    import s.implicits._
    // chain 0->1->...->5 of weight-1 edges (cost 5, 5 hops) plus a direct
    // 0->5 shortcut of weight 20: a 3-hop bound silently answers 20; the
    // fixpoint proves convergence and answers 5
    val chain = (0L until 5L).map(i => (i, i + 1, 1L))
    val w = (chain :+ ((0L, 5L, 20L))).toDF("src", "dst", "w")
    val bounded = Traversals.weightedSssp(w, 0L, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bounded(5L) === 20L) // the silent hop-truncation this gate exists for
    val fixed = Traversals.weightedSsspFixpoint(w, 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixed === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("weightedSsspFixpoint: a cap below the fixpoint throws instead of lying") {
    val s = spark
    import s.implicits._
    val chain = (0L until 6L).map(i => (i, i + 1, 1L)).toDF("src", "dst", "w")
    val ex = intercept[IllegalStateException](
      Traversals.weightedSsspFixpoint(chain, 0L, maxRounds = 2))
    assert(ex.getMessage.contains("did not converge"))
    // and a sufficient cap converges cleanly on the same input
    assert(Traversals.weightedSsspFixpoint(chain, 0L, maxRounds = 10)
      .count() === 7L)
  }

  test("weightedSsspFixpoint matches sequential Dijkstra on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 3) {
      val edges = (1 to 80 + trial * 10).map(_ =>
        (rnd.nextInt(18).toLong, rnd.nextInt(18).toLong, rnd.nextInt(9).toLong + 1))
        .filter { case (a, b, _) => a != b }
        // one weight per directed pair (lowest wins, like the relaxation)
        .groupBy(e => (e._1, e._2)).map { case ((a, b), ws) => (a, b, ws.map(_._3).min) }
        .toSeq
      val got = Traversals.weightedSsspFixpoint(edges.toDF("src", "dst", "w"), 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = graft.graph.SequentialModel.dijkstra(edges, 0L)
      assert(got === want, s"trial $trial diverged")
    }
  }

  test("landmarkBfs == one bfs per seed, in one traversal") {
    // branching + a cycle + an unreachable island (7 -> 8)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (1L, 3L), (3L, 4L), (7L, 8L))
    val seeds = Seq(0L, 3L, 7L, 42L) // 42 absent from the graph
    val got = Traversals.landmarkBfs(edgesDF(edges), seeds, maxDepth = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = seeds.flatMap { s0 =>
      Traversals.bfs(edgesDF(edges), s0, maxDepth = 10).collect()
        .map(r => (s0, r.getLong(0), r.getInt(1)))
    }.toSet
    assert(got === expected)
    // hop bound binds identically
    val bounded = Traversals.landmarkBfs(edgesDF(edges), Seq(0L), maxDepth = 1)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(bounded === Set((0L, 0), (1L, 1)))
  }

  test("shortestPathTo reconstructs the canonical min-parent path") {
    // two equal-length routes to 3 (via 1 or 2): the canonical path takes
    // the min-id predecessor, so 0 -> 1 -> 3 -> 4
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val got = Traversals.shortestPathTo(edgesDF(edges), start = 0L, target = Some(4L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 0L), (1L, 1L), (2L, 3L), (3L, 4L)))
  }

  test("shortestPathTo: unreachable target empty, self target single row, default = max reachable") {
    val edges = Seq((0L, 1L), (0L, 7L), (9L, 8L))
    assert(Traversals.shortestPathTo(edgesDF(edges), 0L, Some(8L)).collect().isEmpty)
    val self = Traversals.shortestPathTo(edgesDF(edges), 0L, Some(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(self === Seq((0L, 0L)))
    // default target: highest-id REACHABLE vertex (7, not 8/9)
    val dflt = Traversals.shortestPathTo(edgesDF(edges), 0L, None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dflt === Seq((0L, 0L), (1L, 7L)))
  }

  test("temporalReachability: time-respecting paths only, earliest arrival") {
    val s = spark
    import s.implicits._
    // via the direct 0 -(t5)-> 1 edge, arrival(1) = 6 and the 1 -(t3)-> 2
    // edge has already departed — but the 0 -(t1)-> 4 -(t2)-> 1 detour
    // arrives at 1 at time 3, JUST in time for the t=3 edge (t >= arr
    // inclusive) -> 2 reached at 4. The earlier arrival UNLOCKS an edge:
    // exactly the effect a min-over-static-paths computation cannot see.
    // 1 -(t7)-> 3 departs after every arrival at 1 -> reached at 8
    val edges = Seq(
      (0L, 1L, 5L), (1L, 2L, 3L), (1L, 3L, 7L), (0L, 4L, 1L), (4L, 1L, 2L))
      .toDF("src", "dst", "t")
    val got = Traversals.temporalReachability(edges, start = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 0L), (1L, 3L), (2L, 4L), (3L, 8L), (4L, 2L)))
    // delaying the detour edge to t=9 removes the early arrival at 1 (now
    // 6 via the direct edge) and 2 becomes temporally unreachable
    val delayed = Seq(
      (0L, 1L, 5L), (1L, 2L, 3L), (1L, 3L, 7L), (0L, 4L, 1L), (4L, 1L, 9L))
      .toDF("src", "dst", "t")
    val got2 = Traversals.temporalReachability(delayed, start = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got2 === Seq((0L, 0L), (1L, 6L), (3L, 8L), (4L, 2L)))
  }

  test("temporalReachability: hop bound and late start bind") {
    val s = spark
    import s.implicits._
    val chain = Seq((0L, 1L, 1L), (1L, 2L, 3L), (2L, 3L, 5L)).toDF("src", "dst", "t")
    val bounded = Traversals.temporalReachability(chain, 0L, maxHops = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bounded === Seq((0L, 0L), (1L, 2L), (2L, 4L)))
    // starting at time 2 makes the first edge (t=1) already departed
    val late = Traversals.temporalReachability(chain, 0L, startTime = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(late === Seq((0L, 2L)))
  }

  test("shortestPathTo respects the hop bound") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    assert(Traversals.shortestPathTo(edgesDF(edges), 0L, Some(3L), maxDepth = 2)
      .collect().isEmpty) // 3 is beyond the bound -> unreachable
    val ok = Traversals.shortestPathTo(edgesDF(edges), 0L, Some(2L), maxDepth = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ok === Seq((0L, 0L), (1L, 1L), (2L, 2L)))
  }

  test("deepWalkPairs: skip-gram window pairs over a forced single path") {
    // out-degree 1 everywhere -> the walk from 0 is exactly 0,1,2,3
    val got = Traversals.deepWalkPairs(
      edgesDF(Seq((0L, 1L), (1L, 2L), (2L, 3L))), numSteps = 3, window = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val expected = Map(
      (0L, 1L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L, (1L, 2L) -> 1L,
      (1L, 3L) -> 1L, (2L, 0L) -> 1L, (2L, 1L) -> 1L, (2L, 3L) -> 1L,
      (3L, 1L) -> 1L, (3L, 2L) -> 1L)
    assert(got === expected)
  }

  test("deepWalkPairs: a revisiting walk produces center = context pairs") {
    // 0 <-> 1 cycle: the walk oscillates, so steps 2 apart share a vertex
    val got = Traversals.deepWalkPairs(
      edgesDF(Seq((0L, 1L), (1L, 0L))), numSteps = 3, window = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got.keys.exists { case (c, x) => c == x },
      "revisits must yield self co-occurrences (standard skip-gram)")
    // window=1 never pairs identical vertices on this 2-cycle
    val w1 = Traversals.deepWalkPairs(
      edgesDF(Seq((0L, 1L), (1L, 0L))), numSteps = 3, window = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w1 === Set((0L, 1L), (1L, 0L)))
    intercept[IllegalArgumentException](
      Traversals.deepWalkPairs(edgesDF(Seq((0L, 1L))), window = 0))
  }
}
