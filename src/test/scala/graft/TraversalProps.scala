package graft

import graft.graph.Traversals
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties of SURVEY §5.2: random digraphs in the reference's
  * domain (≤30 nodes, `utils.h:26`), distributed traversals vs the
  * sequential oracles.
  *
  * Each trial runs real Spark jobs, so the trial count is kept small; graphs
  * are capped at 14 vertices to bound Pregel superstep counts.
  */
object TraversalProps extends Properties("Traversals") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withMaxDiscardRatio(10)

  private def spark = TestSpark.spark

  private val genGraph: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 14)
    m <- Gen.choose(0, 3 * n)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(0, n - 1)
      d <- Gen.choose(0, n - 1)
    } yield (s.toLong, d.toLong))
  } yield edges

  private def df(edges: List[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    // an edgeless DataFrame still needs the schema
    if (edges.isEmpty) List((0L, 0L)).toDF("src", "dst").limit(0)
    else edges.toDF("src", "dst")
  }

  property("bfs levels == sequential level-synchronous oracle") =
    Prop.forAll(genGraph) { edges =>
      val got = Traversals.bfs(df(edges), 0L).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      got == SequentialOracles.bfs(edges, Seq(0L))
    }

  property("dfs preorder == sequential lowest-id-first oracle; visits each reachable vertex once") =
    Prop.forAll(genGraph) { edges =>
      val got = Traversals.dfsPreorder(df(edges), 0L).collect()
        .sortBy(_.getInt(1)).map(_.getLong(0)).toSeq
      got == SequentialOracles.dfsPreorder(edges, 0L) && got.distinct == got
    }

  property("reachable(BFS) == reachable(DFS)") =
    Prop.forAll(genGraph) { edges =>
      val viaBfs = Traversals.bfs(df(edges), 0L).collect().map(_.getLong(0)).toSet
      val viaDfs = Traversals.dfsPreorder(df(edges), 0L).collect().map(_.getLong(0)).toSet
      viaBfs == viaDfs
    }

  property("dfsLeaves == recursive reference-semantics oracle") =
    Prop.forAll(genGraph) { edges =>
      val got = Traversals.dfsLeaves(df(edges), 0L).collect().map(_.getLong(0)).toSeq
      got == SequentialOracles.dfsLeaves(edges, 0L)
    }

  property("weightedSssp == hop-bounded Bellman-Ford oracle") =
    Prop.forAll(genGraph, Gen.choose(1, 6)) { (edges, hops) =>
      val s = spark
      import s.implicits._
      val weighted = edges.map { case (a, b) => (a, b, (a + b) % 5 + 1) }
      val wdf =
        if (weighted.isEmpty) List((0L, 0L, 1L)).toDF("src", "dst", "w").limit(0)
        else weighted.toDF("src", "dst", "w")
      val got = Traversals.weightedSssp(wdf, 0L, hops).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = SequentialOracles.weightedSssp(weighted, 0L, hops)
      Prop(got == want) :| s"hops=$hops got $got want $want"
    }

  property("temporalReachability == synchronous hop-bounded relaxation model") =
    Prop.forAll(genGraph, Gen.choose(1, 6)) { (edges, hops) =>
      val s = spark
      import s.implicits._
      val timed = edges.map { case (a, b) => (a, b, (a * 3 + b) % 8) }
      val tdf =
        if (timed.isEmpty) List((0L, 0L, 0L)).toDF("src", "dst", "t").limit(0)
        else timed.toDF("src", "dst", "t")
      val got = Traversals.temporalReachability(tdf, 0L, startTime = 0L, maxHops = hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // independent model: synchronous Bellman-Ford over arrivals — round
      // h holds the min arrival over time-respecting paths of <= h edges
      var cur = Map(0L -> 0L)
      for (_ <- 1 to hops) {
        val next = scala.collection.mutable.Map(cur.toSeq: _*)
        for ((es, ed, t) <- timed; a <- cur.get(es) if t >= a)
          if (t + 1 < next.getOrElse(ed, Long.MaxValue)) next(ed) = t + 1
        cur = next.toMap
      }
      // time-respecting reach is a subset of static reach at every level
      val staticReach = SequentialOracles.bfs(edges, Seq(0L), hops).keySet
      Prop(got == cur && got.keySet.subsetOf(staticReach)) :| s"hops=$hops got $got want $cur"
    }

  property("main-scope SequentialModel (the g8/g9 VALUES-oracle generator) == test oracle") =
    // no Spark involved: pins the driver-gate oracle generator to this
    // suite's independent model, closing the three-way loop (Spark path ==
    // test model == gate generator)
    Prop.forAll(genGraph) { edges =>
      graft.graph.SequentialModel.dfsPreorder(edges, 0L) == SequentialOracles.dfsPreorder(edges, 0L) &&
        graft.graph.SequentialModel.dfsLeaves(edges, 0L) == SequentialOracles.dfsLeaves(edges, 0L)
    }
}
