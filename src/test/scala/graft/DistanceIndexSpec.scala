package graft

import org.apache.spark.sql.functions._
import graft.graph.{DistanceIndex, Traversals}

class DistanceIndexSpec extends SparkSpec {

  private def freshRoot(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-dix-$tag")
    TempDirs.deleteOnExit(p)
    p.toString
  }

  private def pairsDF(ps: Seq[(Long, Long)]) = {
    val s = spark
    import s.implicits._
    ps.toDF("u", "v")
  }

  test("landmark index answers routed distances exactly, omits unroutable pairs") {
    // chain 10 → 0 → 1 → 2 → 3 → 4 with the single landmark 2: every
    // u→v route through 2 is the unique path, so the bound is exact
    val edges = edgesDF(Seq(10L -> 0L, 0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L))
    val root = freshRoot("chain")
    DistanceIndex.build(edges, root, landmarks = Seq(2L), maxDepth = 12)
    val got = DistanceIndex.queryUpperBounds(spark, root,
        pairsDF(Seq(0L -> 4L, 10L -> 3L, 3L -> 1L, 2L -> 2L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    // (3,1): no route to the landmark along forward edges → no bound row
    assert(got === Seq((0L, 4L, 4L), (2L, 2L, 0L), (10L, 3L, 4L)))
  }

  test("bound dominates the true distance; exact when a shortest path hits a landmark") {
    val edges = edgesDF(for {
      s <- 0L until 30L
      d <- Seq((s * 7 + 3) % 30, (s * 11 + 5) % 30) if d != s
    } yield s -> d)
    val root = freshRoot("rand")
    DistanceIndex.build(edges, root, landmarks = Seq(0L, 13L, 22L), maxDepth = 12)
    val pairs = for { u <- 0L until 30L by 3; v <- 5L until 30L by 7 } yield (u, v)
    val ub = DistanceIndex.queryUpperBounds(spark, root, pairsDF(pairs))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (u <- pairs.map(_._1).distinct) {
      val exact = Traversals.bfs(edges, u, maxDepth = 12)
        .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      for (v <- pairs.filter(_._1 == u).map(_._2); b <- ub.get((u, v))) {
        val d = exact.getOrElse(v, Long.MaxValue)
        assert(b >= d, s"bound $b below true distance $d for ($u,$v)")
      }
    }
    // a pair whose shortest path passes a landmark is answered exactly:
    // (13, v) routes through landmark 13 itself at distance 0
    val exact13 = Traversals.bfs(edges, 13L, maxDepth = 12)
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    for (v <- pairs.filter(_._1 == 13L).map(_._2); b <- ub.get((13L, v)))
      assert(b === exact13(v))
  }

  test("query path is index-only: no RDD scan, all input files under the index root") {
    val edges = edgesDF(Seq(0L -> 1L, 1L -> 2L, 2L -> 3L))
    val root = freshRoot("plan")
    DistanceIndex.build(edges, root, landmarks = Seq(1L), maxDepth = 8)
    val q = DistanceIndex.queryUpperBounds(spark, root, pairsDF(Seq(0L -> 3L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"query plan must not traverse the graph:\n$plan")
    val files = q.inputFiles
    assert(files.nonEmpty && files.forall(_.contains(root)),
      s"query must read only the committed index, saw ${files.mkString(",")}")
    // refresh = one new atomic commit on each side; old version stays readable
    DistanceIndex.build(edgesDF(Seq(0L -> 1L)), root, landmarks = Seq(1L), maxDepth = 8)
    val fwd = new graft.operators.CommitTable(spark, s"$root/fwd", "vertex")
    assert(fwd.asOf(0L).count() === 3L) // 1,2,3 reachable from landmark 1
    assert(fwd.read().count() === 1L)   // only the landmark itself remains
  }
}
