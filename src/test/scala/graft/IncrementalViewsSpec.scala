package graft

import org.apache.spark.sql.functions.col

import graft.graph.{Analytics, IncrementalViews}
import graft.operators.CommitTable

/** The maintained degree view must be indistinguishable from a full
  * recompute at the head — across inserts, deletes, vertices leaving the
  * view entirely, and multi-version advances.
  */
class IncrementalViewsSpec extends SparkSpec {

  private def degreesOf(df: org.apache.spark.sql.DataFrame) =
    Analytics.degrees(df, dedup = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def maintained(t: CommitTable, from: Long, to: Long) =
    IncrementalViews.maintainedDegrees(t, from, to)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("maintained degrees == full recompute across inserts, deletes, and vertex departure") {
    val dir = java.nio.file.Files.createTempDirectory("graft-iview-spec")
    val t = new CommitTable(spark, dir.resolve("edges").toString, "src")
    // v0: a chain + a hub; vertex 9 exists only via edge (9, 1)
    val v0 = edgesDF(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 2L), (9L, 1L)))
    t.overwrite(v0)
    // v1: insert two edges touching a NEW vertex 7
    t.append(edgesDF(Seq((7L, 0L), (3L, 7L))))
    // v2: delete (9,1) — vertex 9 must LEAVE the view — and (0,2)
    val finalEdges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (7L, 0L), (3L, 7L))
    t.overwrite(edgesDF(finalEdges))

    assert(maintained(t, 0L, 2L) === degreesOf(edgesDF(finalEdges)))
    // single-step advances agree too (v0 -> v1, then the v1 base -> v2)
    assert(maintained(t, 0L, 1L) === degreesOf(t.asOf(1L)))
    assert(maintained(t, 1L, 2L) === degreesOf(edgesDF(finalEdges)))
    // vertex 9 is gone, vertex 7 is present
    val head = maintained(t, 0L, 2L)
    assert(!head.exists(_._1 == 9L) && head.exists(_._1 == 7L))
  }

  test("maintained degrees == full recompute on random version histories") {
    val rnd = new scala.util.Random(17)
    for (round <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-iview-rand$round")
      val t = new CommitTable(spark, dir.resolve("edges").toString, "src")
      def randomEdges(n: Int) =
        Seq.fill(n)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong)).distinct
      val e0 = randomEdges(20)
      t.overwrite(edgesDF(e0))
      val extra = randomEdges(8).filterNot(e0.contains)
      t.append(edgesDF(extra))
      val finalSet = rnd.shuffle(e0 ++ extra).drop(5)
      t.overwrite(edgesDF(finalSet))
      assert(maintained(t, 0L, 2L) === degreesOf(edgesDF(finalSet)),
        s"divergence in round $round")
    }
  }

  test("degreeDeltas: inserts +1, deletes -1, summed per endpoint") {
    val s = spark
    import s.implicits._
    val changes = Seq(
      (0L, 1L, "insert"), (0L, 2L, "insert"), (1L, 0L, "delete"))
      .toDF("src", "dst", "change_type")
    val got = IncrementalViews.degreeDeltas(changes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 2L, -1L), (1L, -1L, 1L), (2L, 0L, 1L)))
  }

  private def trianglesOf(df: org.apache.spark.sql.DataFrame) =
    Analytics.triangleCounts(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def maintainedTri(t: CommitTable, from: Long, to: Long) =
    IncrementalViews.maintainedTriangles(t, from, to)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("maintained triangles == full recompute: closing, breaking, and re-closing triangles") {
    val dir = java.nio.file.Files.createTempDirectory("graft-itri-spec")
    val t = new CommitTable(spark, dir.resolve("edges").toString, "src")
    // v0: one triangle {0,1,2} + a wedge 2-3-4 one edge short of closing
    t.overwrite(edgesDF(Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L))))
    // v1: close the wedge (insert 4-2) — triangle {2,3,4} appears
    t.append(edgesDF(Seq((4L, 2L))))
    // v2: break the original triangle (drop 1-2); {2,3,4} must survive
    t.overwrite(edgesDF(Seq((0L, 1L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L))))
    assert(maintainedTri(t, 0L, 1L) === trianglesOf(t.asOf(1L)))
    assert(maintainedTri(t, 1L, 2L) === trianglesOf(t.asOf(2L)))
    assert(maintainedTri(t, 0L, 2L) === trianglesOf(t.asOf(2L)))
    assert(maintainedTri(t, 0L, 2L) === Set((2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("maintained triangles == full recompute on random version histories") {
    val rnd = new scala.util.Random(29)
    for (round <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-itri-rand$round")
      val t = new CommitTable(spark, dir.resolve("edges").toString, "src")
      def randomEdges(n: Int) =
        Seq.fill(n)((rnd.nextInt(10).toLong, rnd.nextInt(10).toLong))
          .filter { case (a, b) => a != b }.distinct
      val e0 = randomEdges(25)
      t.overwrite(edgesDF(e0))
      val extra = randomEdges(10).filterNot(e0.contains)
      t.append(edgesDF(extra))
      val finalSet = rnd.shuffle(e0 ++ extra).drop(7)
      t.overwrite(edgesDF(finalSet))
      assert(maintainedTri(t, 0L, 2L) === trianglesOf(edgesDF(finalSet)),
        s"divergence in round $round")
      assert(maintainedTri(t, 1L, 2L) === trianglesOf(edgesDF(finalSet)),
        s"single-step divergence in round $round")
    }
  }

  private def ccOf(df: org.apache.spark.sql.DataFrame) =
    Analytics.connectedComponents(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def maintainedCc(t: CommitTable, from: Long, to: Long) =
    IncrementalViews.maintainedComponents(t, from, to)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("maintained components == full recompute: merges, new vertices, bridges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-icc-spec")
    val t = new CommitTable(spark, dir.resolve("edges").toString, "src")
    // v0: two separate components {0,1,2} and {5,6}
    t.overwrite(edgesDF(Seq((0L, 1L), (1L, 2L), (5L, 6L))))
    // v1: a bridge merging them + an edge introducing brand-new {8,9}
    t.append(edgesDF(Seq((2L, 5L), (8L, 9L))))
    val finalEdges = Seq((0L, 1L), (1L, 2L), (5L, 6L), (2L, 5L), (8L, 9L))
    assert(maintainedCc(t, 0L, 1L) === ccOf(edgesDF(finalEdges)))
    // everything merged under min-id 0 except the new pair under 8
    assert(maintainedCc(t, 0L, 1L) ===
      Set(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 0L, 6L -> 0L, 8L -> 8L, 9L -> 8L))
  }

  test("maintained components == full recompute on random insert histories") {
    val rnd = new scala.util.Random(23)
    for (round <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-icc-rand$round")
      val t = new CommitTable(spark, dir.resolve("edges").toString, "src")
      def randomEdges(n: Int) =
        Seq.fill(n)((rnd.nextInt(14).toLong, rnd.nextInt(14).toLong)).distinct
      val e0 = randomEdges(8)
      t.overwrite(edgesDF(e0))
      val e1 = randomEdges(6).filterNot(e0.contains)
      t.append(edgesDF(e1))
      val e2 = randomEdges(6).filterNot((e0 ++ e1).contains)
      t.append(edgesDF(e2))
      assert(maintainedCc(t, 0L, 2L) === ccOf(edgesDF(e0 ++ e1 ++ e2)),
        s"divergence in round $round")
      assert(maintainedCc(t, 1L, 2L) === ccOf(edgesDF(e0 ++ e1 ++ e2)),
        s"single-step divergence in round $round")
    }
  }

  test("maintained components refuse deletions loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-icc-del")
    val t = new CommitTable(spark, dir.resolve("edges").toString, "src")
    t.overwrite(edgesDF(Seq((0L, 1L), (1L, 2L))))
    t.overwrite(edgesDF(Seq((0L, 1L)))) // (1,2) deleted — could split {0,1,2}
    intercept[IllegalArgumentException](
      IncrementalViews.maintainedComponents(t, 0L, 1L).collect())
  }
}
