package graft

import graft.graph.Motifs

class MotifsSpec extends SparkSpec {

  /** Brute-force homomorphism enumeration: assign every output variable
    * every vertex, keep assignments where every pattern edge is present in
    * the distinct edge set.
    */
  private def bruteFind(edges: Seq[(Long, Long)], pattern: String): Set[Seq[Long]] = {
    val terms = Motifs.parse(pattern)
    val vars = Motifs.outputVars(terms)
    val es = edges.distinct.toSet
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
    def assign(rem: Seq[String], acc: Map[String, Long]): Iterator[Map[String, Long]] =
      rem match {
        case Nil => Iterator.single(acc)
        case v +: rest => vs.iterator.flatMap(x => assign(rest, acc + (v -> x)))
      }
    assign(vars, Map.empty)
      .filter(m => terms.forall(t =>
        if (t.negated) !es((m(t.src), m(t.dst))) else es((m(t.src), m(t.dst)))))
      .map(m => vars.map(m))
      .toSet
  }

  private def run(edges: Seq[(Long, Long)], pattern: String): Set[Seq[Long]] =
    Motifs.find(edgesDF(edges), pattern)
      .collect().map(_.toSeq.map(_.asInstanceOf[Long])).toSet

  test("parse: whitespace-robust; bad terms and empty patterns rejected") {
    assert(Motifs.parse("( a )-( b );(b)-(c)") ===
      Seq(Motifs.EdgeTerm("a", "b", false), Motifs.EdgeTerm("b", "c", false)))
    assert(Motifs.parse("(a)-(b); !(b)-(a)") ===
      Seq(Motifs.EdgeTerm("a", "b", false), Motifs.EdgeTerm("b", "a", true)))
    intercept[IllegalArgumentException](Motifs.parse("(a)->(b)"))
    intercept[IllegalArgumentException](Motifs.parse("  ;  "))
    // negation restrictions: unbound negated vars, all-negated patterns
    intercept[IllegalArgumentException](Motifs.parse("(a)-(b); !(a)-(c)"))
    intercept[IllegalArgumentException](Motifs.parse("!(a)-(b)"))
  }

  test("negated terms: open wedges and non-reciprocated edges agree with brute force") {
    val rnd = new scala.util.Random(29)
    val edges = Seq.fill(50)((rnd.nextInt(10).toLong, rnd.nextInt(10).toLong))
    for (p <- Seq("(a)-(b); (b)-(c); !(a)-(c)", "(a)-(b); !(b)-(a)"))
      assert(run(edges, p) === bruteFind(edges, p), s"pattern $p diverged")
    // hand check: 0->1->2 with 0->2 chord closes that wedge; 1->2->3 stays open
    val open = run(Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L)),
      "(a)-(b); (b)-(c); !(a)-(c)")
    assert(!open(Seq(0L, 1L, 2L)) && open(Seq(1L, 2L, 3L)))
  }

  test("single edge term is the deduped edge relation") {
    val got = run(Seq((0L, 1L), (0L, 1L), (1L, 2L), (2L, 2L)), "(x)-(y)")
    assert(got === Set(Seq(0L, 1L), Seq(1L, 2L), Seq(2L, 2L)))
  }

  test("directed triangle: one cycle found in all three rotations; canonical predicate keeps one") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L)) // cycle + one chord
    val got = run(e, "(a)-(b); (b)-(c); (c)-(a)")
    assert(got === Set(Seq(0L, 1L, 2L), Seq(1L, 2L, 0L), Seq(2L, 0L, 1L)))
    val canon = Motifs.find(edgesDF(e), "(a)-(b); (b)-(c); (c)-(a)")
      .filter("a < b AND a < c").collect().map(_.toSeq).toSeq
    assert(canon === Seq(Seq(0L, 1L, 2L)))
  }

  test("homomorphism semantics: variables may repeat (self-loop binds a 2-path)") {
    // 5 -> 5 self-loop: (a)-(b); (b)-(c) matches a=b=c=5 among others
    val got = run(Seq((5L, 5L), (5L, 6L)), "(a)-(b); (b)-(c)")
    assert(got(Seq(5L, 5L, 5L)) && got(Seq(5L, 5L, 6L)))
    assert(!got(Seq(5L, 6L, 5L))) // 6 has no out-edge
  }

  test("self-loop term (x)-(x) matches only loop vertices") {
    val got = run(Seq((0L, 1L), (1L, 1L), (2L, 2L)), "(x)-(x)")
    assert(got === Set(Seq(1L), Seq(2L)))
  }

  test("V-in motif (two sources into one sink) and closing-edge filter agree with brute force") {
    val rnd = new scala.util.Random(17)
    val edges = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
    for (p <- Seq("(a)-(c); (b)-(c)", "(a)-(b); (b)-(c); (c)-(a)",
      "(a)-(b); (b)-(c); (a)-(c)", "(a)-(b); (b)-(a)"))
      assert(run(edges, p) === bruteFind(edges, p), s"pattern $p diverged")
  }

  test("disconnected patterns are rejected loudly") {
    intercept[IllegalArgumentException](
      Motifs.find(edgesDF(Seq((0L, 1L))), "(a)-(b); (c)-(d)"))
  }

  test("findSql mirrors find on the triangle pattern via DuckDB-shaped SQL run in Spark") {
    // Spark can execute the generated ANSI join chain too — cross-check the
    // mirror's semantics without DuckDB: same rows as the DataFrame plan
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (1L, 3L), (3L, 2L), (2L, 1L))
    edgesDF(e).createOrReplaceTempView("motif_edges_v")
    val sql = Motifs.findSql("SELECT src, dst FROM motif_edges_v",
      "(a)-(b); (b)-(c); (c)-(a)", extraWhere = "a < b AND a < c", orderBy = "a, b, c")
    val viaSql = spark.sql(sql).collect().map(_.toSeq).toSeq
    val viaDf = Motifs.find(edgesDF(e), "(a)-(b); (b)-(c); (c)-(a)")
      .filter("a < b AND a < c").orderBy("a", "b", "c").collect().map(_.toSeq).toSeq
    assert(viaSql === viaDf)
  }
}
