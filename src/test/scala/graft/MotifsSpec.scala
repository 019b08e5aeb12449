package graft

import graft.graph.Motifs

class MotifsSpec extends SparkSpec {

  /** Brute-force homomorphism enumeration: assign every output variable
    * every vertex, keep assignments where every pattern edge is present in
    * the distinct edge set — and every variable-length term's pair sits in
    * its shortest-distance window (per-vertex queue BFS; a vertex reaches
    * itself only via a cycle, distance >= 1, matching the operator's
    * contract).
    */
  private def bruteFind(edges: Seq[(Long, Long)], pattern: String): Set[Seq[Long]] = {
    val terms = Motifs.parse(pattern)
    val vars = Motifs.outputVars(terms)
    val es = edges.distinct.toSet
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = edges.distinct.groupBy(_._1).map { case (s, e) => s -> e.map(_._2).distinct }
    val dist: Map[(Long, Long), Int] = vs.flatMap { s =>
      val d = scala.collection.mutable.Map.empty[Long, Int]
      var frontier = Seq(s)
      var l = 1
      while (frontier.nonEmpty && l <= vs.size + 1) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Nil)).distinct
          .filterNot(d.contains)
        next.foreach(v => d(v) = l)
        frontier = next
        l += 1
      }
      d.map { case (v, dd) => (s, v) -> dd }
    }.toMap
    def holds(t: Motifs.EdgeTerm, m: Map[String, Long]): Boolean = t.range match {
      case Some((lo, hi)) =>
        dist.get((m(t.src), m(t.dst))).exists(d => d >= lo && d <= hi)
      case None => es((m(t.src), m(t.dst)))
    }
    def assign(rem: Seq[String], acc: Map[String, Long]): Iterator[Map[String, Long]] =
      rem match {
        case Nil => Iterator.single(acc)
        case v +: rest => vs.iterator.flatMap(x => assign(rest, acc + (v -> x)))
      }
    assign(vars, Map.empty)
      .filter(m => terms.forall(t => if (t.negated) !holds(t, m) else holds(t, m)))
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

  test("variable-length parse: ranges accepted, degenerate ranges rejected") {
    assert(Motifs.parse("(a)-[2..4]-(b)") ===
      Seq(Motifs.EdgeTerm("a", "b", false, Some((2, 4)))))
    assert(Motifs.parse("(a)-[1..3]-(b); (b)-(c); !(a)-(c)").head.range === Some((1, 3)))
    intercept[IllegalArgumentException](Motifs.parse("(a)-[0..2]-(b)"))  // lo >= 1
    intercept[IllegalArgumentException](Motifs.parse("(a)-[3..2]-(b)"))  // lo <= hi
    intercept[IllegalArgumentException](Motifs.parse("(a)-[1..99]-(b)")) // hop cap
  }

  test("variable-length term: distance window on a chain, hand-checked") {
    // 0 -> 1 -> 2 -> 3 -> 4: distances are exactly the index gaps
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(chain, "(a)-[2..3]-(b)") ===
      Set(Seq(0L, 2L), Seq(0L, 3L), Seq(1L, 3L), Seq(1L, 4L), Seq(2L, 4L)))
  }

  test("variable-length uses SHORTEST distance, not any-walk length") {
    // 0->1 directly, plus the 2-step detour 0->2->1: dist(0,1) = 1, so a
    // [2..2] term must NOT match (0,1) even though a 2-walk exists
    val e = Seq((0L, 1L), (0L, 2L), (2L, 1L))
    assert(run(e, "(x)-[2..2]-(y)") === Set.empty[Seq[Long]])
    assert(run(e, "(x)-[1..2]-(y)") ===
      Set(Seq(0L, 1L), Seq(0L, 2L), Seq(2L, 1L)))
  }

  test("variable-length reaches self only around a cycle") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L))
    val got = run(e, "(x)-[3..3]-(x)")
    assert(got === Set(Seq(0L), Seq(1L), Seq(2L))) // the 3-cycle, not 3/4
  }

  test("variable-length and negated variable-length agree with brute force on random graphs") {
    val rnd = new scala.util.Random(43)
    val edges = Seq.fill(55)((rnd.nextInt(11).toLong, rnd.nextInt(11).toLong))
    for (p <- Seq(
      "(a)-[1..3]-(b); (b)-(c); !(a)-(c)",
      "(a)-[2..2]-(b)",
      "(a)-(b); (b)-(c); !(a)-[1..2]-(c)",
      "(a)-[1..2]-(b); (b)-[1..2]-(c)")) // shared-range closure reuse
      assert(run(edges, p) === bruteFind(edges, p), s"pattern $p diverged")
  }

  test("restrict pushdown equals post-filter on random graphs (seeded closure included)") {
    // the r19 contract: find(e, p, Map(v -> pred)) must equal
    // find(e, p).filter(pred(col(v))) row for row — including when the
    // restriction seeds a variable-length term's closure build (g43's
    // shape) and when the restricted variable is NOT the closure's source
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(47)
    val edges = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
    for (p <- Seq(
      "(a)-[1..3]-(b); (b)-(c); !(a)-(c)", // g43: restriction seeds the closure
      "(a)-(b); (b)-[1..2]-(c)",           // restricted var bound before the range term
      "(a)-(b); (b)-(c)")) {               // plain terms only
      val restricted = Motifs.find(edgesDF(edges), p,
          restrict = Map("a" -> (_ % 3 === 0)))
        .collect().map(_.toSeq).toSet
      val filtered = Motifs.find(edgesDF(edges), p)
        .filter(col("a") % 3 === 0)
        .collect().map(_.toSeq).toSet
      assert(restricted === filtered, s"pattern $p diverged under restrict")
      assert(restricted.nonEmpty || filtered.isEmpty) // guard against vacuous pass
    }
    // restricting a variable not in the pattern fails loudly
    intercept[IllegalArgumentException](
      Motifs.find(edgesDF(edges), "(a)-(b)", restrict = Map("z" -> (_ > 0))))
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
