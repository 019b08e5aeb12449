package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph motif / pattern matching — the general "find (a)→(b)→(c) where
  * (c)→(a)" query surface of a graph database (the GraphFrames-`find` shape;
  * the reference's category implies it even though its own query surface
  * stops at BFS/DFS, `secondaryServer.c:56-179`).
  *
  * Pattern syntax: semicolon-separated DIRECTED edge terms `(x)-(y)`, e.g.
  * `"(a)-(b); (b)-(c); (c)-(a)"` (a directed triangle). Vertex variables are
  * identifiers; the same variable may appear in any number of terms, and a
  * term `(x)-(x)` matches self-loops. A term prefixed with `!` is NEGATED —
  * `"(a)-(b); (b)-(c); !(a)-(c)"` finds open wedges (2-paths whose closing
  * edge is ABSENT); negated terms may only use variables bound by positive
  * terms (the GraphFrames restriction — an unbound negated variable has no
  * finite interpretation). The POSITIVE pattern graph must be CONNECTED
  * (a disconnected pattern would force a cartesian product — rejected
  * loudly; run the components as separate finds and combine explicitly).
  *
  * VARIABLE-LENGTH terms `(x)-[lo..hi]-(y)` (the Kleene-star reachability
  * term every Cypher/GSQL user writes in week one) match when the SHORTEST
  * directed hop distance from x's binding to y's binding lies in
  * `[lo, hi]` (`1 <= lo <= hi`, hi capped loudly — each extra hop is one
  * distributed join round). Shortest-DISTANCE window semantics, not
  * Cypher's exists-a-trail-of-that-length: distance is what hop-bounded
  * BFS computes, is unique per pair (so the term stays a relation, never a
  * path multiplicity), and for the `[1..k]` existence question the two
  * agree (a trail of length <= k exists iff distance <= k). Negated
  * variable-length terms (`!(x)-[1..3]-(y)` — "no path within 3 hops")
  * follow the same bound-variables rule.
  *
  * Semantics: graph HOMOMORPHISMS over the DISTINCT directed edge set —
  * distinct variables may bind the same vertex (the GraphFrames convention).
  * Callers needing injective matches or canonical representatives add
  * predicates on the output columns (e.g. `a < b && a < c` picks one
  * rotation of each directed triangle); Catalyst pushes such predicates
  * down INTO the join chain, so canonicalization prunes intermediates
  * rather than post-filtering the full match set.
  *
  * Output: one BIGINT column per vertex variable, in order of first
  * appearance in the pattern.
  *
  * Plan shape (the scale story): one distinct over the edge relation, then
  * one equi-join per edge term, sequenced connectivity-greedily so every
  * join keys on at least one already-bound variable — hash-partitioned
  * shuffle joins end to end, no theta join, AQE free to broadcast the
  * (typically tiny) downstream side or split skewed keys. A term whose
  * endpoints are BOTH already bound (the closing edge of a cycle) joins on
  * the full (src, dst) pair against the deduped relation — multiplicity ≤ 1,
  * i.e. a pure existence filter that cannot grow the intermediate. Cost is
  * therefore bounded by the true partial-match counts; for wedge-heavy
  * patterns on skewed graphs, pre-filter hub vertices (the
  * [[Analytics.commonNeighbors]] degree-cap argument) before calling.
  * Negated terms become LEFT ANTI joins on the fully-bound pair — pure
  * filters, applied after the positive chain.
  *
  * A variable-length term joins against a DERIVED relation — the
  * `[lo..hi]`-distance closure, computed once per distinct range and shared
  * by every term using it: hi-1 rounds of (frontier join edges) with an
  * anti-join against the seen set (so each pair keeps its FIRST = shortest
  * level), frontier checkpointed per round. Pair count is bounded by the
  * true reachable-within-hi set — the same iterated-closure shape as
  * topo-layers, with the hop cap keeping rounds constant. In the chain the
  * closure behaves exactly like an edge relation (distinct pairs,
  * multiplicity ≤ 1 on the bound-pair case).
  */
object Motifs {

  private val Term =
    """(!?)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*-\s*(?:\[\s*(\d+)\s*\.\.\s*(\d+)\s*\]\s*-\s*)?\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r

  /** Hop cap for variable-length terms: each extra hop is one distributed
    * join round of the closure build, so an unbounded range must be a loud
    * decision, not a default.
    */
  val MaxVarLengthHops = 12

  /** One parsed edge term: direction src→dst, possibly negated;
    * `range = Some((lo, hi))` for a variable-length `[lo..hi]` term.
    */
  final case class EdgeTerm(src: String, dst: String, negated: Boolean,
                            range: Option[(Int, Int)] = None)

  /** Parse a pattern into directed, possibly-negated edge terms. */
  def parse(pattern: String): Seq[EdgeTerm] = {
    val terms = pattern.split(";").map(_.trim).filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "motif pattern needs at least one edge term")
    val parsed = terms.map {
      case Term(neg, a, null, null, b) => EdgeTerm(a, b, neg == "!")
      case Term(neg, a, lo, hi, b) =>
        val (l, h) = (lo.toInt, hi.toInt)
        require(l >= 1 && l <= h,
          s"bad variable-length range [$lo..$hi] in '($a)-[$lo..$hi]-($b)' — need 1 <= lo <= hi")
        require(h <= MaxVarLengthHops,
          s"variable-length range [$lo..$hi] exceeds the $MaxVarLengthHops-hop cap " +
            "(each hop is one distributed join round of the closure build)")
        EdgeTerm(a, b, neg == "!", Some((l, h)))
      case t => throw new IllegalArgumentException(
        s"bad motif edge term '$t' — expected '(x)-(y)', '!(x)-(y)', or '(x)-[lo..hi]-(y)'")
    }
    require(parsed.exists(!_.negated),
      "motif pattern needs at least one positive edge term")
    val boundVars = parsed.filter(!_.negated).flatMap(t => Seq(t.src, t.dst)).toSet
    parsed.filter(_.negated).foreach { t =>
      val unbound = Seq(t.src, t.dst).filterNot(boundVars)
      require(unbound.isEmpty,
        s"negated term !(${t.src})-(${t.dst}) uses variables ${unbound.mkString(", ")} " +
          "not bound by any positive term")
    }
    parsed
  }

  /** Output variables in order of first appearance in POSITIVE terms. */
  def outputVars(terms: Seq[EdgeTerm]): Seq[String] =
    terms.filter(!_.negated).flatMap(t => Seq(t.src, t.dst)).distinct

  /** Connectivity-greedy processing order: start from the first term, then
    * repeatedly take the earliest remaining term sharing a variable with the
    * already-bound set. Deterministic (stable within the pattern), so the
    * SQL mirror built from the same order is the identical join chain.
    * Returns terms paired with their original index (used for aliasing).
    */
  private def joinOrder(terms: Seq[EdgeTerm]): Seq[(EdgeTerm, Int)] = {
    val remaining = terms.zipWithIndex.filter(!_._1.negated).toBuffer
    val ordered = Seq.newBuilder[(EdgeTerm, Int)]
    var bound = Set.empty[String]
    while (remaining.nonEmpty) {
      val idx =
        if (bound.isEmpty) 0
        else remaining.indexWhere { case (t, _) => bound(t.src) || bound(t.dst) }
      require(idx >= 0,
        "motif pattern must be connected — an edge term shares no vertex with the rest")
      val t = remaining.remove(idx)
      bound ++= Set(t._1.src, t._1.dst)
      ordered += t
    }
    ordered.result()
  }

  /** The `[lo..hi]` shortest-distance closure of the deduped edge relation
    * `e`: distinct `(src, dst)` pairs whose shortest directed hop distance
    * lies in the window. hi-1 rounds of frontier-join-edges; the anti-join
    * against the seen set keeps each pair at its FIRST (= shortest) level,
    * and the frontier is eagerly checkpointed so round L's plan never
    * re-derives rounds 1..L-1. Early exit when a frontier drains.
    */
  private def distanceWindow(e: DataFrame, lo: Int, hi: Int,
                             seedPred: Option[Column => Column] = None): DataFrame = {
    // seed restriction (the [[find]] `restrict` pushdown): paths START only
    // at sources the caller wants bound, but WALK the full edge relation —
    // the closure rows for restricted sources are exactly the unrestricted
    // closure's rows with that src, so downstream joins see identical
    // bindings. Without this the eager checkpoint below is an optimizer
    // barrier: a selective predicate on the source variable could never
    // push into the closure build and every round would pay the full
    // all-sources frontier (measured 25x waste on g43).
    val base = seedPred.fold(e)(p => e.filter(p(col("src"))))
    var seen = base.select(col("src").as("s"), col("dst").as("d"))
      .withColumn("dist", lit(1)).localCheckpoint(true)
    var frontier = seen.select("s", "d")
    var l = 2
    var drained = frontier.isEmpty
    while (l <= hi && !drained) {
      val next = frontier
        .join(e.select(col("src").as("d"), col("dst").as("d2")), "d")
        .select(col("s"), col("d2").as("d")).distinct()
        .join(seen.select("s", "d"), Seq("s", "d"), "left_anti")
        .withColumn("dist", lit(l))
        .localCheckpoint(true)
      drained = next.isEmpty
      if (!drained) {
        seen = seen.union(next)
        frontier = next.select("s", "d")
      }
      l += 1
    }
    seen.filter(col("dist").between(lo, hi))
      .select(col("s").as("src"), col("d").as("dst"))
  }

  /** Match `pattern` against the directed edge relation `edges` (columns
    * `src`, `dst`; deduped internally). See object doc for semantics and
    * plan shape.
    *
    * `restrict` declares per-variable predicates the MATCH must satisfy:
    * `find(e, p, Map("a" -> (_ % 25 === 0)))` equals
    * `find(e, p).filter(col("a") % 25 === 0)` row for row (the filters are
    * applied to the result inside this method — the equivalence is the
    * contract, property-asserted in MotifsSpec). Declaring them here
    * additionally lets the engine SEED a variable-length term's closure
    * build with only the restricted sources: the closure is eagerly
    * checkpointed (an optimizer barrier), so an outer filter can never
    * reach it through Catalyst pushdown, and on a selective predicate the
    * all-sources closure is almost entirely thrown-away work (guide §1.2
    * "don't compute things you throw away"; measured 25x on g43).
    */
  def find(edges: DataFrame, pattern: String,
           restrict: Map[String, Column => Column] = Map.empty): DataFrame = {
    val terms = parse(pattern)
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
    val vars = terms.flatMap(t => Seq(t.src, t.dst)).toSet
    restrict.keys.foreach(v => require(vars(v),
      s"restrict names variable $v not in pattern (${vars.toSeq.sorted.mkString(", ")})"))
    // one closure per DISTINCT (range, seed) — the unseeded closure stays
    // shared by every term using the range; a seeded build is keyed by the
    // variable it seeds for
    val closures = scala.collection.mutable.Map.empty[(Int, Int, Option[String]), DataFrame]
    def relFor(t: EdgeTerm, seedVar: Option[String]): DataFrame = t.range match {
      case None => e
      case Some((lo, hi)) =>
        closures.getOrElseUpdate((lo, hi, seedVar),
          distanceWindow(e, lo, hi, seedVar.flatMap(restrict.get)))
    }
    var bound = Vector.empty[String]
    var result: DataFrame = null
    joinOrder(terms).foreach { case (t @ EdgeTerm(s, d, _, _), i) =>
      // seed a range term's closure when its src variable is restricted and
      // not yet bound (first binding — the seed then produces exactly the
      // bindings the final filter keeps); already-bound vars are constrained
      // by the join equality, so the shared unseeded closure serves them
      val seedVar = if (t.range.isDefined && !t.negated &&
        !bound.contains(s) && restrict.contains(s)) Some(s) else None
      val ei = relFor(t, seedVar).select(col("src").as(s"__m${i}_s"), col("dst").as(s"__m${i}_d"))
      if (result == null) {
        result =
          if (s == d)
            ei.filter(col(s"__m${i}_s") === col(s"__m${i}_d"))
              .select(col(s"__m${i}_s").as(s))
          else ei.select(col(s"__m${i}_s").as(s), col(s"__m${i}_d").as(d))
        bound = if (s == d) Vector(s) else Vector(s, d)
      } else {
        val eqs =
          (if (bound.contains(s)) Seq(col(s"__m${i}_s") === col(s)) else Nil) ++
            (if (bound.contains(d)) Seq(col(s"__m${i}_d") === col(d)) else Nil) ++
            (if (s == d) Seq(col(s"__m${i}_s") === col(s"__m${i}_d")) else Nil)
        val newVars = Seq(s, d).distinct.filterNot(bound.contains)
        val keep = bound.map(col) ++ newVars.map { v =>
          (if (v == s) col(s"__m${i}_s") else col(s"__m${i}_d")).as(v)
        }
        result = result.join(ei, eqs.reduce(_ && _)).select(keep: _*)
        bound ++= newVars
      }
    }
    // negated terms: both endpoints are bound, so each is a LEFT ANTI
    // join on the full pair — a pure filter that cannot grow the result
    // (against the closure for a negated variable-length term)
    terms.zipWithIndex.filter(_._1.negated).foreach { case (t @ EdgeTerm(s, d, _, _), i) =>
      val ei = relFor(t, None).select(col("src").as(s"__m${i}_s"), col("dst").as(s"__m${i}_d"))
      result = result.join(ei,
        col(s) === col(s"__m${i}_s") && col(d) === col(s"__m${i}_d"), "left_anti")
    }
    // the declared restrictions apply to the RESULT regardless of which
    // (if any) closure builds they seeded — find(e, p, r) must equal
    // find(e, p).filter(r) whatever the join order did
    val out = result.select(outputVars(terms).map(col): _*)
    restrict.foldLeft(out) { case (r, (v, p)) => r.filter(p(col(v))) }
  }

  /** DuckDB mirror of [[find]]: the same deduped edge CTE joined once per
    * edge term in the same connectivity-greedy order with the same
    * equalities, projecting each variable from the term that first bound it.
    * `extraWhere`/`orderBy` let gate queries append canonicalization
    * predicates and a deterministic sort without hand-writing the chain.
    */
  def findSql(edgeSql: String, pattern: String,
              extraWhere: String = "", orderBy: String = ""): String = {
    val terms = parse(pattern)
    val ordered = joinOrder(terms)
    // one shortest-distance-window CTE per distinct range (recursive walk
    // bounded at hi, MIN(dist) = shortest distance — mirrors distanceWindow)
    val ranges = terms.flatMap(_.range).distinct
    def wName(r: (Int, Int)) = s"w${r._1}_${r._2}"
    val closureCtes = ranges.map { case (lo, hi) =>
      s"""r${lo}_$hi AS (SELECT src, dst, 1 AS dist FROM e
         |  UNION SELECT r.src, e.dst, r.dist + 1 FROM r${lo}_$hi r JOIN e ON e.src = r.dst WHERE r.dist < $hi),
         |${wName((lo, hi))} AS (SELECT src, dst FROM r${lo}_$hi GROUP BY src, dst HAVING MIN(dist) BETWEEN $lo AND $hi)""".stripMargin
    }
    def relName(t: EdgeTerm): String = t.range.map(wName).getOrElse("e")
    // variable -> the "t<i>.src"/"t<i>.dst" expression that first binds it
    var binding = Map.empty[String, String]
    val conds = Seq.newBuilder[String]
    ordered.foreach { case (EdgeTerm(s, d, _, _), i) =>
      if (s == d) {
        conds += s"t$i.src = t$i.dst"
        if (!binding.contains(s)) binding += s -> s"t$i.src"
      } else {
        binding.get(s) match {
          case Some(b) => conds += s"t$i.src = $b"
          case None => binding += s -> s"t$i.src"
        }
        binding.get(d) match {
          case Some(b) => conds += s"t$i.dst = $b"
          case None => binding += d -> s"t$i.dst"
        }
      }
    }
    // negated terms mirror the anti joins as NOT EXISTS on the bound pair
    // (against the range's closure CTE for variable-length terms)
    terms.filter(_.negated).foreach { t =>
      conds += s"NOT EXISTS (SELECT 1 FROM ${relName(t)} ne WHERE ne.src = ${binding(t.src)} " +
        s"AND ne.dst = ${binding(t.dst)})"
    }
    val from = ordered.map { case (t, i) => s"${relName(t)} t$i" }.mkString(", ")
    val where = conds.result().mkString(" AND ")
    val sel = outputVars(terms).map(v => s"${binding(v)} AS $v").mkString(", ")
    val withKw = if (ranges.nonEmpty) "WITH RECURSIVE" else "WITH"
    val ctes = (s"e AS (SELECT DISTINCT src, dst FROM ($edgeSql) t)" +: closureCtes)
      .mkString(",\n")
    // extraWhere/orderBy reference the OUTPUT aliases, which SQL scoping
    // keeps out of the same SELECT's WHERE — wrap the chain in a subquery
    // (the optimizer pushes the predicate back down, as Catalyst does)
    val inner =
      s"""$withKw $ctes
         |SELECT $sel FROM $from${if (where.nonEmpty) s" WHERE $where" else ""}""".stripMargin
    if (extraWhere.isEmpty && orderBy.isEmpty) inner
    else
      s"SELECT * FROM (\n$inner\n) m" +
        (if (extraWhere.nonEmpty) s" WHERE $extraWhere" else "") +
        (if (orderBy.nonEmpty) s" ORDER BY $orderBy" else "")
  }
}
