package graft.graph

import org.apache.spark.sql.DataFrame
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
  */
object Motifs {

  private val Term =
    """(!?)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*-\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r

  /** One parsed edge term: direction src→dst, possibly negated. */
  final case class EdgeTerm(src: String, dst: String, negated: Boolean)

  /** Parse a pattern into directed, possibly-negated edge terms. */
  def parse(pattern: String): Seq[EdgeTerm] = {
    val terms = pattern.split(";").map(_.trim).filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "motif pattern needs at least one edge term")
    val parsed = terms.map {
      case Term(neg, a, b) => EdgeTerm(a, b, neg == "!")
      case t => throw new IllegalArgumentException(
        s"bad motif edge term '$t' — expected '(x)-(y)' or '!(x)-(y)'")
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

  /** Match `pattern` against the directed edge relation `edges` (columns
    * `src`, `dst`; deduped internally). See object doc for semantics and
    * plan shape.
    */
  def find(edges: DataFrame, pattern: String): DataFrame = {
    val terms = parse(pattern)
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
    var bound = Vector.empty[String]
    var result: DataFrame = null
    joinOrder(terms).foreach { case (EdgeTerm(s, d, _), i) =>
      val ei = e.select(col("src").as(s"__m${i}_s"), col("dst").as(s"__m${i}_d"))
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
    terms.zipWithIndex.filter(_._1.negated).foreach { case (EdgeTerm(s, d, _), i) =>
      val ei = e.select(col("src").as(s"__m${i}_s"), col("dst").as(s"__m${i}_d"))
      result = result.join(ei,
        col(s) === col(s"__m${i}_s") && col(d) === col(s"__m${i}_d"), "left_anti")
    }
    result.select(outputVars(terms).map(col): _*)
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
    // variable -> the "t<i>.src"/"t<i>.dst" expression that first binds it
    var binding = Map.empty[String, String]
    val conds = Seq.newBuilder[String]
    ordered.foreach { case (EdgeTerm(s, d, _), i) =>
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
    terms.filter(_.negated).foreach { t =>
      conds += s"NOT EXISTS (SELECT 1 FROM e ne WHERE ne.src = ${binding(t.src)} " +
        s"AND ne.dst = ${binding(t.dst)})"
    }
    val from = ordered.map { case (_, i) => s"e t$i" }.mkString(", ")
    val where = conds.result().mkString(" AND ")
    val sel = outputVars(terms).map(v => s"${binding(v)} AS $v").mkString(", ")
    // extraWhere/orderBy reference the OUTPUT aliases, which SQL scoping
    // keeps out of the same SELECT's WHERE — wrap the chain in a subquery
    // (the optimizer pushes the predicate back down, as Catalyst does)
    val inner =
      s"""WITH e AS (SELECT DISTINCT src, dst FROM ($edgeSql) t)
         |SELECT $sel FROM $from${if (where.nonEmpty) s" WHERE $where" else ""}""".stripMargin
    if (extraWhere.isEmpty && orderBy.isEmpty) inner
    else
      s"SELECT * FROM (\n$inner\n) m" +
        (if (extraWhere.nonEmpty) s" WHERE $extraWhere" else "") +
        (if (orderBy.nonEmpty) s" ORDER BY $orderBy" else "")
  }
}
