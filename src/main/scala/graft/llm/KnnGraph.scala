package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed k-NN-graph construction and graph-routed ANN search — the
  * GRAPH-based vector-index family (the HNSW / DiskANN lineage) that
  * complements [[Similarity]]'s cluster-routed IVF family. Two halves:
  *
  *  - [[knnGraph]] — NN-Descent (Dong, Moses & Li, WWW 2011: "Efficient
  *    k-nearest neighbor graph construction for generic similarity
  *    measures"): start from an arbitrary k-regular graph and iterate the
  *    paper's local join — every vertex introduces its neighbors (forward
  *    AND reverse) to each other; each vertex keeps the k best candidates
  *    it has ever seen. Neighbors-of-neighbors converge on true neighbors
  *    because "a neighbor of my neighbor is likely my neighbor" — each
  *    round roughly squares the explored radius, so a handful of rounds
  *    suffice regardless of corpus size.
  *  - [[buildKnnGraphIndex]] / [[knnGraphSearch]] — the committed form plus
  *    best-first routed search (the DiskANN/Vamana query shape, Subramanya
  *    et al., NeurIPS 2019): beam search from a fixed entry point, each hop
  *    reading ONLY the frontier's adjacency rows and the candidates'
  *    vector rows through commit-log file pruning — the graph analogue of
  *    the IVF probe's "touch only the probed lists" IO contract.
  *
  * Deterministic divergences from the published algorithms (both
  * deliberate, so every path is oracle-checkable by a DuckDB mirror rather
  * than rows-only):
  *  - NN-Descent's RANDOM init and sampling (ρ) are replaced by a modular
  *    id-ring init (vertex v starts with edges to ids `(v + 1 .. v + k)
  *    mod (maxId + 1)`) and a deterministic per-pivot cap of `2k` on the
  *    local-join set (best-similarity members first). The ring guarantees
  *    the start graph is connected under the corpus's dense-id contract;
  *    init quality only affects convergence speed, not the fixpoint the
  *    rounds drive toward.
  *  - Rounds are FIXED (no early-termination counter): the update is a
  *    pure function of the previous round's graph, so a fixed round count
  *    makes the whole construction a deterministic dataflow both engines
  *    replay exactly.
  *  - The paper's incremental flags (skip already-joined pairs) are
  *    dropped: candidate pairs are deduplicated globally per round
  *    instead, which keeps the round a pair-DISTINCT + one scoring join
  *    rather than per-vertex mutable state.
  *
  * Float discipline is [[Similarity]]'s: double-precision strict
  * left-to-right dots (the codegen'd [[graft.functions.DotProduct]]),
  * identical on both engines, scores surfaced as `floor(cos · 1e6)`
  * integers, every ordering tie-broken by vertex id.
  *
  * Scale shape (the point of NN-Descent over anything quadratic): a round
  * touches `n · (2k)²` candidate pairs — LINEAR in n for fixed k — via two
  * hash shuffles (pivot grouping, pair distinct) and one id-keyed scoring
  * join; nothing is ever all-pairs and no driver state exceeds the
  * returned graph's own rows. The id-ring init is one modular self-join —
  * no global sort, no single-partition window.
  */
object KnnGraph {

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** `(vec_id, e DOUBLE[], nrm)` — the family's shared normalized view. */
  private def vectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").cast("long").as("vec_id"),
        asDouble(col("embedding")).as("e"))
      .withColumn("nrm", sqrt(dot(col("e"), col("e"))))

  /** cos(src, dst) for each (src, dst) pair via two id-keyed joins against
    * the vector view — pairs are deduplicated BEFORE vectors are attached,
    * so each distinct pair pays exactly one dot product. */
  private def scorePairs(pairs: DataFrame, v: DataFrame): DataFrame =
    pairs
      .join(v.select(col("vec_id").as("src"), col("e").as("se"), col("nrm").as("sn")), "src")
      .join(v.select(col("vec_id").as("dst"), col("e").as("de"), col("nrm").as("dn")), "dst")
      .select(col("src"), col("dst"),
        (dot(col("se"), col("de")) / (col("sn") * col("dn"))).as("cos"))

  /** The raw directed k-NN graph `(src, dst, cos)` after `rounds`
    * NN-Descent local joins over the id-ring start graph. Exposed
    * `private[graft]` so [[buildKnnGraphIndex]] and the spec share the
    * exact edge set the gate ranks. */
  private[graft] def knnGraphEdges(emb: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"knnGraph: k must be >= 1, got $k")
    require(rounds >= 0, s"knnGraph: rounds must be >= 0, got $rounds")
    val v = vectors(emb).localCheckpoint(true)
    // id-ring init: (v + 1 .. v + k) mod (maxId + 1); inner join drops
    // ring slots whose id is absent (sparse-id corpora degrade to a
    // near-ring — documented above). The modulus is a 1-row scalar attach
    // (the repo's crossJoin discipline), NOT a global sort or window.
    val nDf = v.agg((max(col("vec_id")) + 1).as("modn"))
    val ring = v.select(col("vec_id").as("src")).crossJoin(broadcast(nDf))
      .select(col("src"), explode(sequence(lit(1), lit(k))).as("j"), col("modn"))
      .select(col("src"), ((col("src") + col("j")) % col("modn")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .join(v.select(col("vec_id").as("dst")), "dst") // keep existing ids only
      .select("src", "dst")
    var edges = scorePairs(ring, v).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      // the paper's local join: B(p) = forward ∪ reverse neighbors of p,
      // capped at the 2k best (cos desc, id asc) — every pair inside B(p)
      // becomes a candidate edge in both directions
      val b = edges.select(col("src").as("pivot"), col("dst").as("member"), col("cos"))
        .union(edges.select(col("dst").as("pivot"), col("src").as("member"), col("cos")))
        .distinct()
      val wB = Window.partitionBy("pivot").orderBy(col("cos").desc, col("member"))
      val bc = b.withColumn("rn", row_number().over(wB)).filter(col("rn") <= 2 * k)
        .select("pivot", "member")
      val pairs = bc.as("x").join(bc.as("y"),
          col("x.pivot") === col("y.pivot") && col("x.member") < col("y.member"))
        .select(col("x.member").as("src"), col("y.member").as("dst"))
        .distinct()
      val scored = scorePairs(pairs, v)
      val cand = edges
        .union(scored.select(col("src"), col("dst"), col("cos")))
        .union(scored.select(col("dst").as("src"), col("src").as("dst"), col("cos")))
        .distinct() // same pair ⇒ bit-identical cos (commutative dot), so distinct dedups exactly
      val wE = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
      edges = cand.withColumn("rn", row_number().over(wE)).filter(col("rn") <= k)
        .select("src", "dst", "cos")
        .localCheckpoint(true) // plans are trees: without a cut, round r re-derives rounds 1..r-1
    }
    edges
  }

  /** NN-Descent k-NN graph: `(src_id, nbr_id, rank, cos_1e6)` — for every
    * vertex its k approximate nearest neighbors after `rounds` local
    * joins, ranked by (cos desc, id asc). Recall against the exact graph
    * is property-tested in KnnGraphSpec (it rises monotonically with
    * rounds); equality is against the DuckDB replay of the identical
    * dataflow ([[knnGraphSql]]). */
  def knnGraph(emb: DataFrame, k: Int = 6, rounds: Int = 2): DataFrame = {
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    knnGraphEdges(emb, k, rounds)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("src").as("src_id"), col("dst").as("nbr_id"), col("rank"),
        floor(col("cos") * 1e6).cast("long").as("cos_1e6"))
      .orderBy("src_id", "rank")
  }

  /** The construction's CTE chain (shared by the graph mirror and the
    * search mirror): returns `(cteBody, finalEdgesCte)` — `cteBody` starts
    * after `WITH ` and ends with a trailing comma. */
  private def graphCtes(k: Int, rounds: Int): (String, String) = {
    val sb = new StringBuilder
    sb.append(
      s"""v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |cnt AS (SELECT max(vec_id) + 1 AS modn FROM n),
         |ring AS (SELECT DISTINCT a.vec_id AS src, (a.vec_id + u.j) % cnt.modn AS dst
         |         FROM n a, cnt, UNNEST(range(1, ${k + 1})) AS u(j)
         |         WHERE (a.vec_id + u.j) % cnt.modn <> a.vec_id),
         |e0 AS (SELECT r.src, r.dst,
         |              list_dot_product(sa.e, sb.e) / (sa.nrm * sb.nrm) AS cos
         |       FROM ring r JOIN n sa ON sa.vec_id = r.src JOIN n sb ON sb.vec_id = r.dst),
         |""".stripMargin)
    var prev = "e0"
    for (r <- 1 to rounds) {
      sb.append(
        s"""b$r AS (SELECT DISTINCT pvt, mem, cos FROM (
           |  SELECT src AS pvt, dst AS mem, cos FROM $prev
           |  UNION ALL SELECT dst, src, cos FROM $prev)),
           |bc$r AS (SELECT pvt, mem FROM (
           |  SELECT pvt, mem,
           |         row_number() OVER (PARTITION BY pvt ORDER BY cos DESC, mem) AS rn
           |  FROM b$r) WHERE rn <= ${2 * k}),
           |pr$r AS (SELECT DISTINCT x.mem AS src, y.mem AS dst
           |  FROM bc$r x JOIN bc$r y ON x.pvt = y.pvt AND x.mem < y.mem),
           |s$r AS (SELECT pr.src, pr.dst,
           |               list_dot_product(va.e, vb.e) / (va.nrm * vb.nrm) AS cos
           |  FROM pr$r pr JOIN n va ON va.vec_id = pr.src JOIN n vb ON vb.vec_id = pr.dst),
           |e$r AS (SELECT src, dst, cos FROM (
           |  SELECT src, dst, cos,
           |         row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
           |  FROM (SELECT DISTINCT src, dst, cos FROM (
           |    SELECT src, dst, cos FROM $prev
           |    UNION ALL SELECT src, dst, cos FROM s$r
           |    UNION ALL SELECT dst, src, cos FROM s$r)))
           |  WHERE rn <= $k),
           |""".stripMargin)
      prev = s"e$r"
    }
    (sb.toString, prev)
  }

  /** DuckDB mirror of [[knnGraph]]: the identical dataflow — same id-ring
    * init, same 2k-capped local joins, same global pair dedup, same
    * (cos desc, id) keep rule — replayed as `rounds` generated CTE blocks.
    * Deterministic bit-equality, not a recall bound: dots are the same
    * strict left-to-right binary64 folds on both engines. */
  def knnGraphSql(k: Int = 6, rounds: Int = 2): String = {
    val (ctes, fin) = graphCtes(k, rounds)
    s"""WITH $ctes
       |r AS (SELECT src, dst, cos,
       |             row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rank
       |      FROM $fin)
       |SELECT src AS src_id, dst AS nbr_id, rank::BIGINT AS rank,
       |       floor(cos * 1e6)::BIGINT AS cos_1e6
       |FROM r ORDER BY src_id, rank""".stripMargin
  }

  // ----- persisted graph index + routed search ---------------------------

  /** Builds the PERSISTED graph index under `indexRoot` as three commit-log
    * tables — the build-once / search-many shape of the family's other
    * indexes ([[Similarity.buildIvfIndex]] discipline):
    *  - `vectors/` — the normalized vector rows, RANGE-clustered by vec_id
    *    (the search's candidate-fetch side: per-file id stats prune every
    *    file outside the hop's candidate set);
    *  - `graph/`   — the NN-Descent edges, RANGE-clustered by src (the
    *    adjacency-fetch side: a hop reads only frontier vertices' files);
    *  - `entries/` — the `numEntries` search entry vertices: the smallest
    *    existing id at or above each of `numEntries` evenly-spaced points
    *    of the id span. A converged k-NN graph keeps only SHORT edges, so
    *    single-entry greedy search gets trapped in the entry's own
    *    neighborhood when the corpus has well-separated modes; seeding
    *    every query's beam from spread-out restarts is NSW's published
    *    multi-search answer (Malkov et al., IS 2014 — m independent
    *    entry points per query), made deterministic here.
    * Returns the committed graph version. Refresh = rebuild (NN-Descent's
    * fixpoint is not delta-decomposable — appended vectors change existing
    * vertices' true neighbor lists); old versions stay readable via asOf.
    */
  def buildKnnGraphIndex(emb: DataFrame, indexRoot: String,
                         k: Int = 6, rounds: Int = 2,
                         numEntries: Int = 16): Long = {
    require(numEntries >= 1, s"buildKnnGraphIndex: numEntries must be >= 1, got $numEntries")
    val spark = emb.sparkSession
    val v = vectors(emb).localCheckpoint(true)
    new graft.operators.CommitTable(spark, s"$indexRoot/vectors", "vec_id")
      .overwrite(v.repartitionByRange(col("vec_id")))
    // evenly-spaced id-span points, snapped UP to the nearest existing id
    // (sparse-id-safe); a numEntries-candidate broadcast range join, never
    // a global sort
    val span = v.agg(min(col("vec_id")).as("lo"), (max(col("vec_id")) + 1).as("hi"))
    val cands = span.select(explode(sequence(lit(0), lit(numEntries - 1))).as("i"),
        col("lo"), col("hi"))
      .select((col("lo") + (col("i") * (col("hi") - col("lo"))) / numEntries)
        .cast("long").as("c"))
    val entries = v.select(col("vec_id")).join(broadcast(cands), col("vec_id") >= col("c"))
      .groupBy("c").agg(min(col("vec_id")).as("eid"))
      .select("eid").distinct()
    new graft.operators.CommitTable(spark, s"$indexRoot/entries", "eid")
      .overwrite(entries.coalesce(1))
    val edges = knnGraphEdges(emb, k, rounds)
    new graft.operators.CommitTable(spark, s"$indexRoot/graph", "src")
      .overwrite(edges.repartitionByRange(col("src"), col("dst")))
  }

  /** Top-`beam` rows per query by (cos desc, id asc). */
  private def topPerQuery(scored: DataFrame, limit: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= limit)
      .select("query_id", "vec_id", "cos")
  }

  /** Best-first routed search over a committed graph index (the
    * DiskANN/Vamana query loop, batched over all queries at once): seed
    * every query's beam with the committed entry set (NSW multi-search
    * restarts — see [[buildKnnGraphIndex]]), then for `hops` rounds
    * expand the whole beam — fetch the frontier's adjacency rows, score
    * the discovered vertices against their queries, keep each query's
    * `beam` best visited so far — and finally return each query's top-k
    * visited (self excluded). `(query_id, neighbor_id, rank, cos_1e6)`.
    *
    * Divergence from the sequential published loop (deliberate, for the
    * dataflow form): DiskANN expands ONE unvisited candidate per
    * iteration; this expands the ENTIRE current beam each hop and does not
    * track per-vertex visited flags — re-expansions cost only rows that
    * the pair-distinct collapses. Queries that are corpus members route
    * through their own vertex (cos = 1 keeps it at the beam head, so hop 1
    * already surfaces its committed neighbor list).
    *
    * IO contract (the index's point): each hop collects the frontier's
    * ≤ numQueries·beam ids (driver-bounded by contract), then reads the
    * adjacency AND candidate-vector rows through
    * [[graft.operators.CommitTable.prunedReadIn]] — files whose committed
    * id window misses the wanted set are never opened (spec-asserted on
    * multi-file layouts). Nothing else touches the corpus: a search is
    * `hops` rounds of file-pruned point reads, exactly DiskANN's
    * "O(beam · hops) disk reads per query" shape, batched.
    */
  def knnGraphSearch(spark: SparkSession, indexRoot: String,
                     numQueries: Int = 20, k: Int = 5,
                     beam: Int = 8, hops: Int = 3): DataFrame = {
    require(beam >= k, s"knnGraphSearch: beam $beam must be >= k $k")
    val vecs = new graft.operators.CommitTable(spark, s"$indexRoot/vectors", "vec_id")
    val graph = new graft.operators.CommitTable(spark, s"$indexRoot/graph", "src")
    val entryIds = new graft.operators.CommitTable(spark, s"$indexRoot/entries", "eid")
      .read().collect().map(_.getLong(0)).toSeq.sorted // ≤ numEntries by contract
    // query vectors: a file-pruned point read of the contract ids
    val queries = vecs.prunedReadIn(0L until numQueries.toLong)
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
      .localCheckpoint(true)
    def scoreIds(cand: DataFrame, ids: Seq[Long]): DataFrame =
      cand.join(vecs.prunedReadIn(ids).filter(col("vec_id").isin(ids: _*))
            .select("vec_id", "e", "nrm"), "vec_id")
        .join(broadcast(queries), "query_id")
        .select(col("query_id"), col("vec_id"),
          (dot(col("e"), col("qe")) / (col("nrm") * col("qn"))).as("cos"))
    val entryCand = queries.select(col("query_id"))
      .withColumn("vec_id", explode(lit(entryIds.toArray)))
    var visited = scoreIds(entryCand, entryIds).localCheckpoint(true)
    var beamDf = topPerQuery(visited, beam)
    for (_ <- 1 to hops) {
      val frontier = beamDf.select("vec_id").distinct()
        .collect().map(_.getLong(0)).toSeq.sorted // ≤ numQueries·beam by contract
      val nbrs = graph.prunedReadIn(frontier).filter(col("src").isin(frontier: _*))
        .select(col("src"), col("dst"))
      val cand = beamDf.select(col("query_id"), col("vec_id").as("src"))
        .join(nbrs, "src")
        .select(col("query_id"), col("dst").as("vec_id")).distinct()
      val candIds = cand.select("vec_id").distinct()
        .collect().map(_.getLong(0)).toSeq.sorted // ≤ numQueries·beam·k by contract
      visited = visited.union(scoreIds(cand, candIds)).distinct()
        .localCheckpoint(true)
      beamDf = topPerQuery(visited, beam)
    }
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    visited.filter(col("vec_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        floor(col("cos") * 1e6).cast("long").as("cos_1e6"))
      .orderBy("query_id", "rank")
  }

  /** DuckDB mirror of [[buildKnnGraphIndex]] + [[knnGraphSearch]]: the
    * graph CTEs at the BUILD configuration (`buildK`, `rounds`), then the
    * search loop replayed as `hops` generated beam-update blocks — same
    * entry vertex (min id), same whole-beam expansion, same
    * (cos desc, id) beam keep, same final self-excluded top-k. The commit
    * round trip is content-preserving (parquet round-trips binary64), so
    * searching the committed index equals searching the freshly built
    * graph. */
  def knnGraphSearchSql(numQueries: Int = 20, k: Int = 5,
                        beam: Int = 8, hops: Int = 3,
                        buildK: Int = 6, rounds: Int = 2,
                        numEntries: Int = 16): String = {
    val (ctes, fin) = graphCtes(buildK, rounds)
    val sb = new StringBuilder
    sb.append(ctes)
    sb.append(
      s"""span AS (SELECT min(vec_id) AS lo, max(vec_id) + 1 AS hi FROM n),
         |ecand AS (SELECT span.lo + (u.i * (span.hi - span.lo)) // $numEntries AS c
         |          FROM span, UNNEST(range(0, $numEntries)) AS u(i)),
         |entries AS (SELECT DISTINCT eid FROM (
         |  SELECT min(n.vec_id) AS eid FROM ecand JOIN n ON n.vec_id >= ecand.c GROUP BY ecand.c)),
         |q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM n WHERE vec_id < $numQueries),
         |vis0 AS (SELECT q.query_id, i.vec_id,
         |                list_dot_product(i.e, q.qe) / (i.nrm * q.qn) AS cos
         |         FROM q CROSS JOIN entries JOIN n i ON i.vec_id = entries.eid),
         |beam0 AS (SELECT query_id, vec_id, cos FROM (
         |  SELECT query_id, vec_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
         |  FROM vis0) WHERE rn <= $beam),
         |""".stripMargin)
    for (h <- 1 to hops) {
      sb.append(
        s"""cand$h AS (SELECT DISTINCT b.query_id, g.dst AS vec_id
           |  FROM beam${h - 1} b JOIN $fin g ON g.src = b.vec_id),
           |sc$h AS (SELECT c.query_id, c.vec_id,
           |                list_dot_product(i.e, q.qe) / (i.nrm * q.qn) AS cos
           |  FROM cand$h c JOIN n i ON i.vec_id = c.vec_id JOIN q ON q.query_id = c.query_id),
           |vis$h AS (SELECT DISTINCT query_id, vec_id, cos FROM (
           |  SELECT query_id, vec_id, cos FROM vis${h - 1}
           |  UNION ALL SELECT query_id, vec_id, cos FROM sc$h)),
           |beam$h AS (SELECT query_id, vec_id, cos FROM (
           |  SELECT query_id, vec_id, cos,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
           |  FROM vis$h) WHERE rn <= $beam),
           |""".stripMargin)
    }
    s"""WITH ${sb.toString}
       |fin AS (SELECT query_id, vec_id, cos,
       |               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |        FROM vis$hops WHERE vec_id <> query_id)
       |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
       |       floor(cos * 1e6)::BIGINT AS cos_1e6
       |FROM fin WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }
}
