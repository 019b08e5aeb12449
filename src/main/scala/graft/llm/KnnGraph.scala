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
  private def graphCtes(k: Int, rounds: Int,
                        baseFilter: String = "TRUE"): (String, String) = {
    val sb = new StringBuilder
    sb.append(
      s"""v AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings WHERE $baseFilter),
         |n AS MATERIALIZED (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |cnt AS MATERIALIZED (SELECT max(vec_id) + 1 AS modn FROM n),
         |ring AS MATERIALIZED (SELECT DISTINCT a.vec_id AS src, (a.vec_id + u.j) % cnt.modn AS dst
         |         FROM n a, cnt, UNNEST(range(1, ${k + 1})) AS u(j)
         |         WHERE (a.vec_id + u.j) % cnt.modn <> a.vec_id),
         |e0 AS MATERIALIZED (SELECT r.src, r.dst,
         |              list_dot_product(sa.e, sb.e) / (sa.nrm * sb.nrm) AS cos
         |       FROM ring r JOIN n sa ON sa.vec_id = r.src JOIN n sb ON sb.vec_id = r.dst),
         |""".stripMargin)
    var prev = "e0"
    for (r <- 1 to rounds) {
      sb.append(
        s"""b$r AS MATERIALIZED (SELECT DISTINCT pvt, mem, cos FROM (
           |  SELECT src AS pvt, dst AS mem, cos FROM $prev
           |  UNION ALL SELECT dst, src, cos FROM $prev)),
           |bc$r AS MATERIALIZED (SELECT pvt, mem FROM (
           |  SELECT pvt, mem,
           |         row_number() OVER (PARTITION BY pvt ORDER BY cos DESC, mem) AS rn
           |  FROM b$r) WHERE rn <= ${2 * k}),
           |pr$r AS MATERIALIZED (SELECT DISTINCT x.mem AS src, y.mem AS dst
           |  FROM bc$r x JOIN bc$r y ON x.pvt = y.pvt AND x.mem < y.mem),
           |s$r AS MATERIALIZED (SELECT pr.src, pr.dst,
           |               list_dot_product(va.e, vb.e) / (va.nrm * vb.nrm) AS cos
           |  FROM pr$r pr JOIN n va ON va.vec_id = pr.src JOIN n vb ON vb.vec_id = pr.dst),
           |e$r AS MATERIALIZED (SELECT src, dst, cos FROM (
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
       |r AS MATERIALIZED (SELECT src, dst, cos,
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
    val gv = new graft.operators.CommitTable(spark, s"$indexRoot/graph", "src")
      .overwrite(edges.repartitionByRange(col("src"), col("dst")))
    // pin the three member heads as ONE atomic index version (the
    // catalog-commit shape) — [[knnGraphSearchAt]] resolves through it
    graft.operators.IndexManifest.commit(spark, indexRoot,
      Seq("vectors", "graph", "entries"))
    gv
  }

  /** Top-`beam` rows per query by (cos desc, id asc). */
  /** Exact id-membership cut as a BROADCAST SEMI-JOIN against the (by
    * contract driver-bounded) id list — never `isin(ids: _*)`: a literal
    * in-list embeds every id into the plan, so a large query batch's
    * frontier (queries·beam ids) inflates analysis/codegen per hop,
    * while the semi-join's plan is constant-size and its build side is
    * the same driver list shipped once (r17 verdict Next #4). The file
    * cut stays [[graft.operators.CommitTable.prunedReadIn]]'s job; this
    * is the row-exact residual. */
  private def idSemi(spark: SparkSession, df: DataFrame, idCol: String,
                     ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    df.join(broadcast(ids.toDF(idCol)), Seq(idCol), "left_semi")
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
                     beam: Int = 8, hops: Int = 3,
                     predicate: Option[Column] = None): DataFrame = {
    require(beam >= k, s"knnGraphSearch: beam $beam must be >= k $k")
    val vecs = new graft.operators.CommitTable(spark, s"$indexRoot/vectors", "vec_id")
    // query vectors: a file-pruned point read of the contract ids; a
    // tombstoned id cannot query (it has left the index)
    val queries = Tombstones.exclude(
        vecs.prunedReadIn(0L until numQueries.toLong)
          .filter(col("vec_id") < numQueries),
        indexRoot, "vec_id", "vec_id")
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
      .localCheckpoint(true)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    // tombstone-aware under the FreshDiskANN DeleteList contract: deleted
    // vertices still NAVIGATE (the walk scores them into the beam and uses
    // their adjacency — severing them before [[consolidateKnnGraphIndex]]
    // patches routes would punch reachability holes) but can never enter
    // RESULTS; consolidation later removes them physically
    // `predicate` is the graph family's filtered-ANN surface (s23's
    // IDSelector role): navigation stays UNFILTERED — the walk scores and
    // routes through non-matching vertices, the ACORN post-filtering
    // shape (Patel et al. 2024) — and the predicate gates RESULTS only,
    // over the visited rows' (vec_id) column (attribute predicates join
    // their id set first, the ivfTopKIndexed discipline). Under a highly
    // selective predicate recall needs a wider beam — the walk must visit
    // enough matching vertices to fill k — which the spec demonstrates;
    // ACORN-γ's expanded neighbor lists are the published scale-up when
    // beam widening stops paying.
    val visited = Tombstones.exclude(
      routedVisited(spark, indexRoot, queries, beam, hops),
      indexRoot, "vec_id", "vec_id")
    predicate.fold(visited)(visited.filter)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        floor(col("cos") * 1e6).cast("long").as("cos_1e6"))
      .orderBy("query_id", "rank")
  }

  /** The graph index's EXTERNAL-queries serving entry
    * ([[Similarity.ivfSearchFor]]'s role): routed search for arbitrary
    * query vectors (`(vec_id, embedding)` rows that need not be corpus
    * members). Same walk, same IO contract, same tombstone semantics —
    * a corpus-member query frame reproduces [[knnGraphSearch]]
    * bit-for-bit (spec-asserted). Id contract: a query id EQUAL to a
    * corpus vec_id is treated as that member (the probe self-excludes by
    * id equality, so that corpus vector leaves the query's top-k) —
    * callers wanting pure-external semantics must use ids disjoint from
    * the committed id space, e.g. negative ids (r13 advice: id collisions
    * are indistinguishable from membership without a separate key space). */
  def knnGraphSearchFor(spark: SparkSession, indexRoot: String,
                        queryVecs: DataFrame, k: Int = 5,
                        beam: Int = 8, hops: Int = 3): DataFrame = {
    require(beam >= k, s"knnGraphSearchFor: beam $beam must be >= k $k")
    val queries = vectors(queryVecs)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
      .localCheckpoint(true)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    Tombstones.exclude(routedVisited(spark, indexRoot, queries, beam, hops),
        indexRoot, "vec_id", "vec_id")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        floor(col("cos") * 1e6).cast("long").as("cos_1e6"))
      .orderBy("query_id", "rank")
  }

  /** [[knnGraphSearch]] AT a committed INDEX VERSION — the whole-index
    * time travel the per-table asOf cannot give: `indexVersion` resolves
    * through [[graft.operators.IndexManifest]] to one CONSISTENT pinned
    * set of member-table versions (vectors/graph/entries as they stood
    * together), so a query against "yesterday's index" never mixes
    * yesterday's graph with today's vectors. Same walk, same IO contract
    * (the versioned point reads prune files off the pinned commit's
    * stats). Tombstones are a head-state overlay by design — they apply
    * to live serving, not to historical replay — so this path reads the
    * pinned tables as committed.
    */
  def knnGraphSearchAt(spark: SparkSession, indexRoot: String, indexVersion: Long,
                       numQueries: Int = 20, k: Int = 5,
                       beam: Int = 8, hops: Int = 3): DataFrame = {
    require(beam >= k, s"knnGraphSearchAt: beam $beam must be >= k $k")
    val at = graft.operators.IndexManifest.resolve(spark, indexRoot, Some(indexVersion))
    val vecs = new graft.operators.CommitTable(spark, s"$indexRoot/vectors", "vec_id")
    val queries = vecs.prunedReadIn(0L until numQueries.toLong, at.get("vectors"))
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
      .localCheckpoint(true)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    routedVisited(spark, indexRoot, queries, beam, hops, at)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        floor(col("cos") * 1e6).cast("long").as("cos_1e6"))
      .orderBy("query_id", "rank")
  }

  /** The shared beam loop: all `(query_id, vec_id, cos)` rows VISITED by
    * the multi-entry routed walk for an arbitrary materialized query frame
    * `(query_id, qe, qn)` — [[knnGraphSearch]] ranks these into results;
    * [[appendKnnGraphIndex]] turns them into new adjacency.
    *
    * The walk's working state lives on the DRIVER (r19): it is bounded by
    * the search contract anyway — the loop ALWAYS driver-collected the
    * frontier and candidate ids per hop (≤ queries·beam and
    * ≤ queries·beam·degree) — so holding the full visited set
    * (≤ queries·(entries + hops·beam·degree) small tuples) costs the same
    * order of driver memory while cutting each hop from three cluster
    * jobs (frontier collect, candidate collect, union-distinct
    * checkpoint) to the TWO file-pruned point reads the IO contract is
    * about: the frontier's adjacency rows and the candidates' scored
    * vector rows (measured: the per-hop checkpoint/window jobs were pure
    * fixed cost on contract-sized frames — guide §1.2 per-task work vs
    * §2.4 job-count; the beam ranking is a few-thousand-tuple sort).
    * Batches past the contract's driver bound chunk at the caller
    * ([[appendKnnGraphIndex]] note). Cosines are still computed by the
    * same codegen'd column expressions — only WHERE rows rest between
    * hops changed, so results are bit-identical (suite-asserted against
    * the brute-force and mirror oracles).
    */
  private def routedVisited(spark: SparkSession, indexRoot: String,
                            queries: DataFrame, beam: Int, hops: Int,
                            at: Map[String, Long] = Map.empty): DataFrame = {
    import spark.implicits._
    val vecs = new graft.operators.CommitTable(spark, s"$indexRoot/vectors", "vec_id")
    val graph = new graft.operators.CommitTable(spark, s"$indexRoot/graph", "src")
    val entT = new graft.operators.CommitTable(spark, s"$indexRoot/entries", "eid")
    val entryIds = at.get("entries").map(entT.asOf).getOrElse(entT.read())
      .collect().map(_.getLong(0)).toSeq.sorted // ≤ numEntries by contract
    def scoreIds(cand: DataFrame, ids: Seq[Long]): Seq[(Long, Long, Double)] =
      cand.join(idSemi(spark, vecs.prunedReadIn(ids, at.get("vectors")), "vec_id", ids)
            .select("vec_id", "e", "nrm"), "vec_id")
        .join(broadcast(queries), "query_id")
        .select(col("query_id"), col("vec_id"),
          (dot(col("e"), col("qe")) / (col("nrm") * col("qn"))).as("cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val entryCand = queries.select(col("query_id"))
      .withColumn("vec_id", explode(lit(entryIds.toArray)))
    // dedup on (query, vec, cos) tuples: binary-identical semantics to the
    // DataFrame distinct it replaces (same pair ⇒ bit-identical cos)
    var visited: Seq[(Long, Long, Double)] = scoreIds(entryCand, entryIds).distinct
    // (cos desc, vec_id asc) top-`beam` per query — row_number semantics;
    // java.lang.Double.compare ordering, matching Spark's double sort
    def beamRows(vis: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] =
      vis.groupBy(_._1).valuesIterator.flatMap(
        _.sortBy(t => (-t._3, t._2)).take(beam)).toSeq
    for (_ <- 1 to hops) {
      val bm = beamRows(visited)
      val frontier = bm.map(_._2).distinct.sorted
      val nbrs = idSemi(spark, graph.prunedReadIn(frontier, at.get("graph")),
          "src", frontier)
        .select(col("src"), col("dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val bySrc = nbrs.groupBy(_._1)
      val cand = bm.flatMap { case (q, v, _) =>
        bySrc.getOrElse(v, Array.empty[(Long, Long)]).map(e => (q, e._2)) }.distinct
      val candIds = cand.map(_._2).distinct.sorted
      val scored = scoreIds(cand.toDF("query_id", "vec_id"), candIds)
      visited = (visited ++ scored).distinct
    }
    visited.toDF("query_id", "vec_id", "cos")
  }

  /** Incrementally extends a committed graph index with NEW vectors — the
    * search-then-link insert of a streaming graph index (Singh et al.
    * 2021, "FreshDiskANN": an inserted point is connected to the
    * neighbors a routed search finds for it, and those neighbors gain
    * reverse edges to the new point so it is REACHABLE by later walks).
    * Caller contract: new ids are disjoint from every committed id (the
    * [[Similarity.appendIvfIndex]] discipline). Per batch:
    *  1. each new vector runs the standard multi-entry routed search
    *     against the COMMITTED graph (`linkK` results kept);
    *  2. forward edges (new → found) AND reverse edges (found → new) land
    *     as ONE atomic append on the graph table — reverse edges are what
    *     make the new points discoverable without a rebuild;
    *  3. the new vector rows land as one atomic append on the vectors
    *     table. The entries table is untouched (the entry set stays a
    *     valid spread of the id span; a drifted span is a rebuild signal).
    * Returns the committed graph version.
    *
    * Deliberate divergences, documented: touched existing vertices' lists
    * GROW past k (FreshDiskANN re-prunes them; here the periodic rebuild
    * re-normalizes — the routed walk only reads more candidate rows in the
    * meantime), and intra-batch edges between two NEW points appear only
    * at the next rebuild (a daily shard against a large corpus rarely
    * self-neighbors; the spec pins the semantics either way).
    */
  // NOTE (driver bound): the link search holds its visited set on the
  // driver like every walk ([[routedVisited]]); a batch past the search
  // contract's driver bound (≫ millions of new vectors at once) should be
  // chunked by the caller — the streaming sources already deliver bounded
  // batches (LandingZoneStream admission control).
  def appendKnnGraphIndex(embNew: DataFrame, indexRoot: String,
                          linkK: Int = 6, beam: Int = 8, hops: Int = 3): Long = {
    val spark = embNew.sparkSession
    val vNew = vectors(embNew).localCheckpoint(true)
    val newQueries = vNew
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
      .localCheckpoint(true)
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    // deleted vertices may still navigate the link search (the search
    // contract) but a NEW point never links TO one — FreshDiskANN's insert
    // filters its candidate list against the DeleteList
    val linked = Tombstones.exclude(
        routedVisited(spark, indexRoot, newQueries, beam, hops),
        indexRoot, "vec_id", "vec_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= linkK)
      .select(col("query_id"), col("vec_id"), col("cos"))
    val forward = linked.select(col("query_id").as("src"), col("vec_id").as("dst"), col("cos"))
    val reverse = linked.select(col("vec_id").as("src"), col("query_id").as("dst"), col("cos"))
    new graft.operators.CommitTable(spark, s"$indexRoot/vectors", "vec_id")
      .append(vNew.repartitionByRange(col("vec_id")))
    val gv = new graft.operators.CommitTable(spark, s"$indexRoot/graph", "src")
      .append(forward.union(reverse).repartitionByRange(col("src"), col("dst")))
    // one new index version pinning BOTH member appends — a manifest
    // reader never sees the new vectors without their reverse edges
    graft.operators.IndexManifest.commit(spark, indexRoot,
      Seq("vectors", "graph", "entries"))
    gv
  }

  /** Extends a committed graph index ([[buildKnnGraphIndex]]'s layout)
    * with the PQ artifacts the DISKANN QUERY LOOP navigates by — the
    * paper's actual memory/disk split (Subramanya et al., NeurIPS 2019):
    * compressed codes guide the whole walk (they fit in RAM at a scale
    * where raw vectors cannot), and full-precision vectors are touched
    * ONLY for the final re-rank. Two more commit-log tables under the
    * same root: `pqcodebook/` (m × ksub sub-centroids, driver-small) and
    * `codes/` (m one-byte codes per vector, vec_id-range-clustered so the
    * walk's point reads file-prune). Returns the committed codes version.
    */
  def addPqToKnnGraphIndex(emb: DataFrame, indexRoot: String,
                           m: Int = 8, ksub: Int = 16, dim: Int = 64): Long = {
    require(dim % m == 0, s"dim $dim must split into m=$m equal subspaces")
    val spark = emb.sparkSession
    import spark.implicits._
    val dsub = dim / m
    val v = vectors(emb).localCheckpoint(true)
    val cb = Similarity.pqCodebook(v, m, ksub, dsub)
    val cbDf = (for { j <- 0 until m; c <- cb(j).indices }
      yield (j, c, cb(j)(c).toSeq)).toDF("j", "c", "sub")
    new graft.operators.CommitTable(spark, s"$indexRoot/pqcodebook", "j")
      .overwrite(cbDf.coalesce(1))
    val cv = new graft.operators.CommitTable(spark, s"$indexRoot/codes", "vec_id")
      .overwrite(Similarity.pqEncode(v, cb, dsub)
        .repartitionByRange(col("vec_id")))
    graft.operators.IndexManifest.commit(spark, indexRoot,
      Seq("vectors", "graph", "entries", "pqcodebook", "codes"))
    cv
  }

  /** The DiskANN query loop proper, batched: beam search over the
    * committed graph where EVERY navigation step scores candidates by the
    * exact-integer ADC sum over the committed PQ codes — the raw float
    * vectors never feed the walk — and only the final `k·candFactor`
    * ADC-best visited candidates pay an exact cosine re-rank (one
    * file-pruned point read of the vectors table). IO per hop: frontier
    * adjacency + candidate CODE rows (m bytes/vector — the 32× narrower
    * artifact), both through
    * [[graft.operators.CommitTable.prunedReadIn]]; per query the whole
    * search reads O(beam · hops) code rows + O(k · candFactor) vector
    * rows, the paper's SSD-budget shape. ADC sums are longs (the LUT is
    * `floor(dot·1e6)` integers), so navigation is bit-deterministic and
    * the DuckDB mirror replays it exactly; ties break by vec_id. Beams
    * seed from the committed entry set like [[knnGraphSearch]].
    */
  def pqGraphSearch(spark: SparkSession, indexRoot: String,
                    numQueries: Int = 20, k: Int = 5,
                    beam: Int = 8, hops: Int = 3, candFactor: Int = 3,
                    dim: Int = 64): DataFrame = {
    require(beam >= k, s"pqGraphSearch: beam $beam must be >= k $k")
    val vecs = new graft.operators.CommitTable(spark, s"$indexRoot/vectors", "vec_id")
    val codesT = new graft.operators.CommitTable(spark, s"$indexRoot/codes", "vec_id")
    val graph = new graft.operators.CommitTable(spark, s"$indexRoot/graph", "src")
    val cb = Similarity.readPqCodebook(spark, s"$indexRoot/pqcodebook")
    val m = cb.length
    require(dim % m == 0, s"dim $dim must split into m=$m equal subspaces")
    val dsub = dim / m
    val kEff = cb(0).length
    val entryIds = new graft.operators.CommitTable(spark, s"$indexRoot/entries", "eid")
      .read().collect().map(_.getLong(0)).toSeq.sorted // ≤ numEntries by contract
    val lutCol = array((0 until m).map { j =>
      val cmat = typedLit(cb(j).map(_.toSeq).toSeq)
      array((0 until kEff).map(c =>
        floor(dot(Similarity.pqSubv(col("qe"), j, dsub), element_at(cmat, c + 1)) * 1e6)
          .cast("long")): _*)
    }: _*)
    // same DeleteList semantics as [[knnGraphSearch]] (r13 advice): a
    // tombstoned id cannot QUERY (it has left the index) ...
    val queries = Tombstones.exclude(
        vecs.prunedReadIn(0L until numQueries.toLong)
          .filter(col("vec_id") < numQueries),
        indexRoot, "vec_id", "vec_id")
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
      .withColumn("lut", lutCol)
      .localCheckpoint(true)
    val adcCol = (0 until m).map(j =>
      element_at(element_at(col("lut"), j + 1), element_at(col("codes"), j + 1) + 1))
      .reduce(_ + _)
    // driver-held walk state, the [[routedVisited]] discipline (r19): the
    // ADC walk's frames are bounded by the same search contract, each hop
    // is exactly the two file-pruned point reads (frontier adjacency +
    // candidate CODE rows), and navigation stays the same exact-integer
    // ADC sums — pure longs, so the local dedup/ranking is trivially
    // bit-identical to the DataFrame distinct/window it replaces
    import spark.implicits._
    def scoreIdsAdc(cand: DataFrame, ids: Seq[Long]): Seq[(Long, Long, Long)] =
      cand.join(idSemi(spark, codesT.prunedReadIn(ids), "vec_id", ids)
            .select("vec_id", "codes"), "vec_id")
        .join(broadcast(queries.select("query_id", "lut")), "query_id")
        .select(col("query_id"), col("vec_id"), adcCol.as("adc"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def beamRowsAdc(vis: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
      vis.groupBy(_._1).valuesIterator.flatMap(
        _.sortBy(t => (-t._3, t._2)).take(beam)).toSeq
    val entryCand = queries.select(col("query_id"))
      .withColumn("vec_id", explode(lit(entryIds.toArray)))
    var visitedL: Seq[(Long, Long, Long)] = scoreIdsAdc(entryCand, entryIds).distinct
    for (_ <- 1 to hops) {
      val bm = beamRowsAdc(visitedL)
      val frontier = bm.map(_._2).distinct.sorted
      val nbrs = idSemi(spark, graph.prunedReadIn(frontier), "src", frontier)
        .select(col("src"), col("dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val bySrc = nbrs.groupBy(_._1)
      val cand = bm.flatMap { case (q, v, _) =>
        bySrc.getOrElse(v, Array.empty[(Long, Long)]).map(e => (q, e._2)) }.distinct
      val candIds = cand.map(_._2).distinct.sorted
      visitedL = (visitedL ++ scoreIdsAdc(cand.toDF("query_id", "vec_id"), candIds)).distinct
    }
    val visited = visitedL.toDF("query_id", "vec_id", "adc")
    // exact re-rank of the ADC-best k·candFactor visited (self excluded) —
    // the ONLY touch of full-precision vectors in the whole query.
    // ... and a tombstoned id keeps NAVIGATING (the ADC walk above routes
    // through its adjacency) but can never enter RESULTS — excluded here
    // before the candidate cut, matching knnGraphSearch's DeleteList gate
    val cw = Window.partitionBy("query_id").orderBy(col("adc").desc, col("vec_id"))
    val cands = Tombstones.exclude(visited, indexRoot, "vec_id", "vec_id")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("crank", row_number().over(cw))
      .filter(col("crank") <= k * candFactor)
      .select("query_id", "vec_id")
    val candIds = cands.select("vec_id").distinct()
      .collect().map(_.getLong(0)).toSeq.sorted // ≤ numQueries·k·candFactor by contract
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    cands.join(idSemi(spark, vecs.prunedReadIn(candIds), "vec_id", candIds)
          .select("vec_id", "e", "nrm"), "vec_id")
      .join(broadcast(queries.select("query_id", "qe", "qn")), "query_id")
      .withColumn("cos", dot(col("e"), col("qe")) / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        floor(col("cos") * 1e6).cast("long").as("cos_1e6"))
      .orderBy("query_id", "rank")
  }

  /** LINK-HEALTH instrument for a committed graph index (s40, r15
    * verdict Next #6): the IVF family has `ivfDriftStats`, but the graph
    * family had nothing telling a caller when accumulated append/delete
    * churn warrants the periodic full rebuild its docs defer to (the
    * 40%-recall-plateau symptom s38 measures). One row of integer-exact
    * aggregates:
    *  - `n_edges`, `n_vertices` — live adjacency size;
    *  - `tomb_out_share_1e6` — share of edges whose SOURCE is tombstoned
    *    (dead vertices still navigating, FreshDiskANN's DeleteList debt);
    *  - `tomb_in_share_1e6` — share of LIVE vertices' out-edges pointing
    *    AT tombstoned vertices (wasted beam slots per hop);
    *  - `stale_vertices_1e6` — share of live vertices with ≥ half their
    *    out-list tombstoned (the vertices whose neighborhoods one-hop
    *    repair will degrade — the rebuild trigger);
    *  - `append_edge_share_1e6` — share of edge ROWS committed by
    *    appends since the last full graph rewrite (build/consolidation),
    *    from LOG METADATA alone: a file's staging version rides in its
    *    `d<version>-` directory name and its rowcount in the log stats,
    *    so this half costs zero data reads. Search-then-link appends
    *    grow out-lists past the build's degree cap and skip the build's
    *    NN-Descent refinement — a high share means walk quality drifts
    *    from the build contract.
    * Cost: ONE pass over the graph table (a src-grouped aggregate that
    * rides the table's own src clustering) + log-sized driver metadata.
    * All shares are floor(x·1e6) integers — deterministic, mirror-able.
    * Monotone under churn by construction (each append/delete only adds
    * to its numerator until consolidation clears both).
    */
  def knnGraphLinkStats(spark: SparkSession, indexRoot: String,
                        adjacency: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val graph = new graft.operators.CommitTable(spark, s"$indexRoot/graph", "src")
    // append share — log metadata only
    val hist = graph.history().select("version", "op").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val metaOps = Set("set-invariants", "delete-dv", "rename-column", "drop-column")
    val lastRebuild = hist.collect {
      case (v, op) if op != "append" && !metaOps(op) => v }.max
    val fileRows = graph.fileStats().select("path", "n").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def stagedVersion(p: String): Long = {
      val dir = p.split('/').takeRight(2).head // d<version>-<nonce>
      dir.substring(1, dir.indexOf('-')).toLong
    }
    val totalRows = fileRows.map(_._2).sum
    val appendRows = fileRows.collect {
      case (p, n) if stagedVersion(p) > lastRebuild => n }.sum
    val appendShare =
      if (totalRows == 0L) 0L else appendRows * 1000000L / totalRows
    // tombstone shares — one src-grouped pass over the adjacency
    val del = Tombstones.read(spark, indexRoot, "vec_id")
      .map(_.select(col("vec_id").as("__t")))
      .getOrElse(Seq.empty[Long].toDF("__t"))
    // monitoring loops probing repeatedly between TOMBSTONE-ONLY
    // mutations may pass a materialized `(src, dst)` frame — deletes
    // commit tombstones and never touch the graph table, so the
    // adjacency is provably identical across such probes and re-scanning
    // it per probe is pure waste (r17 verdict Next #2, the s40 trim).
    // Callers own the staleness contract: pass None after anything that
    // rewrites adjacency (build, append, consolidate, OPTIMIZE).
    val g = adjacency.getOrElse(graph.read().select("src", "dst"))
    val marked = g
      .join(broadcast(del.select(col("__t").as("__ts"))),
        col("src") === col("__ts"), "left")
      .join(broadcast(del.select(col("__t").as("__td"))),
        col("dst") === col("__td"), "left")
      .select(col("src"), col("__ts").isNotNull.as("s_t"),
        col("__td").isNotNull.as("d_t"))
    val perSrc = marked.groupBy("src")
      .agg(first(col("s_t")).as("s_t"), count(lit(1)).as("deg"),
        sum(when(col("d_t"), 1L).otherwise(0L)).as("tomb_out"))
    perSrc.agg(
        sum(col("deg")).as("edges"),
        count(lit(1)).as("verts"),
        sum(when(col("s_t"), col("deg")).otherwise(0L)).as("dead_src_edges"),
        sum(when(!col("s_t"), col("tomb_out")).otherwise(0L)).as("live_tomb_out"),
        sum(when(!col("s_t"), col("deg")).otherwise(0L)).as("live_deg"),
        sum(when(!col("s_t") && col("tomb_out") * 2 >= col("deg"), 1L)
          .otherwise(0L)).as("stale"),
        sum(when(!col("s_t"), 1L).otherwise(0L)).as("live_verts"))
      .select(
        col("edges").as("n_edges"),
        col("verts").as("n_vertices"),
        // integral `div` (Column `/` is double division — inexact past
        // 2^53, and shares must be integer-exact at any scale)
        expr("(dead_src_edges * 1000000) div greatest(edges, 1)")
          .as("tomb_out_share_1e6"),
        expr("(live_tomb_out * 1000000) div greatest(live_deg, 1)")
          .as("tomb_in_share_1e6"),
        expr("(stale * 1000000) div greatest(live_verts, 1)")
          .as("stale_vertices_1e6"),
        lit(appendShare).as("append_edge_share_1e6"))
  }

  /** [[knnGraphLinkStats]] for SEVERAL tombstone states over ONE shared
    * adjacency in a SINGLE aggregation pass — the monitoring-loop fusion
    * (r18 verdict Next #3): a lifecycle instrument probing between
    * tombstone-only mutations re-reads the same adjacency and re-runs the
    * same grouped aggregate once per probe; since tombstone commits are
    * versioned and immutable, the per-state delete lists can be read back
    * AFTER the fact ([[Tombstones.readAt]]) and every state's integer
    * shares fold in one job (guide §2.3/§2.4 — one pass, conditional
    * aggregates per state). Each returned row is bit-identical to
    * [[knnGraphLinkStats]] run against that state (spec-asserted):
    * `(n_edges, n_vertices, tomb_out_share_1e6, tomb_in_share_1e6,
    * stale_vertices_1e6, append_edge_share_1e6)` per delete set, in
    * order. The append share is log metadata of the graph table — the
    * caller's contract is that `adjacency` is current and only
    * tombstone-state differs across `delSets`, so it is computed once.
    */
  private[graft] def knnGraphLinkStatsStates(
      spark: SparkSession, indexRoot: String, adjacency: DataFrame,
      delSets: Seq[DataFrame]): Seq[org.apache.spark.sql.Row] = {
    require(delSets.nonEmpty, "knnGraphLinkStatsStates: need at least one state")
    val graph = new graft.operators.CommitTable(spark, s"$indexRoot/graph", "src")
    val hist = graph.history().select("version", "op").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val metaOps = Set("set-invariants", "delete-dv", "rename-column", "drop-column")
    val lastRebuild = hist.collect {
      case (v, op) if op != "append" && !metaOps(op) => v }.max
    val fileRows = graph.fileStats().select("path", "n").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def stagedVersion(p: String): Long = {
      val dir = p.split('/').takeRight(2).head
      dir.substring(1, dir.indexOf('-')).toLong
    }
    val totalRows = fileRows.map(_._2).sum
    val appendRows = fileRows.collect {
      case (p, n) if stagedVersion(p) > lastRebuild => n }.sum
    val appendShare =
      if (totalRows == 0L) 0L else appendRows * 1000000L / totalRows
    val n = delSets.length
    var marked = adjacency.select(col("src"), col("dst"))
    delSets.zipWithIndex.foreach { case (del, i) =>
      val idc = col(del.columns.head).cast("long")
      marked = marked
        .join(broadcast(del.select(idc.as(s"__ts$i"))),
          col("src") === col(s"__ts$i"), "left")
        .join(broadcast(del.select(idc.as(s"__td$i"))),
          col("dst") === col(s"__td$i"), "left")
    }
    val flagCols = col("src") +: (0 until n).flatMap(i => Seq(
      col(s"__ts$i").isNotNull.as(s"s_t$i"),
      col(s"__td$i").isNotNull.as(s"d_t$i")))
    val perSrcAggs = count(lit(1)).as("deg") +: (0 until n).flatMap(i => Seq(
      first(col(s"s_t$i")).as(s"s_t$i"),
      sum(when(col(s"d_t$i"), 1L).otherwise(0L)).as(s"tomb_out$i")))
    val perSrc = marked.select(flagCols: _*)
      .groupBy("src").agg(perSrcAggs.head, perSrcAggs.tail: _*)
    val finalAggs = Seq(sum(col("deg")).as("edges"), count(lit(1)).as("verts")) ++
      (0 until n).flatMap(i => Seq(
        sum(when(col(s"s_t$i"), col("deg")).otherwise(0L)).as(s"dead$i"),
        sum(when(!col(s"s_t$i"), col(s"tomb_out$i")).otherwise(0L)).as(s"ltout$i"),
        sum(when(!col(s"s_t$i"), col("deg")).otherwise(0L)).as(s"ldeg$i"),
        sum(when(!col(s"s_t$i") && col(s"tomb_out$i") * 2 >= col("deg"), 1L)
          .otherwise(0L)).as(s"stale$i"),
        sum(when(!col(s"s_t$i"), 1L).otherwise(0L)).as(s"lverts$i")))
    val r = perSrc.agg(finalAggs.head, finalAggs.tail: _*).head()
    val edges = r.getLong(r.fieldIndex("edges"))
    val verts = r.getLong(r.fieldIndex("verts"))
    // integral division over non-negative longs — identical to the SQL
    // `div` the single-state form uses
    (0 until n).map { i =>
      def f(nm: String) = r.getLong(r.fieldIndex(s"$nm$i"))
      org.apache.spark.sql.Row(
        edges, verts,
        f("dead") * 1000000L / math.max(edges, 1L),
        f("ltout") * 1000000L / math.max(f("ldeg"), 1L),
        f("stale") * 1000000L / math.max(f("lverts"), 1L),
        appendShare)
    }
  }

  /** Removes vectors from a committed graph index — FreshDiskANN's
    * DeleteList (Singh et al. 2021): one atomic O(deleted) tombstone
    * commit; nothing in the graph or vectors tables is read or rewritten.
    * Deleted vertices leave RESULTS (and new points' link candidates)
    * immediately but keep NAVIGATING — their adjacency still carries walks
    * across the graph — until [[consolidateKnnGraphIndex]] re-routes
    * around them and drops them physically. Severing them eagerly would
    * punch reachability holes in every path that crossed them.
    */
  def deleteFromKnnGraphIndex(ids: DataFrame, indexRoot: String): Long =
    Tombstones.delete(ids, indexRoot, "vec_id")

  /** FreshDiskANN's DELETE CONSOLIDATION, as one deterministic dataflow:
    * for each deleted vertex d, every surviving in-neighbor of d is
    * offered d's surviving out-neighbors as replacement edges (the paper's
    * local repair: routes that crossed d now skip it), deduplicated,
    * capped at `patchK` per source by (cos desc, dst) with cosines
    * recomputed from the surviving vectors; then
    *  - `graph/` rewrites as surviving edges ∪ patch (one range-clustered
    *    overwrite commit — file pruning survives),
    *  - `vectors/` rewrites without the deleted rows,
    *  - `entries/` re-snaps: a deleted entry vertex is replaced by the
    *    smallest surviving id at or above it (the build's snapping rule;
    *    falls back to the smallest surviving id), and
    *  - the delete list clears.
    * Documented divergence (shared with the paper's batch consolidation):
    * the repair is ONE hop — a path through two ADJACENT deleted vertices
    * is not re-stitched; the periodic full rebuild re-normalizes. Returns
    * the new graph version; no-op (current head) when nothing is
    * tombstoned. Requires at least one surviving vector.
    */
  def consolidateKnnGraphIndex(spark: SparkSession, indexRoot: String,
                               patchK: Int = 6): Long = {
    val graph = new graft.operators.CommitTable(spark, s"$indexRoot/graph", "src")
    if (Tombstones.read(spark, indexRoot, "vec_id").forall(_.isEmpty))
      return graph.latestVersion().getOrElse(
        throw new IllegalStateException(s"no committed graph at $indexRoot"))
    val vecs = new graft.operators.CommitTable(spark, s"$indexRoot/vectors", "vec_id")
    val entries = new graft.operators.CommitTable(spark, s"$indexRoot/entries", "eid")
    val del = broadcast(Tombstones.read(spark, indexRoot, "vec_id").get
      .withColumnRenamed("vec_id", "d"))
    val g = graph.read().select("src", "dst", "cos").localCheckpoint(true)
    // one-hop repair pairs: (surviving in-neighbor of d) × (surviving
    // out-neighbor of d) — per-d fan-in × fan-out, bounded by the graph's
    // degree contract (lists are k-capped at build; appends grow them only
    // until the next rebuild)
    val into = Tombstones.exclude(
      g.join(del, g("dst") === col("d")).select(col("src"), col("d")),
      indexRoot, "vec_id", "src")
    val outof = Tombstones.exclude(
      g.join(del, g("src") === col("d")).select(col("d"), col("dst")),
      indexRoot, "vec_id", "dst")
    val kept = Tombstones.exclude(
      Tombstones.exclude(g, indexRoot, "vec_id", "src"),
      indexRoot, "vec_id", "dst").localCheckpoint(true)
    val patchPairs = into.join(outof, "d")
      .select("src", "dst").filter(col("src") =!= col("dst")).distinct()
      .join(kept.select("src", "dst").distinct(), Seq("src", "dst"), "left_anti")
    val vKept = Tombstones.exclude(vecs.read(), indexRoot, "vec_id", "vec_id")
      .select("vec_id", "e", "nrm").localCheckpoint(true)
    // validate the degenerate case BEFORE the first overwrite commit: a
    // fully tombstoned index must fail without mutating any head (r13
    // advice — failing after the graph/vectors overwrites left a broken
    // half-consolidated index with stale entries and uncleared tombstones)
    val minSurvRow = vKept.agg(min(col("vec_id"))).head()
    require(!minSurvRow.isNullAt(0),
      s"consolidateKnnGraphIndex: every vector at $indexRoot is tombstoned — rebuild instead")
    val minSurv = minSurvRow.getLong(0)
    val a = vKept.select(col("vec_id").as("src"), col("e").as("se"), col("nrm").as("sn"))
    val b = vKept.select(col("vec_id").as("dst"), col("e").as("de"), col("nrm").as("dn"))
    val wp = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    val patch = patchPairs.join(a, "src").join(b, "dst")
      .withColumn("cos", dot(col("se"), col("de")) / (col("sn") * col("dn")))
      .withColumn("rn", row_number().over(wp)).filter(col("rn") <= patchK)
      .select("src", "dst", "cos")
    val v = graph.overwrite(kept.select("src", "dst", "cos").unionByName(patch)
      .repartitionByRange(col("src"), col("dst")))
    vecs.overwrite(vKept.repartitionByRange(col("vec_id")))
    // entry re-snap: numEntries-bounded broadcast against the survivors
    val e0 = entries.read().select("eid")
    val snapped = vKept.select(col("vec_id")).join(broadcast(e0), col("vec_id") >= col("eid"))
      .groupBy("eid").agg(min(col("vec_id")).as("s"))
    val newEntries = e0.join(snapped, Seq("eid"), "left")
      .select(coalesce(col("s"), lit(minSurv)).as("eid")).distinct()
    entries.overwrite(newEntries.coalesce(1))
    Tombstones.clear(spark, indexRoot, "vec_id")
    graft.operators.IndexManifest.commit(spark, indexRoot,
      Seq("vectors", "graph", "entries"))
    v
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
                        numEntries: Int = 16,
                        resFilter: String = "TRUE",
                        baseFilter: String = "TRUE"): String = {
    val (ctes, fin) = graphCtes(buildK, rounds, baseFilter)
    val sb = new StringBuilder
    sb.append(ctes)
    sb.append(
      s"""span AS MATERIALIZED (SELECT min(vec_id) AS lo, max(vec_id) + 1 AS hi FROM n),
         |ecand AS MATERIALIZED (SELECT span.lo + (u.i * (span.hi - span.lo)) // $numEntries AS c
         |          FROM span, UNNEST(range(0, $numEntries)) AS u(i)),
         |entries AS MATERIALIZED (SELECT DISTINCT eid FROM (
         |  SELECT min(n.vec_id) AS eid FROM ecand JOIN n ON n.vec_id >= ecand.c GROUP BY ecand.c)),
         |q AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM n WHERE vec_id < $numQueries),
         |vis0 AS MATERIALIZED (SELECT q.query_id, i.vec_id,
         |                list_dot_product(i.e, q.qe) / (i.nrm * q.qn) AS cos
         |         FROM q CROSS JOIN entries JOIN n i ON i.vec_id = entries.eid),
         |beam0 AS MATERIALIZED (SELECT query_id, vec_id, cos FROM (
         |  SELECT query_id, vec_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
         |  FROM vis0) WHERE rn <= $beam),
         |""".stripMargin)
    for (h <- 1 to hops) {
      sb.append(
        s"""cand$h AS MATERIALIZED (SELECT DISTINCT b.query_id, g.dst AS vec_id
           |  FROM beam${h - 1} b JOIN $fin g ON g.src = b.vec_id),
           |sc$h AS MATERIALIZED (SELECT c.query_id, c.vec_id,
           |                list_dot_product(i.e, q.qe) / (i.nrm * q.qn) AS cos
           |  FROM cand$h c JOIN n i ON i.vec_id = c.vec_id JOIN q ON q.query_id = c.query_id),
           |vis$h AS MATERIALIZED (SELECT DISTINCT query_id, vec_id, cos FROM (
           |  SELECT query_id, vec_id, cos FROM vis${h - 1}
           |  UNION ALL SELECT query_id, vec_id, cos FROM sc$h)),
           |beam$h AS MATERIALIZED (SELECT query_id, vec_id, cos FROM (
           |  SELECT query_id, vec_id, cos,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
           |  FROM vis$h) WHERE rn <= $beam),
           |""".stripMargin)
    }
    s"""WITH ${sb.toString}
       |fin AS MATERIALIZED (SELECT query_id, vec_id, cos,
       |               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |        FROM vis$hops WHERE vec_id <> query_id AND ($resFilter))
       |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
       |       floor(cos * 1e6)::BIGINT AS cos_1e6
       |FROM fin WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** A generated beam-loop block over adjacency CTE `graphCte`, scoring
    * against vector CTE `vecCte`, starting from `vis0Cte`; CTE names are
    * prefixed with `tag` so two loops coexist in one statement. Returns
    * the final visited CTE's name. */
  private def beamLoopCtes(sb: StringBuilder, tag: String, graphCte: String,
                           vecCte: String, vis0Cte: String,
                           beam: Int, hops: Int): String = {
    sb.append(
      s"""${tag}beam0 AS MATERIALIZED (SELECT query_id, vec_id, cos FROM (
         |  SELECT query_id, vec_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
         |  FROM $vis0Cte) WHERE rn <= $beam),
         |""".stripMargin)
    for (h <- 1 to hops) {
      sb.append(
        s"""${tag}cand$h AS MATERIALIZED (SELECT DISTINCT b.query_id, g.dst AS vec_id
           |  FROM ${tag}beam${h - 1} b JOIN $graphCte g ON g.src = b.vec_id),
           |${tag}sc$h AS MATERIALIZED (SELECT c.query_id, c.vec_id,
           |                list_dot_product(i.e, q.qe) / (i.nrm * q.qn) AS cos
           |  FROM ${tag}cand$h c JOIN $vecCte i ON i.vec_id = c.vec_id
           |  JOIN ${tag}q q ON q.query_id = c.query_id),
           |${tag}vis$h AS MATERIALIZED (SELECT DISTINCT query_id, vec_id, cos FROM (
           |  SELECT query_id, vec_id, cos FROM ${if (h == 1) vis0Cte else s"${tag}vis${h - 1}"}
           |  UNION ALL SELECT query_id, vec_id, cos FROM ${tag}sc$h)),
           |${tag}beam$h AS MATERIALIZED (SELECT query_id, vec_id, cos FROM (
           |  SELECT query_id, vec_id, cos,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
           |  FROM ${tag}vis$h) WHERE rn <= $beam),
           |""".stripMargin)
    }
    s"${tag}vis$hops"
  }

  /** DuckDB mirror of build-on-subset + [[appendKnnGraphIndex]] per batch
    * + [[knnGraphSearch]] end-to-end: the graph CTEs restricted to the
    * BUILD corpus (every id outside all `batches`), the entry set over
    * that corpus, then one generated beam loop PER BATCH — batch i's
    * search-then-link scores against exactly the vectors committed before
    * it (build ∪ batches 1..i−1, the state the engine's i-th append sees)
    * over the graph extended by every earlier batch's forward+reverse
    * links — and a final query walk over the fully extended graph scoring
    * against ALL vectors. `batches` are `[lo, hi)` id ranges in append
    * order; the default single batch is s26's configuration. */
  def knnGraphAppendSearchSql(batches: Seq[(Long, Long)] = Seq((0L, 100L)),
                              numQueries: Int = 20,
                              k: Int = 5, beam: Int = 8, hops: Int = 3,
                              buildK: Int = 6, rounds: Int = 2,
                              numEntries: Int = 16, linkK: Int = 6): String = {
    require(batches.nonEmpty, "knnGraphAppendSearchSql: need at least one batch")
    val buildFilter = batches
      .map { case (lo, hi) => s"NOT (vec_id >= $lo AND vec_id < $hi)" }
      .mkString(" AND ")
    val (ctes, fin) = graphCtes(buildK, rounds, buildFilter)
    val sb = new StringBuilder
    sb.append(ctes)
    sb.append(
      s"""span AS MATERIALIZED (SELECT min(vec_id) AS lo, max(vec_id) + 1 AS hi FROM n),
         |ecand AS MATERIALIZED (SELECT span.lo + (u.i * (span.hi - span.lo)) // $numEntries AS c
         |          FROM span, UNNEST(range(0, $numEntries)) AS u(i)),
         |entries AS MATERIALIZED (SELECT DISTINCT eid FROM (
         |  SELECT min(n.vec_id) AS eid FROM ecand JOIN n ON n.vec_id >= ecand.c GROUP BY ecand.c)),
         |vall AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |nall AS MATERIALIZED (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM vall),
         |nv0 AS MATERIALIZED (SELECT vec_id, e, nrm FROM n),
         |g0 AS MATERIALIZED (SELECT src, dst, cos FROM $fin),
         |""".stripMargin)
    var graphCte = "g0"
    var vecCte = "nv0"
    batches.zipWithIndex.foreach { case ((lo, hi), bi) =>
      val i = bi + 1
      sb.append(
        s"""a${i}q AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM nall
           |  WHERE vec_id >= $lo AND vec_id < $hi),
           |a${i}vis0 AS MATERIALIZED (SELECT q.query_id, i.vec_id,
           |                 list_dot_product(i.e, q.qe) / (i.nrm * q.qn) AS cos
           |          FROM a${i}q q CROSS JOIN entries JOIN $vecCte i ON i.vec_id = entries.eid),
           |""".stripMargin)
      val aFinal = beamLoopCtes(sb, s"a$i", graphCte, vecCte, s"a${i}vis0", beam, hops)
      sb.append(
        s"""a${i}link AS MATERIALIZED (SELECT query_id, vec_id, cos FROM (
           |  SELECT query_id, vec_id, cos,
           |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rn
           |  FROM $aFinal) WHERE rn <= $linkK),
           |g$i AS MATERIALIZED (SELECT src, dst, cos FROM $graphCte
           |          UNION ALL SELECT query_id, vec_id, cos FROM a${i}link
           |          UNION ALL SELECT vec_id, query_id, cos FROM a${i}link),
           |nv$i AS MATERIALIZED (SELECT vec_id, e, nrm FROM $vecCte
           |          UNION ALL SELECT vec_id, e, nrm FROM nall
           |          WHERE vec_id >= $lo AND vec_id < $hi),
           |""".stripMargin)
      graphCte = s"g$i"
      vecCte = s"nv$i"
    }
    sb.append(
      s"""fq AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM nall WHERE vec_id < $numQueries),
         |fvis0 AS MATERIALIZED (SELECT fq.query_id, i.vec_id,
         |                 list_dot_product(i.e, fq.qe) / (i.nrm * fq.qn) AS cos
         |          FROM fq CROSS JOIN entries JOIN nall i ON i.vec_id = entries.eid),
         |""".stripMargin)
    val fFinal = beamLoopCtes(sb, "f", graphCte, "nall", "fvis0", beam, hops)
    s"""WITH ${sb.toString}
       |rfin AS MATERIALIZED (SELECT query_id, vec_id, cos,
       |               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |        FROM $fFinal WHERE vec_id <> query_id)
       |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
       |       floor(cos * 1e6)::BIGINT AS cos_1e6
       |FROM rfin WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB mirror of [[buildKnnGraphIndex]] + [[addPqToKnnGraphIndex]] +
    * [[pqGraphSearch]]: the build CTEs, the PQ seed/encode/LUT CTEs
    * (verbatim [[Similarity.pqTopKSql]] shapes), then the beam loop with
    * ADC scoring — every hop scores candidates by the same exact-integer
    * sum over the code table — and the final exact re-rank of the
    * ADC-best `k·candFactor`. Navigation is integer arithmetic end to
    * end, so the walk replays bit-for-bit.
    */
  def pqGraphSearchSql(numQueries: Int = 20, k: Int = 5,
                       beam: Int = 8, hops: Int = 3,
                       buildK: Int = 6, rounds: Int = 2,
                       numEntries: Int = 16, m: Int = 8, ksub: Int = 16,
                       candFactor: Int = 3, dim: Int = 64): String = {
    val dsub = dim / m
    def sub(e: String) = s"list_slice($e, j.j * $dsub + 1, j.j * $dsub + $dsub)"
    val (ctes, fin) = graphCtes(buildK, rounds)
    val sb = new StringBuilder
    sb.append(ctes)
    sb.append(
      s"""span AS MATERIALIZED (SELECT min(vec_id) AS lo, max(vec_id) + 1 AS hi FROM n),
         |ecand AS MATERIALIZED (SELECT span.lo + (u.i * (span.hi - span.lo)) // $numEntries AS c
         |          FROM span, UNNEST(range(0, $numEntries)) AS u(i)),
         |entries AS MATERIALIZED (SELECT DISTINCT eid FROM (
         |  SELECT min(n.vec_id) AS eid FROM ecand JOIN n ON n.vec_id >= ecand.c GROUP BY ecand.c)),
         |seeds AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, e
         |          FROM v ORDER BY vec_id LIMIT $ksub),
         |pcodes AS MATERIALIZED (
         |  SELECT vec_id, j, c AS code FROM (
         |    SELECT vec_id, j, c, row_number() OVER (PARTITION BY vec_id, j ORDER BY d, c) AS rn
         |    FROM (SELECT v.vec_id, j.j AS j, s.c AS c,
         |            list_dot_product(${sub("s.e")}, ${sub("s.e")})
         |            - 2 * list_dot_product(${sub("v.e")}, ${sub("s.e")}) AS d
         |          FROM v, range(0, $m) AS j(j), seeds s))
         |  WHERE rn = 1),
         |q AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM n
         |  WHERE vec_id < $numQueries),
         |lut AS MATERIALIZED (SELECT q.query_id, j.j AS j, s.c AS c,
         |          floor(list_dot_product(${sub("q.qe")}, ${sub("s.e")}) * 1e6)::BIGINT AS p
         |        FROM q, range(0, $m) AS j(j), seeds s),
         |cand0 AS MATERIALIZED (SELECT q.query_id, entries.eid AS vec_id
         |  FROM q CROSS JOIN entries),
         |vis0 AS MATERIALIZED (SELECT c.query_id, c.vec_id, SUM(l.p)::BIGINT AS adc
         |  FROM cand0 c JOIN pcodes cd ON cd.vec_id = c.vec_id
         |  JOIN lut l ON l.query_id = c.query_id AND l.j = cd.j AND l.c = cd.code
         |  GROUP BY 1, 2),
         |beam0 AS MATERIALIZED (SELECT query_id, vec_id, adc FROM (
         |  SELECT query_id, vec_id, adc,
         |         row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS rn
         |  FROM vis0) WHERE rn <= $beam),
         |""".stripMargin)
    for (h <- 1 to hops) {
      sb.append(
        s"""cand$h AS MATERIALIZED (SELECT DISTINCT b.query_id, g.dst AS vec_id
           |  FROM beam${h - 1} b JOIN $fin g ON g.src = b.vec_id),
           |sc$h AS MATERIALIZED (SELECT c.query_id, c.vec_id, SUM(l.p)::BIGINT AS adc
           |  FROM cand$h c JOIN pcodes cd ON cd.vec_id = c.vec_id
           |  JOIN lut l ON l.query_id = c.query_id AND l.j = cd.j AND l.c = cd.code
           |  GROUP BY 1, 2),
           |vis$h AS MATERIALIZED (SELECT DISTINCT query_id, vec_id, adc FROM (
           |  SELECT query_id, vec_id, adc FROM vis${h - 1}
           |  UNION ALL SELECT query_id, vec_id, adc FROM sc$h)),
           |beam$h AS MATERIALIZED (SELECT query_id, vec_id, adc FROM (
           |  SELECT query_id, vec_id, adc,
           |         row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS rn
           |  FROM vis$h) WHERE rn <= $beam),
           |""".stripMargin)
    }
    s"""WITH ${sb.toString}
       |cr AS MATERIALIZED (SELECT query_id, vec_id,
       |        row_number() OVER (PARTITION BY query_id ORDER BY adc DESC, vec_id) AS crank
       |      FROM vis$hops WHERE vec_id <> query_id),
       |x AS MATERIALIZED (SELECT cr.query_id, cr.vec_id,
       |        list_dot_product(cv.e, q.qe) / (cv.nrm * q.qn) AS cos
       |      FROM cr JOIN n cv ON cv.vec_id = cr.vec_id
       |             JOIN q ON q.query_id = cr.query_id
       |      WHERE cr.crank <= ${k * candFactor}),
       |f AS MATERIALIZED (SELECT query_id, vec_id, cos,
       |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |      FROM x)
       |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
       |       floor(cos * 1e6)::BIGINT AS cos_1e6
       |FROM f WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB mirror of [[buildKnnGraphIndex]] + [[deleteFromKnnGraphIndex]]
    * + [[consolidateKnnGraphIndex]] + [[knnGraphSearch]]: the build CTEs
    * over the full corpus, then the consolidation's one-hop repair
    * replayed relationally — kept = edges with neither endpoint deleted
    * (`delFilter` is the "is deleted" predicate over vec_id); patch =
    * (surviving in-neighbor × surviving out-neighbor) per deleted vertex,
    * self-pairs and already-kept pairs removed, cosines recomputed from
    * the survivors, capped at `patchK` per source by (cos desc, dst);
    * entries re-snapped to the smallest surviving id at or above each
    * build entry — then the standard beam walk over the patched graph
    * scoring survivors only. The commit round trips are
    * content-preserving, so this IS the post-consolidation search. */
  def knnGraphDeleteSearchSql(delFilter: String,
                              numQueries: Int = 20,
                              k: Int = 5, beam: Int = 8, hops: Int = 3,
                              buildK: Int = 6, rounds: Int = 2,
                              numEntries: Int = 16, patchK: Int = 6): String = {
    val (ctes, fin) = graphCtes(buildK, rounds)
    val sb = new StringBuilder
    sb.append(ctes)
    sb.append(
      s"""span AS MATERIALIZED (SELECT min(vec_id) AS lo, max(vec_id) + 1 AS hi FROM n),
         |ecand AS MATERIALIZED (SELECT span.lo + (u.i * (span.hi - span.lo)) // $numEntries AS c
         |          FROM span, UNNEST(range(0, $numEntries)) AS u(i)),
         |entries0 AS MATERIALIZED (SELECT DISTINCT eid FROM (
         |  SELECT min(n.vec_id) AS eid FROM ecand JOIN n ON n.vec_id >= ecand.c GROUP BY ecand.c)),
         |del AS MATERIALIZED (SELECT vec_id AS d FROM n WHERE $delFilter),
         |sn AS MATERIALIZED (SELECT vec_id, e, nrm FROM n WHERE NOT ($delFilter)),
         |g0 AS MATERIALIZED (SELECT src, dst, cos FROM $fin),
         |kept AS MATERIALIZED (SELECT g.src, g.dst, g.cos FROM g0 g
         |  WHERE g.src NOT IN (SELECT d FROM del) AND g.dst NOT IN (SELECT d FROM del)),
         |pinto AS MATERIALIZED (SELECT g.src, g.dst AS d FROM g0 g
         |  WHERE g.dst IN (SELECT d FROM del) AND g.src NOT IN (SELECT d FROM del)),
         |poutof AS MATERIALIZED (SELECT g.src AS d, g.dst FROM g0 g
         |  WHERE g.src IN (SELECT d FROM del) AND g.dst NOT IN (SELECT d FROM del)),
         |ppairs AS MATERIALIZED (SELECT DISTINCT i.src, o.dst
         |  FROM pinto i JOIN poutof o ON i.d = o.d
         |  WHERE i.src <> o.dst
         |    AND NOT EXISTS (SELECT 1 FROM kept kk WHERE kk.src = i.src AND kk.dst = o.dst)),
         |patch AS MATERIALIZED (SELECT src, dst, cos FROM (
         |  SELECT p.src, p.dst,
         |         list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cos,
         |         row_number() OVER (PARTITION BY p.src
         |           ORDER BY list_dot_product(a.e, b.e) / (a.nrm * b.nrm) DESC, p.dst) AS rn
         |  FROM ppairs p JOIN sn a ON a.vec_id = p.src JOIN sn b ON b.vec_id = p.dst)
         |  WHERE rn <= $patchK),
         |pg AS MATERIALIZED (SELECT src, dst, cos FROM kept
         |  UNION ALL SELECT src, dst, cos FROM patch),
         |entries AS MATERIALIZED (SELECT DISTINCT coalesce(
         |    (SELECT min(s2.vec_id) FROM sn s2 WHERE s2.vec_id >= e.eid),
         |    (SELECT min(s3.vec_id) FROM sn s3)) AS eid
         |  FROM entries0 e),
         |fq AS MATERIALIZED (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM sn
         |  WHERE vec_id < $numQueries),
         |fvis0 AS MATERIALIZED (SELECT fq.query_id, i.vec_id,
         |                 list_dot_product(i.e, fq.qe) / (i.nrm * fq.qn) AS cos
         |          FROM fq CROSS JOIN entries JOIN sn i ON i.vec_id = entries.eid),
         |""".stripMargin)
    val fFinal = beamLoopCtes(sb, "f", "pg", "sn", "fvis0", beam, hops)
    s"""WITH ${sb.toString}
       |rfin AS MATERIALIZED (SELECT query_id, vec_id, cos,
       |               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |        FROM $fFinal WHERE vec_id <> query_id)
       |SELECT query_id, vec_id AS neighbor_id, rank::BIGINT AS rank,
       |       floor(cos * 1e6)::BIGINT AS cos_1e6
       |FROM rfin WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }
}
