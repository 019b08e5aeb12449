package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CommitTable

/** Incremental maintenance of graph analytic views off the commit log's
  * change-data feed — the 100 TB answer to "the graph changed, refresh the
  * dashboard": a full recompute scans every edge, while the CDF between two
  * committed versions is SHARD-SIZED (yesterday's ingest), and a
  * decomposable view (per-vertex degree sums here) folds those deltas into
  * the existing view with one vertex-keyed join. The maintained view is
  * EXACTLY the view recomputed from the head — asserted in suite and gated
  * against a full-recompute oracle (g46).
  *
  * Degree semantics are MULTISET (`Analytics.degrees(dedup = false)`):
  * [[CommitTable.changesBetween]] is a multiset row diff, so +1/−1 deltas
  * map one-to-one onto inserted/deleted edge rows. Tables that enforce
  * distinct edges at write time (the graph-catalog convention) make the
  * two semantics coincide.
  */
object IncrementalViews {

  /** Per-vertex degree deltas of a CDF frame (`change_type` ∈
    * insert/delete + edge columns): insert = +1, delete = −1, summed per
    * endpoint — one groupBy over the shard-sized change set.
    */
  def degreeDeltas(changes: DataFrame): DataFrame = {
    val sign = when(col("change_type") === "insert", 1L).otherwise(-1L)
    val dOut = changes.groupBy(col("src").cast("long").as("vertex"))
      .agg(sum(sign).as("delta_out"))
    val dIn = changes.groupBy(col("dst").cast("long").as("vertex"))
      .agg(sum(sign).as("delta_in"))
    dOut.join(dIn, Seq("vertex"), "full_outer")
      .select(col("vertex"),
        coalesce(col("delta_out"), lit(0L)).as("delta_out"),
        coalesce(col("delta_in"), lit(0L)).as("delta_in"))
  }

  /** Folds [[degreeDeltas]] into an existing degree view: one vertex-keyed
    * full-outer join (view is vertex-sized, deltas are shard-sized —
    * nothing edge-sized moves); vertices whose degrees hit zero leave the
    * view, newly-touched vertices enter it.
    */
  def applyDegreeDeltas(base: DataFrame, changes: DataFrame): DataFrame = {
    val d = degreeDeltas(changes)
    base.join(d, Seq("vertex"), "full_outer")
      .select(col("vertex"),
        (coalesce(col("out_degree"), lit(0L)) + coalesce(col("delta_out"), lit(0L))).as("out_degree"),
        (coalesce(col("in_degree"), lit(0L)) + coalesce(col("delta_in"), lit(0L))).as("in_degree"))
      .filter(col("out_degree") > 0 || col("in_degree") > 0)
  }

  /** The maintained degree view of a commit-log edge table: the view as of
    * `fromVersion`, advanced to `toVersion` purely through the CDF — the
    * base snapshot is scanned once (or, in steady state, is the previously
    * maintained view and never rescanned), and each advance costs one
    * change-shard pass.
    */
  def maintainedDegrees(t: CommitTable, fromVersion: Long, toVersion: Long): DataFrame = {
    val base = Analytics.degrees(t.asOf(fromVersion), dedup = false)
    applyDegreeDeltas(base, t.changesBetween(fromVersion, toVersion))
  }

  /** Canonical simple undirected pairs of a directed edge frame. */
  private def und(edges: DataFrame): DataFrame = edges
    .select(col("src").cast("long").as("s"), col("dst").cast("long").as("d"))
    .filter(col("s") =!= col("d"))
    .select(least(col("s"), col("d")).as("a"), greatest(col("s"), col("d")).as("b"))
    .distinct()

  /** Per-vertex counts of the DISTINCT triangles in `edges` that contain at
    * least one `deltaPairs` pair. The probe is delta-proportional: each
    * delta pair (a, b) looks up N(a) ∩ N(b) (two adjacency joins), checks
    * (a, b) itself still exists (a deleted pair closes no triangle), and
    * the sorted-triple distinct collapses triangles touched by several
    * delta pairs. Nothing edge-set-sized is aggregated — only the delta's
    * neighborhood moves.
    */
  private def triangleDeltaCounts(edges: DataFrame, deltaPairs: DataFrame): DataFrame = {
    val u = und(edges)
    val sym = u.union(u.select(col("b"), col("a")).toDF("a", "b"))
    val s1 = sym.toDF("p", "n1")
    val s2 = sym.toDF("q", "n2")
    val tris = deltaPairs
      .join(s1, col("a") === col("p"))
      .join(s2, col("b") === col("q") && col("n1") === col("n2"))
      .join(u.toDF("ea", "eb"), col("a") === col("ea") && col("b") === col("eb"), "left_semi")
      .select(array_sort(array(col("a"), col("b"), col("n1"))).as("t"))
      .distinct()
    tris.select(explode(col("t")).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("n"))
  }

  /** Incrementally maintained per-vertex TRIANGLE counts — the nonlinear
    * companion of [[maintainedDegrees]]: degrees fold linearly off the CDF,
    * but a triangle count changes only for triangles CONTAINING a changed
    * pair, so the delta is `touching(new) − touching(old)` probed around
    * the change set (delta × degree work, never an edge-set rescan beyond
    * the adjacency lookups the probe pushes down). The maintained view is
    * EXACTLY `Analytics.triangleCounts(asOf(to))` — suite-asserted on
    * random version histories and gated against a full-recompute oracle
    * (g53). Table contract: distinct-edge semantics (the graph-catalog
    * convention); non-changed pairs appearing in the CDF are harmless (the
    * old/new probe difference is zero for them).
    */
  /** Incrementally maintained CONNECTED COMPONENTS — the classic
    * insert-monotone view: adding edges only MERGES components, so the
    * delta computation never touches the edge table. The inserted edges'
    * endpoints are contracted to their current labels (new vertices label
    * themselves), components are recomputed on that DELTA-SIZED super
    * graph only, and the vertex view is relabeled through one broadcast
    * join. Because the base labels are min-vertex-ids (the GraphX
    * convention) and the super-CC takes the min of merged labels, the
    * maintained view is EXACTLY `connectedComponents(asOf(to))` —
    * suite-asserted on random insert histories and gated against a
    * full-recompute oracle (g58).
    *
    * Deletions are REFUSED loudly: an edge removal can split a component,
    * which is not decomposable from the delta (that's the fully-dynamic
    * connectivity problem) — the honest answer is a recompute, and a
    * silent wrong view is worse than an exception.
    *
    * Scale shape: the base view is vertex-sized (in steady state the
    * previously maintained view, never rescanned); the super graph is
    * ≤ |inserted edges| pairs; the relabel map is bounded by the touched
    * labels and broadcasts.
    */
  def maintainedComponents(t: CommitTable, fromVersion: Long, toVersion: Long): DataFrame = {
    val changes = t.changesBetween(fromVersion, toVersion)
      .select(col("change_type"), col("src").cast("long").as("s"),
        col("dst").cast("long").as("d"))
      .localCheckpoint(true) // the delete guard and the delta both read it
    val nDel = changes.filter(col("change_type") === "delete").count()
    require(nDel == 0L,
      s"maintainedComponents($fromVersion -> $toVersion): $nDel deletions in the change feed — " +
        "edge removal can split components (fully-dynamic connectivity); recompute instead")
    val base = Analytics.connectedComponents(t.asOf(fromVersion))
      .localCheckpoint(true) // endpoint-label lookup + relabel both read it
    val ins = changes.filter(col("change_type") === "insert").select("s", "d")
    // contract endpoints to current labels; unseen vertices label themselves
    val ls = base.select(col("vertex").as("s"), col("component").as("ls"))
    val ld = base.select(col("vertex").as("d"), col("component").as("ld"))
    val superEdges = ins
      .join(ls, Seq("s"), "left_outer")
      .join(ld, Seq("d"), "left_outer")
      .select(coalesce(col("ls"), col("s")).as("src"),
        coalesce(col("ld"), col("d")).as("dst"))
      .distinct()
    val relabel = Analytics.connectedComponents(superEdges)
      .select(col("vertex").as("component"), col("component").as("merged"))
    val newVerts = ins.select(col("s").as("vertex"))
      .union(ins.select(col("d").as("vertex"))).distinct()
      .join(base.select("vertex"), Seq("vertex"), "left_anti")
      .select(col("vertex"), col("vertex").as("component"))
    base.select("vertex", "component").union(newVerts)
      .join(broadcast(relabel), Seq("component"), "left_outer")
      .select(col("vertex"), coalesce(col("merged"), col("component")).as("component"))
  }

  def maintainedTriangles(t: CommitTable, fromVersion: Long, toVersion: Long): DataFrame = {
    // the three shared inputs checkpoint ONCE (r19): the base count, the
    // old-side probe and the new-side probe each re-reference their edge
    // snapshot and the delta several times (sym unions, semi-joins), and
    // without a cut the final plan inlines the whole commit-log read per
    // reference — measured 601 physical operators / 130 parquet scans at
    // g53, where ANALYSIS + codegen time (driver) dwarfed the data work
    // (guide §7.3 planning cost; §3 "materialise an intermediate to
    // truncate the plan")
    val eOld = t.asOf(fromVersion).select(col("src"), col("dst")).localCheckpoint(true)
    val eNew = t.asOf(toVersion).select(col("src"), col("dst")).localCheckpoint(true)
    val delta = und(t.changesBetween(fromVersion, toVersion).select("src", "dst"))
      .localCheckpoint(true)
    val base = Analytics.triangleCounts(eOld)
    val dOld = triangleDeltaCounts(eOld, delta)
      .select(col("vertex"), col("n").as("n_old"))
    val dNew = triangleDeltaCounts(eNew, delta)
      .select(col("vertex"), col("n").as("n_new"))
    base.join(dNew, Seq("vertex"), "full_outer")
      .join(dOld, Seq("vertex"), "full_outer")
      .select(col("vertex"),
        (coalesce(col("triangles"), lit(0L)) + coalesce(col("n_new"), lit(0L))
          - coalesce(col("n_old"), lit(0L))).as("triangles"))
      .filter(col("triangles") > 0)
  }
}
