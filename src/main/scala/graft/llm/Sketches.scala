package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Aggregators, Hashing}

/** Mergeable sketch operators for corpus statistics at 100 TB.
  *
  * The reference computes no statistics at all; a training-data pipeline
  * lives on them ("how many distinct n-grams does this crawl slice add?"),
  * and at corpus scale the exact answers are the expensive part: exact
  * `COUNT(DISTINCT)` shuffles every distinct value. A KMV sketch
  * ([[Aggregators.MinKLongs]]) carries k longs per group through the
  * partial/merge path instead, and two sketches union-merge — so daily
  * increments maintain the corpus-wide estimate without rescans (the same
  * incremental-maintenance story as q21's rollup, but for DISTINCT, which
  * plain partial aggregation cannot re-add).
  *
  * Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  * stream"): with values uniform in [0, 2^60) (md5-derived
  * [[Hashing.hash60]]), the k-th smallest value m_k estimates the distinct
  * count as (k-1) * 2^60 / m_k; when fewer than k distinct values exist the
  * sketch holds all of them and the count is exact. The arithmetic is kept
  * in DECIMAL(38,0) with integral division so the DuckDB oracle matches
  * bit-for-bit (HUGEINT floor division on the same operands).
  */
object Sketches {

  /** Per-language distinct word-3-gram estimate vs exact:
    * `(lang, m, kth_min, est_distinct, exact_distinct)` where m = sketch
    * fill (min(k, exact)). The exact column exists so the gate itself
    * witnesses the estimate's error — at production scale you would drop it
    * and keep only the O(k)-state sketch path.
    */
  def kmvDistinctShingles(docs: DataFrame, k: Int = 64): DataFrame = {
    require(k > 1, s"KMV needs k > 1 (the estimator uses k-1), got $k")
    val kmv = udaf(new Aggregators.MinKLongs(k))
    val pow60 = "CAST(1152921504606846976 AS DECIMAL(38,0))" // 2^60
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs
      .repartition(par) // single-file parquet input = 1 partition otherwise
      .select(col("lang"), explode(TextOps.shingles3(TextOps.tokens(col("text")))).as("shingle"))
      .select(col("lang"), Hashing.hash60(col("shingle")).as("h"))
      // this GATE query carries the exact column, so the distinct shuffle
      // is paid anyway — pre-distinct once and the countDistinct expand
      // disappears AND the aggregator folds only distinct values (measured
      // 9.8s -> well under 1s at sf0.1). The sketch-ONLY production path
      // feeds raw values straight into the O(k) aggregator with no
      // distinct shuffle at all (MinKLongs dedups internally).
      .distinct()
      .groupBy("lang")
      .agg(kmv(col("h")).as("mins"), count(col("h")).as("exact_distinct"))
      .select(col("lang"),
        size(col("mins")).cast("long").as("m"),
        element_at(col("mins"), size(col("mins"))).as("kth_min"),
        col("exact_distinct"))
      .withColumn("est_distinct",
        when(col("m") < k, col("m")).otherwise(
          expr(s"CAST(${k - 1} AS DECIMAL(38,0)) * $pow60 div kth_min")))
      .select("lang", "m", "kth_min", "est_distinct", "exact_distinct")
      .orderBy("lang")
  }

  /** Mergeable quantile estimation via a fixed-width integer histogram: per
    * group, the p50/p90 bin lower edges plus the row count.
    * `(prio, n_rows, p50_edge, p90_edge)` — all integer-exact.
    *
    * The histogram state (bin → count) is plain re-addable partial
    * aggregation, so — like q21's rollup and t14's KMV — yesterday's bins
    * merge with today's by summing, and quantiles re-derive from the merged
    * counts without touching history. That is the property exact
    * percentiles (q12's sort-based path) fundamentally lack. Error is
    * bounded by the bin width by construction. Production sketches
    * (t-digest/KLL) trade the fixed grid for adaptive accuracy but have
    * merge-order-dependent internals — not oracle-checkable bit-for-bit —
    * so the gate binds the deterministic fixed-grid form and the estimator
    * tolerance is property-tested in SketchesSpec.
    *
    * Rank targets use ceiling integer math (`ceil(q·n) = (q·n + d-1) div d`)
    * and the pick is "smallest bin whose cumulative count reaches the
    * rank" — identical integer semantics in both engines.
    */
  def histogramQuantiles(orders: DataFrame, binWidth: Long = 16384L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    import org.apache.spark.sql.expressions.Window
    val binned = orders
      .select(col("o_orderpriority").as("prio"),
        floor(col("o_totalprice") / binWidth).cast("long").as("bin"))
      .groupBy("prio", "bin").agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy("prio").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy("prio")
    binned
      .withColumn("cum", sum("c").over(cumW))
      .withColumn("n", sum("c").over(totW))
      .groupBy("prio")
      .agg(max("n").as("n_rows"),
        (min(when(col("cum") >= expr("(n + 1) div 2"), col("bin"))) * binWidth)
          .cast("long").as("p50_edge"),
        (min(when(col("cum") >= expr("(9 * n + 9) div 10"), col("bin"))) * binWidth)
          .cast("long").as("p90_edge"))
      .orderBy("prio")
  }

  /** DuckDB mirror of [[histogramQuantiles]] — same bins, same ceiling
    * ranks, same smallest-qualifying-bin pick.
    */
  def histogramQuantilesSql(binWidth: Long = 16384L): String =
    s"""WITH b AS (SELECT o_orderpriority AS prio,
       |                  CAST(floor(o_totalprice / $binWidth) AS BIGINT) AS bin, COUNT(*) AS c
       |           FROM orders GROUP BY 1, 2),
       |cum AS (SELECT prio, bin,
       |               SUM(c) OVER (PARTITION BY prio ORDER BY bin) AS cum,
       |               SUM(c) OVER (PARTITION BY prio) AS n
       |        FROM b)
       |SELECT prio, MAX(n)::BIGINT AS n_rows,
       |  (MIN(CASE WHEN cum >= (n + 1) // 2 THEN bin END) * $binWidth)::BIGINT AS p50_edge,
       |  (MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN bin END) * $binWidth)::BIGINT AS p90_edge
       |FROM cum GROUP BY prio ORDER BY prio""".stripMargin

  // ----- adaptive mergeable quantile sketch (t45) -----------------------

  /** Builds the ADAPTIVE mergeable quantile sketch over `(uid, val)` rows —
    * the adaptive-accuracy sketch [[histogramQuantiles]]'s own doc comment
    * names as the production form (its fixed grid has unbounded error on
    * skewed ranges; this sketch's rank error is O(1/√k) regardless of the
    * value distribution).
    *
    * Construction (Flajolet 1990 "On adaptive sampling" / Wegman's nested
    * Bernoulli levels, applied to rank estimation): each row's retention
    * is decided SOLELY by its uid's hash — `z(uid)` = trailing-zero count
    * of [[Hashing.hash60]], and the sketch keeps rows with `z >= level`
    * (a 2^-level hash-Bernoulli sample, each carrying weight 2^level),
    * where `level` is the smallest value whose retained count fits the
    * budget `k`. KLL/t-digest reach the same adaptive accuracy with a
    * compactor hierarchy, but their retained set depends on arrival/merge
    * ORDER — not oracle-checkable and `merge(a,b) != sketch(a∪b)` in
    * general. The nested-hash-level form trades a constant factor of
    * accuracy for three properties this engine's contract wants:
    * order-independence (retention is a pure function of uid),
    * determinism (DuckDB restates the whole pipeline bit-for-bit), and an
    * EXACT merge law — `{z >= l}` is nested in `{z >= l'}` for `l >= l'`,
    * so re-leveling the union of two sketches yields EXACTLY the sketch
    * of the unioned input ([[mergeQuantileSketches]], spec-asserted).
    *
    * Scale shape: one scan to the ≤ 61-row z-histogram (map-side
    * combined; the driver picks the level from it), one filtered scan for
    * the retained rows. Nothing corpus-sized is collected, sorted, or
    * checkpointed; when n <= k the level is 0 and the sketch is the exact
    * multiset. Returns `(val, z, level)` rows (≤ k by construction).
    */
  def adaptiveQuantileSketch(rows: DataFrame, k: Int = 256): DataFrame = {
    require(k > 0, s"adaptiveQuantileSketch: k must be positive, got $k")
    val base = rows.select(col("val").cast("long").as("val"),
      zTrailing(Hashing.hash60(col("uid").cast("string"))).as("z"))
    val zCounts = base.groupBy("z").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq // ≤ 61 rows
    val level = chooseLevel(zCounts, k, floorLevel = 0)
    base.filter(col("z") >= level).withColumn("level", lit(level))
  }

  /** Merges two sketches into EXACTLY the sketch of the unioned input:
    * unions the retained rows, re-picks the level from the union's
    * z-histogram starting at the inputs' max level (below it the true
    * counts provably exceeded k — that is why each sketch's own level was
    * where it was), and re-filters. Associative and commutative; the
    * daily-increment story of t14's KMV for quantiles.
    */
  def mergeQuantileSketches(a: DataFrame, b: DataFrame, k: Int = 256): DataFrame = {
    require(k > 0, s"mergeQuantileSketches: k must be positive, got $k")
    val u = a.select("val", "z", "level").unionByName(b.select("val", "z", "level"))
    val parts = u.groupBy("z").agg(count(lit(1)).as("c"), max("level").as("ml"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSeq // ≤ 61 rows
    val floorLevel = if (parts.isEmpty) 0 else parts.map(_._3).max
    val level = chooseLevel(parts.map(p => (p._1, p._2)), k, floorLevel)
    u.select("val", "z").filter(col("z") >= level).withColumn("level", lit(level))
  }

  /** Quantile readout from a sketch: for each requested ppm rank the
    * estimate is the retained value at weighted rank `ceil(q·n_ret)`
    * (constant weights make the weighted rank a plain row rank; the
    * integer form `rn·1e6 >= q_ppm·n_ret` avoids the division). Returns
    * `(q_ppm, level, n_ret, n_est, est_val)` ordered by q_ppm —
    * `n_est = n_ret·2^level` is the sketch's own size estimate of the
    * underlying multiset. The sort is over ≤ k retained rows by contract.
    */
  def sketchQuantiles(sketch: DataFrame, qPpms: Seq[Long]): DataFrame = {
    require(qPpms.nonEmpty && qPpms.forall(q => q > 0 && q <= 1000000L),
      s"sketchQuantiles: q_ppm values must be in (0, 1e6], got $qPpms")
    val spark = sketch.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val ranked = sketch
      .withColumn("rn", row_number().over(Window.orderBy("val", "z")))
      .withColumn("n_ret", count(lit(1)).over(Window.partitionBy()))
    ranked.crossJoin(broadcast(qPpms.toDF("q_ppm")))
      .groupBy("q_ppm")
      .agg(max(col("level")).cast("long").as("level"),
        max(col("n_ret")).as("n_ret"),
        min(when(col("rn") * 1000000L >= col("q_ppm") * col("n_ret"), col("val"))).as("est_val"))
      .select(col("q_ppm"), col("level"), col("n_ret"),
        expr("n_ret * CAST(power(2, level) AS BIGINT)").as("n_est"), col("est_val"))
      .orderBy("q_ppm")
  }

  /** Per-GROUP adaptive quantile sketch + readout in ONE fully
    * distributed pass — the grouped form of [[adaptiveQuantileSketch]]
    * with NO driver collect anywhere: each group's level comes from a
    * closed form over its z-histogram (`level = max(z + 1 where
    * cum(z..60) > k)`, 0 when the whole group fits — the same smallest-
    * fitting-level rule, computed as a window + aggregate instead of a
    * driver loop), joined back on the group key. Rank readout as in
    * [[sketchQuantiles]]. Returns
    * `(grp, q_ppm, level, n_ret, n_est, est_val)` ordered by (grp,
    * q_ppm). Input columns: `(grp, uid, val)`.
    *
    * Scale shape: one groups×61-sized aggregate (map-side combined), one
    * grp-keyed join to cut the retained rows, one grp-windowed rank over
    * ≤ k rows per group. Group count is unbounded — nothing here is
    * driver-sized, which is exactly what the ungrouped path's ≤ 61-row
    * collect could not offer per group.
    */
  def groupedAdaptiveQuantiles(rows: DataFrame, k: Int = 128,
                               qPpms: Seq[Long] = Seq(500000L, 900000L)): DataFrame = {
    require(k > 0, s"groupedAdaptiveQuantiles: k must be positive, got $k")
    require(qPpms.nonEmpty && qPpms.forall(q => q > 0 && q <= 1000000L),
      s"groupedAdaptiveQuantiles: q_ppm values must be in (0, 1e6], got $qPpms")
    val spark = rows.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = rows.select(col("grp"), col("val").cast("long").as("val"),
      zTrailing(Hashing.hash60(col("uid").cast("string"))).as("z"))
    val zc = base.groupBy("grp", "z").agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy("grp").orderBy(col("z").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val levels = zc.withColumn("cum", sum("c").over(cumW))
      .groupBy("grp")
      .agg(coalesce(max(when(col("cum") > k, col("z") + 1)), lit(0)).cast("int").as("level"))
    val retained = base.join(levels, "grp").filter(col("z") >= col("level"))
    val rkW = Window.partitionBy("grp").orderBy("val", "z")
    val ranked = retained
      .withColumn("rn", row_number().over(rkW))
      .withColumn("n_ret", count(lit(1)).over(Window.partitionBy("grp")))
    ranked.crossJoin(broadcast(qPpms.toDF("q_ppm")))
      .groupBy("grp", "q_ppm")
      .agg(max(col("level")).cast("long").as("level"),
        max(col("n_ret")).as("n_ret"),
        min(when(col("rn") * 1000000L >= col("q_ppm") * col("n_ret"), col("val"))).as("est_val"))
      .select(col("grp"), col("q_ppm"), col("level"), col("n_ret"),
        expr("n_ret * CAST(power(2, level) AS BIGINT)").as("n_est"), col("est_val"))
      .orderBy("grp", "q_ppm")
  }

  /** DuckDB mirror of [[groupedAdaptiveQuantiles]] over `orders`
    * (grp = o_orderpriority, uid = o_orderkey, val = floor(o_totalprice)):
    * same hash/levels, same closed-form per-group level, same readout.
    */
  def groupedAdaptiveQuantilesSql(k: Int = 128,
                                  qPpms: Seq[Long] = Seq(500000L, 900000L)): String =
    s"""WITH v AS (SELECT o_orderpriority AS grp, o_orderkey AS uid,
       |                  CAST(floor(o_totalprice) AS BIGINT) AS val FROM orders),
       |hz AS (SELECT grp, val, LEAST(bit_count((hh & -hh) - 1), 60) AS z
       |       FROM (SELECT grp, val, ${Hashing.hash60Sql("CAST(uid AS VARCHAR)")} AS hh FROM v)),
       |zc AS (SELECT grp, z, COUNT(*) AS c FROM hz GROUP BY grp, z),
       |cm AS (SELECT grp, z, SUM(c) OVER (PARTITION BY grp ORDER BY z DESC) AS cum FROM zc),
       |lv AS (SELECT grp, COALESCE(MAX(CASE WHEN cum > $k THEN z + 1 END), 0) AS level
       |       FROM cm GROUP BY grp),
       |ret AS (SELECT hz.grp, hz.val, hz.z, lv.level FROM hz JOIN lv ON hz.grp = lv.grp
       |        WHERE hz.z >= lv.level),
       |rk AS (SELECT grp, val, level,
       |              row_number() OVER (PARTITION BY grp ORDER BY val, z) AS rn,
       |              COUNT(*) OVER (PARTITION BY grp) AS n_ret
       |       FROM ret),
       |q AS (SELECT UNNEST([${qPpms.mkString(", ")}]) AS q_ppm)
       |SELECT grp, CAST(q_ppm AS BIGINT) AS q_ppm, CAST(MAX(level) AS BIGINT) AS level,
       |       CAST(MAX(n_ret) AS BIGINT) AS n_ret,
       |       CAST(MAX(n_ret) * CAST(power(2, MAX(level)) AS BIGINT) AS BIGINT) AS n_est,
       |       MIN(CASE WHEN rn * 1000000 >= q_ppm * n_ret THEN val END) AS est_val
       |FROM rk CROSS JOIN q GROUP BY grp, q_ppm ORDER BY grp, q_ppm""".stripMargin

  /** Trailing-zero count of a 60-bit hash, codegen'd from built-ins:
    * `h & -h` isolates the lowest set bit (2^z), so `bit_count(2^z - 1)`
    * counts exactly z ones; h = 0 yields bit_count(-1) = 64, capped to
    * 60. The identical expression runs in DuckDB. */
  private def zTrailing(h: Column): Column =
    least(bit_count(h.bitwiseAND(-h) - 1), lit(60)).cast("int")

  /** Smallest level >= floorLevel whose `z >= level` population fits k.
    * The z-histogram is ≤ 61 rows by construction — a driver decision,
    * like the IVF codebook. */
  private def chooseLevel(zCounts: Seq[(Int, Long)], k: Int, floorLevel: Int): Int =
    (floorLevel to 60).find(l => zCounts.collect { case (z, c) if z >= l => c }.sum <= k)
      .getOrElse(throw new IllegalStateException(
        "adaptive sketch: no level <= 60 fits the budget — k too small for the corpus"))

  /** DuckDB mirror of the full sketch pipeline over `orders`
    * (uid = o_orderkey, val = floor(o_totalprice)): same hash, same
    * trailing-zero levels, same smallest-fitting-level rule, same integer
    * rank readout. The gate builds its sketch from two MERGED halves; the
    * mirror builds one directly — their equality IS the exact-merge law.
    */
  def adaptiveQuantilesSql(k: Int = 256, qPpms: Seq[Long] = Seq(250000L, 500000L, 900000L)): String =
    s"""WITH v AS (SELECT o_orderkey AS uid, CAST(floor(o_totalprice) AS BIGINT) AS val FROM orders),
       |hz AS (SELECT val, LEAST(bit_count((hh & -hh) - 1), 60) AS z
       |       FROM (SELECT val, ${Hashing.hash60Sql("CAST(uid AS VARCHAR)")} AS hh FROM v)),
       |lv AS (SELECT MIN(t.l) AS level FROM range(0, 61) t(l)
       |       WHERE (SELECT COUNT(*) FROM hz WHERE hz.z >= t.l) <= $k),
       |ret AS (SELECT hz.val, hz.z, lv.level FROM hz, lv WHERE hz.z >= lv.level),
       |rk AS (SELECT val, level, row_number() OVER (ORDER BY val, z) AS rn,
       |              COUNT(*) OVER () AS n_ret
       |       FROM ret),
       |q AS (SELECT UNNEST([${qPpms.mkString(", ")}]) AS q_ppm)
       |SELECT CAST(q_ppm AS BIGINT) AS q_ppm, CAST(MAX(level) AS BIGINT) AS level,
       |       CAST(MAX(n_ret) AS BIGINT) AS n_ret,
       |       CAST(MAX(n_ret) * CAST(power(2, MAX(level)) AS BIGINT) AS BIGINT) AS n_est,
       |       MIN(CASE WHEN rn * 1000000 >= q_ppm * n_ret THEN val END) AS est_val
       |FROM rk CROSS JOIN q GROUP BY q_ppm ORDER BY q_ppm""".stripMargin

  /** Count-Min sketch frequency estimation (Cormode & Muthukrishnan 2005)
    * with heavy-hitter readout: a depth×width counter grid where row i
    * buckets each token by universal hash `((a_i·fp + b_i) mod P) mod
    * width` (fp = md5-derived fingerprint, P = 2³¹−1, fixed seed — fully
    * deterministic, so the DuckDB oracle reproduces the grid exactly), and
    * a token's estimate is the MIN of its depth counters: always ≥ the
    * true count, over only by hash-collision mass. The grid is plain
    * re-addable partial aggregation — O(depth·width) state that merges
    * across partitions, days, and corpora by cell-wise SUM, the
    * point-frequency sibling of t14's KMV (distinct counts) and t15's
    * histogram (quantiles): at 100 TB the exact per-token table is
    * corpus-vocabulary-sized, the sketch is 2 KB.
    *
    * Gate readout: the `topN` exact-top tokens (ties broken by token) with
    * exact and estimated counts side by side, so the gate itself witnesses
    * `est ≥ exact`: `(token, exact_cnt, cms_est)`.
    */
  def countMinHeavyHitters(docs: DataFrame, depth: Int = 4, width: Int = 512,
                           topN: Int = 20): DataFrame = {
    require(depth >= 1 && width >= 2 && topN >= 1,
      s"bad CMS shape: depth=$depth width=$width topN=$topN")
    val spark = docs.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val P = Hashing.MinHashP
    val prm = spark.createDataFrame(
      Hashing.minHashParams(depth).zipWithIndex.map { case ((a, b), i) => (i, a, b) })
      .toDF("d", "a", "b")
    // token counts are the additive input: building the grid from them is
    // cell-for-cell identical to folding the raw stream (CMS is additive),
    // and this gate query needs the exact counts anyway for the
    // est-vs-exact readout; the sketch-only production path feeds raw
    // tokens straight into the grid's partial aggregation
    val cnt = docs.repartition(par)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .withColumn("fp", Hashing.hash60(col("token")) % P)
      .localCheckpoint(true) // two consumers: grid + top-N
    val bucket = ((col("a") * col("fp") + col("b")) % P) % width
    val grid = cnt.crossJoin(broadcast(prm))
      .groupBy(col("d"), bucket.as("bucket")).agg(sum("cnt").as("c"))
    cnt.orderBy(col("cnt").desc, col("token")).limit(topN)
      .crossJoin(broadcast(prm))
      .select(col("token"), col("cnt"), col("d"), bucket.as("bucket"))
      .join(broadcast(grid), Seq("d", "bucket"))
      .groupBy("token", "cnt")
      .agg(min(col("c")).as("cms_est"))
      .select(col("token"), col("cnt").as("exact_cnt"), col("cms_est"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }

  /** KMV sketch SET OPERATIONS (Beyer et al. 2007; the DataSketches theta
    * algebra): per-source k-minimum-values sketches over the hashed
    * shingle universe, then every source PAIR gets |A∪B| and |A∩B|
    * estimates — from the sketches alone, never from the raw sets. This
    * is the mergeable-summary answer to "how much do two crawl sources
    * overlap?" at 100 TB: the per-source state is k longs, the pair
    * algebra is array arithmetic on those sketches, and yesterday's
    * sketches merge with today's by re-minning.
    *
    * Estimators (all integer/decimal-exact, so the mirror matches
    * bit-for-bit): the union sketch is the k smallest of the two minima
    * sets (≡ the k smallest of A∪B's hashes — each side's sketch
    * contains every value that could qualify); with `keff = min(k, m)`
    * and `kth` the keff-th union minimum,
    * `union_est = (k−1)·2⁶⁰ div kth` (or exact when the union fills
    * under k), `inter_num = |K ∩ A ∩ B|` over the union's kept set K,
    * `jaccard_e6 = inter_num·1e6 div keff`, and
    * `inter_est = inter_num·union_est div keff`.
    *
    * Returns `(src_a, src_b, m_union, union_est, inter_num, inter_est,
    * jaccard_e6)` for every `src_a < src_b`, ordered. The pair join is a
    * source-count-sized nested loop over the SKETCH table (never the
    * corpus) — the one place a non-equi join is the right plan, because
    * the relation is |sources| rows by contract.
    */
  def kmvSetOps(docs: DataFrame, k: Int = 64): DataFrame = {
    require(k > 1, s"KMV needs k > 1 (the estimator uses k-1), got $k")
    val kmv = udaf(new Aggregators.MinKLongs(k))
    val pow60 = "CAST(1152921504606846976 AS DECIMAL(38,0))" // 2^60
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val sk = docs
      .repartition(par)
      .select(col("source"), explode(TextOps.shingles3(TextOps.tokens(col("text")))).as("shingle"))
      .select(col("source"), Hashing.hash60(col("shingle")).as("h"))
      .distinct()
      .groupBy("source").agg(kmv(col("h")).as("mins"))
      .localCheckpoint(true) // both sides of the sources-sized pair join
    sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.mins").as("ma"), col("b.mins").as("mb"))
      .withColumn("u", slice(array_sort(array_union(col("ma"), col("mb"))), 1, k))
      .withColumn("keff", size(col("u")).cast("long"))
      .withColumn("kth", element_at(col("u"), size(col("u"))))
      .withColumn("union_est",
        when(col("keff") < k, col("keff")).otherwise(
          expr(s"CAST(${k - 1} AS DECIMAL(38,0)) * $pow60 div kth").cast("long")))
      .withColumn("inter_num",
        size(array_intersect(col("u"), array_intersect(col("ma"), col("mb")))).cast("long"))
      .select(col("src_a"), col("src_b"), col("keff").as("m_union"), col("union_est"),
        col("inter_num"),
        expr("inter_num * union_est div keff").as("inter_est"),
        expr("inter_num * 1000000 div keff").as("jaccard_e6"))
      .orderBy("src_a", "src_b")
  }

  /** DuckDB mirror of [[kmvSetOps]]: per-source ranked-window sketches,
    * the identical union/intersect/estimate algebra in HUGEINT.
    */
  def kmvSetOpsSql(k: Int = 64): String =
    s"""WITH t AS (SELECT source, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
       |           FROM documents),
       |sh AS (SELECT DISTINCT source, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
       |       FROM t, UNNEST(range(1, len(ws) - 1)) AS u(i)),
       |h AS (SELECT DISTINCT source, ${Hashing.hash60Sql("shingle")} AS h FROM sh),
       |r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h),
       |ksel AS (SELECT source, h FROM r WHERE rn <= $k),
       |pairs AS (SELECT a.source AS sa, b.source AS sb
       |          FROM (SELECT DISTINCT source FROM ksel) a
       |          JOIN (SELECT DISTINCT source FROM ksel) b ON a.source < b.source),
       |uni AS (SELECT sa, sb, h, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
       |        FROM (SELECT DISTINCT p.sa, p.sb, x.h
       |              FROM pairs p JOIN ksel x ON x.source = p.sa OR x.source = p.sb)),
       |agg AS (SELECT sa, sb,
       |               MAX(CASE WHEN rn <= $k THEN rn END)::BIGINT AS keff,
       |               MAX(CASE WHEN rn <= $k THEN h END) AS kth,
       |               SUM(CASE WHEN rn <= $k
       |                         AND EXISTS (SELECT 1 FROM ksel a WHERE a.source = uni.sa AND a.h = uni.h)
       |                         AND EXISTS (SELECT 1 FROM ksel b WHERE b.source = uni.sb AND b.h = uni.h)
       |                        THEN 1 ELSE 0 END)::BIGINT AS inter_num
       |        FROM uni GROUP BY sa, sb),
       |est AS (SELECT sa, sb, keff, kth, inter_num,
       |               (CASE WHEN keff < $k THEN keff
       |                     ELSE ((${k - 1}::HUGEINT * 1152921504606846976::HUGEINT) // kth) END)::BIGINT AS union_est
       |        FROM agg)
       |SELECT sa AS src_a, sb AS src_b, keff AS m_union, union_est, inter_num,
       |       ((inter_num::HUGEINT * union_est::HUGEINT) // keff)::BIGINT AS inter_est,
       |       ((inter_num::HUGEINT * 1000000::HUGEINT) // keff)::BIGINT AS jaccard_e6
       |FROM est ORDER BY src_a, src_b""".stripMargin

  /** DuckDB mirror of [[kmvDistinctShingles]]: min-k per group via a ranked
    * window (the oracle may afford the full distinct set; the Spark side is
    * the O(k)-state path being checked).
    */
  def kmvDistinctShinglesSql(k: Int = 64): String =
    s"""WITH t AS (SELECT lang, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
       |           FROM documents),
       |sh AS (SELECT DISTINCT lang, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
       |       FROM t, UNNEST(range(1, len(ws) - 1)) AS u(i)),
       |h AS (SELECT DISTINCT lang, ${Hashing.hash60Sql("shingle")} AS h FROM sh),
       |r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h),
       |a AS (SELECT lang, COUNT(*) AS exact_distinct,
       |             MAX(CASE WHEN rn <= $k THEN rn END) AS m,
       |             MAX(CASE WHEN rn <= $k THEN h END) AS kth_min
       |      FROM r GROUP BY lang)
       |SELECT lang, m::BIGINT AS m, kth_min,
       |  (CASE WHEN m < $k THEN m
       |        ELSE ((${k - 1}::HUGEINT * 1152921504606846976::HUGEINT) // kth_min) END)::BIGINT AS est_distinct,
       |  exact_distinct::BIGINT AS exact_distinct
       |FROM a ORDER BY lang""".stripMargin

  // ----- HyperLogLog distinct sketch (t47) -------------------------------

  /** HLL register width: the 60-bit hash splits into an 8-bit register
    * index (m = 256 registers) and a 52-bit suffix whose leading-zero rank
    * feeds the register. */
  private val HllM = 256

  /** alpha_256 as the EXACT rational of the published bias constant
    * (Flajolet et al. 2007: alpha_m = 0.7213 / (1 + 1.079/m) for m >= 128):
    * 0.7213/(1 + 1.079/256) = 7213·256000 / (10000·257079) = num/den after
    * scaling — kept rational so the estimator is one integral division in
    * both engines, never a float. */
  private val HllAlphaNum = 1846528L  // 7213 * 256
  private val HllAlphaDen = 2570790L  // 257079 * 10

  /** Linear-counting table, driver-computed ONCE and interpolated into BOTH
    * pipelines (the [[Hashing.minHashParams]] discipline): entry V (1-based)
    * is floor(m · ln(m/V) · 1e6) — only 256 possible inputs exist, so the
    * transcendental never evaluates inside either engine and the gate stays
    * bit-deterministic. */
  private val HllLcTab: IndexedSeq[Long] =
    (1 to HllM).map(v => math.floor(HllM * math.log(HllM.toDouble / v) * 1e6).toLong)

  /** Per-language HLL registers over distinct tokens: `(lang, j, mj)` where
    * j = hash60 % 256 and mj = max over the group's hashes of
    * rho(hash div 256) (rho = leading-zero rank of the 52-bit suffix,
    * derived integer-exactly from the binary-string length both engines'
    * `bin()` gives; a zero suffix ranks 53). Registers are the WHOLE sketch
    * state — two sketches merge by pairwise register MAX (spec-asserted
    * merge(a,b) == sketch(a ∪ b)), which is what makes HLL the
    * approx_count_distinct shape every production engine ships: 256 bytes
    * per group, re-addable across daily increments like t14's KMV but at
    * FIXED size regardless of k. */
  def hllRegisters(docs: DataFrame): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs
      .repartition(par)
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
      .select(col("lang"), Hashing.hash60(col("tok")).as("h"))
      // HLL is duplicate-insensitive (max-agg); the pre-distinct mirrors
      // t14's measured win — the production sketch-only path feeds raw
      // values straight into the max without it
      .distinct()
      .withColumn("j", expr("h % 256"))
      .withColumn("w", expr("h DIV 256"))
      .withColumn("rho",
        when(col("w") === 0, lit(53)).otherwise(lit(53) - length(bin(col("w")))))
      .groupBy("lang", "j").agg(max("rho").as("mj"))
  }

  /** Folds committed registers into the per-language estimate:
    * `(lang, v_zero, s_scaled, est_e6)` — v_zero = empty registers,
    * s_scaled = sum over ALL m registers of 2^(40 − min(mj, 40)) (the
    * indicator sum Z^-1, carried scaled by 2^40 so it is one BIGINT), and
    * est_e6 = the bias-corrected estimate ·1e6: the small-range branch
    * (raw ≤ 2.5m with empty registers — Flajolet's linear counting) reads
    * [[HllLcTab]], the normal branch is the alpha-rational floor division
    * in DECIMAL(38,0). Every column integer-exact in both engines. */
  def hllEstimate(regs: DataFrame): DataFrame = {
    val pow40 = 1L << 40
    val num = BigInt(HllAlphaNum) * HllM * HllM * pow40 * 1000000L // ~1.3e29 < 10^38
    val rawE6 = s"CAST($num AS DECIMAL(38,0)) div (CAST($HllAlphaDen AS DECIMAL(38,0)) * s_scaled)"
    regs
      .groupBy("lang").agg(
        count(lit(1)).as("n_hit"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - least(mj, 40) AS INT))")).as("s_hit"))
      .withColumn("v_zero", lit(HllM.toLong) - col("n_hit"))
      .withColumn("s_scaled", col("s_hit") + col("v_zero") * lit(pow40))
      .withColumn("est_e6",
        when(col("v_zero") > 0 && expr(rawE6) <= lit(640000000L),
          element_at(typedLit(HllLcTab), col("v_zero").cast("int")))
          // BIGINT output: est·1e6 fits a long up to ~9.2e12 distinct —
          // beyond any group cardinality a 60-bit-hash sketch can resolve
          .otherwise(expr(rawE6)).cast("long"))
      .select("lang", "v_zero", "s_scaled", "est_e6")
  }

  /** Pairwise-register-MAX merge — [[hllRegisters]]' merge law
    * (merge(a, b) == sketch(a ∪ b), spec-asserted), which is what lets
    * daily increments maintain the corpus-wide sketch without rescans. */
  def mergeHllRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("lang", "j").agg(max("mj").as("mj"))

  /** [[hllEstimate]]'s readout joined with the exact distinct-token count
    * over `docs` as the error witness (the t14 discipline — production
    * drops the exact column and keeps the 256-byte state).
    * `(lang, v_zero, s_scaled, est_e6, exact_distinct)`. */
  def hllWithExact(docs: DataFrame, regs: DataFrame): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val exact = docs
      .repartition(par)
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
      .distinct()
      .groupBy("lang").agg(count(lit(1)).as("exact_distinct"))
    hllEstimate(regs)
      .join(broadcast(exact), "lang") // langs-sized
      .select("lang", "v_zero", "s_scaled", "est_e6", "exact_distinct")
      .orderBy("lang")
  }

  /** The t47 gate: [[hllRegisters]] → [[hllEstimate]] + exact witness. */
  def hllDistinctTokens(docs: DataFrame): DataFrame =
    hllWithExact(docs, hllRegisters(docs))

  /** DuckDB mirror of [[hllDistinctTokens]] — same hash split, same
    * bin()-derived rho, same scaled register sum, same rational-alpha
    * division, same interpolated linear-counting table. */
  def hllDistinctTokensSql(): String = {
    val pow40 = 1L << 40
    val num = BigInt(HllAlphaNum) * HllM * HllM * pow40 * 1000000L
    val raw = s"(CAST('$num' AS HUGEINT) // ($HllAlphaDen::HUGEINT * s_scaled))"
    val lcList = HllLcTab.mkString("[", ", ", "]")
    s"""WITH toks0 AS (SELECT lang, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS tok
       |               FROM documents),
       |toks AS (SELECT DISTINCT lang, tok FROM toks0),
       |hx AS (SELECT lang, ${Hashing.hash60Sql("tok")} AS h FROM toks),
       |rj AS (SELECT lang, h % 256 AS j,
       |              CASE WHEN h // 256 = 0 THEN 53 ELSE 53 - length(bin(h // 256)) END AS rho
       |       FROM hx),
       |regs AS (SELECT lang, j, MAX(rho) AS mj FROM rj GROUP BY 1, 2),
       |ag AS (SELECT lang, COUNT(*) AS n_hit,
       |              SUM(1::BIGINT << CAST(40 - LEAST(mj, 40) AS INT))::BIGINT AS s_hit
       |       FROM regs GROUP BY 1),
       |ex AS (SELECT lang, COUNT(*)::BIGINT AS exact_distinct FROM toks GROUP BY 1),
       |fin AS (SELECT ag.lang, (256 - n_hit)::BIGINT AS v_zero,
       |               (s_hit + (256 - n_hit) * ${pow40}::BIGINT)::BIGINT AS s_scaled,
       |               exact_distinct
       |        FROM ag JOIN ex ON ag.lang = ex.lang)
       |SELECT lang, v_zero, s_scaled,
       |       (CASE WHEN v_zero > 0 AND $raw <= 640000000 THEN ($lcList)[v_zero]
       |             ELSE $raw END)::BIGINT AS est_e6,
       |       exact_distinct
       |FROM fin ORDER BY lang""".stripMargin
  }

  /** DuckDB mirror of [[countMinHeavyHitters]]: the identical grid (same
    * (a,b) parameters inlined as VALUES) and min-of-counters readout.
    */
  def countMinHeavyHittersSql(depth: Int = 4, width: Int = 512, topN: Int = 20): String = {
    val P = Hashing.MinHashP
    val values = Hashing.minHashParams(depth).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
    s"""WITH toks AS (SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws FROM documents),
       |cnt AS (SELECT token, COUNT(*) AS cnt, ${Hashing.hash60Sql("token")} % $P AS fp
       |        FROM (SELECT u.t AS token FROM toks, UNNEST(ws) AS u(t)) GROUP BY token),
       |prm(d, a, b) AS (VALUES $values),
       |grid AS (SELECT d, ((a * fp + b) % $P) % $width AS bucket, SUM(cnt)::BIGINT AS c
       |         FROM cnt, prm GROUP BY 1, 2),
       |top AS (SELECT token, cnt, fp FROM cnt ORDER BY cnt DESC, token LIMIT $topN)
       |SELECT top.token, top.cnt AS exact_cnt, MIN(grid.c)::BIGINT AS cms_est
       |FROM top CROSS JOIN prm
       |JOIN grid ON grid.d = prm.d AND grid.bucket = ((prm.a * top.fp + prm.b) % $P) % $width
       |GROUP BY 1, 2 ORDER BY exact_cnt DESC, token""".stripMargin
  }
}
