package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Document deduplication for the training-data pipeline surface: exact,
  * shingle-Jaccard (exact similarity join), MinHash+LSH (the probabilistic
  * scale path), and SimHash with pigeonhole banding.
  *
  * Scale design: none of these ever materializes the all-pairs cross
  * product.
  *  - exact: one hash-shuffle, O(n).
  *  - jaccardPairs: prefix-filtered similarity join (Bayardo et al.'s
  *    AllPairs): each doc indexes only its |s| - ⌈τ|s|⌉ + 1 globally-rarest
  *    shingles; any pair with J ≥ τ provably shares an indexed shingle, so
  *    candidate generation joins only on RARE shingles — the frequent-token
  *    quadratic blowup of a naive inverted-index join never happens. Exact,
  *    not probabilistic.
  *  - minHashLsh: banded signature buckets (64 hashes, 32 bands × 2);
  *    signatures are built as 64 flat codegen'd min-aggregates with map-side
  *    partial aggregation, so the shuffle carries one 64-long row per doc
  *    per partition, not 64 rows per shingle.
  *  - simHashPairs: hamming-ball lookup via the pigeonhole split — distance
  *    ≤ k implies at least one of k+1 chunks equal, so bucketing by chunk
  *    value has exact recall (not probabilistic).
  */
object Dedup {

  /** Exact dedup: every doc mapped to the keeper (min doc_id) of its
    * identical-text group. `(doc_id, keeper, n_copies)` — `doc_id == keeper`
    * iff the doc is the group representative.
    */
  def exactDedup(docs: DataFrame): DataFrame = {
    val keyed = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val groups = keyed.groupBy("h")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
    keyed.join(groups, "h").select("doc_id", "keeper", "n_copies").orderBy("doc_id")
  }

  val exactDedupSql: String =
    """SELECT d.doc_id, g.keeper, g.n_copies
      |FROM documents d
      |JOIN (SELECT md5(text) AS h, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
      |      FROM documents GROUP BY 1) g ON md5(d.text) = g.h
      |ORDER BY d.doc_id""".stripMargin

  /** Streaming exact dedup: first-seen doc per content hash survives,
    * later copies are dropped — works identically on batch and streaming
    * DataFrames (state-store-backed on streams). On an unbounded stream
    * pair it with `withWatermark` + `dropDuplicatesWithinWatermark` when
    * re-emission after the horizon is acceptable; kept watermark-free here
    * because dedup keys for training corpora must hold forever.
    */
  def streamingExactDedup(docs: DataFrame): DataFrame =
    docs.withColumn("h", md5(col("text"))).dropDuplicates("h").drop("h")

  /** The horizon-bounded streaming dedup variant: duplicates are dropped
    * only while the first occurrence is younger than the watermark delay —
    * after that the key's state is EVICTED and a late copy would re-emit.
    * The right trade when state must stay bounded on an unbounded stream
    * and the upstream guarantees duplicates arrive close together (e.g.
    * at-least-once delivery retries); [[streamingExactDedup]] remains the
    * keep-keys-forever variant training corpora need. Cross-micro-batch
    * behavior asserted in `StreamingSpec`.
    */
  def streamingDedupWithinWatermark(docs: DataFrame, tsCol: String,
                                    delay: String): DataFrame =
    docs.withColumn("h", md5(col("text")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("h")
      .drop("h")

  /** One row per (doc_id, distinct 3-gram shingle), materialized once per
    * query (several downstream consumers). The input is re-spread across all
    * cores first: a single-row-group parquet file would otherwise run the
    * (CPU-heavy) tokenize+shingle explode on one thread.
    */
  private def shingleRows(docs: DataFrame): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs.repartition(par)
      .select(col("doc_id"),
        explode(TextOps.shingles3(TextOps.tokens(col("text")))).as("shingle"))
      .localCheckpoint(true)
  }

  /** One row per (doc_id, distinct 60-bit hashed shingle) for any
    * shingle-array expression — the shared shingle universe of
    * [[jaccardPairs]] (word 3-grams) and [[ngramJaccardPairs]] (char
    * n-grams). Hashing to longs (Broder's hashed-shingle convention,
    * [[Hashing.hash60]] — the same hash MinHash and the fingerprints use)
    * means every downstream exchange carries 8-byte longs instead of
    * strings; `array_distinct` AFTER the hash makes the per-doc set
    * identical to the oracle's `SELECT DISTINCT doc_id, hash`, so even an
    * (astronomically improbable) in-doc hash collision merges to one
    * element on BOTH engines — no divergence mode, and no extra shuffle
    * (the dedup is per-row). The input is re-spread across all cores
    * first: a single-row-group parquet file would otherwise run the
    * CPU-heavy shingle+md5 work on one thread.
    */
  private def hashedShingleRows(docs: DataFrame, shingleArr: Column): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    docs.repartition(par)
      .select(col("doc_id"),
        explode(array_distinct(transform(shingleArr, g => Hashing.hash60(g)))).as("shingle"))
      .localCheckpoint(true)
  }

  /** Candidate verification shared by [[jaccardPairs]] and
    * [[ngramJaccardPairs]]: sorted signature arrays per doc + the codegen'd
    * [[graft.functions.SortedIntersectCount]] two-pointer merge — ONE row
    * per candidate PAIR. The alternative (expand each pair by doc_a's
    * shingles and probe doc_b's index) costs |candidates| × avg-set-size
    * rows, which on corpora where even "rare" shingles are frequent is the
    * scale bottleneck; here the signature arrays shuffle only for docs that
    * actually appear in a candidate pair.
    */
  private def signatureVerifiedPairs(sh: DataFrame, thresholdMille: Int): DataFrame = {
    val sigs = sh.groupBy("doc_id").agg(sort_array(collect_list(col("shingle"))).as("sig"))
    val t = thresholdMille.toLong
    prefixCandidates(sh, thresholdMille)
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("siga")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sigb")), "doc_b")
      .withColumn("inter",
        graft.functions.VectorExpressions.sortedIntersectCount(col("siga"), col("sigb")))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("sza") + col("szb") - col("inter")).as("union_sz"))
      .filter(col("inter") * 1000L >= lit(t) * col("union_sz"))
      .withColumn("jaccard_1000", expr("inter * 1000 div union_sz"))
      .orderBy("doc_a", "doc_b")
  }

  /** Verify arbitrary candidate pairs (`doc_a, doc_b`) against the hashed
    * distinct shingle universe of `sh(doc_id, shingle: LONG)`: sorted
    * signature arrays + the codegen'd merge, set sizes read off the
    * signature lengths — same per-PAIR cost shape as
    * [[signatureVerifiedPairs]], for callers whose candidates don't come
    * from the AllPairs prefix machinery (MinHash+LSH).
    */
  private def verifyCandidatesBySignature(sh: DataFrame, candidates: DataFrame,
                                          thresholdMille: Int): DataFrame = {
    val sigs = sh.groupBy("doc_id").agg(sort_array(collect_set(col("shingle"))).as("sig"))
    val t = thresholdMille.toLong
    candidates
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("siga")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sigb")), "doc_b")
      .withColumn("inter",
        graft.functions.VectorExpressions.sortedIntersectCount(col("siga"), col("sigb")))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (size(col("siga")) + size(col("sigb")) - col("inter")).cast("long").as("union_sz"))
      .filter(col("inter") * 1000L >= lit(t) * col("union_sz"))
      .withColumn("jaccard_1000", expr("inter * 1000 div union_sz"))
      .orderBy("doc_a", "doc_b")
  }

  /** Builds a PERSISTED MinHash dedup index under `indexRoot` — the
    * "dedup today's shard against the historical corpus" production shape
    * (the s12/s19 commit-log-index discipline applied to d3's machinery):
    * two tables, `bands/` (doc_id, band, h0, h1 — the LSH bucket relation,
    * clustered by h0 so a probe's bucket join prunes files) and
    * `shingles/` (doc_id, 60-bit hashed distinct shingles — the verify
    * universe, doc-clustered). Returns the committed bands version.
    *
    * Scale shape: one corpus scan for signatures (numHashes flat
    * min-aggregates, map-side combined), one shuffle per table write;
    * nothing corpus-sized on the driver. The historical corpus is
    * re-tokenized NEVER again — a daily probe touches only its own shard
    * plus the banded bucket relation.
    */
  def buildDedupIndex(docs: DataFrame, indexRoot: String,
                      numHashes: Int = 64, rowsPerBand: Int = 2): Long = {
    val spark = docs.sparkSession
    val (sh, bands) = minHashBands(docs, numHashes, rowsPerBand)
    val hsh = sh.select(col("doc_id"), Hashing.hash60(col("shingle")).as("shingle"))
      .distinct()
    new graft.operators.CommitTable(spark, s"$indexRoot/shingles", "doc_id")
      .overwrite(hsh.repartition(col("doc_id")))
    val bv = new graft.operators.CommitTable(spark, s"$indexRoot/bands", "h0")
      .overwrite(bands.repartition(col("h0")))
    // pin shingles + bands as ONE atomic index version (a probe must
    // never verify against a shingle table the bands haven't caught up
    // with) — the family-wide IndexManifest discipline
    graft.operators.IndexManifest.commit(spark, indexRoot, Seq("shingles", "bands"))
    bv
  }

  /** Incrementally admits an accepted shard into the persisted dedup
    * index: one atomic append per table, no pass over the existing corpus
    * (caller contract: doc_ids disjoint from every earlier commit —
    * the appendIvfIndex discipline). MinHash signatures are per-document,
    * so an appended index EQUALS a full rebuild over the union. */
  def appendDedupIndex(docsNew: DataFrame, indexRoot: String,
                       numHashes: Int = 64, rowsPerBand: Int = 2): Long = {
    val spark = docsNew.sparkSession
    val (sh, bands) = minHashBands(docsNew, numHashes, rowsPerBand)
    val hsh = sh.select(col("doc_id"), Hashing.hash60(col("shingle")).as("shingle"))
      .distinct()
    new graft.operators.CommitTable(spark, s"$indexRoot/shingles", "doc_id")
      .append(hsh.repartition(col("doc_id")))
    val bv = new graft.operators.CommitTable(spark, s"$indexRoot/bands", "h0")
      .append(bands.repartition(col("h0")))
    graft.operators.IndexManifest.commit(spark, indexRoot, Seq("shingles", "bands"))
    bv
  }

  /** Probes a NEW shard against the persisted dedup index: the shard's
    * band signatures equi-join the committed bucket relation (never
    * shard×shard, never corpus×corpus), and the survivors are verified by
    * exact Jaccard — new-side sets from the shard's own shingles,
    * old-side sets from the committed shingle table SEMI-JOIN-PRUNED to
    * candidate doc_ids before the (doc-sized) set aggregation, so the
    * historical corpus contributes only the docs that actually collided.
    * Returns `(doc_new, doc_old, inter, union_sz, jaccard_1000)` — the
    * incoming documents that near-duplicate historical content, ordered.
    * Oracle: [[dedupAgainstIndexSql]] mirrors the ENTIRE pipeline (d3's
    * discipline: seeded params, banding, verify — not assumed-perfect
    * recall).
    */
  def dedupAgainstIndex(docsNew: DataFrame, indexRoot: String,
                        thresholdMille: Int = 500, numHashes: Int = 64,
                        rowsPerBand: Int = 2): DataFrame =
    dedupAgainstIndexPinned(docsNew, indexRoot, Map.empty,
      thresholdMille, numHashes, rowsPerBand)

  /** [[dedupAgainstIndex]] AT a committed INDEX VERSION (whole-index time
    * travel through [[graft.operators.IndexManifest]]): probe yesterday's
    * admitted corpus exactly — bands and shingles as they stood together.
    */
  def dedupAgainstIndexAt(docsNew: DataFrame, indexRoot: String, indexVersion: Long,
                          thresholdMille: Int = 500, numHashes: Int = 64,
                          rowsPerBand: Int = 2): DataFrame =
    dedupAgainstIndexPinned(docsNew, indexRoot,
      graft.operators.IndexManifest.resolve(docsNew.sparkSession, indexRoot, Some(indexVersion)),
      thresholdMille, numHashes, rowsPerBand)

  private def dedupAgainstIndexPinned(docsNew: DataFrame, indexRoot: String,
                                      at: Map[String, Long],
                                      thresholdMille: Int, numHashes: Int,
                                      rowsPerBand: Int): DataFrame = {
    val spark = docsNew.sparkSession
    val (shNew, bandsNew) = minHashBands(docsNew, numHashes, rowsPerBand)
    val bandsT = new graft.operators.CommitTable(spark, s"$indexRoot/bands", "h0")
    val idxBands = at.get("bands").map(bandsT.asOf).getOrElse(bandsT.read())
    val candidates = bandsNew.as("x")
      .join(idxBands.as("y"),
        col("x.band") === col("y.band") && col("x.h0") === col("y.h0") &&
          col("x.h1") === col("y.h1"))
      .select(col("x.doc_id").as("doc_new"), col("y.doc_id").as("doc_old"))
      .distinct()
      .localCheckpoint(true) // read three times: two sig joins + the semi-prune
    val t = thresholdMille.toLong
    val sigsNew = shNew
      .select(col("doc_id"), Hashing.hash60(col("shingle")).as("shingle"))
      .groupBy("doc_id").agg(sort_array(collect_set(col("shingle"))).as("sig"))
    val shinglesT = new graft.operators.CommitTable(spark, s"$indexRoot/shingles", "doc_id")
    val idxShingles = at.get("shingles").map(shinglesT.asOf).getOrElse(shinglesT.read())
    val sigsOld = idxShingles
      .join(candidates.select(col("doc_old").as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(sort_array(collect_set(col("shingle"))).as("sig"))
    candidates
      .join(sigsNew.select(col("doc_id").as("doc_new"), col("sig").as("siga")), "doc_new")
      .join(sigsOld.select(col("doc_id").as("doc_old"), col("sig").as("sigb")), "doc_old")
      .withColumn("inter",
        graft.functions.VectorExpressions.sortedIntersectCount(col("siga"), col("sigb")))
      .select(col("doc_new"), col("doc_old"), col("inter"),
        (size(col("siga")) + size(col("sigb")) - col("inter")).cast("long").as("union_sz"))
      .filter(col("inter") * 1000L >= lit(t) * col("union_sz"))
      .withColumn("jaccard_1000", expr("inter * 1000 div union_sz"))
      .orderBy("doc_new", "doc_old")
  }

  /** DuckDB mirror of [[dedupAgainstIndex]] over a side-split corpus:
    * signatures/bands for every doc from the same seeded pipeline as
    * [[minHashLshPairsSql]], the candidate join restricted to
    * (old side) × (new side), same exact-Jaccard verify. */
  def dedupAgainstIndexSql(oldFilter: String, newFilter: String,
                           thresholdMille: Int = 500, numHashes: Int = 64,
                           rowsPerBand: Int = 2,
                           src: String = "documents"): String = {
    require(rowsPerBand == 2, "banding below assumes r=2, like the operator")
    val P = Hashing.MinHashP
    val params = Hashing.minHashParams(numHashes)
    val minCols = params.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * x + $b) % $P) AS m$i"
    }.mkString(",\n|               ")
    val bandStructs = (0 until numHashes / rowsPerBand).map(j =>
      s"{'band': $j, 'h0': m${2 * j}, 'h1': m${2 * j + 1}}").mkString(", ")
    s"""WITH ${TextOps.shinglesSql(src)},
       |hx AS (SELECT doc_id, ${Hashing.hash60Sql("shingle")} % $P AS x FROM sh),
       |sigs AS (SELECT doc_id,
       |               $minCols
       |        FROM hx GROUP BY doc_id),
       |bands AS (SELECT doc_id, u['band'] AS band, u['h0'] AS h0, u['h1'] AS h1
       |          FROM sigs, UNNEST([$bandStructs]) AS t(u)),
       |cand AS (SELECT DISTINCT y.doc_id AS doc_new, x.doc_id AS doc_old
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.h0 = y.h0 AND x.h1 = y.h1
       |         WHERE (x.doc_id $oldFilter) AND (y.doc_id $newFilter)),
       |hsh AS (SELECT DISTINCT doc_id, ${Hashing.hash60Sql("shingle")} AS shingle FROM sh),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM hsh GROUP BY 1),
       |inter AS (SELECT c.doc_new, c.doc_old, COUNT(*) AS inter
       |          FROM cand c
       |          JOIN hsh a ON a.doc_id = c.doc_new
       |          JOIN hsh b ON b.doc_id = c.doc_old AND b.shingle = a.shingle
       |          GROUP BY 1, 2)
       |SELECT doc_new, doc_old, inter, sa.sz + sb.sz - inter AS union_sz,
       |       inter * 1000 // (sa.sz + sb.sz - inter) AS jaccard_1000
       |FROM inter JOIN sizes sa ON sa.doc_id = doc_new JOIN sizes sb ON sb.doc_id = doc_old
       |WHERE inter * 1000 >= $thresholdMille * (sa.sz + sb.sz - inter)
       |ORDER BY doc_new, doc_old""".stripMargin
  }

  /** Exact near-dup pairs by 3-gram-shingle Jaccard ≥ threshold (in
    * thousandths, so the cut is integer-exact in both engines):
    * `(doc_a, doc_b, inter, union_sz, jaccard_1000)`.
    *
    * Prefix filtering (see object doc): docs are matched only through their
    * `sz - ceil(τ·sz) + 1` rarest shingles (global (df, shingle) order). A
    * pair with overlap ≥ ⌈τ·sz⌉ cannot hide entirely outside a prefix of
    * that length (pigeonhole), so recall is exactly 1; candidates are then
    * verified by the per-PAIR sorted-signature merge (hashed shingles, see
    * [[hashedShingleRows]]/[[signatureVerifiedPairs]] — the round-6 verdict
    * retired the per-shared-shingle expansion join this path used before).
    * The DuckDB oracle mirrors only the shingle hash (it defines the set
    * universe) and stays the naive inverted-index join otherwise.
    */
  def jaccardPairs(docs: DataFrame, thresholdMille: Int = 500): DataFrame =
    signatureVerifiedPairs(
      hashedShingleRows(docs, TextOps.shingles3(TextOps.tokens(col("text")))), thresholdMille)

  /** Near-dup pairs by character `n`-gram Jaccard — the tokenizer-free
    * sibling of [[jaccardPairs]]: robust to scripts without word boundaries
    * and to whitespace/punctuation obfuscation, at a higher natural
    * threshold (char-grams of unrelated text overlap more than word
    * shingles do). Same output schema and the same hashed-shingle AllPairs
    * + PPJoin + sorted-signature-merge machinery; n defaults high because
    * short char-grams of templated text are shared so widely that no exact
    * filter can prune candidates (measured on the test corpus: n=5 leaves
    * 3M candidate pairs at sf0.1 for 256 true pairs; n=9 → 286k, identical
    * true-pair set).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 9, thresholdMille: Int = 700): DataFrame =
    signatureVerifiedPairs(
      hashedShingleRows(docs, TextOps.charNgrams(col("text"), n)), thresholdMille)

  /** Candidate generation shared by [[jaccardPairs]] and
    * [[ngramJaccardPairs]]: AllPairs prefix + length + PPJoin positional
    * filters over any `(doc_id, shingle)` set (string or hashed shingles) —
    * returns `(doc_a, doc_b, sza, szb)` with exact recall at J ≥ τ.
    */
  private def prefixCandidates(sh: DataFrame, thresholdMille: Int): DataFrame = {
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    // rank and set size in ONE window exchange (same partition key)
    val w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("sz", count(lit(1)).over(Window.partitionBy("doc_id")))
      .withColumn("rk", row_number().over(w))
      // ceil(τ·sz) in pure integers: (sz·t + 999) div 1000
      .filter(col("rk") <= col("sz") - expr(s"(sz * $thresholdMille + 999) div 1000") + 1)
      .select("doc_id", "shingle", "sz", "rk")
    val t = thresholdMille.toLong
    // PPJoin positional filter (Xiao et al.): a shared prefix shingle at
    // (1-based) global-order positions rka/rkb caps the overlap reachable
    // through it at 1 + min(sza-rka, szb-rkb); J ≥ τ needs overlap ≥
    // ceil(t·(sza+szb)/(1000+t)). Applied per shared-shingle row BEFORE the
    // distinct: exact, because for a qualifying pair the FIRST shared prefix
    // shingle has no common shingles before it on either side, so its bound
    // is ≥ the true overlap and that row always survives. Cuts verify volume
    // on corpora where even "rare" shingles are frequent (tiny vocabularies).
    val posBound = (lit(1L) + least(col("x.sz") - col("x.rk"), col("y.sz") - col("y.rk"))) *
      lit(1000L + t) >= lit(t) * (col("x.sz") + col("y.sz"))
    val candidates = prefix.as("x")
      .join(prefix.as("y"), col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id") &&
        // length filter: J ≥ τ needs τ·|x| ≤ |y| and τ·|y| ≤ |x|
        col("y.sz") * 1000L >= lit(t) * col("x.sz") && col("x.sz") * 1000L >= lit(t) * col("y.sz") &&
        posBound)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.sz").as("sza"), col("y.sz").as("szb"))
      .distinct()
    candidates
  }

  /** DuckDB oracle for [[jaccardPairs]] — deliberately the NAIVE all-pairs
    * inverted-index join (no prefix/positional filters, no signature
    * arrays), so the oracle stays independent of the candidate and verify
    * machinery it checks; only the 60-bit shingle hash (+ the post-hash
    * DISTINCT, mirroring [[hashedShingleRows]]' `array_distinct`) is
    * shared, because it defines the operator's set universe.
    */
  def jaccardPairsSql(thresholdMille: Int = 500): String =
    s"""WITH ${TextOps.shinglesSql(cte = "rawsh")},
       |sh AS (SELECT DISTINCT doc_id, ${Hashing.hash60Sql("shingle")} AS shingle FROM rawsh),
       |${jaccardVerifySql(thresholdMille)}""".stripMargin

  /** DuckDB oracle for [[ngramJaccardPairs]] — same naive-join discipline
    * as [[jaccardPairsSql]], over hashed char n-grams.
    */
  def ngramJaccardPairsSql(n: Int = 9, thresholdMille: Int = 700): String =
    s"""WITH ${TextOps.charNgramsSql(n, cte = "rawsh")},
       |sh AS (SELECT DISTINCT doc_id, ${Hashing.hash60Sql("shingle")} AS shingle FROM rawsh),
       |${jaccardVerifySql(thresholdMille)}""".stripMargin

  /** Shared size/intersect/threshold tail over a `sh(doc_id, shingle)` CTE. */
  private def jaccardVerifySql(thresholdMille: Int): String =
    s"""sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter, sa.sz + sb.sz - inter AS union_sz,
       |       inter * 1000 // (sa.sz + sb.sz - inter) AS jaccard_1000
       |FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE inter * 1000 >= $thresholdMille * (sa.sz + sb.sz - inter)
       |ORDER BY doc_a, doc_b""".stripMargin

  /** MinHash+LSH near-dup pairs: 64 minhashes per doc, banded 32×2; bucket
    * collisions become candidates; candidates are verified with the exact
    * Jaccard cut. Output schema/semantics identical to [[jaccardPairs]] —
    * LSH recall at J ≥ 0.5 with r=2,b=32 is 1 - (1-J²)³² ≈ 0.9999+, so the
    * verified output equals the exact join (checked by the same oracle), at
    * a fraction of the candidate-pair cost on a large corpus.
    */
  /** Edit-distance enrichment of the MinHash+LSH near-dup pairs: each pair
    * stamped with the Levenshtein distance between the two docs'
    * lowercased 40-char prefixes — the char-level confirmation signal
    * set-based Jaccard can't give (token reorder vs real character drift).
    * `(doc_a, doc_b, lev40)`.
    *
    * Scale shape: the quadratic-looking scalar (Levenshtein is O(m·n) per
    * pair) runs only on the LSH-pruned PAIR set, never corpus-wide, and
    * only on fixed-width prefixes — the standard fuzzy-join recipe:
    * cheap banded candidates, expensive exact scalar on candidates only.
    * Both engines implement the same classic DP, so the distances are
    * deterministic integers.
    */
  def lshEditDistances(docs: DataFrame, prefixLen: Int = 40,
                       thresholdMille: Int = 500): DataFrame = {
    val pre = docs.select(col("doc_id"), substring(lower(col("text")), 1, prefixLen).as("pre"))
    minHashLshPairs(docs, thresholdMille)
      .select("doc_a", "doc_b")
      .join(pre.select(col("doc_id").as("doc_a"), col("pre").as("pa")), "doc_a")
      .join(pre.select(col("doc_id").as("doc_b"), col("pre").as("pb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), levenshtein(col("pa"), col("pb")).cast("long").as("lev40"))
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB mirror of [[lshEditDistances]]: the full seeded LSH pipeline
    * nested as a CTE, then the same prefix Levenshtein.
    */
  def lshEditDistancesSql(prefixLen: Int = 40, thresholdMille: Int = 500): String =
    s"""WITH pairs AS (
       |${minHashLshPairsSql(thresholdMille)}
       |),
       |pre AS (SELECT doc_id, substr(lower(text), 1, $prefixLen) AS pre FROM documents)
       |SELECT p.doc_a, p.doc_b, levenshtein(a.pre, b.pre)::BIGINT AS lev40
       |FROM pairs p JOIN pre a ON a.doc_id = p.doc_a JOIN pre b ON b.doc_id = p.doc_b
       |ORDER BY p.doc_a, p.doc_b""".stripMargin

  /** Banded MinHash signatures over the word-3-gram shingle universe,
    * shared by [[minHashLshPairs]] (self-join dedup) and
    * [[fuzzyDecontaminate]] (train×eval cross join): returns the shingle
    * relation and the per-(doc, band) bucket keys.
    */
  private def minHashBands(docs: DataFrame, numHashes: Int,
                           rowsPerBand: Int): (DataFrame, DataFrame) = {
    require(numHashes % rowsPerBand == 0, "numHashes must be divisible by rowsPerBand")
    require(rowsPerBand == 2, "banding below assumes r=2 (two sig entries per band)")
    val P = Hashing.MinHashP
    val params = Hashing.minHashParams(numHashes)
    val sh = shingleRows(docs)
    // one codegen'd min-aggregate per hash function: the signature shuffles
    // as 64 flat long columns with map-side partial aggregation (an
    // interpreted higher-order `transform` or a 64x explode is 30-100x
    // slower here — measured)
    val hashCols = params.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("x") + lit(b)) % P).as(s"m$i")
    }
    val sigs = sh
      .select(col("doc_id"), (Hashing.hash60(col("shingle")) % P).as("x"))
      .groupBy("doc_id").agg(hashCols.head, hashCols.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
      .localCheckpoint(true)
    val bandArr = array((0 until numHashes / rowsPerBand).map(j => lit(j)): _*)
    val bands = sigs.select(col("doc_id"), explode(bandArr).as("band"), col("sig"))
      .select(col("doc_id"), col("band"),
        element_at(col("sig"), col("band") * 2 + 1).as("h0"),
        element_at(col("sig"), col("band") * 2 + 2).as("h1"))
    (sh, bands)
  }

  /** Near-dup KEEPER rule over the MinHash band universe — the ingestion
    * dedup shape pipelines run BEFORE training: a document is KEPT iff it
    * CLAIMS at least one of its 32 band signatures (claim = first to
    * present it; stream order here = ascending doc_id, so a band's
    * claimant is its minimum doc_id). A document all of whose bands were
    * already claimed contributes no novel signature — a near-dup of
    * earlier content — and is dropped. This is the streaming-feasible
    * relaxation of clustering dedup (d2/d3 need candidate PAIRS; the
    * keeper rule needs one state lookup per band), and unlike a greedy
    * "drop on any collision" scan it is ORDER-DETERMINISTIC: claims are
    * per-band minima, so batch and an id-ordered stream converge to the
    * same answer (cross-micro-batch half via [[streamingNearDupClaims]],
    * asserted in StreamingSpec). `(doc_id, n_claimed)` for keepers.
    *
    * Scale shape: one corpus scan for signatures (64 flat min-aggs, map-
    * side combined), one (band,h0,h1)-keyed min shuffle, one
    * claimant-keyed count — no joins, no candidate blowup; streaming
    * state = one long per distinct band signature.
    */
  def nearDupKeepers(docs: DataFrame): DataFrame = {
    val (_, bands) = minHashBands(docs, 64, 2)
    bands.groupBy("band", "h0", "h1").agg(min("doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_claimed"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[nearDupKeepers]]: the same seeded signature/band
    * derivation as [[minHashLshPairsSql]], then per-band MIN claims rolled
    * up per claimant. */
  def nearDupKeepersSql(numHashes: Int = 64, src: String = "documents"): String = {
    val P = Hashing.MinHashP
    val params = Hashing.minHashParams(numHashes)
    val minCols = params.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * x + $b) % $P) AS m$i"
    }.mkString(",\n|               ")
    val bandStructs = (0 until numHashes / 2).map(j =>
      s"{'band': $j, 'h0': m${2 * j}, 'h1': m${2 * j + 1}}").mkString(", ")
    s"""WITH ${TextOps.shinglesSql(src)},
       |hx AS (SELECT doc_id, ${Hashing.hash60Sql("shingle")} % $P AS x FROM sh),
       |sigs AS (SELECT doc_id,
       |               $minCols
       |        FROM hx GROUP BY doc_id),
       |bands AS (SELECT doc_id, u['band'] AS band, u['h0'] AS h0, u['h1'] AS h1
       |          FROM sigs, UNNEST([$bandStructs]) AS t(u)),
       |claims AS (SELECT band, h0, h1, MIN(doc_id) AS doc_id FROM bands GROUP BY 1, 2, 3)
       |SELECT doc_id, COUNT(*)::BIGINT AS n_claimed FROM claims GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** First-seen band claims as a STREAMING stateful operator: keyed by the
    * band signature, state = the claiming doc_id. The first micro-batch to
    * present a signature claims it with that batch's minimum doc_id, and
    * the claim NEVER changes — so with arrival order aligned to doc_id
    * (the ingest contract the batch tier assumes) the converged claim set
    * equals [[nearDupKeepers]]'s per-band minima exactly (asserted in
    * StreamingSpec, including that a later re-arrival cannot steal a
    * claim). The signature is derived PER ROW (higher-order folds over the
    * doc's own shingles instead of the batch path's 64 flat min-aggs over
    * an explode) because streaming forbids an aggregation upstream of
    * mapGroupsWithState — the computed minima are identical, only the plan
    * shape differs.
    */
  def streamingNearDupClaims(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val P = Hashing.MinHashP
    val numHashes = 64
    val params = Hashing.minHashParams(numHashes)
    val shCol = array_distinct(TextOps.shingles3(TextOps.tokens(col("text"))))
    val hxCol = transform(shCol, s => Hashing.hash60(s) % P)
    val sigCols = params.zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(col("hx"), x => (lit(a) * x + lit(b)) % P)).as(s"m$i")
    }
    val bandArr = array((0 until numHashes / 2).map(j => lit(j)): _*)
    val bands = docs.withColumn("hx", hxCol).filter(size(col("hx")) > 0)
      .select(col("doc_id") +: sigCols: _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
      .select(col("doc_id"), explode(bandArr).as("band"), col("sig"))
      .select(col("band"),
        element_at(col("sig"), col("band") * 2 + 1).as("h0"),
        element_at(col("sig"), col("band") * 2 + 2).as("h1"),
        col("doc_id"))
    bands.as[(Int, Long, Long, Long)]
      .groupByKey { case (b, h0, h1, _) => (b, h0, h1) }
      .mapGroupsWithState[Long, (Int, Long, Long, Long)](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        case ((b, h0, h1), rows, state) =>
          val c = if (state.exists) state.get
          else { val m = rows.map(_._4).min; state.update(m); m }
          (b, h0, h1, c)
      }
      .toDF("band", "h0", "h1", "claimant")
  }

  def minHashLshPairs(docs: DataFrame, thresholdMille: Int = 500,
                      numHashes: Int = 64, rowsPerBand: Int = 2): DataFrame = {
    val (sh, bands) = minHashBands(docs, numHashes, rowsPerBand)
    val candidates = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.h0") === col("y.h0") &&
          col("x.h1") === col("y.h1") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // verify on the 60-bit hashed distinct shingle universe (same merge
    // verify the AllPairs paths use; the per-shared-shingle expansion join
    // is gone from the repo entirely) — the MinHash signatures above keep
    // their own string->hash60%P universe unchanged
    verifyCandidatesBySignature(
      sh.select(col("doc_id"), Hashing.hash60(col("shingle")).as("shingle")),
      candidates, thresholdMille)
  }

  /** DuckDB mirror of [[minHashLshPairs]] — the ENTIRE pipeline (same seeded
    * universal-hash params, same 60-bit shingle hash, same banding, same
    * exact-Jaccard verify), not the exact similarity join it approximates.
    * Gating d3 against the exact join assumed perfect LSH recall, which a
    * regenerated corpus with a pair at the threshold could nondeterministically
    * break (round-2 ADVICE); this oracle is deterministic equality by
    * construction, so the gate now tests the operator's real semantics.
    */
  def minHashLshPairsSql(thresholdMille: Int = 500, numHashes: Int = 64,
                         rowsPerBand: Int = 2,
                         src: String = "documents"): String = {
    require(rowsPerBand == 2, "banding below assumes r=2, like the operator")
    val P = Hashing.MinHashP
    val params = Hashing.minHashParams(numHashes)
    val minCols = params.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * x + $b) % $P) AS m$i"
    }.mkString(",\n|               ")
    val bandStructs = (0 until numHashes / rowsPerBand).map(j =>
      s"{'band': $j, 'h0': m${2 * j}, 'h1': m${2 * j + 1}}").mkString(", ")
    s"""WITH ${TextOps.shinglesSql(src)},
       |hx AS (SELECT doc_id, ${Hashing.hash60Sql("shingle")} % $P AS x FROM sh),
       |sigs AS (SELECT doc_id,
       |               $minCols
       |        FROM hx GROUP BY doc_id),
       |bands AS (SELECT doc_id, u['band'] AS band, u['h0'] AS h0, u['h1'] AS h1
       |          FROM sigs, UNNEST([$bandStructs]) AS t(u)),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.h0 = y.h0 AND x.h1 = y.h1 AND x.doc_id < y.doc_id),
       |hsh AS (SELECT DISTINCT doc_id, ${Hashing.hash60Sql("shingle")} AS shingle FROM sh),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM hsh GROUP BY 1),
       |inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |          FROM cand c
       |          JOIN hsh a ON a.doc_id = c.doc_a
       |          JOIN hsh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter, sa.sz + sb.sz - inter AS union_sz,
       |       inter * 1000 // (sa.sz + sb.sz - inter) AS jaccard_1000
       |FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE inter * 1000 >= $thresholdMille * (sa.sz + sb.sz - inter)
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** FUZZY benchmark decontamination (the near-dup sibling of
    * `TextOps.decontaminate`'s shingle-overlap form): train docs whose
    * Jaccard similarity to ANY eval doc reaches the threshold, found by
    * joining the TRAIN side's banded MinHash buckets against the EVAL
    * side's only — never train×train. At 100 TB the eval slice is
    * benchmark-sized, so its bucket relation is tiny and the candidate
    * join is train-pass-shaped; the paraphrased/lightly-edited leakage
    * exact n-gram overlap misses is exactly what this catches.
    * `(train_doc, eval_doc, jaccard_1000)`; eval membership = doc_id ≡ 0
    * mod `evalMod` (deterministic, like t18).
    */
  def fuzzyDecontaminate(docs: DataFrame, evalMod: Int = 29,
                         thresholdMille: Int = 500, numHashes: Int = 64,
                         rowsPerBand: Int = 2): DataFrame = {
    val (sh, bands) = minHashBands(docs, numHashes, rowsPerBand)
    val train = bands.filter(col("doc_id") % evalMod =!= 0)
    val eval = bands.filter(col("doc_id") % evalMod === 0)
    val candidates = train.as("x")
      .join(eval.as("y"),
        col("x.band") === col("y.band") && col("x.h0") === col("y.h0") &&
          col("x.h1") === col("y.h1"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    verifyCandidatesBySignature(
      sh.select(col("doc_id"), Hashing.hash60(col("shingle")).as("shingle")),
      candidates, thresholdMille)
      .select(col("doc_a").as("train_doc"), col("doc_b").as("eval_doc"),
        col("jaccard_1000"))
      .orderBy("train_doc", "eval_doc")
  }

  /** DuckDB mirror of [[fuzzyDecontaminate]] — the full seeded pipeline
    * with the train×eval candidate join.
    */
  def fuzzyDecontaminateSql(evalMod: Int = 29, thresholdMille: Int = 500,
                            numHashes: Int = 64, rowsPerBand: Int = 2,
                            src: String = "documents"): String = {
    require(rowsPerBand == 2, "banding below assumes r=2, like the operator")
    val P = Hashing.MinHashP
    val params = Hashing.minHashParams(numHashes)
    val minCols = params.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * x + $b) % $P) AS m$i"
    }.mkString(",\n|               ")
    val bandStructs = (0 until numHashes / rowsPerBand).map(j =>
      s"{'band': $j, 'h0': m${2 * j}, 'h1': m${2 * j + 1}}").mkString(", ")
    s"""WITH ${TextOps.shinglesSql(src)},
       |hx AS (SELECT doc_id, ${Hashing.hash60Sql("shingle")} % $P AS x FROM sh),
       |sigs AS (SELECT doc_id,
       |               $minCols
       |        FROM hx GROUP BY doc_id),
       |bands AS (SELECT doc_id, u['band'] AS band, u['h0'] AS h0, u['h1'] AS h1
       |          FROM sigs, UNNEST([$bandStructs]) AS t(u)),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.h0 = y.h0 AND x.h1 = y.h1
       |         WHERE x.doc_id % $evalMod <> 0 AND y.doc_id % $evalMod = 0),
       |hsh AS (SELECT DISTINCT doc_id, ${Hashing.hash60Sql("shingle")} AS shingle FROM sh),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM hsh GROUP BY 1),
       |inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |          FROM cand c
       |          JOIN hsh a ON a.doc_id = c.doc_a
       |          JOIN hsh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
       |          GROUP BY 1, 2)
       |SELECT doc_a AS train_doc, doc_b AS eval_doc,
       |       inter * 1000 // (sa.sz + sb.sz - inter) AS jaccard_1000
       |FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
       |WHERE inter * 1000 >= $thresholdMille * (sa.sz + sb.sz - inter)
       |ORDER BY train_doc, eval_doc""".stripMargin
  }

  /** Near-dup RESOLUTION: the pair detectors say which docs match; this says
    * what to keep. Connected components over the MinHash+LSH near-dup pair
    * graph label every clustered doc with its cluster's min doc_id as the
    * keeper — transitive closure matters because near-dup is not transitive
    * (A≈B, B≈C may hold while A≉C, yet one representative should survive
    * for the whole chain). `(doc_id, keeper)` for docs in ≥1 pair; docs with
    * no near-dup are implicitly their own keeper.
    *
    * Scale shape: the pair graph is tiny relative to the corpus (it IS the
    * dup set), so the GraphX CC runs on edges already reduced by LSH — the
    * corpus-sized work all happened in the banded candidate join.
    */
  def nearDupClusters(docs: DataFrame, thresholdMille: Int = 500): DataFrame = {
    val pairs = minHashLshPairs(docs, thresholdMille)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    graft.graph.Analytics.connectedComponents(pairs)
      .select(col("vertex").as("doc_id"), col("component").as("keeper"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[nearDupClusters]]: the full seeded LSH pair pipeline
    * nested as a CTE, then a reachability closure labeling each doc with the
    * min reachable id (≡ undirected CC min-id).
    */
  def nearDupClustersSql(thresholdMille: Int = 500): String =
    s"""WITH RECURSIVE pairs AS (
       |${minHashLshPairsSql(thresholdMille)}
       |),
       |ue AS (SELECT doc_a AS a, doc_b AS b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
       |v AS (SELECT a AS vertex FROM ue UNION SELECT b AS vertex FROM ue),
       |r(vertex, reach) AS (
       |  SELECT vertex, vertex FROM v
       |  UNION
       |  SELECT r.vertex, ue.b FROM r JOIN ue ON ue.a = r.reach)
       |SELECT vertex AS doc_id, MIN(reach) AS keeper FROM r GROUP BY vertex ORDER BY doc_id""".stripMargin

  /** Near-dup resolution with a QUALITY keeper policy: [[nearDupClusters]]
    * labels each cluster, but min-id survivorship is an arbitrary choice —
    * production curation keeps each cluster's BEST member. Policy here:
    * most tokens, ties to the smaller id (swap in any score column the
    * same way). One row per cluster:
    * `(cluster, n_members, keeper_id, keeper_tokens)`.
    *
    * Scale shape: the cluster labeling is d6's machinery (corpus work
    * stays in the banded LSH join, CC runs on the pair graph only); the
    * policy itself is one argmax struct-aggregate over pair-graph-sized
    * rows — `max(struct(score, -id, id))` folds map-side, no per-cluster
    * window sort.
    */
  def qualityKeepers(docs: DataFrame, thresholdMille: Int = 500): DataFrame = {
    val clusters = nearDupClusters(docs, thresholdMille)
      .select(col("doc_id"), col("keeper").as("cluster"))
    val toks = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_toks"))
    clusters.join(toks, "doc_id")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("n_toks"), (-col("doc_id")).as("nid"), col("doc_id").as("id"))).as("m"))
      .select(col("cluster"), col("n_members"),
        col("m.id").as("keeper_id"), col("m.n_toks").as("keeper_tokens"))
      .orderBy("cluster")
  }

  /** DuckDB mirror of [[qualityKeepers]]: the d6 closure nested as a
    * subquery, same tokenization, rank mirror of the argmax policy.
    */
  def qualityKeepersSql(thresholdMille: Int = 500): String =
    s"""WITH c AS (SELECT doc_id, keeper AS cluster FROM (
       |${nearDupClustersSql(thresholdMille)}
       |)),
       |t AS (SELECT doc_id,
       |             len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))::BIGINT AS n_toks
       |      FROM documents),
       |j AS (SELECT c.cluster, c.doc_id, t.n_toks FROM c JOIN t USING (doc_id)),
       |r AS (SELECT cluster, doc_id, n_toks,
       |             row_number() OVER (PARTITION BY cluster ORDER BY n_toks DESC, doc_id) AS rn,
       |             COUNT(*) OVER (PARTITION BY cluster) AS n_members
       |      FROM j)
       |SELECT cluster, n_members::BIGINT AS n_members, doc_id AS keeper_id, n_toks AS keeper_tokens
       |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin

  /** 60-bit SimHash per doc over distinct tokens: bit i of the signature is
    * set iff Σ_tokens (2·bit_i(hash60(token)) - 1) > 0. `(doc_id, simhash)`.
    */
  def simHash(docs: DataFrame): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // one codegen'd sum per bit (same flat-column trick as the MinHash
    // signature): 60 narrow aggregates beat a 60x explode by a wide margin
    val bitSums = (0 until 60).map(i =>
      sum((shiftright(col("h"), i) % 2) * 2 - 1).as(s"s$i"))
    val packed = (0 until 60).map(i =>
      when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L)).reduce(_ + _)
    docs.repartition(par)
      .select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      .select(col("doc_id"), Hashing.hash60(col("tok")).as("h"))
      .groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
  }

  /** SQL mirror of [[simHash]] as a CTE named `sim`. */
  private def simHashSqlCte: String =
    s"""tok AS (SELECT DISTINCT doc_id, t AS tok
       |        FROM (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS t FROM documents)),
       |bits AS (SELECT doc_id, bit, 1::BIGINT << bit AS pw,
       |                ((${Hashing.hash60Sql("tok")} // (1::BIGINT << bit)) % 2) * 2 - 1 AS sign
       |         FROM tok, UNNEST(range(0, 60)) AS u(bit)),
       |sums AS (SELECT doc_id, bit, pw, SUM(sign) AS s FROM bits GROUP BY 1, 2, 3),
       |sim AS (SELECT doc_id, SUM(CASE WHEN s > 0 THEN pw ELSE 0 END)::BIGINT AS simhash FROM sums GROUP BY 1)""".stripMargin

  /** Near-dup pairs with SimHash hamming distance ≤ `maxHamming`:
    * `(doc_a, doc_b, hamming)`.
    *
    * The signature is split into `maxHamming + 1` chunks; by pigeonhole any
    * pair within the distance bound agrees on ≥ 1 whole chunk, so bucketing
    * by (chunk index, chunk value) has exact recall — the verification xor
    * then drops false positives. No all-pairs product at any point.
    */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val width = (60 + chunks - 1) / chunks
    val sim = simHash(docs).localCheckpoint(true) // small: one long per doc
    val chunkArr = array((0 until chunks).map(c =>
      struct(lit(c).as("c"), lit(c * width).as("off"))): _*)
    val buckets = sim.select(col("doc_id"), col("simhash"), explode(chunkArr).as("k"))
      .select(col("doc_id"), col("simhash"), col("k.c").as("c"),
        expr(s"(simhash div shiftleft(1L, k.off)) % ${1L << width}").as("v"))
    val cand = buckets.as("x")
      .join(buckets.as("y"), col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("x.simhash").as("ha"),
        col("y.doc_id").as("doc_b"), col("y.simhash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB oracle for [[simHashPairs]]: all-pairs xor popcount (fine at
    * oracle scale; the Spark side is the one that must scale).
    */
  def simHashPairsSql(maxHamming: Int = 3): String =
    s"""WITH $simHashSqlCte
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
       |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin

  /** ASYMMETRIC containment pairs over winnowing fingerprints (the
    * MOSS-shaped "doc A is mostly inside doc B" detector): for each doc
    * pair sharing fingerprints, `cont_a_1000 = |F_a ∩ F_b| · 1000 / |F_a|`
    * and symmetrically for b — a SMALL doc quoted wholesale by a large one
    * scores near 1000 on its own side while the pair's Jaccard (what
    * d2/d3/d7 threshold on) stays low, which is exactly why near-dup
    * filtering misses quote-plagiarism and why this is a separate operator.
    * Emits pairs with `greatest(cont_a, cont_b) >= minCont1000`:
    * `(doc_a, doc_b, shared, cont_a_1000, cont_b_1000)`.
    *
    * Fingerprints with document frequency > `maxDf` are dropped from BOTH
    * numerator and denominator (mirrored by the oracle): a fingerprint
    * shared by half the corpus carries no containment signal, and the cap
    * is what bounds the inverted-index join — candidate volume is
    * Σ_f df(f)² ≤ maxDf · |kept rows|, linear in the corpus, never the
    * all-pairs product. The winnowed fingerprint set is already a
    * sublinear sample of each doc (that is winnowing's point), so `kept`
    * is corpus-sized × small constant.
    */
  def containmentPairs(docs: DataFrame, maxDf: Int = 20,
                       minCont1000: Long = 500L): DataFrame = {
    val fp = TextOps.winnowingFingerprints(docs)
      .localCheckpoint(true) // consumed by the df filter AND the pair join
    val keep = fp.groupBy("fingerprint").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("fingerprint")
    val kept = fp.join(keep, Seq("fingerprint"), "left_semi")
      .localCheckpoint(true) // consumed by sizes and both join sides
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val shared = kept.select(col("fingerprint"), col("doc_id").as("doc_a"))
      .join(kept.select(col("fingerprint"), col("doc_id").as("doc_b")), "fingerprint")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .withColumn("cont_a_1000", expr("shared * 1000 div n_a"))
      .withColumn("cont_b_1000", expr("shared * 1000 div n_b"))
      .filter(greatest(col("cont_a_1000"), col("cont_b_1000")) >= minCont1000)
      .select("doc_a", "doc_b", "shared", "cont_a_1000", "cont_b_1000")
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB mirror of [[containmentPairs]] over the same winnowing
    * derivation ([[TextOps.winnowingSql]]), df cap and integer-thousandths
    * containment included.
    */
  /** Block-level exact dedup — the sub-document flavor the doc-level
    * operators above cannot see: boilerplate (headers, license text,
    * navigation chrome) repeats ACROSS otherwise-distinct documents, and
    * the ExactSubstr result (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better") is that removing such repeats beats
    * doc-level dedup alone. Full suffix-array ExactSubstr is
    * sequence-global; the scalable block approximation used here tiles
    * each doc into consecutive `blockLen`-token blocks (trailing partial
    * block dropped) and keeps only each distinct block's FIRST occurrence
    * in corpus order (doc_id, block index) — intra-doc repeats beyond the
    * first count as duplicates too.
    *
    * Returns per-doc retention (docs with ≥1 full block):
    * `(doc_id, n_blocks, n_kept, kept_1000)`.
    *
    * Scale shape: first-occurrence is `min(struct(doc_id, bi))` per block
    * hash — an ALGEBRAIC aggregate, so map-side partial aggregation
    * collapses a block repeated millions of times (the boilerplate case —
    * exactly where a row_number-over-hash window would sort one giant
    * skewed group) to one row per partition before the shuffle; the
    * per-doc rollup then shuffles doc-sized partials. Two hash exchanges
    * total, no windows, no driver state.
    */
  def blockDedup(docs: DataFrame, blockLen: Int = 10): DataFrame = {
    require(blockLen >= 1, s"blockLen must be positive, got $blockLen")
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val nb = (size(col("ws")) / blockLen).cast("int")
    val blk = docs.repartition(par)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      // guard: sequence(0, -1) would DESCEND, not return empty
      .withColumn("bis", when(nb >= 1, sequence(lit(0), nb - 1))
        .otherwise(array().cast("array<int>")))
      .select(col("doc_id"), posexplode(transform(col("bis"), i =>
        Hashing.hash60(concat_ws(" ", slice(col("ws"), i * blockLen + 1, lit(blockLen)))))))
      .select(col("doc_id"), col("pos").cast("int").as("bi"), col("col").as("h"))
    val first = blk.groupBy("h")
      .agg(min(struct(col("doc_id"), col("bi"))).as("f"))
    blk.join(first, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(struct(col("doc_id"), col("bi")) === col("f"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("kept_1000", expr("n_kept * 1000 div n_blocks"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[blockDedup]]: same tiling, same first-occurrence
    * rule (row_number over corpus order stands in for the min-struct).
    */
  def blockDedupSql(blockLen: Int = 10): String =
    s"""WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws FROM documents),
       |blk AS (SELECT doc_id, i AS bi,
       |               ${Hashing.hash60Sql(s"array_to_string(ws[(i*$blockLen+1):(i*$blockLen+$blockLen)], ' ')")} AS h
       |        FROM toks, UNNEST(range(0, len(ws) // $blockLen)) AS u(i)),
       |fst AS (SELECT doc_id, bi,
       |               ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, bi) AS rn FROM blk)
       |SELECT doc_id, COUNT(*) AS n_blocks,
       |       SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |       (SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) * 1000 // COUNT(*))::BIGINT AS kept_1000
       |FROM fst GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def containmentPairsSql(maxDf: Int = 20, minCont1000: Long = 500L): String =
    s"""WITH fp AS (SELECT doc_id, fingerprint FROM (${TextOps.winnowingSql()})),
       |keep AS (SELECT fingerprint FROM fp GROUP BY 1 HAVING COUNT(*) <= $maxDf),
       |kept AS (SELECT doc_id, fingerprint FROM fp
       |         WHERE fingerprint IN (SELECT fingerprint FROM keep)),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY 1),
       |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::BIGINT AS shared
       |           FROM kept a JOIN kept b
       |             ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2)
       |SELECT doc_a, doc_b, shared,
       |       (shared * 1000 // na.n)::BIGINT AS cont_a_1000,
       |       (shared * 1000 // nb.n)::BIGINT AS cont_b_1000
       |FROM shared JOIN sizes na ON na.doc_id = doc_a
       |            JOIN sizes nb ON nb.doc_id = doc_b
       |WHERE greatest(shared * 1000 // na.n, shared * 1000 // nb.n) >= $minCont1000
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Exact duplicated-SPAN detection: every k-token SLIDING window is
    * hashed; a window whose hash repeats anywhere in the corpus (any doc,
    * any alignment — including elsewhere in the same doc) marks its k
    * covered token positions, and overlapping marked windows merge into
    * maximal spans via gaps-and-islands. This is the span-granular exact
    * substring dedup of the "Deduplicating Training Data Makes Language
    * Models Better" pipeline (Lee et al. 2022), where [[blockDedup]]'s
    * disjoint tiles miss any duplicate that straddles a tile boundary or
    * sits at a shifted alignment. One row per doc with ≥ k tokens:
    * `(doc_id, n_tokens, n_dup_windows, n_dup_tokens, n_spans)` — all
    * exact integers (n_dup_tokens = union of covered positions, n_spans =
    * maximal merged spans).
    *
    * Scale shape: the window relation is one row per token (same volume
    * class as every shingle pass here); the repeated-hash filter is one
    * 8-byte-key aggregate; coverage expansion multiplies only the
    * DUPLICATED windows by k before a per-doc distinct+islands — on a
    * mostly-clean corpus that's a small fraction of the token stream. The
    * islands row_number partitions per doc (each partition one doc's
    * duplicated positions — bounded by doc length, never corpus-sized).
    */
  def spanDedup(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2, s"window length must be >= 2, got $k")
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val toks = docs.repartition(par)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= k)
      .localCheckpoint(true)
    val win = toks
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("ws")) - k),
        i => Hashing.hash60(concat_ws(" ", slice(col("ws"), i + 1, lit(k)))))))
      .select(col("doc_id"), col("pos").cast("long").as("s"), col("col").as("h"))
      .localCheckpoint(true)
    val dupH = win.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("h")
    val dupStarts = win.join(dupH, Seq("h"), "left_semi")
    val cov = dupStarts
      .select(col("doc_id"), explode(sequence(col("s"), col("s") + (k - 1))).as("p"))
      .distinct()
    val isl = cov.withColumn("grp",
      col("p") - expr("row_number() OVER (PARTITION BY doc_id ORDER BY p)"))
    val spans = isl.groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_tokens"), countDistinct(col("grp")).as("n_spans"))
    val nwin = dupStarts.groupBy("doc_id").agg(count(lit(1)).as("n_dup_windows"))
    toks.select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"))
      .join(nwin, Seq("doc_id"), "left_outer")
      .join(spans, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_dup_windows", "n_dup_tokens", "n_spans"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[spanDedup]]: same tokenization, same sliding
    * windows and hash, same repeated-hash rule, same islands merge.
    */
  def spanDedupSql(k: Int = 8): String =
    s"""WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws
       |              FROM documents),
       |base AS (SELECT doc_id, len(ws)::BIGINT AS n_tokens, ws FROM toks WHERE len(ws) >= $k),
       |win AS (SELECT doc_id, i AS s,
       |               ${Hashing.hash60Sql(s"array_to_string(ws[(i+1):(i+$k)], ' ')")} AS h
       |        FROM base, UNNEST(range(0, len(ws) - $k + 1)) AS u(i)),
       |duph AS (SELECT h FROM win GROUP BY h HAVING COUNT(*) > 1),
       |ds AS (SELECT win.doc_id, win.s FROM win JOIN duph USING (h)),
       |cov AS (SELECT DISTINCT doc_id, s + j AS p FROM ds, UNNEST(range(0, $k)) AS v(j)),
       |isl AS (SELECT doc_id, p, p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS grp FROM cov),
       |sp AS (SELECT doc_id, COUNT(*)::BIGINT AS n_dup_tokens, COUNT(DISTINCT grp)::BIGINT AS n_spans
       |       FROM isl GROUP BY doc_id),
       |nw AS (SELECT doc_id, COUNT(*)::BIGINT AS n_dup_windows FROM ds GROUP BY doc_id)
       |SELECT b.doc_id, b.n_tokens,
       |       COALESCE(nw.n_dup_windows, 0)::BIGINT AS n_dup_windows,
       |       COALESCE(sp.n_dup_tokens, 0)::BIGINT AS n_dup_tokens,
       |       COALESCE(sp.n_spans, 0)::BIGINT AS n_spans
       |FROM base b LEFT JOIN nw ON nw.doc_id = b.doc_id
       |            LEFT JOIN sp ON sp.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin

  /** The SCRUB half of [[spanDedup]]: produce the CLEANED corpus. The
    * canonical occurrence of each duplicated window — the one at the
    * smallest `(doc_id, start)` corpus-wide — keeps its text; every OTHER
    * occurrence's k covered positions are removed, and each document is
    * reassembled from its surviving tokens in order. This is what the
    * Lee et al. 2022 pipeline actually ships downstream (the duplicated
    * text is cut, one copy survives); [[spanDedup]] is its profiling
    * report. Removal rule on overlaps: a position covered by ANY
    * non-canonical duplicated window is removed, even if a canonical
    * window also covers it — deterministic and mirrored.
    *
    * Returns one row per tokenizable doc (ALL of them, not just the ≥ k
    * ones — short docs pass through untouched): `(doc_id, n_tokens,
    * n_removed, cleaned_text)`, where `cleaned_text` is the
    * space-joined surviving TOKEN stream (the tokenizer's lowercased
    * normalization, like every token-level op here).
    *
    * Scale shape: [[spanDedup]]'s exchanges plus one `(h)`-keyed
    * window rank (the canonical pick), one anti-join of the token
    * stream against the removed-position set, and a per-DOC ordered
    * reassembly (array_sort over one doc's surviving tokens — doc-sized,
    * never corpus-sized).
    */
  def spanScrub(docs: DataFrame, k: Int = 8): DataFrame = {
    require(k >= 2, s"window length must be >= 2, got $k")
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val toks = docs.repartition(par)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 1)
      .localCheckpoint(true)
    val win = toks.filter(size(col("ws")) >= k)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("ws")) - k),
        i => Hashing.hash60(concat_ws(" ", slice(col("ws"), i + 1, lit(k)))))))
      .select(col("doc_id"), col("pos").cast("long").as("s"), col("col").as("h"))
    val dupH = win.groupBy("h").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("h")
    val dupOcc = win.join(dupH, Seq("h"), "left_semi")
    // canonical occurrence per hash = smallest (doc_id, s); the rest are
    // cut. Deliberately NOT a per-h rank window (the round-11 documented
    // skew residual): a corpus-wide hot window — one phrase duplicated
    // millions of times — would concentrate its whole occurrence list in
    // ONE partition for the window sort. A min-of-struct aggregate is
    // map-side combined (each partition ships one candidate per h, however
    // hot), and the cut test becomes an h-keyed equi-join that AQE's
    // skew-join splitting handles; same rows survive by construction
    // (non-min ≡ rn > 1).
    val canon = dupOcc.groupBy("h")
      .agg(min(struct(col("doc_id"), col("s"))).as("c"))
    val cut = dupOcc.join(canon, "h")
      .filter(col("doc_id") =!= col("c.doc_id") || col("s") =!= col("c.s"))
    val removed = cut
      .select(col("doc_id"), explode(sequence(col("s"), col("s") + (k - 1))).as("p"))
      .distinct()
      .localCheckpoint(true) // read twice: the anti-join and the removal count
    val nRem = removed.groupBy("doc_id").agg(count(lit(1)).as("n_removed"))
    val kept = toks
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("p", "tok")))
      .withColumn("p", col("p").cast("long"))
      .join(removed, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("p"), col("tok")))),
        s => s.getField("tok")), " ").as("cleaned_text"))
    toks.select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"))
      .join(nRem, Seq("doc_id"), "left_outer")
      .join(kept, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("n_removed"))
      .na.fill("", Seq("cleaned_text"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[spanScrub]]: same windows/hash/canonical-rank
    * rule, reassembly via position-ordered string_agg.
    */
  def spanScrubSql(k: Int = 8, src: String = "documents"): String =
    s"""WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws
       |              FROM $src),
       |base AS (SELECT doc_id, ws, len(ws)::BIGINT AS n_tokens FROM toks WHERE len(ws) >= 1),
       |win AS (SELECT doc_id, i AS s,
       |               ${Hashing.hash60Sql(s"array_to_string(ws[(i+1):(i+$k)], ' ')")} AS h
       |        FROM base, UNNEST(range(0, len(ws) - $k + 1)) AS u(i)
       |        WHERE len(ws) >= $k),
       |duph AS (SELECT h FROM win GROUP BY h HAVING COUNT(*) > 1),
       |occ AS (SELECT win.doc_id, win.s, win.h,
       |               ROW_NUMBER() OVER (PARTITION BY win.h ORDER BY win.doc_id, win.s) AS rn
       |        FROM win JOIN duph USING (h)),
       |rem AS (SELECT DISTINCT doc_id, s + j AS p
       |        FROM occ, UNNEST(range(0, $k)) AS v(j) WHERE rn > 1),
       |nr AS (SELECT doc_id, COUNT(*)::BIGINT AS n_removed FROM rem GROUP BY doc_id),
       |tok AS (SELECT doc_id, i AS p, ws[i+1] AS t
       |        FROM base, UNNEST(range(0, len(ws))) AS u(i)),
       |kept AS (SELECT tok.doc_id, string_agg(tok.t, ' ' ORDER BY tok.p) AS cleaned_text
       |         FROM tok ANTI JOIN rem ON rem.doc_id = tok.doc_id AND rem.p = tok.p
       |         GROUP BY tok.doc_id)
       |SELECT b.doc_id, b.n_tokens,
       |       COALESCE(nr.n_removed, 0)::BIGINT AS n_removed,
       |       COALESCE(kept.cleaned_text, '') AS cleaned_text
       |FROM base b LEFT JOIN nr ON nr.doc_id = b.doc_id
       |            LEFT JOIN kept ON kept.doc_id = b.doc_id
       |ORDER BY b.doc_id""".stripMargin
}
