package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over the document corpus — the BM25 ranking function
  * (Robertson–Spärck Jones probabilistic relevance framework, the default
  * lexical scorer in Lucene/Elasticsearch and the standard sparse half of
  * hybrid RAG retrieval). Absent from the reference, which has no string
  * processing at all (its only "text" is the ≤256-char reply buffer,
  * `utils.h:5`).
  *
  * Determinism contract (the t32/s9 discipline): document frequencies for
  * the QUERY terms are exact integers from one corpus aggregate; the
  * per-term idf — the only transcendental — is computed ONCE on the driver
  * from those exact integers and quantized to integer micro-units, then
  * broadcast as literals. Everything downstream (length norm, tf
  * saturation, the score itself) is pure integer arithmetic with explicit
  * truncating division, so the distributed sum is exact and the DuckDB
  * oracle (static SQL + an independently-derived idf VALUES table) matches
  * bit-for-bit.
  */
object Retrieval {

  /** Micro-quantized Robertson idf from exact integer (n, df):
    * `rint(1e6 · ln(1 + (n − df + 0.5)/(df + 0.5)))`. Shared contract
    * formula — the sequential oracle mirror restates it from its own
    * independently-counted df.
    */
  def idfE6(n: Long, df: Long): Long =
    math.rint(1e6 * math.log(1.0 + (n - df + 0.5) / (df + 0.5))).toLong

  /** Top-`k` documents by BM25 score for `queryTerms`.
    *
    * Score (per matched term, then summed):
    * `idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))` with the usual
    * k1 = 1.2, b = 0.75 — here carried in integer thousandths
    * (`k1E3`/`bE3`) so every factor is exact:
    *  - `norm_e3 = (1000−bE3) + bE3·dl·n div sumDl` (dl/avgdl = dl·n/sumDl);
    *  - `ratio_e6 = tf·(k1E3+1000)·1e9 div (tf·1e6 + k1E3·norm_e3)` — the
    *    one truncating division per matched term IS the contract, mirrored
    *    by DuckDB `//` (all operands positive, so the two engines' integer
    *    division agree);
    *  - `score_e6 = Σ_t idf_e6·ratio_e6 div 1e6`.
    *
    * Returns `(doc_id, score_e6)`, ordered score-desc then doc_id (a total
    * order), limited to `k` — plans as `TakeOrderedAndProject` (per-
    * partition top-k, no global sort materialization).
    *
    * Scale shape: one corpus pass for `(n, sumDl)` (2 longs to the driver),
    * one aggregate for query-term dfs (≤ |q| rows to the driver, by
    * contract), one scoring pass whose explode is pre-filtered to query
    * terms only (the exchanged stream is |docs|·|q| at most, not the token
    * stream), joined against a broadcast |q|-row idf table. Nothing
    * corpus-sized is collected at any n. Long-overflow headroom: the widest
    * product is `tf·(k1E3+1000)·1e9`, safe to tf ≤ 4·10⁶ tokens of one term
    * in one document (loudly guarded).
    */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
               k1E3: Long = 1200L, bE3: Long = 750L): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms, "bm25TopK: queryTerms must be distinct")
    require(queryTerms.forall(t => t.nonEmpty && t.matches("[a-z0-9]+")),
      s"bm25TopK: query terms must be lowercase alphanumeric tokens, got $queryTerms")
    require(k > 0, s"bm25TopK: k must be positive, got $k")
    require(k1E3 >= 0 && bE3 >= 0 && bE3 <= 1000,
      s"bm25TopK: k1E3 must be >= 0 and bE3 in [0, 1000], got k1E3=$k1E3 bE3=$bE3")
    val spark = docs.sparkSession
    import spark.implicits._

    val base = docs
      .select(col("doc_id").cast("long").as("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .withColumn("dl", size(col("ws")).cast("long"))
      .filter(col("dl") > 0)
      .localCheckpoint(true) // stats, df, and tf passes all read it
    // exact corpus stats — 1 row by construction
    val statsRow = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("sum_dl")).head()
    val n = statsRow.getLong(0)
    val sumDl = statsRow.getLong(1)
    require(n > 0, "bm25TopK: corpus has no non-empty documents")

    // exact df per query term (distinct docs containing it) — ≤ |q| rows by contract
    val qlit = typedLit(queryTerms)
    val dfMap: Map[String, Long] = base
      .select(explode(array_intersect(array_distinct(col("ws")), qlit)).as("t"))
      .groupBy("t").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver-quantized idf literals (df = 0 terms keep a row: harmless —
    // they can never match a tf row — but the mirror must agree on the set)
    val idf = queryTerms.map(t => (t, idfE6(n, dfMap.getOrElse(t, 0L))))
    val idfDf = broadcast(idf.toDF("t", "idf_e6"))

    val tf = base
      .select(col("doc_id"), col("dl"),
        explode(filter(col("ws"), w => w.isin(queryTerms: _*))).as("t"))
      .groupBy("doc_id", "dl", "t").agg(count(lit(1)).as("tf"))
    tf.join(idfDf, "t")
      .withColumn("norm_e3",
        lit(1000L - bE3) + expr(s"$bE3 * dl * $n div $sumDl"))
      // one truncating division per (doc, term): tf·(k1+1)/(tf + k1·norm)
      // in micro-units; operands all positive so Spark `div` ≡ DuckDB `//`
      .withColumn("ratio_e6",
        expr(s"tf * ${k1E3 + 1000L} * 1000000000 div (tf * 1000000 + $k1E3 * norm_e3)"))
      .groupBy("doc_id")
      .agg(sum(col("idf_e6") * col("ratio_e6")).as("s_e12"))
      .select(col("doc_id"), expr("s_e12 div 1000000").as("score_e6"))
      .orderBy(desc("score_e6"), col("doc_id"))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    * merge a sparse (BM25) and a dense (embedding) candidate list into one
    * hybrid ranking without score calibration: each list contributes
    * `1/(rrfK + rank)` for every document it ranked, and documents on
    * several lists accumulate. Carried in exact integer micro-units
    * (`1e6 div (rrfK + rank)` per appearance, summed as longs), so the
    * fused ordering is bit-deterministic and the oracle restates the same
    * arithmetic. Inputs are `(doc_id, rank)` frames (rank 1-based);
    * returns the top `k` as `(doc_id, rrf_e6)`, ordered score-desc then
    * doc_id.
    *
    * Scale shape: the inputs are RESULT lists (top-k-sized by their
    * producers' contracts, never corpus-sized), so the fusion is a union
    * + one tiny aggregate — the expensive work lives in the retrievers,
    * which scale independently ([[bm25TopK]]'s filtered scan, the ANN
    * family's index paths).
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int = 10, rrfK: Long = 60L): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: need at least one ranked list")
    require(k > 0 && rrfK >= 0, s"rrfFuse: bad k=$k / rrfK=$rrfK")
    lists.map(_.select(col("doc_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
      .select(col("doc_id"), expr(s"1000000 div ($rrfK + rank)").as("c_e6"))
      .groupBy("doc_id").agg(sum(col("c_e6")).as("rrf_e6"))
      .orderBy(desc("rrf_e6"), col("doc_id"))
      .limit(k)
  }

  /** DuckDB mirror of [[bm25TopK]]: static SQL over the same tokenizer and
    * integer arithmetic, with the idf table supplied as VALUES — derived
    * INDEPENDENTLY by [[SequentialCorpus.bm25Idf]] (own tokenizer, own df
    * counts, the shared [[idfE6]] contract formula).
    */
  def bm25TopKSql(idf: Seq[(String, Long)], k: Int = 10,
                  k1E3: Long = 1200L, bE3: Long = 750L): String = {
    require(idf.nonEmpty, "bm25TopKSql: idf table must be non-empty")
    val inList = idf.map { case (t, _) => s"'$t'" }.mkString(", ")
    val values = idf.map { case (t, v) => s"('$t', $v)" }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws
       |  FROM documents),
       |base AS (SELECT doc_id, ws, len(ws)::BIGINT AS dl FROM toks WHERE len(ws) > 0),
       |stats AS (SELECT COUNT(*)::BIGINT AS n, SUM(dl)::BIGINT AS sum_dl FROM base),
       |idf AS (SELECT t, idf_e6::BIGINT AS idf_e6 FROM (VALUES $values) AS v(t, idf_e6)),
       |tf AS (
       |  SELECT doc_id, dl, u.t, COUNT(*)::BIGINT AS tf
       |  FROM base, UNNEST(ws) AS u(t) WHERE u.t IN ($inList)
       |  GROUP BY 1, 2, 3),
       |scored AS (
       |  SELECT doc_id,
       |         SUM(idf_e6 * (tf * ${k1E3 + 1000L} * 1000000000 //
       |             (tf * 1000000 + $k1E3 * ((1000 - $bE3) + $bE3 * dl * n // sum_dl))))::BIGINT AS s_e12
       |  FROM tf JOIN idf USING (t) CROSS JOIN stats
       |  GROUP BY doc_id)
       |SELECT doc_id, s_e12 // 1000000 AS score_e6
       |FROM scored ORDER BY score_e6 DESC, doc_id LIMIT $k""".stripMargin
  }
}
