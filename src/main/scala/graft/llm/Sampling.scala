package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic sampling / split operators for training-data pipelines.
  *
  * Both operators are CONTENT-ADDRESSED (md5-derived, no `rand()`): a row's
  * split or shuffle position depends only on its key (+ seed), never on
  * partitioning, task retries, or row order. That is the property a corpus
  * pipeline actually needs — a document must never migrate from val to train
  * because the cluster re-ran a stage, and adding new rows must never
  * reassign existing ones. `rand(seed)`-based sampling has neither property
  * under retries/repartitioning.
  *
  * Everything is codegen'd built-ins over [[Hashing.hash60]], the md5-derived
  * hash both Spark and DuckDB compute identically — so the declared queries
  * (`t8`, `t9`) are hash-exact against the oracle, not rows-only.
  */
object Sampling {

  /** Per-row hash bucket in `[0, buckets)` for the given key column. */
  def hashBucket(key: Column, buckets: Int): Column =
    Hashing.hash60(key.cast("string")) % buckets

  /** Assign each row a named split by hash bucket: `splits` are
    * `(name, weight)` pairs; a row lands in split i when its bucket (mod the
    * weight total) falls in i's cumulative weight range. Appends a `split`
    * column.
    *
    * Stability guarantees (from content addressing): per-key assignment is
    * reproducible across runs/engines, independent of row order, and
    * invariant under corpus growth. Split SIZES are only approximately
    * proportional to weights (hash uniformity), exactly like hash-mod
    * sharding.
    */
  def assignSplits(df: DataFrame, keyCol: String,
                   splits: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5)): DataFrame = {
    validateSplits(splits)
    requireFreshColumn(df, "split", "assignSplits")
    val total = splits.map(_._2).sum
    val b = hashBucket(col(keyCol), total)
    val cuts = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    // CASE b < cut1 THEN name1 WHEN b < cut2 THEN name2 … (last arm = ELSE)
    val caseCol = splits.init.zip(cuts.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cut)) =>
        Some(acc.fold(when(b < cut, name))(_.when(b < cut, name)))
    }.fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    df.withColumn("split", caseCol)
  }

  /** Shared contract for `splits`: non-empty, positive weights, and
    * distinct identifier-like names (the names are embedded into the SQL
    * mirror as string literals, so they are restricted up front rather
    * than escaped).
    */
  private def validateSplits(splits: Seq[(String, Int)]): Unit = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splits need positive weights, got $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split names must be distinct, got ${splits.map(_._1)}")
    require(splits.forall(_._1.matches("[A-Za-z0-9_.-]+")),
      s"split names must be identifier-like, got ${splits.map(_._1)}")
  }

  /** DuckDB fragment computing the same split name over key expression `x`. */
  def assignSplitsSql(x: String,
                      splits: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5)): String = {
    validateSplits(splits)
    val total = splits.map(_._2).sum
    val b = s"${Hashing.hash60Sql(s"($x)::VARCHAR")} % $total"
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    "CASE " + splits.init.zip(cuts.init).map { case ((name, _), cut) =>
      s"WHEN $b < $cut THEN '$name'"
    }.mkString(" ") + s" ELSE '${splits.last._1}' END"
  }

  /** Seeded deterministic shuffle key: uniform pseudo-random order derived
    * from the key + seed. `orderBy(shuffleKey(...), key)` is a reproducible
    * epoch shuffle — same order on every run, new seed = fresh order.
    */
  def shuffleKey(key: Column, seed: Long): Column =
    Hashing.hash60(concat(key.cast("string"), lit(s"#$seed")))

  /** Deterministic uniform sample of `k` rows: the first `k` under the
    * seeded shuffle order. Plans as TakeOrderedAndProject — per-partition
    * top-k then a k-row merge on the driver, no global sort materialization,
    * so it scales like any top-k (the 100 TB way to cut a fixed-size
    * evaluation slice).
    */
  def deterministicSample(df: DataFrame, keyCol: String, k: Int, seed: Long): DataFrame = {
    requireFreshColumn(df, "shuffle_key", "deterministicSample")
    df.withColumn("shuffle_key", shuffleKey(col(keyCol), seed))
      .orderBy(col("shuffle_key"), col(keyCol))
      .limit(k)
  }

  /** Deterministic STRATIFIED sample: the first `k` rows per stratum under
    * the seeded shuffle order — the balanced-mix cut (k docs per language /
    * source / domain) a multilingual training pipeline needs, where a
    * uniform global sample would mirror the corpus' skew. Same
    * content-addressing guarantees as [[deterministicSample]]; plans as one
    * hash exchange on the stratum + per-group sort with a rank cutoff
    * (WindowGroupLimit pushes the k-cut below the shuffle, so no stratum is
    * ever fully materialized).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
                       k: Int, seed: Long): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireFreshColumn(df, "shuffle_key", "stratifiedSample")
    requireFreshColumn(df, "stratum_rank", "stratifiedSample")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("shuffle_key"), col(keyCol))
    df.withColumn("shuffle_key", shuffleKey(col(keyCol), seed))
      .withColumn("stratum_rank", row_number().over(w).cast("long"))
      .filter(col("stratum_rank") <= k)
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis 2006,
    * "A-ES"): each row gets priority `u^(1/w)` with `u` uniform in (0, 1],
    * and the top-`k` by priority IS a weighted sample — inclusion
    * probability proportional to weight, no sequential reservoir needed,
    * so the classic streaming algorithm becomes a per-stratum top-k (the
    * quality-weighted corpus cut: sample documents proportional to length
    * / quality score / dedup-cluster mass).
    *
    * Deterministic + engine-portable, same discipline as [[shuffleKey]]:
    * `u = (hash60(key#seed) + 1) / 2^60` (content-addressed — retries and
    * repartitioning cannot change the sample), and the priority is
    * QUANTIZED to a 1e-9 grain `BIGINT` (`priority_q`) before ranking: the
    * one float step (`pow`) is not bit-identical across libm
    * implementations, and the coarse integer grain absorbs last-ulp
    * differences (a flip needs `pow` results ~1e-16 apart from a rounding
    * boundary — ~1e-7 probability per row — while quantized ties just fall
    * to the `key` tie-break). Weights must be positive; rejected row-wise
    * (`raise_error`), since a zero weight would make `1/w` infinite.
    *
    * Scale: one window sort per stratum with the rank cutoff pushed below
    * the shuffle (WindowGroupLimit) — [[stratifiedSample]]'s plan with a
    * computed ordering column; nothing corpus-sized survives the cut.
    */
  def weightedSample(df: DataFrame, strataCol: String, keyCol: String,
                     weightCol: String, k: Int, seed: Long): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireFreshColumn(df, "priority_q", "weightedSample")
    requireFreshColumn(df, "stratum_rank", "weightedSample")
    val u = (Hashing.hash60(concat(col(keyCol).cast("string"), lit(s"#$seed"))) + 1)
      .cast("double") / lit(math.pow(2, 60))
    val wOk = when(col(weightCol) <= 0,
        raise_error(format_string(
          "weightedSample: weight must be positive, got %s", col(weightCol).cast("string"))))
      .otherwise(col(weightCol).cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col("priority_q").desc, col(keyCol))
    df.withColumn("priority_q", round(pow(u, lit(1.0) / wOk) * 1e9).cast("long"))
      .withColumn("stratum_rank", row_number().over(w).cast("long"))
      .filter(col("stratum_rank") <= k)
  }

  /** DuckDB fragment for [[weightedSample]]'s `priority_q` over key
    * expression `x` and weight expression `wx` — same hash, same 2^60
    * scale, same 1e-9 quantization.
    */
  def weightedPrioritySql(x: String, wx: String, seed: Long): String =
    s"round(pow((${Hashing.hash60Sql(s"($x)::VARCHAR || '#$seed'")} + 1)::DOUBLE / 1152921504606846976.0, " +
      s"1.0 / ($wx)::DOUBLE) * 1e9)::BIGINT"

  /** `withColumn` silently REPLACES an existing column of the same name —
    * reject appended-name collisions up front (same contract as
    * `TemporalJoins.asofJoin`'s output-name check) instead of quietly
    * clobbering caller data.
    */
  /** Token-budget domain mixture — the corpus-mixing primitive a training
    * run needs when domains are skewed: each source contributes documents
    * in seeded-shuffle order until its TOKEN budget is met, so the output
    * mix hits the per-domain target no matter how lopsided the raw corpus
    * is (a uniform sample would mirror the skew; a doc-count cap ignores
    * document length). A document is admitted iff its cumulative token sum
    * within the source stays ≤ budget — the boundary doc that would
    * overflow is dropped, an exact integer rule both engines agree on.
    * Same content-addressing as [[deterministicSample]]: retries and
    * repartitioning cannot change the admitted set. `(source, n_docs,
    * sum_tokens)` per source.
    *
    * Scale shape: one scan computing (source, priority, n_tokens), one
    * source-keyed window (running integer sum), one rollup. The window
    * sorts each source's rows once; the skewed giants are exactly the
    * sources the budget truncates hardest, and nothing corpus-sized
    * outlives the cut.
    */
  def tokenBudgetMixture(docs: DataFrame, budgetPerSource: Long = 2000L,
                         seed: Long = 11L): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
      shuffleKey(col("doc_id"), seed).as("pri"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("pri", "doc_id")
    toks.withColumn("cum", sum("n_tokens").over(w))
      .filter(col("cum") <= budgetPerSource)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
      .orderBy("source")
  }

  /** DuckDB mirror of [[tokenBudgetMixture]] — same tokenizer, same seeded
    * priority, same integer running-sum admission. */
  def tokenBudgetMixtureSql(budgetPerSource: Long = 2000L, seed: Long = 11L): String =
    s"""WITH toks AS (SELECT doc_id, source,
       |       len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))::BIGINT AS n_tokens,
       |       ${shuffleKeySql("doc_id", seed)} AS pri
       |     FROM documents),
       |c AS (SELECT source, n_tokens,
       |        SUM(n_tokens) OVER (PARTITION BY source ORDER BY pri, doc_id
       |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM toks)
       |SELECT source, COUNT(*)::BIGINT AS n_docs, SUM(n_tokens)::BIGINT AS sum_tokens
       |FROM c WHERE cum <= $budgetPerSource GROUP BY 1 ORDER BY 1""".stripMargin

  private def requireFreshColumn(df: DataFrame, name: String, op: String): Unit =
    require(!df.columns.contains(name),
      s"$op appends a '$name' column but the input already has one — rename it first")

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection with
    * Importance Resampling"): score every document by how much more likely
    * its hashed bag-of-words is under a TARGET distribution (here: the
    * `lang = targetLang` slice) than under the raw corpus — the
    * data-selection primitive that upsamples target-like documents from a
    * huge raw pool. `weight = Σ_tokens log p̂_target(bucket)/p̂_raw(bucket)`
    * with Laplace-smoothed bucket unigram models over `buckets` hashed
    * features.
    *
    * Determinism contract: bucket counts are EXACT integers (one corpus
    * pass, bucket-sized aggregate); the per-bucket log-ratios are computed
    * ONCE on the driver and quantized to integer micro-units (`lam_e6` —
    * the s9 broadcast-codebook-literal discipline, so no distributed float
    * sum exists anywhere); a document's score is then the exact integer
    * `Σ count·lam_e6` — order-independent. The oracle is a fully
    * independent sequential mirror (own tokenizer, own md5 hash, own
    * counts, same contract formula). Returns `(doc_id, dsir_e6)`; docs
    * with zero tokens are absent (they carry no evidence either way).
    *
    * Scale shape: two bucket-keyed aggregates over the exploded token
    * stream (map-side combined to ≤ `buckets` and |docs|·buckets groups);
    * the driver holds 2·buckets longs; scoring joins each doc's bucket
    * counts against the broadcast λ table. Nothing corpus-sized is ever
    * collected, and a 10¹² -token corpus only grows the two scans.
    */
  def dsirWeights(docs: DataFrame, targetLang: String = "en",
                  buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("b", Hashing.hash60(col("tok")) % buckets)
      .localCheckpoint(true) // two aggregates read it; don't re-tokenize
    val stats = toks.groupBy("b")
      .agg(count(lit(1)).as("raw"),
        sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("tgt"))
      .collect() // ≤ buckets rows, by contract
    val raw = Array.ofDim[Long](buckets)
    val tgt = Array.ofDim[Long](buckets)
    stats.foreach { r => raw(r.getLong(0).toInt) = r.getLong(1); tgt(r.getLong(0).toInt) = r.getLong(2) }
    val rTot = raw.sum
    val tTot = tgt.sum
    require(tTot > 0, s"dsirWeights: no tokens in target slice lang=$targetLang")
    // Laplace-smoothed log-ratio per bucket, micro-quantized ON THE DRIVER
    // (contract formula, restated by the mirror)
    val lam = (0 until buckets).map { b =>
      (b.toLong, math.rint(1e6 * (math.log((tgt(b) + 1.0) / (tTot + buckets))
        - math.log((raw(b) + 1.0) / (rTot + buckets)))).toLong)
    }
    val lamDf = lam.toDF("b", "lam_e6")
    toks.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .join(broadcast(lamDf), "b")
      .groupBy("doc_id")
      .agg(sum(col("c") * col("lam_e6")).as("dsir_e6"))
      .orderBy("doc_id")
  }

  /** DuckDB fragment for [[shuffleKey]] over key expression `x`. */
  def shuffleKeySql(x: String, seed: Long): String =
    Hashing.hash60Sql(s"($x)::VARCHAR || '#$seed'")
}
