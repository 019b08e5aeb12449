package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Language-model quality scoring — the CCNet recipe (Wenzek et al. 2020):
  * fit a language model on a trusted reference slice, score every raw
  * document by its per-token negative log-likelihood under that model, and
  * split the corpus into head/middle/tail perplexity buckets (CCNet keeps
  * head+middle as training data and drops the tail). The reference system
  * has no text processing at all (`utils.h:5` is its entire string
  * surface); this is north-star LLM-pipeline surface.
  *
  * The model here is a hashed-unigram LM (the [[Sampling.dsirWeights]]
  * feature space): tokens hash into `buckets` features, reference-slice
  * bucket counts are exact integers from one corpus pass, and the
  * Laplace-smoothed per-bucket negative log-prob — the only transcendental
  * — is computed ONCE on the driver and micro-quantized (the s9
  * broadcast-codebook-literal discipline). A document's NLL is then the
  * exact integer `Σ count·nlp_e6`, order-independent, and the per-token
  * mean is one truncating division — so the independent sequential mirror
  * ([[SequentialCorpus.ccnetScores]]: own tokenizer, own md5 hash, own
  * counts) reproduces every row bit-for-bit. A real CCNet deployment swaps
  * the unigram table for a KenLM n-gram model; the pipeline shape —
  * reference-fit, corpus-score, threshold-bucket — is identical.
  */
object Perplexity {

  /** Score all documents under a hashed-unigram LM fit on the
    * `lang = refLang` slice. Returns `(doc_id, n_tokens, npt_e6, bucket)`
    * — per-token NLL in micro-nats and the CCNet bucket
    * (`npt_e6 < headE6` → head, `< tailE6` → middle, else tail) — ordered
    * by doc_id; zero-token docs are absent (unscorable).
    *
    * Scale shape: one bucket-keyed aggregate over the reference slice's
    * exploded token stream (map-side combined to ≤ `buckets` groups; the
    * driver holds `buckets` longs), then one scoring pass joining per-doc
    * bucket counts against the broadcast `nlp_e6` table. Nothing
    * corpus-sized is collected; a 10¹²-token corpus only grows the two
    * scans. The reference slice fits on no machine — only its BUCKET
    * COUNTS do, and those are aggregate-combined.
    */
  def ccnetScore(docs: DataFrame, refLang: String = "en", buckets: Int = 256,
                 headE6: Long = 3419000L, tailE6: Long = 3427000L): DataFrame = {
    require(buckets > 0, s"ccnetScore: buckets must be positive, got $buckets")
    require(headE6 <= tailE6,
      s"ccnetScore: head threshold must be <= tail threshold, got $headE6 > $tailE6")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .withColumn("b", Hashing.hash60(col("tok")) % buckets)
      .localCheckpoint(true) // the fit and the scoring pass both read it
    val cnt = Array.ofDim[Long](buckets)
    toks.filter(col("lang") === refLang)
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect() // ≤ buckets rows, by contract
      .foreach(r => cnt(r.getLong(0).toInt) = r.getLong(1))
    val tot = cnt.sum
    require(tot > 0, s"ccnetScore: no tokens in reference slice lang=$refLang")
    // Laplace-smoothed negative log-prob per bucket, micro-quantized ON THE
    // DRIVER (contract formula, restated by the mirror)
    val nlp = (0 until buckets).map { b =>
      (b.toLong, math.rint(-1e6 * math.log((cnt(b) + 1.0) / (tot + buckets))).toLong)
    }
    val nlpDf = broadcast(nlp.toDF("b", "nlp_e6"))
    toks.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .join(nlpDf, "b")
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"), sum(col("c") * col("nlp_e6")).as("nll_e6"))
      .select(col("doc_id"), col("n_tokens"),
        expr("nll_e6 div n_tokens").as("npt_e6"))
      .withColumn("bucket",
        when(col("npt_e6") < headE6, "head")
          .when(col("npt_e6") < tailE6, "middle")
          .otherwise("tail"))
      .orderBy("doc_id")
  }
}
