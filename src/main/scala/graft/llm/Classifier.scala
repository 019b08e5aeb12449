package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable quality classifier for the curation pipeline — the fastText /
  * CCNet-style move: learn a tiny linear model from cheap per-document
  * signals, then score the whole corpus with it (keep/drop or
  * importance-weight). Absent from the reference (no string processing at
  * all); a first-class member of the training-data-pipeline surface
  * alongside [[Sampling.dsirWeights]] (which weights by a FIXED
  * target-vs-raw ratio, where this LEARNS the decision surface from
  * labels).
  *
  * Training is full-batch gradient descent where each step is ONE
  * distributed aggregate: per row the gradient contribution
  * `(σ(w·x) − y)·x` is computed against the BROADCAST weight literals and
  * quantized to integer nano-units, so the per-step sums are exact longs
  * (order-independent — the s9/e27 float discipline); the driver update
  * then re-quantizes the weights to the 1e-9 grain, so the independent
  * sequential mirror iterates from EXACTLY equal weights every step.
  * Per-row doubles are identical across engines in-process; across
  * heterogeneous libm implementations the 1e-9 grain absorbs last-ulp
  * `exp` drift except at a quantization boundary (the documented
  * weightedSample-grade residual risk).
  */
object Classifier {

  /** Fixed English-stopword feature list (part of the operator contract —
    * the mirror restates it).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in",
    "is", "it", "for", "on", "with", "as", "at", "by")

  private def q9(x: Double): Double = math.rint(x * 1e9) / 1e9

  /** The 4 per-document features over the token array (contract order):
    * bias 1.0, capped length `min(n, 500)/100`, mean token chars,
    * stopword ratio. All derived from integer counts by one double
    * division each — identical doubles on every engine.
    */
  private def featureCols(toks: Column): Seq[Column] = {
    val n = size(toks)
    val charSum = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val stopCount = size(filter(toks, t => array_contains(typedLit(Stopwords), t)))
    Seq(lit(1.0),
      least(n, lit(500)).cast("double") / lit(100.0),
      charSum.cast("double") / n.cast("double"),
      stopCount.cast("double") / n.cast("double"))
  }

  /** Train the logistic model on `docs` (label = `labelCol`, 0/1) and
    * report ONE row `(w0_e9, w1_e9, w2_e9, w3_e9, n_correct, n_docs)` —
    * final weights in nano-units plus training accuracy of the learned
    * decision surface (`w·x ≥ 0`, sigmoid-free so the count is exact).
    * Zero-token docs are excluded (no features). `iters` full-batch GD
    * steps at learning rate `lr`.
    *
    * Scale shape: the feature frame is computed once and checkpointed
    * (corpus pass #1); each GD step is one aggregate over it — 4 nano-sums
    * + a count, map-side combined, with the weights riding as broadcast
    * literals. Driver state is 4 doubles. Steps multiply scans of the
    * 5-column feature frame, never of the corpus text.
    */
  def trainQualityLogReg(docs: DataFrame, labelCol: Column,
                         iters: Int = 15, lr: Double = 1.0): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = TextOps.tokens(col("text"))
    val fv = docs
      .filter(size(toks) >= 1) // zero-token docs have no features (0/0 → NaN)
      .select(array(featureCols(toks): _*).as("f"), labelCol.cast("double").as("y"))
      .localCheckpoint(true)
    var w = IndexedSeq(0.0, 0.0, 0.0, 0.0)
    def zCol(wts: IndexedSeq[Double]): Column =
      wts.zipWithIndex.map { case (wj, j) =>
        lit(wj) * element_at(col("f"), j + 1)
      }.reduce(_ + _) // left fold — the contract's summation order
    for (_ <- 1 to iters) {
      val p = lit(1.0) / (lit(1.0) + exp(-zCol(w)))
      val gs = w.indices.map(j =>
        sum(round((p - col("y")) * element_at(col("f"), j + 1) * 1e9).cast("long")).as(s"g$j"))
      val row = fv.agg(gs.head, gs.tail :+ count(lit(1)).as("n"): _*).head()
      val n = row.getLong(4)
      require(n > 0, "trainQualityLogReg needs at least one tokenized doc")
      w = w.indices.map(j => q9(w(j) - lr * (row.getLong(j).toDouble / 1e9) / n))
    }
    val correct = fv.agg(
      sum(when((zCol(w) >= 0).cast("double") === col("y"), 1L).otherwise(0L)).as("c"),
      count(lit(1)).as("n")).head()
    Seq((math.rint(w(0) * 1e9).toLong, math.rint(w(1) * 1e9).toLong,
        math.rint(w(2) * 1e9).toLong, math.rint(w(3) * 1e9).toLong,
        correct.getLong(0), correct.getLong(1)))
      .toDF("w0_e9", "w1_e9", "w2_e9", "w3_e9", "n_correct", "n_docs")
  }

  /** Score documents with trained weights (nano-units, as produced by
    * [[trainQualityLogReg]]): `(doc_id, score_e6)` where score is the
    * logit `w·x` in micro-units — the downstream filter key
    * (`score_e6 ≥ 0` ⟺ predicted positive). One corpus pass, weights as
    * literals.
    */
  def scoreDocs(docs: DataFrame, weightsE9: Seq[Long]): DataFrame = {
    require(weightsE9.length == 4, s"need 4 weights, got ${weightsE9.length}")
    val toks = TextOps.tokens(col("text"))
    val fs = featureCols(toks)
    val z = weightsE9.zip(fs).map { case (wj, f) => lit(wj.toDouble / 1e9) * f }.reduce(_ + _)
    docs.filter(size(toks) >= 1)
      .select(col("doc_id").cast("long").as("doc_id"),
        round(z * 1e6).cast("long").as("score_e6"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[scoreDocs]] — same tokenizer, feature formulas,
    * weight constants (reconstructed from the SAME nano-integers with the
    * same division), summation order, and rounding. Double +,*,/ are
    * IEEE-exact in both engines, so the logits match bit-for-bit and the
    * oracle is STATIC SQL, not data-dependent VALUES.
    */
  def scoreDocsSql(weightsE9: Seq[Long]): String = {
    require(weightsE9.length == 4, s"need 4 weights, got ${weightsE9.length}")
    val stopList = Stopwords.map(s => s"'$s'").mkString(", ")
    val Seq(w0, w1, w2, w3) = weightsE9.map(w => s"($w::DOUBLE / 1e9)")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, len(ws) AS n,
       |         list_sum(list_transform(ws, t -> len(t))) AS char_sum,
       |         len(list_filter(ws, t -> t IN ($stopList))) AS stop_n
       |  FROM toks WHERE len(ws) >= 1)
       |SELECT doc_id,
       |       round((($w0 * 1.0
       |          + $w1 * (least(n, 500)::DOUBLE / 100.0))
       |          + $w2 * (char_sum::DOUBLE / n::DOUBLE)
       |          + $w3 * (stop_n::DOUBLE / n::DOUBLE)) * 1e6)::BIGINT AS score_e6
       |FROM f ORDER BY doc_id""".stripMargin
  }
}
