package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, Num}

/** Text-analysis operators for the training-data pipeline surface
  * (builder brief; absent from the reference, which has no string processing
  * at all — its only "text" is the ≤256-char reply buffer, `utils.h:5`).
  *
  * All declared-query paths are pure built-in expressions (codegen'd, no
  * UDFs) and use integer arithmetic for every ratio (scaled by 1000), so the
  * DuckDB oracle matches bit-exactly with no float discipline needed.
  */
object TextOps {

  /** Lowercased alphanumeric tokens, empties dropped. Mirrors DuckDB
    * `list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), t -> t <> '')`.
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Distinct word 3-gram shingles of a token array (the unit of near-dup
    * detection); empty for docs with < 3 tokens.
    *
    * `toks` is LET-BOUND once per row via a single-element `transform`
    * (higher-order functions are interpreted, and an expression referenced
    * inside a lambda body is re-evaluated PER ELEMENT — with the usual
    * `tokens(col("text"))` argument that meant ~3·n_shingles full regex
    * tokenizations per document; measured 4x on the shingle stage at
    * sf0.1). Inside the lambda `ws` is a lambda variable: O(1) per read.
    */
  def shingles3(toks: Column): Column =
    element_at(transform(array(toks), ws =>
      when(size(ws) >= 3,
        array_distinct(transform(sequence(lit(1), size(ws) - 2), i =>
          concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))))
        .otherwise(array().cast("array<string>"))), 1)

  /** Distinct character n-grams of the lowercased text (the tokenizer-free
    * near-dup unit — works on scripts with no word boundaries); empty for
    * texts shorter than `n`. Character (not byte) positions on both
    * engines; equality across engines assumes the corpus stays in ASCII/BMP
    * like [[winnowingSql]] does.
    */
  def charNgrams(text: Column, n: Int): Column = {
    require(n > 0, s"n-gram length must be positive, got $n")
    // lower(text) let-bound once per row (the shingles3 discipline): a
    // lambda-body reference is re-evaluated per element, which would
    // lowercase the whole text once per n-gram position — O(len²)/doc
    element_at(transform(array(lower(text)), t =>
      when(length(t) >= n,
        array_distinct(transform(sequence(lit(1), length(t) - (n - 1)), i => t.substr(i, lit(n)))))
        .otherwise(array().cast("array<string>"))), 1)
  }

  /** DuckDB fragment: one row per (doc_id, distinct char n-gram); CTE name
    * defaults to `sh` to slot into the same verify tail as [[shinglesSql]].
    */
  def charNgramsSql(n: Int, docsTable: String = "documents", cte: String = "sh"): String =
    s"""$cte AS (SELECT DISTINCT doc_id, substr(lower(text), i, $n) AS shingle
       |       FROM $docsTable, UNNEST(range(1, len(text) - $n + 2)) AS u(i)
       |       WHERE len(text) >= $n)""".stripMargin

  /** DuckDB fragment: one row per (doc_id, distinct 3-gram shingle); CTE
    * name parameterized so callers can post-process (e.g. hash) into the
    * `sh` slot the shared verify tail expects.
    */
  def shinglesSql(docsTable: String = "documents", cte: String = "sh"): String =
    s"""toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws FROM $docsTable),
       |$cte AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
       |       FROM toks, UNNEST(range(1, len(ws) - 1)) AS u(i))""".stripMargin

  /** Common-English stopword list for the stopword-ratio quality signal —
    * declared `val` so the SQL mirror and tests stay in lock-step.
    */
  val stopwords: Seq[String] = Seq(
    "the", "and", "of", "to", "is", "in", "that", "it", "a", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are")

  /** Non-token character class shared by the punctuation ratio on both
    * engines. Spelled out (no `\s`) because Java and RE2 disagree on `\s`'s
    * exact membership (vertical tab) — an explicit class is hash-safe.
    */
  private val PunctClass = "[^A-Za-z0-9 \\t\\r\\n]"

  /** Per-document stats: token/char counts, a type-token ratio, plus the
    * punctuation-density and stopword-ratio signals (all in thousandths,
    * integer-exact) — the length/diversity/punct/stopword signals a quality
    * filter reads. `(doc_id, n_tokens, n_distinct_tokens, sum_token_chars,
    * len_text, ttr_1000, punct_1000, stop_1000)`.
    */
  def textStats(docs: DataFrame): DataFrame = {
    // token array bound ONCE per row (four consumers below would each
    // re-run the regex tokenizer — HOFs are interpreted, no codegen CSE),
    // and the per-row regex work spread off the single-file scan partition
    graft.Tables.spread(docs)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("ws"))
      .select(
      col("doc_id"),
      size(col("ws")).cast("long").as("n_tokens"),
      size(array_distinct(col("ws"))).cast("long").as("n_distinct_tokens"),
      aggregate(col("ws"), lit(0L), (acc, t) => acc + length(t)).as("sum_token_chars"),
      length(col("text")).cast("long").as("len_text"),
      (length(col("text")) -
        length(regexp_replace(col("text"), PunctClass, ""))).cast("long").as("n_punct"),
      size(filter(col("ws"), t => t.isin(stopwords: _*))).cast("long").as("n_stop"))
      // `div` = integral division (Spark `/` on longs yields DOUBLE)
      .withColumn("ttr_1000",
        when(col("n_tokens") > 0, expr("n_distinct_tokens * 1000 div n_tokens")).otherwise(lit(0L)))
      .withColumn("punct_1000", expr("n_punct * 1000 div greatest(len_text, 1)"))
      .withColumn("stop_1000", expr("n_stop * 1000 div greatest(n_tokens, 1)"))
      .drop("n_punct", "n_stop")
      .orderBy("doc_id")
  }

  /** Per-document sentence segmentation stats: segments split on `[.!?]+`
    * runs, whitespace-trimmed, empties dropped — the discourse-shape
    * quality signals (a doc of 400 one-word "sentences" is a list, not
    * prose) the flat token ratios of [[textStats]] can't see. All
    * integer: `(doc_id, n_sentences, sum_sent_chars, max_sent_chars,
    * mean_chars_1000)`. Row-local array algebra — no shuffle at all.
    */
  def sentenceStats(docs: DataFrame): DataFrame = {
    val sents = filter(
      transform(split(col("text"), "[.!?]+"),
        s => regexp_replace(s, "^\\s+|\\s+$", "")),
      s => s =!= "")
    docs.select(col("doc_id"), sents.as("sents"))
      .select(
        col("doc_id"),
        size(col("sents")).cast("long").as("n_sentences"),
        coalesce(aggregate(col("sents"), lit(0L), (a, s) => a + length(s)), lit(0L))
          .as("sum_sent_chars"),
        coalesce(array_max(transform(col("sents"), s => length(s).cast("long"))), lit(0L))
          .as("max_sent_chars"))
      .withColumn("mean_chars_1000",
        when(col("n_sentences") > 0,
          expr("sum_sent_chars * 1000 div n_sentences")).otherwise(lit(0L)))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[sentenceStats]]. */
  val sentenceStatsSql: String =
    s"""WITH s AS (SELECT doc_id,
       |  list_filter(list_transform(string_split_regex(text, '[.!?]+'),
       |              x -> regexp_replace(x, '^\\s+|\\s+$$', '', 'g')), x -> x <> '') AS sents
       |  FROM documents)
       |SELECT doc_id, len(sents)::BIGINT AS n_sentences,
       |  COALESCE(list_sum(list_transform(sents, x -> len(x))), 0)::BIGINT AS sum_sent_chars,
       |  COALESCE(list_max(list_transform(sents, x -> len(x)::BIGINT)), 0)::BIGINT AS max_sent_chars,
       |  CASE WHEN len(sents) > 0
       |       THEN COALESCE(list_sum(list_transform(sents, x -> len(x))), 0)::BIGINT * 1000 // len(sents)
       |       ELSE 0 END::BIGINT AS mean_chars_1000
       |FROM s ORDER BY doc_id""".stripMargin

  val textStatsSql: String = {
    val stopList = stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
      |  len(ws)::BIGINT AS n_tokens,
      |  len(list_distinct(ws))::BIGINT AS n_distinct_tokens,
      |  COALESCE(list_sum(list_transform(ws, t -> len(t))), 0)::BIGINT AS sum_token_chars,
      |  len(text)::BIGINT AS len_text,
      |  (CASE WHEN len(ws) > 0 THEN len(list_distinct(ws)) * 1000 // len(ws) ELSE 0 END)::BIGINT AS ttr_1000,
      |  ((len(text) - len(regexp_replace(text, '[^A-Za-z0-9 \\t\\r\\n]', '', 'g'))) * 1000
      |     // greatest(len(text), 1))::BIGINT AS punct_1000,
      |  (len(list_filter(ws, t -> t IN ($stopList))) * 1000
      |     // greatest(len(ws), 1))::BIGINT AS stop_1000
      |FROM (SELECT doc_id, text, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws
      |      FROM documents) ORDER BY doc_id""".stripMargin
  }

  /** Deterministic quality bucket from integer signals: the shape of a
    * training-data quality filter (thresholds are illustrative; the operator
    * is the point). `(doc_id, quality)`.
    */
  def qualityBuckets(docs: DataFrame): DataFrame =
    textStats(docs).select(
      col("doc_id"),
      when(col("n_tokens") < 20, "too_short")
        .when(col("ttr_1000") < 250, "repetitive")
        .when(expr("sum_token_chars * 1000 div greatest(n_tokens, 1)") < 3000L, "short_tokens")
        .otherwise("ok").as("quality"))
      .orderBy("doc_id")

  val qualityBucketsSql: String =
    s"""WITH s AS ($textStatsSql)
       |SELECT doc_id,
       |  CASE WHEN n_tokens < 20 THEN 'too_short'
       |       WHEN ttr_1000 < 250 THEN 'repetitive'
       |       WHEN sum_token_chars * 1000 // greatest(n_tokens, 1) < 3000 THEN 'short_tokens'
       |       ELSE 'ok' END AS quality
       |FROM s ORDER BY doc_id""".stripMargin

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1 reads duplicate
    * line/paragraph and top-n-gram fractions; this corpus is single-line, so
    * the token-level family): most-frequent-token share, most-frequent-
    * bigram share, and duplicate-bigram fraction, all in thousandths,
    * integer-exact. `(doc_id, n_tokens, n_bigrams, top_token_1000,
    * top_bigram_1000, dup_bigram_1000)`.
    *
    * Deliberately per-ROW higher-order-function work (the in-row frequency
    * scan is O(distinct × n) on ≲10³-token docs): the alternative —
    * explode + groupBy(doc, token) — would shuffle the whole corpus'
    * token stream to compute a per-document statistic. Embarrassingly
    * parallel, no exchange before the output sort.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    def topShare(arr: String, n: String) = expr(
      s"coalesce(array_max(transform(array_distinct($arr), u -> size(filter($arr, x -> x = u)))), 0)" +
        s" * 1000 div greatest($n, 1)")
    docs
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .withColumn("bg",
        when(size(col("ws")) >= 2, // guard: Spark sequence(1, 0) DESCENDS
          transform(sequence(lit(1), size(col("ws")) - 1), i =>
            concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1))))
          .otherwise(array().cast("array<string>")))
      .withColumn("n_tokens", size(col("ws")).cast("long"))
      .withColumn("n_bigrams", size(col("bg")).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("n_bigrams"),
        topShare("ws", "n_tokens").as("top_token_1000"),
        topShare("bg", "n_bigrams").as("top_bigram_1000"),
        expr("(n_bigrams - size(array_distinct(bg))) * 1000 div greatest(n_bigrams, 1)")
          .as("dup_bigram_1000"))
      .orderBy("doc_id")
  }

  val repetitionStatsSql: String = {
    def topShare(arr: String, n: String) =
      s"COALESCE(list_max(list_transform(list_distinct($arr), u -> len(list_filter($arr, x -> x = u)))), 0)" +
        s" * 1000 // greatest($n, 1)"
    s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws FROM documents),
       |b AS (SELECT doc_id, ws, list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS bg FROM t)
       |SELECT doc_id,
       |  len(ws)::BIGINT AS n_tokens,
       |  len(bg)::BIGINT AS n_bigrams,
       |  (${topShare("ws", "len(ws)")})::BIGINT AS top_token_1000,
       |  (${topShare("bg", "len(bg)")})::BIGINT AS top_bigram_1000,
       |  ((len(bg) - len(list_distinct(bg))) * 1000 // greatest(len(bg), 1))::BIGINT AS dup_bigram_1000
       |FROM b ORDER BY doc_id""".stripMargin
  }

  /** Per-doc mean corpus frequency of its tokens (integer division):
    * `(doc_id, n_tokens, mean_cf)` for docs with ≥1 token. A
    * rare-token-heavy doc (low mean_cf) is the OCR-noise/gibberish
    * candidate; an extreme common-token mean flags boilerplate — the
    * corpus-relative quality signal t3's per-row ratios can't see.
    *
    * Scale shape: one token-level shuffle builds the frequency table; the
    * join back is against a VOCABULARY-sized table (broadcast at corpus
    * scale — natural-language vocabularies are millions of rows, not
    * corpus-sized), then one per-doc aggregation.
    */
  def tokenRarity(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val cf = toks.groupBy("tok").agg(count(lit(1)).as("cf"))
    toks.join(cf, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), expr("sum(cf) div count(1)").as("mean_cf"))
      .orderBy("doc_id")
  }

  val tokenRaritySql: String =
    """WITH t AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS tok
      |           FROM documents),
      |cf AS (SELECT tok, COUNT(*) AS cf FROM t GROUP BY tok)
      |SELECT doc_id, COUNT(*) AS n_tokens, (SUM(cf.cf) // COUNT(*))::BIGINT AS mean_cf
      |FROM t JOIN cf USING (tok) GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Corpus-bigram log-probability scoring — the CCNet-style statistical
    * LM quality signal: score each doc by the mean log conditional
    * probability `ln(c(w₁w₂) / c(w₁·))` of its consecutive token bigrams
    * under the corpus's own bigram counts (`c(w₁·)` = occurrences of w₁
    * as a bigram PREFIX, so probabilities per prefix sum to exactly 1 and
    * every score is ≤ 0). Gibberish and word-salad sit far below fluent
    * text; unlike the per-doc signals (t3/t13) this one is
    * corpus-relative, and unlike t16's mean frequency it scores token
    * ORDER, not token choice. `(doc_id, n_bigrams, avg_lp_6)` for docs
    * with ≥ 2 tokens, rounded to 1e-6 (sums of ≤ doc-length ln terms —
    * fp error far below the grain).
    *
    * Scale shape: the bigram table is corpus-VOCABULARY² bounded (in
    * practice ~vocab×avg-branching), built by one hash aggregation with
    * map-side combine; the prefix table is a second, smaller one. Docs
    * join their bigrams back against those tables — at 100 TB both are
    * broadcast-sized next to the corpus, so the join adds no corpus
    * shuffle beyond the bigram extraction itself.
    */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val bg = docs.repartition(par)
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(col("ws")) - 1),
        i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1)))).as("bg"))
      .localCheckpoint(true) // three consumers: c2, c1, and the probe
    val c2 = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
    val c1 = bg.select(substring_index(col("bg"), " ", 1).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    bg.join(c2, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(c1, "w1")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        Num.round6(avg(log(col("c2").cast("double") / col("c1").cast("double")))).as("avg_lp_6"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[bigramLogProb]] — same bigram derivation, same
    * prefix normalizer, same ln/avg/round arithmetic.
    */
  val bigramLogProbSql: String =
    """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws FROM documents),
      |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg, ws[i] AS w1
      |       FROM toks, UNNEST(range(1, len(ws))) AS u(i)
      |       WHERE len(ws) >= 2),
      |c2 AS (SELECT bg, COUNT(*) AS c2 FROM bg GROUP BY bg),
      |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY w1)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |       ROUND(AVG(ln(c2.c2::DOUBLE / c1.c1::DOUBLE)), 6) + 0.0 AS avg_lp_6
      |FROM bg JOIN c2 USING (bg) JOIN c1 USING (w1)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Cross-document duplicate-shingle coverage: per doc (with ≥1 shingle),
    * how much of it appears ANYWHERE else in the corpus —
    * `(doc_id, n_shingles, n_shared, shared_1000)` where `n_shared` counts
    * the doc's distinct shingles with document frequency > 1. The
    * corpus-level contamination signal that pairwise dedup (d2/d3) never
    * surfaces: a doc stitched from fragments of MANY documents has no
    * single high-Jaccard partner but near-total shared coverage.
    *
    * Scale shape: the (doc, shingle-hash) projection dedups PER DOC with
    * `array_distinct` after the hash (identical to the oracle's
    * `SELECT DISTINCT doc_id, hash` — see [[graft.llm.Dedup]]'s hashed-
    * shingle convention) so no corpus-wide distinct shuffle exists; the
    * CPU-heavy tokenize+md5 pass is re-spread across all cores and
    * materialized ONCE (`localCheckpoint`) because two consumers (the df
    * aggregation and the join-back probe) would otherwise each recompute
    * it. After that: one vocabulary-keyed df aggregation, one join back on
    * the hash — every exchanged row is (long, long).
    */
  def dupCoverage(docs: DataFrame): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val sh = docs.repartition(par)
      .select(col("doc_id"),
        explode(array_distinct(transform(shingles3(tokens(col("text"))),
          s => Hashing.hash60(s)))).as("h"))
      .localCheckpoint(true)
    val df = sh.groupBy("h").agg(count(lit(1)).as("df"))
    sh.join(df, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_1000", expr("n_shared * 1000 div n_shingles"))
      .orderBy("doc_id")
  }

  val dupCoverageSql: String =
    s"""WITH ${shinglesSql()},
       |hs AS (SELECT DISTINCT doc_id, ${Hashing.hash60Sql("shingle")} AS h FROM sh),
       |df AS (SELECT h, COUNT(*) AS df FROM hs GROUP BY h)
       |SELECT doc_id, COUNT(*) AS n_shingles,
       |  SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
       |  (SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) * 1000 // COUNT(*))::BIGINT AS shared_1000
       |FROM hs JOIN df USING (h) GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination: overlap of each TRAIN doc's shingles with
    * a held-out EVAL set's shingle universe — the pre-training hygiene step
    * (an eval question leaked into training data invalidates the
    * benchmark). Returns train docs with ≥1 overlapping shingle:
    * `(doc_id, n_shingles, n_overlap, overlap_1000)`.
    *
    * `evalPred` marks the eval slice. Scale shape: per-doc `array_distinct`
    * after the hash (≡ the oracle's `SELECT DISTINCT doc_id, hash`, no
    * corpus-wide distinct shuffle), the tokenize+md5 pass re-spread across
    * all cores and materialized once for its two consumers. The eval
    * shingle universe is BENCHMARK-sized (thousands of docs, not the
    * corpus), so its hash set broadcasts; the train side then pays a
    * SINGLE pass — broadcast left join to flag overlaps + one per-doc
    * aggregation — and shuffles only the doc-sized partial-agg output.
    */
  def decontaminate(docs: DataFrame, evalPred: Column): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val sh = docs.repartition(par)
      .select(col("doc_id"), evalPred.as("is_eval"),
        explode(array_distinct(transform(shingles3(tokens(col("text"))),
          s => Hashing.hash60(s)))).as("h"))
      .localCheckpoint(true)
    val evalSh = sh.filter(col("is_eval")).select("h").distinct()
    val train = sh.filter(!col("is_eval"))
    train.join(broadcast(evalSh.withColumn("hit", lit(1L))), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("hit")).as("n_overlap"))
      .filter(col("n_overlap") > 0)
      .withColumn("overlap_1000", expr("n_overlap * 1000 div n_shingles"))
      .select("doc_id", "n_shingles", "n_overlap", "overlap_1000")
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[decontaminate]] for the gate's eval predicate
    * (`doc_id % evalMod = 0`, a deterministic stand-in benchmark slice).
    */
  def decontaminateSql(evalMod: Int): String =
    s"""WITH ${shinglesSql()},
       |hs AS (SELECT DISTINCT doc_id, doc_id % $evalMod = 0 AS is_eval,
       |              ${Hashing.hash60Sql("shingle")} AS h FROM sh),
       |ev AS (SELECT DISTINCT h FROM hs WHERE is_eval),
       |tr AS (SELECT doc_id, h FROM hs WHERE NOT is_eval),
       |hits AS (SELECT doc_id, COUNT(*) AS n_overlap FROM tr
       |         WHERE h IN (SELECT h FROM ev) GROUP BY doc_id),
       |alltr AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id)
       |SELECT doc_id, n_shingles, n_overlap,
       |       (n_overlap * 1000 // n_shingles)::BIGINT AS overlap_1000
       |FROM alltr JOIN hits USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Marker words per language for the n-gram(1) language-ID heuristic.
    * Declared `val` so tests and the SQL mirror stay in lock-step.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "los", "las", "de", "que", "es", "una", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "des", "une"))

  /** Language-ID via marker-word counts: predicted = language with the most
    * marker hits; ties break to the lexicographically first language;
    * zero hits ⇒ 'und' (BCP-47 undetermined). `(doc_id, pred_lang)`.
    *
    * A real n-gram language model needs corpus statistics this container
    * doesn't ship; marker-word scoring is the standard cheap fallback and is
    * exercised against genuinely multilingual sentences in the unit suite.
    */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val counts = langMarkers.map { case (lang, ms) =>
      size(filter(toks, t => t.isin(ms: _*))).cast("long").as(s"c_$lang")
    }
    val withCounts = docs.select(col("doc_id") +: counts: _*)
    // argmax with lexicographic tie-break = first lang whose count equals the
    // max and is positive
    val maxC = greatest(langMarkers.map { case (l, _) => col(s"c_$l") }: _*)
    val pred = langMarkers.foldRight(lit("und")) { case ((l, _), els) =>
      when(col(s"c_$l") === maxC && maxC > 0, lit(l)).otherwise(els)
    }
    // foldRight keeps declaration order precedence (de checked first)
    withCounts.select(col("doc_id"), pred.as("pred_lang")).orderBy("doc_id")
  }

  val languageIdSql: String = {
    val countCols = langMarkers.map { case (lang, ms) =>
      val set = ms.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(ws, t -> t IN ($set))) AS c_$lang"
    }.mkString(",\n  ")
    val maxExpr = s"greatest(${langMarkers.map { case (l, _) => s"c_$l" }.mkString(", ")})"
    val caseArms = langMarkers.map { case (l, _) =>
      s"WHEN c_$l = $maxExpr AND $maxExpr > 0 THEN '$l'"
    }.mkString(" ")
    s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws FROM documents),
       |c AS (SELECT doc_id,
       |  $countCols
       |FROM t)
       |SELECT doc_id, CASE $caseArms ELSE 'und' END AS pred_lang FROM c ORDER BY doc_id""".stripMargin
  }

  /** Content fingerprints: md5 of the normalized token stream (exact-dup
    * key robust to whitespace/punctuation noise) + the minimum 60-bit shingle
    * hash (a 1-function MinHash — the cheapest similarity sketch).
    * `(doc_id, fp_md5 STRING(16), min_shingle_hash BIGINT nullable)`.
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      substring(md5(concat_ws(" ", toks)), 1, 16).as("fp_md5"),
      array_min(transform(shingles3(toks), s => Hashing.hash60(s))).as("min_shingle_hash"))
      .orderBy("doc_id")
  }

  val fingerprintsSql: String =
    s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws FROM documents),
       |s AS (SELECT doc_id, ws,
       |        CASE WHEN len(ws) >= 3
       |             THEN list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)])
       |             ELSE [] END AS sh
       |      FROM t)
       |SELECT doc_id,
       |  substr(md5(COALESCE(list_aggregate(ws, 'string_agg', ' '), '')), 1, 16) AS fp_md5,
       |  list_min(list_transform(sh, x -> ${Hashing.hash60Sql("x")})) AS min_shingle_hash
       |FROM s ORDER BY doc_id""".stripMargin

  /** BPE-ish pre-tokenizer pattern (GPT-2 family shape, minus lookaheads so
    * it runs identically on Java regex and DuckDB's RE2): contraction
    * suffixes, letter runs, digit runs, punctuation runs.
    */
  val BpePattern: String = """'(?:[sdmt]|ll|ve|re)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"""

  /** Subword-style token counts per doc — the sizing signal an LLM data
    * pipeline budgets by: `(doc_id, n_bpe_tokens, n_ws_tokens)`.
    */
  def bpeTokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      // Column-based call (not expr()): SQL string literals would mangle
      // the pattern's backslashes
      size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
        .cast("long").as("n_bpe_tokens"),
      size(tokens(col("text"))).cast("long").as("n_ws_tokens"))
      .orderBy("doc_id")

  val bpeTokenCountsSql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(text, '${BpePattern.replace("'", "''")}'))::BIGINT AS n_bpe_tokens,
       |  len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))::BIGINT AS n_ws_tokens
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Winnowing fingerprints (Schleimer et al., SIGMOD 2003): Rabin-Karp
    * rolling hash over character k-grams, then the minimum hash of each
    * sliding window of `w` consecutive k-gram hashes (rightmost-min rule).
    * Guarantees every match of length ≥ w+k-1 between two docs shares a
    * fingerprint — the standard plagiarism/near-dup fingerprint family.
    *
    * Pure per-row computation (executor-side `flatMap`, no state, no
    * shuffle before the final sort): embarrassingly parallel at any corpus
    * size. One scalar row per (doc, distinct fingerprint) — scalar because
    * the driver's oracle compare hashes column values and cannot sort an
    * array column. The k-char rolling hash IS SQL-mirrorable when k is a
    * small constant (unrolled polynomial over `ord(substr(...))` — see
    * [[winnowingSql]]), so the declared query is fully oracle-checked.
    * `(doc_id, fingerprint BIGINT)`.
    */
  def winnowingFingerprints(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    docs.repartition(par) // single-file parquet input = 1 partition otherwise
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        winnow(text.toLowerCase(java.util.Locale.ROOT), k, w).map(f => (id, f))
      }
      .toDF("doc_id", "fingerprint")
      .orderBy("doc_id", "fingerprint")
  }

  /** DuckDB mirror of [[winnowingFingerprints]]: the k-gram hash is the
    * unrolled polynomial `((c_1·B + c_2) mod M ...)·B + c_k mod M` (exactly
    * the Scala loop's `h = (h·B + c) % M` step order, so values are
    * bit-identical), and the rightmost-min window rule is a windowed
    * `min(h·2^32 + (2^32-1-i))` — minimal hash first, larger position wins
    * ties. Valid for ASCII/BMP text (Scala charAt = UTF-16 unit vs DuckDB
    * ord = code point; the test corpus is ASCII).
    */
  def winnowingSql(k: Int = 5, w: Int = 4): String = {
    val B = 1000003L
    val M = (1L << 31) - 1
    // h_k with a mod after every step: (((c1)*B + c2) % M ... ) % M
    val poly = (2 to k).foldLeft(s"ord(substr(t, i, 1))::BIGINT") { (acc, j) =>
      s"(($acc) * $B + ord(substr(t, i + ${j - 1}, 1))) % $M"
    }
    s"""WITH d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE len(text) >= $k),
       |pos AS (SELECT doc_id, unnest(range(1, len(t) - $k + 2)) AS i, t FROM d),
       |hs AS (SELECT doc_id, i, $poly AS h FROM pos),
       |-- pack (h asc, i desc) into one BIGINT so a windowed min applies the
       |-- paper's rightmost-min tie rule; frame truncation at the partition
       |-- end makes the n <= w case (single global min) fall out for free
       |sel AS (SELECT doc_id, i,
       |               min(h * 4294967296 + (4294967295 - i))
       |                 OVER (PARTITION BY doc_id ORDER BY i
       |                       ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS p,
       |               count(*) OVER (PARTITION BY doc_id) AS n
       |        FROM hs)
       |SELECT DISTINCT doc_id, p // 4294967296 AS fingerprint
       |FROM sel WHERE i <= greatest(1, n - $w + 1)
       |ORDER BY doc_id, fingerprint""".stripMargin
  }

  /** Driver-free winnowing core (shared with the unit oracle). */
  private[graft] def winnow(s: String, k: Int, w: Int): Array[Long] = {
    if (s.length < k) return Array.empty
    val B = 1000003L
    // Mersenne 2^31-1: keeps every product below 2^52, no Long overflow
    val M = (1L << 31) - 1
    // rolling k-gram hashes: h_i = s[i]*B^(k-1) + ... + s[i+k-1], mod M
    var pow = 1L
    for (_ <- 1 until k) pow = pow * B % M
    val n = s.length - k + 1
    val hs = new Array[Long](n)
    var h = 0L
    for (i <- 0 until k) h = (h * B + s.charAt(i)) % M
    hs(0) = h
    for (i <- 1 until n) {
      h = ((h - s.charAt(i - 1) * pow % M + M) % M * B + s.charAt(i + k - 1)) % M
      hs(i) = h
    }
    if (n <= w) return Array(hs.min)
    // sliding-window minima, rightmost-min tie rule (the paper's robust
    // variant picks rightmost among equal minima)
    val out = scala.collection.mutable.SortedSet.empty[Long]
    for (start <- 0 to n - w) {
      var best = start
      for (j <- start until start + w) if (hs(j) <= hs(best)) best = j
      out += hs(best)
    }
    out.toArray
  }

  /** TF-IDF top-`k` terms per document: `(doc_id, rank, term, tf, df,
    * tfidf_1000)` — the classic "what is this document about" signal a
    * curation pipeline uses for topic balancing and keyword indexing.
    *
    * Integer-exact scoring: idf is the RAW inverse document frequency
    * `n_docs / df` (the log-free variant), so the score
    * `tf · n_docs · 1000 div df` stays in exact long arithmetic and the
    * DuckDB oracle matches bit-for-bit — no float log discipline needed.
    * Within a document log-idf and raw idf rank identically whenever df
    * ties break the same way (ties break by term, deterministically).
    *
    * Scale shape: explode → one hash-shuffle for tf (map-side partial agg),
    * a small df aggregate joined back on term, and the corpus size joined
    * as a broadcast scalar; the per-doc top-k window partitions by doc_id —
    * no skew (a document has bounded distinct terms). No driver loops.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val tok = docs.repartition(par) // single-file parquet = 1 partition
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    // materialized once: tf feeds BOTH the df aggregate and the score join
    // — without it Catalyst plans two full tokenize+aggregate scans of the
    // corpus (no automatic subplan sharing)
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    // tf rows are distinct (doc, term), so df = row count per term
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf_1000").desc, col("term"))
    tf.join(dfreq, "term").crossJoin(broadcast(n))
      // long-exact throughout: tf ≤ doc tokens, so tf·n_docs·1000 fits a
      // long until n_docs ~ 1e12
      .withColumn("tfidf_1000", expr("tf * n_docs * 1000 div df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "tfidf_1000")
      .orderBy("doc_id", "rank")
  }

  def tfidfTopTermsSql(k: Int = 3): String =
    s"""WITH tok AS (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |s AS (SELECT doc_id, term, tf, df, tf * n_docs * 1000 // df AS tfidf_1000,
       |             row_number() OVER (PARTITION BY doc_id ORDER BY tf * n_docs * 1000 // df DESC, term) AS rank
       |      FROM tf JOIN df USING (term) CROSS JOIN n)
       |SELECT doc_id, rank::BIGINT AS rank, term, tf, df, tfidf_1000
       |FROM s WHERE rank <= $k ORDER BY doc_id, rank""".stripMargin

  /** RAG-style overlapping token chunking: each document's token stream is
    * cut into windows of `k` tokens starting every `stride` tokens (overlap
    * `k - stride`), the unit retrieval pipelines embed and index. Window
    * starts are `0, stride, 2·stride, …` up to the first start covering the
    * tail; docs shorter than `k` yield one chunk; empty docs yield none.
    * `(doc_id, chunk_id, n_chunk_tokens, chunk_text)`.
    *
    * Pure per-row expression work (explode of a bounded sequence — no
    * shuffle before the output sort): embarrassingly parallel at any corpus
    * size, the same shape as winnowing. The placement-only cousin for
    * pretraining is [[Packing.packChunks]].
    */
  def chunkTokens(docs: DataFrame, k: Int = 30, stride: Int = 20): DataFrame = {
    require(k > 0 && stride > 0 && stride <= k,
      s"need 0 < stride <= k, got k=$k stride=$stride")
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val toks = tokens(col("text"))
    docs.repartition(par)
      .select(col("doc_id"), toks.as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .filter(col("n") > 0)
      // number of starts: ceil(max(n-k, 0) / stride) + 1, integer-exact
      .withColumn("n_chunks",
        expr(s"(greatest(n - $k, 0L) + $stride - 1) div $stride + 1"))
      .select(col("doc_id"), col("ws"),
        explode(expr("sequence(0L, n_chunks - 1)")).as("chunk_id"))
      .withColumn("chunk", expr(s"slice(ws, chunk_id * $stride + 1, $k)"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
      .orderBy("doc_id", "chunk_id")
  }

  def chunkTokensSql(k: Int = 30, stride: Int = 20): String =
    s"""WITH t AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws FROM documents),
       |b AS (SELECT doc_id, ws, len(ws)::BIGINT AS n,
       |             (greatest(len(ws) - $k, 0) + $stride - 1) // $stride + 1 AS n_chunks
       |      FROM t WHERE len(ws) > 0),
       |c AS (SELECT doc_id, ws, unnest(range(0, n_chunks)) AS chunk_id FROM b)
       |SELECT doc_id, chunk_id,
       |       len(ws[chunk_id * $stride + 1 : chunk_id * $stride + $k])::BIGINT AS n_chunk_tokens,
       |       COALESCE(list_aggregate(ws[chunk_id * $stride + 1 : chunk_id * $stride + $k], 'string_agg', ' '), '') AS chunk_text
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** Global token frequency (the canonical distributed word count):
    * `(token, n)`, top `k` by count desc then token.
    */
  def tokenFrequency(docs: DataFrame, k: Int = 20): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  def tokenFrequencySql(k: Int = 20): String =
    s"""SELECT token, count(*) AS n
       |FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS token FROM documents)
       |GROUP BY token ORDER BY n DESC, token LIMIT $k""".stripMargin

  /** Zipf rank–frequency fit per language — the corpus-card statistic
    * that tells you whether a slice looks like natural language (slope
    * ≈ −1 on log-log rank/frequency) or like templated/synthetic junk
    * (flat or cliff-shaped): per lang, the OLS slope of
    * `(ln rank, ln freq)` over the top-`topN` token frequencies, plus
    * the exact token and vocabulary totals.
    *
    * Determinism contract: the heavy work (token counts, totals, the
    * per-lang top-N under a `(freq desc, token)` total order) is
    * distributed and exact-integer; the FIT runs on the DRIVER over the
    * collected ≤ langs·topN rows (bounded by contract — the s9 codebook
    * discipline), with each `ln` micro-quantized to integer nanos and
    * the OLS closed form evaluated in BigInt, so `slope_e6` is the exact
    * same integer the sequential mirror derives from its own counts.
    * A language whose top-N collapses to a single rank point (vocab 1)
    * cannot be fitted: its `slope_e6` is NULL and `n_fit` reports the
    * point count — the fit is skipped, never thrown, so one degenerate
    * slice can't fail the whole corpus card.
    * Returns `(lang, n_tokens, vocab, n_fit, slope_e6)` ordered by lang.
    *
    * Scale shape: one token-keyed count (map-side combined), one
    * lang-keyed rollup, one WindowGroupLimit top-N — nothing
    * corpus-sized collected; the fit input is topN rows per language by
    * construction.
    */
  def zipfStats(docs: DataFrame, topN: Int = 100): DataFrame = {
    require(topN >= 2, s"zipfStats: need topN >= 2 to fit a slope, got $topN")
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs.select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("f"))
      .localCheckpoint(true) // totals + top-N both read it
    val totals = tf.groupBy("lang")
      .agg(sum(col("f")).as("n_tokens"), count(lit(1)).as("vocab"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("f").desc, col("tok"))
    val top = tf.withColumn("r", row_number().over(w)).filter(col("r") <= topN)
      .select("lang", "r", "f")
      .collect() // ≤ langs·topN rows, by contract
      .map(row => (row.getString(0), row.getInt(1), row.getLong(2)))
    val slopes = top.groupBy(_._1).map { case (lang, rows) =>
      val pts = rows.map { case (_, r, f) => (r, f) }.toSeq
      lang -> (if (pts.size >= 2) Some(zipfSlopeE6(pts)) else None)
    }
    val nFit = top.groupBy(_._1).map { case (l, rs) => (l, rs.length.toLong) }
    val fitDf = broadcast(slopes.toSeq.map { case (l, s) => (l, nFit(l), s) }
      .toDF("lang", "n_fit", "slope_e6"))
    totals.join(fitDf, "lang")
      .select(col("lang"), col("n_tokens"), col("vocab"), col("n_fit"), col("slope_e6"))
      .orderBy("lang")
  }

  /** The shared Zipf-fit contract formula: OLS slope of nano-quantized
    * `(ln rank, ln freq)` in exact BigInt, emitted in micro-units —
    * `slope_e6 = (n·Σxy − Σx·Σy) · 1e6 div (n·Σxx − Σx²)` with
    * `x = rint(1e9·ln r)`, `y = rint(1e9·ln f)`. Restated verbatim by
    * the sequential mirror from its own independently-derived ranks.
    */
  def zipfSlopeE6(rankFreq: Seq[(Int, Long)]): Long = {
    require(rankFreq.size >= 2, "zipf fit needs >= 2 points")
    val pts = rankFreq.map { case (r, f) =>
      (BigInt(math.rint(1e9 * math.log(r.toDouble)).toLong),
        BigInt(math.rint(1e9 * math.log(f.toDouble)).toLong))
    }
    val n = BigInt(pts.size)
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val den = n * sxx - sx * sx
    require(den != 0, "zipf fit: degenerate rank axis")
    ((n * sxy - sx * sy) * BigInt(1000000) / den).toLong
  }

  // ----- PII scrubbing (t22) -------------------------------------------

  /** Email/phone patterns shared by both engines. Java regex and RE2 agree
    * on every construct used here (explicit classes, `{m,n}`, `\b`); `\s`
    * and friends are avoided per the [[PunctClass]] discipline.
    */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** The synthetic corpus carries no natural PII, so the gate plants some
    * deterministically — docs ≡0 mod 7 gain an email, ≡0 mod 11 a phone
    * number (both derived from doc_id; the SQL mirror plants the exact
    * same bytes). What the OPERATOR gates is the scrub itself:
    * detection counts and the redacted length per document.
    */
  def piiAugmented(docs: DataFrame): Column =
    concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact u"), col("doc_id"), lit("@example.com now"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")))

  /** PII scrub: per-doc email/phone detection counts and the post-redaction
    * length. Per-row expressions only — codegen'd, shuffle-free, the shape
    * a 100 TB scrub pass needs (the scan is the cost; nothing else moves).
    */
  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), piiAugmented(docs).as("aug"))
      .select(col("doc_id"),
        regexp_count(col("aug"), lit(EmailPattern)).cast("long").as("n_emails"),
        regexp_count(col("aug"), lit(PhonePattern)).cast("long").as("n_phones"),
        length(regexp_replace(regexp_replace(col("aug"), EmailPattern, "[EMAIL]"),
          PhonePattern, "[PHONE]")).cast("long").as("clean_len"))
      .orderBy("doc_id")

  def piiScrubSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |         text
       |         || CASE WHEN doc_id % 7 = 0
       |                 THEN ' contact u' || doc_id || '@example.com now' ELSE '' END
       |         || CASE WHEN doc_id % 11 = 0
       |                 THEN ' call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END AS aug
       |  FROM documents)
       |SELECT doc_id,
       |       len(regexp_extract_all(aug, '$EmailPattern'))::BIGINT AS n_emails,
       |       len(regexp_extract_all(aug, '$PhonePattern'))::BIGINT AS n_phones,
       |       len(regexp_replace(regexp_replace(aug, '$EmailPattern', '[EMAIL]', 'g'),
       |                          '$PhonePattern', '[PHONE]', 'g'))::BIGINT AS clean_len
       |FROM aug ORDER BY doc_id""".stripMargin

  // ----- URL/domain extraction (t23) -----------------------------------

  val UrlDomainPattern = "https?://([a-z0-9.-]+)/"

  /** Domain inventory for URL-bearing docs (the domain-filtering half of a
    * crawl-curation pipeline). URLs are planted deterministically (docs ≡0
    * mod 5, domain keyed by doc_id mod 23) for the same reason as
    * [[piiAugmented]]; the operator is the extraction + per-domain rollup:
    * one scan, one hash shuffle on the (low-cardinality) domain.
    */
  def urlDomains(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        regexp_extract(
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" see https://site"), col("doc_id") % 23,
              lit(".example.org/p/"), col("doc_id"))).otherwise(col("text")),
          UrlDomainPattern, 1).as("domain"))
      .filter(col("domain") =!= "")
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"))
      .orderBy("domain")

  def urlDomainsSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 5 = 0
       |              THEN text || ' see https://site' || (doc_id % 23) || '.example.org/p/' || doc_id
       |              ELSE text END AS aug
       |  FROM documents),
       |d AS (SELECT doc_id, regexp_extract(aug, '$UrlDomainPattern', 1) AS domain FROM aug)
       |SELECT domain, COUNT(*) AS n_docs, SUM(doc_id)::BIGINT AS sum_ids
       |FROM d WHERE domain <> '' GROUP BY domain ORDER BY domain""".stripMargin

  // ----- shingle novelty (t24) -----------------------------------------

  /** Per-doc novelty: how many of a doc's distinct word-3-gram shingles
    * appear for the FIRST time (min doc_id over the corpus) in that doc —
    * the contribution score dedup-aware curation ranks by. Docs with < 3
    * tokens have no shingles and no row (same domain as the d2 family).
    *
    * Shape: the shingle relation is one scan + explode; first-occurrence
    * is a min-aggregate on the shingle key (map-side partial), and the
    * novelty rollup joins on the same key — two shuffles total, both on
    * the 8-byte hashed shingle, never on text.
    */
  def shingleNovelty(docs: DataFrame): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val sh = docs.repartition(par)
      .select(col("doc_id"),
        // array_distinct AFTER the hash: an in-doc hash collision merges to
        // one element on both engines (the hashedShingleRows discipline)
        explode(array_distinct(transform(shingles3(tokens(col("text"))),
          g => graft.functions.Hashing.hash60(g)))).as("shingle"))
      .localCheckpoint(true)
    val first = sh.groupBy("shingle").agg(min("doc_id").as("first_doc"))
    sh.join(first, "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .orderBy("doc_id")
  }

  // ----- corpus-adaptive stopwords (t26) --------------------------------

  /** Corpus-adaptive stopword discovery: tokens present in ≥
    * `minDfPermille`/1000 of documents (document frequency, not raw
    * count). The fixed English list ([[stopwords]]) misses domain noise
    * ("the" of a code corpus is `return`); df-driven discovery finds it.
    * Integer permille division keeps the threshold exact on both engines.
    * Shape: one doc-distinct explode + one token-key shuffle; the result
    * is vocabulary-sized (broadcastable back over the corpus as a filter).
    */
  def adaptiveStopwords(docs: DataFrame, minDfPermille: Int = 600): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .crossJoin(docs.agg(count(lit(1)).as("n_docs")))
      .withColumn("df_permille", expr("df * 1000 div n_docs"))
      .filter(col("df_permille") >= minDfPermille)
      .select("token", "df", "df_permille")
      .orderBy("token")

  def adaptiveStopwordsSql(minDfPermille: Int = 600): String =
    s"""WITH d AS (SELECT DISTINCT doc_id, token FROM (
       |       SELECT doc_id,
       |              unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS token
       |       FROM documents)),
       |f AS (SELECT token, COUNT(*) AS df FROM d GROUP BY token),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents)
       |SELECT token, df, df * 1000 // n_docs AS df_permille
       |FROM f CROSS JOIN n
       |WHERE df * 1000 // n_docs >= $minDfPermille ORDER BY token""".stripMargin

  // ----- HTML/markup stripping (t25) -----------------------------------

  val TagPattern = "<[^>]+>"

  /** Markup stripping (the boilerplate-removal step every crawl pipeline
    * runs before quality scoring): per-doc tag count and post-strip
    * length, with whitespace re-collapsed. Tags are planted
    * deterministically (docs ≡0 mod 3 get a <p>…</p><br/> wrap, ≡0 mod 13
    * a <div class="x">…</div> wrap) — same bytes in the mirror; per-row
    * regex expressions, shuffle-free.
    */
  def htmlStrip(docs: DataFrame): DataFrame = {
    val aug = concat(
      when(col("doc_id") % 13 === 0, lit("<div class=\"x\">")).otherwise(lit("")),
      when(col("doc_id") % 3 === 0, concat(lit("<p>"), col("text"), lit("</p><br/>")))
        .otherwise(col("text")),
      when(col("doc_id") % 13 === 0, lit("</div>")).otherwise(lit("")))
    docs.select(col("doc_id"), aug.as("aug"))
      .select(col("doc_id"),
        regexp_count(col("aug"), lit(TagPattern)).cast("long").as("n_tags"),
        length(regexp_replace(regexp_replace(col("aug"), TagPattern, " "),
          "[ ]+", " ")).cast("long").as("clean_len"))
      .orderBy("doc_id")
  }

  def htmlStripSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 13 = 0 THEN '<div class="x">' ELSE '' END
       |         || CASE WHEN doc_id % 3 = 0 THEN '<p>' || text || '</p><br/>' ELSE text END
       |         || CASE WHEN doc_id % 13 = 0 THEN '</div>' ELSE '' END AS aug
       |  FROM documents)
       |SELECT doc_id,
       |       len(regexp_extract_all(aug, '$TagPattern'))::BIGINT AS n_tags,
       |       len(regexp_replace(regexp_replace(aug, '$TagPattern', ' ', 'g'),
       |                          '[ ]+', ' ', 'g'))::BIGINT AS clean_len
       |FROM aug ORDER BY doc_id""".stripMargin

  /** Per-doc token-distribution Shannon entropy (nats, rounded 1e-6):
    * `(doc_id, n_tokens, n_distinct, entropy_6)` — the information-density
    * quality signal under perplexity-style corpus filters: near-zero
    * entropy flags degenerate repetition (a doc of one token), entropy at
    * `ln(n_distinct)` flags uniform word-soup; natural text sits between.
    * Complements t13's top-share ratios (those read the distribution's
    * head; entropy reads its whole shape).
    *
    * Computed as `ln(n) − Σ c·ln(c) / n` over per-token counts — one pass
    * over the counts instead of per-term `p·ln p`. The counts are SORTED
    * before the fold: both engines then sum identical doubles in identical
    * order, so the value is bit-reproducible cross-engine BEFORE the 1e-6
    * round (an unordered float sum would differ in the last ulps and
    * occasionally straddle a rounding boundary).
    *
    * Scale shape: embarrassingly parallel per-row HOF work (O(distinct·n)
    * in-row frequency scan on ≲10³-token docs, the [[repetitionStats]]
    * trade: exploding to a (doc, token) shuffle would move the corpus'
    * whole token stream to compute a per-document number); no exchange
    * before the output sort.
    */
  def tokenEntropy(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .withColumn("cnts", array_sort(
        transform(array_distinct(col("ws")), u => size(filter(col("ws"), x => x === u)))))
      .withColumn("n", size(col("ws")).cast("long"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        size(col("cnts")).cast("long").as("n_distinct"),
        when(col("n") === 0, lit(0.0)).otherwise(Num.round6(
          log(col("n").cast("double")) -
            aggregate(col("cnts"), lit(0.0),
              (acc, c) => acc + c.cast("double") * log(c.cast("double"))) / col("n")))
          .as("entropy_6"))
      .orderBy("doc_id")

  /** DuckDB mirror of [[tokenEntropy]] — same tokenization, same sorted
    * count fold (list_reduce in list order), same round.
    */
  val tokenEntropySql: String =
    s"""WITH t AS (SELECT doc_id,
       |                  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
       |           FROM documents),
       |c AS (SELECT doc_id, len(ws)::BIGINT AS n,
       |             list_sort(list_transform(list_distinct(ws), u -> len(list_filter(ws, x -> x = u)))) AS cnts
       |      FROM t)
       |SELECT doc_id, n AS n_tokens, len(cnts)::BIGINT AS n_distinct,
       |       CASE WHEN n = 0 THEN 0.0 ELSE ROUND(
       |         ln(n::DOUBLE) -
       |           list_reduce(list_prepend(0.0, list_transform(cnts, c -> c::DOUBLE * ln(c::DOUBLE))),
       |                       (a, b) -> a + b) / n, 6) + 0.0 END AS entropy_6
       |FROM c ORDER BY doc_id""".stripMargin

  /** Byte-pair-encoding MERGE TRAINING (Sennrich et al. 2016): learn the
    * first `numMerges` BPE merges from the corpus — the tokenizer-training
    * step every LLM data pipeline runs before tokenizing anything.
    * Each round counts adjacent symbol pairs over the WORD-TYPE vocabulary
    * weighted by corpus frequency, takes the most frequent pair (ties to
    * the lexicographically least `(lhs, rhs)`), and rewrites the vocabulary
    * with the merged symbol (greedy leftmost, non-overlapping). Words start
    * as characters plus a terminal `</w>` marker. Returns
    * `(rank, lhs, rhs, freq)` — the learned merge table in order; stops
    * early if the vocabulary runs out of pairs.
    *
    * Scale shape — the reason BPE training is feasible at 100 TB: the
    * corpus is touched exactly ONCE (the token-count groupBy, map-side
    * combined); every merge round then operates on the WORD-TYPE table —
    * vocabulary-sized (Heaps' law: ~10⁶ rows for a 10¹¹-token corpus),
    * independent of corpus size. Rounds are pure built-in expressions
    * (`transform` pair enumeration, `aggregate` fold for the rewrite) with
    * one vocabulary-sized aggregation each; only the 1-row argmax reaches
    * the driver per round. localCheckpoint truncates the per-round lineage.
    */
  def bpeTrainMerges(docs: DataFrame, numMerges: Int = 10): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = docs.select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("symbols",
        expr("concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), array('</w>'))"))
      .select("freq", "symbols")
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    var rank = 1
    while (rank <= numMerges && !exhausted) {
      val top = vocab
        .select(col("freq"), explode(expr(
          "transform(slice(symbols, 1, size(symbols) - 1), (s, i) -> struct(s AS lhs, element_at(symbols, i + 2) AS rhs))"))
          .as("pair"))
        .groupBy(col("pair.lhs").as("lhs"), col("pair.rhs").as("rhs"))
        .agg(sum(col("freq")).as("pfreq"))
        .orderBy(col("pfreq").desc, col("lhs"), col("rhs"))
        .limit(1)
        .collect() // 1-row argmax per round
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((rank.toLong, l, r, f))
        // greedy leftmost non-overlapping rewrite: a fold that merges the
        // accumulator's last symbol with the current one on a pair match
        vocab = vocab.withColumn("symbols", bpeMergeExpr(l, r))
          .localCheckpoint(true)
        rank += 1
      }
    }
    merges.toSeq.toDF("rank", "lhs", "rhs", "freq").orderBy("rank")
  }

  /** The greedy leftmost non-overlapping pair-merge rewrite, as a fold
    * expression (shared by [[bpeTrainMerges]]'s rounds and
    * [[bpeEncodeTop]]'s apply phase). Symbols are `[a-z0-9</>w]*` — no
    * quoting hazards in the literal.
    */
  private def bpeMergeExpr(l: String, r: String) = expr(
    s"""aggregate(symbols, CAST(array() AS array<string>), (acc, s) ->
       |  CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '$l' AND s = '$r'
       |       THEN concat(slice(acc, 1, size(acc) - 1), array('$l$r'))
       |       ELSE concat(acc, array(s)) END)""".stripMargin)

  /** BPE ENCODING — apply a learned merge table ([[bpeTrainMerges]]'s
    * output shape) to the corpus and report the `topN` most frequent
    * subword tokens `(subword, freq)`, ties to the lexicographically
    * smaller subword. The train→apply round trip is the full tokenizer
    * story: t29 learns the merges, this tokenizes with them — the
    * vocabulary a data pipeline ships to training.
    *
    * Scale shape: same as training — the corpus is touched once for the
    * word-type counts; the merge table is applied IN RANK ORDER as a chain
    * of `merges.size` fold expressions over the vocabulary-sized word
    * table in ONE plan (no per-merge materialization — encoding needs no
    * argmax barrier, unlike training), then one vocabulary-sized
    * aggregation for the subword counts.
    */
  def bpeEncodeTop(docs: DataFrame, merges: Seq[(String, String)],
                   topN: Int = 20): DataFrame = {
    val words = docs.select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("symbols",
        expr("concat(transform(sequence(1, length(word)), i -> substring(word, i, 1)), array('</w>'))"))
    // fold the merge chain in bounded-depth chunks: a checkpoint of the
    // (tiny, vocabulary-sized) word table every few merges caps the nested
    // HOF expression depth — analysis + codegen of a deeply composed fold
    // chain costs more than executing it (measured: 15s -> ~1s at sf0.1
    // for a 10-merge table), while the corpus is still only read once
    val encoded = merges.grouped(4).foldLeft(words) { (df, chunk) =>
      chunk.foldLeft(df) { case (d, (l, r)) =>
        d.withColumn("symbols", bpeMergeExpr(l, r))
      }.localCheckpoint(true)
    }
    encoded.select(explode(col("symbols")).as("subword"), col("freq"))
      .groupBy("subword").agg(sum(col("freq")).as("freq"))
      .orderBy(col("freq").desc, col("subword"))
      .limit(topN)
  }

  def shingleNoveltySql: String =
    s"""WITH ${shinglesSql(cte = "rawsh")},
       |sh AS (SELECT DISTINCT doc_id,
       |              ${graft.functions.Hashing.hash60Sql("shingle")} AS shingle
       |       FROM rawsh),
       |f AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
       |SELECT s.doc_id, COUNT(*) AS n_shingles,
       |       SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel
       |FROM sh s JOIN f ON s.shingle = f.shingle
       |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin

  /** Gopher-style composite quality rules (Rae et al. 2021 §A1.1 adapted to
    * the tokenizer): per document the rule signals — word count, mean word
    * length (integer thousandths), distinct-stopword presence, and the
    * top-word repetition ratio (integer thousandths — the "fraction of the
    * doc that is one token" repetition signal) — plus the composite `keep`
    * verdict under the threshold contract. ALL integer arithmetic
    * (count·1000 div count), so the gate compares exactly; the oracle is a
    * STATIC DuckDB mirror of the whole derivation.
    * `(doc_id, n_words, mean_len_e3, distinct_stop, top_ratio_e3, keep)`;
    * zero-token docs are absent (unscorable, a pipeline drops them
    * upstream).
    *
    * Scale shape: one pass for the per-doc aggregates (row-local array
    * expressions, no shuffle); the top-word count is the one exchange —
    * explode → (doc, token) count with map-side combine → per-doc max.
    * Everything exchanged is (long, long).
    */
  def gopherQualityFlags(docs: DataFrame,
                         minWords: Int = 40, maxWords: Int = 100000,
                         minMeanLenE3: Int = 3000, maxMeanLenE3: Int = 8000,
                         minDistinctStop: Int = 2,
                         maxTopRatioE3: Int = 120): DataFrame = {
    val toks = tokens(col("text"))
    val stop = typedLit(Classifier.Stopwords)
    val base = docs.filter(size(toks) >= 1)
      .select(col("doc_id").cast("long").as("doc_id"), toks.as("ws"))
    val f = base.select(col("doc_id"),
      size(col("ws")).cast("long").as("n"),
      aggregate(col("ws"), lit(0L), (acc, t) => acc + length(t)).as("char_sum"),
      size(array_distinct(filter(col("ws"), t => array_contains(stop, t))))
        .cast("long").as("distinct_stop"))
    val topC = base.select(col("doc_id"), explode(col("ws")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_c"))
    f.join(topC, "doc_id")
      .select(col("doc_id"),
        col("n").as("n_words"),
        expr("char_sum * 1000 div n").as("mean_len_e3"),
        col("distinct_stop"),
        expr("top_c * 1000 div n").as("top_ratio_e3"))
      .withColumn("keep",
        when(col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_len_e3") >= minMeanLenE3 && col("mean_len_e3") <= maxMeanLenE3 &&
          col("distinct_stop") >= minDistinctStop &&
          col("top_ratio_e3") <= maxTopRatioE3, 1L).otherwise(0L))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[gopherQualityFlags]] — same tokenizer, stopword
    * list, integer thousandths, and threshold contract.
    */
  def gopherQualityFlagsSql(minWords: Int = 40, maxWords: Int = 100000,
                            minMeanLenE3: Int = 3000, maxMeanLenE3: Int = 8000,
                            minDistinctStop: Int = 2,
                            maxTopRatioE3: Int = 120): String = {
    val stopList = Classifier.Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS ws
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, len(ws)::BIGINT AS n,
       |         list_sum(list_transform(ws, t -> len(t)))::BIGINT AS char_sum,
       |         len(list_distinct(list_filter(ws, t -> t IN ($stopList))))::BIGINT AS distinct_stop
       |  FROM toks WHERE len(ws) >= 1),
       |tc AS (
       |  SELECT doc_id, MAX(c) AS top_c
       |  FROM (SELECT doc_id, u.t, COUNT(*) AS c FROM toks, UNNEST(ws) AS u(t) GROUP BY 1, 2)
       |  GROUP BY 1)
       |SELECT f.doc_id, n AS n_words, char_sum * 1000 // n AS mean_len_e3,
       |       distinct_stop, top_c * 1000 // n AS top_ratio_e3,
       |       CASE WHEN n >= $minWords AND n <= $maxWords
       |             AND char_sum * 1000 // n BETWEEN $minMeanLenE3 AND $maxMeanLenE3
       |             AND distinct_stop >= $minDistinctStop
       |             AND top_c * 1000 // n <= $maxTopRatioE3
       |            THEN 1 ELSE 0 END::BIGINT AS keep
       |FROM f JOIN tc USING (doc_id) ORDER BY f.doc_id""".stripMargin
  }
}
