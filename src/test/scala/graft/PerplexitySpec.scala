package graft

import graft.llm.{Perplexity, SequentialCorpus}
import org.apache.spark.sql.DataFrame

/** CCNet perplexity bucketing: mirror equality, likelihood ordering, and
  * the threshold/guard contracts.
  */
class PerplexitySpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  private def run(rows: Seq[(Long, String, String)], headE6: Long = 3419000L,
                  tailE6: Long = 3427000L): Seq[(Long, Long, Long, String)] =
    Perplexity.ccnetScore(docs(rows), headE6 = headE6, tailE6 = tailE6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

  test("matches the independent sequential mirror row-for-row") {
    val rows = (1L to 60L).map { i =>
      val lang = Seq("en", "en", "en", "de", "fr")((i % 5).toInt)
      val words = (0 until (4 + (i % 6).toInt)).map(j => s"tok${(i * 13 + j * 5) % 9}")
      (i, words.mkString(" "), lang)
    } :+ (61L, "", "en") // zero-token doc must be absent on both sides
    assert(run(rows) === SequentialCorpus.ccnetScores(rows))
    assert(!run(rows).exists(_._1 == 61L))
  }

  test("reference-like docs score lower per-token NLL than off-distribution docs") {
    // heavy "aa bb" reference mass; doc 10 repeats it, doc 11 is all-unseen
    val ref = (1L to 8L).map(i => (i, "aa bb aa bb aa bb", "en"))
    val rows = ref ++ Seq((10L, "aa bb aa bb", "xx"), (11L, "qq rr ss tt", "xx"))
    val byId = run(rows).map(r => r._1 -> r._3).toMap
    assert(byId(10L) < byId(11L),
      s"in-distribution doc must be more likely: ${byId(10L)} vs ${byId(11L)}")
  }

  test("thresholds cut head/middle/tail as declared") {
    val ref = (1L to 8L).map(i => (i, "aa bb aa bb aa bb", "en"))
    val rows = ref ++ Seq((10L, "aa bb aa bb", "xx"), (11L, "qq rr ss tt", "xx"))
    val scores = run(rows).map(r => r._1 -> r._3).toMap
    val (lo, hi) = (scores(10L), scores(11L))
    assert(lo < hi)
    // place the cuts around the two observed scores: 10 → head, 11 → tail,
    // and with both cuts above hi everything is head
    val cut = run(rows, headE6 = lo + 1, tailE6 = hi)
    assert(cut.find(_._1 == 10L).get._4 === "head")
    assert(cut.find(_._1 == 11L).get._4 === "tail")
    val mid = run(rows, headE6 = lo, tailE6 = hi + 1)
    assert(mid.find(_._1 == 10L).get._4 === "middle", "npt == head cut falls in middle")
    assert(mid.find(_._1 == 11L).get._4 === "middle")
  }

  test("lmLangId matches the independent mirror and separates disjoint vocabularies") {
    // two languages with DISJOINT vocab: predictions must be exact
    val rows = (1L to 10L).map(i => (i, "aa bb cc aa bb", "en")) ++
      (11L to 20L).map(i => (i, "xx yy zz xx yy", "de")) :+
      (21L, "", "en") // zero-token doc absent
    val langs = Seq("de", "en")
    val got = graft.llm.Perplexity.lmLangId(docs(rows), langs)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === SequentialCorpus.lmLangId(rows, langs))
    assert(got.forall(_._4 == 1L), "disjoint vocabularies must classify perfectly")
    assert(got.forall(_._3 > 0L), "disjoint vocabularies must leave a positive margin")
    assert(!got.exists(_._1 == 21L))
  }

  test("lmLangId: identical models tie with margin 0, lexicographic winner") {
    // both langs see the same token stream -> identical NLLs everywhere
    val rows = Seq((1L, "aa bb", "en"), (2L, "aa bb", "de"))
    val got = graft.llm.Perplexity.lmLangId(docs(rows), Seq("de", "en"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, "de", 0L), (2L, "de", 0L)))
    intercept[IllegalArgumentException]( // unsorted langs break the tie contract
      graft.llm.Perplexity.lmLangId(docs(rows), Seq("en", "de")))
  }

  private def runNgram(rows: Seq[(Long, String, String)]): Seq[(Long, Long, Long, String)] =
    Perplexity.ngramScore(docs(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

  test("ngramScore matches the independent sequential backoff mirror row-for-row") {
    val rows = (1L to 60L).map { i =>
      val lang = Seq("en", "en", "en", "de", "fr")((i % 5).toInt)
      val words = (0 until (4 + (i % 6).toInt)).map(j => s"tok${(i * 13 + j * 5) % 9}")
      (i, words.mkString(" "), lang)
    } :+ (61L, "", "en") // zero-token doc must be absent on both sides
    assert(runNgram(rows) === SequentialCorpus.ngramScores(rows))
    assert(!runNgram(rows).exists(_._1 == 61L))
  }

  test("ngramScore: seen trigrams beat backed-off and unseen text; order-3 beats unigram on word order") {
    // reference corpus = repeated phrase; doc 10 repeats it in ORDER, doc
    // 11 uses the same unigrams SHUFFLED (a unigram model cannot tell them
    // apart — the trigram level must), doc 12 is fully unseen
    val phrase = "the cat sat on the mat"
    val ref = (1L to 8L).map(i => (i, phrase, "en"))
    val rows = ref ++ Seq(
      (10L, phrase, "xx"),
      (11L, "mat the on sat cat the", "xx"),
      (12L, "qq rr ss tt uu vv", "xx"))
    val byId = runNgram(rows).map(r => r._1 -> r._3).toMap
    assert(byId(10L) < byId(11L),
      s"in-order text must beat shuffled same-unigram text: ${byId(10L)} vs ${byId(11L)}")
    assert(byId(11L) < byId(12L),
      s"seen-unigram text must beat fully unseen text: ${byId(11L)} vs ${byId(12L)}")
    // the unigram model is blind to the reorder — same tokens, same npt
    val uni = run(rows).map(r => r._1 -> r._3).toMap
    assert(uni(10L) === uni(11L), "unigram control: shuffle must NOT change t38's score")
  }

  test("order-5 ngramScore matches the recursive order-N mirror; order-3 path unchanged") {
    val rows = (1L to 60L).map { i =>
      val lang = Seq("en", "en", "en", "de", "fr")((i % 5).toInt)
      val words = (0 until (5 + (i % 7).toInt)).map(j => s"tok${(i * 13 + j * 5) % 9}")
      (i, words.mkString(" "), lang)
    } :+ (61L, "", "en")
    def runN(o: Int) = Perplexity.ngramScore(docs(rows), order = o)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(runN(5) === SequentialCorpus.ngramScoresN(rows, 5))
    // the generalized chain at order 3 reproduces the original operator AND
    // the original order-3 mirror — the t41 contract is untouched
    assert(runN(3) === SequentialCorpus.ngramScores(rows))
    assert(SequentialCorpus.ngramScoresN(rows, 3) === SequentialCorpus.ngramScores(rows))
  }

  test("order-5 model separates in-distribution from off-distribution text") {
    // reference = one repeated 6-gram phrase; doc 10 repeats it in order
    // (seen 5-grams all the way), doc 11 shuffles the same unigrams, doc
    // 12 is fully unseen — NLL must order 10 < 11 < 12 at order 5
    val phrase = "the cat sat on the mat"
    val ref = (1L to 8L).map(i => (i, phrase, "en"))
    val rows = ref ++ Seq(
      (10L, phrase, "xx"),
      (11L, "mat the on sat cat the", "xx"),
      (12L, "qq rr ss tt uu vv", "xx"))
    val byId = Perplexity.ngramScore(docs(rows), order = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(10L) < byId(11L),
      s"in-distribution (seen 5-grams) must beat shuffled: ${byId(10L)} vs ${byId(11L)}")
    assert(byId(11L) < byId(12L),
      s"seen-unigram text must beat fully unseen text: ${byId(11L)} vs ${byId(12L)}")
    // order 5 discriminates in-order text HARDER than order 3 does: the
    // margin between ordered and shuffled must grow with the order
    val by3 = Perplexity.ngramScore(docs(rows), order = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(11L) - byId(10L) > by3(11L) - by3(10L),
      "the order-5 margin must exceed the order-3 margin on word order")
  }

  test("ngramScore guards: empty reference slice and inverted thresholds are loud") {
    intercept[IllegalArgumentException](
      Perplexity.ngramScore(docs(Seq((1L, "a b", "de"))), refLang = "en").collect())
    intercept[IllegalArgumentException](
      Perplexity.ngramScore(docs(Seq((1L, "a b", "en"))), headE6 = 10L, tailE6 = 5L))
    intercept[IllegalArgumentException](
      Perplexity.ngramScore(docs(Seq((1L, "a b", "en"))), buckets = 0))
    intercept[IllegalArgumentException](
      Perplexity.ngramScore(docs(Seq((1L, "a b", "en"))), order = 1))
  }

  test("guards: empty reference slice and inverted thresholds are loud") {
    intercept[IllegalArgumentException](
      Perplexity.ccnetScore(docs(Seq((1L, "a b", "de"))), refLang = "en").collect())
    intercept[IllegalArgumentException](
      Perplexity.ccnetScore(docs(Seq((1L, "a b", "en"))), headE6 = 5L, tailE6 = 4L))
  }
}
