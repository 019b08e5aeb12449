package graft

import graft.llm.{Classifier, SequentialCorpus}
import org.apache.spark.sql.functions.col

class ClassifierSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("trainQualityLogReg learns a separable surface (100% train accuracy) and matches the mirror") {
    // positives: long technical prose, no stopwords; negatives: short,
    // stopword-saturated — separable on (length, stop-ratio)
    val pos = (0L until 12L).map(i =>
      (i, Seq.fill(30)(s"token$i payload entropy vector").mkString(" "), "en"))
    val neg = (12L until 24L).map(i =>
      (i, "the of to and in is it for", "de"))
    val rows = pos ++ neg
    val got = Classifier.trainQualityLogReg(docsDF(rows), col("lang") === "en")
      .head()
    val want = SequentialCorpus.logRegTrain(
      rows.map { case (_, t, l) => (t, if (l == "en") 1.0 else 0.0) })
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5)) === want)
    assert(got.getLong(4) === 24L, s"separable corpus must reach 24/24, got ${got.getLong(4)}")
  }

  test("trainQualityLogReg matches the mirror on a messy random corpus; empty docs excluded") {
    val rnd = new scala.util.Random(41)
    val words = Vector("the", "a", "data", "spark", "of", "row", "very", "plan", "cost", "x1")
    val rows = (0L until 40L).map { i =>
      val n = rnd.nextInt(30) // some docs empty
      val text = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
      (i, text, if (rnd.nextBoolean()) "en" else "zz")
    }
    val got = Classifier.trainQualityLogReg(docsDF(rows), col("lang") === "en", iters = 8)
      .head()
    val want = SequentialCorpus.logRegTrain(
      rows.map { case (_, t, l) => (t, if (l == "en") 1.0 else 0.0) }, iters = 8)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5)) === want)
    assert(got.getLong(5) === rows.count(_._2.trim.nonEmpty).toLong)
  }

  test("scoreDocs: stopword-heavy doc scores below stopword-free twin under a negative stop weight") {
    val rows = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "en"),
      (1L, "the of to and in is", "en"), // same token count, all stopwords
      (2L, "", "en")) // excluded
    val w = Seq(0L, 0L, 0L, -1000000000L) // score = −stop_ratio
    val got = Classifier.scoreDocs(docsDF(rows), w).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!got.contains(2L))
    assert(got(0L) === 0L && got(1L) === -1000000L)
  }
}
