package graft

import graft.llm.Sampling
import org.apache.spark.sql.DataFrame

/** Determinism/stability contracts of the content-addressed sampling ops. */
class SamplingSpec extends SparkSpec {

  private def docs(ids: Seq[Long]): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
  }

  private def splitsOf(df: DataFrame): Map[Long, String] =
    Sampling.assignSplits(df, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap

  test("assignSplits is exhaustive, deterministic, and roughly proportional") {
    val a = splitsOf(docs(1L to 1000L))
    assert(a.size === 1000)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(splitsOf(docs(1L to 1000L)) === a, "same input must produce identical assignment")
    val train = a.values.count(_ == "train")
    // 90% nominal; hash uniformity keeps it near — loose 3-sigma-ish bounds
    assert(train > 850 && train < 950, s"train split $train of 1000 is far from 90%")
    assert(a.values.count(_ == "val") > 0 && a.values.count(_ == "test") > 0)
  }

  test("assignSplits: growing the corpus never reassigns existing keys") {
    val before = splitsOf(docs(1L to 300L))
    val after = splitsOf(docs(1L to 600L))
    assert(before.forall { case (k, s) => after(k) == s },
      "content addressing must keep old keys' splits fixed when rows are added")
  }

  test("assignSplits honors custom weights and rejects bad ones") {
    val half = Sampling.assignSplits(docs(1L to 400L), "doc_id",
      splits = Seq("a" -> 1, "b" -> 1)).collect().map(_.getString(2))
    val nA = half.count(_ == "a")
    assert(nA > 140 && nA < 260, s"50/50 split came out $nA/400")
    intercept[IllegalArgumentException](
      Sampling.assignSplits(docs(Seq(1L)), "doc_id", splits = Seq.empty))
    intercept[IllegalArgumentException](
      Sampling.assignSplits(docs(Seq(1L)), "doc_id", splits = Seq("a" -> 0)))
    intercept[IllegalArgumentException]( // duplicate names
      Sampling.assignSplits(docs(Seq(1L)), "doc_id", splits = Seq("a" -> 1, "a" -> 1)))
    intercept[IllegalArgumentException]( // names land in SQL literals
      Sampling.assignSplits(docs(Seq(1L)), "doc_id", splits = Seq("a'b" -> 1)))
  }

  test("appended-column name collisions are rejected, not silently clobbered") {
    val s = spark
    import s.implicits._
    val hasSplit = Seq((1L, "x")).toDF("doc_id", "split")
    intercept[IllegalArgumentException](Sampling.assignSplits(hasSplit, "doc_id"))
    val hasKey = Seq((1L, 9L)).toDF("doc_id", "shuffle_key")
    intercept[IllegalArgumentException](
      Sampling.deterministicSample(hasKey, "doc_id", k = 1, seed = 7L))
  }

  test("deterministicSample: fixed size, reproducible, seed-sensitive") {
    val d = docs(1L to 500L)
    def sample(seed: Long) =
      Sampling.deterministicSample(d, "doc_id", k = 40, seed = seed)
        .collect().map(_.getLong(0)).toSeq
    val s7 = sample(7L)
    assert(s7.size === 40 && s7.distinct.size === 40)
    assert(sample(7L) === s7, "same seed must reproduce the same ordered sample")
    assert(sample(8L) !== s7, "a different seed should draw a different sample")
  }

  test("stratifiedSample: exactly k per stratum regardless of stratum skew; reproducible") {
    val s = spark
    import s.implicits._
    // heavily skewed strata: 300 'en', 30 'de', 4 'fr' (< k -> take all 4)
    val d = ((1L to 300L).map(i => (i, "en")) ++ (301L to 330L).map(i => (i, "de")) ++
      (331L to 334L).map(i => (i, "fr"))).toDF("doc_id", "lang")
    def run() = Sampling.stratifiedSample(d, "lang", "doc_id", k = 10, seed = 3L)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSeq
    val got = run()
    val byLang = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byLang === Map("en" -> 10, "de" -> 10, "fr" -> 4))
    assert(run() === got, "content-addressed: identical across runs")
  }
}
