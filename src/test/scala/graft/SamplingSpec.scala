package graft

import graft.llm.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{coalesce, col}

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

  private def wdocs(rows: Seq[(Long, String, Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "lang", "w")
  }

  test("weightedSample: exactly k per stratum, ranks follow the quantized priorities, reproducible") {
    val rows = (1L to 200L).map(i => (i, if (i % 2 == 0) "en" else "de", 1L + i % 17))
    val got = Sampling.weightedSample(wdocs(rows), "lang", "doc_id", "w", k = 7, seed = 3L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.groupBy(_._1).forall(_._2.length === 7))
    got.groupBy(_._1).foreach { case (_, g) =>
      val byRank = g.sortBy(_._4)
      assert(byRank.map(_._4).toSeq === (1L to 7L),
        "ranks must be dense 1..k")
      assert(byRank.map(_._3).toSeq === byRank.map(_._3).toSeq.sorted.reverse,
        "priority must be non-increasing in rank")
    }
    val again = Sampling.weightedSample(wdocs(rows), "lang", "doc_id", "w", k = 7, seed = 3L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.toSeq.sorted === again.toSeq.sorted)
  }

  test("weightedSample: inclusion probability grows with weight (A-ES property, across seeds)") {
    // one heavy doc (w=40) among 40 light docs (w=1): under A-ES its
    // inclusion probability in a k=5 sample is ~1 - C(40,5)/C(44,5)-ish
    // (far above the uniform 5/41); count hits across seeds
    val rows = (1L to 41L).map(i => (i, "en", if (i == 7L) 40L else 1L))
    val hits = (1L to 30L).count { seed =>
      Sampling.weightedSample(wdocs(rows), "lang", "doc_id", "w", k = 5, seed = seed)
        .collect().exists(_.getLong(0) == 7L)
    }
    // uniform would hit ~30*5/41 ≈ 3.7; weighted expectation is ~25+
    assert(hits >= 20, s"heavy doc sampled only $hits/30 times — weighting not effective")
  }

  test("weightedSample: adding rows never changes an existing row's priority (content-addressed)") {
    val base = wdocs((1L to 50L).map(i => (i, "en", 3L)))
    val grown = wdocs((1L to 80L).map(i => (i, "en", 3L)))
    def prios(df: DataFrame) =
      Sampling.weightedSample(df, "lang", "doc_id", "w", k = 1000, seed = 9L)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val (p1, p2) = (prios(base), prios(grown))
    assert(p1.forall { case (id, p) => p2(id) == p })
  }

  test("weightedSample: non-positive weights raise; column collisions rejected") {
    intercept[Exception] {
      Sampling.weightedSample(wdocs(Seq((1L, "en", 0L))), "lang", "doc_id", "w",
        k = 1, seed = 1L).collect()
    }
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(
        wdocs(Seq((1L, "en", 1L))).withColumn("priority_q", org.apache.spark.sql.functions.lit(1L)),
        "lang", "doc_id", "w", k = 1, seed = 1L)
    }
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

  test("tokenBudgetMixture: budget enforced per source, boundary doc dropped, reproducible") {
    val s = spark
    import s.implicits._
    // source A: 6 docs x 4 tokens; source B: 2 docs x 4 tokens (under
    // budget -> all admitted). Budget 10 admits exactly 2 docs of A (the
    // third would make cum 12 > 10) in seeded-shuffle order.
    val d = ((1L to 6L).map(i => (i, "one two three four", "A")) ++
      (7L to 8L).map(i => (i, "one two three four", "B")))
      .toDF("doc_id", "text", "source")
    def run() = Sampling.tokenBudgetMixture(d, budgetPerSource = 10L, seed = 11L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val got = run()
    assert(got === Seq(("A", 2L, 8L), ("B", 2L, 8L)), s"got $got")
    assert(run() === got, "content-addressed: identical across runs")
    // a larger budget admits more of A, never reorders B
    val wide = Sampling.tokenBudgetMixture(d, budgetPerSource = 100L, seed = 11L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(wide === Seq(("A", 6L, 24L), ("B", 2L, 8L)))
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

  test("dsirWeights: target-vocabulary docs outscore off-target; equals the independent mirror") {
    val s = spark
    import s.implicits._
    val rows: Seq[(Long, String, String)] = Seq(
      // target slice (en) speaks one vocabulary, the rest another
      (0L, "alpha beta gamma alpha beta", "en"),
      (1L, "beta gamma alpha gamma", "en"),
      (2L, "zulu yankee xray zulu", "de"),
      (3L, "xray zulu yankee", "fr"),
      // candidates: one target-like, one off-target, one mixed, one empty
      (4L, "alpha beta alpha", "de"),
      (5L, "zulu xray zulu", "es"),
      (6L, "alpha zulu", "es"),
      (7L, "###", "es"))
    val d = rows.toDF("doc_id", "text", "lang")
    val got = Sampling.dsirWeights(d, targetLang = "en", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === graft.llm.SequentialCorpus.dsirWeights(rows, targetLang = "en", buckets = 64))
    val byId = got.toMap
    assert(!byId.contains(7L), "zero-token doc must be absent")
    assert(byId(4L) > byId(6L) && byId(6L) > byId(5L),
      s"target-like > mixed > off-target, got $byId")
    // absolute sign is smoothing-dependent on a tiny corpus (raw ⊇ target),
    // but the off-target doc must score clearly negative
    assert(byId(5L) < 0)
  }

  test("group-keyed splits keep every near-dup cluster whole (the p9 leak-proof rule)") {
    val s = spark
    import s.implicits._
    // three exact-duplicate families (near-dup clusters by construction)
    // plus singletons — shared sentence bases long enough to shingle
    val fam = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten eleven",
      "red orange yellow green blue indigo violet pink brown black")
    val docs = (0L until 30L).map { i =>
      val t = if (i < 9) fam((i % 3).toInt) else s"unique words for doc $i nothing shared here at all"
      (i, t)
    }.toDF("doc_id", "text")
    val keyed = docs.select(col("doc_id"))
      .join(graft.llm.Dedup.nearDupClusters(docs), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("keeper"), col("doc_id")).as("gkey"))
    val split = Sampling.assignSplits(keyed, "gkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every group maps to exactly one split
    val perGroup = split.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(perGroup.values.forall(_.size == 1),
      s"a near-dup cluster straddles splits: $perGroup")
    // the three dup families really are 3 groups of 3
    val famGroups = split.filter(_._1 < 9).groupBy(_._2)
    assert(famGroups.size === 3 && famGroups.values.forall(_.length == 3))
  }
}
