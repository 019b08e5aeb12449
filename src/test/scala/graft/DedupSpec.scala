package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions.col

class DedupSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val fixture = docsDF(Seq(
    1L -> "a b c d e f",
    2L -> "a b c d e g", // 3-of-5 shingle overlap with doc 1 => J = 0.6
    3L -> "x y z w v u",
    4L -> "a b c d e f", // exact dup of doc 1
    5L -> "zz"))         // < 3 tokens: no shingles

  test("exactDedup groups identical texts under the min doc_id") {
    val m = Dedup.exactDedup(fixture).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) === (1L, 2L) && m(4L) === (1L, 2L))
    assert(m(2L) === (2L, 1L) && m(3L) === (3L, 1L) && m(5L) === (5L, 1L))
  }

  test("jaccardPairs finds exactly the overlapping pairs with exact counts") {
    val rows = Dedup.jaccardPairs(fixture, thresholdMille = 500).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    // (1,2): inter 3, union 5, J=0.6; (1,4)/(2,4): dup pair mirrors; 3,5 isolated
    assert(rows === Set((1L, 2L, 3L, 5L, 600L), (1L, 4L, 4L, 4L, 1000L), (2L, 4L, 3L, 5L, 600L)))
  }

  test("minHashLshPairs output equals the exact similarity join on the fixture") {
    val exact = Dedup.jaccardPairs(fixture).collect().map(_.toSeq).toSet
    val lsh = Dedup.minHashLshPairs(fixture).collect().map(_.toSeq).toSet
    assert(lsh === exact)
  }

  test("blockDedup keeps first occurrences only, intra-doc repeats included") {
    val docs = docsDF(Seq(
      1L -> "a b c d e f",     // blocks: [a b c] [d e f]
      2L -> "a b c x y z",     // [a b c] repeats doc 1's first block
      3L -> "p q r p q r",     // intra-doc repeat: second [p q r] is a dup
      4L -> "s t"))            // < blockLen tokens: no full block, excluded
    val m = Dedup.blockDedup(docs, blockLen = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m === Map(
      1L -> (2L, 2L, 1000L),
      2L -> (2L, 1L, 500L),
      3L -> (2L, 1L, 500L)))
  }

  test("nearDupClusters merges non-transitive chains under the min doc_id") {
    // fixture pairs: (1,2) J=0.6, (1,4) dup, (2,4) J=0.6 — one cluster
    // {1,2,4} with keeper 1; docs 3 and 5 have no pairs and stay out
    val got = Dedup.nearDupClusters(fixture).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
    // chain case: 10~11 (J=3/4) and 11~12 (J=3/5) but 10≁12 (J=2/5 < τ).
    // Near-dup is NOT transitive; resolution must be — the closure puts
    // all three in one cluster anyway
    val chain = docsDF(Seq(
      10L -> "a b c d e",   // shingles {abc,bcd,cde}
      11L -> "a b c d e f", // {abc,bcd,cde,def}
      12L -> "b c d e f g"))// {bcd,cde,def,efg}
    val pairs = Dedup.minHashLshPairs(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 11L), (11L, 12L)), s"chain precondition broke: $pairs")
    val gotChain = Dedup.nearDupClusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotChain === Map(10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("qualityKeepers picks the LONGEST cluster member, not the min id") {
    // the chain cluster {10,11,12}: min-id keeper is 10, but 11 and 12
    // have 6 tokens vs 10's 5 — the quality policy must pick 11 (longest,
    // tie to the smaller id)
    val chain = docsDF(Seq(
      10L -> "a b c d e",
      11L -> "a b c d e f",
      12L -> "b c d e f g"))
    val got = Dedup.qualityKeepers(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((10L, 3L, 11L, 6L)),
      s"expected cluster 10 with keeper 11 (6 tokens, tie-break beats 12): $got")
  }

  test("prefix filtering loses no pairs vs a brute-force Scala oracle on random docs") {
    // small vocab forces heavy shingle sharing — the hostile case for
    // prefix filtering
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 24L).map(i => i -> Seq.fill(6 + rng.nextInt(10))(vocab(rng.nextInt(5))).mkString(" "))
    def shingles(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = shingles(ta); sb = shingles(tb)
      inter = (sa & sb).size; un = (sa | sb).size
      if un > 0 && inter * 1000 >= 500 * un
    } yield (ia, ib, inter.toLong, un.toLong, inter * 1000L / un)).toSet
    val got = Dedup.jaccardPairs(docsDF(docs), 500).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got === expected)
  }

  test("ngramJaccardPairs matches a brute-force char-gram oracle; short texts drop out") {
    val rng = new scala.util.Random(11)
    val alpha = "abcd "
    val docs = (1L to 20L).map(i =>
      i -> Seq.fill(8 + rng.nextInt(20))(alpha(rng.nextInt(alpha.length))).mkString) ++
      Seq(21L -> "abc", 22L -> "") // below n=5: no shingles, never paired
    def grams(t: String) = t.toLowerCase.sliding(5).filter(_.length == 5).toSet
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = grams(ta); sb = grams(tb)
      inter = (sa & sb).size; un = (sa | sb).size
      if un > 0 && inter * 1000 >= 600 * un
    } yield (ia, ib, inter.toLong, un.toLong, inter * 1000L / un)).toSet
    val got = Dedup.ngramJaccardPairs(docsDF(docs), n = 5, thresholdMille = 600).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got === expected)
    assert(!got.exists(p => p._1 >= 21L || p._2 >= 21L))
  }

  test("ngramJaccardPairs: case-insensitive, near-identical docs pair at tau=0.7") {
    val got = Dedup.ngramJaccardPairs(docsDF(Seq(
      1L -> "The quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog!",
      3L -> "completely unrelated content with nothing shared")), n = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }

  test("simHashPairs: identical docs at hamming 0; banding finds what all-pairs finds") {
    val docs = docsDF(Seq(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "totally different words here now"))
    val got = Dedup.simHashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.contains((1L, 2L, 0L)))
    // all-pairs oracle over the same simhashes
    val sims = Dedup.simHash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (for {
      a <- sims.keys; b <- sims.keys if a < b
      h = java.lang.Long.bitCount(sims(a) ^ sims(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got.toSet === expected)
  }

  test("fuzzyDecontaminate: only train-vs-eval pairs; near-identical leakage caught") {
    // eval doc = id % 29 == 0. Doc 29 is eval; doc 1 is a light paraphrase
    // of it (one word changed), doc 2 identical to doc 1 (train-train pair
    // must NOT appear), doc 3 unrelated.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = docsDF(Seq(
      29L -> base,
      1L -> base.replace("kappa", "lambda"),
      2L -> base.replace("kappa", "lambda"),
      3L -> "one two three four five six seven eight nine ten"))
    val got = Dedup.fuzzyDecontaminate(docs, evalMod = 29, thresholdMille = 500)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 29L), (2L, 29L)))
    // exact-dup train pair (1, 2) correctly absent: this operator reports
    // CONTAMINATION, not dedup — and the identical eval doc itself never
    // shows up on the train side
    assert(!got.exists { case (t, e) => e % 29 != 0 || t % 29 == 0 })
  }

  test("spanDedup merges overlapping windows into maximal spans, counts positions once") {
    val docs = docsDF(Seq(
      // two separated 8-token spans, each duplicated elsewhere
      1L -> "a1 a2 a3 a4 a5 a6 a7 a8 f1 f2 f3 b1 b2 b3 b4 b5 b6 b7 b8",
      2L -> "a1 a2 a3 a4 a5 a6 a7 a8",
      3L -> "b1 b2 b3 b4 b5 b6 b7 b8",
      // 9-token doc fully duplicated: two OVERLAPPING windows merge to ONE
      // 9-position span
      4L -> "m1 m2 m3 m4 m5 m6 m7 m8 m9",
      5L -> "m1 m2 m3 m4 m5 m6 m7 m8 m9",
      // clean doc: all-zero row; short doc: excluded (< 8 tokens)
      6L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
      7L -> "tiny doc"))
    val got = Dedup.spanDedup(docs, k = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === ((19L, 2L, 16L, 2L)), "two disjoint spans of 8, 2 dup windows")
    assert(got(2L) === ((8L, 1L, 8L, 1L)))
    assert(got(3L) === ((8L, 1L, 8L, 1L)))
    assert(got(4L) === ((9L, 2L, 9L, 1L)), "overlapping windows merge; position 1..8 counted once")
    assert(got(5L) === ((9L, 2L, 9L, 1L)))
    assert(got(6L) === ((10L, 0L, 0L, 0L)), "clean doc zero-filled")
    assert(!got.contains(7L), "docs under k tokens have no windows")
  }

  test("spanScrub keeps the canonical occurrence and reassembles the survivors") {
    val docs = docsDF(Seq(
      1L -> "a1 a2 a3 a4 a5 a6 a7 a8 f1 f2 f3 b1 b2 b3 b4 b5 b6 b7 b8",
      2L -> "a1 a2 a3 a4 a5 a6 a7 a8",
      3L -> "b1 b2 b3 b4 b5 b6 b7 b8",
      4L -> "m1 m2 m3 m4 m5 m6 m7 m8 m9",
      5L -> "m1 m2 m3 m4 m5 m6 m7 m8 m9",
      6L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10",
      7L -> "tiny doc"))
    val got = Dedup.spanScrub(docs, k = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 holds the canonical copies (smallest doc_id) — untouched
    assert(got(1L) === ((19L, 0L, "a1 a2 a3 a4 a5 a6 a7 a8 f1 f2 f3 b1 b2 b3 b4 b5 b6 b7 b8")))
    assert(got(2L) === ((8L, 8L, "")), "non-canonical copy fully cut")
    assert(got(3L) === ((8L, 8L, "")))
    assert(got(4L) === ((9L, 0L, "m1 m2 m3 m4 m5 m6 m7 m8 m9")))
    assert(got(5L) === ((9L, 9L, "")), "two overlapping cut windows cover all 9 positions once")
    assert(got(6L) === ((10L, 0L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")), "clean doc untouched")
    assert(got(7L) === ((2L, 0L, "tiny doc")), "sub-k docs pass through (unlike the report)")
    // conservation: survivors = n_tokens - n_removed, for every doc
    got.values.foreach { case (n, rem, text) =>
      val kept = if (text.isEmpty) 0 else text.split(" ").length
      assert(kept === (n - rem))
    }
  }

  test("spanScrub cuts SELF-duplicated spans, keeping the first occurrence") {
    val docs = docsDF(Seq(
      1L -> "x1 x2 x3 x4 x5 x6 x7 x8 z x1 x2 x3 x4 x5 x6 x7 x8"))
    val got = Dedup.spanScrub(docs, k = 8).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).head
    assert(got === ((17L, 8L, "x1 x2 x3 x4 x5 x6 x7 x8 z")))
  }

  test("persisted dedup index: probe equals the cross-side slice of the batch operator; append == rebuild") {
    // synthetic corpus with planted cross-side near-dups: evens are the
    // historical corpus, odds the incoming shard; odd 2k+1 near-duplicates
    // even 2k for k % 3 == 0
    val docs = (0L until 40L).map { i =>
      val base = (0 until 12).map(j => s"w${(i / 2 * 7 + j) % 50}").mkString(" ")
      if (i % 2 == 1 && (i / 2) % 3 == 0) (i, base) // near-dup of i-1 (same text)
      else (i, base + s" u$i a$i b$i")
    }
    val d = docsDF(docs)
    val root = java.nio.file.Files.createTempDirectory("graft-dedupidx-spec").toString
    val v0 = Dedup.buildDedupIndex(d.filter(col("doc_id") % 4 === 0), root)
    assert(v0 === 0L)
    Dedup.appendDedupIndex(d.filter(col("doc_id") % 4 === 2), root)
    val probe = Dedup.dedupAgainstIndex(d.filter(col("doc_id") % 2 =!= 0), root)
    val got = probe.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    // reference: the batch pair operator over the union, restricted to
    // cross-side pairs (the even side listed as doc_old)
    val all = Dedup.minHashLshPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .collect {
        case (a, b, j) if a % 2 == 0 && b % 2 == 1 => (b, a, j)
        case (a, b, j) if a % 2 == 1 && b % 2 == 0 => (a, b, j)
      }.sortBy(p => (p._1, p._2)).toSeq
    assert(got === all)
    assert(got.nonEmpty, "planted cross-side near-dups must surface")
    // the committed index is the probe's historical input: every file the
    // probe reads beyond the shard itself lives under the index root
    val files = probe.inputFiles
    assert(files.nonEmpty && files.forall(f => f.contains("bands") || f.contains("shingles")),
      s"probe must read committed index tables only, saw ${files.mkString(", ")}")
    // the manifest pinned shingles+bands together per build/append, and the
    // v0 probe replays the build-only (doc_id % 4 == 0) index exactly
    import graft.operators.IndexManifest
    assert(IndexManifest.versions(spark, root) === Seq(0L, 1L))
    assert(IndexManifest.resolve(spark, root, Some(1L))
      === Map("shingles" -> 1L, "bands" -> 1L))
    val at0 = Dedup.dedupAgainstIndexAt(d.filter(col("doc_id") % 2 =!= 0), root, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    assert(at0 === all.filter(_._2 % 4 == 0),
      "the v0 probe must see only the build-batch historical docs")
    val at1 = Dedup.dedupAgainstIndexAt(d.filter(col("doc_id") % 2 =!= 0), root, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    assert(at1 === got, "the head pin must equal the live probe")
  }

  test("persisted dedup index property: probe == cross-side batch slice on random corpora") {
    // three random corpora with heavy shingle sharing (small vocab) — the
    // hostile case for banding consistency across the index split
    for (seed <- Seq(3, 17, 91)) {
      val rng = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      val docs = (1L to 30L).map(i =>
        i -> Seq.fill(5 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size))).mkString(" "))
      val d = docsDF(docs)
      val root = java.nio.file.Files.createTempDirectory(s"graft-dedupidx-prop$seed").toString
      Dedup.buildDedupIndex(d.filter(col("doc_id") % 2 === 0), root)
      val probe = Dedup.dedupAgainstIndex(d.filter(col("doc_id") % 2 =!= 0), root)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
      val expected = Dedup.minHashLshPairs(d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
        .collect {
          case (a, b, j) if a % 2 == 0 && b % 2 == 1 => (b, a, j)
          case (a, b, j) if a % 2 == 1 && b % 2 == 0 => (a, b, j)
        }.sortBy(p => (p._1, p._2)).toSeq
      assert(probe === expected, s"seed $seed diverged")
    }
  }

  test("d19 probe plan: candidates come from an equi join — no cartesian, no nested loop") {
    val docs = docsDF((1L to 20L).map(i => i -> s"w${i % 3} w${i % 5} w${i % 7} pad$i x y"))
    val root = java.nio.file.Files.createTempDirectory("graft-dedupidx-plan").toString
    Dedup.buildDedupIndex(docs.filter(col("doc_id") % 2 === 0), root)
    val probe = Dedup.dedupAgainstIndex(docs.filter(col("doc_id") % 2 =!= 0), root)
    val plan = probe.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "the band probe must stay an equi join:\n" + plan)
  }

  test("spanScrub: planted corpus-wide hot window — one survivor, no rank-window skew path") {
    // the round-11 documented residual: ONE phrase duplicated across the
    // whole corpus. The canonical pick must be a map-side-combined
    // min-aggregate (each partition ships one candidate per h), never a
    // per-h rank window that would sort the hot h's entire occurrence
    // list in one partition.
    val hot = "h1 h2 h3 h4 h5 h6 h7 h8"
    val docs = docsDF((1L to 80L).map(i => i -> s"$hot u${i}a u${i}b u${i}c"))
    val scrub = Dedup.spanScrub(docs, k = 8)
    val got = scrub.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 keeps the canonical copy; every other doc loses exactly the 8
    // hot positions and keeps its unique filler
    assert(got(1L) === ((11L, 0L, s"$hot u1a u1b u1c")))
    (2L to 80L).foreach { i =>
      assert(got(i) === ((11L, 8L, s"u${i}a u${i}b u${i}c")), s"doc $i")
    }
    // plan audit: no Window operator anywhere in the scrub plan — the
    // canonical pick is aggregate+join, which partial-aggregates under
    // skew and lets AQE split the join
    val plan = scrub.queryExecution.executedPlan.toString
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window ["),
      "spanScrub must not rank-window the hot hash:\n" + plan)
  }
}
