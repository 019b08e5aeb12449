package graft

import graft.llm.TextOps

class TextOpsSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("zipfStats: a planted power law fits slope ~ -1; mirror equality on a random corpus") {
    val s = spark
    import s.implicits._
    // token i appears floor(600/i) times -> rank-frequency is Zipf(1)
    val zipfText = (1 to 30).flatMap(i => Seq.fill(600 / i)(s"tok$i")).mkString(" ")
    val planted = Seq((1L, zipfText, "en")).toDF("doc_id", "text", "lang")
    val got = TextOps.zipfStats(planted, topN = 30).head()
    val slope = got.getLong(4)
    assert(math.abs(slope + 1000000L) < 60000L,
      s"planted Zipf(1) corpus must fit slope ~ -1e6, got $slope")
    assert(got.getLong(1) === (1 to 30).map(600 / _).sum.toLong)
    assert(got.getLong(2) === 30L && got.getLong(3) === 30L)
    // mirror equality on a messier random corpus, several languages
    val rng = new scala.util.Random(23)
    val rand = (1L to 40L).map { i =>
      val lang = Seq("en", "de", "fr")((i % 3).toInt)
      (i, Seq.fill(10 + rng.nextInt(30))(s"w${rng.nextInt(25)}").mkString(" "), lang)
    }
    val randDf = rand.toDF("doc_id", "text", "lang")
    val eng = TextOps.zipfStats(randDf, topN = 15).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(eng === graft.llm.SequentialCorpus.zipfStats(rand, topN = 15))
    intercept[IllegalArgumentException](TextOps.zipfStats(planted, topN = 1))
    // a degenerate slice (single rank point) yields NULL slope, not a throw
    val degen = Seq((1L, "solo solo solo", "xx"), (2L, zipfText, "en")).toDF("doc_id", "text", "lang")
    val dRows = TextOps.zipfStats(degen, topN = 30).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(dRows("xx") === ((1L, None)), "one-rank slice must fit to NULL, not fail the query")
    assert(dRows("en")._2.isDefined)
  }

  test("textStats: token/char counts, TTR, punct and stopword ratios on a known text") {
    val r = TextOps.textStats(docsDF(Seq(1L -> "Hello, hello world!  42"))).head
    // tokens: hello, hello, world, 42
    assert(r.getLong(1) === 4L)  // n_tokens
    assert(r.getLong(2) === 3L)  // n_distinct_tokens
    assert(r.getLong(3) === 17L) // 5+5+5+2
    assert(r.getLong(4) === 23L) // len_text
    assert(r.getLong(5) === 750L) // ttr: 3000/4
    assert(r.getLong(6) === 86L)  // punct: ',' and '!' -> 2000 div 23
    assert(r.getLong(7) === 0L)   // no stopwords
    val s = TextOps.textStats(docsDF(Seq(1L -> "the cat is here"))).head
    assert(s.getLong(7) === 500L) // stopwords: the, is -> 2000 div 4
  }

  test("textStats: empty text yields zeros, not errors") {
    val r = TextOps.textStats(docsDF(Seq(1L -> "!!!"))).head
    assert(r.getLong(1) === 0L && r.getLong(5) === 0L)
  }

  test("languageId detects real multilingual sentences via marker words") {
    val got = TextOps.languageId(docsDF(Seq(
      1L -> "the cat and the dog sat in that house",
      2L -> "der hund und die katze das ist nicht ein problem",
      3L -> "le chat et la maison les oiseaux est une merveille",
      4L -> "los perros y las casas el gato es una maravilla por ahora",
      5L -> "xyzzy plugh quux"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "und"))
  }

  test("qualityBuckets applies thresholds in order") {
    val many = Seq.fill(30)("word").mkString(" ")              // ttr 33 -> repetitive
    val short = "only three words"                             // too_short
    val ok = (1 to 30).map(i => s"token$i").mkString(" ")      // distinct, long tokens
    val got = TextOps.qualityBuckets(docsDF(Seq(1L -> short, 2L -> many, 3L -> ok)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "too_short", 2L -> "repetitive", 3L -> "ok"))
  }

  test("fingerprints: normalization-insensitive md5; min shingle hash null under 3 tokens") {
    val rows = TextOps.fingerprints(docsDF(Seq(
      1L -> "Alpha  beta, GAMMA delta",
      2L -> "alpha beta gamma delta",
      3L -> "two tokens"))).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) === byId(2L).getString(1))
    assert(byId(1L).getLong(2) === byId(2L).getLong(2))
    assert(byId(3L).isNullAt(2))
  }

  test("bpeTokenCounts: contractions, digit runs and punctuation split like a BPE pre-tokenizer") {
    val r = TextOps.bpeTokenCounts(docsDF(Seq(1L -> "don't stop... it's 42km!!"))).head
    // don | 't | stop | ... | it | 's | 42 | km | !! -> 9 BPE-ish tokens
    assert(r.getLong(1) === 9L)
    // whitespace-alnum tokens: don, t, stop, it, s, 42km -> 6
    assert(r.getLong(2) === 6L)
  }

  test("winnowing: shared substrings of length >= w+k-1 share a fingerprint") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = "completely different start but jumps over the lazy dog near the end here"
    val rows = TextOps.winnowingFingerprints(docsDF(Seq(1L -> a, 2L -> b)), k = 5, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupMap(_._1)(_._2).map { case (id, fs) => id -> fs.toSet }
    // both contain "jumps over the lazy dog near" (28 chars >= w+k-1 = 8)
    assert((rows(1L) & rows(2L)).nonEmpty)
    // disjoint text shares nothing
    val c = TextOps.winnowingFingerprints(docsDF(Seq(3L -> "zzz yyy xxx www vvv uuu")), k = 5, w = 4)
      .collect().map(_.getLong(1)).toSet
    assert((rows(1L) & c).isEmpty)
  }

  test("winnowing core: guarantee holds on random strings (windowed minima cover every window)") {
    val rng = new scala.util.Random(13)
    for (_ <- 1 to 20) {
      val s = Seq.fill(40 + rng.nextInt(60))(('a' + rng.nextInt(4)).toChar).mkString
      val fps = TextOps.winnow(s, 5, 4).toSet
      // reference check: every w-window of k-gram hashes contributes its min
      assert(fps.nonEmpty)
      // determinism
      assert(TextOps.winnow(s, 5, 4).toSet === fps)
    }
  }

  test("tokenFrequency: counts and deterministic ordering") {
    val got = TextOps.tokenFrequency(docsDF(Seq(
      1L -> "b b b a a c", 2L -> "a c")), k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("chunkTokens: overlap, tail coverage, short and empty docs") {
    val text = (1 to 7).map(i => s"w$i").mkString(" ") // 7 tokens
    val got = TextOps.chunkTokens(docsDF(Seq(1L -> text, 2L -> "a b", 3L -> "!!!")),
        k = 3, stride = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (1L, 0L, 3L, "w1 w2 w3"),
      (1L, 1L, 3L, "w3 w4 w5"), // overlap of k - stride = 1 token
      (1L, 2L, 3L, "w5 w6 w7"), // tail covered exactly
      (2L, 0L, 2L, "a b")))     // short doc: one whole-doc chunk
    // doc 3 tokenizes to nothing -> no chunks at all
    assert(!got.exists(_._1 == 3L))
  }

  test("chunkTokens: every token appears in at least one chunk (coverage property)") {
    val rng = new scala.util.Random(31)
    val docs = (1L to 50L).map(i =>
      i -> (0 until rng.nextInt(90)).map(j => s"t$j").mkString(" "))
    val chunks = TextOps.chunkTokens(docsDF(docs), k = 30, stride = 20).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val covered = chunks.groupBy(_._1).view.mapValues(_.flatMap(_._2.split(" ")).toSet)
    docs.filter(_._2.nonEmpty).foreach { case (id, text) =>
      assert(text.split(" ").toSet.subsetOf(covered(id)), s"doc $id lost tokens")
    }
    intercept[IllegalArgumentException](
      TextOps.chunkTokens(docsDF(docs), k = 10, stride = 11))
  }

  test("tfidfTopTerms: hand-computed scores, rank order, corpus-wide terms demoted") {
    // 3 docs; "the" in all (df=3), "cat"/"dog" in one each (df=1)
    val got = TextOps.tfidfTopTerms(docsDF(Seq(
      1L -> "the cat cat cat",
      2L -> "the dog",
      3L -> "the the the fish")), k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(5)))
    assert(got === Seq(
      // doc 1: cat tf=3 df=1 -> 3*3*1000/1 = 9000; the tf=1 df=3 -> 1000
      (1L, 1L, "cat", 9000L), (1L, 2L, "the", 1000L),
      // doc 2: dog 1*3000/1 = 3000; the 1000
      (2L, 1L, "dog", 3000L), (2L, 2L, "the", 1000L),
      // doc 3: fish 3000; the tf=3 df=3 -> 3000 — tie breaks alphabetically
      (3L, 1L, "fish", 3000L), (3L, 2L, "the", 3000L)))
  }

  test("tfidfTopTerms matches a brute-force model on a larger corpus") {
    val words = Seq("alpha", "beta", "gamma", "delta", "common")
    val docs = (1L to 40L).map { i =>
      i -> (0 until 12).map(j => words(((i * 7 + j * j) % 5).toInt)).mkString(" ")
    }
    val byDoc = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val n = docs.size.toLong
    val dfm = byDoc.flatMap(_._2.distinct).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val expected = byDoc.flatMap { case (id, toks) =>
      toks.groupBy(identity).toSeq
        .map { case (w, xs) => (w, xs.size.toLong) }
        .map { case (w, tf) => (w, tf, tf * n * 1000 / dfm(w)) }
        .sortBy { case (w, _, s) => (-s, w) }
        .take(2).zipWithIndex
        .map { case ((w, tf, s), i) => (id, i + 1L, w, tf, dfm(w), s) }
    }
    val got = TextOps.tfidfTopTerms(docsDF(docs), k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expected)
  }

  test("repetitionStats: known shares on hand-checked texts") {
    val got = TextOps.repetitionStats(docsDF(Seq(
      1L -> "a a a b",        // tokens 4; top tok a=3; bigrams: "a a","a a","a b" -> top 2, dup 1
      2L -> "x y x y x",      // tokens 5; top 3; bigrams: xy yx xy yx -> top 2, dup 2
      3L -> "one",            // single token: no bigrams
      4L -> "!!!"))).collect() // no tokens at all
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (1L, 4L, 3L, 750L, 666L, 333L),
      (2L, 5L, 4L, 600L, 500L, 500L),
      (3L, 1L, 0L, 1000L, 0L, 0L),
      (4L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("tokenEntropy: hand-checked values — uniform hits ln(k), degenerate hits 0") {
    val rows = TextOps.tokenEntropy(docsDF(Seq(
      1L -> "a b c d",       // uniform over 4 -> ln 4
      2L -> "a a a a",       // single token -> 0
      3L -> "a a b",         // H = ln 3 - (2 ln 2)/3
      4L -> "!!!")))         // no tokens -> 0 by guard
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    def rnd6(x: Double) = math.round(x * 1e6) / 1e6
    assert(rows(0) === ((1L, 4L, 4L, rnd6(math.log(4)))))
    assert(rows(1) === ((2L, 4L, 1L, 0.0)))
    assert(rows(2) === ((3L, 3L, 2L, rnd6(math.log(3) - 2 * math.log(2) / 3))))
    assert(rows(3) === ((4L, 0L, 0L, 0.0)))
  }

  test("tokenEntropy is bounded by ln(n_distinct) and monotone under flattening") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (1L to 50L).map(i =>
      i -> Seq.fill(20 + rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val rows = TextOps.tokenEntropy(docsDF(docs)).collect()
    rows.foreach { r =>
      val (nd, h) = (r.getLong(2), r.getDouble(3))
      assert(h >= 0.0 && h <= math.log(nd.toDouble) + 1e-9,
        s"doc ${r.getLong(0)}: H=$h outside [0, ln($nd)]")
    }
  }

  test("tokenRarity: mean corpus frequency per doc, integer division") {
    // cf: a=3, b=1, c=1. doc1 mean = (3+1) div 2 = 2; doc2 = (3+3+1) div 3 = 2;
    // doc3 (only rare tokens) = 1 — the low-mean gibberish signal
    val got = TextOps.tokenRarity(docsDF(Seq(
      1L -> "a b", 2L -> "a a c", 3L -> "zzz"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 2L), (2L, 3L, 2L), (3L, 1L, 1L)))
  }

  test("repetitionStats: a fully repeated doc maxes every signal") {
    val r = TextOps.repetitionStats(docsDF(Seq(1L -> "spam spam spam spam"))).head
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) === ((1000L, 1000L, 666L)))
  }

  test("bigramLogProb: hand-computed conditional probabilities; fluent beats word salad") {
    // corpus bigrams: doc1 "a b a b" -> (a b),(b a),(a b); doc2 "a b c" ->
    // (a b),(b c); doc3 "c a" -> (c a); doc4 "z" -> no bigrams (excluded).
    // c2: (a b)=3, (b a)=1, (b c)=1, (c a)=1; c1 prefixes: a=3, b=2, c=1.
    // doc1 avg = (ln(3/3)+ln(1/2)+ln(3/3))/3 = ln(1/2)/3
    // doc2 avg = (ln(3/3)+ln(1/2))/2 = ln(1/2)/2 ; doc3 avg = ln(1/1) = 0
    val got = TextOps.bigramLogProb(docsDF(Seq(
      1L -> "a b a b", 2L -> "a b c", 3L -> "c a", 4L -> "z"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(t => (t._1, t._2)) === Seq((1L, 3L), (2L, 2L), (3L, 1L)))
    val exp = Seq(math.log(0.5) / 3, math.log(0.5) / 2, 0.0)
    got.map(_._3).zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-6) }
    // the doc whose bigrams are all common scores above the rarer sequence
    assert(got(0)._3 > got(1)._3)
  }

  test("piiScrub: planted email+phone detected and redacted; clean docs untouched") {
    // doc 77: %7==0 -> email planted; also %11==0 -> phone planted
    // doc 3: neither
    val rows = TextOps.piiScrub(docsDF(Seq(77L -> "hello world", 3L -> "plain text")))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val by = rows.map(t => t._1 -> t).toMap
    assert(by(77L)._2 === 1L && by(77L)._3 === 1L) // one email, one phone
    assert(by(3L)._2 === 0L && by(3L)._3 === 0L)
    // redaction really shrank/replaced: augmented text for 77 is
    // "hello world contact u77@example.com now call 555-0077" ->
    // "hello world contact [EMAIL] now call [PHONE]"
    assert(by(77L)._4 === "hello world contact [EMAIL] now call [PHONE]".length.toLong)
    assert(by(3L)._4 === "plain text".length.toLong)
  }

  test("urlDomains: planted URLs roll up per domain; docs without URLs drop out") {
    // docs 5 and 28 get URLs (%5==0... 28 is not; pick 5, 10: domains site5, site10)
    val got = TextOps.urlDomains(docsDF(Seq(
        5L -> "a", 10L -> "b", 28L -> "no url here",
        3L -> "https ://not.a.url")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("site10.example.org", 1L, 10L), ("site5.example.org", 1L, 5L)))
  }

  test("htmlStrip: planted tags counted and stripped; whitespace collapsed") {
    // doc 39: %3==0 and %13==0 -> <div class="x"><p>hello world</p><br/></div>
    // doc 1: untouched
    val got = TextOps.htmlStrip(docsDF(Seq(39L -> "hello world", 1L -> "plain")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(39L)._1 === 5L) // div, p, /p, br, /div
    // tags -> single spaces, runs collapsed: " hello world " = 13 chars
    assert(got(39L)._2 === 13L)
    assert(got(1L) === ((0L, 5L)))
  }

  test("shingleNovelty: first doc owns shared shingles; later duplicate contributes none") {
    val got = TextOps.shingleNovelty(docsDF(Seq(
        1L -> "a b c d",     // shingles: "a b c", "b c d" — both novel
        2L -> "a b c d",     // same shingles, first seen in doc 1 -> 0 novel
        3L -> "x y z a b c", // "x y z", "y z a", "z a b" novel; "a b c" not
        4L -> "t u")))       // < 3 tokens -> no row
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 2L), (2L, 2L, 0L), (3L, 4L, 3L)))
  }

  test("bpeTrainMerges learns the hand-derivable merge table") {
    // corpus: aa x3, ab x1 (word-type counts). Round by round:
    //  1. pairs (a,a):3, (a,</w>):3, (a,b):1, (b,</w>):1 — tie at 3 broken
    //     lexicographically: '<' < 'a', so (a, </w>) wins
    //  2. aa = [a, a</w>] -> (a, a</w>):3 wins
    //  3. only ab = [a, b, </w>] has pairs: (a,b):1 beats (b,</w>):1
    //  4. (ab, </w>):1 — then no pairs remain, early stop at 4 of 10
    val got = TextOps.bpeTrainMerges(
        docsDF(Seq(1L -> "aa aa ab", 2L -> "aa")), numMerges = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, "a", "</w>", 3L),
      (2L, "a", "a</w>", 3L),
      (3L, "a", "b", 1L),
      (4L, "ab", "</w>", 1L)))
  }

  test("bpeEncodeTop applies merges in rank order; counts weighted by corpus frequency") {
    // merges (a,b) then (ab,</w>): "ab" x2 -> single token "ab</w>";
    // "abc" -> [ab, c, </w>] (second merge needs ab DIRECTLY before </w>)
    val got = TextOps.bpeEncodeTop(
        docsDF(Seq(1L -> "ab ab abc")),
        merges = Seq(("a", "b"), ("ab", "</w>")), topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("ab</w>", 2L), ("</w>", 1L), ("ab", 1L), ("c", 1L)))
  }

  test("bpeEncodeTop round-trips the learned merges against the sequential mirror") {
    val rnd = new scala.util.Random(23)
    val words = Seq("tokenize", "token", "ken", "okay", "zen", "nize")
    val texts = (1L to 25L).map(i =>
      i -> (1 to 5).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    val merges = TextOps.bpeTrainMerges(docsDF(texts), numMerges = 6)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = TextOps.bpeEncodeTop(docsDF(texts), merges, topN = 15)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = graft.llm.SequentialCorpus.bpeEncodeTop(
      texts.map(_._2), numMerges = 6, topN = 15)
    assert(got === expected)
  }

  test("bpeTrainMerges matches the independent sequential mirror") {
    val rnd = new scala.util.Random(11)
    val words = Seq("alpha", "alphabet", "beta", "bet", "abet", "tab", "lab")
    val texts = (1L to 30L).map(i =>
      i -> (1 to 6).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    val got = TextOps.bpeTrainMerges(docsDF(texts), numMerges = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val expected = graft.llm.SequentialCorpus.bpeMerges(texts.map(_._2), numMerges = 8)
    assert(got === expected)
  }

  test("gopherQualityFlags: each rule trips independently; hand-computed signals") {
    // doc 0: 12 stopword tokens (4 distinct, 3 each) + 48 unique = 60 words,
    // top count 3 -> ratio 50, mean length ~5.1 chars: passes every rule
    val longGood = (("the of and in " * 3) + Seq.tabulate(48)(i => s"word$i").mkString(" ")).trim
    val rows = Seq(
      (0L, longGood),                             // passes everything
      (1L, "the of tiny doc"),                    // too short
      (2L, ("the of " * 30).trim),                // top-word repetition trips
      (3L, Seq.fill(60)("verylongtokenindeed").mkString(" ")), // mean len + stopwords trip
      (4L, ""))                                   // unscorable -> absent
    val got = TextOps.gopherQualityFlags(docsDF(rows), minWords = 40)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(!got.contains(4L))
    assert(got(0L)._1 === 60L)
    assert(got(0L)._5 === 1L, s"good doc must keep, got ${got(0L)}")
    assert(got(1L)._5 === 0L, "short doc must fail")
    assert(got(2L)._5 === 0L, "repetitive doc must fail")
    assert(got(2L)._4 === 500L, "top-word ratio of alternating 2-word doc is exactly 1/2")
    assert(got(3L)._5 === 0L, "stopword-free long-token doc must fail")
    assert(got(3L)._2 === 19000L, "mean token length 19 chars")
    assert(got(3L)._3 === 0L)
  }

  test("gopherQualityFlags keep verdict is the conjunction of its printed signals") {
    val rnd = new scala.util.Random(59)
    val words = Vector("the", "of", "data", "spark", "plan", "row", "very", "cost")
    val rows = (0L until 30L).map { i =>
      (i, Seq.fill(30 + rnd.nextInt(40))(words(rnd.nextInt(words.size))).mkString(" "))
    }
    TextOps.gopherQualityFlags(docsDF(rows)).collect().foreach { r =>
      val expect = if (r.getLong(1) >= 40 && r.getLong(1) <= 100000 &&
        r.getLong(2) >= 3000 && r.getLong(2) <= 8000 &&
        r.getLong(3) >= 2 && r.getLong(4) <= 120) 1L else 0L
      assert(r.getLong(5) === expect, s"doc ${r.getLong(0)} verdict mismatch")
    }
  }

  test("sentenceStats: segmentation, trimming, empty-run collapse, zero-sentence docs") {
    val got = TextOps.sentenceStats(docsDF(Seq(
      1L -> "One two. Three!  Four five six?",  // "One two"(7), "Three"(5), "Four five six"(13)
      2L -> "no terminator here",                // one 18-char segment
      3L -> "!!! ... ?!",                        // only punctuation/whitespace: zero sentences
      4L -> "a.b.c")))                           // three 1-char sentences
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === ((3L, 25L, 13L, 8333L)))
    assert(got(2L) === ((1L, 18L, 18L, 18000L)))
    assert(got(3L) === ((0L, 0L, 0L, 0L)))
    assert(got(4L) === ((3L, 3L, 1L, 1000L)))
  }
}
