package graft.llm

/** Plain in-memory sequential mirrors for the corpus/vector operators whose
  * semantics are not ANSI-SQL-expressible (iterative fixpoints with argmax
  * steps) — the oracle discipline [[graft.graph.SequentialModel]] set for
  * the graph family, applied to the LLM-pipeline family: straightforward
  * loops sharing NO code with the distributed paths, emitted as `VALUES`
  * literals by `SparkEntry.dynamicOracleSql`.
  *
  * Float discipline (matching the distributed contracts): every dot product
  * is a strict left-to-right loop; per-row values entering any
  * order-insensitive sum are first quantized to integer nano-units
  * ([[nano]]) so the sums are EXACT longs on both engines; k-means
  * centroids are then quantized to the 1e-6 grain each round (half-even,
  * `math.rint`), so both engines iterate from EXACTLY equal centroids and
  * every comparison agrees bit-for-bit — equality by construction, with no
  * reliance on rounding absorbing last-bit drift.
  */
object SequentialCorpus {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Half-up quantization to integer nano-units — the mirror of the
    * distributed side's `round(col * 1e9).cast("long")` per-row
    * quantization. Per-row inputs are identical doubles on both engines, so
    * the longs agree; summing longs is exact and order-independent, which
    * is what makes the cluster means / inertias / silhouettes engine-equal
    * by construction rather than by last-bits luck.
    */
  private def nano(x: Double): Long =
    BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def dot(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def sqDist(e: IndexedSeq[Double], c: IndexedSeq[Double]): Double = {
    var c2 = 0.0
    c.foreach(x => c2 += x * x)
    dot(e, e) - 2.0 * dot(e, c) + c2
  }

  /** Shared Lloyd core: final centroids after `numIter` rounds (mirror of
    * `Similarity.kMeansAssign`'s contract).
    */
  private def kMeansCentroids(vecs: Seq[(Long, IndexedSeq[Double])], k: Int,
                              numIter: Int): IndexedSeq[IndexedSeq[Double]] = {
    val sorted = vecs.sortBy(_._1)
    var cents: IndexedSeq[IndexedSeq[Double]] =
      sorted.take(k).map(_._2).toIndexedSeq
    for (_ <- 1 to numIter) {
      val cs = cents
      val members = sorted.groupBy { case (_, e) => assignTo(cs, e) }
      cents = cents.zipWithIndex.map { case (old, i) =>
        members.get(i) match {
          case Some(ms) =>
            IndexedSeq.tabulate(old.length) { j =>
              var s = 0L
              ms.foreach { case (_, e) => s += nano(e(j)) }
              math.rint(s.toDouble / 1e9 / ms.size * 1e6) / 1e6
            }
          case None => old
        }
      }
    }
    cents
  }

  private def assignTo(cents: IndexedSeq[IndexedSeq[Double]],
                       e: IndexedSeq[Double]): Int = {
    var best = 0
    var bestD = sqDist(e, cents(0))
    var i = 1
    while (i < cents.length) {
      val d = sqDist(e, cents(i))
      if (d < bestD) { best = i; bestD = d } // strict <: first minimum wins
      i += 1
    }
    best
  }

  /** Lloyd k-means; mirror of `Similarity.kMeans`'s deterministic contract.
    * Returns `(cluster, n, inertia_6)` sorted by cluster.
    */
  def kMeans(vecs: Seq[(Long, IndexedSeq[Double])], k: Int,
             numIter: Int): Seq[(Long, Long, Double)] = {
    val cents = kMeansCentroids(vecs, k, numIter)
    vecs.groupBy { case (_, e) => assignTo(cents, e) }.toSeq
      .map { case (c, ms) =>
        var inertia = 0L
        ms.foreach { case (_, e) => inertia += nano(sqDist(e, cents(c))) }
        (c.toLong, ms.size.toLong, round6(inertia.toDouble / 1e9))
      }
      .sortBy(_._1)
  }

  /** Simplified silhouette; mirror of `Similarity.kMeansSilhouette`.
    * Returns `(cluster, n, silhouette_6)` sorted by cluster.
    */
  def kMeansSilhouette(vecs: Seq[(Long, IndexedSeq[Double])], k: Int,
                       numIter: Int): Seq[(Long, Long, Double)] = {
    val cents = kMeansCentroids(vecs, k, numIter)
    vecs.groupBy { case (_, e) => assignTo(cents, e) }.toSeq
      .map { case (c, ms) =>
        var sum = 0L
        ms.foreach { case (_, e) =>
          val a = math.sqrt(sqDist(e, cents(c)))
          var bMin = Double.PositiveInfinity
          cents.indices.foreach { i =>
            if (i != c) bMin = math.min(bMin, sqDist(e, cents(i)))
          }
          val b = math.sqrt(bMin)
          sum += nano((b - a) / math.max(a, b))
        }
        (c.toLong, ms.size.toLong, round6(sum.toDouble / 1e9 / ms.size))
      }
      .sortBy(_._1)
  }

  /** Greedy MMR selection; mirror of `Similarity.mmrSelect`. Returns
    * `(pos, vec_id, score_6)` in selection order (pos 1-based).
    */
  def mmr(vecs: Seq[(Long, IndexedSeq[Double])], queryId: Long, k: Int,
          poolSize: Int, lambda: Double): Seq[(Long, Long, Double)] = {
    val norms = vecs.map { case (id, e) => id -> math.sqrt(dot(e, e)) }.toMap
    val byId = vecs.toMap
    val qe = byId(queryId)
    val qn = norms(queryId)
    val pool = vecs.filter(_._1 != queryId)
      .map { case (id, e) => (id, e, norms(id), dot(e, qe) / (norms(id) * qn)) }
      .sortWith((a, b) => a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
      .take(poolSize)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, IndexedSeq[Double], Double)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var pos = 1
    while (pos <= k && selected.size < pool.size) {
      var best: Option[(Long, IndexedSeq[Double], Double, Double)] = None
      pool.foreach { case (id, e, n, rel) =>
        if (!selected.exists(_._1 == id)) {
          val penalty =
            if (selected.isEmpty) 0.0
            else selected.map { case (_, se, sn) => dot(e, se) / (n * sn) }.max
          val score = lambda * rel - (1.0 - lambda) * penalty
          if (best.forall(b => score > b._4 || (score == b._4 && id < b._1)))
            best = Some((id, e, n, score))
        }
      }
      best match {
        case Some((id, e, n, score)) =>
          out += ((pos.toLong, id, round6(score)))
          selected += ((id, e, n))
          pos += 1
        case None => pos = k + 1
      }
    }
    out.toSeq
  }

  /** BPE encoding; mirror of `TextOps.bpeEncodeTop` — trains `numMerges`
    * merges via [[bpeMerges]]'s logic, applies them in rank order, and
    * returns the `topN` subword counts `(subword, freq)`, ties to the
    * lexicographically smaller subword.
    */
  def bpeEncodeTop(texts: Seq[String], numMerges: Int,
                   topN: Int): Seq[(String, Long)] = {
    val merges = bpeMerges(texts, numMerges).map { case (_, l, r, _) => (l, r) }
    val freqs = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(t => t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .foreach(w => freqs(w) = freqs.getOrElse(w, 0L) + 1L))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    freqs.foreach { case (w, f) =>
      var syms: Vector[String] = w.map(_.toString).toVector :+ "</w>"
      merges.foreach { case (l, r) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += syms(i); i += 1 }
        }
        syms = b.result()
      }
      syms.foreach(s => counts(s) = counts.getOrElse(s, 0L) + f)
    }
    counts.toSeq.sortBy { case (s, f) => (-f, s) }.take(topN)
  }

  /** BPE merge training; mirror of `TextOps.bpeTrainMerges`. Returns
    * `(rank, lhs, rhs, freq)` in merge order. Tokenization matches
    * `TextOps.tokens`: lowercase, split on `[^a-z0-9]+`, empties dropped.
    */
  def bpeMerges(texts: Seq[String], numMerges: Int): Seq[(Long, String, String, Long)] = {
    val freqs = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(t => t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .foreach(w => freqs(w) = freqs.getOrElse(w, 0L) + 1L))
    var vocab: Seq[(Vector[String], Long)] =
      freqs.toSeq.map { case (w, f) => (w.map(_.toString).toVector :+ "</w>", f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), f) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank.toLong, l, r, f))
        // greedy leftmost non-overlapping scan (independent of the
        // distributed path's fold formulation; provably the same rewrite)
        vocab = vocab.map { case (syms, wf) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), wf)
        }
        rank += 1
      }
    }
    out.toSeq
  }

  /** Micro-quantization (half-up) — the mirror of the distributed side's
    * per-coordinate `round(x * 1e6).cast("long")`.
    */
  private def micro(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def q9(x: Double): Double = math.rint(x * 1e9) / 1e9

  /** PCA spectrum; mirror of `Similarity.pcaSpectrum`'s contract: exact
    * integer (S, P) sums over micro-quantized coordinates, covariance in
    * the contract's fixed op order, cyclic Jacobi with the whole state
    * 1e-9-quantized after each sweep, eigenvalues ranked (desc, index).
    * Returns `(component, eigenvalue_e9, evr_ppm)`.
    */
  def pcaSpectrum(vecs: Seq[(Long, IndexedSeq[Double])], topK: Int = 16,
                  sweeps: Int = 10): Seq[(Long, Long, Long)] = {
    require(vecs.nonEmpty, "pca mirror needs vectors")
    val d = vecs.head._2.length
    val n = vecs.size.toLong
    val q = vecs.map { case (_, e) => e.map(micro) }
    val sVec = Array.ofDim[Long](d)
    val p = Array.ofDim[Long](d, d)
    q.foreach { row =>
      var j = 0
      while (j < d) {
        sVec(j) += row(j)
        var k = j
        while (k < d) { p(j)(k) += row(j) * row(k); k += 1 }
        j += 1
      }
    }
    for (j <- 0 until d; k <- (j + 1) until d) p(k)(j) = p(j)(k)
    val a = Array.tabulate(d, d) { (j, k) =>
      q9((p(j)(k).toDouble / n - (sVec(j).toDouble / n) * (sVec(k).toDouble / n)) / 1e12)
    }
    var trace = 0.0
    for (i <- 0 until d) trace += a(i)(i)
    for (_ <- 1 to sweeps) {
      var pp = 0
      while (pp < d) {
        var qq = pp + 1
        while (qq < d) {
          val apq = a(pp)(qq)
          if (apq != 0.0) {
            val tau = (a(qq)(qq) - a(pp)(pp)) / (2.0 * apq)
            val t = if (tau >= 0) 1.0 / (tau + math.sqrt(1.0 + tau * tau))
                    else 1.0 / (tau - math.sqrt(1.0 + tau * tau))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(pp); val aiq = a(i)(qq)
              a(i)(pp) = c * aip - s * aiq
              a(i)(qq) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(pp)(i); val aqi = a(qq)(i)
              a(pp)(i) = c * api - s * aqi
              a(qq)(i) = s * api + c * aqi
              i += 1
            }
          }
          qq += 1
        }
        pp += 1
      }
      for (i <- 0 until d; j <- 0 until d) a(i)(j) = q9(a(i)(j))
    }
    (0 until d).sortBy(i => (-a(i)(i), i)).take(topK).zipWithIndex.map { case (i, rank) =>
      (rank.toLong, math.rint(a(i)(i) * 1e9).toLong, math.rint(a(i)(i) / trace * 1e6).toLong)
    }
  }

  /** Independent md5-derived 60-bit hash (the `Hashing.hash60` contract,
    * restated with `MessageDigest` instead of Spark expressions).
    */
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  /** DSIR importance weights; mirror of `Sampling.dsirWeights` — own
    * tokenizer, own md5 hash, own count maps, the contract's smoothed
    * log-ratio formula micro-quantized, exact integer doc scores.
    * `docs` rows are `(doc_id, text, lang)`; returns `(doc_id, dsir_e6)`
    * sorted, zero-token docs absent.
    */
  def dsirWeights(docs: Seq[(Long, String, String)], targetLang: String = "en",
                  buckets: Int = 256): Seq[(Long, Long)] = {
    val raw = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val tgt = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val perDoc = docs.map { case (id, text, lang) =>
      val bs = tokenize(text).map(t => (hash60(t) % buckets).toInt)
      bs.foreach { b =>
        raw(b) += 1
        if (lang == targetLang) tgt(b) += 1
      }
      (id, bs)
    }
    val rTot = raw.values.sum
    val tTot = tgt.values.sum
    require(tTot > 0, s"dsir mirror: no tokens in target slice lang=$targetLang")
    val lam = (0 until buckets).map { b =>
      math.rint(1e6 * (math.log((tgt(b) + 1.0) / (tTot + buckets))
        - math.log((raw(b) + 1.0) / (rTot + buckets)))).toLong
    }
    perDoc.collect { case (id, bs) if bs.nonEmpty =>
      (id, bs.foldLeft(0L)((s, b) => s + lam(b)))
    }.sortBy(_._1)
  }

  /** Logistic-regression training; mirror of
    * `Classifier.trainQualityLogReg`'s contract — own tokenizer/features
    * (the contract's 4-feature order and stopword list restated), per-row
    * nano-quantized gradient contributions summed exactly, weights
    * 1e-9-quantized after each step. `docs` rows are `(text, y)`; returns
    * `(w0_e9, w1_e9, w2_e9, w3_e9, n_correct, n_docs)`.
    */
  def logRegTrain(docs: Seq[(String, Double)], iters: Int = 15,
                  lr: Double = 1.0): (Long, Long, Long, Long, Long, Long) = {
    val stop = Set("the", "a", "an", "of", "to", "and", "in", "is", "it",
      "for", "on", "with", "as", "at", "by")
    def nano(x: Double): Long =
      BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def q9(x: Double): Double = math.rint(x * 1e9) / 1e9
    val fv = docs.flatMap { case (text, y) =>
      val ts = tokenize(text)
      if (ts.isEmpty) None
      else {
        val n = ts.size
        var charSum = 0L
        var stopCount = 0
        ts.foreach { t => charSum += t.length; if (stop(t)) stopCount += 1 }
        Some((IndexedSeq(1.0, math.min(n, 500).toDouble / 100.0,
          charSum.toDouble / n.toDouble, stopCount.toDouble / n.toDouble), y))
      }
    }
    require(fv.nonEmpty, "logReg mirror needs at least one tokenized doc")
    var w = IndexedSeq(0.0, 0.0, 0.0, 0.0)
    def z(f: IndexedSeq[Double]): Double =
      w.indices.foldLeft(0.0)((s, j) => s + w(j) * f(j))
    for (_ <- 1 to iters) {
      val g = Array.ofDim[Long](4)
      fv.foreach { case (f, y) =>
        val p = 1.0 / (1.0 + math.exp(-z(f)))
        for (j <- 0 until 4) g(j) += nano((p - y) * f(j))
      }
      w = w.indices.map(j => q9(w(j) - lr * (g(j).toDouble / 1e9) / fv.size))
    }
    val correct = fv.count { case (f, y) => (if (z(f) >= 0) 1.0 else 0.0) == y }
    (math.rint(w(0) * 1e9).toLong, math.rint(w(1) * 1e9).toLong,
      math.rint(w(2) * 1e9).toLong, math.rint(w(3) * 1e9).toLong,
      correct.toLong, fv.size.toLong)
  }

  /** Independent BM25 idf table; mirror of `Retrieval.bm25TopK`'s driver
    * half — own tokenizer, own document-frequency counts over the raw
    * texts, the shared `Retrieval.idfE6` contract formula. Returns one
    * `(term, idf_e6)` row per query term (df = 0 terms included, matching
    * the engine's literal table).
    */
  def bm25Idf(texts: Seq[String], queryTerms: Seq[String]): Seq[(String, Long)] = {
    val tokenized = texts.map(tokenize).filter(_.nonEmpty)
    val n = tokenized.size.toLong
    require(n > 0, "bm25 mirror: corpus has no non-empty documents")
    val q = queryTerms.toSet
    val df = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    tokenized.foreach(ts => ts.toSet.intersect(q).foreach(t => df(t) += 1))
    queryTerms.map(t => (t, graft.llm.Retrieval.idfE6(n, df(t))))
  }

  /** Independent CHUNK-level BM25 idf table; mirror of
    * `Retrieval.maxPassageTopK`'s driver half — own tokenizer, own sliding
    * windows (the `TextOps.chunkTokens` contract restated as plain loops:
    * `ceil(max(n-k, 0)/stride) + 1` starts, window c = tokens
    * [c·stride, c·stride+k)), document frequencies counted over CHUNKS,
    * the shared `Retrieval.idfE6` contract formula. */
  def bm25ChunkIdf(texts: Seq[String], queryTerms: Seq[String],
                   k: Int = 30, stride: Int = 20): Seq[(String, Long)] = {
    val chunks = texts.map(tokenize).filter(_.nonEmpty).flatMap { ts =>
      val nChunks = ((math.max(ts.size - k, 0) + stride - 1) / stride) + 1
      (0 until nChunks).map(c => ts.slice(c * stride, c * stride + k))
    }
    val n = chunks.size.toLong
    require(n > 0, "bm25 chunk mirror: corpus has no non-empty chunks")
    val q = queryTerms.toSet
    val df = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    chunks.foreach(ts => ts.toSet.intersect(q).foreach(t => df(t) += 1))
    queryTerms.map(t => (t, graft.llm.Retrieval.idfE6(n, df(t))))
  }

  /** CCNet-style hashed-unigram perplexity scores; mirror of
    * `Perplexity.ccnetScore` — own tokenizer, own md5 hash, own reference
    * counts, the contract's Laplace-smoothed micro-quantized log-prob and
    * integer thresholds restated. `docs` rows are `(doc_id, text, lang)`;
    * returns `(doc_id, n_tokens, npt_e6, bucket)` sorted, zero-token docs
    * absent.
    */
  def ccnetScores(docs: Seq[(Long, String, String)], refLang: String = "en",
                  buckets: Int = 256, headE6: Long = 3419000L,
                  tailE6: Long = 3427000L): Seq[(Long, Long, Long, String)] = {
    val cnt = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val perDoc = docs.map { case (id, text, lang) =>
      val bs = tokenize(text).map(t => (hash60(t) % buckets).toInt)
      if (lang == refLang) bs.foreach(cnt(_) += 1)
      (id, bs)
    }
    val tot = cnt.values.sum
    require(tot > 0, s"ccnet mirror: no tokens in reference slice lang=$refLang")
    val nlp = (0 until buckets).map { b =>
      math.rint(-1e6 * math.log((cnt(b) + 1.0) / (tot + buckets))).toLong
    }
    perDoc.collect { case (id, bs) if bs.nonEmpty =>
      val nll = bs.foldLeft(0L)((s, b) => s + nlp(b))
      val npt = nll / bs.size
      val bucket = if (npt < headE6) "head" else if (npt < tailE6) "middle" else "tail"
      (id, bs.size.toLong, npt, bucket)
    }.sortBy(_._1)
  }

  /** Order-3 stupid-backoff mirror of `Perplexity.ngramScore` — own
    * tokenizer, own md5 hash, own per-order count maps, own backoff walk
    * (plain recursion over if/else, not a restatement of the engine's
    * column expressions). `docs` rows are `(doc_id, text, lang)`; returns
    * `(doc_id, n_tokens, npt_e6, bucket)` sorted, zero-token docs absent.
    */
  def ngramScores(docs: Seq[(Long, String, String)], refLang: String = "en",
                  buckets: Int = 1024, headE6: Long = 760000L,
                  tailE6: Long = 830000L): Seq[(Long, Long, Long, String)] = {
    def h(s: String): Int = (hash60(s) % buckets).toInt
    val c1 = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val c2 = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val c3 = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val perDoc = docs.map { case (id, text, lang) =>
      val ws = tokenize(text)
      if (lang == refLang) ws.indices.foreach { i =>
        c1(h(ws(i))) += 1
        if (i >= 1) c2(h(ws(i - 1) + " " + ws(i))) += 1
        if (i >= 2) c3(h(ws(i - 2) + " " + ws(i - 1) + " " + ws(i))) += 1
      }
      (id, ws)
    }
    val tot1 = c1.values.sum
    require(tot1 > 0, s"ngram mirror: no tokens in reference slice lang=$refLang")
    val B = graft.llm.Perplexity.StupidBackoffE6
    def lc(c: Long): Long = math.rint(1e6 * math.log(c.toDouble)).toLong
    def nlp1(b: Int): Long = math.rint(-1e6 * math.log((c1(b) + 1.0) / (tot1 + buckets))).toLong
    perDoc.collect { case (id, ws) if ws.nonEmpty =>
      val nll = ws.indices.foldLeft(0L) { (acc, i) =>
        val w = ws(i)
        def uni = nlp1(h(w))
        def biStep: Long = { // S(w|w-1) with the floor one level down
          val cb = c2(h(ws(i - 1) + " " + w))
          val cc = c1(h(ws(i - 1)))
          if (cb > 0 && cc > 0) lc(cc) - lc(cb) else B + uni
        }
        val tok =
          if (i >= 2) {
            val ct = c3(h(ws(i - 2) + " " + ws(i - 1) + " " + w))
            val cc = c2(h(ws(i - 2) + " " + ws(i - 1)))
            if (ct > 0 && cc > 0) lc(cc) - lc(ct) else B + biStep
          } else if (i == 1) biStep
          else uni
        acc + tok
      }
      val npt = nll / ws.size
      val bucket = if (npt < headE6) "head" else if (npt < tailE6) "middle" else "tail"
      (id, ws.size.toLong, npt, bucket)
    }.sortBy(_._1)
  }

  /** Order-N stupid-backoff mirror (t44's oracle at `order = 5`): the
    * same contract as [[ngramScores]] generalized to any order, restated
    * as a plain RECURSIVE backoff walk over slice-built grams — a
    * deliberately different code shape from the engine's flattened
    * when-chain over hashed broadcast arrays.
    */
  def ngramScoresN(docs: Seq[(Long, String, String)], order: Int,
                   refLang: String = "en", buckets: Int = 1024,
                   headE6: Long = 760000L,
                   tailE6: Long = 830000L): Seq[(Long, Long, Long, String)] = {
    require(order >= 2, s"ngram mirror: order must be >= 2, got $order")
    def h(s: String): Int = (hash60(s) % buckets).toInt
    val cnt = Array.fill(order + 1)(
      scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L))
    val perDoc = docs.map { case (id, text, lang) =>
      val ws = tokenize(text)
      if (lang == refLang) ws.indices.foreach { i =>
        (1 to order).foreach { o =>
          if (i >= o - 1) cnt(o)(h(ws.slice(i - o + 1, i + 1).mkString(" "))) += 1
        }
      }
      (id, ws)
    }
    val tot1 = cnt(1).values.sum
    require(tot1 > 0, s"ngram mirror: no tokens in reference slice lang=$refLang")
    val B = graft.llm.Perplexity.StupidBackoffE6
    def lc(c: Long): Long = math.rint(1e6 * math.log(c.toDouble)).toLong
    def nlp1(b: Int): Long = math.rint(-1e6 * math.log((c1N(b) + 1.0) / (tot1 + buckets))).toLong
    def c1N(b: Int): Long = cnt(1)(b)
    perDoc.collect { case (id, ws) if ws.nonEmpty =>
      val nll = ws.indices.foldLeft(0L) { (acc, i) =>
        val start = math.min(i + 1, order)
        def walk(o: Int): Long =
          if (o == 1) (start - 1).toLong * B + nlp1(h(ws(i)))
          else {
            val cg = if (i >= o - 1) cnt(o)(h(ws.slice(i - o + 1, i + 1).mkString(" "))) else 0L
            val cc = if (i >= o - 1) cnt(o - 1)(h(ws.slice(i - o + 1, i).mkString(" "))) else 0L
            if (cg > 0 && cc > 0) (start - o).toLong * B + lc(cc) - lc(cg)
            else walk(o - 1)
          }
        acc + walk(order)
      }
      val npt = nll / ws.size
      val bucket = if (npt < headE6) "head" else if (npt < tailE6) "middle" else "tail"
      (id, ws.size.toLong, npt, bucket)
    }.sortBy(_._1)
  }

  /** Zipf-fit mirror of `TextOps.zipfStats` — own tokenizer, own counts,
    * own `(freq desc, token)` ranking, the shared `zipfSlopeE6` contract
    * formula from independently derived ranks. `docs` rows are
    * `(doc_id, text, lang)`; returns `(lang, n_tokens, vocab, n_fit,
    * slope_e6)` sorted by lang.
    */
  def zipfStats(docs: Seq[(Long, String, String)],
                topN: Int = 100): Seq[(String, Long, Long, Long, Option[Long])] = {
    docs.groupBy(_._3).toSeq.map { case (lang, rows) =>
      val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      rows.foreach { case (_, text, _) => tokenize(text).foreach(counts(_) += 1L) }
      val nTokens = counts.values.sum
      val vocab = counts.size.toLong
      val top = counts.toSeq.sortBy { case (t, f) => (-f, t) }.take(topN)
      val rf = top.zipWithIndex.map { case ((_, f), i) => (i + 1, f) }
      // a single rank point can't be fitted: NULL slope, never a throw
      val slope = if (rf.size >= 2) Some(graft.llm.TextOps.zipfSlopeE6(rf)) else None
      (lang, nTokens, vocab, rf.size.toLong, slope)
    }.sortBy(_._1)
  }

  /** LM language-ID mirror of `Perplexity.lmLangId` — own tokenizer, own
    * md5 hash, own per-language count maps, the contract's smoothed
    * micro-quantized NLLs, arg-min with lexicographic tie-break and
    * runner-up margin. Returns `(doc_id, pred_lang, margin_e6,
    * is_correct)` sorted; zero-token docs absent.
    */
  def lmLangId(docs: Seq[(Long, String, String)],
               langs: Seq[String] = Seq("de", "en", "es", "fr", "zh"),
               buckets: Int = 64): Seq[(Long, String, Long, Long)] = {
    val cnt = scala.collection.mutable.Map.empty[(String, Int), Long].withDefaultValue(0L)
    val perDoc = docs.map { case (id, text, lang) =>
      val bs = tokenize(text).map(t => (hash60(t) % buckets).toInt)
      if (langs.contains(lang)) bs.foreach(b => cnt((lang, b)) += 1)
      (id, lang, bs)
    }
    val tot = langs.map(l => l -> (0 until buckets).map(b => cnt((l, b))).sum).toMap
    langs.foreach(l => require(tot(l) > 0, s"langid mirror: no tokens labeled lang=$l"))
    val nlp = langs.map { l =>
      l -> (0 until buckets).map(b =>
        math.rint(-1e6 * math.log((cnt((l, b)) + 1.0) / (tot(l) + buckets))).toLong)
    }.toMap
    perDoc.collect { case (id, lang, bs) if bs.nonEmpty =>
      val scored = langs.map(l => (l, bs.foldLeft(0L)((s, b) => s + nlp(l)(b))))
        .sortBy { case (l, nll) => (nll, l) }
      val (pred, best) = scored.head
      val margin = if (scored.size > 1) scored(1)._2 - best else 0L
      (id, pred, margin, if (pred == lang) 1L else 0L)
    }.sortBy(_._1)
  }
}
