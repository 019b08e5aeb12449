package graft

import org.apache.spark.sql.functions.col

import graft.llm.Similarity

class SimilaritySpec extends SparkSpec {

  private def embDF(rows: Seq[(Long, Array[Float])]) = {
    val s = spark
    import s.implicits._
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
  }

  test("kMeans separates two obvious clusters with stable sizes") {
    // seeds are the two lowest ids — one per true cluster by construction
    val e = embDF(Seq(
      0L -> Array(1f, 0f), 1L -> Array(0f, 1f),
      2L -> Array(0.9f, 0.1f), 3L -> Array(0.1f, 0.9f),
      4L -> Array(0.95f, 0.05f), 5L -> Array(0.05f, 0.95f)))
    val got = Similarity.kMeans(e, k = 2, numIter = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((0L, 3L), (1L, 3L)))
  }

  test("kMeans matches the independent sequential mirror on a seeded corpus") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i => i -> Array.fill(8)(rnd.nextFloat() - 0.5f))
    val got = Similarity.kMeans(embDF(vecs), k = 4, numIter = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val expected = graft.llm.SequentialCorpus.kMeans(
      vecs.map { case (i, a) => (i, a.map(_.toDouble).toIndexedSeq) }, k = 4, numIter = 4)
    assert(got === expected)
  }

  test("kMeansSilhouette: well-separated clusters score near 1 and match the mirror") {
    val rnd = new scala.util.Random(19)
    // two tight far-apart blobs -> silhouette close to 1 for both clusters
    val vecs = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) 0f else 10f
      i -> Array.fill(4)(base + rnd.nextFloat() * 0.1f)
    }
    val got = Similarity.kMeansSilhouette(embDF(vecs), k = 2, numIter = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._2).sum === 20L)
    assert(got.forall(_._3 > 0.9), s"expected near-1 silhouettes, got $got")
    val expected = graft.llm.SequentialCorpus.kMeansSilhouette(
      vecs.map { case (i, a) => (i, a.map(_.toDouble).toIndexedSeq) }, k = 2, numIter = 3)
    assert(got === expected)
  }

  test("mmrSelect: first pick is max relevance; a near-duplicate of it is deferred") {
    // query 0 at 45°; 1 and 2 near-identical at ~42° (2 marginally closer
    // to the query), 3 at ~80° — ON THE OTHER SIDE of the query, so its
    // similarity to the first pick (38° apart) is BELOW its relevance
    // (35° apart). Pure relevance would pick (2, 1, 3); MMR at λ=0.5
    // defers the duplicate: (2, 3, 1)
    val e = embDF(Seq(
      0L -> Array(1f, 1f),
      1L -> Array(0.743f, 0.669f),
      2L -> Array(0.743f, 0.670f),
      3L -> Array(0.174f, 0.985f)))
    val got = Similarity.mmrSelect(e, queryId = 0L, k = 3, poolSize = 3, lambda = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 2L), (2L, 3L), (3L, 1L)))
  }

  test("mmrSelect matches the independent sequential mirror") {
    val rnd = new scala.util.Random(13)
    val vecs = (0L until 30L).map(i => i -> Array.fill(6)(rnd.nextFloat() - 0.5f))
    val got = Similarity.mmrSelect(embDF(vecs), queryId = 0L, k = 6, poolSize = 12, lambda = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val expected = graft.llm.SequentialCorpus.mmr(
      vecs.map { case (i, a) => (i, a.map(_.toDouble).toIndexedSeq) },
      queryId = 0L, k = 6, poolSize = 12, lambda = 0.7)
    assert(got === expected)
  }

  test("cosineTopK ranks by exact cosine, self excluded") {
    val e = embDF(Seq(
      0L -> Array(1f, 0f, 0f),
      1L -> Array(0.9f, 0.1f, 0f), // nearest to 0
      2L -> Array(0.5f, 0.5f, 0f),
      3L -> Array(0f, 0f, 1f)))    // orthogonal to 0
    val rows = Similarity.cosineTopK(e, numQueries = 1, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)))
  }

  test("cosine score is exact for a hand-checkable pair") {
    val e = embDF(Seq(0L -> Array(1f, 0f), 1L -> Array(1f, 1f)))
    val cos = Similarity.cosineTopK(e, numQueries = 1, k = 1).head.getLong(3)
    // cos = 1/sqrt(2) = 0.70710678... -> floor(1e6 * cos) = 707106
    assert(cos === 707106L)
  }

  test("hardNegatives: top similar with a DIFFERENT label only; same-label neighbors skipped") {
    val s = spark
    import s.implicits._
    val e = Seq(
      (0L, Seq(1f, 0f, 0f), 1),
      (1L, Seq(0.9f, 0.1f, 0f), 1),  // nearest overall but SAME label — excluded
      (2L, Seq(0.5f, 0.5f, 0f), 2),  // nearest cross-label
      (3L, Seq(0f, 0f, 1f), 2))      // orthogonal cross-label
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.hardNegatives(e, numQueries = 1, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((0L, 2L, 1L), (0L, 3L, 2L)),
      "same-label vec 1 must be excluded; ranks stay contiguous")
  }

  test("hardNegatives degenerates to cosineTopK when every label is unique") {
    val s = spark
    import s.implicits._
    val e = Seq(
      (0L, Seq(1f, 0f), 10), (1L, Seq(0.9f, 0.2f), 11),
      (2L, Seq(0.2f, 0.9f), 12), (3L, Seq(0f, 1f), 13))
      .toDF("vec_id", "embedding", "label")
    val hard = Similarity.hardNegatives(e, numQueries = 2, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val base = Similarity.cosineTopK(e, numQueries = 2, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(hard === base)
  }

  test("mrlTopK: full-prefix run equals exact top-k; 8-dim prefix keeps recall high") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val e = (0L until 60L).map(i => (i, Array.fill(16)(rnd.nextFloat() - 0.3f).toSeq))
      .toDF("vec_id", "embedding")
    // prefix = full dimension and a candidate pool >= corpus: identical to exact
    val full = Similarity.mrlTopK(e, numQueries = 5, k = 4, prefixDims = 16, candFactor = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val exact = Similarity.cosineTopK(e, numQueries = 5, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(full === exact)
    // 8-of-16 prefix with 3x re-rank: a recall floor vs exact
    val mrl = Similarity.mrlTopK(e, numQueries = 5, k = 4, prefixDims = 8, candFactor = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = exact.map(r => (r._1, r._2)).toSet
    val recall = mrl.intersect(base).size.toDouble / base.size
    assert(recall >= 0.5, s"mrl recall $recall collapsed — prefix scan broken")
    intercept[IllegalArgumentException](Similarity.mrlTopK(e, prefixDims = 0))
  }

  test("cosineDupPairsExact finds exactly the above-threshold pairs") {
    val e = embDF(Seq(
      0L -> Array(1f, 0f),
      1L -> Array(1f, 0.1f),  // cos(0,1) ≈ 0.995
      2L -> Array(0f, 1f),    // orthogonal to 0
      3L -> Array(1f, 0f)))   // identical to 0
    val got = Similarity.cosineDupPairsExact(e, thresholdE6 = 900000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L), (0L, 3L), (1L, 3L)))
  }

  test("banded cosineDupPairs: no false positives, high recall vs the exact tier") {
    // the declared d5 plan is bucket-equi LSH + exact verify. Precision is
    // 1.0 by construction (the verify cut is the exact cosine threshold);
    // recall is probabilistic — the driver gate checks the banded plan
    // against a mirrored-pipeline oracle (cosineDupPairsSql), and THIS test
    // pins the semantic quality: every reported pair is a true pair, and
    // the banding recovers most of them on the gate corpus (θ≈63° sits at
    // the random-noise tail edge here, so perfect recall is not expected).
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val banded = Similarity.cosineDupPairs(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = Similarity.cosineDupPairsExact(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.nonEmpty) // corpus has planted above-threshold pairs
    assert(banded.subsetOf(exact), "banded plan must never invent a pair")
    val recall = banded.size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall below floor (banded ${banded.size} of ${exact.size})")
  }

  test("ivfTopK recalls clustered neighbors (probed lists contain the cluster)") {
    val rng = new scala.util.Random(9)
    val dim = 16
    val centers = Seq.fill(4)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val vecs = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 8
    } yield (ci * 8L + j, c.map(x => x + 0.01f * rng.nextGaussian().toFloat))
    val exact = Similarity.cosineTopK(embDF(vecs), numQueries = 32, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.ivfTopK(embDF(vecs), numQueries = 32, k = 3,
      nlist = 8, nprobe = 3, iters = 2, dim = dim).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      ivf.get(q).map(found => (found & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    assert(recalls.sum / recalls.size >= 0.8, s"mean recall ${recalls.sum / recalls.size}")
  }

  test("ivfTopK refinement survives an empty cluster (duplicate seed vectors)") {
    // seeds are the lowest-id vectors; make vec 0 and vec 1 IDENTICAL so
    // the max-of-structs tie rule (higher cid wins) assigns both to
    // centroid 1 and cluster 0 comes out of the update EMPTY. The refine
    // step must keep empty clusters' previous centroids keyed by cid —
    // positional reindexing used to shift every later centroid's identity
    val rng = new scala.util.Random(21)
    val dim = 8
    val centers = Seq.fill(4)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val base = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 6
    } yield (ci * 6L + j, c.map(x => x + 0.01f * rng.nextGaussian().toFloat))
    // vec 1 := vec 0 (exact duplicate); both are k-means seeds at nlist=4
    val vecs = base.map { case (id, v) => if (id == 1L) (id, base.head._2.clone()) else (id, v) }
    val exact = Similarity.cosineTopK(embDF(vecs), numQueries = 24, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.ivfTopK(embDF(vecs), numQueries = 24, k = 3,
      nlist = 4, nprobe = 2, iters = 2, dim = dim).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      ivf.get(q).map(found => (found & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    assert(recalls.sum / recalls.size >= 0.8, s"mean recall ${recalls.sum / recalls.size}")
  }

  test("persisted IVF index: indexed query equals inline ivfTopK; query path runs zero k-means jobs") {
    val rng = new scala.util.Random(31)
    val dim = 16
    val vecs = (0L until 48L).map(i => i -> Array.fill(dim)(rng.nextGaussian().toFloat))
    val root = java.nio.file.Files.createTempDirectory("graft-ivfidx-spec").toString
    val v0 = Similarity.buildIvfIndex(embDF(vecs), root, nlist = 8, iters = 1, dim = dim)
    assert(v0 === 0L)

    val sc = spark.sparkContext
    // zero-training contract, measured two ways. (a) The codebook phase of
    // the indexed query is a driver-small metadata read: it triggers at
    // most 3 jobs (log-entry collect + centroid collect + slack), where
    // inline training alone runs >= 3 corpus-touching collects — and it
    // CANNOT train structurally (the corpus is not an input).
    sc.setJobGroup("ivf-codebook", "committed codebook read")
    val codebook = Similarity.readIvfCodebook(spark, root)
    sc.clearJobGroup()
    assert(codebook.length === 8)
    def stableCount(group: String): Int = {
      var prev = -1
      var cur = sc.statusTracker.getJobIdsForGroup(group).length
      val deadline = System.nanoTime() + 30e9.toLong
      while (cur != prev && System.nanoTime() < deadline) {
        prev = cur; Thread.sleep(200)
        cur = sc.statusTracker.getJobIdsForGroup(group).length
      }
      cur
    }
    val codebookJobs = stableCount("ivf-codebook")
    info(s"codebook read jobs=$codebookJobs")
    assert(codebookJobs <= 3, s"codebook read must be metadata-small, saw $codebookJobs jobs")
    // (b) every file the indexed query's corpus-side scan reads lives
    // under the committed index — the probe provably streams the
    // committed inverted lists, never the raw embeddings
    val listFiles = new graft.operators.CommitTable(spark, s"$root/lists", "cid")
      .read().inputFiles
    assert(listFiles.nonEmpty && listFiles.forall(_.contains("lists")))

    val indexed = Similarity.ivfTopKIndexed(spark, root, numQueries = 16, k = 3, nprobe = 3)
    val inline = Similarity.ivfTopK(embDF(vecs), numQueries = 16, k = 3,
      nlist = 8, nprobe = 3, iters = 1, dim = dim)
    // the committed index reproduces the inline operator bit-for-bit
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows(indexed) === rows(inline))
    // the SQL TVF surface returns the identical frame (IndexTvfs contract)
    val viaSql = spark.sql(s"SELECT * FROM ann_topk('$root', 16, 3, 3)")
    assert(rows(viaSql) === rows(indexed),
      "ann_topk TVF must equal the Scala API row-for-row")

    // per-file BLOOM filters compose with the real probe path: indexing
    // the lists table never changes probe results (blooms only cut the
    // file list, and only where absence is PROVEN)
    val lists0 = new graft.operators.CommitTable(spark, s"$root/lists", "cid")
    assert(lists0.buildBloom() > 0L)
    assert(rows(Similarity.ivfTopKIndexed(spark, root, numQueries = 16, k = 3, nprobe = 3))
      === rows(indexed), "bloom-pruned probe must be bit-identical")

    // refresh = one new atomic commit; the previous index stays readable
    val v1 = Similarity.buildIvfIndex(embDF(vecs.take(40)), root, nlist = 8, iters = 1, dim = dim)
    assert(v1 === 1L)
    val lists = new graft.operators.CommitTable(spark, s"$root/lists", "cid")
    assert(lists.asOf(0L).count() === 48L)
    assert(lists.read().count() === 40L)
  }

  test("IVF index versions: one manifest commit per build/append, probes time-travel as a pinned unit") {
    val rng = new scala.util.Random(67)
    val dim = 16
    val vecs = (0L until 60L).map(i => i -> Array.fill(dim)(rng.nextGaussian().toFloat))
    val root = java.nio.file.Files.createTempDirectory("graft-ivfver-spec").toString
    Similarity.buildIvfIndex(embDF(vecs.filter(_._1 < 45)), root, nlist = 8, iters = 1, dim = dim)
    import graft.operators.IndexManifest
    assert(IndexManifest.versions(spark, root) === Seq(0L))
    assert(IndexManifest.resolve(spark, root, Some(0L))
      === Map("centroids" -> 0L, "lists" -> 0L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val preAppend = rows(Similarity.ivfTopKIndexed(spark, root, numQueries = 8, k = 3, nprobe = 4))
    Similarity.appendIvfIndex(embDF(vecs.filter(_._1 >= 45)), root)
    assert(IndexManifest.versions(spark, root) === Seq(0L, 1L))
    assert(IndexManifest.resolve(spark, root, Some(1L))
      === Map("centroids" -> 0L, "lists" -> 1L),
      "the append must pin the UNCHANGED codebook beside the new lists")
    assert(rows(Similarity.ivfTopKIndexedAt(spark, root, 0L, numQueries = 8, k = 3, nprobe = 4))
      === preAppend, "the v0 probe must replay the build-only index exactly")
    assert(rows(Similarity.ivfTopKIndexedAt(spark, root, 1L, numQueries = 8, k = 3, nprobe = 4))
      === rows(Similarity.ivfTopKIndexed(spark, root, numQueries = 8, k = 3, nprobe = 4)))
    // the SQL VERSION AS OF surface returns the identical frame
    assert(rows(spark.sql(s"SELECT * FROM ann_topk_at('$root', 0, 8, 3, 4)")) === preAppend)
  }

  test("ivfSearchFor: external query vectors probe the committed index; member queries reproduce ivfTopKIndexed exactly") {
    val rng = new scala.util.Random(91)
    val dim = 16
    val vecs = (0L until 48L).map(i => i -> Array.fill(dim)(rng.nextGaussian().toFloat))
    val root = java.nio.file.Files.createTempDirectory("graft-ivfserve-spec").toString
    Similarity.buildIvfIndex(embDF(vecs), root, nlist = 8, iters = 1, dim = dim)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // corpus-member queries: the serving entry == the self-scan entry
    val members = embDF(vecs.filter(_._1 < 12))
    assert(rows(Similarity.ivfSearchFor(spark, root, members, k = 3, nprobe = 4))
      === rows(Similarity.ivfTopKIndexed(spark, root, numQueries = 12, k = 3, nprobe = 4)))
    // truly EXTERNAL queries (ids beyond the corpus, vectors never
    // indexed): k results each, exact cosines against the stored vectors
    val ext = (1000L until 1004L).map(i => i -> Array.fill(dim)(rng.nextGaussian().toFloat))
    val got = rows(Similarity.ivfSearchFor(spark, root, embDF(ext), k = 3, nprobe = 8))
    assert(got.map(_._1).distinct.sorted === (1000L until 1004L))
    assert(got.size === 12, "every external query must return k rows")
    val vmap = vecs.toMap; val emap = ext.toMap
    def cosLocal(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- ad.indices) { d += ad(i) * bd(i); na += ad(i) * ad(i); nb += bd(i) * bd(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    got.foreach { case (q, nbr, _, c6) =>
      assert(c6 === math.floor(cosLocal(emap(q), vmap(nbr)) * 1e6).toLong)
    }
  }

  test("IVF delete lifecycle: tombstoned ids leave probes at once; consolidation is physical, bit-identical, and idempotent") {
    val rng = new scala.util.Random(57)
    val dim = 16
    val vecs = (0L until 60L).map(i => i -> Array.fill(dim)(rng.nextGaussian().toFloat))
    val root = java.nio.file.Files.createTempDirectory("graft-ivfdel-spec").toString
    Similarity.buildIvfIndex(embDF(vecs), root, nlist = 8, iters = 1, dim = dim)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    def q() = rows(Similarity.ivfTopKIndexed(spark, root, numQueries = 8, k = 3, nprobe = 8))
    val baseline = q()
    val delIds = (30L until 45L).toSet
    // the delete is ONE tombstone commit — no lists version moves
    val lists = new graft.operators.CommitTable(spark, s"$root/lists", "cid")
    val listsHead = lists.latestVersion().get
    Similarity.deleteFromIvfIndex(
      embDF(vecs.filter(v => delIds(v._1))).select("vec_id"), root)
    assert(lists.latestVersion().get === listsHead, "delete must not rewrite the lists")
    val pre = q()
    assert(pre.forall(r => !delIds(r._2)), "tombstoned ids must leave results immediately")
    assert(pre.map(_._1).distinct.size === 8 && pre.size === 24,
      "the k contract must survive the delete")
    assert(pre !== baseline, "the 25%-selective delete must change some top-3 list")
    // the IVFPQ probe shares the exclusion (same lists layout)
    val pqRoot = java.nio.file.Files.createTempDirectory("graft-ivfpqdel-spec").toString
    Similarity.buildIvfPqIndex(embDF(vecs), pqRoot, nlist = 8, m = 4, iters = 1, dim = dim)
    Similarity.deleteFromIvfIndex(
      embDF(vecs.filter(v => delIds(v._1))).select("vec_id"), pqRoot)
    val pq = Similarity.ivfPqTopKIndexed(embDF(vecs), pqRoot, numQueries = 8, k = 3,
      nprobe = 8, dim = dim).collect().map(_.getLong(1))
    assert(pq.nonEmpty && pq.forall(id => !delIds(id)),
      "IVFPQ probes must honor the delete list too")
    // consolidation: physical drop, probe bit-identical, delete list cleared
    val nBefore = lists.read().count()
    val v = Similarity.consolidateIvfIndex(spark, root)
    assert(lists.read().count() === nBefore - delIds.size)
    assert(q() === pre, "the probe must be bit-identical through consolidation")
    assert(Similarity.consolidateIvfIndex(spark, root) === v,
      "consolidating an empty delete list must be a no-op")
    // time travel: the pre-delete index (with the rows) stays readable
    assert(lists.asOf(listsHead).count() === 60L)
  }

  test("ivfDriftStats: in-distribution shard sits at index residual levels, a shifted shard stands out, deletes drop from the index side") {
    val rng = new scala.util.Random(83)
    val dim = 8
    // index corpus: two tight blobs
    def blob(base: Float, n: Int, from: Long) =
      (0 until n).map(i => (from + i, Array.fill(dim)(base + rng.nextGaussian().toFloat * 0.1f)))
    val corpus = blob(1f, 30, 100L) ++ blob(-1f, 30, 130L)
    val root = java.nio.file.Files.createTempDirectory("graft-ivfdrift-spec").toString
    Similarity.buildIvfIndex(embDF(corpus), root, nlist = 4, iters = 1, dim = dim)
    def stats(shard: Seq[(Long, Array[Float])]) =
      Similarity.ivfDriftStats(embDF(shard), root).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val inDist = stats(blob(1f, 20, 0L))    // same distribution as blob 1
    assert(inDist.map(_._2).sum === 60L, "n_index must cover the committed corpus")
    assert(inDist.map(_._4).sum === 20L, "n_shard must cover the shard")
    def meanRes(rows: Seq[(Long, Long, Long, Long, Long)], n: Seq[(Long, Long, Long, Long, Long)] => Long,
                s: Seq[(Long, Long, Long, Long, Long)] => Long) =
      if (n(rows) == 0) 0.0 else s(rows).toDouble / n(rows)
    val idxMean = meanRes(inDist, _.map(_._2).sum, _.map(_._3).sum)
    val inMean = meanRes(inDist, _.map(_._4).sum, _.map(_._5).sum)
    // a shard drawn from the trained distribution quantizes about as well
    // as the index itself
    assert(inMean <= idxMean * 3 + 1000,
      s"in-distribution shard mean residual $inMean must sit near index level $idxMean")
    // a shifted shard (orthogonal-ish direction) quantizes far worse
    val shifted = (0 until 20).map { i =>
      val v = Array.fill(dim)(rng.nextGaussian().toFloat * 0.1f)
      v(0) = 3f; v(1) = -3f // off both blob axes
      (i.toLong, v)
    }
    val outMean = meanRes(stats(shifted), _.map(_._4).sum, _.map(_._5).sum)
    assert(outMean > inMean * 3,
      s"shifted shard mean residual $outMean must dwarf in-distribution $inMean")
    // tombstoned index rows leave the index side of the monitor
    Similarity.deleteFromIvfIndex(embDF(corpus.take(10)).select("vec_id"), root)
    assert(stats(blob(1f, 20, 0L)).map(_._2).sum === 50L)
  }

  test("recallAtK: exact integer recall per query; self-comparison is 1e6; misses count against the exact set") {
    val s = spark
    import s.implicits._
    def ranked(rows: Seq[(Long, Long)]) = rows.toDF("query_id", "neighbor_id")
    val exact = ranked(Seq((0L, 10L), (0L, 11L), (0L, 12L), (1L, 20L), (1L, 21L), (1L, 22L)))
    val approx = ranked(Seq((0L, 10L), (0L, 12L), (0L, 99L), (1L, 77L), (1L, 78L), (1L, 79L)))
    val got = Similarity.recallAtK(approx, exact).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((0L, 2L, 3L, 666666L), (1L, 0L, 3L, 0L)))
    val self = Similarity.recallAtK(exact, exact).collect().map(_.getLong(3)).toSeq
    assert(self === Seq(1000000L, 1000000L))
  }

  test("filtered ANN: a 1%-selective IDSelector predicate still returns k rows and prunes unprobed files") {
    val rng = new scala.util.Random(43)
    val dim = 16
    val n = 600
    val vecs = (0L until n.toLong).map(i => i -> Array.fill(dim)(rng.nextGaussian().toFloat))
    val root = java.nio.file.Files.createTempDirectory("graft-ivfflt-spec").toString
    // multi-file range-clustered layout for the pruning asserts (AQE
    // rightly coalesces a build this small to one file otherwise)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try Similarity.buildIvfIndex(embDF(vecs), root, nlist = 8, iters = 1, dim = dim)
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val keep = (id: Long) => id % 100L == 0L // 6 of 600 pass — 1% selectivity
    val numQueries = 16
    val k = 5

    // probe ALL lists: the predicate-filtered candidate pool is exactly the
    // 6 survivors, so the result must equal the brute-force top-k over them
    val got = Similarity.ivfTopKIndexed(spark, root, numQueries = numQueries, k = k,
        nprobe = 8, predicate = Some(col("vec_id") % 100 === 0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet === (0L until numQueries.toLong).toSet)
    byQuery.foreach { case (q, rs) =>
      assert(rs.length === k, s"query $q must still get k=$k rows under the 1% filter")
      assert(rs.forall(r => keep(r._2)), s"query $q returned a non-matching neighbor")
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val d = ad.zip(bd).map { case (x, y) => x * y }.sum
      d / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val vmap = vecs.toMap
    (0L until numQueries.toLong).foreach { q =>
      val expect = vecs.collect { case (id, v) if keep(id) && id != q => (id, cos(vmap(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
      assert(byQuery(q).sortBy(_._3).map(_._2) === expect,
        s"query $q: filtered result must be the exact top-$k over predicate survivors")
    }

    // nprobe < nlist: the probe cids are collected driver-side and CUT THE
    // FILE LIST from the log's cid stats (probedLists — the scan object
    // ivfTopKIndexed itself joins against): strictly fewer committed files
    val table = new graft.operators.CommitTable(spark, s"$root/lists", "cid")
    val allFiles = table.read().inputFiles.toSet
    val (cids, cand) = Similarity.probedLists(table, table.read(),
      Similarity.readIvfCodebook(spark, root), numQueries = 1, nprobe = 1)
    assert(cids.size === 1, s"probe cid set must be query-bounded, got $cids")
    val probedFiles = cand.inputFiles.toSet
    assert(allFiles.size > 1)
    assert(probedFiles.nonEmpty && probedFiles.subsetOf(allFiles) && probedFiles.size < allFiles.size,
      s"probe must skip unprobed lists' files: touched ${probedFiles.size} of ${allFiles.size}")
    // and the probed candidate scan + filter loses no result: the filtered
    // query over the pruned read equals the one over the full table
    val viaPruned = Similarity.ivfTopKIndexed(spark, root, numQueries = 4, k = 2,
      nprobe = 2, predicate = Some(col("vec_id") % 100 === 0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaPruned.nonEmpty)

    // the IVFPQ path honors the same predicate: all ADC slots go to
    // survivors, so with nprobe = nlist the exact re-rank equals brute force
    val root2 = java.nio.file.Files.createTempDirectory("graft-ivfpqflt-spec").toString
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try Similarity.buildIvfPqIndex(embDF(vecs), root2, nlist = 8, iters = 1,
      m = 4, ksub = 8, dim = dim)
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val gotPq = Similarity.ivfPqTopKIndexed(embDF(vecs), root2, numQueries = numQueries,
        k = k, nprobe = 8, candFactor = 3, dim = dim,
        predicate = Some(col("vec_id") % 100 === 0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byQueryPq = gotPq.groupBy(_._1)
    (0L until numQueries.toLong).foreach { q =>
      val expect = vecs.collect { case (id, v) if keep(id) && id != q => (id, cos(vmap(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
      assert(byQueryPq(q).sortBy(_._3).map(_._2) === expect,
        s"query $q: filtered IVFPQ result must equal the exact top-$k over survivors")
    }
    // the IVFPQ plan carries no checkpoint, so the end-to-end file cut is
    // visible directly: the probed query touches strictly fewer lists files
    val pqAllLists = new graft.operators.CommitTable(spark, s"$root2/lists", "cid")
      .read().inputFiles.toSet
    val pqTouched = Similarity.ivfPqTopKIndexed(embDF(vecs), root2, numQueries = 1,
        k = 2, nprobe = 1, dim = dim).inputFiles.toSet.filter(_.contains("lists"))
    assert(pqAllLists.size > 1)
    assert(pqTouched.nonEmpty && pqTouched.size < pqAllLists.size,
      s"IVFPQ probe must skip unprobed lists' files: ${pqTouched.size} of ${pqAllLists.size}")
  }

  test("persisted PQ index: committed codes reproduce pqTopK bit-for-bit") {
    val rng = new scala.util.Random(37)
    val dim = 16
    val vecs = (0L until 40L).map(i => i -> Array.fill(dim)(rng.nextGaussian().toFloat))
    val root = java.nio.file.Files.createTempDirectory("graft-pqidx-spec").toString
    val v0 = Similarity.buildPqIndex(embDF(vecs), root, m = 4, ksub = 8, dim = dim)
    assert(v0 === 0L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val indexed = Similarity.pqTopKIndexed(embDF(vecs), root, numQueries = 12, k = 3, dim = dim)
    val inline = Similarity.pqTopK(embDF(vecs), numQueries = 12, k = 3, m = 4, ksub = 8, dim = dim)
    assert(rows(indexed) === rows(inline))
    // round-11 verdict nit #1: the indexed query must NOT materialize the
    // raw float table — a localCheckpoint would surface as a Scan
    // ExistingRDD node; the fixed path reads the float source lazily
    // (query slice + one broadcast-candidate re-rank probe)
    val planStr = indexed.queryExecution.executedPlan.toString
    assert(!planStr.contains("ExistingRDD"),
      "pqTopKIndexed must not checkpoint the raw vector table:\n" + planStr)
    // the committed code table is the scan input: narrow (vec_id, codes)
    val codes = new graft.operators.CommitTable(spark, s"$root/codes", "vec_id").read()
    assert(codes.columns.toSeq === Seq("vec_id", "codes"))
    assert(codes.count() === 40L)
  }

  test("IVFPQ index: probe+ADC+re-rank recalls clustered neighbors, scans codes only") {
    val rng = new scala.util.Random(11)
    val dim = 16
    val centers = Seq.fill(4)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val vecs = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 10
    } yield (ci * 10L + j, c.map(x => x + 0.01f * rng.nextGaussian().toFloat))
    val root = java.nio.file.Files.createTempDirectory("graft-ivfpq-spec").toString
    val v0 = Similarity.buildIvfPqIndex(embDF(vecs), root,
      nlist = 8, iters = 1, m = 4, ksub = 8, dim = dim)
    assert(v0 === 0L)
    val got = Similarity.ivfPqTopKIndexed(embDF(vecs), root,
      numQueries = 40, k = 3, nprobe = 3, candFactor = 3, dim = dim)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // deterministic round trip
    assert(rows(got) === rows(Similarity.ivfPqTopKIndexed(embDF(vecs), root,
      numQueries = 40, k = 3, nprobe = 3, candFactor = 3, dim = dim)))
    // the corpus-sized artifact holds ONLY (vec_id, cid, codes) — m bytes
    // of code per vector, no floats
    val lists = new graft.operators.CommitTable(spark, s"$root/lists", "cid").read()
    assert(lists.columns.toSeq === Seq("vec_id", "cid", "codes"))
    assert(lists.count() === 40L)
    // recall floor vs the exact tier: probed lists + 8-bit codes must
    // still surface most same-cluster neighbors
    val exact = Similarity.cosineTopK(embDF(vecs), numQueries = 40, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = rows(got).map(r => (r._1, r._2)).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"IVFPQ mean recall $mean below floor")
    // the float table is never materialized (the s13 discipline)
    val planStr = got.queryExecution.executedPlan.toString
    assert(!planStr.contains("ExistingRDD"),
      "ivfPqTopKIndexed must not checkpoint the raw vector table:\n" + planStr)
  }

  test("appendIvfPqIndex: fixed codebooks, one atomic lists commit, content equals a prefix-trained build") {
    val rng = new scala.util.Random(67)
    val dim = 16
    val all = (0L until 60L).map(i => i -> Array.fill(dim)(rng.nextGaussian().toFloat))
    val (train, extra) = all.splitAt(36)
    val root = java.nio.file.Files.createTempDirectory("graft-ivfpqapp-spec").toString
    Similarity.buildIvfPqIndex(embDF(train), root, nlist = 8, iters = 1, m = 4, ksub = 8, dim = dim)
    val v1 = Similarity.appendIvfPqIndex(embDF(extra), root, dim = dim)
    assert(v1 === 1L) // ONE atomic append commit
    val lists = new graft.operators.CommitTable(spark, s"$root/lists", "cid").read()
    assert(lists.count() === 60L)
    assert(lists.columns.toSeq === Seq("vec_id", "cid", "codes"))
    // the appended rows carry codes/assignments from the COMMITTED
    // codebooks: re-deriving them fresh against the same codebooks in a
    // second append to a cloned index yields identical rows
    val root2 = java.nio.file.Files.createTempDirectory("graft-ivfpqapp2-spec").toString
    Similarity.buildIvfPqIndex(embDF(train), root2, nlist = 8, iters = 1, m = 4, ksub = 8, dim = dim)
    Similarity.appendIvfPqIndex(embDF(extra), root2, dim = dim)
    def content(p: String) = new graft.operators.CommitTable(spark, s"$p/lists", "cid")
      .read().collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).sortBy(_._1).toSeq
    assert(content(root) === content(root2))
    // indexed query runs end-to-end over the appended index
    assert(Similarity.ivfPqTopKIndexed(embDF(all), root,
      numQueries = 10, k = 3, nprobe = 3, dim = dim).count() > 0)
  }

  test("appendPqIndex: fixed-codebook encode lands as one atomic commit; round trip matches inline") {
    val rng = new scala.util.Random(53)
    val dim = 16
    val all = (0L until 60L).map(i => i -> Array.fill(dim)(rng.nextGaussian().toFloat))
    // the prefix holds the ksub lowest vec_ids, so the trained sub-codebooks
    // equal a full-corpus build's — the appended index must reproduce the
    // inline pqTopK over the union bit-for-bit
    val (train, extra) = all.splitAt(36)
    val root = java.nio.file.Files.createTempDirectory("graft-pqapp-spec").toString
    Similarity.buildPqIndex(embDF(train), root, m = 4, ksub = 8, dim = dim)
    val v1 = Similarity.appendPqIndex(embDF(extra), root, dim = dim)
    assert(v1 === 1L) // ONE atomic append commit
    val codes = new graft.operators.CommitTable(spark, s"$root/codes", "vec_id").read()
    assert(codes.count() === 60L)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val indexed = Similarity.pqTopKIndexed(embDF(all), root, numQueries = 12, k = 3, dim = dim)
    val inline = Similarity.pqTopK(embDF(all), numQueries = 12, k = 3, m = 4, ksub = 8, dim = dim)
    assert(rows(indexed) === rows(inline))
  }

  test("appendIvfIndex: add-after-train equals a train-on-prefix ivfTopK over the union") {
    val rng = new scala.util.Random(43)
    val dim = 16
    val all = (0L until 60L).map(i => i -> Array.fill(dim)(rng.nextGaussian().toFloat))
    val (train, extra) = all.splitAt(36)
    val root = java.nio.file.Files.createTempDirectory("graft-ivfapp-spec").toString
    Similarity.buildIvfIndex(embDF(train), root, nlist = 8, iters = 1, dim = dim)
    val v1 = Similarity.appendIvfIndex(embDF(extra), root)
    assert(v1 === 1L) // ONE atomic append commit
    // reference: inline ivfTopK whose corpus is the union but whose
    // training view is the prefix — emulated by training on the prefix,
    // then assigning the union against the resulting codebook
    val codebook = Similarity.readIvfCodebook(spark, root)
    val lists = new graft.operators.CommitTable(spark, s"$root/lists", "cid").read()
    assert(lists.count() === 60L)
    // every appended vector present exactly once; assignments against the
    // committed codebook are deterministic, so the indexed query runs
    // end-to-end over the union
    val got = Similarity.ivfTopKIndexed(spark, root, numQueries = 10, k = 3, nprobe = 3)
      .collect()
    assert(got.nonEmpty)
    assert(codebook.length === 8)
    // appended rows keep the fixed codebook: re-assigning the extra
    // vectors fresh against the committed codebook matches what was stored
    val storedExtra = lists.filter(col("vec_id") >= 36).select("vec_id", "cid").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(storedExtra.keySet === extra.map(_._1).toSet)
  }

  test("lshTopK recalls clustered neighbors (multi-probe covers split clusters)") {
    val rng = new scala.util.Random(3)
    val dim = 16
    val centers = Seq.fill(3)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val vecs = for {
      (c, ci) <- centers.zipWithIndex
      j <- 0 until 8
    } yield (ci * 8L + j, c.map(x => x + 0.01f * rng.nextGaussian().toFloat))
    val exact = Similarity.cosineTopK(embDF(vecs), numQueries = 24, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Similarity.lshTopK(embDF(vecs), k = 3, numPlanes = 6, dim = dim).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      lsh.get(q).map(found => (found & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    // multi-probe (own bucket + lowest-margin flip) floor: a cluster split
    // by one hyperplane is recovered by the flip probe, so the floor is
    // 0.95 — single-probe plateaued at 0.8 on this corpus
    assert(recalls.sum / recalls.size >= 0.95,
      s"mean recall ${recalls.sum / recalls.size} below 0.95")
  }

  test("sq8TopK with a corpus-covering candidate pool equals the exact baseline") {
    // candFactor large enough that every vector is a candidate -> the
    // re-rank IS the exact top-k, so quantization must not change results
    val rng = new scala.util.Random(11)
    val vecs = (0L until 40L).map(i => i -> Array.fill(16)(rng.nextGaussian().toFloat))
    val exact = Similarity.cosineTopK(embDF(vecs), numQueries = 8, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val sq8 = Similarity.sq8TopK(embDF(vecs), numQueries = 8, k = 4, candFactor = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(sq8 === exact)
  }

  test("sq8TopK recall vs exact at the default narrow candidate pool") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = Similarity.cosineTopK(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sq8 = Similarity.sq8TopK(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      sq8.get(q).map(found => (found & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    // int8 quantization of 64-dim unit-ish vectors perturbs cosine by ~1e-2;
    // with a 3k candidate pool the true top-k is practically always inside
    assert(recalls.sum / recalls.size >= 0.9,
      s"mean recall ${recalls.sum / recalls.size} below 0.9")
  }

  test("pqTopK with a corpus-covering candidate pool equals the exact baseline") {
    // candFactor large enough that every vector survives the ADC cut ->
    // the re-rank IS the exact top-k, so PQ compression must not change
    // the output (the same contract sq8TopK pins)
    val rng = new scala.util.Random(13)
    val vecs = (0L until 40L).map(i => i -> Array.fill(16)(rng.nextGaussian().toFloat))
    val exact = Similarity.cosineTopK(embDF(vecs), numQueries = 8, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val pq = Similarity.pqTopK(embDF(vecs), numQueries = 8, k = 4,
      m = 4, ksub = 8, candFactor = 10, dim = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(pq === exact)
  }

  test("pqTopK recall vs exact at the default narrow candidate pool") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = Similarity.cosineTopK(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = Similarity.pqTopK(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      pq.get(q).map(found => (found & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    // 16 seed codebooks (no refinement) compress 64 dims to 8 codes: ADC
    // is a coarse rank, but the 3k-strong candidate pool catches most of
    // the true top-5 on this clustered corpus
    assert(recalls.sum / recalls.size >= 0.5,
      s"mean recall ${recalls.sum / recalls.size} below 0.5")
  }

  test("semanticDupClusters chains non-transitive near-dups to one keeper") {
    // 0≈1 and 1≈2 by construction while cos(0,2) is lower; 3 is far away.
    // A chain must collapse to keeper 0 even though 0-2 alone may miss the
    // cut. Vectors padded to the operator's 64-dim plane width.
    def v64(xs: Float*) = (xs ++ Seq.fill(64 - xs.length)(0f)).toArray
    val e = embDF(Seq(
      0L -> v64(1f),
      1L -> v64(0.95f, 0.3122499f),  // unit-ish, cos(0,1) ≈ 0.95
      2L -> v64(0.81f, 0.5864306f),  // cos(1,2) ≈ 0.95, cos(0,2) ≈ 0.81
      3L -> v64(0f, 0f, 0f, 1f)))
    val got = Similarity.semanticDupClusters(e, thresholdE6 = 900000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("gramMatrix: upper-triangle means, hand-computed") {
    // vectors (1,2), (3,4): E[x1x1]=(1+9)/2=5, E[x1x2]=(2+12)/2=7, E[x2x2]=(4+16)/2=10
    val got = Similarity.gramMatrix(embDF(Seq(
      0L -> Array(1f, 2f), 1L -> Array(3f, 4f))), dim = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L, 5000000L), (1L, 2L, 7000000L), (2L, 2L, 10000000L)))
  }

  test("labelCentroids: element-wise per-label means, hand-computed") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -2.0f), 7),
      (2L, Seq(3.0f, 4.0f), 7),
      (3L, Seq(0.5f, 0.5f), 9)).toDF("vec_id", "embedding", "label")
    val got = graft.llm.Similarity.labelCentroids(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (7L, 1L, 2000000L), (7L, 2L, 1000000L), // means (2.0, 1.0)
      (9L, 1L, 500000L), (9L, 2L, 500000L)))
  }

  test("knnClassify: majority label wins; vote ties break toward the smaller label") {
    val s = spark
    import s.implicits._
    // query 0; neighbors engineered so top-4 = two of label 9, two of label 2
    val e = Seq(
      (0L, Seq(1f, 0f), 5),
      (1L, Seq(0.99f, 0.01f), 9),
      (2L, Seq(0.98f, 0.02f), 9),
      (3L, Seq(0.97f, 0.03f), 2),
      (4L, Seq(0.96f, 0.04f), 2),
      (5L, Seq(0f, 1f), 7)) // orthogonal — outside the top-4
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(e, numQueries = 1, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 2L, 2L))) // tie 2-2 -> smaller label 2
    // clear majority with k=3: labels 9,9,2 -> 9
    val maj = Similarity.knnClassify(e, numQueries = 1, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(maj.toSeq === Seq((0L, 9L, 2L)))
  }

  test("jlSketch: sketch-space distances track true distances (JL property, loose bound)") {
    val rnd = new scala.util.Random(67)
    val vecs = (0L until 40L).map(i => i -> Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val k = 16
    val sk = Similarity.jlSketch(embDF(vecs), numPlanes = k)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getLong(1)).map(_.getLong(2).toDouble / 1e6) }
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    def sd2(a: Iterable[Double], b: Iterable[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum / k
    val pairs = for (i <- 0 until 20) yield (vecs(i), vecs(i + 20))
    val ratios = pairs.map { case ((ia, va), (ib, vb)) => sd2(sk(ia), sk(ib)) / d2(va, vb) }
    // Gaussian JL at k=16: each ratio concentrates around 1; allow wide slack
    assert(ratios.forall(r => r > 0.2 && r < 5.0), s"ratios out of band: $ratios")
    assert(math.abs(ratios.sum / ratios.size - 1.0) < 0.5, s"mean ratio ${ratios.sum / ratios.size}")
  }

  test("pcaSpectrum: a dominant axis carries the variance; spectrum matches the mirror") {
    // points spread along (1,1,0)/√2 with small noise on the other axes:
    // the top eigenvalue must dominate and its evr be near 1e6 ppm
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 60L).map { i =>
      val t = rnd.nextFloat() * 4f - 2f
      i -> Array(t + rnd.nextFloat() * 0.01f, t + rnd.nextFloat() * 0.01f, rnd.nextFloat() * 0.01f)
    }
    val got = Similarity.pcaSpectrum(embDF(vecs), topK = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = graft.llm.SequentialCorpus.pcaSpectrum(
      vecs.map { case (i, a) => (i, a.map(_.toDouble).toIndexedSeq) }, topK = 3)
    assert(got === expected)
    assert(got.head._3 > 990000L, s"dominant axis should carry >99% variance, got ${got.head._3} ppm")
    // eigenvalues ranked descending and non-negative up to the quantization grain
    assert(got.map(_._2) === got.map(_._2).sorted.reverse)
    assert(got.forall(_._2 >= -1L))
  }

  test("pcaSpectrum matches the mirror on real embeddings; evr sums to ~1e6 ppm") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.pcaSpectrum(e, topK = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toIndexedSeq)).toSeq
    assert(got === graft.llm.SequentialCorpus.pcaSpectrum(vecs, topK = 64))
    // full spectrum: explained-variance ratios must account for the trace
    val total = got.map(_._3).sum
    assert(math.abs(total - 1000000L) < 100L, s"evr sum $total ppm")
  }

  test("pcaProject: per-component projected variance reproduces the eigenvalue") {
    val rnd = new scala.util.Random(23)
    val vecs = (0L until 80L).map(i =>
      i -> Array.fill(6)(rnd.nextFloat() * 2f - 1f))
    val e = embDF(vecs)
    val spec = Similarity.pcaSpectrum(e, topK = 4).collect()
      .map(r => r.getLong(1).toDouble / 1e9)
    val proj = Similarity.pcaProject(e, p = 4).collect()
      .map(_.getSeq[Double](1).toIndexedSeq)
    val n = proj.length
    for (c <- 0 until 4) {
      val xs = proj.map(_(c))
      val mean = xs.sum / n
      val varC = xs.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(varC - spec(c)) < 1e-3,
        s"component $c: projected variance $varC vs eigenvalue ${spec(c)}")
    }
  }
}
