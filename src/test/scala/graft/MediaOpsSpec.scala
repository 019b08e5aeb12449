package graft

import graft.llm.MediaOps

class MediaOpsSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private val docs = docsDF(Seq(0L -> "abcdefgh", 1L -> "ijklmnop", 2L -> "qrstuvwx"))

  test("syntheticMedia: modality cycles by id, payload is the raw bytes") {
    val m = MediaOps.syntheticMedia(docs).collect().map(r => r.media_id -> r).toMap
    assert(m(0L).modality === "image" && m(1L).modality === "audio" && m(2L).modality === "video")
    assert(new String(m(0L).content, "UTF-8") === "abcdefgh")
    assert(m(1L).sample_rate === 16000)
  }

  test("byteFeatures: deterministic fixed-width features, byte counts preserved") {
    val f = MediaOps.byteFeatures(MediaOps.syntheticMedia(docs), featureDim = 4)
      .collect().map(r => r.media_id -> r).toMap
    assert(f.values.forall(_.feature.length === 4))
    assert(f(0L).n_bytes === 8L)
    // histogram of byte buckets sums to 1 (all bytes accounted for)
    assert(math.abs(f(0L).feature.sum - 1.0f) < 1e-6)
    // deterministic: same input, same features
    val again = MediaOps.byteFeatures(MediaOps.syntheticMedia(docs), featureDim = 4)
      .collect().map(r => r.media_id -> r.feature.toSeq).toMap
    assert(again(2L) === f(2L).feature.toSeq)
  }

  test("decodePpm: round-trips encodePpm; handles comments; rejects malformed input") {
    val raster = Array.tabulate(2 * 3 * 3)(i => (i * 7 % 256).toByte)
    val (w, h, px) = MediaOps.decodePpm(MediaOps.encodePpm(2, 3, raster))
    assert(w === 2 && h === 3 && px.toSeq === raster.toSeq)
    // header comments and mixed whitespace per the Netpbm spec
    val commented = ("P6 # inline\n# full comment line\n 2\t3 \n255\n")
      .getBytes("US-ASCII") ++ raster
    val (w2, h2, px2) = MediaOps.decodePpm(commented)
    assert(w2 === 2 && h2 === 3 && px2.toSeq === raster.toSeq)
    // malformed inputs fail loudly
    intercept[IllegalArgumentException](MediaOps.decodePpm("P5\n2 3\n255\n".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      MediaOps.decodePpm(MediaOps.encodePpm(2, 3, raster).dropRight(1))) // truncated raster
    intercept[IllegalArgumentException](
      MediaOps.decodePpm("P6\n2 3\n65535\n".getBytes("US-ASCII") ++ raster)) // 16-bit
  }

  test("ppmFeatures: decoded sums match the generating formula; parse is byte-exact") {
    val ids = docsDF(Seq(0L -> "", 5L -> "", 11L -> ""))
    val got = MediaOps.ppmFeatures(ids).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    for (id <- Seq(0L, 5L, 11L)) {
      val w = id % 8 + 2; val h = id % 6 + 2
      def chanSum(c: Int) = (0L until w * h).map(p => (id * 31 + p * 3 + c) % 256).sum
      assert(got(id) === ((w, h, chanSum(0), chanSum(1), chanSum(2))), s"id $id")
    }
  }

  test("resizePpm: real nearest-neighbor resample over decoded pixels, re-encoded as P6") {
    val s = spark
    import s.implicits._
    // 2x1 image: left pixel (10,20,30), right pixel (40,50,60)
    val raster = Array[Byte](10, 20, 30, 40, 50, 60)
    val rec = MediaOps.MediaRecord(1L, "image", MediaOps.encodePpm(2, 1, raster), 2, 1, 0, 0)
    val other = MediaOps.MediaRecord(2L, "audio", Array[Byte](1, 2, 3), 0, 0, 16000, 0)
    val out = MediaOps.resizePpm(Seq(rec, other).toDS(), outW = 4, outH = 2)
      .collect().map(r => r.media_id -> r).toMap
    val (w, h, px) = MediaOps.decodePpm(out(1L).content)
    assert(w === 4 && h === 2 && out(1L).width === 4 && out(1L).height === 2)
    // nearest-neighbor: output columns 0,1 sample source col 0; 2,3 sample col 1
    val row = px.grouped(3).map(_.toSeq).toSeq
    assert(row(0) === Seq[Byte](10, 20, 30) && row(1) === Seq[Byte](10, 20, 30))
    assert(row(2) === Seq[Byte](40, 50, 60) && row(3) === Seq[Byte](40, 50, 60))
    assert(row.take(4) === row.drop(4)) // both output rows sample the single source row
    // non-image rows pass through untouched
    assert(out(2L).content.toSeq === Seq[Byte](1, 2, 3))
  }

  test("augmentPpm: horizontal flip then center crop over real pixels") {
    val s = spark
    import s.implicits._
    // 4x3 image with pixel (y, x) carrying bytes (10y+x, 100+10y+x, 200... keep
    // it simple: channel c of pixel (y, x) = (y*4 + x)*3 + c, all < 127
    val raster = Array.tabulate(4 * 3 * 3)(i => i.toByte)
    val rec = MediaOps.MediaRecord(1L, "image", MediaOps.encodePpm(4, 3, raster), 4, 3, 0, 0)
    val out = MediaOps.augmentPpm(Seq(rec).toDS(), cropW = 2, cropH = 2).collect().head
    val (w, h, px) = MediaOps.decodePpm(out.content)
    assert(w === 2 && h === 2)
    // x0 = 1, y0 = 0; out(oy, ox) = src(oy, 4-1-(1+ox)) = src(oy, 2-ox)
    def src(y: Int, x: Int, c: Int) = ((y * 4 + x) * 3 + c).toByte
    for (oy <- 0 to 1; ox <- 0 to 1; c <- 0 to 2)
      assert(px((oy * 2 + ox) * 3 + c) === src(oy, 2 - ox, c), s"($oy,$ox,$c)")
    // too-small images fail loudly
    val tiny = MediaOps.MediaRecord(2L, "image",
      MediaOps.encodePpm(2, 2, Array.fill(12)(0.toByte)), 2, 2, 0, 0)
    val ex = intercept[org.apache.spark.SparkException](
      MediaOps.augmentPpm(Seq(tiny).toDS(), cropW = 3, cropH = 3).collect())
    assert(ex.getMessage != null)
  }

  test("shotBoundaries: hand-computed frame diffs, threshold flags the jump cut") {
    val s = spark
    import s.implicits._
    // 3 frames of 4 bytes: f0 = f1 (diff 0), f2 jumps on two bytes
    val payload = Array[Byte](10, 20, 30, 40, 10, 20, 30, 40, 110, 120, 30, 40)
    val rec = MediaOps.MediaRecord(1L, "video", payload, 0, 0, 0, 3)
    val got = MediaOps.shotBoundaries(Seq(rec).toDS(), thrPermille = 100L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // diff(2) = 200; 200·1000 > 100·255·4 = 102000 → cut; diff(1) = 0 → not
    assert(got === Seq((1L, 0L, 0L), (2L, 200L, 1L)))
    // non-video rows and sub-2-frame rows are excluded
    val audio = MediaOps.MediaRecord(2L, "audio", payload, 0, 0, 16000, 3)
    val short = MediaOps.MediaRecord(3L, "video", payload, 0, 0, 0, 1)
    assert(MediaOps.shotBoundaries(Seq(audio, short).toDS()).count() === 0L)
    intercept[IllegalArgumentException](
      MediaOps.shotBoundaries(Seq(rec).toDS(), thrPermille = 1001L))
  }

  test("sampleFrames: stride-samples the declared frame count, frames tile the payload") {
    // doc 2 is video (id % 3 == 2): n_frames = 2 % 30 + 1 = 3, len 8 -> frame_len 2
    val frames = MediaOps.sampleFrames(MediaOps.syntheticMedia(docs), stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), new String(r.getAs[Array[Byte]](2), "UTF-8")))
    assert(frames.toSeq === Seq((2L, 0, "qr"), (2L, 2, "uv")))
  }

  test("resizePpm over the synthetic PPM corpus: deterministic, dims and payload re-encoded") {
    val ids = docsDF(Seq(3L -> "", 4L -> ""))
    val resized = MediaOps.resizePpm(MediaOps.syntheticPpm(ids), outW = 3, outH = 2)
      .collect().map(r => r.media_id -> r).toMap
    assert(resized.values.forall(r => r.width === 3 && r.height === 2))
    assert(resized.values.forall(r => MediaOps.decodePpm(r.content)._3.length === 3 * 2 * 3))
    val again = MediaOps.resizePpm(MediaOps.syntheticPpm(ids), 3, 2)
      .collect().map(r => r.media_id -> r.content.toSeq).toMap
    assert(again(3L) === resized(3L).content.toSeq)
  }

  test("mediaMeta: integer-exact binary metadata") {
    val r = MediaOps.mediaMeta(docs).filter("media_id = 0").head
    assert(r.getLong(2) === 8L)
    // magic = big-endian int of "abcd" = 0x61626364
    assert(r.getLong(4) === 0x61626364L)
  }

  test("mediaDedup groups identical headers+size, keeper is min id") {
    // docs 1 and 3 share the first 12 bytes AND the size bucket; doc 2
    // differs in byte 1; doc 4 shares header with 1/3 but is much longer
    val base = "HEADERBYTES!" // exactly 12 chars
    val rows = Seq(
      1L -> (base + "tail-a"),
      3L -> (base + "tail-b"),
      2L -> ("XEADERBYTES!" + "tail-a"),
      4L -> (base + ("y" * 200)))
    val got = MediaOps.mediaDedup(docsDF(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val fp = got.map(_._1).distinct
    assert(fp.length === 2) // two distinct headers
    // the shared-header short docs collapse to one group with keeper 1
    assert(got.exists { case (_, bucket, n, keeper) => bucket === 0L && n === 2L && keeper === 1L })
    // the long doc lands in its own size bucket despite the same header
    assert(got.exists { case (_, bucket, n, keeper) => bucket === (212 / 64).toLong && n === 1L && keeper === 4L })
    // the different-header doc is its own group
    assert(got.exists { case (_, _, n, keeper) => n === 1L && keeper === 2L })
  }

  test("dHash: brightness-shift invariant, gradient-edit sensitive") {
    // a 6x4 gradient image; +40 on every byte preserves every gradient
    val w = 6; val h = 4
    val raster = Array.tabulate(w * h * 3)(i => ((i * 7) % 180).toByte)
    val shifted = raster.map(b => ((b & 0xff) + 40).toByte)
    val a = MediaOps.dHash(MediaOps.encodePpm(w, h, raster))
    val b = MediaOps.dHash(MediaOps.encodePpm(w, h, shifted))
    assert(a === b, "brightness shift must not change the dHash")
    // reversing the raster reverses sampled gradients -> different hash
    val edited = raster.reverse
    val c = MediaOps.dHash(MediaOps.encodePpm(w, h, edited))
    assert(a !== c, "a real edit must change the dHash")
  }

  test("perceptualDedup collapses brightness families m4's byte hashing cannot") {
    // ids 1 and 41 are the same base image at different brightness: every
    // raster byte differs, but the perceptual group is shared
    val rows = Seq(1L -> "x", 41L -> "x", 2L -> "y")
    val fams = MediaOps.syntheticPpmFamilies(docsDF(rows)).collect()
    val p1 = fams.find(_.media_id == 1L).get.content
    val p41 = fams.find(_.media_id == 41L).get.content
    assert(!java.util.Arrays.equals(p1, p41), "family members must differ in bytes")
    // 1 and 41 must land in ONE group (other bases may coincidentally
    // share the hash on these tiny gradients — that group then just grows)
    val got = MediaOps.perceptualDedup(docsDF(rows)).collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSet // (n_items, keeper)
    assert(got.exists { case (n, keeper) => keeper == 1L && n >= 2L },
      s"family {1, 41} did not collapse: ${got.mkString(",")}")
    val totalGrouped = got.toSeq.map(_._1).sum
    assert(totalGrouped === 3L)
  }

  test("s16 PCM codec round-trips, including range extremes; odd payloads fail") {
    val samples = Array(0, 1, -1, 127, -128, 255, -256, 32767, -32768, 12345, -23456)
    assert(MediaOps.decodePcm(MediaOps.encodePcm(samples)).toSeq === samples.toSeq)
    // little-endian byte order pinned: 0x1234 → [0x34, 0x12]
    assert(MediaOps.encodePcm(Array(0x1234)).toSeq === Seq(0x34.toByte, 0x12.toByte))
    intercept[IllegalArgumentException](MediaOps.decodePcm(Array[Byte](1)))
    intercept[IllegalArgumentException](MediaOps.encodePcm(Array(40000)))
  }

  /** Independent restatement of the synthetic sample formula. */
  private def pcmRef(id: Long, i: Int): Int =
    if ((i / 16) % 4 == 3) ((id + i) % 121).toInt - 60
    else ((id * 31 + i.toLong * i * 17 + 7L * i) % 65536).toInt - 32768

  test("audioResample: identity ratio preserves the signal; 3/4 matches a brute-force interp") {
    val idy = MediaOps.audioResample(docs, l = 1, m = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    idy.foreach { case (_, nIn, nOut, _) => assert(nOut === nIn) }
    val raw = docs.collect().map(_.getLong(0)).map { id =>
      val n = (64 + id % 64).toInt
      id -> Array.tabulate(n)(i => pcmRef(id, i))
    }.toMap
    idy.foreach { case (id, _, _, sumY) =>
      assert(sumY === raw(id).map(_.toLong).sum, s"identity resample changed clip $id")
    }
    val got = MediaOps.audioResample(docs, l = 3, m = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    got.foreach { case (id, nOut, sumY, minY, maxY) =>
      val x = raw(id)
      val n = x.length
      val ys = (0 to ((n - 1) * 3) / 4).map { j =>
        val i = (j * 4) / 3
        val f = (j * 4) % 3
        val ip = math.min(i + 1, n - 1)
        ((x(i) + 32768L) * (3 - f) + (x(ip) + 32768L) * f) / 3 - 32768L
      }
      assert(nOut === ys.size.toLong, s"clip $id n_out")
      assert(sumY === ys.sum && minY === ys.min && maxY === ys.max, s"clip $id aggregates")
    }
    intercept[IllegalArgumentException](MediaOps.audioResample(docs, l = 0))
  }

  test("audioFrames computes energy, zero crossings and silence on a known clip") {
    // doc_id 0 → 64 samples, 4 frames; frame 3 is the quiet segment:
    // samples (0+i)%121-60 for i=48..63 → |s| ≤ 60 < 256 → silent
    val got = MediaOps.audioFrames(docsDF(Seq(0L -> "x"))).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(got.length === 4)
    assert(got.forall(_._2 == 16L))
    // mirror the formula sequentially
    def sample(i: Int): Long =
      if ((i / 16) % 4 == 3) (0L + i) % 121 - 60
      else (0L * 31 + i.toLong * i * 17 + 7L * i) % 65536 - 32768
    for (f <- 0 until 4) {
      val fr = (f * 16 until (f + 1) * 16).map(sample)
      val energy = fr.map(s => s * s).sum
      val zc = fr.sliding(2).count(p => p.head * p.last < 0)
      val silent = fr.map(math.abs).max < 256
      assert(got(f) === ((f.toLong, 16L, energy, zc.toLong, silent)), s"frame $f")
    }
    assert(got(3)._5, "quiet segment must be silent")
    assert(!got(0)._5)
  }
}
