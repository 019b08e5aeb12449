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

  test("decodeStub: deterministic fixed-width features, byte counts preserved") {
    val f = MediaOps.decodeStub(MediaOps.syntheticMedia(docs), featureDim = 4)
      .collect().map(r => r.media_id -> r).toMap
    assert(f.values.forall(_.feature.length === 4))
    assert(f(0L).n_bytes === 8L)
    // histogram of byte buckets sums to 1 (all bytes accounted for)
    assert(math.abs(f(0L).feature.sum - 1.0f) < 1e-6)
    // deterministic: same input, same features
    val again = MediaOps.decodeStub(MediaOps.syntheticMedia(docs), featureDim = 4)
      .collect().map(r => r.media_id -> r.feature.toSeq).toMap
    assert(again(2L) === f(2L).feature.toSeq)
  }

  test("sampleFrames: stride-samples the declared frame count, frames tile the payload") {
    // doc 2 is video (id % 3 == 2): n_frames = 2 % 30 + 1 = 3, len 8 -> frame_len 2
    val frames = MediaOps.sampleFrames(MediaOps.syntheticMedia(docs), stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), new String(r.getAs[Array[Byte]](2), "UTF-8")))
    assert(frames.toSeq === Seq((2L, 0, "qr"), (2L, 2, "uv")))
  }

  test("resizeStub: images get the target dims and payload size; other modalities untouched") {
    val resized = MediaOps.resizeStub(MediaOps.syntheticMedia(docs), outW = 2, outH = 2)
      .collect().map(r => r.media_id -> r).toMap
    // doc 0 is the image (0 % 3 == 0)
    assert(resized(0L).width === 2 && resized(0L).height === 2)
    assert(resized(0L).content.length === 4)
    // audio/video rows pass through unchanged
    assert(new String(resized(1L).content, "UTF-8") === "ijklmnop")
    // deterministic
    val again = MediaOps.resizeStub(MediaOps.syntheticMedia(docs), 2, 2)
      .collect().map(r => r.media_id -> r.content.toSeq).toMap
    assert(again(0L) === resized(0L).content.toSeq)
  }

  test("mediaMeta: integer-exact binary metadata") {
    val r = MediaOps.mediaMeta(docs).filter("media_id = 0").head
    assert(r.getLong(2) === 8L)
    // magic = big-endian int of "abcd" = 0x61626364
    assert(r.getLong(4) === 0x61626364L)
  }

  test("decodeFeatures: recovered bucket counts partition the payload bytes") {
    val rows = MediaOps.decodeFeatures(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(2)
      val counts = (3 until 11).map(r.getLong)
      assert(counts.sum === n, s"media ${r.getLong(0)}: buckets ${counts.sum} != n_bytes $n")
      assert(counts.forall(_ >= 0))
    }
  }

  test("decodeFeatures fails loudly past the float32 exact-recovery bound (~8 MB)") {
    // n·2⁻²⁴ ≥ 0.5 at n = 2²³: round(f_i·n) could silently drift off the
    // integer-exact oracle, so the guard must raise instead
    val big = docsDF(Seq(0L -> "x" * (1 << 23)))
    val e = intercept[Exception](MediaOps.decodeFeatures(big).collect())
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("exact-recovery bound")), s"unexpected failure: $e")
    // and a payload just under the bound still works
    val ok = docsDF(Seq(0L -> "x" * ((1 << 23) - 1)))
    val r = MediaOps.decodeFeatures(ok).collect().head
    assert((3 until 11).map(r.getLong).sum === (1L << 23) - 1)
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
}
