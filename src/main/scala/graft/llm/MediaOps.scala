package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, per the builder brief.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): `decodeStub` derives deterministic fake features from the raw
  * bytes at the exact point a real decoder would run. Everything around it —
  * schema, partition-batched iteration, feature shape, frame sampling — is
  * real Spark and tested.
  *
  * Scale notes: `mapPartitions` over a `Dataset[MediaRecord]` is the Scala
  * analogue of `mapInPandas` — the decode UDF sees an iterator over a whole
  * partition, so per-batch setup (model load, codec init) amortizes across
  * rows; binary payloads stream through Tungsten without driver collection.
  * Partition sizing for ~MB-scale blobs is the caller's
  * `spark.sql.files.maxPartitionBytes` concern, documented here.
  */
object MediaOps {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long, modality: String, content: Array[Byte],
      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  /** Extracted features per media row (fixed-width embedding + byte stats). */
  final case class MediaFeatures(
      media_id: Long, modality: String, n_bytes: Long, feature: Array[Float])

  private val Modalities = Seq("image", "audio", "video")

  /** Deterministic synthetic media derived from the `documents` table: the
    * UTF-8 text bytes stand in for an encoded payload; metadata is a pure
    * function of doc_id. Lets the multimodal path run on driver-provided
    * data without shipping binaries.
    */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Modalities), (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("content"),
      (col("doc_id") % 640 + 1).cast("int").as("width"),
      (col("doc_id") % 480 + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("doc_id") % 30 + 1).cast("int").as("n_frames"))
      .as[MediaRecord]
  }

  /** Partition-batched "decode + featurize". The real decoder would replace
    * the body of `fakeDecode`; the iterator shape (one pass over the
    * partition, constant memory) is the contract a real codec needs.
    */
  def decodeStub(media: Dataset[MediaRecord], featureDim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (codec handles, model weights)
      it.map { r =>
        val feat = fakeDecode(r.content, featureDim)
        MediaFeatures(r.media_id, r.modality, r.content.length.toLong, feat)
      }
    }
  }

  /** STUB decoder: a deterministic byte-histogram "embedding" — stands in
    * for image decode / audio spectrogram / video keyframe extraction.
    */
  private[llm] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      acc((bytes(i) & 0xff) % dim) += 1
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    acc.map(_ / n)
  }

  /** Frame sampling for "video" rows: payload split into `n_frames` equal
    * chunks, every `stride`-th chunk kept. Pure expression plan (codegen'd):
    * `(media_id, frame_idx, frame BINARY)`.
    */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int = 2): DataFrame =
    // content rides through the explode (it is duplicated per frame row
    // either way), so there is no re-join — the plan is a single
    // scan → generate → project, no shuffle (round-3 verdict). The kept
    // indices are filtered INSIDE the array before exploding, so dropped
    // strides never become rows at all.
    media.toDF()
      .filter(col("modality") === "video" && col("n_frames") > 0)
      .withColumn("frame_len", expr("greatest(length(content) div n_frames, 1)").cast("int"))
      .select(col("media_id"), col("frame_len"), col("content"),
        explode(filter(sequence(lit(0), col("n_frames") - 1),
          i => i % stride === 0)).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        expr("substring(content, frame_idx * frame_len + 1, frame_len)").as("frame"))
      .orderBy("media_id", "frame_idx")

  /** Resize for "image" rows — nearest-neighbor subsampling over the fake
    * pixel buffer (the byte payload), preserving the metadata contract:
    * real plumbing (schema, per-row transform, new dims), stubbed codec.
    * Output rows carry the target dims and the subsampled payload.
    */
  def resizeStub(media: Dataset[MediaRecord], outW: Int, outH: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { r =>
      if (r.modality != "image" || r.content.isEmpty) r
      else {
        // nearest-neighbor over a w×h grid flattened into the byte buffer
        val src = r.content
        val out = new Array[Byte](outW * outH)
        var i = 0
        while (i < out.length) {
          val sy = ((i / outW).toLong * r.height / outH).toInt
          val sx = ((i % outW).toLong * r.width / outW).toInt
          out(i) = src(((sy.toLong * r.width + sx) % src.length).toInt)
          i += 1
        }
        r.copy(content = out, width = outW, height = outH)
      }
    }
  }

  /** Declared-query surface: binary metadata extraction with integer-exact
    * outputs — byte length, md5 prefix, first 4 payload bytes as a
    * big-endian int (the shape of a magic-number/codec sniff).
    * `(media_id, modality, n_bytes, md5_8, magic)`.
    */
  def mediaMeta(docs: DataFrame): DataFrame =
    syntheticMedia(docs).toDF().select(
      col("media_id"),
      col("modality"),
      length(col("content")).cast("long").as("n_bytes"),
      substring(md5(col("content")), 1, 8).as("md5_8"),
      conv(hex(expr("substring(content, 1, 4)")), 16, 10).cast("long").as("magic"))
      .orderBy("media_id")

  /** Declared-query surface over [[sampleFrames]]: every 2nd frame of each
    * "video" payload, reduced to integer-exact columns (md5 prefix + byte
    * count) so the binary frames oracle-check without shipping blobs
    * through the compare. `(media_id, frame_idx, frame_md5_8,
    * n_frame_bytes)`.
    */
  def frameSample(docs: DataFrame, stride: Int = 2): DataFrame =
    sampleFrames(syntheticMedia(docs), stride).select(
      col("media_id"),
      col("frame_idx").cast("long").as("frame_idx"),
      substring(md5(col("frame")), 1, 8).as("frame_md5_8"),
      length(col("frame")).cast("long").as("n_frame_bytes"))
      .orderBy("media_id", "frame_idx")

  /** DuckDB mirror of [[frameSample]]: the payload is the UTF-8 text bytes
    * and the corpus is ASCII, so byte offsets == character offsets and the
    * frame slices can be taken on the VARCHAR directly (DuckDB has no BLOB
    * substr).
    */
  def frameSampleSql(stride: Int = 2): String =
    s"""WITH m AS (SELECT doc_id AS media_id,
       |                  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
       |                  CASE WHEN octet_length(encode(text)) <> len(text)
       |                       THEN error('non-ASCII corpus: byte offsets != char offsets in frame oracle')
       |                       ELSE text END AS text,
       |                  (doc_id % 30 + 1)::INT AS n_frames
       |           FROM documents),
       |v AS (SELECT media_id, text, n_frames, greatest(len(text) // n_frames, 1) AS frame_len
       |      FROM m WHERE modality = 'video' AND n_frames > 0),
       |f AS (SELECT media_id, u.i AS frame_idx,
       |             substr(text, (u.i * frame_len + 1)::INT, frame_len::INT) AS fr
       |      FROM v, UNNEST(range(0, n_frames)) AS u(i)
       |      WHERE u.i % $stride = 0)
       |SELECT media_id, frame_idx::BIGINT AS frame_idx,
       |       substr(md5(fr), 1, 8) AS frame_md5_8, len(fr)::BIGINT AS n_frame_bytes
       |FROM f ORDER BY media_id, frame_idx""".stripMargin

  /** Declared-query surface over [[decodeStub]] — binds the partition-batched
    * decode path (the `mapInPandas` analogue) to the oracle gate. The stub's
    * feature is a normalized byte histogram, so the exact integer bucket
    * counts are recoverable as `round(f_i * n_bytes)`: with n ≤ a few KB the
    * float32 normalization error is ≪ 0.5, making the recovery exact.
    * `(media_id, modality, n_bytes, f0..f7)` — all integer columns.
    */
  def decodeFeatures(docs: DataFrame, dim: Int = 8): DataFrame = {
    val feats = decodeStub(syntheticMedia(docs), dim).toDF()
    // round(f_i·n) recovers the exact bucket count only while the float32
    // relative error n·2⁻²⁴ stays under 0.5, i.e. n < 2²³ bytes (~8 MB);
    // past that the recovery could silently diverge from the integer-exact
    // oracle — fail loudly instead (same discipline as frameSampleSql's
    // ASCII guard)
    val exactBound = 1L << 23
    val nGuarded = when(col("n_bytes") < exactBound, col("n_bytes"))
      .otherwise(raise_error(format_string(
        s"decodeFeatures: %d-byte payload exceeds the float32 exact-recovery bound of $exactBound bytes",
        col("n_bytes"))).cast("long"))
    val counts = (0 until dim).map(i =>
      round(element_at(col("feature"), i + 1) * nGuarded).cast("long").as(s"f$i"))
    feats.select(Seq(col("media_id"), col("modality"), col("n_bytes")) ++ counts: _*)
      .orderBy("media_id")
  }

  /** DuckDB mirror of [[decodeFeatures]]: per-character ascii codes bucketed
    * mod dim (the corpus is ASCII, guarded like [[frameSampleSql]], so byte
    * values == character codes); empty texts keep all-zero buckets via the
    * left join.
    */
  def decodeFeaturesSql(dim: Int = 8): String = {
    val bucketCols = (0 until dim).map(i =>
      s"COALESCE(SUM(CASE WHEN b = $i THEN 1 END), 0)::BIGINT AS f$i").mkString(",\n|         ")
    s"""WITH m AS (SELECT doc_id AS media_id,
       |                  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
       |                  CASE WHEN octet_length(encode(text)) <> len(text)
       |                       THEN error('non-ASCII corpus: ascii(char) != byte in decode oracle')
       |                       ELSE text END AS text
       |           FROM documents),
       |c AS (SELECT media_id, ascii(substr(text, u.i::INT, 1)) % $dim AS b
       |      FROM m, UNNEST(range(1, len(text) + 1)) AS u(i)),
       |h AS (SELECT media_id,
       |         $bucketCols
       |      FROM c GROUP BY media_id)
       |SELECT m.media_id AS media_id, m.modality, len(m.text)::BIGINT AS n_bytes,
       |       ${(0 until dim).map(i => s"COALESCE(h.f$i, 0) AS f$i").mkString(", ")}
       |FROM m LEFT JOIN h ON h.media_id = m.media_id
       |ORDER BY m.media_id""".stripMargin
  }

  val mediaMetaSql: String =
    """SELECT doc_id AS media_id,
      |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
      |  octet_length(text::BLOB)::BIGINT AS n_bytes,
      |  substr(md5(text), 1, 8) AS md5_8,
      |  CASE WHEN octet_length(text::BLOB) = 0 THEN NULL
      |       ELSE ('0x' || substr(hex(text::BLOB), 1, 8))::BIGINT END AS magic
      |FROM documents ORDER BY media_id""".stripMargin

  /** Binary-level media dedup (m4): group payloads by a HEADER fingerprint
    * (hex of the first `headerBytes` bytes) plus a size bucket — the cheap
    * first pass a media pipeline runs before any decode (exact-byte dup
    * and truncation families collapse on it). Works entirely on the BINARY
    * column: one scan computing an 8/12-byte key, one hash shuffle on the
    * key, keeper = min media_id (the d1 discipline over blobs instead of
    * strings).
    */
  def mediaDedup(docs: DataFrame, headerBytes: Int = 12): DataFrame =
    syntheticMedia(docs).toDF()
      .select(col("media_id"),
        hex(expr(s"substring(content, 1, $headerBytes)")).as("header_fp"),
        expr("length(content) div 64").cast("long").as("size_bucket"))
      .groupBy("header_fp", "size_bucket")
      .agg(count(lit(1)).as("n_items"), min("media_id").as("keeper"))
      .orderBy("header_fp", "size_bucket")

  def mediaDedupSql(headerBytes: Int = 12): String =
    s"""SELECT substr(hex(text::BLOB), 1, ${2 * headerBytes}) AS header_fp,
       |       (octet_length(text::BLOB) // 64)::BIGINT AS size_bucket,
       |       COUNT(*) AS n_items, MIN(doc_id) AS keeper
       |FROM documents
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
