package graft

import graft.llm.Packing
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "shard", "n_tokens")
  }

  private def pack(rows: Seq[(Long, String, Long)], c: Long) =
    Packing.packChunks(docs(rows), "shard", "doc_id", "n_tokens", c)
      .select("doc_id", "start_offset", "chunk_first", "chunk_last", "n_chunks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq.sortBy(_._1)

  test("hand-computed placement: boundary-straddling and exact-fit docs") {
    // shard stream: 100 + 100 + 60 tokens, chunks of 128
    val got = pack(Seq((1L, "a", 100L), (2L, "a", 100L), (3L, "a", 60L)), c = 128L)
    assert(got === Seq(
      (1L, 0L, 0L, 0L, 1L),     // [0,100) inside chunk 0
      (2L, 100L, 0L, 1L, 2L),   // [100,200) straddles 0->1
      (3L, 200L, 1L, 2L, 2L))) // [200,260) straddles 1->2
    // exact fit: [0,128) ends at the boundary, stays in chunk 0
    assert(pack(Seq((1L, "a", 128L)), c = 128L) === Seq((1L, 0L, 0L, 0L, 1L)))
  }

  test("zero-token docs occupy one chunk at their offset; shards are independent") {
    val got = pack(Seq((1L, "a", 128L), (2L, "a", 0L), (3L, "b", 5L)), c = 128L)
    assert(got === Seq(
      (1L, 0L, 0L, 0L, 1L),
      (2L, 128L, 1L, 1L, 1L), // empty doc at the boundary: chunk 1, not 0
      (3L, 0L, 0L, 0L, 1L)))  // shard b starts at offset 0
  }

  test("matches a brute-force fold on random shards; chunks cover the stream exactly") {
    val rng = new scala.util.Random(23)
    val rows = (1L to 300L).map(i => (i, s"s${i % 7}", rng.nextInt(90).toLong))
    val c = 64L
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      var off = 0L
      ds.sortBy(_._1).map { case (id, _, n) =>
        val start = off; off += n
        val last = math.max(off - 1, start) / c
        (id, start, start / c, last, last - start / c + 1)
      }
    }.sortBy(_._1)
    assert(pack(rows, c) === expected)
  }

  test("contract violations are rejected up front") {
    intercept[IllegalArgumentException](
      Packing.packChunks(docs(Seq((1L, "a", 1L))), "shard", "doc_id", "n_tokens", 0L))
    intercept[IllegalArgumentException](
      Packing.packChunks(docs(Seq((1L, "a", 1L))).withColumn("n_chunks", lit(1L)),
        "shard", "doc_id", "n_tokens", 8L))
  }
}
