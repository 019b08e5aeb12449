package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {

  private def snap(rows: Seq[(Long, String, java.lang.Long)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (k, v, w) => (k, v, Option(w).map(Long2long)) }
      .toDF("k", "v", "w")
      .select(col("k"), col("v"), col("w").cast("long"))
  }

  test("diff classifies insert/delete/update/unchanged; null-safe comparisons") {
    val old = snap(Seq(
      (1L, "a", 10L),   // unchanged
      (2L, "b", 20L),   // update (value change)
      (3L, "c", null),  // unchanged with NULL data (NULL <=> NULL)
      (4L, "d", 40L),   // update: value -> NULL must be an update
      (5L, "e", 50L)))  // delete
    val neu = snap(Seq(
      (1L, "a", 10L),
      (2L, "B", 20L),
      (3L, "c", null),
      (4L, "d", null),
      (6L, "f", 60L))) // insert
    val m = SnapshotDiff.diff(old, neu, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "unchanged", 2L -> "update", 3L -> "unchanged",
      4L -> "update", 5L -> "delete", 6L -> "insert"))
  }

  test("diff with composite keys and key-only schema (no data columns)") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, "x"), (1L, "y")).toDF("k1", "k2")
    val neu = Seq((1L, "y"), (2L, "z")).toDF("k1", "k2")
    val m = SnapshotDiff.diff(old, neu, Seq("k1", "k2")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    // no data columns: a key on both sides is definitionally unchanged
    assert(m === Map((1L, "x") -> "delete", (1L, "y") -> "unchanged", (2L, "z") -> "insert"))
  }

  test("diff rejects mismatched snapshot schemas") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, "a")).toDF("k", "v")
    val neu = Seq((1L, "a", 2L)).toDF("k", "v", "extra")
    assertThrows[IllegalArgumentException](SnapshotDiff.diff(old, neu, Seq("k")))
  }
}
