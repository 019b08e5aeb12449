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

  test("changeSet: merge(old, changeSet(old, new)) == new (round-trip identity)") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "v", "x")
    val neu = Seq((1L, "a", 10.0),                       // unchanged
        (2L, "B", 20.0),                                  // update
        (4L, "d", 41.0),                                  // update (double col)
        (5L, "e", 50.0))                                  // insert; 3 deleted
      .toDF("k", "v", "x")
    val delta = SnapshotDiff.changeSet(old, neu, Seq("k"))
    // minimal: unchanged key 1 is absent
    val deltaKeys = delta.select("k", "is_delete").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(deltaKeys === Map(2L -> false, 3L -> true, 4L -> false, 5L -> false))
    // applying it to old reproduces new exactly
    val merged = graft.operators.MergeInto.merge(old, delta, Seq("k"),
        deleteCol = Some("is_delete"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val expected = neu.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(merged === expected)
  }

  test("asOfVersion: latest version <= v wins; unborn keys absent") {
    val s = spark
    import s.implicits._
    val hist = Seq(
      (1L, "a1", 1L), (1L, "a3", 3L),       // key 1: versions 1, 3
      (2L, "b2", 2L),                       // key 2: born at version 2
      (3L, "c1", 1L), (3L, "c2", 2L), (3L, "c3", 3L))
      .toDF("k", "v", "version")
    def read(v: Long) = SnapshotDiff.asOfVersion(hist, Seq("k"), "version", v)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(read(1L) === Set((1L, "a1", 1L), (3L, "c1", 1L)))       // key 2 unborn
    assert(read(2L) === Set((1L, "a1", 1L), (2L, "b2", 2L), (3L, "c2", 2L)))
    assert(read(3L) === Set((1L, "a3", 3L), (2L, "b2", 2L), (3L, "c3", 3L)))
  }
}
