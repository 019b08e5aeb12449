package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.MergeInto

class MergeIntoSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String, java.lang.Long)], cols: (String, String, String)): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (k, v, w) => (k, v, Option(w).map(Long2long)) }
      .toDF(cols._1, cols._2, cols._3)
      .select(col(cols._1), col(cols._2), col(cols._3).cast("long"))
  }

  private val target = df(
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)), ("k", "v", "w"))

  test("merge: update + insert + untouched pass-through") {
    val source = df(Seq((2L, "B", 99L), (4L, "d", 40L)), ("k", "v", "w"))
    val out = MergeInto.merge(target, source, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(out === Set(
      (1L, "a", Some(10L)), (2L, "B", Some(99L)), (3L, "c", Some(30L)), (4L, "d", Some(40L))))
  }

  test("merge: matched source NULL data column overwrites (UPDATE SET *)") {
    val source = df(Seq((2L, "B", null)), ("k", "v", "w"))
    val out = MergeInto.merge(target, source, Seq("k"))
      .filter(col("k") === 2).collect()
    assert(out.length === 1 && out(0).getString(1) === "B" && out(0).isNullAt(2))
  }

  test("merge: delete flag drops matched rows and is never emitted") {
    val source = df(Seq((2L, "B", 99L), (3L, "ignored", 0L), (5L, "e", 50L)), ("k", "v", "w"))
      .withColumn("del", col("k") === 3)
    val merged = MergeInto.merge(target, source, Seq("k"), deleteCol = Some("del"))
    assert(merged.columns.toSeq === Seq("k", "v", "w"))
    val out = merged.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set((1L, "a", 10L), (2L, "B", 99L), (5L, "e", 50L)))
  }

  test("merge: delete of an absent key is a no-op, not an insert") {
    val source = df(Seq((4L, "d", 40L), (9L, "ghost", 0L)), ("k", "v", "w"))
      .withColumn("del", col("k") === 9)
    val out = MergeInto.merge(target, source, Seq("k"), deleteCol = Some("del"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // key 9 never existed in the target and its delete flag is set: it must
    // neither be inserted nor affect anything else
    assert(out === Set((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
  }

  test("merge: composite keys match on all key columns") {
    val s = spark
    import s.implicits._
    val t2 = Seq((1L, "x", 10L), (1L, "y", 20L)).toDF("k1", "k2", "w")
    val s2 = Seq((1L, "y", 99L), (2L, "x", 7L)).toDF("k1", "k2", "w")
    val out = MergeInto.merge(t2, s2, Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set((1L, "x", 10L), (1L, "y", 99L), (2L, "x", 7L)))
  }

  test("merge: schema mismatch is rejected") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, "x")).toDF("k", "v")
    assertThrows[IllegalArgumentException] {
      MergeInto.merge(target, bad, Seq("k"))
    }
  }
}
