package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.CommitTable

/** Column mapping (f28, r15 verdict Next #5): RENAME/DROP COLUMN as
  * metadata-only commits — a logical→physical name map in the log
  * header; reads project through the map, old versions keep old names,
  * writes after a rename stage under the stable physical names, and no
  * data file is ever rewritten for a schema rename.
  */
class ColumnMappingSpec extends SparkSpec {

  private def kv(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("k", "v")
  }

  test("rename is metadata-only: zero data rewrites, head reads the new name, old versions keep old names") {
    val dir = Files.createTempDirectory("graft-cmap").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv(1L -> 10L, 2L -> 20L))                     // v0
    val files0 = t.read().inputFiles.toSet
    val v1 = t.renameColumn("v", "amount")                    // v1: metadata-only
    assert(v1 === 1L)
    assert(t.read().columns.toSeq === Seq("k", "amount"))
    assert(t.read().inputFiles.toSet === files0, "rename must rewrite nothing")
    assert(t.read().select("amount").collect().map(_.getLong(0)).toSet === Set(10L, 20L))
    // the old version still reads under its old name
    assert(t.asOf(0L).columns.toSeq === Seq("k", "v"))
    // writes AFTER the rename use the logical name and land physically stable
    t.append(kv(3L -> 30L).withColumnRenamed("v", "amount"))  // v2
    assert(t.read().filter(col("k") === 3L).select("amount").head().getLong(0) === 30L)
    // ...and v2's batch is readable from v0's lens too? No — v0 predates
    // it; the HEAD is the union under logical names
    assert(t.read().count() === 3L)
    // rename the renamed column again: chains through to the same physical
    t.renameColumn("amount", "price")                         // v3
    assert(t.read().columns.toSeq === Seq("k", "price"))
    assert(t.read().select("price").collect().map(_.getLong(0)).toSet === Set(10L, 20L, 30L))
    assert(t.columnMapping() === Some(Seq("k" -> "k", "price" -> "v")))
  }

  test("drop column is metadata-only; the physical data stays for old versions") {
    val dir = Files.createTempDirectory("graft-cmap-drop").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv(1L -> 10L, 2L -> 20L))
    val files0 = t.read().inputFiles.toSet
    t.dropColumn("v")
    assert(t.read().columns.toSeq === Seq("k"))
    assert(t.read().inputFiles.toSet === files0, "drop must rewrite nothing")
    assert(t.asOf(0L).columns.toSeq === Seq("k", "v"), "old versions keep the column")
    // a fresh append need not carry the dropped column; a NEW column of
    // the SAME logical name is a fresh identity mapping only if the
    // physical slot is free — here it is not, so it must be rejected
    t.append(kv(3L -> 0L).select("k"))
    assert(t.read().count() === 3L)
    val e = intercept[IllegalArgumentException](
      t.append(kv(4L -> 40L)))
    assert(e.getMessage.contains("physical"),
      s"reusing a dropped column's physical slot must fail loudly, got: ${e.getMessage}")
  }

  test("rename carries through DML, compaction, DV deletes, and restore; conflicts and bad names fail loudly") {
    val dir = Files.createTempDirectory("graft-cmap-mix").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 8L).map(i => i -> i * 10L): _*))    // v0
    t.renameColumn("v", "amount")                             // v1
    t.deleteRange(7L, 8L)                                     // v2 CoW
    assert(t.read().columns.toSeq === Seq("k", "amount"))
    t.deleteRangeDV(6L, 6L)                                   // v3 DV
    assert(t.read().select("k").collect().map(_.getLong(0)).toSet === (1L to 5L).toSet)
    t.compact(1)                                              // v4 full rewrite
    assert(t.read().columns.toSeq === Seq("k", "amount"))
    assert(t.read().count() === 5L)
    t.updateRange(1L, 1L, "amount", "amount + 5")             // v5 (logical name)
    assert(t.read().filter(col("k") === 1L).select("amount").head().getLong(0) === 15L)
    // restore to a pre-rename version restores the old read surface
    t.restore(0L)
    assert(t.read().columns.toSeq === Seq("k", "v"))
    assert(t.read().count() === 8L)
    // unknown / colliding names fail loudly
    intercept[IllegalArgumentException](t.renameColumn("nope", "x"))
    intercept[IllegalArgumentException](t.renameColumn("v", "k"))
  }

  test("pruned reads keep their physical-key contract under a renamed surface") {
    val dir = Files.createTempDirectory("graft-cmap-prune").toString
    val t = new CommitTable(spark, dir, "k")
    t.overwrite(kv((1L to 20L).map(i => i -> i): _*).repartitionByRange(4, col("k")))
    t.renameColumn("k", "id")
    // the stats/cluster key stays PHYSICAL (storage-layer identity);
    // the read surface is logical
    val pr = t.prunedRead(5L, 8L)
    assert(pr.columns.toSeq === Seq("id", "v"))
    assert(pr.select("id").collect().map(_.getLong(0)).toSet === (5L to 8L).toSet)
  }
}
