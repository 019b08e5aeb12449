package graft

import graft.operators.{MergeInto, Partitioning}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Copy-on-write MERGE over the hive-partitioned layout: the spec's core
  * claim (the round-7 verdict's #2) is that partitions the change-set does
  * NOT touch survive the merge byte-identical — same files, same bytes,
  * same modification times — while touched partitions take the merged
  * content.
  */
class MergeCowSpec extends SparkSpec {

  private def tmpTable(name: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"),
      s"graft-cow-$name-${ProcessHandle.current().pid()}")
    TempDirs.deleteOnExit(p)
    p.toString
  }

  /** (relative path -> (size, mtime, md5)) for every data file under dir. */
  private def fileState(dir: String): Map[String, (Long, Long, String)] = {
    val root = Paths.get(dir)
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
      .map { p =>
        val rel = root.relativize(p).toString
        val bytes = Files.readAllBytes(p)
        val md = java.security.MessageDigest.getInstance("MD5")
        val h = md.digest(bytes).map("%02x".format(_)).mkString
        rel -> ((bytes.length.toLong, Files.getLastModifiedTime(p).toMillis, h))
      }.toMap
  }

  private def writeTarget(path: String): Unit = {
    val s = spark
    import s.implicits._
    val rows = (1L to 400L).map(i => (i, (2000 + (i % 4)).toInt, i * 10.0, s"name$i"))
    Partitioning.writeHivePartitioned(
      rows.toDF("id", "part_year", "amount", "name"), path, "part_year")
  }

  private def readBack(path: String): Map[Long, (Int, Double, String)] =
    spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("part_year"), r.getAs[Double]("amount"), r.getAs[String]("name"))))
      .toMap

  test("untouched partitions are byte-identical after the merge; touched are rewritten") {
    val s = spark
    import s.implicits._
    val path = tmpTable("stable")
    writeTarget(path)
    val before = fileState(path)

    // change-set confined to part_year=2001: one update, one insert, one delete
    val source = Seq(
      (1L, 2001, 999.0, "updated", false),  // id 1 has 1 % 4 == 1 -> 2001
      (9001L, 2001, 1.0, "inserted", false),
      (5L, 2001, 0.0, "x", true))           // id 5 -> 2001, deleted
      .toDF("id", "part_year", "amount", "name", "is_delete")
    val touched = MergeInto.mergeCow(s, path, source,
      keys = Seq("id"), partCol = "part_year", deleteCol = Some("is_delete"))
    assert(touched === Seq("2001"))

    val after = fileState(path)
    val untouchedBefore = before.filter(!_._1.startsWith("part_year=2001"))
    val untouchedAfter = after.filter(!_._1.startsWith("part_year=2001"))
    assert(untouchedAfter === untouchedBefore,
      "untouched partitions must keep identical files, bytes, and mtimes")
    assert(after.keys.exists(_.startsWith("part_year=2001")))
    assert(before.filter(_._1.startsWith("part_year=2001")) !=
      after.filter(_._1.startsWith("part_year=2001")), "touched partition must be rewritten")

    val got = readBack(path)
    assert(got(1L) === ((2001, 999.0, "updated")))
    assert(got(9001L) === ((2001, 1.0, "inserted")))
    assert(!got.contains(5L))
    assert(got(2L) === ((2002, 20.0, "name2"))) // untouched row intact
    assert(got.size === 400) // 400 - 1 delete + 1 insert
  }

  test("an update that moves a row across partitions rewrites both old and new") {
    val s = spark
    import s.implicits._
    val path = tmpTable("move")
    writeTarget(path)
    val before = fileState(path)

    // id 2 lives in 2002; move it to 2099 (a brand-new partition)
    val source = Seq((2L, 2099, 42.0, "moved", false))
      .toDF("id", "part_year", "amount", "name", "is_delete")
    val touched = MergeInto.mergeCow(s, path, source,
      keys = Seq("id"), partCol = "part_year", deleteCol = Some("is_delete"))
    assert(touched === Seq("2002", "2099"))

    val after = fileState(path)
    assert(after.filter(!_._1.matches("part_year=(2002|2099).*")) ===
      before.filter(!_._1.startsWith("part_year=2002")),
      "partitions other than the source and destination must be untouched")
    val got = readBack(path)
    assert(got(2L) === ((2099, 42.0, "moved")))
    assert(got.count(_._2._1 == 2099) === 1)
    // no duplicate left behind in 2002
    assert(spark.read.parquet(path).filter(col("id") === 2L).count() === 1)
  }

  test("deleting every row of a partition removes its directory") {
    val s = spark
    import s.implicits._
    val path = tmpTable("drain")
    writeTarget(path)
    // all ids with i % 4 == 3 live in 2003: delete them all
    val ids = (1L to 400L).filter(_ % 4 == 3)
    val source = ids.map(i => (i, 2003, 0.0, "x", true))
      .toDF("id", "part_year", "amount", "name", "is_delete")
    val touched = MergeInto.mergeCow(s, path, source,
      keys = Seq("id"), partCol = "part_year", deleteCol = Some("is_delete"))
    assert(touched === Seq("2003"))
    assert(!Files.exists(Paths.get(path, "part_year=2003")),
      "emptied partition directory must be removed")
    assert(spark.read.parquet(path).filter(col("part_year") === 2003).count() === 0)
    assert(spark.read.parquet(path).count() === 300)
  }

  test("delete of an absent key is a no-op and touches only its named partition") {
    val s = spark
    import s.implicits._
    val path = tmpTable("absent")
    writeTarget(path)
    val source = Seq((999999L, 2000, 0.0, "x", true))
      .toDF("id", "part_year", "amount", "name", "is_delete")
    val before = readBack(path)
    val touched = MergeInto.mergeCow(s, path, source,
      keys = Seq("id"), partCol = "part_year", deleteCol = Some("is_delete"))
    assert(touched === Seq("2000")) // named partition still audited/rewritten
    assert(readBack(path) === before, "delete of absent key must change nothing")
  }

  test("partition-stable keys (partCol in keys) skip the discovery scan and stay correct") {
    val s = spark
    import s.implicits._
    val path = tmpTable("stable-keys")
    writeTarget(path)
    val before = fileState(path)
    val source = Seq((3L, 2003, 7.0, "pk-updated", false))
      .toDF("id", "part_year", "amount", "name", "is_delete")
    val touched = MergeInto.mergeCow(s, path, source,
      keys = Seq("id", "part_year"), partCol = "part_year",
      deleteCol = Some("is_delete"))
    assert(touched === Seq("2003"))
    assert(fileState(path).filter(!_._1.startsWith("part_year=2003")) ===
      before.filter(!_._1.startsWith("part_year=2003")))
    assert(readBack(path)(3L) === ((2003, 7.0, "pk-updated")))
  }

  test("cow merge result equals the plain full-table merge (oracle-in-suite)") {
    val s = spark
    import s.implicits._
    val path = tmpTable("oracle")
    writeTarget(path)
    val full = spark.read.parquet(path)
      .select("id", "part_year", "amount", "name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSeq
    val source = Seq(
      (1L, 2001, 999.0, "u1", false),
      (2L, 2099, 42.0, "moved", false),
      (5L, 2001, 0.0, "x", true),
      (9001L, 2000, 1.0, "ins", false))
      .toDF("id", "part_year", "amount", "name", "is_delete")
    val plain = MergeInto.merge(full.toDF("id", "part_year", "amount", "name"),
        source, keys = Seq("id"), deleteCol = Some("is_delete"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet
    MergeInto.mergeCow(s, path, source,
      keys = Seq("id"), partCol = "part_year", deleteCol = Some("is_delete"))
    val cow = spark.read.parquet(path)
      .select("id", "part_year", "amount", "name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))).toSet
    assert(cow === plain)
  }
}
