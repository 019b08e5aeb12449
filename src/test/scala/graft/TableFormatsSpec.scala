package graft

import java.nio.file.Files
import graft.sources.TableFormats
import org.apache.spark.SparkException
import org.apache.spark.sql.types.StructType

class TableFormatsSpec extends SparkSpec {

  private def tmp(name: String) = Files.createTempDirectory("graft-fmt").resolve(name).toString

  private def sampleDocs = {
    val s = spark
    import s.implicits._
    Seq((1L, "hello world", "en"), (2L, "guten tag", "de")).toDF("doc_id", "text", "lang")
  }

  test("csv round-trip preserves rows and schema") {
    val p = tmp("docs_csv")
    TableFormats.writeCsv(sampleDocs, p)
    val back = TableFormats.readCsv(spark, p, StructType.fromDDL("doc_id LONG, text STRING, lang STRING"))
    // nullability differs by construction (file reads are always nullable)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      sampleDocs.schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(_.toSeq).toSet === sampleDocs.collect().map(_.toSeq).toSet)
  }

  test("jsonl round-trip preserves rows") {
    val p = tmp("docs_json")
    TableFormats.writeJsonl(sampleDocs, p)
    val back = TableFormats.readJsonl(spark, p, StructType.fromDDL("doc_id LONG, text STRING, lang STRING"))
    assert(back.collect().map(_.toSeq).toSet === sampleDocs.collect().map(_.toSeq).toSet)
  }

  test("FAILFAST surfaces malformed json instead of nulling it") {
    val p = tmp("bad.jsonl")
    Files.writeString(java.nio.file.Paths.get(p), "{\"doc_id\": 1, \"text\": \"ok\"}\n{not json}\n")
    val df = TableFormats.readJsonl(spark, p, StructType.fromDDL("doc_id LONG, text STRING"))
    intercept[SparkException](df.collect())
  }

  test("permissive mode keeps malformed rows inspectable") {
    val p = tmp("bad2.jsonl")
    Files.writeString(java.nio.file.Paths.get(p), "{\"doc_id\": 1, \"text\": \"ok\"}\n{not json}\n")
    val rows = TableFormats.readJsonlPermissive(spark, p, StructType.fromDDL("doc_id LONG, text STRING"))
      .collect()
    assert(rows.length === 2)
    assert(rows.count(!_.isNullAt(2)) === 1) // one corrupt record captured
  }

  test("edge-list csv feeds the graph surface") {
    val p = tmp("edges.csv")
    Files.writeString(java.nio.file.Paths.get(p), "src,dst\n0,1\n1,2\n")
    val e = TableFormats.readEdgeCsv(spark, p)
    assert(vertexLevels(graph.Traversals.bfs(e, 0L)) === Seq((0L, 0), (1L, 1), (2L, 2)))
  }

  test("avro round-trip: full type coverage incl. nulls, binary, arrays, date, timestamp") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val p = tmp("avro_types")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("s", StringType),
      StructField("b", BooleanType),
      StructField("bin", BinaryType),
      StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("vec", ArrayType(FloatType, containsNull = false)),
      StructField("tags", ArrayType(StringType, containsNull = true))))
    val ts = java.sql.Timestamp.valueOf("2024-06-01 12:34:56.123456")
    val rows = Seq(
      Row(1L, 7, 2.5d, 1.5f, "a", true, Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2024-06-01"), ts,
        Seq(0.1f, 0.2f), Seq("x", null)),
      Row(2L, null, null, null, null, null, null, null, null,
        Seq.empty[Float], null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val n = graft.sources.AvroTables.write(df, p)
    assert(n === 2L, "one container file per non-empty partition")
    val back = graft.sources.AvroTables.read(spark, p)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      schema.map(f => (f.name, f.dataType)))
    val got = back.collect().sortBy(_.getLong(0))
    assert(got.length === 2)
    val r1 = got.head
    assert(r1.getInt(1) === 7 && r1.getString(4) === "a" && r1.getBoolean(5))
    assert(r1.getAs[Array[Byte]]("bin").toSeq === Seq[Byte](1, 2, 3))
    assert(r1.getAs[java.sql.Date]("dt") === java.sql.Date.valueOf("2024-06-01"))
    assert(r1.getAs[java.sql.Timestamp]("ts") === ts,
      "timestamp-micros must round-trip to the microsecond")
    assert(r1.getAs[Seq[Float]]("vec") === Seq(0.1f, 0.2f))
    assert(r1.getAs[Seq[String]]("tags") === Seq("x", null))
    val r2 = got(1)
    assert((1 to 8).forall(r2.isNullAt), "nullable columns round-trip NULL")
    assert(r2.getAs[Seq[Float]]("vec") === Seq.empty, "empty array stays [] — not NULL")
    assert(r2.isNullAt(10), "a NULL array column stays NULL")
    // unsupported column types fail the WRITE up front with the column name
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(java.math.BigDecimal.ONE)), 1),
      StructType(Seq(StructField("dec", DecimalType(10, 2)))))
    val e = intercept[IllegalArgumentException](
      graft.sources.AvroTables.write(bad, tmp("avro_bad")))
    assert(e.getMessage.contains("dec"))
  }

  test("avro read schema comes from the container header; empty partitions write no file") {
    val s = spark
    import s.implicits._
    val p = tmp("avro_hdr")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(8)
    val n = graft.sources.AvroTables.write(df, p)
    assert(n <= 2L, "empty partitions must not produce files")
    val back = graft.sources.AvroTables.read(spark, p)
    assert(back.columns.toSeq === Seq("k", "v"))
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set(1L -> "a", 2L -> "b"))
    // writing into a non-empty directory is refused (ErrorIfExists)
    intercept[IllegalArgumentException](
      graft.sources.AvroTables.write(df, p))
  }

  test("avro sync-marker splits: one multi-block file reads as many tasks, exactly once (r17 verdict Next #5)") {
    val s = spark
    import s.implicits._
    val p = tmp("avro_split")
    // ONE container file with many small blocks (syncInterval floors at
    // 32 bytes in the Avro writer; long string payloads force rotation)
    val df = (0L until 5000L).map(i => (i, s"payload-$i-" + "x" * 40))
      .toDF("k", "v").coalesce(1)
    assert(graft.sources.AvroTables.write(df, p, syncInterval = 1024) === 1L)
    // small splitBytes fans the single file out to MANY byte-range tasks
    val back = graft.sources.AvroTables.read(spark, p, splitBytes = 16 * 1024)
    assert(back.rdd.getNumPartitions > 1,
      s"a multi-block file must split past one task, got ${back.rdd.getNumPartitions}")
    // exactly-once across range boundaries: every record once, none lost
    assert(back.count() === 5000L)
    assert(back.select("k").collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until 5000L).toSeq)
    // whole-file reads (default split) agree
    val whole = graft.sources.AvroTables.read(spark, p)
    assert(whole.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      back.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("avro dead-attempt temp files are invisible to readers and the write count (r17 advice)") {
    val s = spark
    import s.implicits._
    val p = tmp("avro_tmpdbr")
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
    assert(graft.sources.AvroTables.write(df, p) === 1L)
    // plant a TRUNCATED in-flight temp (what a killed attempt leaves) and
    // a foreign dot-file: neither may reach the reader or future listings
    val fs = new java.io.File(p)
    java.nio.file.Files.write(
      new java.io.File(fs, ".tmp-part-00007-99.avro.inprogress").toPath,
      Array[Byte](0x4f, 0x62, 0x6a, 0x01)) // 'Obj1' magic, then truncated
    java.nio.file.Files.write(
      new java.io.File(fs, ".hidden.avro").toPath, Array[Byte](1, 2, 3))
    val back = graft.sources.AvroTables.read(spark, p)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set(1L -> "a", 2L -> "b"),
      "a truncated dead-attempt file must never decode as data")
  }
}
