package graft

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Directory-tail streaming ingest source (r17 verdict Next #8): offset =
  * file-name watermark (O(1) checkpoint bytes), exactly-once through
  * restarts, in-flight uploads invisible, JSONL and Avro decode legs.
  * The end-to-end exactly-once loop into a commit table is the st30 gate;
  * these tests pin the source mechanics.
  */
class LandingZoneSpec extends SparkSpec {

  private def landJsonl(dir: java.nio.file.Path, name: String, lines: Seq[String]): Unit = {
    val tmp = dir.resolve(s".$name.inprogress")
    Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  private def runInto(land: String, ckpt: String, sink: DataFrame => Unit): Unit = {
    val src = spark.readStream.format("graft.sources.LandingZoneStream")
      .option("format", "jsonl").option("ddl", "k BIGINT, v STRING")
      .load(land)
    val q = src.writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) => sink(b) }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("watermark offsets: arrivals stream exactly once across restarts; in-flight and foreign dot-files invisible") {
    val root = Files.createTempDirectory("graft-landing-spec")
    val land = root.resolve("land"); Files.createDirectories(land)
    val ckpt = root.resolve("ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    landJsonl(land, "f00001.jsonl", Seq("""{"k":1,"v":"a"}""", """{"k":2,"v":"b"}"""))
    landJsonl(land, "f00002.jsonl", Seq("""{"k":3,"v":"c"}"""))
    // an in-flight upload and a foreign dot-file must never be offered
    Files.write(land.resolve(".f00009.jsonl.inprogress"), "{\"k\":99".getBytes)
    Files.write(land.resolve(".hidden.jsonl"), """{"k":98,"v":"x"}""".getBytes)
    runInto(land.toString, ckpt, b =>
      got.synchronized { got ++= b.collect().map(r => (r.getLong(0), r.getString(1))) })
    assert(got.sorted.toSeq === Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // restart from the checkpoint: only the NEW file streams
    landJsonl(land, "f00003.jsonl", Seq("""{"k":4,"v":"d"}""", """{"k":5,"v":null}"""))
    runInto(land.toString, ckpt, b =>
      got.synchronized { got ++= b.collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))) })
    assert(got.sorted.toSeq === Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> null),
      "a restarted query must resume from the watermark — no replays, no gaps")
    // an idle restart (nothing new) streams nothing
    val before = got.length
    runInto(land.toString, ckpt, b => got.synchronized { got ++= b.collect().map(r => (r.getLong(0), "")) })
    assert(got.length === before)
  }

  test("offset is O(1) bytes: one short watermark string, not a seen-file set") {
    val root = Files.createTempDirectory("graft-landing-off")
    val land = root.resolve("land"); Files.createDirectories(land)
    (1 to 40).foreach(i => landJsonl(land, f"f$i%05d.jsonl", Seq(s"""{"k":$i,"v":"x"}""")))
    val ckpt = root.resolve("ckpt").toString
    var n = 0L
    runInto(land.toString, ckpt, b => n += b.count())
    assert(n === 40L)
    // the persisted offset is the single watermark name — file count must
    // not grow it (the built-in file source's seen-map liability)
    val offsets = new java.io.File(s"$ckpt/offsets").listFiles().sortBy(_.getName)
    assert(offsets.nonEmpty)
    // entry = Spark's fixed header lines + the source's offset json (last
    // line); the SOURCE's contribution is the watermark alone
    val lines = new String(Files.readAllBytes(offsets.last.toPath)).split("\n")
    assert(lines.last.length < 60,
      s"source offset must be one watermark string, got ${lines.last.length}: ${lines.last}")
    assert(lines.last.contains("f00040.jsonl"))
  }

  test("maxFilesPerTrigger bounds each micro-batch: a backlog drains in steps, exactly once") {
    val root = Files.createTempDirectory("graft-landing-rate")
    val land = root.resolve("land"); Files.createDirectories(land)
    (1 to 7).foreach(i => landJsonl(land, f"f$i%05d.jsonl", Seq(s"""{"k":$i,"v":"x"}""")))
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val src = spark.readStream.format("graft.sources.LandingZoneStream")
      .option("format", "jsonl").option("ddl", "k BIGINT, v STRING")
      .option("maxFilesPerTrigger", "3")
      .load(land.toString)
    val q = src.writeStream.option("checkpointLocation", root.resolve("ck").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.synchronized { batches += b.count() }; ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val drained = batches.filter(_ > 0L)
    assert(drained.sum === 7L, s"every file exactly once, got $batches")
    assert(drained.forall(_ <= 3L), s"each batch must hold <= 3 files' rows, got $batches")
    assert(drained.length >= 3, s"a 7-file backlog at 3/trigger needs >= 3 batches, got $batches")
  }

  test("avro landing leg: schema from the container header, rows decode exactly") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-landing-avro")
    val land = root.resolve("land").toString
    // AvroTables writes part-00000.avro — a valid monotonic landing name
    graft.sources.AvroTables.write(
      Seq((1L, "a", 1.5), (2L, "b", -0.5)).toDF("k", "v", "x").coalesce(1), land)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
    val src = spark.readStream.format("graft.sources.LandingZoneStream")
      .option("format", "avro").load(land)
    assert(src.schema.fieldNames.toSeq === Seq("k", "v", "x"))
    val q = src.writeStream.option("checkpointLocation", root.resolve("ck").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        got.synchronized { got ++= b.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))) }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(got.sortBy(_._1).toSeq === Seq((1L, "a", 1.5), (2L, "b", -0.5)))
  }

  test("jsonl leg requires a declared schema; malformed lines fail loudly with the file name") {
    val root = Files.createTempDirectory("graft-landing-bad")
    val land = root.resolve("land"); Files.createDirectories(land)
    landJsonl(land, "f00001.jsonl", Seq("""{"k":1,"v":"a"}"""))
    intercept[IllegalArgumentException](
      spark.readStream.format("graft.sources.LandingZoneStream")
        .load(land.toString).schema)
    landJsonl(land, "f00002.jsonl", Seq("""{"k":2,"""))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft.sources.LandingZoneStream")
        .option("format", "jsonl").option("ddl", "k BIGINT, v STRING")
        .load(land.toString)
        .writeStream.option("checkpointLocation", root.resolve("ck").toString)
        .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }.start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("f00002.jsonl") ||
      Option(e.getCause).exists(_.getMessage.contains("malformed")),
      s"a garbled landing file must stop ingest loudly, got: ${e.getMessage}")
  }
}
