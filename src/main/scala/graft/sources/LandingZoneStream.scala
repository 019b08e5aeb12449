package graft.sources

import java.util

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Directory-tail STREAMING ingest source (r17 verdict Next #8 — the
  * 100 TB ingest front door): a DataSourceV2 `MicroBatchStream` that
  * tails a LANDING DIRECTORY of JSONL or Avro files and surfaces each
  * newly arrived file's rows exactly once, with offsets the engine's
  * streaming checkpoint log makes restart-safe. Pairs with
  * [[graft.operators.CommitTable.appendIdempotent]] in a `foreachBatch`
  * sink for end-to-end exactly-once raw-file → commit-table ingest —
  * previously raw landing files had to be batch-loaded first
  * ([[graft.streaming.CommitLogStream]] covers table-to-table, not the
  * front door).
  *
  * OFFSET = FILE-NAME HIGH-WATERMARK. The offset is the largest landing
  * file name included so far — one short string, not a seen-file set, so
  * checkpoint size is O(1) regardless of how many files ever landed (the
  * built-in file source persists a compacted seen-file MAP that grows
  * with history — the known scale liability this source avoids). The
  * contract this buys: landing file names must be lexicographically
  * MONOTONIC (rotation counters, zero-padded sequence numbers, ULIDs,
  * `<epoch-millis>-<uuid>` — what log shippers emit), because a file
  * sorting at-or-below the watermark is by definition already consumed —
  * a contract-violating late file is indistinguishable from a consumed
  * one and will NOT be ingested. That trade is explicit: shippers that
  * cannot name monotonically should land into fresh subdirectories per
  * epoch or use the built-in file source and pay its seen-file map.
  *
  * Visibility discipline: dot-prefixed names are invisible (in-flight
  * upload convention — the [[AvroTables]] temp-name rule), so shippers
  * upload to `.tmp…` and rename into place; a half-written file is never
  * offered to a batch.
  *
  * Scale shape: `latestOffset` is one directory listing (driver,
  * file-count-sized); each micro-batch plans one partition per NEW file
  * — arrival-bounded work, never a re-scan of the directory's history.
  */
class LandingZoneStream extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LandingZoneStream.schemaFor(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "landing source needs a path: spark.readStream.format(...).load(path)")
    val fmt = LandingZoneStream.formatOf(properties.get("format"))
    new LandingTable(path, fmt, schema)
  }
}

object LandingZoneStream {

  private[sources] val Jsonl = "jsonl"
  private[sources] val Avro = "avro"

  private[sources] def formatOf(v: String): String = {
    val fmt = if (v == null || v.isEmpty) Jsonl else v.toLowerCase
    require(fmt == Jsonl || fmt == Avro,
      s"landing source format must be $Jsonl or $Avro, got $fmt")
    fmt
  }

  private[sources] def suffixOf(fmt: String): String =
    if (fmt == Avro) ".avro" else ".jsonl"

  /** A published landing file: right suffix, never dot-prefixed (the
    * in-flight upload convention — see class doc). */
  private[sources] def isLandingFile(name: String, fmt: String): Boolean =
    name.endsWith(suffixOf(fmt)) && !name.startsWith(".")

  /** Schema resolution: JSONL takes an explicit `ddl` option (a raw
    * landing line has no types); Avro reads the FIRST file's embedded
    * header — self-describing, one driver read. */
  private[sources] def schemaFor(options: CaseInsensitiveStringMap): StructType = {
    val fmt = formatOf(options.get("format"))
    if (fmt == Jsonl) {
      val ddl = options.get("ddl")
      require(ddl != null && ddl.nonEmpty,
        "landing source (jsonl) needs a ddl option, e.g. .option(\"ddl\", \"k BIGINT, v STRING\")")
      val st = StructType.fromDDL(ddl)
      st.fields.foreach(f => require(supported(f.dataType),
        s"landing source: column ${f.name} has unsupported type ${f.dataType.simpleString} " +
          "(supported: bigint/int/double/string/boolean)"))
      st
    } else {
      val path = options.get("path")
      require(path != null && path.nonEmpty, "landing source needs a path")
      val conf = SparkSession.active.sessionState.newHadoopConf()
      val fs = new Path(path).getFileSystem(conf)
      val files = fs.listStatus(new Path(path))
        .filter(s => s.isFile && isLandingFile(s.getPath.getName, Avro))
        .sortBy(_.getPath.getName)
      require(files.nonEmpty,
        s"landing source (avro): need at least one .avro file under $path to infer the schema")
      val header = new DataFileReader(
        new FsInput(files.head.getPath, conf), new GenericDatumReader[GenericRecord]())
      val avroSchema = try header.getSchema finally header.close()
      AvroTables.toSparkSchema(avroSchema)
    }
  }

  private[sources] def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | StringType | BooleanType => true
    case _ => false
  }
}

private[sources] class LandingTable(path: String, fmt: String, tschema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft_landing(`$path`)"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // admission control: bound each micro-batch to N newly arrived files
    // (the built-in sources' maxFilesPerTrigger) — at ingest scale a
    // backlog otherwise lands as ONE giant catch-up batch
    val maxFiles = Option(options.get("maxFilesPerTrigger")).map { v =>
      val n = v.toInt
      require(n > 0, s"maxFilesPerTrigger must be positive, got $n")
      n
    }
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tschema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new LandingMicroBatch(path, fmt, tschema, maxFiles)
      }
    }
  }
}

/** The watermark offset: the largest landing file NAME included so far
  * ("" = nothing yet). O(1) checkpoint bytes by construction. */
private[sources] case class LandingOffset(watermark: String) extends Offset {
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.put("watermark", watermark)
    m.writeValueAsString(root)
  }
}

private[sources] object LandingOffset {
  def fromJson(json: String): LandingOffset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    LandingOffset(node.get("watermark").asText())
  }
}

private[sources] class LandingMicroBatch(path: String, fmt: String,
                                         schema: StructType,
                                         maxFiles: Option[Int] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val hadoopConf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())

  private def listEligible(): Array[String] = {
    val fs = new Path(path).getFileSystem(hadoopConf.value)
    if (!fs.exists(new Path(path))) Array.empty
    else fs.listStatus(new Path(path))
      .filter(s => s.isFile && LandingZoneStream.isLandingFile(s.getPath.getName, fmt))
      .map(_.getPath.getName).sorted
  }

  override def initialOffset(): Offset = LandingOffset("")

  override def getDefaultReadLimit: ReadLimit =
    maxFiles.map(n => ReadLimit.maxFiles(n)).getOrElse(ReadLimit.allAvailable())

  /** Rate-limited offset advance: at most `maxFiles` NEW files per
    * micro-batch (a backlog drains over several batches instead of one
    * giant catch-up batch — each still exactly-once, the watermark just
    * advances in steps). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val lo = start.asInstanceOf[LandingOffset].watermark
    val fresh = listEligible().filter(_ > lo)
    val take = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    if (take.isEmpty) start else LandingOffset(take.last)
  }

  /** The un-limited head, for lag metrics (how far ingest is behind). */
  override def reportLatestOffset(): Offset = {
    val names = listEligible()
    if (names.isEmpty) LandingOffset("") else LandingOffset(names.last)
  }

  // the admission-control variant above is the one the engine drives;
  // this legacy form is unreachable but must exist on the interface
  override def latestOffset(): Offset = reportLatestOffset()

  override def deserializeOffset(json: String): Offset = LandingOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[LandingOffset].watermark
    val hi = end.asInstanceOf[LandingOffset].watermark
    listEligible()
      .filter(n => n > lo && n <= hi)
      .map(n => LandingPartition(new Path(path, n).toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LandingReaderFactory(hadoopConf, fmt, schema)

  override def commit(end: Offset): Unit = () // consumed files stay in place
  override def stop(): Unit = ()
}

private[sources] case class LandingPartition(file: String) extends InputPartition

private[sources] class LandingReaderFactory(hadoopConf: SerializableConfiguration,
                                            fmt: String, schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val f = partition.asInstanceOf[LandingPartition].file
    if (fmt == LandingZoneStream.Avro)
      new LandingAvroReader(hadoopConf.value, f, schema)
    else new LandingJsonlReader(hadoopConf.value, f, schema)
  }
}

/** JSONL decode with the DECLARED schema: one Jackson parse per line,
  * missing/null fields → NULL, type coercion per the declared column
  * type (a landing line's `1` reads as BIGINT 1 or DOUBLE 1.0 as
  * declared). Malformed lines fail loudly with the file name — a landing
  * zone's half-garbled file must stop ingest, not silently drop rows. */
private[sources] class LandingJsonlReader(conf: Configuration, file: String,
                                          schema: StructType)
    extends PartitionReader[InternalRow] {
  private val in = new Path(file).getFileSystem(conf).open(new Path(file))
  private val lines = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private var cur: String = _
  override def next(): Boolean = {
    cur = lines.readLine()
    while (cur != null && cur.isEmpty) cur = lines.readLine()
    cur != null
  }
  override def get(): InternalRow = {
    val node = try mapper.readTree(cur)
    catch { case e: Exception => throw new java.io.IOException(
      s"landing source: malformed JSONL line in $file", e) }
    InternalRow.fromSeq(schema.fields.toIndexedSeq.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case LongType => v.asLong()
        case IntegerType => v.asInt()
        case DoubleType => v.asDouble()
        case BooleanType => v.asBoolean()
        case StringType => UTF8String.fromString(v.asText())
        case other => throw new IllegalArgumentException(
          s"landing source: unsupported type $other for ${f.name}")
      }
    })
  }
  override def close(): Unit = lines.close()
}

/** Avro container decode via the same core-API machinery as
  * [[AvroTables.read]], emitted as InternalRow. */
private[sources] class LandingAvroReader(conf: Configuration, file: String,
                                         schema: StructType)
    extends PartitionReader[InternalRow] {
  private val reader = new DataFileReader(
    new FsInput(new Path(file), conf), new GenericDatumReader[GenericRecord]())
  private var cur: GenericRecord = _
  override def next(): Boolean = {
    val has = reader.hasNext
    if (has) cur = reader.next()
    has
  }
  override def get(): InternalRow =
    InternalRow.fromSeq(schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
      val v = cur.get(i)
      if (v == null) null
      else f.dataType match {
        case StringType => UTF8String.fromString(v.toString)
        case LongType => v.asInstanceOf[java.lang.Long].longValue()
        case IntegerType => v.asInstanceOf[java.lang.Integer].intValue()
        case DoubleType => v.asInstanceOf[java.lang.Double].doubleValue()
        case BooleanType => v.asInstanceOf[java.lang.Boolean].booleanValue()
        case other => throw new IllegalArgumentException(
          s"landing source: unsupported type $other for ${f.name} " +
            "(supported: bigint/int/double/string/boolean)")
      }
    })
  override def close(): Unit = reader.close()
}
