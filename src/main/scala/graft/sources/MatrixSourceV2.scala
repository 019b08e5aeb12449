package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 connector for the reference's dense matrix text format
  * (`primaryServer.c:43-49` / `secondaryServer.c:210-228`) — the PLUGGABLE
  * route to the same edges [[MatrixFormat.readEdges]] parses imperatively:
  *
  * {{{ spark.read.format("graft.sources.MatrixSourceV2").load(path) }}}
  *
  * What the V2 plumbing buys over the helper function: the source joins the
  * engine's planning surface — a fixed schema Catalyst can prune against,
  * scans that compose with every DataFrame operator, and explicit partition
  * planning. Partition planning here is deliberately a SINGLE partition:
  * line numbers are semantic in this format (row i of the body is vertex
  * i's adjacency row), so there is no cross-split ordering to recover — the
  * single-file, driver-sized contract ([[MatrixFormat]]'s guards, which the
  * reader reuses verbatim) IS the format. The scalable graph IO path
  * remains GraphCatalog's parquet edge lists; this connector exists so the
  * compat format is a first-class table, not a special-cased helper.
  */
class MatrixSourceV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MatrixSourceV2.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft matrix source needs a path: spark.read.format(...).load(path)")
    new MatrixV2Table(path)
  }
}

object MatrixSourceV2 {
  /** 1-based edge endpoints, like [[MatrixFormat.readEdges]]. */
  val Schema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))
}

private[sources] class MatrixV2Table(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_matrix(`$path`)"
  override def schema(): StructType = MatrixSourceV2.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MatrixV2ScanBuilder(path)
}

/** Column pruning (`SupportsPushDownRequiredColumns`): a degree count over one
  * endpoint reads one LONG per edge instead of two. The parse cost is the
  * format's (every matrix cell is visited regardless), but the rows handed to
  * Spark — and anything downstream that serializes them — carry only the
  * requested columns, and the scan's `readSchema` reports the pruned shape so
  * `.explain` shows the projection reached the source.
  */
private[sources] class MatrixV2ScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = MatrixSourceV2.Schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new MatrixV2Scan(path, required)
}

private[sources] class MatrixV2Scan(path: String, required: StructType)
    extends Scan with Batch {
  // Captured at plan time on the driver so the executor-side reader sees the
  // session's spark.hadoop.* settings (credentials, custom filesystems) —
  // a fresh executor-side `new Configuration()` would silently drop them.
  private val hadoopConf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(MatrixV2Partition(path))
  override def createReaderFactory(): PartitionReaderFactory =
    new MatrixV2ReaderFactory(hadoopConf, required.fieldNames)
}

private[sources] case class MatrixV2Partition(path: String) extends InputPartition

private[sources] class MatrixV2ReaderFactory(hadoopConf: SerializableConfiguration,
                                             fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new MatrixV2Reader(hadoopConf.value,
      partition.asInstanceOf[MatrixV2Partition].path, fields)
}

/** Executor-side reader over the driver's shipped Hadoop configuration — the
  * single-partition scan means one open per query, the same IO profile as
  * the driver parse.
  */
private[sources] class MatrixV2Reader(conf: Configuration, path: String,
                                      fields: Array[String])
    extends PartitionReader[InternalRow] {
  private val edges = MatrixFormat.parseEdgesConf(conf, path).iterator
  // Pruned projection: emit only the requested endpoints, in request order.
  private val project: Array[(Long, Long) => Long] = fields.map {
    case "src" => (s: Long, _: Long) => s
    case "dst" => (_: Long, d: Long) => d
    case other => throw new IllegalArgumentException(s"unknown matrix column: $other")
  }
  private var cur: (Long, Long) = _
  override def next(): Boolean = {
    val has = edges.hasNext
    if (has) cur = edges.next()
    has
  }
  override def get(): InternalRow =
    InternalRow.fromSeq(project.toIndexedSeq.map(f => f(cur._1, cur._2)))
  override def close(): Unit = ()
}
