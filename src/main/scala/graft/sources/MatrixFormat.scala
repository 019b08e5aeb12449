package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-compat reader/writer for the reference's on-disk graph format
  * (written `primaryServer.c:43-49`, parsed `secondaryServer.c:210-228`):
  *
  * {{{
  * <n>                      // line 1: vertex count
  * a11 a12 ... a1n          // n rows of n space-separated 0/1 ints
  * ...
  * }}}
  *
  * `aij == 1` ⇒ edge i→j; ids are 1-based externally (`secondaryServer.c:292`).
  * The dense-matrix format is inherently single-file and driver-sized (the
  * reference caps n at 30, `utils.h:26`); both directions here enforce that
  * contract explicitly. The scalable path for graph IO is GraphCatalog's
  * parquet edge lists — this format exists for golden-file parity with the
  * reference only.
  */
object MatrixFormat {

  /** Read a matrix text file → edges `(src LONG, dst LONG)`, 1-based ids.
    *
    * Single-file contract (enforced): line numbers are semantic in this
    * format, so a directory or multi-file glob — where Spark's text source
    * gives no cross-file ordering — is rejected rather than silently
    * mis-numbered.
    */
  def readEdges(spark: SparkSession, path: String): DataFrame = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = fs.globStatus(p)
    require(matches != null && matches.length == 1 && matches.head.isFile,
      s"matrix format is a single text file; '$path' resolves to " +
        s"${if (matches == null) 0 else matches.length} entries")
    val lines = spark.read.text(path)
      .select(monotonically_increasing_id().as("fileRow"), col("value"))
    // monotonically_increasing_id is ordered within a partition but not dense
    // across partitions; re-rank to a dense 0-based line number. The single
    // Window partition is fine: one file ⇒ driver-sized input by contract.
    import org.apache.spark.sql.expressions.Window
    val numbered = lines.withColumn("lineNo",
      row_number().over(Window.orderBy("fileRow")) - 1)
    // line numbers are vertex ids in this format, so an INTERIOR blank line
    // would silently shift every later row's id by one — reject it instead
    // (only trailing blanks are tolerated; the reference writer emits none)
    val blankCheck = numbered
      .agg(
        max(when(trim(col("value")) =!= "", col("lineNo"))).as("lastData"),
        min(when(trim(col("value")) === "" && col("lineNo") >= 1, col("lineNo"))).as("firstBlank"))
      .collect().head
    // a degenerate all-blank file leaves lastData null — reject it loudly
    // (was an NPE from getInt on null) while still tolerating trailing blanks
    val lastData = if (blankCheck.isNullAt(0)) -1 else blankCheck.getInt(0)
    require(blankCheck.isNullAt(1) || (lastData >= 0 && blankCheck.getInt(1) > lastData),
      s"malformed matrix file '$path': blank line ${blankCheck.getInt(1)} inside the data block " +
        "(line numbers are semantic — a blank interior line would shift every later vertex id)")
    numbered
      .filter(col("lineNo") >= 1 && trim(col("value")) =!= "")
      .select((col("lineNo")).as("src"), // row i of the matrix = vertex i (1-based)
        posexplode(split(trim(col("value")), "\\s+")).as(Seq("colIdx", "cell")))
      .filter(col("cell") === "1")
      .select(col("src").cast("long"), (col("colIdx") + 1).cast("long").as("dst"))
  }

  /** Read a matrix file as (edges, vertex set 1..n from the header) — the
    * ingest shape GraphCatalog.addGraph takes to preserve isolated vertices
    * (an all-zero row/column is a legal vertex in the reference format,
    * `primaryServer.c:43`).
    */
  def readGraph(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val n = readVertexCount(spark, path)
    val vertices = spark.range(1, n + 1).toDF("id")
    (readEdges(spark, path), vertices)
  }

  /** Read just the header line (declared vertex count) of a matrix file. */
  def readVertexCount(spark: SparkSession, path: String): Int = {
    val first = spark.read.text(path).limit(1).collect()
    require(first.nonEmpty, s"empty matrix file: $path")
    first.head.getString(0).trim.toInt
  }

  /** Write edges `(src, dst)` (1-based) as the reference's dense text format.
    *
    * @param vertexCount explicit n for the header; defaults to the max edge
    *                    endpoint — pass it to round-trip graphs with trailing
    *                    isolated vertices (the header is the format's true
    *                    vertex count, `primaryServer.c:43`).
    *
    * Ids are validated to be ≥ 1 (the format is 1-based,
    * `secondaryServer.c:292`); dense n×n output is inherently driver-sized,
    * guarded by `maxVertices`.
    */
  def writeMatrix(spark: SparkSession, edges: DataFrame, path: String,
                  vertexCount: Option[Int] = None, maxVertices: Int = 10000): Unit = {
    import spark.implicits._
    val typed = edges.select(col("src").cast("long"), col("dst").cast("long"))
    // guard BEFORE collecting: id bounds come from a distributed aggregate,
    // so an oversized edge set fails with the cap message instead of OOMing
    // the driver on collect
    val bounds = typed
      .agg(max(greatest(col("src"), col("dst"))).as("maxId"),
        min(least(col("src"), col("dst"))).as("minId"))
      .collect().head
    val maxId = if (bounds.isNullAt(0)) 0L else bounds.getLong(0)
    val minId = if (bounds.isNullAt(1)) 1L else bounds.getLong(1)
    require(minId >= 1,
      s"matrix format ids are 1-based; min edge endpoint is $minId — shift ids before writing")
    require(vertexCount.forall(_ >= maxId),
      s"vertexCount ${vertexCount.get} < max edge endpoint $maxId")
    val nL = math.max(maxId, vertexCount.getOrElse(0).toLong)
    require(nL <= maxVertices, s"dense matrix output capped at $maxVertices vertices, got $nL")
    val n = nL.toInt
    val pairs = typed.as[(Long, Long)].collect()
    val m = Array.fill(n, n)(0)
    pairs.foreach { case (s, d) => m(s.toInt - 1)(d.toInt - 1) = 1 }
    val text = (Seq(n.toString) ++ m.map(_.mkString(" "))).mkString("\n") + "\n"
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }
}
