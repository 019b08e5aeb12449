package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
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
  *
  * Because the format is driver-sized BY CONTRACT, the read path parses the
  * file on the driver in one pass (Hadoop `fs.open`, so any FileSystem URI
  * still works) instead of paying distributed-plan overhead: the previous
  * implementation launched ~4 Spark jobs per read (text scan, a
  * single-partition global Window to number lines, a blank-line-check
  * aggregate, the edge collect) — pure scheduling cost for a file that is
  * capped smaller than one task's input split. A size guard rejects files
  * past the dense cap BEFORE buffering them driver-side.
  */
object MatrixFormat {

  /** Hard cap on matrix file bytes buffered driver-side: a 10k-vertex dense
    * matrix ("0 "-cells) is ~200 MB, so 512 MB covers the format's own cap
    * with headroom while refusing an accidental huge input loudly.
    */
  private val MaxFileBytes: Long = 512L * 1024 * 1024

  /** Resolve the single-file contract and read all lines on the driver.
    *
    * Line numbers are semantic in this format, so a directory or multi-file
    * glob — where no cross-file ordering exists — is rejected rather than
    * silently mis-numbered.
    */
  private def readLines(spark: SparkSession, path: String): IndexedSeq[String] =
    readLinesConf(spark.sparkContext.hadoopConfiguration, path)

  private[sources] def readLinesConf(conf: org.apache.hadoop.conf.Configuration,
                                     path: String): IndexedSeq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val matches = fs.globStatus(p)
    require(matches != null && matches.length == 1 && matches.head.isFile,
      s"matrix format is a single text file; '$path' resolves to " +
        s"${if (matches == null) 0 else matches.length} entries")
    require(matches.head.getLen <= MaxFileBytes,
      s"matrix file '$path' is ${matches.head.getLen} bytes — past the " +
        s"driver-sized cap of $MaxFileBytes (the dense format tops out ~200 MB at 10k vertices)")
    val in = new BufferedReader(
      new InputStreamReader(fs.open(matches.head.getPath), StandardCharsets.UTF_8))
    try {
      val buf = IndexedSeq.newBuilder[String]
      var line = in.readLine()
      while (line != null) { buf += line; line = in.readLine() }
      buf.result()
    } finally in.close()
  }

  /** Validate blank-line structure and parse the matrix body to edges.
    * Line i (1-based) of the body is vertex i's adjacency row; an INTERIOR
    * blank line would silently shift every later row's id by one — reject it
    * (only trailing blanks are tolerated; the reference writer emits none).
    */
  /** One-call parse for the DSv2 reader ([[MatrixSourceV2]]), which runs on
    * an EXECUTOR and so carries a Hadoop `Configuration` instead of a
    * session. Same guards as the driver path.
    */
  private[sources] def parseEdgesConf(conf: org.apache.hadoop.conf.Configuration,
                                      path: String): Seq[(Long, Long)] =
    parseEdges(path, readLinesConf(conf, path))

  private def parseEdges(path: String, lines: IndexedSeq[String]): Seq[(Long, Long)] = {
    val lastData = lines.lastIndexWhere(_.trim.nonEmpty)
    val firstBlank = lines.indexWhere(_.trim.isEmpty, 1)
    require(firstBlank == -1 || (lastData >= 0 && firstBlank > lastData),
      s"malformed matrix file '$path': blank line $firstBlank inside the data block " +
        "(line numbers are semantic — a blank interior line would shift every later vertex id)")
    for {
      i <- 1 to lastData
      (cell, j) <- lines(i).trim.split("\\s+").zipWithIndex
      if cell == "1"
    } yield (i.toLong, (j + 1).toLong)
  }

  private def edgesDF(spark: SparkSession, pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  /** Read a matrix text file → edges `(src LONG, dst LONG)`, 1-based ids. */
  def readEdges(spark: SparkSession, path: String): DataFrame =
    edgesDF(spark, parseEdges(path, readLines(spark, path)))

  /** Read a matrix file as (edges, vertex set 1..n from the header) — the
    * ingest shape GraphCatalog.addGraph takes to preserve isolated vertices
    * (an all-zero row/column is a legal vertex in the reference format,
    * `primaryServer.c:43`). One file read serves both outputs.
    */
  def readGraph(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val lines = readLines(spark, path)
    require(lines.nonEmpty, s"empty matrix file: $path")
    val n = lines.head.trim.toInt
    val vertices = spark.range(1, n + 1).toDF("id")
    (edgesDF(spark, parseEdges(path, lines)), vertices)
  }

  /** Read just the header line (declared vertex count) of a matrix file. */
  def readVertexCount(spark: SparkSession, path: String): Int = {
    val lines = readLines(spark, path)
    require(lines.nonEmpty, s"empty matrix file: $path")
    lines.head.trim.toInt
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
