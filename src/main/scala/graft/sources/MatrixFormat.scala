package graft.sources

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
  * The reader converts dense matrix → sparse 1-based edge list as a single
  * declarative plan: number lines, split, posexplode, filter on cell==1 —
  * fully distributed, no driver loop, so a matrix far beyond the reference's
  * 30-vertex cap (`utils.h:26`) still streams through executors.
  */
object MatrixFormat {

  /** Read a matrix text file → edges `(src LONG, dst LONG)`, 1-based ids. */
  def readEdges(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .select(monotonically_increasing_id().as("fileRow"), col("value"))
    // monotonically_increasing_id is ordered within a partition but not dense
    // across partitions; re-rank to a dense 0-based line number.
    import org.apache.spark.sql.expressions.Window
    val numbered = lines.withColumn("lineNo",
      row_number().over(Window.orderBy("fileRow")) - 1)
    numbered
      .filter(col("lineNo") >= 1 && trim(col("value")) =!= "")
      .select((col("lineNo")).as("src"), // row i of the matrix = vertex i (1-based)
        posexplode(split(trim(col("value")), "\\s+")).as(Seq("colIdx", "cell")))
      .filter(col("cell") === "1")
      .select(col("src").cast("long"), (col("colIdx") + 1).cast("long").as("dst"))
  }

  /** Write edges `(src, dst)` (1-based) as the reference's dense text format.
    * Dense n×n output is inherently driver-sized (the reference caps n at 30,
    * `utils.h:26`); guarded accordingly.
    */
  def writeMatrix(spark: SparkSession, edges: DataFrame, path: String, maxVertices: Int = 10000): Unit = {
    import spark.implicits._
    val pairs = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].collect()
    val n = if (pairs.isEmpty) 0 else pairs.flatMap(p => Seq(p._1, p._2)).max.toInt
    require(n <= maxVertices, s"dense matrix output capped at $maxVertices vertices, got $n")
    val m = Array.fill(n, n)(0)
    pairs.foreach { case (s, d) => m(s.toInt - 1)(d.toInt - 1) = 1 }
    val text = (Seq(n.toString) ++ m.map(_.mkString(" "))).mkString("\n") + "\n"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }
}
