package graft.tools

import graft._
import graft.llm.KnnGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway measurement scratchpad for the optimization round (not driver
  * contract; edited per experiment, run via `runMain graft.tools.Scratch`).
  *
  * Current experiment: phase attribution inside st24_stream_graph_idx —
  * which part of the streamed graph-index maintenance owns the wall time.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(master = "local[32]", cores = "32")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val s = spark
    def phase[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-36s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
    IndexCache.template(s"knng|$dir|ge100")(
      KnnGraph.buildKnnGraphIndex(Tables.embeddings(s, dir)
        .filter(col("vec_id") >= 100), _))
    for (rep <- 1 to 2) {
      println(s"[scratch] ---- rep $rep (st24 shape)")
      val root = TempDirs.deleteOnExit(java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"),
        s"graft-scr24-${ProcessHandle.current().pid()}"))
      TempDirs.deleteRecursively(root)
      java.nio.file.Files.createDirectories(root)
      val tp = root.resolve("emb").toString
      val t = new graft.operators.CommitTable(s, tp, "vec_id")
      phase("emb overwrite v0")(t.overwrite(emb.filter(col("vec_id") >= 100)))
      phase("emb append v1")(t.append(emb.filter(col("vec_id") >= 50 && col("vec_id") < 100)))
      phase("emb append v2")(t.append(emb.filter(col("vec_id") < 50)))
      val idx = phase("privateCopy")(
        IndexCache.privateCopy(s"knng|$dir|ge100", "scr24idx")(p =>
          KnnGraph.buildKnnGraphIndex(emb.filter(col("vec_id") >= 100), p)))
      phase("stream 2 appends")(
        graft.streaming.CommitLogStream.followChanges(s, t, tp, (v, cdf) => {
          val batch = cdf.filter(col("change_type") === "insert").drop("change_type")
          phase(s"  append batch v$v")(KnnGraph.appendKnnGraphIndex(batch, idx))
        }, startingVersion = 1L))
      phase("compactClustered")(
        new graft.operators.CommitTable(s, s"$idx/graph", "src")
          .compactClustered("src", targetFiles = 4))
      phase("search + collect")(KnnGraph.knnGraphSearch(s, idx).collect())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
