package graft.tools

import graft._
import graft.llm.KnnGraph
import org.apache.spark.sql.functions._

/** Throwaway measurement scratchpad for the optimization round (not driver
  * contract; edited per experiment, run via `runMain graft.tools.Scratch`).
  *
  * Current experiment: phase attribution inside the graph-index lifecycle
  * rows (s40 / s26 / s28 / st24) — which stage of the lifecycle owns the
  * wall time at sf0.1.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(master = "local[32]", cores = "32")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def phase[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-36s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    val emb = Tables.embeddings(spark, dir)
    // warm the template once so the copy below is the only build cost
    IndexCache.template(s"knng|$dir|ge100")(
      KnnGraph.buildKnnGraphIndex(emb.filter(col("vec_id") >= 100), _))
    for (rep <- 1 to 2) {
      println(s"[scratch] ---- rep $rep (s40 shape)")
      val idx = phase("privateCopy")(
        IndexCache.privateCopy(s"knng|$dir|ge100", "scr40")(
          KnnGraph.buildKnnGraphIndex(emb.filter(col("vec_id") >= 100), _)))
      phase("snap fresh")(KnnGraph.knnGraphLinkStats(spark, idx).head())
      phase("append 100")(
        KnnGraph.appendKnnGraphIndex(emb.filter(col("vec_id") < 100), idx))
      val adj = phase("adj checkpoint")(
        new graft.operators.CommitTable(spark, s"$idx/graph", "src")
          .read().select("src", "dst").localCheckpoint(true))
      val v1 = phase("delete 1")(KnnGraph.deleteFromKnnGraphIndex(
        emb.filter(col("vec_id") >= 200 && col("vec_id") < 240).select("vec_id"), idx))
      val v2 = phase("delete 2")(KnnGraph.deleteFromKnnGraphIndex(
        emb.filter(col("vec_id") >= 240 && col("vec_id") < 280).select("vec_id"), idx))
      import spark.implicits._
      phase("fused 3-state stats")(
        KnnGraph.knnGraphLinkStatsStates(spark, idx, adj, Seq(
          Seq.empty[Long].toDF("vec_id"),
          graft.llm.Tombstones.readAt(spark, idx, "vec_id", v1),
          graft.llm.Tombstones.readAt(spark, idx, "vec_id", v2))))
      phase("consolidate")(KnnGraph.consolidateKnnGraphIndex(spark, idx))
      phase("snap healed")(KnnGraph.knnGraphLinkStats(spark, idx).head())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
