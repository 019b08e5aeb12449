package graft.tools

import graft._
import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap
import java.util.concurrent.atomic.AtomicLong

/** Throwaway measurement scratchpad for the optimization round (not driver
  * contract; edited per experiment, run via `runMain graft.tools.Scratch`).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(master = "local[32]", cores = "32")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val byStage = TrieMap.empty[String, (AtomicLong, AtomicLong, AtomicLong)] // name -> (ms, count, tasks)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val key = s.stageInfo.name.takeWhile(_ != '(').trim
        val slot = byStage.getOrElseUpdate(key, (new AtomicLong(0), new AtomicLong(0), new AtomicLong(0)))
        val dur = for {
          st <- s.stageInfo.submissionTime
          en <- s.stageInfo.completionTime
        } yield en - st
        slot._1.addAndGet(dur.getOrElse(0L)); slot._2.incrementAndGet()
        slot._3.addAndGet(s.stageInfo.numTasks)
      }
    })
    val emb = Tables.embeddings(spark, dir)
    def run(): Long = graft.llm.Similarity.cosineDupPairs(emb).count()
    run() // warm
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    Thread.sleep(300)
    byStage.clear()
    val t0 = System.nanoTime()
    val n = run()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"[scratch] d5 warm wall=$wall%.2fs rows=$n")
    byStage.toSeq.sortBy(-_._2._1.get).foreach { case (nm, (ms, c, tk)) =>
      println(f"[scratch] stage $nm%-55s total=${ms.get / 1000.0}%6.2fs stages=${c.get} tasks=${tk.get}")
    }
    spark.stop()
  }
}
