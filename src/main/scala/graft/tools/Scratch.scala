package graft.tools

import graft._
import org.apache.spark.scheduler._
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
    val byStage = TrieMap.empty[String, (AtomicLong, AtomicLong)] // name -> (ms, count)
    val gcMs = new AtomicLong(0)
    val deserMs = new AtomicLong(0)
    val runMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val key = s.stageInfo.name.takeWhile(_ != '(').trim
        val slot = byStage.getOrElseUpdate(key, (new AtomicLong(0), new AtomicLong(0)))
        val dur = for {
          st <- s.stageInfo.submissionTime
          en <- s.stageInfo.completionTime
        } yield en - st
        slot._1.addAndGet(dur.getOrElse(0L)); slot._2.incrementAndGet()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (t.taskMetrics != null) {
        gcMs.addAndGet(t.taskMetrics.jvmGCTime)
        deserMs.addAndGet(t.taskMetrics.executorDeserializeTime)
        runMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    })
    // warm
    graft.graph.Analytics.greedyColoring(graft.graph.DerivedGraphs.small(spark, dir)).count()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    Thread.sleep(500)
    byStage.clear(); gcMs.set(0); deserMs.set(0); runMs.set(0)
    val t0 = System.nanoTime()
    graft.graph.Analytics.greedyColoring(graft.graph.DerivedGraphs.small(spark, dir)).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[scratch] g48 warm wall=$wall%.2fs gcMs=${gcMs.get} deserMs=${deserMs.get} runMs=${runMs.get}")
    byStage.toSeq.sortBy(-_._2._1.get).foreach { case (n, (ms, c)) =>
      println(f"[scratch] stage $n%-50s total=${ms.get / 1000.0}%.2fs n=${c.get}")
    }
    spark.stop()
  }
}
