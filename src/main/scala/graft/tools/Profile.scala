package graft.tools

import graft._
import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap
import java.util.concurrent.atomic.AtomicLong

/** Optimization-round profiler: `runMain graft.tools.Profile <q>[,<q>...]`.
  * For each declared query: warm it once, then time a second run and print
  * the per-stage wall/task breakdown (submission→completion, so scheduler
  * gaps show up as wall minus stage sum). Not driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <query>[,query...]")
    val names = args.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.create(master = "local[32]", cores = "32")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val byStage = TrieMap.empty[String, (AtomicLong, AtomicLong, AtomicLong, AtomicLong)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val key = s.stageInfo.name.takeWhile(_ != '(').trim
        val slot = byStage.getOrElseUpdate(key,
          (new AtomicLong(0), new AtomicLong(0), new AtomicLong(0), new AtomicLong(0)))
        val dur = for {
          st <- s.stageInfo.submissionTime
          en <- s.stageInfo.completionTime
        } yield en - st
        slot._1.addAndGet(dur.getOrElse(0L)); slot._2.incrementAndGet()
        slot._3.addAndGet(s.stageInfo.numTasks)
        slot._4.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      }
    })
    names.foreach { name =>
      def run(): Long = {
        val df = SparkEntry.queries(name)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        0L
      }
      spark.sparkContext.setJobDescription(s"profile:$name:warm")
      run()
      // drain late listener events deterministically before clearing, so
      // warm-run stages are never attributed to the timed run (r18 advice)
      org.apache.spark.graftbridge.ListenerBridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
      byStage.clear()
      spark.sparkContext.setJobDescription(s"profile:$name")
      val t0 = System.nanoTime()
      run()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
      val stageSum = byStage.values.map(_._1.get).sum / 1000.0
      println(f"[profile] ===== $name wall=$wall%.2fs stageSum=$stageSum%.2fs gap=${wall - stageSum}%.2fs")
      byStage.toSeq.sortBy(-_._2._1.get).take(12).foreach { case (nm, (ms, c, tk, rt)) =>
        println(f"[profile]   ${ms.get / 1000.0}%6.2fs stages=${c.get}%-3d tasks=${tk.get}%-5d taskTime=${rt.get / 1000.0}%7.2fs  $nm")
      }
    }
    spark.stop()
  }
}
