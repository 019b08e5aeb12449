package graft.tools

import graft.{GraftSession, SparkEntry}

/** Plan/timing inspector (dev tool, not driver contract): runs named
  * SparkEntry queries against an sf dir, printing wall time and, with
  * `-explain`, the formatted physical plan — the `.explain` audit loop the
  * scale rubric asks for.
  *
  * Usage: `runMain graft.tools.Profile <sfDir> [-explain] [name...]`
  * (no names = all queries).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("-explain")
    val names = args.drop(1).filterNot(_ == "-explain") match {
      case Array() => SparkEntry.queries.keys.toSeq.sorted
      case xs => xs.toSeq
    }
    val spark = GraftSession.create(master = "local[8]", cores = "8")
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (explain) {
        println(s"==== $name ====")
        df.explain("formatted")
      }
      val n = df.count()
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
