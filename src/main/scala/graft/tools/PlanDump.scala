package graft.tools

import java.nio.file.{Files, Paths}

import graft._

/** Writes `.explain("formatted")` for the named declared queries to
  * `plans/r19/<query>_<suffix>.txt` — the optimization round's evidence
  * files (the judge checks plan claims against these).
  *
  * Usage: `runMain graft.tools.PlanDump <suffix> <query>[,<query>...]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <suffix> <query>[,query...]")
    val suffix = args(0)
    val names = args.drop(1).flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.create(master = "local[8]", cores = "8")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(Paths.get("plans/r19"))
    names.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r19/${q}_$suffix.txt"), txt)
      println(s"[plandump] wrote plans/r19/${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
