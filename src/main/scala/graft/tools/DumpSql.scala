package graft.tools

import graft.SparkEntry

/** Dev tool: print the generated DuckDB oracle SQL for the named queries
  * (all when no names given) so SQL mirrors can be iterated on directly in
  * DuckDB without a full Verify run.
  *
  * Usage: `runMain graft.tools.DumpSql [name...]`
  */
object DumpSql {
  def main(args: Array[String]): Unit = {
    val names = if (args.isEmpty) SparkEntry.oracleSql.keys.toSeq.sorted else args.toSeq
    names.foreach { n =>
      println(s"-- ==== $n ====")
      println(SparkEntry.oracleSql.getOrElse(n, s"(no oracle for $n)"))
      println(";")
    }
  }
}
