package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json + queries.json, for the driver's DuckDB compare.
  * Uses the same GraftSession factory as Bench so verified plans are the
  * benchmarked plans (AQE, session extensions, UTC, nanos-ts conf).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // f1/f2 exports (and the oracle SQL that reads them back) land in a
    // SIBLING of this run's outDir: run-private (not a shared /tmp path),
    // but NOT inside outDir itself — the driver treats every directory
    // under outDir as a query-result parquet, and round 5's in-outDir
    // exports came back as two phantom "not a parquet file" error rows.
    sys.props("graft.export.dir") = outDir.stripSuffix("/") + ".exports"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.create(master = s"local[$cpus]", cores = cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-loop subset (comma-separated query names); the driver never sets
    // this, so gate runs always cover the full map. Unknown names fail
    // FAST: a typo'd filter would otherwise select nothing (or a partial
    // set) and exit 0 — a vacuously-passing dev loop.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    var failed = List.empty[String]
    val selected = SparkEntry.queries.filter { case (k, _) => only.forall(_.contains(k)) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] $name FAILED: $e")
      } finally
        // free pinned localCheckpoint blocks between queries
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // static SQL plus the data-dependent oracles (DFS VALUES literals,
    // sf-tagged JSONL path) — computed against the same sfDir the queries
    // just ran on, so the driver's DuckDB compare sees a complete map
    val json = (SparkEntry.oracleSql ++ SparkEntry.dynamicOracleSql(spark, sfDir, only))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the full declared-query list, so the checker can flag queries that
    // threw (no output dir) instead of silently skipping them
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      selected.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[verify] ${failed.size} queries failed: ${failed.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
