package graft

import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal

/** Benchmark harness (driver-run, per-round → BENCH_r{N}.json).
  *
  * Discipline (round-1 + round-3 verdict fixes):
  *  - warmup pass at sf0.001 first, so the first timed query no longer
  *    absorbs JVM/JIT/Spark-codegen/parquet cold start;
  *  - each query runs SPARK_GRAFT_REPS times (default 3 — round-4 verdict:
  *    min-of-2 let a loaded rep through as e4's phantom 3.5s) and reports
  *    the MINIMUM: on a shared host, min-of-N is the only statistic that
  *    converges to the query's true cost rather than the co-tenant's
  *    (BENCH_r03 recorded a phantom 2.7x "regression" from host contention);
  *  - the JSON carries /proc/loadavg (sampled before and after) plus the JVM
  *    max heap, AND a per-query "loadavg_q" map with the 1-minute loadavg
  *    sampled at the start of the rep whose time was reported — so any
  *    individual suspicious number is attributable to contention without
  *    re-running;
  *  - a query is failed (sentinel -1 timing, nonzero exit) only when EVERY
  *    rep fails; one good run is a valid measurement. Reps that fail while
  *    another succeeds are still visible: each prints to stderr and the
  *    total is recorded as "rep_failures" in the JSON — and
  *    SPARK_GRAFT_STRICT_REPS=1 escalates ANY rep failure to a nonzero
  *    exit, so an every-other-run breakage can be made fatal;
  *  - the result JSON is printed as the last stdout line AND written to
  *    bench_out.json so the driver can parse it out of sbt log noise;
  *  - deterministic query order (sorted by name).
  */
object Bench {

  /** 1-minute load average from /proc/loadavg; -1 if unreadable. */
  private def loadAvg1m(): Double =
    try Files.readString(Paths.get("/proc/loadavg")).split("\\s+")(0).toDouble
    catch { case NonFatal(_) => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val strictReps = sys.env.get("SPARK_GRAFT_STRICT_REPS").contains("1")
    val spark = GraftSession.create(master = s"local[$cpus]", cores = cpus)
    spark.sparkContext.setLogLevel("WARN")

    // dev-loop subset, Verify's SPARK_GRAFT_ONLY discipline (the driver
    // never sets it, so round benches always time the full map); unknown
    // names fail fast — a typo'd filter timing nothing would "pass"
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    only.foreach { sel =>
      val unknown = sel -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // warmup on the smallest SF: exercises every query's codepath (codegen,
    // parquet readers, GraphX) without contributing to timings
    val warmDir = {
      val w = Paths.get(sfDir).getParent
      val cand = if (w == null) sfDir else w.resolve("sf0.001").toString
      if (Files.isDirectory(Paths.get(cand))) cand else sfDir
    }
    // queries localCheckpoint intermediates; those blocks are pinned
    // (truncated lineage can't recompute), so free them between queries or
    // storage grows across the run and squeezes execution memory
    def dropCachedBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))

    // Min-of-N reps makes a FULL warmup redundant: reps 2..N of every
    // query are warm by construction, so the minimum never sees cold
    // codegen. What warmup still buys is shared-infrastructure JIT (the
    // codegen compiler, parquet readers, GraphX, StreamExecution) — one
    // representative query per name-prefix family plus a few infra-heavy
    // paths covers that at a fraction of the wall cost (the full 326-query
    // warmup was ~5 min of the driver's fixed bench budget, r14's rc=124).
    val warmNames = {
      val firstPerFamily = names.groupBy(_.takeWhile(!_.isDigit)).values.map(_.head)
      (firstPerFamily ++ Seq("st11_stream_smoke", "s25_graph_ann",
        "d19_dedup_index", "g1_bfs_levels", "p12_maxp_indexed").filter(names.contains))
        .toSeq.distinct.sorted
    }
    warmNames.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case NonFatal(e) => System.err.println(s"[bench/warmup] $name: ${e.getMessage}") }
      finally dropCachedBlocks()
    }

    val loadBefore = loadAvg1m()
    var failed = List.empty[String]
    var repFailures = 0
    val results = names.map { name =>
      // min over successful reps: co-tenant interference only ever ADDS
      // time, so the minimum is the least-contaminated estimate of the
      // plan's true cost; a query is failed only if EVERY rep failed (one
      // good run is a valid measurement regardless of transient errors)
      val times = (1 to reps).flatMap { _ =>
        val load = loadAvg1m()
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir).count()
          Some(((System.nanoTime() - t0) / 1e9, load))
        } catch {
          case NonFatal(e) =>
            System.err.println(s"[bench] $name FAILED: $e")
            repFailures += 1
            None
        } finally dropCachedBlocks()
      }
      if (times.isEmpty) { failed ::= name; name -> (-1.0, -1.0) }
      else name -> times.minBy(_._1)
    }
    val loadAfter = loadAvg1m()
    val maxHeapMb = Runtime.getRuntime.maxMemory / (1024 * 1024)
    val total = results.collect { case (_, (t, _)) if t >= 0 => t }.sum

    // Two renditions of the result:
    //  - bench_out.json gets everything (full-precision times, per-query
    //    loadavg) for offline analysis;
    //  - stdout gets a COMPACT single line. The driver keeps only the last
    //    ~2000 chars of stdout, and BENCH_r05 came back "parsed": null
    //    because the full-precision line plus the 66-entry loadavg_q map
    //    grew past that window and pushed `{"metric"` out of it. Millisecond
    //    precision is ample for the judge's per-query comparison; as the
    //    query set grows, degrade — diagnostics first, then decimals down
    //    to 1 (79 queries × ~24 chars already overflows at 2 decimals) —
    //    rather than ever printing an unparseable line.
    def num(t: Double, dec: Int): String = s"%.${dec}f".formatLocal(java.util.Locale.ROOT, t)
    def qs(dec: Int): String =
      results.map { case (k, (t, _)) => "\"" + k + "\":" + num(t, dec) }.mkString("{", ",", "}")
    val qLoads = results.map { case (k, (_, l)) => "\"" + k + "\":" + l }.mkString("{", ",", "}")
    def line(dec: Int, diagnostics: Boolean): String = {
      val diag =
        if (diagnostics)
          s""","reps":$reps,"rep_failures":$repFailures,""" +
            s""""loadavg_before":$loadBefore,"loadavg_after":$loadAfter,"max_heap_mb":$maxHeapMb"""
        else ""
      s"""{"metric":"total","value":${num(total, dec)},"unit":"sec","queries":${qs(dec)},""" +
        s""""sf":"$sfDir","failed":${failed.size}$diag}"""
    }
    val budget = 1900 // driver tail window is 2000 chars; leave slack for a trailing log line
    // once the query set outgrows even 1-decimal per-query times (~85
    // queries), degrade by OMITTING the sub-threshold tail instead of the
    // whole map: the slow queries are what the per-round comparison needs,
    // and the omission is explicit (count + omitted seconds — no silent
    // truncation). Failed queries (-1 sentinel) always stay in the map.
    def lineThresh(minSec: Double): String = {
      val (big, small) = results.partition { case (_, (t, _)) => t >= minSec || t < 0 }
      val qsB = big.map { case (k, (t, _)) => "\"" + k + "\":" + num(t, 1) }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${num(total, 2)},"unit":"sec","queries":$qsB,""" +
        s""""queries_omitted":${small.size},"omitted_total":${num(small.map(_._2._1).sum, 2)},""" +
        s""""sf":"$sfDir","failed":${failed.size}}"""
    }
    // last resort: headline metrics only — always a parseable line (the
    // full map is still in bench_out.json)
    val lineNoQueries: String =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","sf":"$sfDir",""" +
        s""""failed":${failed.size},"reps":$reps,"rep_failures":$repFailures}"""
    // r18 verdict Next #1: at 349 queries the 1.0s threshold still overflowed
    // the window (126 rows, ~3100 chars) and the ladder fell through to
    // totals-only, blinding the driver's per-query/scaling machinery for a
    // whole round. Higher rungs (2/3/5s) keep the slowest rows — the ones the
    // per-round comparison needs — always visible (46 rows ≈ 1245 chars at
    // 2.0s on the r18 map).
    val stdoutLine = (Seq(line(3, true), line(3, false), line(2, false), line(1, false)) ++
      Seq(0.1, 0.3, 1.0, 2.0, 3.0, 5.0).map(lineThresh) :+ lineNoQueries)
      .find(_.length <= budget).getOrElse(lineNoQueries)

    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${
        results.map { case (k, (t, _)) => "\"" + k + "\":" + t }.mkString("{", ",", "}")
      },"sf":"$sfDir","failed":${failed.size},"reps":$reps,"rep_failures":$repFailures,""" +
        s""""loadavg_before":$loadBefore,"loadavg_after":$loadAfter,""" +
        s""""loadavg_q":$qLoads,"max_heap_mb":$maxHeapMb}"""
    Files.writeString(Paths.get("bench_out.json"), fullJson + "\n")
    // stop Spark BEFORE the println: shutdown warnings land above the JSON
    // line instead of after it, keeping it inside the driver's tail window
    spark.stop()
    println(stdoutLine)
    if (failed.nonEmpty || (strictReps && repFailures > 0)) sys.exit(1)
  }
}
