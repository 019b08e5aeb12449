package graft.streaming

import graft.TempDirs
import org.apache.spark.sql.DataFrame

/** Replay a bounded batch table through a REAL streaming execution.
  *
  * The st-family gate rows run the unified-model batch path (same logical
  * plan, batch physical execution); the streaming halves are
  * MemoryStream-asserted in `StreamingSpec`. What neither binds to the gate
  * is an actual `StreamExecution` — micro-batch planning, state-store
  * commits, watermark advancement — which is exactly the machinery a
  * production deployment runs. This helper closes that gap for BOUNDED
  * inputs: export the batch rows to parquet, re-read them with the file
  * streaming source (one file per micro-batch, so cross-batch state is
  * genuinely exercised), run the user's transform under the streaming
  * engine into a memory sink, and hand the sink's contents back as a
  * DataFrame for the oracle compare.
  *
  * The memory sink is deliberate harness plumbing, not the production
  * path: gate results are driver-small by contract (the same contract
  * every gate row's final collect relies on). A production run swaps it
  * for `format("parquet")` + checkpoint — the transform, source, and
  * state machinery are identical.
  */
object BoundedReplay {

  /** The one-file-per-trigger contract is only as strong as the staged file
    * count: `repartition(n)` yields n output FILES only while every
    * partition is non-empty (Spark writes no file for an empty partition),
    * so a small input — or a future scale/config change — would silently
    * change the micro-batch count any oracle asserts on. Enforce it loudly
    * at stage time instead of letting the gate drift with input size.
    */
  private def assertStagedFiles(dir: java.nio.file.Path, expected: Int): Unit = {
    val staged = java.nio.file.Files.list(dir).toArray
      .map(p => p.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .count(n => n.startsWith("part-") && n.endsWith(".parquet"))
    require(staged == expected,
      s"bounded replay staged $staged parquet files at $dir but the " +
        s"one-file-per-trigger contract requires exactly $expected — " +
        "input too small for sourceFiles?")
  }

  private val stagedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  /** Stage `batch` as exactly `sourceFiles` parquet files, memoized per
    * process by the batch's CANONICALIZED plan (the IndexCache
    * determinism discipline applied to replay inputs): the same gate
    * query re-staging the same derivation every bench rep is a pure
    * write-side constant — the canonical plan pins the source paths and
    * every transform, so a hit IS the same input; a plan that
    * canonicalizes differently (other sf dir, other projection) simply
    * stages its own directory. Read-only after staging — every consumer
    * is a streaming SOURCE over it.
    *
    * Memoization is REFUSED when the plan's identity doesn't pin the
    * data: a `LocalRelation` (driver-literal rows — its toString shows
    * attributes, never data, so two different row sets print alike) or a
    * truncated tree render (`maxToStringFields` elides attribute lists)
    * stages a fresh directory every call — correctness over the cache.
    * The full schema JSON rides the key too, closing projection variants
    * a truncation could alias. */
  private def stageMemoized(batch: DataFrame, name: String,
                            sourceFiles: Int): java.nio.file.Path = {
    def stage(dir: java.nio.file.Path): java.nio.file.Path = {
      batch.repartition(sourceFiles).write.mode("overwrite").parquet(dir.toString)
      assertStagedFiles(dir, sourceFiles)
      dir
    }
    val plan = batch.queryExecution.analyzed.canonicalized
    val canonical = plan.toString
    val planPinsData = !plan.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]) &&
      !canonical.contains("more fields")
    val h = java.util.UUID.nameUUIDFromBytes(
      (canonical + "|" + batch.schema.json + "|" + sourceFiles)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)
    def freshDir(tag: String) = TempDirs.deleteOnExit(java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-replay-$name-$tag-${ProcessHandle.current().pid()}"))
    if (!planPinsData)
      stage(freshDir(java.util.UUID.randomUUID().toString.take(8)))
    else
      stagedDirs.computeIfAbsent(s"$name|$sourceFiles|$h", _ => stage(freshDir(h)))
  }

  /** Run `transform(stream)` over `batch` replayed as a file-source stream;
    * returns the memory sink's contents. `sourceFiles` controls how many
    * micro-batches the replay takes (one file per trigger).
    */
  def runFileStream(batch: DataFrame, name: String,
                    transform: DataFrame => DataFrame,
                    outputMode: String = "append",
                    sourceFiles: Int = 4): DataFrame = {
    val spark = batch.sparkSession
    val dir = stageMemoized(batch, name, sourceFiles)
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = transform(src).writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Replay `batch` as a file-source stream into a `foreachBatch` sink:
    * `apply` runs once per REAL micro-batch (streaming engine, state-store
    * commits, sequential batch ids) — the shape of every "stream into a
    * table format" deployment. One source file per trigger, so `apply`
    * executes exactly `sourceFiles` times over a non-empty input.
    */
  def runForeachBatch(batch: DataFrame, name: String,
                      apply: DataFrame => Unit,
                      sourceFiles: Int = 4): Unit = {
    val spark = batch.sparkSession
    val dir = stageMemoized(batch, name, sourceFiles)
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = src.writeStream
      .foreachBatch { (b: DataFrame, _: Long) => apply(b) }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** [[runForeachBatch]] with the engine's micro-batch id handed to
    * `apply` — what an exactly-once sink keys its transaction marker on
    * (batch ids are monotonic per query and STABLE across retries, which
    * is the whole point). */
  def runForeachBatchIds(batch: DataFrame, name: String,
                         apply: (DataFrame, Long) => Unit,
                         sourceFiles: Int = 4): Unit = {
    val spark = batch.sparkSession
    val dir = stageMemoized(batch, name, sourceFiles)
    val src = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = src.writeStream
      .foreachBatch { (b: DataFrame, id: Long) => apply(b, id) }
      .start()
    try q.processAllAvailable() finally q.stop()
  }
}
