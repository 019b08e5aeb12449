package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (see TESTDATA.md).
  *
  * Plain `spark.read.parquet` so Catalyst keeps full pushdown freedom:
  * column pruning and predicate pushdown reach the parquet scan of whatever
  * query is built on top. No caching here — callers decide (a 100 TB
  * lineitem does not fit in memory; hot small dims can be broadcast by AQE).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Re-spread an under-partitioned batch frame across the cluster before
    * CPU-heavy per-row work (tokenization, hashing, regex): a single-file /
    * single-row-group parquet scan arrives as ONE unsplittable partition,
    * which would serialize everything up to the first exchange on one core
    * (guide §2.5 input skew). CONDITIONAL, so it is scale-honest: on a real
    * multi-file corpus the scan is already wider than the cluster and this
    * is the identity — no corpus-wide round-robin shuffle is ever added at
    * 100 TB.
    *
    * The `.rdd` partition-count probe is free ONLY on shuffle-free plans:
    * under AQE a plan with an upstream exchange would MATERIALIZE its
    * intermediate stages at probe time and the work would be thrown away
    * (r18 advice). The probe is therefore gated on the optimized plan
    * being a pure scan pipeline (leaf/project/filter chain); anything
    * wider returns the frame untouched — such plans have already crossed
    * an exchange, so the single-partition input-skew problem this helper
    * exists for cannot occur.
    */
  def spread(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def scanOnly(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case u: UnaryNode if u.isInstanceOf[Project] || u.isInstanceOf[Filter] =>
        scanOnly(u.child)
      case _ => false
    }
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (!df.isStreaming && scanOnly(df.queryExecution.optimizedPlan) &&
      df.rdd.getNumPartitions < par) df.repartition(par)
    else df
  }

  def region(s: SparkSession, d: String)    = table(s, d, "region")
  def nation(s: SparkSession, d: String)    = table(s, d, "nation")
  def customer(s: SparkSession, d: String)  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = table(s, d, "supplier")
  def part(s: SparkSession, d: String)      = table(s, d, "part")
  def orders(s: SparkSession, d: String)    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = table(s, d, "lineitem")
  /** `events.ts` arrives in driver-generation-dependent parquet flavors —
    * INT64 TIMESTAMP(NANOS) (surfaced as LONG ns via the legacy conf, since
    * Spark 4 refuses nanos outright) or TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (surfaced as TIMESTAMP_NTZ). Normalize every
    * flavor to a proper microsecond TIMESTAMP column: under the session's
    * UTC zone the NTZ→TIMESTAMP cast reinterprets the naive wall-clock as a
    * UTC instant, which is exactly what DuckDB's `epoch_us` computes on the
    * same naive value — so oracle comparisons stay micros-exact either way.
    *
    * The nanos conf is declared in GraftSession.builder; the runtime set
    * here is a defensive idempotent fallback for driver-provided sessions.
    * Note it is session-global: after this call, other nanos-ts parquet
    * reads in the same session also surface LONG (no other such table
    * exists here).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→TIMESTAMP cast below reinterprets the naive wall-clock under
    // the SESSION zone; pin it to UTC here too (not only in GraftSession
    // .builder) so a driver-provided non-UTC session cannot shift ts
    s.conf.set("spark.sql.session.timeZone", "UTC")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // INT64 nanos read as LONG: floor(ns/1000), as epoch_us does
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case dt => throw new IllegalArgumentException(
        s"events.ts: unsupported parquet surface type $dt — expected LONG ns, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String) = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")
}
