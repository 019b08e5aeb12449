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

  def region(s: SparkSession, d: String)    = table(s, d, "region")
  def nation(s: SparkSession, d: String)    = table(s, d, "nation")
  def customer(s: SparkSession, d: String)  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = table(s, d, "supplier")
  def part(s: SparkSession, d: String)      = table(s, d, "part")
  def orders(s: SparkSession, d: String)    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = table(s, d, "lineitem")
  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 refuses
    * outright; read it as a long (legacy conf) and surface a proper
    * microsecond TIMESTAMP column — the same floor(ns/1000) DuckDB's
    * `epoch_us` applies, so oracle comparisons stay exact.
    *
    * The conf is declared in GraftSession.builder; the runtime set here is
    * a defensive idempotent fallback for driver-provided sessions. Note it
    * is session-global: after this call, other nanos-ts parquet reads in
    * the same session also surface LONG (no other such table exists here).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String) = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")
}
