package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Settings chosen for the local[32] test harness but scale-safe: AQE on
  * (runtime re-plan, skew-join splitting, partition coalescing — the knobs a
  * 1000-executor cluster needs), shuffle partitions sized to cores locally
  * (on a real cluster this is overridden per deployment), UTC session time
  * so results hash-match the DuckDB oracle.
  */
object GraftSession {
  def builder(master: String = "local[*]", cores: String = "32"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = builder().getOrCreate()
}
