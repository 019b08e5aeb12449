package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB design point: bucketed
  * co-located joins (kill the shuffle entirely for repeated joins on the
  * same key) and key salting (spread a pathologically hot key across
  * reducers when AQE's skew splitting isn't available — e.g. aggregations,
  * or pre-AQE engines).
  *
  * At scale the cheapest shuffle is the one that never happens: a fact
  * table bucketed by its join key is shuffled once at write time and then
  * every subsequent join/aggregation on that key is exchange-free.
  */
object Partitioning {

  /** Write `df` as a bucketed+sorted managed table. Joins between two
    * tables bucketed on the same key with the same bucket count plan
    * without any Exchange (asserted in PartitioningSpec).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Write `df` as range-partitioned parquet, sorted within each file by
    * `sortCol`: file N holds a contiguous, disjoint slice of the key space
    * (asserted structurally in PartitioningSpec). Pay ONE sampling-based
    * range exchange at write time; afterwards every range/point filter on
    * `sortCol` skips whole files and row groups via parquet min/max stats,
    * and ordered consumers (merge joins, time-range scans) read
    * already-sorted runs. This is the "sort your fact table by its hottest
    * filter column" layout rule at 100 TB — `repartitionByRange` samples
    * boundaries, so skewed keys still split evenly across files.
    */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String,
                       numFiles: Int = 32): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Hive-style partitioned layout: one directory per distinct value of
    * `partCol` (`path/partCol=v/...`). Queries filtering on the partition
    * column never OPEN the other directories — partition pruning happens at
    * planning time from the directory listing, before any file IO, which at
    * 100 TB is the difference between listing a year and scanning a decade.
    * The partition column must be low-cardinality (days/regions/years, not
    * keys): each value is a directory and a write-side shuffle target.
    * Pruning is asserted structurally in PartitioningSpec; `f5` gates the
    * round-trip semantics.
    */
  def writeHivePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.repartition(col(partCol)) // one shuffle -> one file per partition dir
      .write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)

  /** SQL expression interleaving the low `bits` bits of two non-negative
    * integer expressions into a Morton (Z-order) code — pure `>> & <<`
    * arithmetic on disjoint bit positions, valid verbatim in both Spark SQL
    * and DuckDB (which is how the f8 gate oracle-checks it).
    */
  def zorderExpr(xCol: String, yCol: String, bits: Int = 10): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map(b =>
      s"((($xCol >> $b) & 1) << ${2 * b}) + ((($yCol >> $b) & 1) << ${2 * b + 1})")
      .mkString(" + ")
  }

  /** Z-order (Morton) clustered layout over TWO filter dimensions — the
    * multi-column generalization of [[writeRangeSorted]]: a linear sort
    * gives perfect file-level min/max skipping on ONE column and none on
    * the second; the Z-curve interleaves both keys' bits so every file
    * covers a small RECTANGLE of the (x, y) key space and range filters on
    * EITHER dimension (or both) skip files via parquet min/max stats. The
    * layout rule behind Delta/Iceberg `ZORDER BY` clustering, here as a
    * plain write-path operator: one sampling range exchange on the code,
    * nothing driver-sized. Bounding-box tightness is asserted structurally
    * in PartitioningSpec; `f8` gates the code arithmetic cross-engine.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    bits: Int = 10, numFiles: Int = 32): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn("__z", expr(zorderExpr(xCol, yCol, bits)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Salted equi-join for skewed keys: the big side gets a deterministic
    * salt in [0, salts) derived from its full row, the small side is
    * replicated `salts` times, and the join key becomes (key, salt) — a hot
    * key now lands on `salts` reducers instead of one. Result is identical
    * to `big.join(small, key)`; cost is `salts`× replication of the small
    * side, so size it to the skew, not the cluster.
    */
  /** Write `df` range-sorted on `statsCol` PLUS an external min/max stats
    * manifest — the table-format file-skipping pattern (Iceberg/Delta data
    * skipping) as a plain operator pair with [[readManifestPruned]]. f3's
    * layout already gives parquet FOOTER min/max; the manifest moves the
    * stats OUT of the data files, so planning a selective read lists one
    * tiny manifest instead of opening N footers — at 100 TB (millions of
    * files) footer-probing is itself a job, and this is why every table
    * format keeps stats in metadata. Manifest rows: `(file, lo, hi, n)`.
    */
  def writeWithManifest(df: DataFrame, path: String, statsCol: String,
                        numFiles: Int = 32): Unit = {
    writeRangeSorted(df, path, statsCol, numFiles)
    val spark = df.sparkSession
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(statsCol).as("lo"), max(statsCol).as("hi"), count(lit(1)).as("n"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path + "_manifest")
  }

  /** Range read through the manifest: only files whose [lo, hi] intersects
    * `[lo, hi]` are handed to the reader (the rest are never LISTED as
    * inputs, let alone opened); the residual predicate still applies
    * because boundary files straddle the cut. Returns the filtered rows;
    * the pruned file count is observable via `.inputFiles` (spec-asserted).
    */
  def readManifestPruned(spark: SparkSession, path: String, statsCol: String,
                         lo: Long, hi: Long): DataFrame = {
    val files = spark.read.parquet(path + "_manifest")
      .filter(col("hi") >= lo && col("lo") <= hi)
      .select("file").collect().map(_.getString(0)) // manifest-sized: one row per FILE
    if (files.isEmpty)
      spark.read.parquet(path).filter(lit(false)) // schema-preserving empty
    else
      spark.read.parquet(files.toIndexedSeq: _*)
        .filter(col(statsCol) >= lo && col(statsCol) <= hi)
  }

  /** Small-file compaction: rewrite a directory of many small parquet
    * files into `targetFiles` row-balanced ones — the maintenance operator
    * every long-lived table needs (streaming sinks, per-micro-batch and
    * per-partition writers all accrete kilobyte files; at 100 TB the
    * resulting millions of files make LISTING the table a job of its own,
    * and every scan pays a task per file). Content is preserved exactly;
    * only the physical layout changes.
    *
    * `repartition(n)` (round-robin) rather than coalesce: coalesce glues
    * ADJACENT input files, so one oversized input file stays oversized and
    * skew survives; the round-robin exchange rebalances rows evenly, which
    * is the point of compacting. The write lands in a fresh directory —
    * swap-on-success (rename/pointer flip) beats in-place overwrite, which
    * has a window where the table is half-deleted.
    *
    * Gate (`f11`) checks content equality through the rewrite; the
    * file-count and row-balance claims are asserted in PartitioningSpec.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFiles: Int = 4): DataFrame = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    require(outPath != inPath, "compact writes a fresh directory — in-place overwrite would race the read")
    spark.read.parquet(inPath)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    spark.read.parquet(outPath)
  }

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol = pmod(hash(struct(big.columns.map(col): _*)), lit(salts))
    val saltedBig = big.withColumn("__salt", saltCol)
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
