package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV/JSON(JSONL) ingest + export surface (SURVEY §2.3 row 1). Parquet is
  * the engine's native store (GraphCatalog/Tables); these formats are the
  * interchange edge every real pipeline needs.
  *
  * Always schema-first: `inferSchema` scans the data twice and guesses —
  * both disqualifying at 100 TB — so readers here take an explicit
  * `StructType` and fail fast on malformed rows (FAILFAST) rather than
  * silently nulling them (Spark's default PERMISSIVE mode), unless the
  * caller opts into permissive with a corrupt-record column.
  */
object TableFormats {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "FAILFAST")
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Permissive variant keeping malformed rows inspectable instead of
    * failing the job — the triage mode for dirty corpora.
    */
  def readJsonlPermissive(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** Columnar ORC sink — the interchange format for Hive/Trino-adjacent
    * stacks. Spark's native `orc` datasource: vectorized reads, predicate
    * pushdown and column pruning all work exactly as for parquet, so an
    * ORC-resident table costs no plan quality (f4 gates the round-trip).
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** ORC source. Schema comes from the ORC footer (self-describing, like
    * parquet) — no inference scan, so schema-first discipline holds.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Edge-list CSV → `(src LONG, dst LONG)`: the interchange form of the
    * reference's graph ingest (its dense matrix format stays in
    * MatrixFormat; real edge dumps ship as CSV).
    */
  def readEdgeCsv(spark: SparkSession, path: String, header: Boolean = true): DataFrame =
    readCsv(spark, path,
      StructType.fromDDL("src LONG, dst LONG"), header = header)
      .filter(col("src").isNotNull && col("dst").isNotNull)
}
