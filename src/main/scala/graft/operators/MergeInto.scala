package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO (SCD-1 upsert) as a relational operator.
  *
  * The reference has no mutation surface beyond whole-graph overwrite
  * (`primaryServer.c:40-63` rewrites the entire file per op-1/op-2 request);
  * a usable engine needs row-level upsert semantics: given a `target` table
  * and a `source` change-set keyed the same way,
  *
  *   - MATCHED rows take the source's values (update — source wins even when
  *     a source data column is NULL, per ANSI MERGE `UPDATE SET *`),
  *   - MATCHED rows whose source delete flag is true are dropped (delete),
  *   - NOT MATCHED source rows are appended (insert) — unless their delete
  *     flag is true, in which case the row is a no-op (deleting an absent
  *     key deletes nothing, the same outcome ANSI MERGE reaches by having
  *     no WHEN NOT MATCHED THEN DELETE clause),
  *   - NOT MATCHED BY SOURCE target rows pass through unchanged.
  *
  * Spark-first shape: ONE full-outer shuffle join on the merge keys — no
  * driver loop, no per-row lookups. At 100 TB this is the copy-on-write
  * merge every table format (Delta/Iceberg/Hudi) bottoms out in: the
  * change-set is typically ≪ the target, so AQE broadcasts the source side
  * and the target is never shuffled at all; with both sides bucketed on the
  * key ([[Partitioning.writeBucketed]]) the join is exchange-free. Combine
  * with partition pruning (only rewrite partitions the source touches) to
  * keep the rewrite proportional to the change-set, not the table.
  *
  * Contract: `source` is key-unique (a change-set, not a log — compact a log
  * first with e.g. last-write-wins over [[org.apache.spark.sql.expressions.Window]]);
  * merge keys are non-null on both sides.
  */
object MergeInto {

  /** Merge `source` into `target` on `keys`. Both frames must carry the same
    * columns; `deleteCol`, when given, names a BOOLEAN column on `source`
    * only (never emitted in the result).
    */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String],
            deleteCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    val dataCols = target.columns.filterNot(keys.contains)
    val expectedSrc = (target.columns ++ deleteCol).sorted
    require(source.columns.sorted.sameElements(expectedSrc),
      s"source columns ${source.columns.sorted.mkString(",")} must be target's " +
        s"plus the delete flag: ${expectedSrc.mkString(",")}")

    val t = target.as("t")
    val s = source.as("s")
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    // keys are non-null by contract, so "the source side matched/exists"
    // is exactly "its key columns are non-null on this joined row"
    val hasSrc = keys.map(k => col(s"s.$k").isNotNull).reduce(_ && _)
    val keep = deleteCol
      .map(d => !(hasSrc && coalesce(col(s"s.$d"), lit(false))))
      .getOrElse(lit(true))
    t.join(s, cond, "full_outer")
      .filter(keep)
      .select(
        keys.map(k => coalesce(col(s"s.$k"), col(s"t.$k")).as(k)) ++
          dataCols.map(c => when(hasSrc, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)): _*)
  }
}
