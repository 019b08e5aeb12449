package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — change-data-capture between two versions of a keyed
  * table: per key, classify `insert` (new only), `delete` (old only),
  * `update` (both, any data column differing), `unchanged`.
  *
  * The reference's only notion of change is whole-graph blind overwrite
  * (`primaryServer.c:40-63`); a usable engine needs to answer "what changed
  * between yesterday's snapshot and today's" — the primitive behind
  * incremental downstream refresh, audit trails, and CDC feeds out of
  * snapshot-only sources. Complements [[MergeInto]]: merge APPLIES a
  * change-set, diff RECOVERS one.
  *
  * Spark-first shape: ONE full-outer shuffle join on the key — the same
  * scale story as MergeInto (both sides shuffle once on the key; with both
  * snapshots bucketed on it the join is exchange-free, and at 100 TB
  * that's the difference between a diff and a re-shuffle of two table
  * scans). Data columns compare null-safely (`<=>`), so NULL → value and
  * value → NULL are updates, NULL → NULL is unchanged.
  *
  * Contract: both frames carry identical columns; `keys` non-null and
  * unique per side (it's a snapshot, not a log).
  */
object SnapshotDiff {

  /** Diff `newDf` against `oldDf` on `keys`: returns the key columns plus
    * `change ∈ {insert, delete, update, unchanged}`, one row per key seen
    * on either side.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshot schemas differ: ${oldDf.columns.sorted.mkString(",")} vs " +
        newDf.columns.sorted.mkString(","))
    val dataCols = oldDf.columns.filterNot(keys.contains)
    val o = oldDf.as("o")
    val n = newDf.as("n")
    val cond = keys.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val inOld = keys.map(k => col(s"o.$k").isNotNull).reduce(_ && _)
    val inNew = keys.map(k => col(s"n.$k").isNotNull).reduce(_ && _)
    val same = dataCols.map(c => col(s"o.$c") <=> col(s"n.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, cond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) :+
          when(!inOld, lit("insert"))
            .when(!inNew, lit("delete"))
            .when(same, lit("unchanged"))
            .otherwise(lit("update")).as("change"): _*)
  }

  /** The APPLYABLE half of CDC: the minimal change-set that, merged into
    * the old snapshot ([[MergeInto.merge]] / [[MergeInto.mergeCow]] with
    * `deleteCol = Some("is_delete")`), reproduces the new snapshot
    * exactly. Inserts and updates carry the NEW data values
    * (`is_delete = false`), deletes carry the old values with
    * `is_delete = true`, unchanged keys are omitted — so downstream work
    * (and a partition-pruned merge's rewrite) is proportional to what
    * actually changed. Same single full-outer join as [[diff]].
    */
  def changeSet(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "changeSet needs at least one key column")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshot schemas differ: ${oldDf.columns.sorted.mkString(",")} vs " +
        newDf.columns.sorted.mkString(","))
    val dataCols = oldDf.columns.filterNot(keys.contains)
    val o = oldDf.as("o")
    val n = newDf.as("n")
    val cond = keys.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val inOld = keys.map(k => col(s"o.$k").isNotNull).reduce(_ && _)
    val inNew = keys.map(k => col(s"n.$k").isNotNull).reduce(_ && _)
    val same = dataCols.map(c => col(s"o.$c") <=> col(s"n.$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, cond, "full_outer")
      .filter(!(inOld && inNew && same)) // drop unchanged
      .select(
        keys.map(k => coalesce(col(s"n.$k"), col(s"o.$k")).as(k)) ++
          dataCols.map(c => when(inNew, col(s"n.$c")).otherwise(col(s"o.$c")).as(c)) :+
          (!inNew).as("is_delete"): _*)
  }

  /** Point-in-time (time-travel) read over a versioned history table: each
    * key's LATEST row with `versionCol ≤ v` — the AS OF read every
    * SCD-2 / table-format history supports. Aggregate-based (`max_by` of
    * the data struct by version — one hash shuffle with map-side partials,
    * no per-key window sort), so a hot key's versions reduce map-side.
    * Contract: `versionCol` is unique per key (ties would make `max_by`
    * arbitrary); keys absent at version `v` (first version > v) have no
    * row, matching "did not exist yet".
    */
  def asOfVersion(history: DataFrame, keys: Seq[String], versionCol: String,
                  v: Long): DataFrame = {
    require(keys.nonEmpty, "asOfVersion needs at least one key column")
    require(history.columns.contains(versionCol), s"$versionCol not in history")
    val dataCols = history.columns.filterNot(c => keys.contains(c) || c == versionCol)
    history.filter(col(versionCol) <= v)
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct(dataCols.map(col): _*), col(versionCol)).as("__r"),
        max(col(versionCol)).as(versionCol))
      .select(keys.map(col) ++
        dataCols.map(c => col(s"__r.$c").as(c)) :+ col(versionCol): _*)
  }
}
