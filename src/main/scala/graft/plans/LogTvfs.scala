package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.CommitTable

/** SQL table-valued-function surface for the COMMIT-LOG storage layer —
  * the [[GraphTvfs]] move applied to tables: without these, every
  * commit-log table (and every persisted index built on them) is
  * Scala-API-only, while Delta/Iceberg users expect `VERSION AS OF` to be
  * one SQL clause away. Registered through the same
  * `SparkSessionExtensions.injectTableFunction` hook:
  *
  * {{{
  *   SELECT * FROM log_table('<table path>', '<stats col>')
  *   SELECT * FROM log_table_at('<table path>', '<stats col>', 3)
  *   SELECT * FROM log_table_range('<table path>', '<stats col>', 10, 99)
  * }}}
  *
  * The returned plan is the committed parquet scan's plan, so outer
  * filters/projections push into it and compose with Catalyst normally
  * (`log_table_range` additionally file-prunes FROM THE LOG's per-file
  * stats before the scan is even planned). Arguments must be literals —
  * the log resolution happens at analysis, like the graph TVFs.
  */
object LogTvfs {

  private def arg(args: Seq[Expression], i: Int, fn: String): Any = {
    require(i < args.length, s"$fn: missing argument ${i + 1}")
    val e = args(i)
    require(e.foldable, s"$fn: argument ${i + 1} must be a literal")
    e.eval()
  }

  private def stringArg(args: Seq[Expression], i: Int, fn: String): String =
    arg(args, i, fn) match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string, got $other")
    }

  private def longArg(args: Seq[Expression], i: Int, fn: String): Long =
    arg(args, i, fn) match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer, got $other")
    }

  /** `log_table(path, stats_col)` → the head version's content. */
  def read(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2, "log_table(path, stats_col) takes 2 arguments")
    new CommitTable(SparkSession.active, stringArg(args, 0, "log_table"),
        stringArg(args, 1, "log_table"))
      .read().queryExecution.analyzed
  }

  /** `log_table_at(path, stats_col, version)` → `VERSION AS OF`. */
  def asOf(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3, "log_table_at(path, stats_col, version) takes 3 arguments")
    new CommitTable(SparkSession.active, stringArg(args, 0, "log_table_at"),
        stringArg(args, 1, "log_table_at"))
      .asOf(longArg(args, 2, "log_table_at")).queryExecution.analyzed
  }

  /** `log_table_range(path, stats_col, lo, hi)` → the head's rows with
    * `stats_col` in `[lo, hi]`, file-pruned from the log's per-file stats
    * before planning (only intersecting files reach the reader). */
  def range(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4, "log_table_range(path, stats_col, lo, hi) takes 4 arguments")
    new CommitTable(SparkSession.active, stringArg(args, 0, "log_table_range"),
        stringArg(args, 1, "log_table_range"))
      .prunedRead(longArg(args, 2, "log_table_range"), longArg(args, 3, "log_table_range"))
      .queryExecution.analyzed
  }

  // ----- SQL WRITE statements (round-12 Next #7) -------------------------
  //
  // MERGE/DELETE existed as Scala operators while a SQL-only user could
  // only READ commit-log tables (q42). These TVFs bridge the write surface
  // under the same analysis-time-execution contract the graph TVFs
  // document: the commit happens when the statement is ANALYZED (i.e. at
  // `spark.sql(...)`), and the returned relation is the resulting head —
  // so `SELECT ... FROM log_delete(...)` both performs the delete and
  // reads back the table it produced. Statements are idempotent where the
  // underlying operator is (a no-op delete commits nothing); re-running a
  // merge re-commits the same content as a new version, exactly like
  // re-running the Scala call.

  /** `log_delete(path, stats_col, lo, hi)` — file-granular
    * `DELETE WHERE stats_col BETWEEN lo AND hi` ([[CommitTable.deleteRange]]:
    * non-intersecting files carry by reference, NULL-key rows survive),
    * committed at analysis; returns the post-delete head content. */
  def delete(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4, "log_delete(path, stats_col, lo, hi) takes 4 arguments")
    val t = new CommitTable(SparkSession.active, stringArg(args, 0, "log_delete"),
      stringArg(args, 1, "log_delete"))
    t.deleteRange(longArg(args, 2, "log_delete"), longArg(args, 3, "log_delete"))
    t.read().queryExecution.analyzed
  }

  /** `log_history(path, stats_col)` — DESCRIBE HISTORY for commit-log
    * tables: one row per committed version `(version, ts, op, n_files,
    * n_rows)`, read distributed off the log files themselves (log-sized).
    * Without it a SQL-only user can read AT a version (`log_table_at`)
    * but cannot DISCOVER which versions exist or what committed them. */
  def history(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2, "log_history(path, stats_col) takes 2 arguments")
    new CommitTable(SparkSession.active, stringArg(args, 0, "log_history"),
        stringArg(args, 1, "log_history"))
      .history().queryExecution.analyzed
  }

  /** `log_update(path, stats_col, lo, hi, set_col, set_expr)` —
    * file-granular `UPDATE SET set_col = set_expr WHERE stats_col BETWEEN
    * lo AND hi` ([[CommitTable.updateRange]]: non-intersecting files carry
    * by reference, NULL-key rows rewrite unchanged, the expression casts
    * back to the column's committed type), committed at analysis; returns
    * the post-update head content. Completes the SQL DML triad with
    * [[mergeFrom]] and [[delete]]. */
  def update(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 6,
      "log_update(path, stats_col, lo, hi, set_col, set_expr) takes 6 arguments")
    val t = new CommitTable(SparkSession.active, stringArg(args, 0, "log_update"),
      stringArg(args, 1, "log_update"))
    t.updateRange(longArg(args, 2, "log_update"), longArg(args, 3, "log_update"),
      stringArg(args, 4, "log_update"), stringArg(args, 5, "log_update"))
    t.read().queryExecution.analyzed
  }

  /** `log_optimize(path, stats_col, cluster_col, target_files)` — the
    * OPTIMIZE maintenance statement ([[CommitTable.compactClustered]]):
    * folds small files into `target_files` RANGE-clustered ones so the
    * log's per-file stats keep pruning, content byte-identical, old
    * versions readable; committed at analysis, returns the compacted head.
    * The statement a SQL-only user runs after streamed appends accrete
    * per-batch files (the st22 loop). */
  def optimize(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4,
      "log_optimize(path, stats_col, cluster_col, target_files) takes 4 arguments")
    val t = new CommitTable(SparkSession.active, stringArg(args, 0, "log_optimize"),
      stringArg(args, 1, "log_optimize"))
    t.compactClustered(stringArg(args, 2, "log_optimize"),
      longArg(args, 3, "log_optimize").toInt)
    t.read().queryExecution.analyzed
  }

  /** `log_vacuum(path, stats_col, keep_last)` — the retention statement
    * ([[CommitTable.vacuum]]): physically reclaims data directories no
    * version in the kept tail references (head content untouched — this
    * trims TIME TRAVEL, not data), then returns the head. With
    * [[optimize]] it completes the SQL maintenance pair every lakehouse
    * ships (OPTIMIZE + VACUUM). */
  def vacuum(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3, "log_vacuum(path, stats_col, keep_last) takes 3 arguments")
    val t = new CommitTable(SparkSession.active, stringArg(args, 0, "log_vacuum"),
      stringArg(args, 1, "log_vacuum"))
    t.vacuum(keepLast = longArg(args, 2, "log_vacuum").toInt)
    t.read().queryExecution.analyzed
  }

  /** `log_merge(path, stats_col, source_view, keys_csv)` — MERGE INTO the
    * commit-log table from a registered view/table (upsert by the
    * comma-separated key columns; [[CommitTable.merge]]'s optimistic
    * concurrency applies), committed at analysis; returns the post-merge
    * head content. */
  def mergeFrom(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4, "log_merge(path, stats_col, source_view, keys_csv) takes 4 arguments")
    val spark = SparkSession.active
    val t = new CommitTable(spark, stringArg(args, 0, "log_merge"),
      stringArg(args, 1, "log_merge"))
    val source = spark.table(stringArg(args, 2, "log_merge"))
    val keys = stringArg(args, 3, "log_merge").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, "log_merge: keys_csv must name at least one key column")
    t.merge(source, keys)
    t.read().queryExecution.analyzed
  }
}
