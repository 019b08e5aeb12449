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
/** Process-wide NAME → (path, stats_col) registry for commit-log tables
  * and index roots (r14 verdict #5: every TVF took a raw filesystem path
  * string, so SQL users juggled `/tmp/...` literals and typos failed at
  * analysis with path errors). `log_register('sales', '/data/sales',
  * 'order_id')` once, then every log/index TVF accepts the NAME in place
  * of the (path, stats_col) pair — `log_table('sales')`,
  * `ann_topk('vectors', ...)`. Names are simple identifiers (no '/'), so
  * the two calling forms never collide; an unregistered name fails at
  * analysis with the registered-name list, not a filesystem error.
  *
  * Scope: in-memory, session-process-wide — the `spark.catalog` shape
  * without persistence (a durable catalog is a metastore's job; this is
  * the usability layer over it).
  */
object TableRegistry {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String, Seq[String])]()

  /** A registrable/resolvable NAME (vs a raw path): simple identifier,
    * never containing '/'. */
  def isName(s: String): Boolean = s.matches("[A-Za-z_][A-Za-z0-9_.]*")

  // ----- durability (r15 verdict Next #2) ---------------------------------
  //
  // The in-memory map alone meant `log_register` bindings vanished with
  // the session — the q51 usability win did not survive a restart. The
  // fix is the repo's own medicine: when `graft.catalog.root` is
  // configured, every registration ALSO commits to a commit-log table of
  // bindings at `<root>/_catalog` (atomic, versioned, multi-writer-safe —
  // the same primitive every data table uses), and session init
  // ([[graft.GraftSession.create]]) loads the committed bindings back
  // into memory. Unconfigured sessions keep today's memory-only behavior
  // (a scratch session should not need a catalog directory).

  private val CatalogRootConf = "graft.catalog.root"

  private def catalogRoot(spark: SparkSession): Option[String] =
    spark.conf.getOption(CatalogRootConf).filter(_.nonEmpty)

  private def catalogTable(spark: SparkSession, root: String) =
    new graft.operators.CommitTable(spark, s"$root/_catalog", "key")

  /** Commits one binding to the configured catalog table (upsert by
    * name — re-registering a name replaces its binding, exactly like the
    * memory map). `key` is the name's 60-bit hash: the table's stats
    * column, so a huge catalog's point lookups could file-prune. */
  private def persist(spark: SparkSession, root: String, name: String,
                      path: String, statsCol: String, extra: Seq[String]): Unit = {
    import spark.implicits._
    val row = Seq((graft.functions.Hashing.hash60(name), name, path, statsCol,
      extra.mkString(","))).toDF("key", "name", "path", "stats_col", "extra")
    val t = catalogTable(spark, root)
    if (t.latestVersion().isEmpty) t.overwrite(row.coalesce(1))
    else t.merge(row.coalesce(1), Seq("name"))
  }

  /** Loads every committed binding from the configured catalog root into
    * the in-memory map (what [[graft.GraftSession.create]] runs at init,
    * and what makes a FRESH session resolve names registered by an
    * earlier one). Returns the number of bindings loaded; 0 when no root
    * is configured or nothing was ever registered. Memory entries of the
    * same name are overwritten — the committed catalog is the durable
    * truth. */
  def loadPersisted(spark: SparkSession): Int = catalogRoot(spark) match {
    case None => 0
    case Some(root) =>
      val logDir = new org.apache.hadoop.fs.Path(s"$root/_catalog/_log")
      val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(logDir)) 0
      else {
        val rows = catalogTable(spark, root).read()
          .select("name", "path", "stats_col", "extra").collect()
        rows.foreach { r =>
          val extra = Option(r.getString(3)).filter(_.nonEmpty)
            .map(_.split(",").toSeq).getOrElse(Nil)
          entries.put(r.getString(0), (r.getString(1), r.getString(2), extra))
        }
        rows.length
      }
  }

  /** Test/gate hook: drops the in-memory map (simulating a fresh
    * process) WITHOUT touching any committed catalog. */
  def clearMemory(): Unit = entries.clear()

  def register(name: String, path: String, statsCol: String,
               extraStatsCols: Seq[String] = Nil): Unit = {
    require(isName(name),
      s"table name must be a simple identifier (got '$name'); paths need no registration")
    entries.put(name, (path, statsCol, extraStatsCols))
    // durable half: committed through the engine's own storage layer
    // when a catalog root is configured (no-op otherwise)
    SparkSession.getActiveSession.foreach { spark =>
      catalogRoot(spark).foreach(root =>
        persist(spark, root, name, path, statsCol, extraStatsCols))
    }
    ()
  }

  def resolve(name: String): (String, String) = {
    val (p, c, _) = resolveFull(name); (p, c)
  }

  /** Removes a binding — the catalog-lifecycle complement of [[register]]
    * (r16 verdict Next #7: a renamed or retired table otherwise leaves a
    * dangling name forever). Drops the in-memory entry AND, when a
    * catalog root is configured, commits the removal to the persisted
    * catalog (a key-delete MERGE — one more catalog commit, so the
    * removal survives restarts exactly like the registration did). The
    * name is immediately re-registrable, to the same or a new root.
    * Returns whether the name was bound in this session's memory. */
  def unregister(name: String): Boolean = {
    require(isName(name), s"table name must be a simple identifier (got '$name')")
    val had = entries.remove(name) != null
    SparkSession.getActiveSession.foreach { spark =>
      catalogRoot(spark).foreach { root =>
        val t = catalogTable(spark, root)
        // removal is only meaningful against an EXISTING committed
        // catalog; an unpersisted session has nothing durable to drop
        if (t.latestVersion().isDefined) {
          import spark.implicits._
          val row = Seq((graft.functions.Hashing.hash60(name), name, "", "", "", true))
            .toDF("key", "name", "path", "stats_col", "extra", "__del")
          t.merge(row.coalesce(1), Seq("name"), deleteCol = Some("__del"))
        }
      }
    }
    had
  }

  /** Every registration, sorted by name — the SHOW TABLES listing
    * ([[LogTvfs.tables]]). */
  def listAll: Seq[(String, String, String, Seq[String])] = {
    import scala.jdk.CollectionConverters._
    entries.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue._1, e.getValue._2, e.getValue._3))
      .sortBy(_._1)
  }

  /** The full binding incl. declared extra stats columns — what by-name
    * DML needs so its commits keep recording multi-column stats. */
  def resolveFull(name: String): (String, String, Seq[String]) = {
    val e = entries.get(name)
    if (e == null) {
      val known = {
        import scala.jdk.CollectionConverters._
        entries.keySet().asScala.toSeq.sorted
      }
      throw new IllegalArgumentException(
        s"unknown registered table '$name' — known names: " +
          (if (known.isEmpty) "(none registered; call log_register(name, path, stats_col))"
          else known.mkString(", ")) +
          "; a slash-free first argument is always resolved as a NAME — " +
          "for a relative filesystem path, write it with a '/' (e.g. './" + name + "')")
    }
    e
  }
}

object LogTvfs {

  private def arg(args: Seq[Expression], i: Int, fn: String): Any = {
    require(i < args.length, s"$fn: missing argument ${i + 1}")
    val e = args(i)
    require(e.foldable, s"$fn: argument ${i + 1} must be a literal")
    e.eval()
  }

  /** Resolves a TVF's leading table reference: either a registered NAME
    * (one argument) or the raw `(path, stats_col)` pair (two arguments).
    * Returns the table and the number of leading arguments consumed, so
    * each TVF validates its remaining arity against both forms. */
  private def tableRef(args: Seq[Expression], fn: String): (CommitTable, Int) = {
    val first = stringArg(args, 0, fn)
    if (TableRegistry.isName(first)) {
      // the full binding, so by-name DML keeps recording the registered
      // extra-column stats in its rewrite commits
      val (p, c, xs) = TableRegistry.resolveFull(first)
      (new CommitTable(SparkSession.active, p, c, extraStatsCols = xs), 1)
    } else
      (new CommitTable(SparkSession.active, first, stringArg(args, 1, fn)), 2)
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

  /** `log_table(path, stats_col)` / `log_table(name)` → the head
    * version's content. */
  def read(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_table")
    require(args.length == used,
      "log_table takes (path, stats_col) or a registered (name)")
    t.read().queryExecution.analyzed
  }

  /** `log_register(name, path, stats_col[, extra_cols_csv])` — binds a
    * NAME every log/index TVF then accepts in place of the raw (path,
    * stats_col) pair ([[TableRegistry]]). The optional 4th argument
    * declares extra stats columns (CSV), so by-name DML keeps recording
    * multi-column stats and [[rangeOn]] can cut on them. Returns the
    * binding as a 1-row frame. */
  def register(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 || args.length == 4,
      "log_register(name, path, stats_col[, extra_cols_csv]) takes 3-4 arguments")
    val spark = SparkSession.active
    val name = stringArg(args, 0, "log_register")
    val path = stringArg(args, 1, "log_register")
    val statsCol = stringArg(args, 2, "log_register")
    val extra =
      if (args.length < 4) Nil
      else stringArg(args, 3, "log_register").split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
    TableRegistry.register(name, path, statsCol, extra)
    import spark.implicits._
    Seq((name, path, statsCol, extra.mkString(",")))
      .toDF("name", "path", "stats_col", "extra_stats_cols")
      .queryExecution.analyzed
  }

  /** `log_table_at(path, stats_col, version)` / `log_table_at(name,
    * version)` → `VERSION AS OF`. */
  def asOf(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_table_at")
    require(args.length == used + 1,
      "log_table_at takes (path, stats_col | name) + (version)")
    t.asOf(longArg(args, used, "log_table_at")).queryExecution.analyzed
  }

  /** `log_table_range(path, stats_col, lo, hi)` / `log_table_range(name,
    * lo, hi)` → the head's rows with `stats_col` in `[lo, hi]`,
    * file-pruned from the log's per-file stats before planning (only
    * intersecting files reach the reader). */
  def range(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_table_range")
    require(args.length == used + 2,
      "log_table_range takes (path, stats_col | name) + (lo, hi)")
    t.prunedRead(longArg(args, used, "log_table_range"),
        longArg(args, used + 1, "log_table_range"))
      .queryExecution.analyzed
  }

  /** `log_table_range_on(path, stats_col | name, col, lo, hi)` — the
    * multi-column pruning surface ([[CommitTable.prunedReadOn]]): rows
    * with `col` in `[lo, hi]`, file-cut from the log's committed
    * extra-column stats (files with no recorded stats for `col` always
    * survive; the residual predicate filters their rows). `col` may also
    * be the primary stats column, which delegates to the range read. */
  def rangeOn(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_table_range_on")
    require(args.length == used + 3,
      "log_table_range_on takes (path, stats_col | name) + (col, lo, hi)")
    t.prunedReadOn(stringArg(args, used, "log_table_range_on"),
        longArg(args, used + 1, "log_table_range_on"),
        longArg(args, used + 2, "log_table_range_on"))
      .queryExecution.analyzed
  }

  /** `log_changes(path, stats_col | name, from_v, to_v)` — the CDF
    * surface (Delta's `table_changes()`): multiset row-level
    * insert/delete changes between two committed versions
    * ([[CommitTable.changesBetween]]), resolved through the log (incl.
    * across delta-entry/checkpoint boundaries). */
  def changes(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_changes")
    require(args.length == used + 2,
      "log_changes takes (path, stats_col | name) + (from_v, to_v)")
    t.changesBetween(longArg(args, used, "log_changes"),
        longArg(args, used + 1, "log_changes"))
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
    val (t, used) = tableRef(args, "log_delete")
    require(args.length == used + 2,
      "log_delete takes (path, stats_col | name) + (lo, hi)")
    t.deleteRange(longArg(args, used, "log_delete"), longArg(args, used + 1, "log_delete"))
    t.read().queryExecution.analyzed
  }

  /** `log_history(path, stats_col)` — DESCRIBE HISTORY for commit-log
    * tables: one row per committed version `(version, ts, op, n_files,
    * n_rows)`, read distributed off the log files themselves (log-sized).
    * Without it a SQL-only user can read AT a version (`log_table_at`)
    * but cannot DISCOVER which versions exist or what committed them. */
  def history(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_history")
    require(args.length == used,
      "log_history takes (path, stats_col) or a registered (name)")
    t.history().queryExecution.analyzed
  }

  /** `log_update(path, stats_col, lo, hi, set_col, set_expr)` —
    * file-granular `UPDATE SET set_col = set_expr WHERE stats_col BETWEEN
    * lo AND hi` ([[CommitTable.updateRange]]: non-intersecting files carry
    * by reference, NULL-key rows rewrite unchanged, the expression casts
    * back to the column's committed type), committed at analysis; returns
    * the post-update head content. Completes the SQL DML triad with
    * [[mergeFrom]] and [[delete]]. */
  def update(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_update")
    require(args.length == used + 4,
      "log_update takes (path, stats_col | name) + (lo, hi, set_col, set_expr)")
    t.updateRange(longArg(args, used, "log_update"), longArg(args, used + 1, "log_update"),
      stringArg(args, used + 2, "log_update"), stringArg(args, used + 3, "log_update"))
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
    val (t, used) = tableRef(args, "log_optimize")
    require(args.length == used + 2,
      "log_optimize takes (path, stats_col | name) + (cluster_col, target_files)")
    t.compactClustered(stringArg(args, used, "log_optimize"),
      longArg(args, used + 1, "log_optimize").toInt)
    t.read().queryExecution.analyzed
  }

  /** `log_optimize_zorder(path, stats_col | name, x_col, y_col)` — the
    * Delta `OPTIMIZE … ZORDER BY (x, y)` statement
    * ([[CommitTable.optimizeZorder]]): one layout-only commit rewriting
    * the head Morton-interleaved and range-clustered on the Z value, so
    * per-file stats windows are narrow on BOTH dimensions and range
    * reads on EITHER column file-cut (single-column clustering keeps one
    * dimension scattered across every file — the reason lakehouses ship
    * ZORDER at all). Content byte-identical, old versions readable;
    * returns the re-clustered head. */
  def optimizeZorder(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_optimize_zorder")
    require(args.length == used + 2,
      "log_optimize_zorder takes (path, stats_col | name) + (x_col, y_col)")
    t.optimizeZorder(stringArg(args, used, "log_optimize_zorder"),
      stringArg(args, used + 1, "log_optimize_zorder"))
    t.read().queryExecution.analyzed
  }

  /** `log_table_at_ts(path, stats_col | name, ts_millis)` — timestamp
    * time travel ([[CommitTable.asOfTimestamp]], Delta's `TIMESTAMP AS
    * OF`): resolves the last version committed at or before the
    * timestamp (header timestamps are monotone by the publish-time
    * adjustment) and returns that snapshot's scan. */
  def asOfTs(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_table_at_ts")
    require(args.length == used + 1,
      "log_table_at_ts takes (path, stats_col | name) + (ts_millis)")
    t.asOfTimestamp(longArg(args, used, "log_table_at_ts")).queryExecution.analyzed
  }

  /** `log_restore(path, stats_col | name, version)` — RESTORE TABLE …
    * VERSION AS OF as a statement ([[CommitTable.restore]]): commits a
    * new head whose file list IS the target version's (re-publish, no
    * data rewrite — the restored-to files are re-referenced and vacuum
    * protects them); returns the restored head. */
  def restore(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_restore")
    require(args.length == used + 1,
      "log_restore takes (path, stats_col | name) + (version)")
    t.restore(longArg(args, used, "log_restore"))
    t.read().queryExecution.analyzed
  }

  /** `log_optimize_size(path, stats_col | name, cluster_col,
    * target_bytes)` — [[CommitTable.compactClusteredToSize]] as a
    * statement: bin-pack the head toward files of about `target_bytes`
    * (the Delta/Iceberg ~1 GB knob — the file-count form stays as
    * `log_optimize` for index-shaped tables that pin their layout). */
  def optimizeSize(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_optimize_size")
    require(args.length == used + 2,
      "log_optimize_size takes (path, stats_col | name) + (cluster_col, target_bytes)")
    t.compactClusteredToSize(stringArg(args, used, "log_optimize_size"),
      longArg(args, used + 1, "log_optimize_size"))
    t.read().queryExecution.analyzed
  }

  /** `log_optimize_small(path, stats_col | name, cluster_col,
    * target_bytes)` — INCREMENTAL OPTIMIZE ([[CommitTable.compactSmall]],
    * the real Delta/Iceberg semantics: at-size files are never
    * rewritten): bin-packs only the sub-threshold files into
    * ~`target_bytes` range-clustered ones, carrying large files
    * untouched — O(small-file bytes), never O(table). Returns the
    * post-compaction head content. */
  def optimizeSmall(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_optimize_small")
    require(args.length == used + 2,
      "log_optimize_small takes (path, stats_col | name) + (cluster_col, target_bytes)")
    t.compactSmall(stringArg(args, used, "log_optimize_small"),
      longArg(args, used + 1, "log_optimize_small"))
    t.read().queryExecution.analyzed
  }

  /** `log_maintain(path, stats_col | name, cluster_col, target_bytes)`
    * — the one-call maintenance policy ([[CommitTable.maintain]]): the
    * health instruments decide which targeted ops the head needs
    * (purge of delete-dense files, bin-pack of accreted small files)
    * and only those run; a healthy head commits nothing. Returns the
    * post-maintenance head content. */
  def maintain(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_maintain")
    require(args.length == used + 2,
      "log_maintain takes (path, stats_col | name) + (cluster_col, target_bytes)")
    t.maintain(stringArg(args, used, "log_maintain"),
      longArg(args, used + 1, "log_maintain"))
    t.read().queryExecution.analyzed
  }

  /** `log_delete_dv(path, stats_col | name, lo, hi)` — DELETE as a
    * DELETION-VECTOR commit ([[CommitTable.deleteRangeDV]]): O(deleted)
    * sidecar bytes, zero data-file rewrites; reads anti-join the vector
    * until an OPTIMIZE statement materializes it. The SQL half of f27:
    * without it, the cheap delete is Scala-only while `log_delete` pays
    * the CoW rewrite. Returns the post-delete head content. */
  def deleteDv(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_delete_dv")
    require(args.length == used + 2,
      "log_delete_dv takes (path, stats_col | name) + (lo, hi)")
    t.deleteRangeDV(longArg(args, used, "log_delete_dv"),
      longArg(args, used + 1, "log_delete_dv"))
    t.read().queryExecution.analyzed
  }

  /** `log_delete_where_dv(path, stats_col | name, predicate_sql)` — the
    * arbitrary-predicate DELETE as a deletion-vector commit
    * ([[CommitTable.deleteWhereDV]]): one scan finds matching positions
    * (any-predicate deletes cannot stats-prune — the same scan Delta
    * pays), the commit is O(deleted) with zero rewrites. Returns the
    * post-delete head content. */
  def deleteWhereDv(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_delete_where_dv")
    require(args.length == used + 1,
      "log_delete_where_dv takes (path, stats_col | name) + (predicate_sql)")
    t.deleteWhereDV(stringArg(args, used, "log_delete_where_dv"))
    t.read().queryExecution.analyzed
  }

  /** `log_update_where_dv(path, stats_col | name, predicate_sql, set_col,
    * set_expr)` — the arbitrary-predicate UPDATE as a deletion-vector
    * commit ([[CommitTable.updateWhereDV]]): matched positions are
    * DV-marked and the transformed rows appended in ONE atomic commit —
    * O(changed rows) written, zero existing files rewritten (the modern
    * Delta UPDATE path; `log_update` stays as the file-granular CoW
    * form). Returns the post-update head content. */
  def updateWhereDv(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_update_where_dv")
    require(args.length >= used + 3 && (args.length - used - 1) % 2 == 0,
      "log_update_where_dv takes (path, stats_col | name) + (predicate_sql[, set_col, set_expr]...)")
    val pred = stringArg(args, used, "log_update_where_dv")
    val assigns = ((used + 1) until args.length by 2).map(i =>
      (stringArg(args, i, "log_update_where_dv"),
        stringArg(args, i + 1, "log_update_where_dv")))
    t.updateWhereDV(pred, assigns)
    t.read().queryExecution.analyzed
  }

  /** `log_purge_dv(path, stats_col | name, min_deleted_pct)` — Delta's
    * `REORG TABLE … APPLY (PURGE)` as a statement
    * ([[CommitTable.purgeDv]]): rewrites ONLY the files whose deleted-row
    * fraction is at least `min_deleted_pct` percent (0 = every file
    * carrying a live delete), carries clean files untouched, trims the
    * sidecar to the surviving entries — and clears the stamp entirely
    * when nothing survives. The targeted maintenance between leaving
    * vectors outstanding and a full `log_optimize` rewrite. Returns the
    * post-purge head content. */
  def purgeDv(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_purge_dv")
    require(args.length == used + 1,
      "log_purge_dv takes (path, stats_col | name) + (min_deleted_pct)")
    val pct = longArg(args, used, "log_purge_dv")
    require(pct >= 0L && pct <= 100L,
      s"log_purge_dv: min_deleted_pct must be in [0, 100], got $pct")
    t.purgeDv(pct / 100.0)
    t.read().queryExecution.analyzed
  }

  /** `log_merge_dv(path, stats_col | name, source_view, keys_csv)` —
    * MERGE INTO as a deletion-vector commit ([[CommitTable.mergeDV]]):
    * matched target rows are DV-marked and the change-set appended in
    * one atomic commit — O(|change-set|) written, zero files rewritten
    * (`log_merge` stays as the full-snapshot CoW form). Returns the
    * post-merge head content. */
  def mergeDvFrom(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val (t, used) = tableRef(args, "log_merge_dv")
    require(args.length == used + 2,
      "log_merge_dv takes (path, stats_col | name) + (source_view, keys_csv)")
    val source = spark.table(stringArg(args, used, "log_merge_dv"))
    val keys = stringArg(args, used + 1, "log_merge_dv")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, "log_merge_dv: keys_csv must name at least one key column")
    t.mergeDV(source, keys)
    t.read().queryExecution.analyzed
  }

  /** `log_unregister(name)` — removes a registered binding from the
    * session registry AND the persisted catalog when one is configured
    * ([[TableRegistry.unregister]]) — the DROP-binding statement that
    * completes the catalog lifecycle (the table's data and log are
    * untouched; only the NAME is unbound and immediately re-bindable).
    * Returns a 1-row frame `(name, removed)`. */
  def unregister(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1, "log_unregister takes (name)")
    val spark = SparkSession.active
    val name = stringArg(args, 0, "log_unregister")
    val removed = TableRegistry.unregister(name)
    import spark.implicits._
    Seq((name, removed)).toDF("name", "removed").queryExecution.analyzed
  }

  /** `log_rename_column(path, stats_col | name, old, new)` — ALTER TABLE
    * RENAME COLUMN as a metadata-only statement
    * ([[CommitTable.renameColumn]]): zero data rewritten, old versions
    * keep old names. Returns the renamed head content. */
  def renameColumn(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_rename_column")
    require(args.length == used + 2,
      "log_rename_column takes (path, stats_col | name) + (old, new)")
    t.renameColumn(stringArg(args, used, "log_rename_column"),
      stringArg(args, used + 1, "log_rename_column"))
    t.read().queryExecution.analyzed
  }

  /** `log_drop_column(path, stats_col | name, col)` — ALTER TABLE DROP
    * COLUMN as a metadata-only statement ([[CommitTable.dropColumn]]):
    * the physical slot retires; old versions keep reading it. Returns
    * the post-drop head content. */
  def dropColumn(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_drop_column")
    require(args.length == used + 1,
      "log_drop_column takes (path, stats_col | name) + (col)")
    t.dropColumn(stringArg(args, used, "log_drop_column"))
    t.read().queryExecution.analyzed
  }

  /** `log_set_invariants(path, stats_col | name, schema_ddl,
    * not_null_csv[, check_name, check_expr]...)` — the ALTER TABLE ADD
    * CONSTRAINT surface ([[CommitTable.setInvariants]]): declares
    * schema-on-write + NOT NULL + named CHECK rules every writer then
    * enforces; existing content is validated first (a violating
    * declaration fails the statement and commits nothing). Returns the
    * head content (unchanged — the declaration is metadata-only). */
  def setInvariantsTvf(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_set_invariants")
    require(args.length >= used + 2 && (args.length - used) % 2 == 0,
      "log_set_invariants takes (path, stats_col | name) + (schema_ddl, not_null_csv[, check_name, check_expr]...)")
    val ddl = stringArg(args, used, "log_set_invariants")
    val notNull = stringArg(args, used + 1, "log_set_invariants")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val checks = ((used + 2) until args.length by 2).map(i =>
      (stringArg(args, i, "log_set_invariants"),
        stringArg(args, i + 1, "log_set_invariants")))
    t.setInvariants(ddl, checks, notNull)
    t.read().queryExecution.analyzed
  }

  /** `log_detail(path, stats_col | name[, version])` — DESCRIBE DETAIL's
    * file surface ([[CommitTable.fileStats]]): one row per active file
    * `(path, lo, hi, n, xs)`, resolved from the log (zero data reads).
    * What a SQL user inspects before choosing an OPTIMIZE target. */
  def detail(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_detail")
    require(args.length == used || args.length == used + 1,
      "log_detail takes (path, stats_col | name) + optional (version)")
    val v = if (args.length == used + 1) Some(longArg(args, used, "log_detail")) else None
    t.fileStats(v).queryExecution.analyzed
  }

  /** `log_vacuum_retain(path, stats_col | name, horizon_ms)` — time-based
    * retention ([[CommitTable.vacuumRetain]], Delta's `VACUUM … RETAIN`):
    * reclaims directories referenced only by versions older than the
    * horizon; the head always survives. Returns the head. */
  def vacuumRetain(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_vacuum_retain")
    require(args.length == used + 1,
      "log_vacuum_retain takes (path, stats_col | name) + (horizon_ms)")
    t.vacuumRetain(longArg(args, used, "log_vacuum_retain"))
    t.read().queryExecution.analyzed
  }

  /** `log_tables()` — the SHOW TABLES statement over the session
    * registry: one row per [[TableRegistry.register]] binding
    * `(name, path, stats_col, extra_stats_cols)`. Registry-sized local
    * relation (never touches any table's data or log). */
  def tables(args: Seq[Expression]): LogicalPlan = {
    require(args.isEmpty, "log_tables takes no arguments")
    val spark = SparkSession.active
    import scala.jdk.CollectionConverters._
    val rows = TableRegistry.listAll.map { case (n, p, c, xs) =>
      org.apache.spark.sql.Row(n, p, c, xs.mkString(","))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("stats_col",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("extra_stats_cols",
        org.apache.spark.sql.types.StringType, nullable = false)))
    spark.createDataFrame(rows.asJava, schema).queryExecution.analyzed
  }

  /** `log_vacuum(path, stats_col, keep_last)` — the retention statement
    * ([[CommitTable.vacuum]]): physically reclaims data directories no
    * version in the kept tail references (head content untouched — this
    * trims TIME TRAVEL, not data), then returns the head. With
    * [[optimize]] it completes the SQL maintenance pair every lakehouse
    * ships (OPTIMIZE + VACUUM). */
  def vacuum(args: Seq[Expression]): LogicalPlan = {
    val (t, used) = tableRef(args, "log_vacuum")
    require(args.length == used + 1,
      "log_vacuum takes (path, stats_col | name) + (keep_last)")
    t.vacuum(keepLast = longArg(args, used, "log_vacuum").toInt)
    t.read().queryExecution.analyzed
  }

  /** `log_merge(path, stats_col, source_view, keys_csv)` — MERGE INTO the
    * commit-log table from a registered view/table (upsert by the
    * comma-separated key columns; [[CommitTable.merge]]'s optimistic
    * concurrency applies), committed at analysis; returns the post-merge
    * head content. */
  def mergeFrom(args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val (t, used) = tableRef(args, "log_merge")
    require(args.length == used + 2,
      "log_merge takes (path, stats_col | name) + (source_view, keys_csv)")
    val source = spark.table(stringArg(args, used, "log_merge"))
    val keys = stringArg(args, used + 1, "log_merge")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, "log_merge: keys_csv must name at least one key column")
    t.merge(source, keys)
    t.read().queryExecution.analyzed
  }
}
