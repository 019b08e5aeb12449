package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation — Deequ-style constraint reports computed
  * distributed, the admission gate a 100 TB ingest runs BEFORE data joins
  * a training corpus or a serving table. The reference trusts its inputs
  * blindly (the matrix parse at `secondaryServer.c:210-228` has no
  * validation at all — a malformed file is undefined behavior); an engine
  * feeding million-dollar training runs cannot.
  *
  * Report shape: `(check, n_violations, pass)` — one row per declared
  * rule, so the report is tiny regardless of input size and a pipeline
  * gates on `max(n_violations) == 0`.
  *
  * Scale shape, by rule class:
  *  - ROW rules (null/domain/format): ALL rules evaluate in ONE scan —
  *    each is a conditional-sum aggregate, fused map-side; adding a rule
  *    adds a counter, not a pass. The per-rule rows come from an explode
  *    of the single aggregated row (driver-sized), not from re-scanning.
  *  - `unique`: one hash aggregation on the key (count>1 groups), the
  *    same shuffle an enforcement dedup would pay anyway.
  *  - `refIntegrity`: a left-anti probe of child keys against the parent;
  *    at 100 TB the parent key set is dim-sized → broadcast anti join.
  */
object Validation {

  /** A named row-level predicate; `holds` must be true for a valid row. */
  final case class RowRule(name: String, holds: Column)

  /** All row rules in one pass: violations = rows where the predicate is
    * false OR null (a rule that cannot evaluate is a violation, so NULLs
    * in domain checks are caught and `notNull` needs no special casing).
    */
  def rowChecks(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "rowChecks needs at least one rule")
    val counters = rules.map(r =>
      sum(when(coalesce(r.holds, lit(false)), 0L).otherwise(1L)).as(r.name))
    val wide = df.agg(counters.head, counters.tail: _*)
    val pairs = rules.map(r => struct(lit(r.name).as("check"), col(r.name).as("n_violations")))
    wide.select(explode(array(pairs: _*)).as("kv"))
      .select(col("kv.check"), col("kv.n_violations"))
  }

  /** Key-uniqueness rule: violations = rows beyond the first per key. */
  def unique(df: DataFrame, keyCols: Seq[String], name: String): DataFrame = {
    require(keyCols.nonEmpty, "unique needs at least one key column")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_violations"))
      .select(lit(name).as("check"), col("n_violations"))
  }

  /** Referential-integrity rule: violations = child rows whose key has no
    * match in the parent (orphans). NULL child keys never match, hence
    * count as orphans — pair with a notNull row rule to tell them apart.
    */
  def refIntegrity(child: DataFrame, childKey: String,
                   parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.select(col(childKey))
      .join(broadcast(parent.select(col(parentKey)).distinct()),
        col(childKey) === col(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check"), col("n_violations"))

  /** Union per-rule results into the final deterministic report. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks.reduce(_ union _)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("check")
  }
}
