package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hash helpers.
  *
  * All content hashes that feed an oracle-checked query are derived from MD5,
  * because MD5 is the one hash both Spark (`md5`) and DuckDB (`md5`) expose
  * with identical semantics — Spark's `hash`/`xxhash64` and DuckDB's `hash`
  * are different algorithms and would never cross-check. Everything here is
  * built from codegen'd built-ins (no UDFs), so it stays inside whole-stage
  * codegen.
  */
object Hashing {

  /** Deterministic 60-bit non-negative hash of a string column: the first 15
    * hex digits of md5, parsed base-16. 60 bits keeps every value strictly
    * inside a signed 64-bit Long in both engines (DuckDB mirror:
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL fragment computing [[hash60]] in DuckDB over expression `x`. */
  def hash60Sql(x: String): String = s"('0x' || substr(md5($x), 1, 15))::BIGINT"

  /** Driver-side twin of [[hash60]] (same md5-prefix formula, evaluated on
    * a plain String): lets the PLANNER know a term's hash before any job
    * runs — e.g. to file-prune a th-clustered postings table from the
    * commit log's per-file stats ([[graft.llm.Retrieval.bm25TopKIndexed]]).
    */
  def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Mersenne prime 2^31 - 1: modulus for MinHash's universal-hash family
    * `h(x) = (a*x + b) mod P`. With x reduced mod P first, `a*x` stays below
    * 2^62 — no Long overflow, in either engine.
    */
  val MinHashP: Long = 2147483647L

  /** Deterministic universal-hash parameters (a odd in [1, P), b in [0, P)).
    * Fixed seed: signatures are reproducible across sessions and rounds.
    */
  def minHashParams(numHashes: Int, seed: Long = 42L): IndexedSeq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    IndexedSeq.fill(numHashes)(
      (1L + 2L * rng.nextInt((MinHashP / 2).toInt - 1), rng.nextInt(MinHashP.toInt).toLong))
  }
}
