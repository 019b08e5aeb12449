package graft.operators

import org.apache.spark.sql.SparkSession

/** ATOMIC MULTI-TABLE index versions — the catalog-commit shape (an
  * Iceberg/Delta catalog pins a set of table snapshots; a multi-table
  * index needs the same): a persisted index is several commit-log tables
  * (vectors/graph/entries, centroids/lists, postings/stats), and its
  * build/append paths commit them one table at a time — so a reader
  * racing an append could resolve vectors at the new head but the graph
  * at the old one. The manifest closes that gap without distributed
  * locks: each index version is ONE commit on `indexRoot/manifest` whose
  * rows pin every member table's version, written AFTER the member
  * commits land. Readers that resolve through the manifest (the
  * `*SearchAt` paths) see a consistent snapshot by construction — the
  * member commits are immutable, so pinning versions IS isolation — and
  * get index-level time travel for free (`asOf` on the manifest replays
  * yesterday's whole index, not one table of it).
  *
  * Scale shape: a manifest commit is a member-count-sized row set — free
  * at any corpus size. Failure mode is benign and documented: a crash
  * between member commits and the manifest commit leaves the new member
  * versions unreferenced by any index version (invisible to manifest
  * readers), exactly an Iceberg orphaned snapshot.
  */
object IndexManifest {

  private def table(spark: SparkSession, indexRoot: String) =
    new CommitTable(spark, s"$indexRoot/manifest", "v")

  /** Pin the CURRENT head of each member table as one new index version.
    * Returns the index version (the manifest's own commit version). */
  def commit(spark: SparkSession, indexRoot: String, members: Seq[String]): Long = {
    require(members.nonEmpty, "IndexManifest.commit: need at least one member table")
    import spark.implicits._
    val rows = members.map { t =>
      (t, new CommitTable(spark, s"$indexRoot/$t", "v").latestVersion().getOrElse(
        throw new IllegalStateException(
          s"IndexManifest: member table $t has no commits at $indexRoot")))
    }
    table(spark, indexRoot).overwrite(rows.toDF("t", "v").coalesce(1))
  }

  /** The member-version map pinned by `indexVersion` (or the head when
    * None) — member-count-sized driver read. */
  def resolve(spark: SparkSession, indexRoot: String,
              indexVersion: Option[Long] = None): Map[String, Long] = {
    val t = table(spark, indexRoot)
    indexVersion.map(t.asOf).getOrElse(t.read())
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
  }

  /** Committed index versions, ascending. */
  def versions(spark: SparkSession, indexRoot: String): Seq[Long] =
    table(spark, indexRoot).versions()
}
