package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

/** SQL table-valued-function surface for the PERSISTED INDEX family — the
  * final piece of the SQL-only user story: [[LogTvfs]] made commit-log
  * tables readable and writable from SQL, but the vector / sparse indexes
  * built ON those tables ([[graft.llm.Similarity.buildIvfIndex]],
  * [[graft.llm.KnnGraph.buildKnnGraphIndex]],
  * [[graft.llm.Retrieval.buildBm25Index]]) were still Scala-API-only at
  * query time. These TVFs are the pgvector/Elasticsearch-shaped bridge:
  *
  * {{{
  *   SELECT * FROM ann_topk('<index root>', 20, 5, 4)        -- IVF probe
  *   SELECT * FROM graph_ann('<index root>', 20, 5, 8, 3)    -- routed walk
  *   SELECT * FROM bm25_topk('<index root>', 'terms,csv', 10) -- postings
  * }}}
  *
  * Contract is [[GraphTvfs]]' documented analysis-time execution: the
  * index probe (driver-bounded collects included — probed-cid set,
  * frontier ids, df map; each ≤ a query-size contract, never corpus-sized)
  * runs when the statement is analyzed, and the returned relation is the
  * probe's result plan — outer filters/projections compose over it
  * normally. Arguments must be literals. Each TVF returns EXACTLY its
  * Scala twin's frame (spec-asserted row-for-row), so the file-pruning IO
  * contracts ([[graft.operators.CommitTable.prunedReadIn]] — only probed
  * lists' / frontier vertices' files open) carry over unchanged.
  */
object IndexTvfs {

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

  private def intArg(args: Seq[Expression], i: Int, fn: String): Int =
    arg(args, i, fn) match {
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer, got $other")
    }

  /** The index-root argument: a raw path, or a NAME registered through
    * `log_register` ([[TableRegistry]]) — the same named-catalog surface
    * the log TVFs use, so SQL users never juggle `/tmp/...` literals. */
  private def rootArg(args: Seq[Expression], fn: String): String = {
    val first = stringArg(args, 0, fn)
    if (TableRegistry.isName(first)) TableRegistry.resolve(first)._1 else first
  }

  /** `ann_topk(index_root, num_queries, k, nprobe)` → the committed IVF
    * index's probe ([[graft.llm.Similarity.ivfTopKIndexed]]): top-k by
    * exact re-ranked cosine over the probed lists only. */
  def annTopK(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4, "ann_topk(index_root, num_queries, k, nprobe) takes 4 arguments")
    graft.llm.Similarity.ivfTopKIndexed(SparkSession.active,
        rootArg(args, "ann_topk"), intArg(args, 1, "ann_topk"),
        intArg(args, 2, "ann_topk"), intArg(args, 3, "ann_topk"))
      .queryExecution.analyzed
  }

  /** `ann_topk_filtered(index_root, num_queries, k, nprobe, predicate)` —
    * FILTERED vector search from pure SQL (s23's FAISS-IDSelector shape
    * was Scala-only): `predicate` is a SQL expression over the committed
    * list rows' columns (`vec_id`, `cid`) applied INSIDE the probed lists
    * BEFORE ranking, so k survives a selective filter where an outer
    * WHERE over `ann_topk(...)` would post-filter the already-cut top-k
    * and come up short. Queries are never filtered. */
  def annTopKFiltered(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5,
      "ann_topk_filtered(index_root, num_queries, k, nprobe, predicate) takes 5 arguments")
    val pred = org.apache.spark.sql.functions.expr(
      stringArg(args, 4, "ann_topk_filtered"))
    graft.llm.Similarity.ivfTopKIndexed(SparkSession.active,
        rootArg(args, "ann_topk_filtered"), intArg(args, 1, "ann_topk_filtered"),
        intArg(args, 2, "ann_topk_filtered"), intArg(args, 3, "ann_topk_filtered"),
        predicate = Some(pred))
      .queryExecution.analyzed
  }

  /** `graph_ann(index_root, num_queries, k, beam, hops)` → the committed
    * k-NN-graph index's routed walk ([[graft.llm.KnnGraph.knnGraphSearch]]). */
  def graphAnn(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5,
      "graph_ann(index_root, num_queries, k, beam, hops) takes 5 arguments")
    graft.llm.KnnGraph.knnGraphSearch(SparkSession.active,
        rootArg(args, "graph_ann"), intArg(args, 1, "graph_ann"),
        intArg(args, 2, "graph_ann"), intArg(args, 3, "graph_ann"),
        intArg(args, 4, "graph_ann"))
      .queryExecution.analyzed
  }

  /** `bm25_topk(index_root, terms_csv, k)` → the committed BM25 postings
    * index's scorer ([[graft.llm.Retrieval.bm25TopKIndexed]]) at the
    * default k1/b. */
  def bm25TopK(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3, "bm25_topk(index_root, terms_csv, k) takes 3 arguments")
    val terms = stringArg(args, 1, "bm25_topk").split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "bm25_topk: terms_csv must name at least one term")
    graft.llm.Retrieval.bm25TopKIndexed(SparkSession.active,
        rootArg(args, "bm25_topk"), terms, intArg(args, 2, "bm25_topk"))
      .queryExecution.analyzed
  }

  // ---- the VERSION AS OF variants: whole-index time travel from SQL
  // (the IndexManifest surface — each pins a consistent member-table set)

  /** `ann_topk_at(index_root, index_version, num_queries, k, nprobe)`. */
  def annTopKAt(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5,
      "ann_topk_at(index_root, index_version, num_queries, k, nprobe) takes 5 arguments")
    graft.llm.Similarity.ivfTopKIndexedAt(SparkSession.active,
        rootArg(args, "ann_topk_at"), intArg(args, 1, "ann_topk_at").toLong,
        intArg(args, 2, "ann_topk_at"), intArg(args, 3, "ann_topk_at"),
        intArg(args, 4, "ann_topk_at"))
      .queryExecution.analyzed
  }

  /** `graph_ann_at(index_root, index_version, num_queries, k, beam, hops)`. */
  def graphAnnAt(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 6,
      "graph_ann_at(index_root, index_version, num_queries, k, beam, hops) takes 6 arguments")
    graft.llm.KnnGraph.knnGraphSearchAt(SparkSession.active,
        rootArg(args, "graph_ann_at"), intArg(args, 1, "graph_ann_at").toLong,
        intArg(args, 2, "graph_ann_at"), intArg(args, 3, "graph_ann_at"),
        intArg(args, 4, "graph_ann_at"), intArg(args, 5, "graph_ann_at"))
      .queryExecution.analyzed
  }

  /** `bm25_topk_at(index_root, index_version, terms_csv, k)`. */
  def bm25TopKAt(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4,
      "bm25_topk_at(index_root, index_version, terms_csv, k) takes 4 arguments")
    val terms = stringArg(args, 2, "bm25_topk_at").split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "bm25_topk_at: terms_csv must name at least one term")
    graft.llm.Retrieval.bm25TopKIndexedAt(SparkSession.active,
        rootArg(args, "bm25_topk_at"), intArg(args, 1, "bm25_topk_at").toLong,
        terms, intArg(args, 3, "bm25_topk_at"))
      .queryExecution.analyzed
  }
}
