package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike

/** Structural plan-quality guards over the declared queries themselves —
  * the properties the 100 TB design leans on (filter pushdown, column
  * pruning, broadcast of dim sides) asserted on the REAL query plans, so a
  * refactor that silently loses one fails a test instead of a benchmark.
  * AQE is disabled per-assert (its query stages hide the static operators;
  * same pattern as SessionizationSpec).
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def staticPlan[T](df: => DataFrame)(f: org.apache.spark.sql.execution.SparkPlan => T): T = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f(df.queryExecution.executedPlan)
    finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("q6: filters reach the parquet scan; only needed columns are read") {
    staticPlan(SparkEntry.queries("q6_forecast_revenue")(spark, sf)) { plan =>
      val scans = plan.collectWithSubqueries { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, s"no parquet scan found:\n$plan")
      val li = scans.find(_.metadata("Location").contains("lineitem")).get
      // shipdate/discount/quantity predicates must be pushed
      assert(li.metadata("PushedFilters").contains("l_shipdate"),
        s"no pushed shipdate filter: ${li.metadata("PushedFilters")}")
      // q6 touches 4 columns; reading more means pruning broke
      assert(li.schema.fieldNames.toSet ===
        Set("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"),
        s"column pruning lost: ${li.schema.fieldNames.mkString(",")}")
    }
  }

  test("s19: the indexed BM25 scoring scans push per-term filters into log-pruned postings reads") {
    // build a small committed index, then audit the query's scans: each
    // term reads its own log-stats-pruned file list (r13 — the hash is
    // known on the driver) and its t = term predicate must still reach
    // the parquet reader (row-group pruning inside the surviving files)
    val root = java.nio.file.Files.createTempDirectory("graft-bm25audit").toString
    val s = spark
    import s.implicits._
    val docs = (1L to 30L).map(i => (i, s"alpha w${i % 7} beta w${i % 5}")).toDF("doc_id", "text")
    graft.llm.Retrieval.buildBm25Index(docs, root)
    staticPlan(graft.llm.Retrieval.bm25TopKIndexed(spark, root, Seq("alpha", "w3"), k = 5)) { plan =>
      val scans = plan.collectWithSubqueries { case sc: FileSourceScanExec => sc }
      val postings = scans.filter(_.metadata("Location").contains("postings"))
      assert(postings.nonEmpty, s"no committed postings scan found:\n$plan")
      assert(postings.exists(_.metadata("PushedFilters").contains("EqualTo(t,")),
        s"term filter not pushed: ${postings.map(_.metadata("PushedFilters")).mkString(" | ")}")
    }
  }

  test("s9: the k-means assignment scan runs on the native dot kernel, not interpreted HOFs") {
    // numIter = 0 isolates the assignment plan (no per-round jobs)
    staticPlan(graft.llm.Similarity.kMeans(Tables.embeddings(spark, sf), k = 2, numIter = 0)) { plan =>
      val s = plan.toString
      assert(s.contains("dot_product"),
        s"k-means distances are not on the codegen'd dot kernel:\n$s")
      assert(!s.contains("CartesianProduct"), s"cartesian in k-means plan:\n$s")
    }
  }

  test("g36: the edge-mass total rides as a 1-row broadcast, never a shuffle") {
    val s = spark
    import s.implicits._
    val labels = Seq((0L, 0L), (1L, 0L)).toDF("vertex", "label")
    staticPlan(graft.graph.Analytics.modularity(
      graft.graph.DerivedGraphs.small(spark, sf), labels)) { plan =>
      val bc = plan.collectWithSubqueries { case b: BroadcastExchangeLike => b }
      assert(bc.nonEmpty, s"expected the 1-row m to broadcast:\n$plan")
    }
  }

  test("g39: neighborhood aggregation plans as equi joins — no cartesian, no nested loop") {
    staticPlan(graft.graph.Analytics.neighborStats(
      graft.graph.DerivedGraphs.small(spark, sf))) { plan =>
      val s = plan.toString
      assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
        s"non-equi join shape in neighborStats:\n$s")
    }
  }

  test("q3: the customer dim side is broadcast, not shuffled") {
    staticPlan(SparkEntry.queries("q3_top_revenue")(spark, sf)) { plan =>
      val bc = plan.collectWithSubqueries { case b: BroadcastExchangeLike => b }
      assert(bc.nonEmpty, s"expected a broadcast exchange in q3:\n$plan")
      assert(bc.exists(_.toString.contains("c_custkey")),
        "customer side is not the broadcast one")
    }
  }

  test("t10: per-doc top-k is computed via WindowGroupLimit (partial before the shuffle)") {
    staticPlan(graft.llm.TextOps.tfidfTopTerms(Tables.documents(spark, sf))) { plan =>
      val s = plan.toString
      assert(s.contains("WindowGroupLimit"),
        s"rank<=k not pushed into a group-limit:\n$s")
    }
  }

  test("d7: verification uses the native merge expression, not a per-shingle join") {
    staticPlan(graft.llm.Dedup.ngramJaccardPairs(Tables.documents(spark, sf))) { plan =>
      val s = plan.toString
      assert(s.contains("sorted_intersect_count"),
        s"native SortedIntersectCount missing from the verify stage:\n$s")
    }
  }

  test("d2: word-shingle verify also uses the native merge, not the expansion join") {
    staticPlan(graft.llm.Dedup.jaccardPairs(Tables.documents(spark, sf))) { plan =>
      val s = plan.toString
      assert(s.contains("sorted_intersect_count"),
        s"native SortedIntersectCount missing from d2's verify stage:\n$s")
    }
  }

  test("d3: the LSH candidate verify uses the native merge too") {
    staticPlan(graft.llm.Dedup.minHashLshPairs(Tables.documents(spark, sf))) { plan =>
      val s = plan.toString
      assert(s.contains("sorted_intersect_count"),
        s"native SortedIntersectCount missing from d3's verify stage:\n$s")
    }
  }

  test("e12: the trailing-spend window frame is RANGE, not ROWS") {
    staticPlan(SparkEntry.queries("e12_trailing_spend")(spark, sf)) { plan =>
      val s = plan.toString
      assert(s.contains("RangeFrame"),
        s"expected a RANGE frame in e12's window spec:\n$s")
    }
  }

  test("e17: the interval join plans as an EQUI join on (key, bucket), never a nested loop") {
    // the whole point of the bucketing: a naive overlap predicate would
    // plan BroadcastNestedLoopJoin / CartesianProduct — quadratic per key
    staticPlan(SparkEntry.queries("e17_interval_overlaps")(spark, sf)) { plan =>
      val s = plan.toString
      assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
        s"interval join degenerated to a nested loop:\n$s")
      assert(s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin") ||
        s.contains("BroadcastHashJoin"),
        s"no equi join found in e17's plan:\n$s")
    }
  }

  test("s7: the ADC candidate scan reads codes only — the float vectors stay out of the probe") {
    // PQ's memory claim: the corpus-wide scan touches m bytes of codes per
    // vector; the e/nrm doubles may appear only in the bounded re-rank and
    // broadcast query sides, never in the corpus-side probe projection
    staticPlan(graft.llm.Similarity.pqTopK(Tables.embeddings(spark, sf))) { plan =>
      import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
      // the candidate ranking window (over adc) is the probe's consumer:
      // its input schema is the ADC scan's width
      val wins = plan.collectWithSubqueries {
        case w: WindowExec => w
        case w: WindowGroupLimitExec => w
      }
      assert(wins.nonEmpty, s"no window operators in s7's plan:\n$plan")
      val adcWin = wins.filter(_.toString.contains("adc"))
      assert(adcWin.nonEmpty, s"no adc ranking window found:\n$plan")
      adcWin.foreach { w =>
        val cols = w.children.head.output.map(_.name).toSet
        assert(!cols.contains("e") && !cols.contains("nrm"),
          s"float vectors leaked into the ADC probe: $cols")
      }
    }
  }

  test("t28: the weighted-sample k-cut is a WindowGroupLimit (partial before the shuffle)") {
    staticPlan(SparkEntry.queries("t28_weighted_sample")(spark, sf)) { plan =>
      val s = plan.toString
      assert(s.contains("WindowGroupLimit"),
        s"weighted-sample rank<=k not pushed into a group-limit:\n$s")
    }
  }

  // the gate queries end in a presentation orderBy (one RANGE exchange);
  // the claim is about HASH exchanges — the window partitioning must also
  // serve the downstream aggregate / second window without re-shuffling
  private def hashExchanges(plan: org.apache.spark.sql.execution.SparkPlan) = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    plan.collectWithSubqueries {
      case e: ShuffleExchangeLike if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
  }

  test("e24: the TWAP window and the per-user rollup share ONE hash exchange") {
    staticPlan(SparkEntry.queries("e24_twap")(spark, sf)) { plan =>
      val ex = hashExchanges(plan)
      assert(ex.size === 1,
        s"expected the user_id window partitioning to also serve the aggregate, found ${ex.size} hash exchanges:\n$plan")
    }
  }

  test("q31: both SCD2 window passes (lag-compress, lead) share ONE hash exchange") {
    staticPlan(SparkEntry.queries("q31_scd2_history")(spark, sf)) { plan =>
      val ex = hashExchanges(plan)
      assert(ex.size === 1,
        s"expected one custkey exchange serving both windows, found ${ex.size}:\n$plan")
    }
  }

  test("runtime bloom filter injects on a selective shuffle join (the 100 TB runtime-filter knob)") {
    // At cluster scale a selective dim filter should prune the fact scan
    // BEFORE the shuffle — Catalyst's InjectRuntimeFilter does that with a
    // bloom filter built from the creation side. Local tables sit under the
    // default size thresholds, so lower them to prove the engine's plans
    // are eligible and the knob works; broadcast is disabled because the
    // bloom filter targets shuffle joins (broadcast joins prune via DPP).
    import org.apache.spark.sql.functions.col
    val tweaks = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = tweaks.map { case (k, _) => k -> spark.conf.getOption(k) }
    tweaks.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
      val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      val q = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey").count()
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") && optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$optimized")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q27: the bloom prune filters the fact side BELOW the join (pre-shuffle)") {
    // the operator's whole claim: non-matching fact rows die before the
    // exchange. Structurally: a Filter evaluating the mightContain UDF
    // sits on the lineitem branch with NO join beneath it.
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    staticPlan(SparkEntry.queries("q27_bloom_join")(spark, sf)) { plan =>
      val bloomFilters = plan.collectWithSubqueries {
        case f: FilterExec if f.condition.toString.toLowerCase.contains("udf") => f
      }
      assert(bloomFilters.nonEmpty, s"no bloom-UDF filter in q27's plan:\n$plan")
      // InferFiltersFromConstraints also copies the UDF predicate to the
      // dim side (a bonus prune) — the claim under test is that at least
      // one UDF filter guards the FACT scan with no join beneath it
      val factSide = bloomFilters.filter { f =>
        f.collect { case j: BaseJoinExec => j }.isEmpty &&
          f.collect { case s: FileSourceScanExec => s }
            .exists(_.metadata("Location").contains("lineitem"))
      }
      assert(factSide.nonEmpty,
        s"no pre-join bloom prune on the fact-side scan:\n$plan")
    }
  }

  test("d12: first-occurrence keeper is aggregate-based — no window over the block-hash") {
    // the skew claim: a boilerplate block repeated millions of times must
    // partial-aggregate map-side, not sort as one giant row_number group
    import org.apache.spark.sql.execution.window.WindowExec
    staticPlan(SparkEntry.queries("d12_block_dedup")(spark, sf)) { plan =>
      val wins = plan.collectWithSubqueries { case w: WindowExec => w }
      assert(wins.isEmpty, s"d12 plans a window (skew-prone):\n$plan")
      val aggs = plan.collectWithSubqueries {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a }
      assert(aggs.exists(_.aggregateExpressions.exists(_.toString.contains("min"))),
        s"no min-struct keeper aggregate found:\n$plan")
    }
  }

  test("AQE splits a skewed shuffle join at runtime (the third 100 TB skew knob)") {
    // q15's manual salting is one answer to join skew; the runtime answer is
    // AQE's OptimizeSkewedJoin, which splits oversized shuffle partitions
    // and replicates the matching slice of the other side — salting without
    // the rewrite. Local partitions sit far under the 256 MB default
    // threshold, so lower it (same discipline as the bloom-filter test) to
    // prove the engine's plans are ELIGIBLE: a skewed sort-merge join must
    // come back with isSkewJoin = true and the same rows as the salted
    // rewrite. Manual salting remains the right tool where AQE cannot
    // reach: skewed AGGREGATIONS (OptimizeSkewedJoin only rewrites joins),
    // fixed-partitioning sinks, and streaming joins (no runtime re-plan) —
    // that boundary is the documented contract of Partitioning.saltedJoin.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val tweaks = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = tweaks.map { case (k, _) => k -> spark.conf.getOption(k) }
    tweaks.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key holding ~90% of the fact rows, plus a long uniform tail
      val big = (1L to 60000L).map(i => (if (i % 10 != 0) 0L else i % 97, i))
        .toDF("k", "v")
      val dim = (0L until 97L).map(i => (i, s"dim$i")).toDF("k", "name")
      val joined = big.join(dim, "k").select(col("k"), col("v"), col("name"))
      val n = joined.collect().length.toLong // execute THIS plan so AQE finalizes it
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // Spark 4 materializes the finished plan as nested QueryStageExec
      // nodes, which are leaves to collect() — walk through them
      def all(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case q: QueryStageExec => all(q.plan)
        case _ => p.children.flatMap(all)
      })
      val smjs = all(finalPlan).collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, s"expected a sort-merge join:\n$finalPlan")
      assert(smjs.exists(_.isSkewJoin),
        s"AQE did not mark the skewed join (isSkewJoin=false):\n$finalPlan")
      // the runtime split returns exactly the rows the manual rewrite does
      val salted = graft.operators.Partitioning.saltedJoin(big, dim, "k", salts = 8)
        .select(col("k"), col("v"), col("name"))
      assert(n === salted.count())
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("t37: BM25 top-k plans as TakeOrderedAndProject; the idf table broadcasts") {
    staticPlan(SparkEntry.queries("t37_bm25")(spark, sf)) { plan =>
      val s = plan.toString
      assert(s.contains("TakeOrderedAndProject"),
        s"bm25 top-k materializes a global sort instead of per-partition heads:\n$s")
      assert(plan.collectWithSubqueries { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"idf literal table is not broadcast:\n$s")
      assert(!s.contains("CartesianProduct"), s"cartesian in bm25 plan:\n$s")
    }
  }

  test("s17: hard-negative mining broadcasts the query side, never shuffles the corpus twice") {
    staticPlan(SparkEntry.queries("s17_hard_negatives")(spark, sf)) { plan =>
      val s = plan.toString
      assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"),
        s"query side is not broadcast:\n$s")
      assert(!s.contains("CartesianProduct"), s"cartesian in hard-negative plan:\n$s")
    }
  }

  test("t38: the ccnet scoring join broadcasts the nlp codebook") {
    staticPlan(graft.llm.Perplexity.ccnetScore(Tables.documents(spark, sf))) { plan =>
      assert(plan.collectWithSubqueries { case b: BroadcastExchangeLike => b }.nonEmpty,
        s"nlp table is not broadcast:\n$plan")
    }
  }
}
