package graft

import java.sql.Timestamp
import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming ≡ batch: the same EventStreams plans, replayed through a
  * MemoryStream with watermarks, must produce the batch answer once all
  * input is processed (SURVEY §7 step 8 — the correctness contract that lets
  * the driver's batch oracle stand in for streaming semantics).
  */
/** Top-level so Spark can derive an Encoder (inner classes can't). */
case class Ev(event_id: Long, user_id: Long, event_type: String,
              ts: Timestamp, props: String)

class StreamingSpec extends SparkSpec {

  private def mkEvents: Seq[Ev] = {
    val rng = new scala.util.Random(11)
    val base = 1700000000000L
    (1 to 300).map { i =>
      Ev(i.toLong, rng.nextInt(5).toLong, Seq("view", "click", "purchase")(rng.nextInt(3)),
        new Timestamp(base + rng.nextInt(6 * 3600) * 1000L), s"""{"k": ${rng.nextInt(100)}}""")
    }
  }

  private def runToCompletion(stream: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = stream.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Start the query FIRST, then run `feed` (which should alternate addData
    * with `q.processAllAvailable()`) — the only way to guarantee each feed
    * lands in its own micro-batch, so cross-batch state/watermark paths are
    * genuinely exercised (data queued before start() is served as ONE batch).
    */
  private def runIncremental(stream: DataFrame, name: String, mode: OutputMode)(
      feed: org.apache.spark.sql.streaming.StreamingQuery => Unit): DataFrame = {
    val q = stream.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try { feed(q); q.processAllAvailable() } finally q.stop()
    spark.table(name)
  }

  test("tumbling-window aggregate: streaming (watermarked) == batch") {
    val s = spark
    import s.implicits._
    val events = mkEvents
    val mem = MemoryStream[Ev](s)
    mem.addData(events)
    val got = runToCompletion(
      EventStreams.tumblingCounts(mem.toDF(), withWatermarkCol = true), "t_tumble", OutputMode.Complete())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = EventStreams.tumblingCounts(events.toDF())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want && want.nonEmpty)
  }

  test("session windows: streaming (watermarked, split feed) == batch") {
    val s = spark
    import s.implicits._
    val events = mkEvents
    val mem = MemoryStream[Ev](s)
    // two micro-batches: sessions must merge across them via state
    val (first, second) = events.splitAt(150)
    mem.addData(first)
    mem.addData(second)
    val got = runToCompletion(
      EventStreams.sessionCounts(mem.toDF(), withWatermarkCol = true), "t_sess", OutputMode.Complete())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = EventStreams.sessionCounts(events.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want && want.nonEmpty)
  }

  test("file-source readStream over parquet == batch for the tumbling aggregate") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val events = mkEvents
    events.toDF().write.mode("overwrite").parquet(dir)
    val schema = events.toDF().schema
    val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir)
    val got = runToCompletion(
      EventStreams.tumblingCounts(stream, withWatermarkCol = true), "t_file", OutputMode.Complete())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = EventStreams.tumblingCounts(events.toDF())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want && want.nonEmpty)
  }

  test("parquet file sink (append + checkpoint): finalized windows match batch") {
    val s = spark
    import s.implicits._
    val events = mkEvents
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val chk = java.nio.file.Files.createTempDirectory("graft-chk").toString
    val mem = MemoryStream[Ev](s)
    // two micro-batches so the watermark advances between them and closes
    // the early windows — append mode emits a window only once it is FINAL
    val (e1, e2) = events.sortBy(_.ts.getTime).splitAt(150)
    val q = EventStreams.tumblingCounts(mem.toDF(), withWatermarkCol = true)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(e1); q.processAllAvailable()
      mem.addData(e2); q.processAllAvailable()
    } finally q.stop()
    val got = s.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val want = EventStreams.tumblingCounts(events.toDF())
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // append emits only watermark-finalized windows: a NON-EMPTY SUBSET of
    // the batch answer, and every emitted row must be exactly right
    assert(got.nonEmpty, "no finalized windows reached the file sink")
    assert(got.subsetOf(want), s"sink rows diverge from batch: ${got -- want}")
  }

  test("streaming exact dedup: one survivor per content hash across micro-batches") {
    val s = spark
    import s.implicits._
    val mem = MemoryStream[(Long, String)](s)
    mem.addData(Seq(1L -> "alpha", 2L -> "beta"))
    mem.addData(Seq(3L -> "alpha", 4L -> "gamma", 5L -> "beta")) // cross-batch dups
    val out = runToCompletion(
      graft.llm.Dedup.streamingExactDedup(mem.toDF().toDF("doc_id", "text")),
      "t_dedup", OutputMode.Append())
      .collect().map(_.getString(1)).toSeq
    assert(out.sorted === Seq("alpha", "beta", "gamma"))
  }

  test("streaming near-dup band claims: id-ordered stream converges to the batch minima; claims are never stolen") {
    val s = spark
    import s.implicits._
    // docs 1 and 3 share all shingles (identical text) — doc 3 claims
    // nothing; doc 4 is novel. Batches arrive in ascending-id order (the
    // ingest contract), split so claims must survive ACROSS micro-batches.
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "entirely different content about graph engines and spark plans",
      3L -> "the quick brown fox jumps over the lazy dog again and again",
      4L -> "novel third topic mentioning neither foxes nor query engines at all")
    val mem = MemoryStream[(Long, String)](s)
    val got = runIncremental(
      graft.llm.Dedup.streamingNearDupClaims(mem.toDF().toDF("doc_id", "text")),
      "t_neardup_claims", OutputMode.Update()) { q =>
        mem.addData(docs.take(2)); q.processAllAvailable()
        // doc 3 re-presents doc 1's bands in a LATER batch: every claim
        // must stay with doc 1
        mem.addData(docs.drop(2)); q.processAllAvailable()
      }
      // update mode re-emits a row per touched key; keep the LAST claim
      // per band (they are all equal by the never-stolen contract below)
      .collect().map(r => ((r.getInt(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    // no band ever reported two different claimants across emissions
    assert(got.values.forall(_.size == 1), s"a claim changed owners: $got")
    val streaming = got.map { case (k, vs) => k -> vs.head }
    val batch = graft.llm.Dedup.nearDupKeepers(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // batch keepers = docs claiming >= 1 band; the streaming claim multiset
    // rolled up per claimant must agree exactly
    val rolled = streaming.values.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    assert(rolled === batch, s"streaming claims $rolled diverge from batch keepers $batch")
    assert(!rolled.contains(3L) && rolled.contains(4L))
  }

  test("dropDuplicatesWithinWatermark: in-horizon duplicates dropped, expired keys re-emit") {
    val s = spark
    import s.implicits._
    val base = 1700000000000L
    val hour = 3600 * 1000L
    val mem = MemoryStream[(Long, String, Timestamp)](s)
    val got = runIncremental(
      graft.llm.Dedup.streamingDedupWithinWatermark(
        mem.toDF().toDF("doc_id", "text", "ts"), tsCol = "ts", delay = "1 hour"),
      "t_dedup_wm", OutputMode.Append()) { q =>
        mem.addData(Seq((1L, "alpha", new Timestamp(base)))); q.processAllAvailable()
        // in-horizon duplicate (same hour): dropped
        mem.addData(Seq((2L, "alpha", new Timestamp(base + 10 * 60 * 1000)))); q.processAllAvailable()
        // push the watermark far past alpha's horizon, then repeat it:
        // its state was evicted, so the copy RE-EMITS — the documented
        // trade vs the keep-forever variant
        mem.addData(Seq((3L, "beta", new Timestamp(base + 10 * hour)))); q.processAllAvailable()
        mem.addData(Seq((4L, "alpha", new Timestamp(base + 10 * hour)))); q.processAllAvailable()
      }
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "alpha"), (3L, "beta"), (4L, "alpha")),
      s"expected horizon-bounded dedup semantics, got $got")
  }

  test("stream-stream join (watermarked, time-bounded) == batch join") {
    val s = spark
    import s.implicits._
    val events = mkEvents
    val views = MemoryStream[Ev](s)
    val clicks = MemoryStream[Ev](s)
    // feed in SEPARATE micro-batches (addData between processAllAvailable
    // calls on a started query) so join state really must hold each side's
    // rows across batches (round-3 ADVICE: queueing everything before
    // start() collapses to a single batch). Batches are split by EVENT TIME
    // (older half first): cross-batch pairs straddle the cut — batch-1 views
    // wait in state for batch-2 clicks — while nothing arrives behind the
    // advanced watermark (a random split would silently drop late rows,
    // which is correct streaming semantics but not this test's subject).
    val cut = events.map(_.ts.getTime).sorted.apply(events.size / 2)
    val (e1, e2) = events.partition(_.ts.getTime < cut)
    val got = runIncremental(
      EventStreams.viewClickJoin(views.toDF(), clicks.toDF(), withWatermarks = true),
      "t_ssjoin", OutputMode.Append()) { q =>
        views.addData(e1); clicks.addData(e1); q.processAllAvailable()
        views.addData(e2); clicks.addData(e2); q.processAllAvailable()
      }
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = EventStreams.viewClickJoin(events.toDF(), events.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want && want.nonEmpty)
    // prove the cross-batch state path actually fired: at least one result
    // pairs a batch-1 view with a batch-2 click
    val ts = events.map(e => e.event_id -> e.ts.getTime).toMap
    assert(got.exists { case (vid, cid, _) => ts(vid) < cut && ts(cid) >= cut },
      "no cross-batch join pair — the state path wasn't exercised")
  }

  test("stream-stream LEFT OUTER join: null rows emit once the watermark closes the window") {
    val s = spark
    import s.implicits._
    val events = mkEvents
    val views = MemoryStream[Ev](s)
    val clicks = MemoryStream[Ev](s)
    val cut = events.map(_.ts.getTime).sorted.apply(events.size / 2)
    val (e1, e2) = events.partition(_.ts.getTime < cut)
    // far-future sentinels on BOTH sides: the combined watermark must pass
    // v_ts + window + delay before an unmatched view may emit its null row
    // — without them the final views would sit in state forever (correct
    // streaming semantics, but then the test could never observe the
    // outer-join path). Same user on both so they pair with each other,
    // filtered out below by id.
    val far = events.map(_.ts.getTime).max + 10L * 24 * 3600 * 1000
    val sentinels = Seq(
      Ev(901L, 900L, "view", new Timestamp(far), "{}"),
      Ev(902L, 900L, "click", new Timestamp(far), "{}"))
    val table = runIncremental(
      EventStreams.viewClickLeftJoin(views.toDF(), clicks.toDF(), withWatermarks = true),
      "t_ssleft", OutputMode.Append()) { q =>
        views.addData(e1); clicks.addData(e1); q.processAllAvailable()
        views.addData(e2); clicks.addData(e2); q.processAllAvailable()
        views.addData(sentinels); clicks.addData(sentinels); q.processAllAvailable()
      }
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
      .filter(_._1 < 900L).toSet
    val got = rows(table)
    val want = rows(EventStreams.viewClickLeftJoin(events.toDF(), events.toDF()))
    assert(got === want && want.nonEmpty)
    assert(got.exists(_._2.isEmpty), "no never-converted view emitted — outer path not exercised")
    assert(got.exists(_._2.nonEmpty), "no matched pair — inner path not exercised")
  }

  test("stream-stream FULL OUTER join: both sides' null rows emit after the watermark") {
    val s = spark
    import s.implicits._
    val events = mkEvents
    val views = MemoryStream[Ev](s)
    val clicks = MemoryStream[Ev](s)
    val cut = events.map(_.ts.getTime).sorted.apply(events.size / 2)
    val (e1, e2) = events.partition(_.ts.getTime < cut)
    // far-future sentinels on BOTH sides (st6's discipline): full outer
    // retains state on both inputs, so both watermarks must advance past
    // the horizon before either side's null-padded rows may flush
    val far = events.map(_.ts.getTime).max + 10L * 24 * 3600 * 1000
    val sentinels = Seq(
      Ev(901L, 900L, "view", new Timestamp(far), "{}"),
      Ev(902L, 900L, "click", new Timestamp(far), "{}"))
    val table = runIncremental(
      EventStreams.viewClickFullJoin(views.toDF(), clicks.toDF(), withWatermarks = true),
      "t_ssfull", OutputMode.Append()) { q =>
        views.addData(e1); clicks.addData(e1); q.processAllAvailable()
        views.addData(e2); clicks.addData(e2); q.processAllAvailable()
        views.addData(sentinels); clicks.addData(sentinels); q.processAllAvailable()
      }
    def rows(df: DataFrame) = df.collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
      .filter(_._3 < 900L).toSet // user key is never null in this schema
    val got = rows(table)
    val want = rows(EventStreams.viewClickFullJoin(events.toDF(), events.toDF()))
    assert(got === want && want.nonEmpty)
    assert(got.exists(t => t._1.nonEmpty && t._2.isEmpty),
      "no never-converted view emitted — left outer path not exercised")
    assert(got.exists(t => t._1.isEmpty && t._2.nonEmpty),
      "no unattributed click emitted — right outer path not exercised")
    assert(got.exists(t => t._1.nonEmpty && t._2.nonEmpty),
      "no matched pair — inner path not exercised")
  }

  test("foreachBatch streaming MERGE: per-micro-batch upsert table reaches the batch totals") {
    val s = spark
    import s.implicits._
    val events = mkEvents
    val cut = events.map(_.ts.getTime).sorted.apply(events.size / 2)
    val (e1, e2) = events.partition(_.ts.getTime < cut)
    val mem = MemoryStream[Ev](s)
    // the CDC-apply idiom: each micro-batch folds into the target via
    // delta + combine + MERGE; localCheckpoint cuts lineage so batch N's
    // target does not recompute batch N-1's merge
    var target = EventStreams.emptyTotals(s)
    val q = mem.toDF().writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        target = EventStreams.upsertTotalsBatch(target, b).localCheckpoint(true)
      }
      .outputMode(OutputMode.Append())
      .start()
    try {
      mem.addData(e1); q.processAllAvailable()
      mem.addData(e2); q.processAllAvailable()
    } finally q.stop()
    val got = target.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = EventStreams.upsertTotalsBatch(EventStreams.emptyTotals(s), events.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want && want.nonEmpty)
    // the per-batch path must actually have UPDATED existing keys (a user
    // active in both halves), not just inserted
    val users1 = e1.map(_.user_id).toSet
    assert(e2.exists(e => users1.contains(e.user_id)),
      "fixture regression: no user spans both micro-batches")
  }

  test("stream-static broadcast join == batch join") {
    val s = spark
    import s.implicits._
    val events = mkEvents
    // static dimension joined into a stream through the SHARED operator the
    // st8 gate binds — the dim is broadcast so each micro-batch joins
    // map-side, no stream-side state
    val dims = (0L until 5L).map(i => (i, s"user-$i")).toDF("user_id", "segment")
    val mem = MemoryStream[Ev](s)
    mem.addData(events)
    val got = runToCompletion(
      EventStreams.enrichPurchases(mem.toDF(), dims),
      "t_enrich", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = EventStreams.enrichPurchases(events.toDF(), dims)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === want && want.nonEmpty)
  }

  test("transformWithState running counts: per-micro-batch increment (RocksDB state store)") {
    val s = spark
    import s.implicits._
    // transformWithState requires the RocksDB provider in streaming mode
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = 1700000000000L
      def ev(uid: Long, offsetMs: Long, tpe: String) =
        EventStreams.UserEvent(uid, new Timestamp(base + offsetMs), tpe)
      val mem = MemoryStream[EventStreams.UserEvent](s)
      val rows = runIncremental(
        EventStreams.runningUserCountsTws(mem.toDS()).toDF(),
        "t_tws", OutputMode.Update()) { q =>
          mem.addData(Seq(ev(1L, 0L, "view"), ev(1L, 1000L, "click"))); q.processAllAvailable()
          mem.addData(Seq(ev(1L, 2000L, "purchase"), ev(2L, 0L, "view"))); q.processAllAvailable()
        }
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      // batch 1 emits user 1 at n=2; batch 2 continues FROM STORED STATE
      // to n=3 (not 1) — the cross-micro-batch proof — and user 2 starts at 1
      assert(rows === Set((1L, 2L, "click"), (1L, 3L, "purchase"), (2L, 1L, "view")),
        s"got $rows")
    } finally saved match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  test("transformWithState running counts: batch fold equals the mapGroupsWithState operator") {
    val s = spark
    import s.implicits._
    val events = mkEvents.map(e => EventStreams.UserEvent(e.user_id, e.ts, e.event_type))
    val tws = EventStreams.runningUserCountsTws(events.toDS())
      .collect().map(r => (r.user_id, r.n_events, r.last_type)).toSet
    val mgws = EventStreams.runningUserCounts(events.toDS())
      .collect().map(r => (r.user_id, r.n_events, r.last_type)).toSet
    assert(tws === mgws && tws.nonEmpty)
  }

  test("bounded running counts: idle keys are evicted on event-time timeout") {
    val s = spark
    import s.implicits._
    val base = 1700000000000L
    def ev(uid: Long, offsetMs: Long) =
      EventStreams.UserEvent(uid, new Timestamp(base + offsetMs), "view")
    val H = 3600 * 1000L
    val mem = MemoryStream[EventStreams.UserEvent](s)
    // watermark delay 1h, idle timeout 2h: user 1's state (last event t0)
    // must be evicted once the watermark passes t0+2h, so their return at
    // t0+21h restarts the counter at 1 — the observable proof the state
    // store sheds idle keys instead of growing with every user ever seen
    val rows = runIncremental(
      EventStreams.runningUserCountsBounded(mem.toDS()).toDF(),
      "t_evict", OutputMode.Update()) { q =>
        mem.addData(Seq(ev(1L, 0L))); q.processAllAvailable()
        // push the watermark to t0+9h (>> t0+2h timeout)
        mem.addData(Seq(ev(2L, 10 * H))); q.processAllAvailable()
        // next batch fires user 1's timeout (state removed, nothing emitted)
        mem.addData(Seq(ev(2L, 20 * H))); q.processAllAvailable()
        // user 1 returns: a fresh counter proves the old state is gone
        mem.addData(Seq(ev(1L, 21 * H))); q.processAllAvailable()
      }
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val user1Counts = rows.filter(_._1 == 1L).map(_._2)
    assert(user1Counts === Seq(1L, 1L), // NOT 1 then 2: state was evicted
      s"expected user 1 to restart at 1 after eviction, got $rows")
    assert(rows.filter(_._1 == 2L).map(_._2).sorted === Seq(1L, 2L))
  }

  test("append-mode sessionization: sessions close on gap, trailing session flushes on timeout") {
    val s = spark
    import s.implicits._
    val base = 1700000000000L
    def ev(uid: Long, offMin: Long) =
      EventStreams.UserEvent(uid, new Timestamp(base + offMin * 60000L), "view")
    def us(offMin: Long) = base * 1000L + offMin * 60000000L
    val mem = MemoryStream[EventStreams.UserEvent](s)
    val rows = runIncremental(
      EventStreams.sessionizeStateful(mem.toDS()).toDF(),
      "t_sess_close", OutputMode.Append()) { q =>
        mem.addData(Seq(ev(1L, 0L), ev(1L, 10L))); q.processAllAvailable()
        // session still open: Append mode emits nothing yet
        assert(spark.table("t_sess_close").isEmpty,
          "open session must not emit in Append mode")
        mem.addData(Seq(ev(1L, 60L))); q.processAllAvailable()
        // the 50-min gap (≥ 30 min) closed the first session — emitted NOW,
        // before any watermark/timeout machinery runs
        val mid = spark.table("t_sess_close").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
        assert(mid === Seq((1L, us(0L), us(10L), 2L)), s"gap close: $mid")
        // sentinel pushes the watermark past 60min + gap (delay 2h):
        // wm -> 8h, then the NEXT batch fires the trailing session's timeout
        mem.addData(Seq(ev(99L, 600L))); q.processAllAvailable()
        mem.addData(Seq(ev(99L, 601L))); q.processAllAvailable()
      }
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows === Set((1L, us(0L), us(10L), 2L), (1L, us(60L), us(60L), 1L)),
      s"timeout flush: $rows")
  }

  test("append-mode sessionization: streaming (split ordered feed + watermark flush) == batch") {
    val s = spark
    import s.implicits._
    val events = mkEvents.map(e => EventStreams.UserEvent(e.user_id, e.ts, e.event_type))
      .sortBy(_.ts.getTime)
    // time-ordered split: each half is its own micro-batch (append-only
    // sessionization is order-sensitive by contract — late arrivals merge
    // into the OPEN session only)
    val (first, second) = events.splitAt(events.size / 2)
    val maxTs = events.map(_.ts.getTime).max
    val sentinel = EventStreams.UserEvent(999L,
      new Timestamp(maxTs + 24 * 3600 * 1000L), "view")
    val mem = MemoryStream[EventStreams.UserEvent](s)
    val got = runIncremental(
      EventStreams.sessionizeStateful(mem.toDS()).toDF(),
      "t_sess_eq", OutputMode.Append()) { q =>
        mem.addData(first); q.processAllAvailable()
        mem.addData(second); q.processAllAvailable()
        // sentinel advances the watermark past every real session's
        // deadline; one more batch delivers the timeouts (flush)
        mem.addData(Seq(sentinel)); q.processAllAvailable()
        mem.addData(Seq(EventStreams.UserEvent(999L,
          new Timestamp(maxTs + 25 * 3600 * 1000L), "view")))
        q.processAllAvailable()
      }
      .filter("user_id <> 999")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = EventStreams.sessionizeStateful(events.toDS())
      .collect().map(o => (o.user_id, o.session_start_us, o.session_end_us, o.n)).toSet
    assert(got === want && want.nonEmpty, s"streaming=$got batch=$want")
  }

  test("bounded running counts: a late event does not pull the eviction deadline backward") {
    val s = spark
    import s.implicits._
    val base = 1700000000000L
    def ev(uid: Long, offsetMs: Long) =
      EventStreams.UserEvent(uid, new Timestamp(base + offsetMs), "view")
    val H = 3600 * 1000L
    val mem = MemoryStream[EventStreams.UserEvent](s)
    // user 1's newest event is at 10h (deadline 12h). An out-of-order
    // event at 9.5h — above the 9h watermark, so NOT dropped — is counted,
    // but must not re-arm the deadline backward to 11.5h: when user 2's
    // events push the watermark to 11.8-11.9h, user 1 must SURVIVE (12h
    // deadline not yet passed), so their return at 12.5h continues the
    // count at 3. A deadline computed from the current batch alone would
    // have evicted them at wm 11.8h and restarted the count at 1.
    val rows = runIncremental(
      EventStreams.runningUserCountsBounded(mem.toDS()).toDF(),
      "t_late", OutputMode.Update()) { q =>
        mem.addData(Seq(ev(1L, 10 * H))); q.processAllAvailable() // wm -> 9h
        mem.addData(Seq(ev(1L, (9.5 * H).toLong))); q.processAllAvailable() // out-of-order, counted
        mem.addData(Seq(ev(2L, (12.8 * H).toLong))); q.processAllAvailable() // wm -> 11.8h
        mem.addData(Seq(ev(2L, (12.9 * H).toLong))); q.processAllAvailable() // u1 idle-checked at 11.8h
        mem.addData(Seq(ev(1L, (12.5 * H).toLong))); q.processAllAvailable()
      }
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows.filter(_._1 == 1L).map(_._2) === Seq(1L, 2L, 3L),
      s"user 1 should survive to n=3 (deadline anchored at newest-ever event), got $rows")
  }

  test("mapGroupsWithState running counts reach the batch totals") {
    val s = spark
    import s.implicits._
    val events = mkEvents
    val mem = MemoryStream[EventStreams.UserEvent](s)
    mem.addData(events.map(e => EventStreams.UserEvent(e.user_id, e.ts, e.event_type)))
    val got = runToCompletion(
      EventStreams.runningUserCounts(mem.toDS()).toDF(), "t_state", OutputMode.Update())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = events.groupBy(_.user_id).map { case (u, es) => (u, es.size.toLong) }.toSet
    assert(got === want)
  }

  test("streaming CEP: automaton state carries across micro-batches; accumulated == batch") {
    val s = spark
    import s.implicits._
    import graft.streaming.EventStreams.CepEvent
    // a pattern occurrence SPLIT across the batch boundary: 'a b' lands in
    // batch 1, the completing 'c' in batch 2 — only carried stage state
    // can count it
    val all = Seq(
      CepEvent(1L, 1L, 1L, "a"), CepEvent(1L, 2L, 2L, "b"),
      CepEvent(2L, 3L, 3L, "a"), CepEvent(2L, 4L, 4L, "b"), CepEvent(2L, 5L, 5L, "c"),
      // --- batch boundary (ts >= 10) ---
      CepEvent(1L, 10L, 6L, "c"), CepEvent(1L, 11L, 7L, "a"),
      CepEvent(2L, 12L, 8L, "x"),
      CepEvent(1L, 13L, 9L, "b"), CepEvent(1L, 14L, 10L, "c"))
    val (b1, b2) = all.partition(_.ts_us < 10L)
    val mem = MemoryStream[CepEvent](s)
    val got = runIncremental(
      graft.streaming.EventStreams.streamingPatternCounts(
        mem.toDS(), Seq("a", "b", "c")).toDF(), "t_cep", OutputMode.Update()) { q =>
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    }.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // final state per user = the row with the highest n_events (monotone)
    val fin = got.groupBy(_._1).view.mapValues(_.maxBy(_._3)).toMap
    // user 1: a b | c a b c -> 2 completions, one SPLIT across the boundary
    assert(fin(1L) === ((1L, 0, 6L, 2L)), s"got ${fin(1L)}")
    // user 2: completed in batch 1; batch 2's 'x' advances nothing
    assert(fin(2L) === ((2L, 0, 4L, 1L)), s"got ${fin(2L)}")
    // accumulated streaming state == one-shot batch fold
    val batch = graft.streaming.EventStreams.streamingPatternCounts(
      s.createDataset(all), Seq("a", "b", "c"))
      .collect().map(st => st.user_id -> ((st.user_id, st.stage, st.n_events, st.n_matches))).toMap
    assert(fin === batch)
  }

  test("streaming commit-log sink: one atomic version per micro-batch, history monotone") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-clog")
    val t = new graft.operators.CommitTable(s, root.resolve("tbl").toString, "k")
    val rows = (1L to 40L).map(i => (i, s"v$i")).toDF("k", "v")
    graft.streaming.BoundedReplay.runForeachBatch(
      rows, "spec_log_sink", b => { t.append(b); () }, sourceFiles = 4)
    // one committed version per real micro-batch
    assert(t.versions() === Seq(0L, 1L, 2L, 3L))
    // history is monotone (each version extends the previous)...
    val counts = t.versions().map(v => t.asOf(v).count())
    assert(counts === counts.sorted && counts.last === 40L)
    // ...and the final head carries exactly the batch content
    assert(t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      (1L to 40L).map(i => (i, s"v$i")).toSet)
  }

  test("streaming commit-log source: one content-exact change feed per committed version") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-clogsrc")
    val tp = root.resolve("tbl").toString
    val t = new graft.operators.CommitTable(s, tp, "k")
    def kv(pairs: (Long, String)*) = pairs.toDF("k", "v")
    t.overwrite(kv(1L -> "a", 2L -> "b"))
    t.append(kv(3L -> "c"))
    t.overwrite(kv(2L -> "b", 9L -> "z"))
    val acc = scala.collection.mutable.Map.empty[Long, Set[(Long, String, String)]]
    graft.streaming.CommitLogStream.followChanges(s, t, tp, (v, cdf) => {
      acc(v) = cdf.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    })
    assert(acc.keySet === Set(0L, 1L, 2L))
    assert(acc(0L) === Set((1L, "a", "insert"), (2L, "b", "insert")))
    assert(acc(1L) === Set((3L, "c", "insert")))
    assert(acc(2L) === Set((9L, "z", "insert"), (1L, "a", "delete"), (3L, "c", "delete")))
  }

  test("streaming commit-log source: startingVersion skips the bootstrap snapshot, catch-up feed only") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stream-clogsv")
    val tp = root.resolve("tbl").toString
    val t = new graft.operators.CommitTable(s, tp, "k")
    def kv(pairs: (Long, String)*) = pairs.toDF("k", "v")
    t.overwrite(kv(1L -> "a", 2L -> "b"))
    t.append(kv(3L -> "c"))
    t.overwrite(kv(2L -> "b", 9L -> "z"))
    // the consumer declares it already holds the state as of v0 (a
    // bootstrapped index): only the catch-up feed is applied, and the
    // applied versions carry exactly the same change sets the full
    // replay would have delivered for them
    val acc = scala.collection.mutable.Map.empty[Long, Set[(Long, String, String)]]
    graft.streaming.CommitLogStream.followChanges(s, t, tp, (v, cdf) => {
      acc(v) = cdf.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    }, startingVersion = 1L)
    assert(acc.keySet === Set(1L, 2L))
    assert(acc(1L) === Set((3L, "c", "insert")))
    assert(acc(2L) === Set((9L, "z", "insert"), (1L, "a", "delete"), (3L, "c", "delete")))
    // attaching past the head applies nothing (a fresh consumer of a
    // fully-consumed table)
    val none = scala.collection.mutable.Map.empty[Long, Long]
    graft.streaming.CommitLogStream.followChanges(s, t, tp, (v, cdf) => {
      none(v) = cdf.count()
    }, startingVersion = 3L)
    assert(none.isEmpty)
  }

  test("streaming IVF maintenance: one lists version per discovered commit, head equals one-shot append") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(71)
    val dim = 16
    val vecs = (0L until 60L).map(i => (i, Seq.fill(dim)(rng.nextGaussian().toFloat)))
    def emb(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-stream-ivf")
    val tp = root.resolve("emb").toString
    val t = new graft.operators.CommitTable(s, tp, "vec_id")
    t.overwrite(emb(vecs.filter(_._1 < 36)))
    t.append(emb(vecs.filter(v => v._1 >= 36 && v._1 % 2 == 0)))
    t.append(emb(vecs.filter(v => v._1 >= 36 && v._1 % 2 == 1)))
    val idx = root.resolve("idx").toString
    graft.streaming.CommitLogStream.followChanges(s, t, tp, (v, cdf) => {
      val batch = cdf.filter(org.apache.spark.sql.functions.col("change_type") === "insert")
        .drop("change_type")
      if (v == 0L) graft.llm.Similarity.buildIvfIndex(batch, idx, nlist = 8, dim = dim)
      else graft.llm.Similarity.appendIvfIndex(batch, idx)
    })
    // one atomic lists version per discovered commit: build + 2 appends
    val lists = new graft.operators.CommitTable(s, s"$idx/lists", "cid")
    assert(lists.versions() === Seq(0L, 1L, 2L))
    assert(lists.asOf(0L).count() === 36L)
    assert(lists.asOf(1L).count() === 48L)
    assert(lists.read().count() === 60L)
    // head content equals the one-shot add-after-train index (s14's shape)
    val oneShotRoot = java.nio.file.Files.createTempDirectory("graft-stream-ivf-ref")
      .resolve("idx").toString
    graft.llm.Similarity.buildIvfIndex(emb(vecs.filter(_._1 < 36)), oneShotRoot,
      nlist = 8, dim = dim)
    graft.llm.Similarity.appendIvfIndex(emb(vecs.filter(_._1 >= 36)), oneShotRoot)
    def content(p: String) = new graft.operators.CommitTable(s, s"$p/lists", "cid")
      .read().select("vec_id", "cid").collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(content(idx) === content(oneShotRoot))
    // and the indexed query runs end-to-end over the streamed head
    val q = graft.llm.Similarity.ivfTopKIndexed(s, idx, numQueries = 8, k = 3, nprobe = 3)
    def qRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val preOptimize = qRows(q)
    assert(preOptimize.nonEmpty)

    // OPTIMIZE composed into the loop (the maintenance the per-batch
    // commits need): clustered compaction folds the accreted small files,
    // the probe is bit-identical, and the pre-compaction history and its
    // original files remain readable
    val filesBefore = lists.read().inputFiles.length
    val vOpt = lists.compactClustered("cid", targetFiles = 2)
    assert(vOpt === 3L)
    assert(lists.read().inputFiles.length < filesBefore,
      s"OPTIMIZE must shrink the file count, was $filesBefore")
    assert(qRows(graft.llm.Similarity.ivfTopKIndexed(s, idx, numQueries = 8, k = 3, nprobe = 3))
      === preOptimize, "probe results must be bit-identical through the compaction commit")
    assert(lists.asOf(2L).count() === 60L && lists.asOf(0L).count() === 36L,
      "asOf history must survive the compaction rewrite")
  }

  test("streamed graph-index maintenance: per-commit append, head equals direct API calls, OPTIMIZE preserves search") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(97)
    val dim = 12
    val vecs = (0L until 90L).map(i => (i, Seq.fill(dim)(rng.nextGaussian().toFloat)))
    def emb(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
    val build = vecs.filter(_._1 >= 30)
    val b1 = vecs.filter(v => v._1 >= 15 && v._1 < 30)
    val b2 = vecs.filter(_._1 < 15)
    val root = java.nio.file.Files.createTempDirectory("graft-stream-knng")
    val tp = root.resolve("emb").toString
    val t = new graft.operators.CommitTable(s, tp, "vec_id")
    t.overwrite(emb(build)); t.append(emb(b1)); t.append(emb(b2))
    val idx = root.resolve("idx").toString
    graft.streaming.CommitLogStream.followChanges(s, t, tp, (v, cdf) => {
      val batch = cdf.filter(org.apache.spark.sql.functions.col("change_type") === "insert")
        .drop("change_type")
      if (v == 0L) graft.llm.KnnGraph.buildKnnGraphIndex(batch, idx, k = 4, rounds = 2)
      else graft.llm.KnnGraph.appendKnnGraphIndex(batch, idx, linkK = 4)
    })
    // one atomic graph version per discovered commit: build + 2 appends
    val graph = new graft.operators.CommitTable(s, s"$idx/graph", "src")
    assert(graph.versions() === Seq(0L, 1L, 2L))
    // the streamed head equals running the Scala calls directly — the
    // change-feed plumbing adds nothing to the append semantics
    val refRoot = java.nio.file.Files.createTempDirectory("graft-stream-knng-ref")
      .resolve("idx").toString
    graft.llm.KnnGraph.buildKnnGraphIndex(emb(build), refRoot, k = 4, rounds = 2)
    graft.llm.KnnGraph.appendKnnGraphIndex(emb(b1), refRoot, linkK = 4)
    graft.llm.KnnGraph.appendKnnGraphIndex(emb(b2), refRoot, linkK = 4)
    def edges(p: String) = new graft.operators.CommitTable(s, s"$p/graph", "src")
      .read().select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(edges(idx) === edges(refRoot))
    // batch 1 linked only into the build corpus AT ITS OWN COMMIT (the
    // asOf(1) snapshot); at the head its vertices also carry REVERSE
    // edges from batch 2 (which searched the state AFTER the first
    // append) — but never intra-batch links
    val b1Ids = b1.map(_._1).toSet; val b2Ids = b2.map(_._1).toSet
    val e1 = graph.asOf(1L).select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(e1.filter(x => b1Ids(x._1)).forall(x => x._2 >= 30),
      "at version 1 the first batch must link into the build corpus only")
    val e = edges(idx)
    assert(e.filter(x => b1Ids(x._1)).forall(x => !b1Ids(x._2)),
      "first batch must never link intra-batch")
    assert(e.filter(x => b2Ids(x._1)).forall(x => !b2Ids(x._2)),
      "second batch must never link intra-batch")
    // search end-to-end over the streamed head, bit-identical through
    // OPTIMIZE; history and file count behave like every other index
    def qRows() = graft.llm.KnnGraph.knnGraphSearch(s, idx, numQueries = 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val preOptimize = qRows()
    assert(preOptimize.nonEmpty)
    val filesBefore = graph.read().inputFiles.length
    val vOpt = graph.compactClustered("src", targetFiles = 2)
    assert(vOpt === 3L)
    assert(graph.read().inputFiles.length < filesBefore,
      s"OPTIMIZE must shrink the file count, was $filesBefore")
    assert(qRows() === preOptimize,
      "search must be bit-identical through the compaction commit")
    assert(graph.asOf(0L).count() < graph.asOf(2L).count(),
      "asOf history must survive the compaction rewrite")
  }

  test("streamed index deletes: a mixed insert+delete feed maintains the index exactly like direct API calls") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(71)
    val dim = 12
    val vecs = (0L until 80L).map(i => (i, Seq.fill(dim)(rng.nextGaussian().toFloat)))
    def emb(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("graft-sidxdel-spec")
    val tp = root.resolve("emb").toString
    val t = new graft.operators.CommitTable(s, tp, "vec_id")
    t.overwrite(emb(vecs.filter(_._1 < 60)))   // v0: build corpus
    t.append(emb(vecs.filter(_._1 >= 60)))     // v1: insert feed
    t.deleteRange(20L, 39L)                    // v2: delete feed
    val idx = root.resolve("idx").toString
    graft.streaming.CommitLogStream.followChanges(s, t, tp, (v, cdf) => {
      val ins = cdf.filter(org.apache.spark.sql.functions.col("change_type") === "insert")
        .drop("change_type")
      val del = cdf.filter(org.apache.spark.sql.functions.col("change_type") === "delete")
        .drop("change_type")
      if (v == 0L) graft.llm.Similarity.buildIvfIndex(ins, idx, nlist = 8, dim = dim)
      else {
        if (!del.isEmpty) graft.llm.Similarity.deleteFromIvfIndex(del.select("vec_id"), idx)
        if (!ins.isEmpty) graft.llm.Similarity.appendIvfIndex(ins, idx)
      }
    })
    // the streamed head equals running the API calls directly
    val refIdx = java.nio.file.Files.createTempDirectory("graft-sidxdel-ref")
      .resolve("idx").toString
    graft.llm.Similarity.buildIvfIndex(emb(vecs.filter(_._1 < 60)), refIdx, nlist = 8, dim = dim)
    graft.llm.Similarity.appendIvfIndex(emb(vecs.filter(_._1 >= 60)), refIdx)
    graft.llm.Similarity.deleteFromIvfIndex(
      emb(vecs.filter(v => v._1 >= 20 && v._1 <= 39)).select("vec_id"), refIdx)
    def probe(p: String) = graft.llm.Similarity
      .ivfTopKIndexed(s, p, numQueries = 10, k = 3, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val streamed = probe(idx)
    assert(streamed === probe(refIdx),
      "streamed maintenance must equal the direct API sequence")
    assert(streamed.forall(r => r._2 < 20L || r._2 > 39L),
      "deleted ids must be gone from the streamed head")
    // consolidation on the streamed index: physical drop, probe unchanged
    graft.llm.Similarity.consolidateIvfIndex(s, idx)
    assert(probe(idx) === streamed,
      "the probe must be bit-identical through consolidation")
    val lists = new graft.operators.CommitTable(s, s"$idx/lists", "cid")
    assert(lists.read().count() === 60L, "80 vectors - 20 deletes must remain")
  }

  test("streamed quantile-sketch maintenance: per-commit merge, head equals a one-shot direct build") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(83)
    val all = (1L to 3000L).map(i => (i, math.abs(rng.nextLong()) % 500000L))
    val root = java.nio.file.Files.createTempDirectory("graft-stream-quant")
    val tp = root.resolve("rows").toString
    val t = new graft.operators.CommitTable(s, tp, "uid")
    def df(rows: Seq[(Long, Long)]) = rows.toDF("uid", "val")
    t.overwrite(df(all.filter(_._1 % 3 == 0)))
    t.append(df(all.filter(_._1 % 3 == 1)))
    t.append(df(all.filter(_._1 % 3 == 2)))
    val skT = new graft.operators.CommitTable(s, root.resolve("sketch").toString, "z")
    graft.streaming.CommitLogStream.followChanges(s, t, tp, (v, cdf) => {
      val batch = cdf.filter(org.apache.spark.sql.functions.col("change_type") === "insert")
        .drop("change_type")
      val bs = graft.llm.Sketches.adaptiveQuantileSketch(batch, k = 64)
      if (v == 0L) skT.overwrite(bs)
      else skT.overwrite(graft.llm.Sketches.mergeQuantileSketches(skT.read(), bs, k = 64))
    })
    // one sketch version per discovered commit
    assert(skT.versions() === Seq(0L, 1L, 2L))
    // the EXACT merge law, through real commits: streamed head == direct
    def skRows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(x => (x._1, x._2)).toSeq
    val direct = graft.llm.Sketches.adaptiveQuantileSketch(df(all), k = 64)
    assert(skRows(skT.read()) === skRows(direct),
      "streamed-merged sketch head must equal the one-shot build row-for-row")
    // and so do the quantile readouts
    val qs = Seq(250000L, 900000L)
    assert(graft.llm.Sketches.sketchQuantiles(skT.read(), qs).collect().toSeq.map(_.toSeq)
      === graft.llm.Sketches.sketchQuantiles(direct, qs).collect().toSeq.map(_.toSeq))
  }

  test("streamed HLL maintenance: per-commit register merge, head equals a one-shot direct build") {
    val s = spark
    import s.implicits._
    val docs = (1L to 90L).map { i =>
      val words = (0 until (5 + (i % 4).toInt)).map(j => s"w${(i * 13 + j * 7) % 211}")
      (i, words.mkString(" "), if (i % 2 == 0) "en" else "de")
    }
    val root = java.nio.file.Files.createTempDirectory("graft-stream-hll")
    val tp = root.resolve("docs").toString
    val t = new graft.operators.CommitTable(s, tp, "doc_id")
    def df(rows: Seq[(Long, String, String)]) = rows.toDF("doc_id", "text", "lang")
    t.overwrite(df(docs.filter(_._1 % 3 == 0)))
    t.append(df(docs.filter(_._1 % 3 == 1)))
    t.append(df(docs.filter(_._1 % 3 == 2)))
    val regT = new graft.operators.CommitTable(s, root.resolve("regs").toString, "j")
    graft.streaming.CommitLogStream.followChanges(s, t, tp, (v, cdf) => {
      val batch = cdf.filter(org.apache.spark.sql.functions.col("change_type") === "insert")
        .drop("change_type")
      val bs = graft.llm.Sketches.hllRegisters(batch)
      if (v == 0L) regT.overwrite(bs)
      else regT.overwrite(graft.llm.Sketches.mergeHllRegisters(regT.read(), bs))
    })
    // one register version per discovered commit
    assert(regT.versions() === Seq(0L, 1L, 2L))
    // the merge law through real commits: streamed register head == direct
    def regRows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
        .sortBy(x => (x._1, x._2)).toSeq
    val direct = graft.llm.Sketches.hllRegisters(df(docs))
    assert(regRows(regT.read()) === regRows(direct),
      "streamed-merged register head must equal the one-shot build row-for-row")
    // and so does the full readout (estimate + exact witness)
    assert(graft.llm.Sketches.hllWithExact(t.read(), regT.read()).collect().toSeq.map(_.toSeq)
      === graft.llm.Sketches.hllDistinctTokens(df(docs)).collect().toSeq.map(_.toSeq))
  }

  test("streaming BM25 maintenance: per-commit postings versions, head equals inline over the union") {
    val s = spark
    import s.implicits._
    val docs = (1L to 45L).map { i =>
      val words = (0 until (4 + (i % 6).toInt)).map(j => s"w${(i * 11 + j * 3) % 13}")
      (i, (if (i % 5 == 0) "rare " else "") + words.mkString(" "))
    }
    val root = java.nio.file.Files.createTempDirectory("graft-stream-bm25")
    val tp = root.resolve("docs").toString
    val t = new graft.operators.CommitTable(s, tp, "doc_id")
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    t.overwrite(df(docs.filter(_._1 % 3 == 0)))
    t.append(df(docs.filter(_._1 % 3 == 1)))
    t.append(df(docs.filter(_._1 % 3 == 2)))
    val idx = root.resolve("idx").toString
    graft.streaming.CommitLogStream.followChanges(s, t, tp, (v, cdf) => {
      val batch = cdf.filter(org.apache.spark.sql.functions.col("change_type") === "insert")
        .drop("change_type")
      if (v == 0L) graft.llm.Retrieval.buildBm25Index(batch, idx)
      else graft.llm.Retrieval.appendBm25Index(batch, idx)
    })
    val postings = new graft.operators.CommitTable(s, s"$idx/postings", "th")
    assert(postings.versions() === Seq(0L, 1L, 2L))
    val q = Seq("rare", "w0", "w5")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // no trained component: the streamed head EQUALS the inline operator
    // over the full union, bit-for-bit
    assert(rows(graft.llm.Retrieval.bm25TopKIndexed(s, idx, q, k = 45)) ===
      rows(graft.llm.Retrieval.bm25TopK(df(docs), q, k = 45)))
  }
}
