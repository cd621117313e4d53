package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Streaming operator specs: event-time windows with watermarks over a
  * MemoryStream, plus unified batch semantics over the events table.
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming dedup keeps first occurrence per fingerprint within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val out = StreamOps.dedupStream(docs, "ts", watermarkDelay = "10 minutes")

    val q = out.writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "hello   world"),
        (ts("2024-01-01 10:01:00"), 2L, "Hello World"),   // same fingerprint as doc 1
        (ts("2024-01-01 10:02:00"), 3L, "different doc"))
      q.processAllAvailable()
      // later batch: another duplicate inside the watermark horizon → dropped
      input.addData((ts("2024-01-01 10:03:00"), 4L, "hello world"))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 3L), s"expected first occurrences only, got $ids")
    } finally q.stop()
  }

  test("streaming exact dedup against a stored bloom index: map-only, stateless, null-safe") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((1L, "previously crawled page"), (2L, "another known document"))
      .toDF("doc_id", "text")
    // the operational shape: index persisted by the corpus job, loaded here
    val path = tmpDir("stream-bloom") + "/corpus.bloom"
    graft.ext.ModelStore.saveBloomIndex(spark, path, graft.ext.Dedup.exactIndex(corpus))
    val idx = graft.ext.ModelStore.loadBloomIndex(spark, path)

    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val out = StreamOps.dedupStreamExact(docs, idx)
    val q = out.writeStream.format("memory").queryName("bloomdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 10L, "Previously   CRAWLED page"), // normalizes into corpus → dropped
        (ts("2024-01-01 10:00:30"), 11L, "a genuinely new page"),
        (ts("2024-01-01 10:01:00"), 12L, null.asInstanceOf[String]))   // null passes
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:05:00"), 13L, "another known document")) // later batch, same filter
      q.processAllAvailable()
      val ids = spark.table("bloomdedup").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(11L, 12L), s"expected novel + null rows only, got $ids")
    } finally q.stop()
  }

  test("streaming near-dup dedup suppresses paraphrases inside the watermark, readmits outside") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val base = "the quick brown fox jumps over the lazy dog every single morning before sunrise"
    val paraphrase = base.stripSuffix(" sunrise") // last word dropped — near-dup, not exact
    val out = StreamOps.nearDedupStream(docs, "ts", watermarkDelay = "10 minutes")

    val q = out.writeStream.format("memory").queryName("neardedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, base),
        (ts("2024-01-01 10:00:00"), 2L, "a completely unrelated piece of text about databases and storage"))
      q.processAllAvailable()
      // paraphrased LATE duplicate inside the watermark horizon → its bands
      // collide with doc 1's still-live band state → suppressed
      input.addData(
        (ts("2024-01-01 10:03:00"), 3L, paraphrase),
        (ts("2024-01-01 10:03:00"), 4L, "another fresh document discussing entirely different matters altogether"))
      q.processAllAvailable()
      // advance the watermark to 10:20: finalizes the windows above AND
      // evicts doc 1's band state (older than ts+delay)
      input.addData((ts("2024-01-01 10:30:00"), 5L, "watermark advancing filler document one"))
      q.processAllAvailable()
      val afterEvict = spark.table("neardedup").select("doc_id").as[Long].collect().toSet
      assert(afterEvict == Set(1L, 2L, 4L), s"inside-watermark paraphrase must be suppressed: $afterEvict")
      // the same paraphrase OUTSIDE the watermark (band state evicted) is
      // readmitted — near-dup suppression is horizon-scoped, not global
      input.addData((ts("2024-01-01 10:25:00"), 6L, paraphrase))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 11:00:00"), 7L, "watermark advancing filler document two"))
      q.processAllAvailable()
      val finals = spark.table("neardedup").select("doc_id").as[Long].collect().toSet
      assert(finals.contains(6L), s"outside-watermark paraphrase must survive: $finals")
      assert(!finals.contains(3L), s"suppressed doc must stay suppressed: $finals")
    } finally q.stop()
  }

  test("streaming dedup against a static corpus index suppresses paraphrases of stored docs") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog every single morning before sunrise"
    val corpus = Seq((10L, base),
      (11L, "stored reference text about columnar execution engines and their shuffle strategies"))
      .toDF("doc_id", "text")
    val index = StreamOps.corpusBandIndex(corpus)
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val out = StreamOps.dedupStreamAgainstCorpus(docs, index, "ts", watermarkDelay = "10 minutes")

    val q = out.writeStream.format("memory").queryName("corpusdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, base.stripSuffix(" sunrise")), // paraphrase of stored doc 10
        (ts("2024-01-01 10:00:00"), 2L, "a genuinely new document the corpus has never seen before today"),
        (ts("2024-01-01 10:00:00"), 3L, "")) // empty text: passes through
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:20:00"), 99L, "watermark pusher row far in the future"))
      q.processAllAvailable()
      val ids = spark.table("corpusdedup").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(2L, 3L), s"paraphrase of a stored doc must be suppressed, got $ids")
    } finally q.stop()
  }

  test("corpus dedup emits a redelivered novel doc exactly once (at-least-once sources)") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq((10L, "stored reference text about columnar execution engines and shuffles"))
      .toDF("doc_id", "text")
    val index = StreamOps.corpusBandIndex(corpus)
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val out = StreamOps.dedupStreamAgainstCorpus(docs, index, "ts", watermarkDelay = "10 minutes")

    val q = out.writeStream.format("memory").queryName("redelivery")
      .outputMode(OutputMode.Append()).start()
    try {
      // the same novel rows delivered TWICE in one batch — without
      // (id, band) collapse their band counts double past _expected and
      // the docs would be emitted zero times
      val novel = (ts("2024-01-01 10:00:00"), 1L, "a genuinely new document the corpus has never seen")
      val empty = (ts("2024-01-01 10:00:00"), 2L, "")
      input.addData(novel, empty, novel, empty)
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:20:00"), 99L, "watermark pusher row far in the future"))
      q.processAllAvailable()
      // doc 99's own window is still open (it IS the watermark frontier),
      // so only the finalized docs appear
      val ids = spark.table("redelivery").groupBy("doc_id").count()
        .as[(Long, Long)].collect().toMap
      assert(ids == Map(1L -> 1L, 2L -> 1L),
        s"each redelivered doc must surface exactly once, got $ids")
    } finally q.stop()
  }

  test("maintained band index: a two-batch stream dedups against stored bands and never re-signs batch-1 docs") {
    import graft.ext.Dedup
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("band-index-maintained")
    val params = Dedup.MinHashParams(
      numHashes = 64, numBands = 16, shingleSize = 3, seed = 42L, oph = false)
    StreamOps.initBandIndex(spark, dir, params, corpus = Some(
      Seq((10L, "stored reference text about columnar execution engines and their shuffle strategies"))
        .toDF("doc_id", "text")))
    val base = "the quick brown fox jumps over the lazy dog every single morning before sunrise"
    val fresh = "a genuinely new document the corpus has never seen before today at all"
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = docs.writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
      emitted ++= StreamOps.dedupBatchMaintainingIndex(b.drop("ts"), dir, id)
        .select("doc_id").as[Long].collect()
      ()
    }.start()
    try {
      // batch 1: one paraphrase of the SEED corpus doc (suppressed), two novel
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, base),
        (ts("2024-01-01 10:00:00"), 2L, fresh),
        (ts("2024-01-01 10:00:00"), 3L,
          "stored reference text about columnar execution engines and their shuffle"))
      q.processAllAvailable()
      assert(emitted.toSet == Set(1L, 2L), s"batch 1 emitted $emitted")
      // fingerprint batch 1's stored subdir: (name, length, mtime) of every file
      val dataDir = new java.io.File(s"$dir/data")
      val b1 = dataDir.listFiles().filter(_.getName.startsWith("batch-")).head
      def sigOf(d: java.io.File) =
        d.listFiles().map(f => (f.getName, f.length(), f.lastModified())).toSet
      val sig1 = sigOf(b1)
      // batch 2: paraphrases of BOTH batch-1 survivors (suppressed via their
      // STORED bands), one novel, one empty passthrough
      input.addData(
        (ts("2024-01-01 10:01:00"), 4L, base.stripSuffix(" sunrise")),
        (ts("2024-01-01 10:01:00"), 5L, fresh.stripSuffix(" at all")),
        (ts("2024-01-01 10:01:00"), 6L, "completely different follow-up content about something else"),
        (ts("2024-01-01 10:01:00"), 7L, ""))
      q.processAllAvailable()
      assert(emitted.toSet == Set(1L, 2L, 6L, 7L), s"batch 2 emitted $emitted")
      // THE pinned property: batch 2 consulted batch 1 through its stored
      // bands only — batch 1's subdir is byte-for-byte untouched (no
      // re-sign, no rewrite)
      assert(sigOf(b1) == sig1, "batch-1's stored bands must never be rewritten")
    } finally q.stop()
    // retry safety: replaying a batch under its OWN batchId neither
    // double-appends nor suppresses the batch against its own bands
    val replay = StreamOps.dedupBatchMaintainingIndex(
      Seq((6L, "completely different follow-up content about something else")).toDF("doc_id", "text"),
      dir, batchId = 1L)
    assert(replay.select("doc_id").as[Long].collect().toSet == Set(6L),
      "a replayed batch must re-emit its own survivors")
    // default compaction PROTECTS the newest batches: the latest
    // uncommitted batch can replay after a crash, and absorbing its
    // subdir would make that replay self-suppress
    StreamOps.compactBandIndex(spark, dir)
    def dirNames() = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirNames().count(_.startsWith("batch-")) == 2,
      s"default compaction must keep the newest batches unabsorbed: ${dirNames()}")
    val replay2 = StreamOps.dedupBatchMaintainingIndex(
      Seq((6L, "completely different follow-up content about something else")).toDF("doc_id", "text"),
      dir, batchId = 1L)
    assert(replay2.select("doc_id").as[Long].collect().toSet == Set(6L),
      "replay after default compaction must still re-emit its own survivors")
    // a FULL fold (keepRecent = 0 — paused/committed stream) preserves
    // every dedup decision
    StreamOps.compactBandIndex(spark, dir, keepRecent = 0)
    assert(dirNames().size == 1, s"full fold must leave one compacted dir: ${dirNames()}")
    val afterCompact = StreamOps.dedupBatchMaintainingIndex(
      Seq((8L, base), (9L, "still never seen content arriving after compaction"))
        .toDF("doc_id", "text"),
      dir, batchId = 99L)
    assert(afterCompact.select("doc_id").as[Long].collect().toSet == Set(9L),
      "post-compaction the index must still suppress stored near-dups")
  }

  test("stream-static broadcast join enriches a stream with a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "tier")
    val enriched = input.toDF().toDF("ts", "event_id", "cust_id")
      .join(broadcast(dim), Seq("cust_id"), "left")
    val q = enriched.writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 100L, 1L),
        (ts("2024-01-01 10:00:01"), 101L, 2L),
        (ts("2024-01-01 10:00:02"), 102L, 3L)) // no dim row → NULL tier
      q.processAllAvailable()
      val rows = spark.table("enrich").select("event_id", "tier")
        .as[(Long, Option[String])].collect().toMap
      assert(rows == Map(100L -> Some("gold"), 101L -> Some("silver"), 102L -> None))
    } finally q.stop()
  }

  test("media decode composes with Structured Streaming: AVI frame sampling per micro-batch") {
    import graft.ext.Multimodal
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    // plant a deterministic AVI per streamed id, then demux it — the same
    // mapPartitions plumbing the batch path uses must run incrementally,
    // emitting each micro-batch's frames in append mode with no state
    val vids = Multimodal.syntheticVideos(input.toDF().toDF("doc_id"), "doc_id") { id =>
      ((16 + id % 8).toInt, 16, (2 + id % 3).toInt, 10)
    }
    val frames = Multimodal.sampleVideoFrames(vids, "id", "content", everyN = 1)
    val q = frames.writeStream.format("memory").queryName("vframes")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(1L, 2L)
      q.processAllAvailable()
      val afterBatch1 = spark.table("vframes").count()
      // ids 1,2 → 2+(1%3)=3 and 2+(2%3)=4 frames
      assert(afterBatch1 === 3 + 4, s"batch-1 frames: $afterBatch1")
      input.addData(3L)
      q.processAllAvailable()
      val rows = spark.table("vframes")
        .select("id", "frame_index", "width", "height", "n_frames")
        .as[(Long, Int, Int, Int, Int)].collect()
      assert(rows.length === 3 + 4 + 2) // id 3 → 2 frames
      rows.foreach { case (id, fi, w, h, nf) =>
        assert(w === (16 + id % 8).toInt && h === 16, s"decoded dims of $id")
        assert(nf === (2 + id % 3).toInt && fi < nf, s"frame count of $id")
      }
    } finally q.stop()
  }

  test("funnel interval join emits in-window pairs stream-stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long, String)]
    val ev = input.toDF().toDF("ts", "event_id", "user_id", "event_type")
    val out = StreamOps.funnelPairs(ev, fromType = "click", toType = "purchase",
      maxSpan = "30 minutes", watermarkDelay = "10 minutes")

    val q = out.writeStream.format("memory").queryName("funnel").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 7L, "click"),
        (ts("2024-01-01 10:10:00"), 2L, 7L, "purchase"), // in window → pair
        (ts("2024-01-01 11:30:00"), 3L, 7L, "purchase"), // 90 min later → out of window
        (ts("2024-01-01 10:05:00"), 4L, 8L, "purchase")) // no prior click
      q.processAllAvailable()
      val pairs = spark.table("funnel")
        .select("user_id", "from_id", "to_id").as[(Long, Long, Long)].collect().toSet
      assert(pairs == Set((7L, 1L, 2L)), s"got $pairs")
    } finally q.stop()
  }

  test("last-touch attribution picks the most recent in-window source, streamed with finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long, String)]
    val ev = input.toDF().toDF("ts", "event_id", "user_id", "event_type")
    val out = StreamOps.lastTouchAttribution(ev, fromType = "view", toType = "purchase",
      maxSpan = "30 minutes", watermarkDelay = "10 minutes", windowSize = "1 hour")

    val q = out.writeStream.format("memory").queryName("attrib").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 7L, "view"),
        (ts("2024-01-01 10:05:00"), 2L, 7L, "view"),     // most recent → attributed
        (ts("2024-01-01 10:10:00"), 3L, 7L, "purchase"), // 2 candidates
        (ts("2024-01-01 09:00:00"), 4L, 8L, "view"),
        (ts("2024-01-01 10:02:00"), 5L, 8L, "purchase")) // view 62 min earlier → unattributed
      q.processAllAvailable()
      // Advance both sides' watermarks past window close + join horizon
      // so the 10:00-11:00 argmax window finalizes (two batches: eviction
      // runs on the batch after the watermark update).
      input.addData(
        (ts("2024-01-01 13:00:00"), 6L, 99L, "view"),
        (ts("2024-01-01 13:01:00"), 7L, 99L, "purchase"))
      q.processAllAvailable()
      input.addData(
        (ts("2024-01-01 15:00:00"), 8L, 98L, "view"),
        (ts("2024-01-01 15:01:00"), 9L, 98L, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("attrib")
        .select("to_id", "user_id", "from_id", "n_candidates")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(rows.contains((3L, 7L, 2L, 2L)), s"got $rows")          // argmax + count
      assert(!rows.exists(_._1 == 5L), s"unattributed purchase leaked: $rows")
    } finally q.stop()
  }

  test("left-outer funnel emits abandoned starts after the watermark closes their window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long, String)]
    val ev = input.toDF().toDF("ts", "event_id", "user_id", "event_type")
    val out = StreamOps.funnelWithAbandoned(ev, fromType = "click", toType = "purchase",
      maxSpan = "30 minutes", watermarkDelay = "10 minutes")

    val q = out.writeStream.format("memory").queryName("funnel_lo").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 7L, "click"),    // converts
        (ts("2024-01-01 10:10:00"), 2L, 7L, "purchase"),
        (ts("2024-01-01 10:00:00"), 3L, 8L, "click"))    // never converts
      q.processAllAvailable()
      // the global watermark is the MIN across both sides, and each side
      // only advances on events it actually sees (clicks / purchases), so
      // BOTH types must move forward before user 8's click at 10:00 ages
      // past from_ts + 30min span; two batches because eviction happens
      // on the batch AFTER the watermark update. The later clicks pair
      // up immediately so the expected set stays closed.
      input.addData(
        (ts("2024-01-01 12:00:00"), 9L, 99L, "click"),
        (ts("2024-01-01 12:10:00"), 10L, 99L, "purchase"))
      q.processAllAvailable()
      input.addData(
        (ts("2024-01-01 13:00:00"), 11L, 98L, "click"),
        (ts("2024-01-01 13:05:00"), 12L, 98L, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("funnel_lo")
        .select("user_id", "from_id", "to_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(rows == Set((7L, 1L, 2L), (8L, 3L, -1L), (99L, 9L, 10L), (98L, 11L, 12L)), s"got $rows")
    } finally q.stop()
  }

  test("funnel conversion-rate windows emit finalized started/converted/rate per window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long, String)]
    val ev = input.toDF().toDF("ts", "event_id", "user_id", "event_type")
    val out = StreamOps.funnelRates(ev, fromType = "click", toType = "purchase",
      maxSpan = "30 minutes", watermarkDelay = "10 minutes", windowDuration = "1 hour")

    val q = out.writeStream.format("memory").queryName("funnel_rates")
      .outputMode(OutputMode.Append()).start()
    try {
      // 10:00 window: 3 starts — user 7 converts (twice, must count ONCE),
      // user 8 abandons, user 9 converts once
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, 7L, "click"),
        (ts("2024-01-01 10:05:00"), 2L, 7L, "purchase"),
        (ts("2024-01-01 10:10:00"), 3L, 7L, "purchase"),
        (ts("2024-01-01 10:00:00"), 4L, 8L, "click"),
        (ts("2024-01-01 10:20:00"), 5L, 9L, "click"),
        (ts("2024-01-01 10:40:00"), 6L, 9L, "purchase"))
      q.processAllAvailable()
      // advance BOTH sides' watermarks past window close + join horizon;
      // two batches because eviction runs the batch after the update
      input.addData(
        (ts("2024-01-01 13:00:00"), 90L, 99L, "click"),
        (ts("2024-01-01 13:01:00"), 91L, 99L, "purchase"))
      q.processAllAvailable()
      input.addData(
        (ts("2024-01-01 15:00:00"), 92L, 98L, "click"),
        (ts("2024-01-01 15:01:00"), 93L, 98L, "purchase"))
      q.processAllAvailable()
      val rows = spark.table("funnel_rates")
        .select(col("window_start").cast("string"), col("started"), col("converted"),
          col("conversion_rate"))
        .as[(String, Long, Long, Double)].collect()
        .map { case (w, s, c, r) => (w, (s, c, r)) }.toMap
      assert(rows("2024-01-01 10:00:00") == ((3L, 2L, 2.0 / 3.0)),
        s"10:00 window wrong: ${rows.get("2024-01-01 10:00:00")}")
    } finally q.stop()
  }

  test("transitionCounts: per-user consecutive pairs, same-ts tiebreak, row permille") {
    // User 1: a(t1,id1) -> b(t2,id2) -> b(t2,id3) -> c(t3,id4): same-ts
    // pair ordered by event_id. User 2: a(t1,id5) -> c(t2,id6). No
    // cross-user pairs.
    def ts(s: Long) = new Timestamp(s * 1000)
    val ev = Seq(
      (1L, ts(1), 1L, "a"), (2L, ts(2), 1L, "b"), (3L, ts(2), 1L, "b"),
      (4L, ts(3), 1L, "c"), (5L, ts(1), 2L, "a"), (6L, ts(2), 2L, "c")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val r = StreamOps.transitionCounts(ev)
      .select("from_type", "to_type", "n", "row_total", "prob_permille")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(r == Set(
      ("a", "b", 1L, 2L, 500L), // from 'a': one ->b, one ->c
      ("a", "c", 1L, 2L, 500L),
      ("b", "b", 1L, 2L, 500L), // from 'b': same-ts id2->id3, then ->c
      ("b", "c", 1L, 2L, 500L)))
  }

  test("tumbling window agg over a stream emits finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")

    val out = StreamOps.windowedAgg(
      events, "ts", watermarkDelay = "10 minutes", windowDuration = "1 hour",
      keys = Seq(col("user_id")),
      aggs = Seq(count(lit(1)).as("n"), sum(col("value")).as("total")))

    val q = out.writeStream.format("memory").queryName("wins").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), 1L, 1.0),
        (ts("2024-01-01 10:20:00"), 1L, 2.0),
        (ts("2024-01-01 10:30:00"), 2L, 5.0))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window → it finalizes
      input.addData((ts("2024-01-01 12:00:00"), 1L, 0.5))
      q.processAllAvailable()
      val rows = spark.table("wins")
        .select(col("window.start").cast("string"), col("user_id"), col("n"), col("total"))
        .as[(String, Long, Long, Double)].collect().toSet
      assert(rows.contains(("2024-01-01 10:00:00", 1L, 2L, 3.0)))
      assert(rows.contains(("2024-01-01 10:00:00", 2L, 1L, 5.0)))
    } finally q.stop()
  }

  test("windowed top-k over a stream: later rows displace earlier ones until the window closes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Long, Double)]
    val events = input.toDF().toDF("ts", "event_id", "user_id", "value")
    val out = StreamOps.windowedTopK(events, "ts", watermarkDelay = "10 minutes",
      windowDuration = "1 hour", keyCols = Seq("user_id"),
      orderCols = Seq("value", "event_id"), k = 2)
    val q = out.writeStream.format("memory").queryName("wtopk").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), 1L, 7L, 1.0),
        (ts("2024-01-01 10:10:00"), 2L, 7L, 5.0),
        (ts("2024-01-01 10:15:00"), 3L, 7L, 3.0))
      q.processAllAvailable()
      // a LATE larger row inside the same open window must displace the
      // current #2 (value 3.0) before anything is emitted
      input.addData((ts("2024-01-01 10:20:00"), 4L, 7L, 9.0))
      q.processAllAvailable()
      assert(spark.table("wtopk").count() == 0, "nothing emits before the window closes")
      input.addData((ts("2024-01-01 12:00:00"), 5L, 8L, 1.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("wtopk").select("user_id", "event_id", "value")
        .as[(Long, Long, Double)].collect().toSet
      assert(rows == Set((7L, 4L, 9.0), (7L, 2L, 5.0)), s"top-2 after displacement: $rows")
    } finally q.stop()
  }

  test("windowedUniformSample: replayable hash reservoir == batch replay, arrival-order-free") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "event_id", "value")
    val out = StreamOps.windowedUniformSample(events, "ts",
      watermarkDelay = "10 minutes", windowDuration = "1 hour", idCol = "event_id", k = 3)
    val q = out.writeStream.format("memory").queryName("wsample").outputMode(OutputMode.Append()).start()
    try {
      // 8 rows in the 10:00 window, delivered in two scrambled batches.
      val rows = Seq(5L, 2L, 7L, 1L).map(id => (ts("2024-01-01 10:05:00"), id, id * 1.0)) ++
        Seq(8L, 3L, 6L, 4L).map(id => (ts("2024-01-01 10:40:00"), id, id * 1.0))
      input.addData(rows.take(4): _*)
      q.processAllAvailable()
      input.addData(rows.drop(4): _*)
      q.processAllAvailable()
      input.addData((ts("2024-01-01 12:00:00"), 99L, 0.0)) // advance watermark
      q.processAllAvailable()
      val got = spark.table("wsample").select("event_id").as[Long].collect().toSet
      // Batch replay: the 3 smallest replayable hashes among ids 1..8.
      val expected = (1L to 8L).map(id => (Math.floorMod(id * 2654435761L, 4294967296L), id))
        .sorted.take(3).map(_._2).toSet
      assert(got == expected, s"got $got expected $expected")
    } finally q.stop()
  }

  test("session window agg closes on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Double)]
    val events = input.toDF().toDF("ts", "user_id", "value")

    val out = StreamOps.sessionWindowAgg(
      events, "ts", watermarkDelay = "5 minutes", gapDuration = "30 minutes",
      keys = Seq(col("user_id")),
      aggs = Seq(count(lit(1)).as("n")))

    val q = out.writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 09:00:00"), 7L, 1.0),
        (ts("2024-01-01 09:10:00"), 7L, 1.0), // same session (gap < 30m)
        (ts("2024-01-01 11:00:00"), 7L, 1.0)) // new session
      q.processAllAvailable()
      input.addData((ts("2024-01-01 13:00:00"), 7L, 1.0)) // advance watermark
      q.processAllAvailable()
      val sessions = spark.table("sessions")
        .select(col("session_window.start").cast("string"), col("n"))
        .as[(String, Long)].collect().toSet
      assert(sessions.contains(("2024-01-01 09:00:00", 2L)))
      assert(sessions.contains(("2024-01-01 11:00:00", 1L)))
    } finally q.stop()
  }

  test("session window: an event at EXACTLY prev + gap still MERGES (spans are closed, break is strict >)") {
    // batch mode (unified semantics) — Spark's session spans are
    // [start, last + gap] and an event landing ON the current end
    // extends the session; only a strictly later event opens a new one.
    // This boundary is what the q_session_window oracle's STRICT
    // `diff > gap` break condition encodes.
    val events = Seq(
      (ts("2024-01-01 09:00:00"), 1L, 1.0),
      (ts("2024-01-01 09:30:00"), 1L, 1.0), // exactly 30m later → merges (on the end)
      (ts("2024-01-01 10:00:01"), 1L, 1.0)  // 30m01s after prev → NEW session
    ).toDF("ts", "user_id", "value")
    val out = StreamOps.sessionWindowAgg(
      events, "ts", "0 seconds", "30 minutes",
      keys = Seq(col("user_id")),
      aggs = Seq(count(lit(1)).as("n")))
      .select(col("session_window.start").cast("string"),
        col("session_window.end").cast("string"), col("n"))
      .as[(String, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("2024-01-01 09:00:00", "2024-01-01 10:00:00", 2L),
      ("2024-01-01 10:00:01", "2024-01-01 10:30:01", 1L)))
  }

  test("flatMapGroupsWithState emits closed bursts on event-time idle gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.Event]
    val out = StreamOps.idleSessionBursts(input.toDS(), idleGapMs = 60000) // 1 min gap

    val q = out.writeStream.format("memory").queryName("bursts").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        StreamOps.Event(1L, ts("2024-01-01 10:00:00"), 42L, "click", 2.0),
        StreamOps.Event(2L, ts("2024-01-01 10:00:10"), 42L, "click", 3.0))
      q.processAllAvailable()
      // another user's event far in the future advances the watermark past
      // 42's idle deadline (10:01:10) → 42's burst flushes on this batch
      input.addData(StreamOps.Event(3L, ts("2024-01-01 10:30:00"), 99L, "view", 1.0))
      q.processAllAvailable()
      input.addData(StreamOps.Event(4L, ts("2024-01-01 10:31:00"), 99L, "view", 1.0))
      q.processAllAvailable()
      val bursts = spark.table("bursts").as[StreamOps.ClosedBurst].collect()
      assert(bursts.exists(b => b.user_id == 42L && b.n == 2L && b.total == 5.0))
    } finally q.stop()
  }

  test("windowed agg has unified batch semantics on the events table") {
    // events.parquet has shipped with ts as both TIMESTAMP(NANOS) and
    // TIMESTAMP(MICROS) — Queries.events adapts to the file's actual type
    val ev = graft.queries.Queries.events(spark, sf())
    val out = StreamOps.windowedAgg(
      ev, "ts", watermarkDelay = "1 hour", windowDuration = "1 day",
      keys = Seq(col("event_type")),
      aggs = Seq(count(lit(1)).as("n")))
    val total = out.agg(sum("n")).head().getLong(0)
    assert(total == ev.count()) // every event lands in exactly one window
  }

  test("a band-index compaction tick right after the FIRST batch is a safe no-op") {
    // compactEvery=1 fires the tick after batch 0, when the index holds
    // only the seed and batch-0's subdir: keep-recent protects batch-0,
    // leaving a single foldable subdir — the tick must no-op (not fold
    // the seed alone, not absorb the replayable batch) and the index must
    // keep deduping
    import spark.implicits._
    val dir = s"${tmpDir("band-first-tick")}/idx"
    val base = "alpha beta gamma delta epsilon zeta"
    StreamOps.initBandIndex(spark, dir,
      graft.ext.Dedup.MinHashParams(128, 16, 3, 42L, oph = false),
      Some(Seq((1L, base)).toDF("doc_id", "text")))
    StreamOps.dedupBatchMaintainingIndex(
      Seq((2L, "totally fresh first-batch content here")).toDF("doc_id", "text"),
      dir, batchId = 0L)
    def dirNames() = new java.io.File(s"$dir/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val before = dirNames()
    StreamOps.compactBandIndex(spark, dir)
    assert(dirNames() === before, s"the first-batch tick must be a no-op: ${dirNames()}")
    // replay of batch 0 stays safe, and both indexed texts still suppress
    val replay = StreamOps.dedupBatchMaintainingIndex(
      Seq((2L, "totally fresh first-batch content here")).toDF("doc_id", "text"),
      dir, batchId = 0L)
    assert(replay.select("doc_id").as[Long].collect().toSet === Set(2L))
    val next = StreamOps.dedupBatchMaintainingIndex(
      Seq((3L, base), (4L, "totally fresh first-batch content here"),
        (5L, "genuinely novel second-batch content instead")).toDF("doc_id", "text"),
      dir, batchId = 1L)
    assert(next.select("doc_id").as[Long].collect().toSet === Set(5L))
  }
}
