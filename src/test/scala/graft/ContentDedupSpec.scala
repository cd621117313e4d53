package graft

import graft.pipeline.{CdcPipeline, StreamSpec}
import graft.queries.CdcFixtureGen
import graft.streaming.StreamOps
import graft.tables.SnapshotTable
import org.apache.spark.sql.functions._

/** CDC content dedup (StreamSpec.dedupTextColumn → StreamOps
  * .dedupBatchMaintainingIndex inside the pipeline's foreachBatch):
  * backfill-seeding, tombstone passthrough, batch suppression and the
  * in-stream compaction tick.
  */
class ContentDedupSpec extends SparkSpec {

  /** A tiny sfDir holding only documents.parquet (doc_id 0..n-1) — all the
    * stream-docs fixture reads.
    */
  private def makeCorpus(n: Int): String = {
    val dir = tmpDir("content-dedup-corpus")
    spark.range(n).select(col("id").as("doc_id"),
        concat(lit("seed text number "), col("id")).as("text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def dataSubdirs(index: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$index/data")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSet
  }

  test("backfill Overwrite seeds the index; streamed dups suppress against every subdir class") {
    val sfDir = makeCorpus(12)
    val root = CdcFixtureGen.materializeStreamDocs(spark, sfDir)
    val target = tmpDir("content-dedup-target")
    val ckpt = tmpDir("content-dedup-ckpt")
    val index = s"${tmpDir("content-dedup-index")}/idx"
    val spec = StreamSpec(
      sourcePath = root, entityName = CdcFixtureGen.DocsEntity,
      targetLocation = target, backfillBehavior = "Overwrite",
      numBuckets = 4, changeCaptureIntervalSeconds = 0,
      checkpointLocation = Some(ckpt),
      dedupTextColumn = Some("body"), dedupIndexLocation = Some(index),
      dedupIndexCompactEvery = 3)

    // Backfill folder 1 → table replaced AND index re-initialized from its
    // live rows (data/seed), so the very first streamed batch already
    // dedups against the backfilled corpus.
    CdcFixtureGen.stampChangelog(root, CdcFixtureGen.DocsFolders.head)
    CdcPipeline.runBackfill(spark, spec)
    assert(StreamOps.bandIndexExists(spark, index))
    assert(dataSubdirs(index) === Set("seed"))

    val q = CdcPipeline.startStream(spark, spec)
    try CdcFixtureGen.DocsFolders.tail.foreach { f =>
      CdcFixtureGen.stampChangelog(root, f)
      q.processAllAvailable()
    } finally q.stop()

    // 4 streamed batches at cadence 3 → exactly one compaction after the
    // third: seed + batch-0 fold into one compact blob, batch-1/2 stay
    // protected (replay safety), batch-3 appends after the tick.
    val dirs = dataSubdirs(index)
    assert(dirs.count(_.startsWith("compact-")) === 1, dirs)
    assert(dirs.count(_.startsWith("batch-")) === 3, dirs)
    assert(!dirs.contains("seed"), dirs)

    // Planted truth for doc_id 0..11 (same algebra as the
    // q_stream_near_dup_e2e oracle).
    val ids = 0 until 12
    val expected =
      ids.filter(d => d % 7 != 0 && d % 11 != 0).map(d => (d.toLong, 1L)) ++
      ids.filter(d => d % 7 != 0 && d % 11 == 0).map(d => (d.toLong, 5L)) ++
      ids.filter(_ % 5 == 0).map(d => (2000000L + d, 2L)) ++
      ids.filter(_ % 4 == 0).map(d => (4000000L + d, 3L)) ++
      ids.filter(_ % 6 == 0).map(d => (5000000L + d, 4L)) ++
      ids.filter(_ % 9 == 0).map(d => (9000000L + d, 5L))
    val got = SnapshotTable(spark, target).read()
      .select(col("Id").cast("long"), col("versionnumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected.toSet)
  }

  test("a stream RESTART from the checkpoint continues the maintained index without self-suppression") {
    val sfDir = makeCorpus(12)
    val root = CdcFixtureGen.materializeStreamDocs(spark, sfDir)
    val target = tmpDir("content-dedup-restart-target")
    val ckpt = tmpDir("content-dedup-restart-ckpt")
    val index = s"${tmpDir("content-dedup-restart-index")}/idx"
    val spec = StreamSpec(
      sourcePath = root, entityName = CdcFixtureGen.DocsEntity,
      targetLocation = target, backfillBehavior = "Overwrite",
      numBuckets = 4, changeCaptureIntervalSeconds = 0,
      checkpointLocation = Some(ckpt),
      dedupTextColumn = Some("body"), dedupIndexLocation = Some(index),
      dedupIndexCompactEvery = 3)
    CdcFixtureGen.stampChangelog(root, CdcFixtureGen.DocsFolders.head)
    CdcPipeline.runBackfill(spark, spec)

    // first incarnation: folders 2-3, then STOP (checkpoint committed)
    val q1 = CdcPipeline.startStream(spark, spec)
    try CdcFixtureGen.DocsFolders.slice(1, 3).foreach { f =>
      CdcFixtureGen.stampChangelog(root, f)
      q1.processAllAvailable()
    } finally q1.stop()

    // second incarnation resumes from the checkpoint: batchIds continue,
    // so folder 4/5's index subdirs cannot collide with folder 2/3's, and
    // folder 5's duplicates of PRE-restart content must still suppress
    val q2 = CdcPipeline.startStream(spark, spec)
    try CdcFixtureGen.DocsFolders.slice(3, 5).foreach { f =>
      CdcFixtureGen.stampChangelog(root, f)
      q2.processAllAvailable()
    } finally q2.stop()

    val ids = 0 until 12
    val expected =
      ids.filter(d => d % 7 != 0 && d % 11 != 0).map(d => (d.toLong, 1L)) ++
      ids.filter(d => d % 7 != 0 && d % 11 == 0).map(d => (d.toLong, 5L)) ++
      ids.filter(_ % 5 == 0).map(d => (2000000L + d, 2L)) ++
      ids.filter(_ % 4 == 0).map(d => (4000000L + d, 3L)) ++
      ids.filter(_ % 6 == 0).map(d => (5000000L + d, 4L)) ++
      ids.filter(_ % 9 == 0).map(d => (9000000L + d, 5L))
    val got = SnapshotTable(spark, target).read()
      .select(col("Id").cast("long"), col("versionnumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected.toSet)
  }

  test("a delete tombstone whose body near-dups the corpus still reaches the merge") {
    val index = s"${tmpDir("content-dedup-unit")}/idx"
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    StreamOps.initBandIndex(spark, index,
      graft.ext.Dedup.MinHashParams(128, 16, 3, 42L, oph = false), Some(corpus))
    val staged = Seq(
      ("k1", "alpha beta gamma delta epsilon", false), // exact dup insert → suppressed
      ("k2", "alpha beta gamma delta epsilon", true),  // dup-bodied DELETE → must pass
      ("k3", "zeta eta theta iota kappa", false)       // fresh insert → passes
    ).toDF("arcane_merge_key", "body", "IsDelete")
    val spec = StreamSpec(sourcePath = "/x", entityName = "e", targetLocation = "/y",
      dedupTextColumn = Some("body"), dedupIndexLocation = Some(index))
    val out = CdcPipeline.contentDedupBatch(staged, spec, batchId = 7L,
        SnapshotTable(spark, s"${tmpDir("content-dedup-unit-tbl")}/absent"))
      .select("arcane_merge_key").as[String].collect().toSet
    assert(out === Set("k2", "k3"))
    // only the SURVIVING insert's bands were appended, under the batchId name
    val batchDirs = dataSubdirs(index).filter(_.startsWith("batch-"))
    assert(batchDirs === Set(f"batch-${7L}%020d"))
  }

  test("same-key exemption: a live key's UPDATE passes its own bands; a deleted key's re-insert stays suppressed") {
    val index = s"${tmpDir("content-dedup-exempt")}/idx"
    import spark.implicits._
    // index history: k1's text (k1 is LIVE in the target) and k4's text
    // (k4 was ingested then DELETED — its bands survive the tombstone, the
    // documented crawl-dedup residual)
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (4L, "omega psi chi phi upsilon")).toDF("doc_id", "text")
    StreamOps.initBandIndex(spark, index,
      graft.ext.Dedup.MinHashParams(128, 16, 3, 42L, oph = false), Some(corpus))
    val tbl = SnapshotTable(spark, s"${tmpDir("content-dedup-exempt-tbl")}/t")
    tbl.createOrReplace(
      Seq(("k1", "alpha beta gamma delta epsilon", 1L))
        .toDF("arcane_merge_key", "body", "versionnumber"),
      "arcane_merge_key", numBuckets = 4)
    val staged = Seq(
      // UPDATE of the live key with its own (identical → certain-collision)
      // text: without the exemption the version bump is silently dropped
      ("k1", "alpha beta gamma delta epsilon", false),
      // re-insert of the DELETED key's content: stays suppressed (residual)
      ("k4", "omega psi chi phi upsilon", false),
      // a NEW key duplicating live content: still suppressed — the
      // exemption is per-live-key, never a blanket pass
      ("k5", "alpha beta gamma delta epsilon", false)
    ).toDF("arcane_merge_key", "body", "IsDelete")
    val spec = StreamSpec(sourcePath = "/x", entityName = "e", targetLocation = "/y",
      dedupTextColumn = Some("body"), dedupIndexLocation = Some(index))
    val out = CdcPipeline.contentDedupBatch(staged, spec, batchId = 9L, tbl)
      .select("arcane_merge_key").as[String].collect().toSet
    assert(out === Set("k1"))
  }

  test("Overwrite backfill into a NON-EMPTY target re-initializes the index — replaced content stops suppressing") {
    // the replace path deletes the band index and re-seeds it from the
    // SAME staged frame that replaces the target, so index and target
    // cannot diverge: the old generation's bands are gone with the old
    // rows, and recycled old-generation content is novel again (it is —
    // the corpus it duplicated no longer exists anywhere)
    val sfDir = makeCorpus(12)
    val root = CdcFixtureGen.materializeStreamDocs(spark, sfDir)
    val target = tmpDir("content-dedup-ovw-target")
    val index = s"${tmpDir("content-dedup-ovw-index")}/idx"
    import spark.implicits._
    val staleText = "stale text from the replaced generation"
    StreamOps.initBandIndex(spark, index,
      graft.ext.Dedup.MinHashParams(128, 16, 3, 42L, oph = false),
      Some(Seq((99L, staleText)).toDF("doc_id", "text")))
    SnapshotTable(spark, target).createOrReplace(
      Seq(("oldk", staleText, 1L, false))
        .toDF("arcane_merge_key", "body", "versionnumber", "IsDelete"),
      "arcane_merge_key", numBuckets = 4)
    val spec = StreamSpec(
      sourcePath = root, entityName = CdcFixtureGen.DocsEntity,
      targetLocation = target, backfillBehavior = "Overwrite",
      numBuckets = 4, changeCaptureIntervalSeconds = 0,
      dedupTextColumn = Some("body"), dedupIndexLocation = Some(index))
    CdcFixtureGen.stampChangelog(root, CdcFixtureGen.DocsFolders.head)
    CdcPipeline.runBackfill(spark, spec)
    assert(dataSubdirs(index) === Set("seed"),
      "the replace must wipe every prior-generation index subdir")
    val tbl = SnapshotTable(spark, target)
    assert(tbl.read().where(col("arcane_merge_key") === "oldk").count() === 0L,
      "the old generation's rows are gone with the old table")
    // a batch reusing the REPLACED generation's content survives dedup
    val staged = Seq(("knew", staleText, false))
      .toDF("arcane_merge_key", "body", "IsDelete")
    val out = CdcPipeline.contentDedupBatch(staged, spec, batchId = 3L, tbl)
      .select("arcane_merge_key").as[String].collect().toSet
    assert(out === Set("knew"))
  }

  test("exemption under merge-on-read: an OUTSTANDING equality delete makes its key non-live") {
    // the live-key scan goes through table.read, which APPLIES outstanding
    // equality deletes — so a key tombstoned by an uncompacted MoR commit
    // is correctly non-live: its content re-insert stays suppressed (the
    // documented residual), while a genuinely live key's update is exempt.
    // Without delete application the dead key would read as live and its
    // recycled content would slip the dedup.
    val index = s"${tmpDir("content-dedup-mor")}/idx"
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "omega psi chi phi upsilon")).toDF("doc_id", "text")
    StreamOps.initBandIndex(spark, index,
      graft.ext.Dedup.MinHashParams(128, 16, 3, 42L, oph = false), Some(corpus))
    val tbl = SnapshotTable(spark, s"${tmpDir("content-dedup-mor-tbl")}/t")
    // IsDelete is part of the target schema, as the pipeline's targets
    // have it (createOrReplace keeps the staged columns)
    tbl.createOrReplace(
      Seq(("k1", "alpha beta gamma delta epsilon", 1L, false),
        ("k2", "omega psi chi phi upsilon", 1L, false))
        .toDF("arcane_merge_key", "body", "versionnumber", "IsDelete"),
      "arcane_merge_key", numBuckets = 4)
    // MoR tombstone for k1 — equality delete stays OUTSTANDING (no compact)
    tbl.mergeOnRead(
      Seq(("k1", (null: String), 2L, true))
        .toDF("arcane_merge_key", "body", "versionnumber", "IsDelete")
        .withColumn("IsDelete", col("IsDelete").cast("boolean")),
      "arcane_merge_key", "versionnumber", "IsDelete")
    assert(tbl.currentSnapshot.deletes.nonEmpty, "the delete must be outstanding, not compacted")
    val staged = Seq(
      // re-insert of the tombstoned key's own content: NOT live → suppressed
      ("k1", "alpha beta gamma delta epsilon", false),
      // update of the still-live key with its own text: exempt → survives
      ("k2", "omega psi chi phi upsilon", false)
    ).toDF("arcane_merge_key", "body", "IsDelete")
    val spec = StreamSpec(sourcePath = "/x", entityName = "e", targetLocation = "/y",
      dedupTextColumn = Some("body"), dedupIndexLocation = Some(index))
    val out = CdcPipeline.contentDedupBatch(staged, spec, batchId = 11L, tbl)
      .select("arcane_merge_key").as[String].collect().toSet
    assert(out === Set("k2"))
  }

  test("dedupRetractOnDelete: a deleted-then-reinserted key survives with the flag ON and suppresses with it OFF") {
    import spark.implicits._
    val text = "recycled content for a recycled key"
    // no target table on purpose: the same-key exemption must not mask
    // what the retraction (or its absence) decides
    def run(retract: Boolean): Set[String] = {
      val index = s"${tmpDir(s"content-dedup-retract-$retract")}/idx"
      val tbl = SnapshotTable(spark, s"${tmpDir(s"content-dedup-retract-tbl-$retract")}/t")
      val spec = StreamSpec(sourcePath = "/x", entityName = "e", targetLocation = "/y",
        dedupTextColumn = Some("body"), dedupIndexLocation = Some(index),
        dedupRetractOnDelete = retract)
      StreamOps.initBandIndex(spark, index,
        graft.ext.Dedup.MinHashParams(128, 16, 3, 42L, oph = false), storeIds = retract)
      def batch(rows: Seq[(String, String, Boolean)], id: Long): Set[String] =
        CdcPipeline.contentDedupBatch(
          rows.toDF("arcane_merge_key", "body", "IsDelete"), spec, id, tbl)
          .where(!col("IsDelete")).select("arcane_merge_key").as[String].collect().toSet
      assert(batch(Seq(("k", text, false)), 1L) === Set("k"), "first sight is novel")
      // the delete tombstone passes AND (flag on) retracts k's band rows
      assert(CdcPipeline.contentDedupBatch(
        Seq(("k", (null: String), true)).toDF("arcane_merge_key", "body", "IsDelete"),
        spec, 2L, tbl).count() === 1L)
      batch(Seq(("k", text, false)), 3L)
    }
    assert(run(true) === Set("k"),
      "with retraction the deleted key's own history must not suppress its re-insert")
    assert(run(false) === Set.empty,
      "without retraction the crawl-dedup residual stands: recycled content stays suppressed")
  }

  test("retraction removes only the dead epoch: the re-inserted content suppresses new keys again, through compaction") {
    import spark.implicits._
    val text = "content that outlives its first key"
    val index = s"${tmpDir("content-dedup-retract-epoch")}/idx"
    val tbl = SnapshotTable(spark, s"${tmpDir("content-dedup-retract-epoch-tbl")}/t")
    val spec = StreamSpec(sourcePath = "/x", entityName = "e", targetLocation = "/y",
      dedupTextColumn = Some("body"), dedupIndexLocation = Some(index),
      dedupRetractOnDelete = true)
    StreamOps.initBandIndex(spark, index,
      graft.ext.Dedup.MinHashParams(128, 16, 3, 42L, oph = false), storeIds = true)
    def batch(rows: Seq[(String, String, Boolean)], id: Long): Set[String] =
      CdcPipeline.contentDedupBatch(
        rows.toDF("arcane_merge_key", "body", "IsDelete"), spec, id, tbl)
        .where(!col("IsDelete")).select("arcane_merge_key").as[String].collect().toSet
    assert(batch(Seq(("k", text, false)), 1L) === Set("k"))
    assert(batch(Seq(("k", (null: String), true)).map(t => (t._1, t._2, t._3)), 2L) === Set.empty)
    assert(batch(Seq(("k", text, false)), 3L) === Set("k"), "retracted → novel again")
    // batch 3's survivor re-indexed the content under the LIVE epoch: a
    // brand-new key duplicating it suppresses, as plain content dedup must
    assert(batch(Seq(("j", text, false)), 4L) === Set.empty)
    // compaction folds with the tombstone anti-join applied; the live
    // epoch's rows still suppress afterward
    StreamOps.compactBandIndex(spark, index, keepRecent = 0)
    assert(batch(Seq(("m", text, false)), 5L) === Set.empty,
      "the folded blob must keep the live epoch's rows suppressing")

    // tombstone maintenance: a second delete accumulates a second
    // tombstone dir; the next compact folds them into ONE and PRUNES
    // entries that no longer retract any readable row — here BOTH die
    // (epoch-1 rows were physically dropped by the first fold, epoch-3
    // rows by this one), so the content is genuinely novel again
    assert(batch(Seq(("k", (null: String), true)).map(identity), 6L) === Set.empty)
    def tombDirCount: Int = {
      val p = new org.apache.hadoop.fs.Path(s"$index/tombstones")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0 else fs.listStatus(p).count(_.isDirectory)
    }
    assert(tombDirCount === 2, "two deleting batches = two tombstone dirs before the fold")
    StreamOps.compactBandIndex(spark, index, keepRecent = 0)
    assert(tombDirCount === 1, "the fold must collapse tombstone dirs to one")
    assert(batch(Seq(("n", text, false)), 7L) === Set("n"),
      "every epoch of the content is retracted and physically dropped — novel again")
  }

  test("StreamSpec JSON round-trips the content-dedup fields; a lone field is rejected") {
    val spec = StreamSpec.fromJson(
      """{"sourcePath":"/s","entityName":"e","targetLocation":"/t",
        |"dedupTextColumn":"body","dedupIndexLocation":"/idx","dedupIndexCompactEvery":6}""".stripMargin)
    assert(spec.dedupTextColumn === Some("body"))
    assert(spec.dedupIndexLocation === Some("/idx"))
    assert(spec.dedupIndexCompactEvery === 6)
    assertThrows[IllegalArgumentException] {
      StreamSpec.fromJson(
        """{"sourcePath":"/s","entityName":"e","targetLocation":"/t","dedupTextColumn":"body"}""")
    }
    // retraction flag round-trips, and alone (no content dedup) is rejected
    assert(StreamSpec.fromJson(
      """{"sourcePath":"/s","entityName":"e","targetLocation":"/t",
        |"dedupTextColumn":"body","dedupIndexLocation":"/idx",
        |"dedupRetractOnDelete":true}""".stripMargin).dedupRetractOnDelete)
    assertThrows[IllegalArgumentException] {
      StreamSpec.fromJson(
        """{"sourcePath":"/s","entityName":"e","targetLocation":"/t","dedupRetractOnDelete":true}""")
    }
  }
}
