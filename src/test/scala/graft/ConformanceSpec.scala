package graft

import graft.pipeline.{CdcPipeline, StreamSpec}
import graft.tables.SnapshotTable
import org.apache.spark.sql.functions._

import java.time.{OffsetDateTime, ZoneOffset}

/** Replays the reference's single end-to-end integration scenario
  * (`/root/reference/src/test/scala/integration/StreamRunner.scala:176-234`)
  * on local filesystem + the SnapshotTable sink:
  *
  *  1. backfill 2 folders (changelog stamped on the first) → 5 rows,
  *     watermark = folder(-1h);
  *  2. stream 3 more folders — (+delete of id1, +upsert file), (+delete
  *     replay), (no-op replays, changelog stamped) →
  *     rows = 5 − 1 + 2 = 6; id1 absent; id2.versionnumber = 2111000012;
  *     watermark = folder(-5min).
  */
class ConformanceSpec extends SparkSpec {

  private val now = OffsetDateTime.of(2026, 1, 2, 12, 0, 0, 0, ZoneOffset.UTC)

  test("reference conformance under mergeMode=merge-on-read: same end state, no bucket rewrites") {
    val root = tmpDir("cdm-mor-src")
    val target = tmpDir("cdm-mor-target")
    CdmFixture.initRoot(root)
    val wmFolder = CdmFixture.uploadBatch(root, now.minusHours(1), updateChangelog = true, chunkSeed = 1)
    CdmFixture.uploadBatch(root, now.minusHours(2), chunkSeed = 2)
    val icebergDir = tmpDir("cdm-mor-iceberg")
    val spec = StreamSpec(
      sourcePath = root,
      entityName = CdmFixture.entityName,
      targetLocation = target,
      backfillBehavior = "Overwrite",
      numBuckets = 4,
      changeCaptureIntervalSeconds = 1,
      mergeMode = "merge-on-read",
      // per-commit Iceberg export on a MoR stream: outstanding equality
      // deletes ride along as content=1 manifests (no compaction gate)
      icebergExportDir = Some(icebergDir)
    )
    CdcPipeline.runBackfill(spark, spec)
    val table = SnapshotTable(spark, target)
    assert(table.read().count() === 5)
    assert(table.properties(SnapshotTable.PropWatermark) === wmFolder)
    val backfilled = table.currentSnapshot.files.map(_.path).toSet
    val vBackfill = table.currentSnapshot.version
    // materialized reporting aggregate at the backfill point — refreshed
    // incrementally at the end of the streamed window (deltas telescope
    // across however many merges the stream committed)
    val aggAtBackfill = graft.ext.IncrementalAgg.full(
      table.read(), Seq("dataareaid"), Seq("versionnumber"))
      .collect() // pin the state NOW (the lazy plan would re-read post-stream files)

    CdmFixture.uploadBatch(root, now.minusMinutes(45), addDelete = true, addUpsert = true, chunkSeed = 3)
    CdmFixture.uploadBatch(root, now.minusMinutes(30), addDelete = true, chunkSeed = 4)
    val lastFolder = CdmFixture.uploadBatch(root, now.minusMinutes(5), chunkSeed = 5)
    CdmFixture.stampChangelog(root, lastFolder)
    val query = CdcPipeline.startStream(spark, spec)
    try query.processAllAvailable()
    finally query.stop()

    val result = table.read()
    assert(result.count() === 6, "5 backfilled - 1 deleted + 2 inserted = 6")
    assert(result.where(col("Id") === CdmFixture.id1).count() === 0, "deleted Id must be gone")
    val v = result.where(col("Id") === CdmFixture.id2).select("versionnumber").head().getLong(0)
    assert(v === 2111000012L, "updated Id must carry the max versionnumber")
    assert(table.properties(SnapshotTable.PropWatermark) === lastFolder)
    // the merge-on-read pin: every backfilled data file survived verbatim
    // (streamed merges appended winners + delete keys, rewrote nothing)
    val snap = table.currentSnapshot
    assert(backfilled.subsetOf(snap.files.map(_.path).toSet),
      "streamed merge-on-read commits must not rewrite backfill files")
    assert(snap.deletes.nonEmpty, "the streamed delete/upsert must have produced delete files")

    // the STREAM exported per commit WITH the deletes outstanding: an
    // external Iceberg v2 reader (readLiveRows applies the content=1
    // equality-delete manifest by sequence number) sees exactly read(),
    // and the export history advanced past the backfill snapshot
    val icebergFs = new org.apache.hadoop.fs.Path(icebergDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.tables.IcebergExport
      .readVersionHint(icebergFs, new org.apache.hadoop.fs.Path(icebergDir)).toInt > 1,
      "per-commit export must append history for each streamed commit")
    val viaIceberg = graft.tables.IcebergExport.readLiveRows(spark, icebergDir, table.schema)
    val cmpCols = result.columns.sorted.toIndexedSeq.map(col)
    assert(viaIceberg.select(cmpCols: _*).except(result.select(cmpCols: _*)).isEmpty &&
      result.select(cmpCols: _*).except(viaIceberg.select(cmpCols: _*)).isEmpty,
      "Iceberg merge-on-read view (deletes applied) must match SnapshotTable.read() exactly")

    // incremental aggregate maintenance across the WHOLE streamed window:
    // one refresh from the pinned backfill state over changesBetween
    // (vBackfill → head) must equal a full recompute of the live table —
    // the reporting-layer flow after a night of streamed merges
    val prevState = spark.createDataFrame(
      spark.sparkContext.parallelize(aggAtBackfill.toSeq),
      graft.ext.IncrementalAgg.full(table.read(), Seq("dataareaid"), Seq("versionnumber")).schema)
    val refreshed = graft.ext.IncrementalAgg.refresh(
      prevState, table, vBackfill, snap.version, Seq("dataareaid"), Seq("versionnumber"))
      .select(col("dataareaid"), col("n"), col("sum_versionnumber").cast("double"))
      .collect().map(_.toString).sorted.toSeq
    val recomputed = graft.ext.IncrementalAgg.full(
      table.read(), Seq("dataareaid"), Seq("versionnumber"))
      .select(col("dataareaid"), col("n"), col("sum_versionnumber").cast("double"))
      .collect().map(_.toString).sorted.toSeq
    assert(refreshed === recomputed, "incremental refresh must equal full recompute after streaming")
    // maintenance compaction absorbs the deletes without changing a row
    val beforeCompact = result.orderBy("Id").collect().map(_.toString).toSeq
    table.compact(fileSizeThresholdBytes = Long.MaxValue)
    assert(table.currentSnapshot.deletes.isEmpty)
    assert(table.read().orderBy("Id").collect().map(_.toString).toSeq === beforeCompact)
    // exportDir + merge-on-read is rejected when a STREAM starts (the
    // combination is legal on a maintenanceRun spec, which exports after
    // compaction — so the spec itself must construct)
    val withExport = spec.copy(exportDir = Some(tmpDir("cdm-mor-exp")))
    val ex = intercept[IllegalArgumentException] {
      CdcPipeline.startStream(spark, withExport)
    }
    assert(ex.getMessage.contains("merge-on-read"))
  }

  test("reference conformance: backfill then stream-merge") {
    val root = tmpDir("cdm-e2e-src")
    val target = tmpDir("cdm-e2e-target")
    CdmFixture.initRoot(root)

    // --- backfill: two folders, changelog stamped on the first (-1h) ------
    val wmFolder = CdmFixture.uploadBatch(root, now.minusHours(1), updateChangelog = true, chunkSeed = 1)
    CdmFixture.uploadBatch(root, now.minusHours(2), chunkSeed = 2)

    val exportDir = tmpDir("cdm-e2e-export")
    val icebergDir = tmpDir("cdm-e2e-iceberg")
    val deltaDir = tmpDir("cdm-e2e-delta") + "/log"
    val spec = StreamSpec(
      sourcePath = root,
      entityName = CdmFixture.entityName,
      targetLocation = target,
      backfillBehavior = "Overwrite",
      numBuckets = 4,
      changeCaptureIntervalSeconds = 1,
      exportDir = Some(exportDir),
      icebergExportDir = Some(icebergDir),
      deltaExportDir = Some(deltaDir)
    )
    CdcPipeline.runBackfill(spark, spec)

    val table = SnapshotTable(spark, target)
    assert(table.read().count() === 5)
    assert(table.properties(SnapshotTable.PropWatermark) === wmFolder)
    // export-on-commit: the external view tracks the backfill commit
    assert(spark.read.parquet(s"$exportDir/data").count() === 5)
    // and so does the Iceberg chain
    val icebergFs = new org.apache.hadoop.fs.Path(icebergDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(graft.tables.IcebergExport
      .readDataFiles(icebergFs, new org.apache.hadoop.fs.Path(icebergDir))
      .map(_._2).sum === 5L)
    val backfillSnapId = table.currentSnapshot.version + 1 // exported snapshot id of the backfill

    // --- streaming: three folders --------------------------------------
    CdmFixture.uploadBatch(root, now.minusMinutes(45), addDelete = true, addUpsert = true, chunkSeed = 3)
    CdmFixture.uploadBatch(root, now.minusMinutes(30), addDelete = true, chunkSeed = 4)
    val lastFolder = CdmFixture.uploadBatch(root, now.minusMinutes(5), chunkSeed = 5)
    CdmFixture.stampChangelog(root, lastFolder)

    val query = CdcPipeline.startStream(spark, spec)
    try query.processAllAvailable()
    finally query.stop()

    val result = table.read()
    assert(result.count() === 6, "5 backfilled - 1 deleted + 2 inserted = 6")
    assert(result.where(col("Id") === CdmFixture.id1).count() === 0, "deleted Id must be gone")
    val v = result.where(col("Id") === CdmFixture.id2).select("versionnumber").head().getLong(0)
    assert(v === 2111000012L, "updated Id must carry the max versionnumber")
    assert(table.properties(SnapshotTable.PropWatermark) === lastFolder)

    // export-on-commit after the streamed merges: a plain parquet glob of
    // the export dir (what an external engine reads) equals the live table
    // row-for-row — every commit re-exported, dead files excluded.
    val exported = spark.read.parquet(s"$exportDir/data")
    assert(exported.count() === 6)
    val cols = result.columns.sorted.toIndexedSeq.map(col)
    assert(exported.select(cols: _*).except(result.select(cols: _*)).isEmpty &&
      result.select(cols: _*).except(exported.select(cols: _*)).isEmpty,
      "export view must match SnapshotTable.read() exactly")

    // Iceberg export after the streamed merges: the chain's HEAD equals the
    // live table, and the history grew past the backfill snapshot (one
    // entry per commit, so external readers can time-travel the stream)
    val icebergHead = graft.tables.IcebergExport
      .readDataFiles(icebergFs, new org.apache.hadoop.fs.Path(icebergDir))
    assert(icebergHead.map(_._2).sum === 6L)
    val viaIceberg = spark.read.schema(table.schema).parquet(icebergHead.map(_._1): _*)
    assert(viaIceberg.select(cols: _*).except(result.select(cols: _*)).isEmpty &&
      result.select(cols: _*).except(viaIceberg.select(cols: _*)).isEmpty,
      "Iceberg-chain view must match SnapshotTable.read() exactly")
    assert(graft.tables.IcebergExport
      .readVersionHint(icebergFs, new org.apache.hadoop.fs.Path(icebergDir)).toInt > 1,
      "streamed commits must append export history, not rewrite v1")
    // time travel ACROSS streamed commits: the backfill snapshot, addressed
    // by its exported id, still resolves to the pre-stream state while the
    // head carries the streamed merges — both states readable at once
    assert(graft.tables.IcebergExport
      .readDataFiles(icebergFs, new org.apache.hadoop.fs.Path(icebergDir), Some(backfillSnapId))
      .map(_._2).sum === 5L,
      "export history must time-travel to the backfill state after streamed commits")

    // Delta export after the streamed merges: log replay equals the live
    // table, the log grew one version per commit (time-travelable), and
    // v0 still replays the backfill state
    val deltaPath = new org.apache.hadoop.fs.Path(deltaDir)
    val viaDelta = graft.tables.DeltaExport.readTable(spark, deltaPath)
    assert(viaDelta.select(cols: _*).except(result.select(cols: _*)).isEmpty &&
      result.select(cols: _*).except(viaDelta.select(cols: _*)).isEmpty,
      "Delta-log view must match SnapshotTable.read() exactly")
    val deltaVersions = graft.tables.DeltaExport.logVersions(icebergFs, deltaPath)
    assert(deltaVersions.head == 0L && deltaVersions.size > 1,
      s"streamed commits must append Delta versions, got $deltaVersions")
    assert(graft.tables.DeltaExport.readTable(spark, deltaPath, at = Some(0L)).count() === 5,
      "Delta v0 must time-travel to the backfill state")

    // MoR stream + SYMLINK exportDir is still refused up front (a symlink
    // manifest has no row-level-delete representation at all). The Delta
    // leg is no longer refused: outstanding equality deletes export as
    // protocol deletion vectors — pinned end to end by q_export_delta_mor
    // and DeltaDvSpec.
    val bad = spec.copy(mergeMode = "merge-on-read",
      exportDir = Some(tmpDir("cdm-mor-symlink")),
      icebergExportDir = None, deltaExportDir = None)
    val err = intercept[IllegalArgumentException](CdcPipeline.startStream(spark, bad))
    assert(err.getMessage.contains("exportDir"))
  }

  test("three entity streams run concurrently in one session: per-stream checkpoints, independent watermarks") {
    // The reference runs ONE entity per pod (CRD-scoped app instance); the
    // Spark rebuild multiplexes N entity streams of one export in a single
    // session — shared scheduler, separate targets/checkpoints. Content is
    // entity-prefixed (displayvalue = "<entity>-..."), so any cross-entity
    // leak in listing, parsing or merge shows up as a wrong prefix.
    val root = tmpDir("cdm-multi-src")
    val names = Seq("entity_a", "entity_b", "entity_c")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "model.json"),
      CdmFixture.modelJsonFor(names).getBytes("UTF-8"))

    val f1 = CdmFixture.uploadBatchEntities(root, now.minusHours(2), names,
      updateChangelog = true, chunkSeed = 1)
    val specs = names.map { en =>
      StreamSpec(
        sourcePath = root,
        entityName = en,
        targetLocation = tmpDir(s"cdm-multi-target-$en"),
        backfillBehavior = "Overwrite",
        numBuckets = 4,
        changeCaptureIntervalSeconds = 1,
        checkpointLocation = Some(tmpDir(s"cdm-multi-ckpt-$en")))
    }
    specs.foreach(s => CdcPipeline.runBackfill(spark, s))
    specs.foreach { s =>
      val tb = SnapshotTable(spark, s.targetLocation)
      assert(tb.read().count() === 5, s"${s.entityName} backfill")
      assert(tb.properties(SnapshotTable.PropWatermark) === f1)
      assert(tb.read().where(!col("displayvalue").startsWith(s.entityName)).count() === 0,
        s"${s.entityName} must only hold its own entity's rows")
    }

    // folder 2: delete id1 + upsert id2 for EVERY entity, then run all
    // three streams CONCURRENTLY against the shared export
    val f2 = CdmFixture.uploadBatchEntities(root, now.minusHours(1), names,
      addDelete = true, addUpsert = true, updateChangelog = true, chunkSeed = 2)
    val queries = specs.map(s => CdcPipeline.startStream(spark, s))
    try {
      queries.foreach(_.processAllAvailable())
      specs.foreach { s =>
        val tb = SnapshotTable(spark, s.targetLocation)
        val rows = tb.read()
        assert(rows.count() === 6, s"${s.entityName}: 5 - 1 deleted + 2 inserted")
        assert(rows.where(col("Id") === CdmFixture.id1).count() === 0)
        assert(rows.where(col("Id") === CdmFixture.id2)
          .select("versionnumber").head().getLong(0) === 2111000012L)
        assert(rows.where(!col("displayvalue").startsWith(s.entityName)).count() === 0,
          s"${s.entityName} absorbed another entity's rows")
        assert(tb.properties(SnapshotTable.PropWatermark) === f2)
      }

      // entity_c falls behind: stop its stream, advance the export. The
      // OTHER two keep consuming — watermarks are per-table, not shared.
      queries(2).stop()
      val f3 = CdmFixture.uploadBatchEntities(root, now.minusMinutes(30), names,
        addBase = false, addUpsert = true, updateChangelog = true, chunkSeed = 3)
      queries(0).processAllAvailable()
      queries(1).processAllAvailable()
      assert(SnapshotTable(spark, specs(0).targetLocation)
        .properties(SnapshotTable.PropWatermark) === f3)
      assert(SnapshotTable(spark, specs(1).targetLocation)
        .properties(SnapshotTable.PropWatermark) === f3)
      assert(SnapshotTable(spark, specs(2).targetLocation)
        .properties(SnapshotTable.PropWatermark) === f2,
        "a stopped stream's watermark must not move")

      // entity_c resumes from ITS checkpoint and catches up independently;
      // the f3 upserts replay at equal versions → no-op merges, 6 rows
      val qc = CdcPipeline.startStream(spark, specs(2))
      try qc.processAllAvailable()
      finally qc.stop()
      val tc = SnapshotTable(spark, specs(2).targetLocation)
      assert(tc.properties(SnapshotTable.PropWatermark) === f3)
      assert(tc.read().count() === 6)
      assert(tc.read().where(!col("displayvalue").startsWith("entity_c")).count() === 0)
    } finally queries.foreach(q => if (q.isActive) q.stop())
  }

  test("schema evolution across restart: new model.json column is ADDed, history NULL") {
    val root = tmpDir("cdm-evolve-src")
    val target = tmpDir("cdm-evolve-target")
    CdmFixture.initRoot(root)
    CdmFixture.uploadBatch(root, now.minusHours(3), updateChangelog = true, chunkSeed = 1)

    val spec = StreamSpec(root, CdmFixture.entityName, target, numBuckets = 4, changeCaptureIntervalSeconds = 1)
    CdcPipeline.runBackfill(spark, spec)
    val table = SnapshotTable(spark, target)
    assert(!table.schema.fieldNames.contains("newbizcol"))

    // Synapse ships a widened model.json in a later folder (rename/add are
    // both adds — docs/backfill.md:16). The engine handles it the way the
    // reference does: the restarted stream reads the widened schema, ADDs
    // the column to the target, and NULL-fills history.
    val extra = Seq("newbizcol" -> "int64")
    val folder = CdmFixture.folderName(now.minusHours(1))
    val fdir = java.nio.file.Paths.get(root, folder, CdmFixture.entityName)
    java.nio.file.Files.createDirectories(fdir)
    java.nio.file.Files.write(java.nio.file.Paths.get(root, folder, "model.json"),
      CdmFixture.modelJson(extra).getBytes("UTF-8"))
    // root model.json must also widen (newest-schema authority on restart)
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "model.json"),
      CdmFixture.modelJson(extra).getBytes("UTF-8"))
    val row = CdmFixture.insertRow("cafe0000-0000-4000-8000-000000000001", 9, 3111000099L, "F999") + ",77"
    java.nio.file.Files.write(fdir.resolve("9.csv"), (row + "\n").getBytes("UTF-8"))
    CdmFixture.stampChangelog(root, folder)

    // "restart": a fresh stream picks up the widened schema
    val q = CdcPipeline.startStream(spark, spec)
    try q.processAllAvailable()
    finally q.stop()

    val result = table.read()
    assert(result.schema("newbizcol").dataType == org.apache.spark.sql.types.LongType)
    assert(result.where(col("Id") === "cafe0000-0000-4000-8000-000000000001")
      .select("newbizcol").head().getLong(0) === 77L)
    assert(result.where(col("newbizcol").isNull).count() === 5, "pre-evolution rows read as NULL")
  }

  test("isUnifiedSchema=true: widened model.json fails fast as retryable, target schema unchanged") {
    val root = tmpDir("cdm-unified-src")
    val target = tmpDir("cdm-unified-target")
    CdmFixture.initRoot(root)
    CdmFixture.uploadBatch(root, now.minusHours(3), updateChangelog = true, chunkSeed = 1)

    val spec = StreamSpec(root, CdmFixture.entityName, target, numBuckets = 4,
      changeCaptureIntervalSeconds = 1, isUnifiedSchema = true)
    CdcPipeline.runBackfill(spark, spec)
    val table = SnapshotTable(spark, target)
    val schemaBefore = table.schema

    // source ships a widened model.json — under isUnifiedSchema this is a
    // stream-definition error, not data to migrate
    val extra = Seq("newbizcol" -> "int64")
    val folder = CdmFixture.folderName(now.minusHours(1))
    val fdir = java.nio.file.Paths.get(root, folder, CdmFixture.entityName)
    java.nio.file.Files.createDirectories(fdir)
    java.nio.file.Files.write(java.nio.file.Paths.get(root, folder, "model.json"),
      CdmFixture.modelJson(extra).getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "model.json"),
      CdmFixture.modelJson(extra).getBytes("UTF-8"))
    val row = CdmFixture.insertRow("cafe0000-0000-4000-8000-000000000002", 9, 3111000099L, "F999") + ",77"
    java.nio.file.Files.write(fdir.resolve("9.csv"), (row + "\n").getBytes("UTF-8"))
    CdmFixture.stampChangelog(root, folder)

    val q = CdcPipeline.startStream(spark, spec)
    val failure = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable()
      finally q.stop()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(failure).exists(_.isInstanceOf[graft.pipeline.SchemaDriftException]),
      s"expected SchemaDriftException in ${chain(failure).map(_.getClass.getName)}")
    // drift is the exit-code-2 (restart, re-read config) path
    assert(graft.app.Main.isRetryable(failure, Seq.empty))
    assert(table.schema == schemaBefore, "target schema must not be migrated")
    assert(!table.schema.fieldNames.map(_.toLowerCase).contains("newbizcol"))
  }

  test("backfill Merge mode folds into an existing target without replace") {
    val root = tmpDir("cdm-bfmerge-src")
    val target = tmpDir("cdm-bfmerge-target")
    CdmFixture.initRoot(root)
    CdmFixture.uploadBatch(root, now.minusHours(4), updateChangelog = true, chunkSeed = 1)

    val spec = StreamSpec(root, CdmFixture.entityName, target, numBuckets = 4, changeCaptureIntervalSeconds = 1)
    CdcPipeline.runBackfill(spark, spec) // initial Overwrite → 5 rows
    val table = SnapshotTable(spark, target)
    assert(table.read().count() === 5)

    // later folder with delete+upsert; re-backfill in Merge mode
    val f2 = CdmFixture.uploadBatch(root, now.minusHours(2), addDelete = true, addUpsert = true,
      updateChangelog = true, chunkSeed = 2)
    val mergeSpec = spec.copy(backfillBehavior = "Merge")
    CdcPipeline.runBackfill(spark, mergeSpec)

    val result = table.read()
    assert(result.count() === 6)
    assert(result.where(col("Id") === CdmFixture.id1).count() === 0)
    assert(result.where(col("Id") === CdmFixture.id2).select("versionnumber").head().getLong(0) === 2111000012L)
    assert(table.properties(SnapshotTable.PropWatermark) === f2)
  }

  test("maxFoldersPerTrigger splits the backlog into multiple micro-batches") {
    val root = tmpDir("cdm-shape-src")
    val target = tmpDir("cdm-shape-target")
    CdmFixture.initRoot(root)
    // 3 closed folders of backlog
    (1 to 3).foreach(i => CdmFixture.uploadBatch(root, now.minusHours(4 - i),
      updateChangelog = i == 3, chunkSeed = i))

    val spec = StreamSpec(root, CdmFixture.entityName, target,
      numBuckets = 4, changeCaptureIntervalSeconds = 1, maxFoldersPerTrigger = Some(1))
    val q = CdcPipeline.startStream(spark, spec)
    try q.processAllAvailable()
    finally q.stop()

    val table = SnapshotTable(spark, target)
    assert(table.read().count() === 5)
    // one snapshot commit per admitted folder → ≥3 snapshot versions
    assert(table.currentSnapshot.version >= 3,
      s"expected one commit per folder, got version ${table.currentSnapshot.version}")
    assert(table.properties(SnapshotTable.PropWatermark) === CdmFixture.folderName(now.minusHours(1)))
  }

  test("maxChunksPerTrigger splits one folder across micro-batches (rowsPerGroup analog)") {
    val root = tmpDir("cdm-chunksplit-src")
    val target = tmpDir("cdm-chunksplit-target")
    CdmFixture.initRoot(root)
    // one folder, two CSV chunks (base + upsert) — must split into 2 batches
    CdmFixture.uploadBatch(root, now.minusHours(2), addUpsert = true, updateChangelog = true, chunkSeed = 1)

    val spec = StreamSpec(root, CdmFixture.entityName, target, numBuckets = 4,
      changeCaptureIntervalSeconds = 1, maxChunksPerTrigger = Some(1))
    val q = CdcPipeline.startStream(spark, spec)
    try q.processAllAvailable()
    finally q.stop()

    val table = SnapshotTable(spark, target)
    assert(table.read().count() === 7, "5 base + 2 new upsert identities")
    val v = table.read().where(col("Id") === CdmFixture.id2).select("versionnumber").head().getLong(0)
    assert(v === 2111000012L, "cross-chunk upsert must resolve by version")
    assert(table.currentSnapshot.version >= 2,
      s"folder must split into ≥2 commits, got ${table.currentSnapshot.version}")
    assert(table.properties(SnapshotTable.PropWatermark) === CdmFixture.folderName(now.minusHours(2)))
  }

  test("memoryBound shaper splits a folder exceeding the byte budget into bounded batches") {
    val root = tmpDir("cdm-membound-src")
    val target = tmpDir("cdm-membound-target")
    CdmFixture.initRoot(root)
    CdmFixture.uploadBatch(root, now.minusHours(2), addUpsert = true, updateChangelog = true, chunkSeed = 1)

    // A vanishingly small headroom fraction makes every chunk exceed the
    // budget — the shaper must still admit one chunk per batch (no stall)
    // and stream the oversized folder in bounded pieces.
    val spec = StreamSpec(root, CdmFixture.entityName, target, numBuckets = 4,
      changeCaptureIntervalSeconds = 1, shaper = Some("memoryBound"), memoryHeadroomFraction = 1e-12)
    val q = CdcPipeline.startStream(spark, spec)
    try q.processAllAvailable()
    finally q.stop()

    val table = SnapshotTable(spark, target)
    assert(table.read().count() === 7)
    assert(table.currentSnapshot.version >= 2,
      s"budget-splitting must commit per chunk, got version ${table.currentSnapshot.version}")
  }

  test("chunk admission covers every chunk exactly once across micro-batch offsets") {
    import graft.sources.{ChangelogOffset, CsvChunkPartition, SynapseCdmLayout, SynapseCdmMicroBatchStream}
    import scala.jdk.CollectionConverters._
    val root = tmpDir("cdm-offsets-src")
    CdmFixture.initRoot(root)
    // 2 folders: 3 chunks + 1 chunk; changelog at the newest
    CdmFixture.uploadBatch(root, now.minusHours(2), addDelete = true, addUpsert = true, chunkSeed = 1)
    val last = CdmFixture.uploadBatch(root, now.minusHours(1), updateChangelog = true, chunkSeed = 2)

    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("path" -> root, "entity" -> CdmFixture.entityName, "maxChunksPerTrigger" -> "1").asJava)
    val layout = SynapseCdmLayout(opts, spark.sparkContext.hadoopConfiguration)
    val schema = layout.rawSchemaWithMeta
    val stream = new SynapseCdmMicroBatchStream(schema, schema, opts)

    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    var off = stream.initialOffset()
    var batches = 0
    var progressed = true
    while (progressed && batches < 50) {
      val next = stream.latestOffset(off, stream.getDefaultReadLimit)
      progressed = next.asInstanceOf[ChangelogOffset] != off.asInstanceOf[ChangelogOffset]
      if (progressed) {
        val parts = stream.planInputPartitions(off, next)
        assert(parts.length === 1, s"maxChunksPerTrigger=1 must admit exactly one chunk, got ${parts.length}")
        seen ++= parts.map(_.asInstanceOf[CsvChunkPartition].path)
        off = next
        batches += 1
      }
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val expected = layout.foldersInRange(conf, "", last)
      .flatMap(f => layout.chunkFiles(conf, f).map(_._1))
    assert(batches === expected.size, "one micro-batch per chunk")
    assert(seen.toSeq === expected, "every chunk exactly once, in folder+name order")
    assert(off.asInstanceOf[ChangelogOffset] === ChangelogOffset(last), "final offset = newest folder, complete")
  }

  test("Main lifecycle: backfill exits 0; failures map to retryable/fatal exit codes") {
    val root = tmpDir("cdm-main-src")
    val target = tmpDir("cdm-main-target")
    CdmFixture.initRoot(root)
    CdmFixture.uploadBatch(root, now.minusHours(1), updateChangelog = true)
    val spec = StreamSpec.fromJson(
      s"""{"sourcePath":"$root","entityName":"${CdmFixture.entityName}",
         |"targetLocation":"$target","backfill":true,"numBuckets":4,
         |"retryableFailureMessages":["transient glitch"]}""".stripMargin)
    assert(graft.app.Main.run(spark, spec) === 0)
    assert(SnapshotTable(spark, target).read().count() === 5)

    // empty source (no changelog) → logic failure, no configured match → exit 1
    val badRoot = tmpDir("cdm-main-bad")
    CdmFixture.initRoot(badRoot)
    val bad = spec.copy(sourcePath = badRoot, targetLocation = tmpDir("cdm-main-bad-t"))
    assert(graft.app.Main.run(spark, bad) === 1)

    // same failure with a matching retryable message pattern → exit 2
    val retrySpec = bad.copy(retryableFailureMessages = Seq("nothing is closed for backfill"))
    assert(graft.app.Main.run(spark, retrySpec) === 2)
  }

  test("Main maintenance mode: one-shot run absorbs merge-on-read deletes and exits 0") {
    val root = tmpDir("cdm-maint-src")
    val target = tmpDir("cdm-maint-target")
    CdmFixture.initRoot(root)
    CdmFixture.uploadBatch(root, now.minusHours(1), updateChangelog = true)
    val base = StreamSpec.fromJson(
      s"""{"sourcePath":"$root","entityName":"${CdmFixture.entityName}",
         |"targetLocation":"$target","backfill":true,"numBuckets":4}""".stripMargin)
    assert(graft.app.Main.run(spark, base) === 0)
    val table = SnapshotTable(spark, target)
    // leave the table with outstanding equality deletes + an extra file
    table.mergeOnRead(
      table.read().limit(1).withColumn("versionnumber", col("versionnumber") + 1000),
      "arcane_merge_key", "versionnumber", "IsDelete")
    assert(table.currentSnapshot.deletes.nonEmpty)
    val rows = table.read().orderBy("Id").collect().map(_.toString).toSeq
    // the standalone maintenance entry (reference TargetMaintenanceProcessor
    // shape): same spec JSON, maintenanceRun flag — thresholds NOT
    // consulted. exportDir IS allowed here even with merge-on-read (the
    // stream spec refuses that pair): maintenance exports AFTER its
    // compaction absorbed the deletes.
    val exportDir = tmpDir("cdm-maint-export")
    val maint = StreamSpec.fromJson(
      s"""{"sourcePath":"$root","entityName":"${CdmFixture.entityName}",
         |"targetLocation":"$target","maintenanceRun":true,
         |"mergeMode":"merge-on-read","exportDir":"$exportDir",
         |"maintenance":{"analyzedColumns":["versionnumber"]}}""".stripMargin)
    assert(graft.app.Main.run(spark, maint) === 0)
    assert(table.currentSnapshot.deletes.isEmpty, "maintenance must absorb equality deletes")
    assert(table.read().orderBy("Id").collect().map(_.toString).toSeq === rows,
      "maintenance must not change visible rows")
    assert(table.properties.exists(_._1.startsWith("stats.")), "ANALYZE ran")
    assert(spark.read.parquet(s"$exportDir/data").count() === table.read().count(),
      "post-maintenance export must expose the compacted table")
    // missing table → fatal exit 1, not a hang or a silent 0
    val gone = maint.copy(targetLocation = tmpDir("cdm-maint-none"))
    assert(graft.app.Main.run(spark, gone) === 1)
  }

  test("partial-folder watermark carries chunk progress; checkpoint-less restart resumes remaining chunks") {
    val root = tmpDir("cdm-partial-src")
    val target = tmpDir("cdm-partial-target")
    CdmFixture.initRoot(root)
    // one folder, two chunks (base + upsert+delete); admit ONE chunk per
    // trigger with a trigger interval long enough that batch 2 never fires
    // during this test — freezing the table in the partially-ingested state
    CdmFixture.uploadBatch(root, now.minusHours(2), addUpsert = true, updateChangelog = true, chunkSeed = 1)
    val frozen = StreamSpec(root, CdmFixture.entityName, target, numBuckets = 4,
      changeCaptureIntervalSeconds = 600, maxChunksPerTrigger = Some(1))
    val folder = CdmFixture.folderName(now.minusHours(2))
    val table = SnapshotTable(spark, target)

    val q1 = CdcPipeline.startStream(spark, frozen)
    try {
      // batch 1 (chunk 1 of 2) commits shortly after start; the committed
      // watermark must record the SUB-FOLDER progress, not the bare folder
      // name (which would claim the whole folder ingested)
      val deadline = System.currentTimeMillis() + 60000
      while (System.currentTimeMillis() < deadline &&
        !(table.exists && table.properties.get(SnapshotTable.PropWatermark).contains(s"$folder#1"))) {
        Thread.sleep(50)
      }
      assert(table.properties.get(SnapshotTable.PropWatermark).contains(s"$folder#1"),
        s"watermark after a partial folder must be $folder#1, got ${table.properties.get(SnapshotTable.PropWatermark)}")
      assert(table.read().count() === 5, "only the base chunk is ingested at this point")
    } finally q1.stop()

    // RESTART with no checkpoint: the only resume state is the table
    // watermark. Before the fix it read the bare folder name and skipped
    // chunk 2 forever (silent data loss); now it parses "folder#1" and
    // resumes the remaining chunk.
    val resumed = frozen.copy(changeCaptureIntervalSeconds = 1)
    val q2 = CdcPipeline.startStream(spark, resumed)
    try q2.processAllAvailable()
    finally q2.stop()
    assert(table.read().count() === 7, "restart must ingest the folder's remaining chunk")
    val v = table.read().where(col("Id") === CdmFixture.id2).select("versionnumber").head().getLong(0)
    assert(v === 2111000012L, "chunk-2 upsert applied after resume")
    assert(table.properties(SnapshotTable.PropWatermark) === folder,
      "watermark settles to the bare folder name once the folder completes")
  }

  test("streaming resume from watermark skips processed folders") {
    val root = tmpDir("cdm-resume-src")
    val target = tmpDir("cdm-resume-target")
    CdmFixture.initRoot(root)
    CdmFixture.uploadBatch(root, now.minusHours(3), updateChangelog = true, chunkSeed = 1)

    val spec = StreamSpec(root, CdmFixture.entityName, target, numBuckets = 4, changeCaptureIntervalSeconds = 1)
    CdcPipeline.runBackfill(spark, spec)
    val table = SnapshotTable(spark, target)
    val v1 = table.currentSnapshot.version

    // New stream with nothing new closed: no merge should happen.
    val q = CdcPipeline.startStream(spark, spec)
    try q.processAllAvailable()
    finally q.stop()
    assert(table.currentSnapshot.version === v1, "no new folders → no new snapshot")
  }

  // --------------------------------------------- per-folder schema authority

  /** Minimal churn export: folder A was written under a HISTORICAL
    * model.json (ver before name, no trailing `extra`), folder B under the
    * newest one; a third folder C has NO model.json at all (falls back to
    * the newest order). The reference parses each folder under its own
    * schema (`/root/reference/docs/backfill.md:8-12`).
    */
  private def writeChurnExport(root: String): Unit = {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    def put(parts: String*)(content: String): Unit = {
      val p = Paths.get(root, parts: _*)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    }
    def model(attrs: (String, String)*): String =
      s"""{"name":"cdm","version":"1","entities":[{"$$type":"LocalEntity","name":"churn_e","attributes":[
         |${attrs.map { case (n, t) => s"""{"name":"$n","dataType":"$t"}""" }.mkString(",")}]}]}""".stripMargin
    val oldModel = model("Id" -> "guid", "ver" -> "int64", "name" -> "string")
    val newModel = model("Id" -> "guid", "name" -> "string", "ver" -> "int64", "extra" -> "string")
    put("model.json")(newModel)
    put("2024-01-01T00.00.00Z", "model.json")(oldModel)
    put("2024-01-01T00.00.00Z", "churn_e", "0.csv")("id1,5,\"alpha\"\n")
    put("2024-01-02T00.00.00Z", "model.json")(newModel)
    put("2024-01-02T00.00.00Z", "churn_e", "0.csv")("id2,\"beta\",7,\"x\"\n")
    put("2024-01-03T00.00.00Z", "churn_e", "0.csv")("id3,\"gamma\",9,\"y\"\n")
    put("Changelog", "changelog.info")("2024-01-03T00.00.00Z")
  }

  test("backfill keeps a column DROPPED from the newest model: union schema + A12 ADD COLUMN") {
    // The reference's backfill stages each folder under its own schema and
    // diffs staging vs target, ADDing staging-only columns
    // (docs/backfill.md:14-19) — so a column present in historical
    // model.json generations but dropped from the newest one keeps its
    // history. Old folder carries `legacycode`; the newest model dropped it.
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    val root = tmpDir("cdm-dropped-src") + "/export"
    def put(parts: String*)(content: String): Unit = {
      val p = Paths.get(root, parts: _*)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    }
    def model(attrs: (String, String)*): String =
      s"""{"name":"cdm","version":"1","entities":[{"$$type":"LocalEntity","name":"drop_e","attributes":[
         |${attrs.map { case (n, t) => s"""{"name":"$n","dataType":"$t"}""" }.mkString(",")}]}]}""".stripMargin
    val oldModel = model("Id" -> "guid", "versionnumber" -> "int64",
      "legacycode" -> "string", "IsDelete" -> "boolean")
    val newModel = model("Id" -> "guid", "versionnumber" -> "int64", "IsDelete" -> "boolean")
    put("model.json")(newModel)
    put("2024-01-01T00.00.00Z", "model.json")(oldModel)
    put("2024-01-01T00.00.00Z", "drop_e", "0.csv")("idA,10,\"L-A\",\nidB,10,\"L-B\",\n")
    put("2024-01-02T00.00.00Z", "model.json")(newModel)
    put("2024-01-02T00.00.00Z", "drop_e", "0.csv")("idB,20,\nidC,20,\n")
    put("Changelog", "changelog.info")("2024-01-02T00.00.00Z")

    val target = tmpDir("cdm-dropped-target") + "/t"
    def spec(behavior: String, start: Option[String] = None) = StreamSpec(
      sourcePath = root, entityName = "drop_e", targetLocation = target,
      backfillBehavior = behavior, backfillStartDate = start, numBuckets = 4,
      keyColumns = Seq("Id"))

    // 1. staging-vs-target diff (Merge): target pre-exists WITHOUT the
    //    dropped column (created from the new-schema folder only); the full
    //    backfill must ADD COLUMN legacycode and land its history
    CdcPipeline.runBackfill(spark, spec("Overwrite", start = Some("2024-01-02T00.00.00Z")))
    val table = SnapshotTable(spark, target)
    assert(!table.schema.fieldNames.map(_.toLowerCase).contains("legacycode"),
      "precondition: new-schema-only target must lack the dropped column")
    CdcPipeline.runBackfill(spark, spec("Merge"))
    val got = table.read().select("Id", "versionnumber", "legacycode")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(got === Set(("idA", 10L, "L-A"), ("idB", 20L, null), ("idC", 20L, null)),
      "dropped-column history must survive: old rows carry values, newest-schema winners NULL")

    // 2. Overwrite backfill from scratch lands the union schema directly
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(target))
    CdcPipeline.runBackfill(spark, spec("Overwrite"))
    val got2 = SnapshotTable(spark, target).read().select("Id", "legacycode")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))).toSet
    assert(got2 === Set(("idA", "L-A"), ("idB", null), ("idC", null)))

    // 3. isUnifiedSchema declares the source schema FIXED: a dropped-column
    //    history widening a narrower target is schema drift, and must fail
    //    loudly (retryable deployment error) instead of silently migrating
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(target))
    CdcPipeline.runBackfill(spark, spec("Overwrite", start = Some("2024-01-02T00.00.00Z")))
    val drift = intercept[graft.pipeline.SchemaDriftException] {
      CdcPipeline.runBackfill(spark,
        spec("Merge").copy(isUnifiedSchema = true))
    }
    assert(drift.getMessage.contains("legacycode"))
  }

  test("full pipeline across a schema-churn export: backfill the old schema, stream the new, values aligned") {
    import graft.queries.CdcFixtureGen
    import org.apache.spark.sql.expressions.Window
    val dir = sf("sf0.001")
    // PRIVATE COPY of the cached churn fixture: this test drives the
    // changelog through both folders, and mutating the shared fixture's
    // changelog outside its lock/_complete signature would corrupt it for
    // a concurrent gate-verify replica (or leave it rewound on a kill).
    val shared = CdcFixtureGen.materializeChurn(spark, dir)
    val root = tmpDir("churn-pipe-src") + "/export"
    org.apache.commons.io.FileUtils.copyDirectory(new java.io.File(shared), new java.io.File(root))
    CdcFixtureGen.stampChangelog(root, CdcFixtureGen.Folder1)
    locally {
      val target = tmpDir("churn-pipe-target") + "/t"
      val ckpt = tmpDir("churn-pipe-ckpt") + "/c"
      val spec = StreamSpec(
        sourcePath = root,
        entityName = CdcFixtureGen.ChurnEntity,
        targetLocation = target,
        backfillBehavior = "Overwrite",
        numBuckets = 8,
        changeCaptureIntervalSeconds = 0,
        checkpointLocation = Some(ckpt))
      CdcPipeline.runBackfill(spark, spec)
      // After the backfill leg the table carries folder 1's CONTEMPORARY
      // schema (the changelog names folder 1, so its model.json is the
      // newest known — no value column yet); versionnumber/eventtype must
      // be value-correct despite the swapped CSV order. Streaming folder 2
      // then widens the table via A12 schema migration (ADD COLUMN value).
      val afterBackfill = SnapshotTable(spark, target).read()
      assert(afterBackfill.count() > 0)
      assert(!afterBackfill.columns.map(_.toLowerCase).contains("value"),
        "value must not exist before the new-schema folder streams in")
      assert(afterBackfill.where(col("versionnumber").isNull).count() === 0,
        "reordered versionnumber must still parse as a number")
      CdcFixtureGen.stampChangelog(root, CdcFixtureGen.Folder2)
      val q = CdcPipeline.startStream(spark, spec)
      try q.processAllAvailable()
      finally q.stop()

      val got = SnapshotTable(spark, target).read()
        .select(
          col("Id").cast("long").as("user_id"),
          col("versionnumber").as("event_id"),
          col("eventtype").as("event_type"),
          col("value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))))
        .toSet

      // expected: the same CDC fold derived from the source parquet —
      // folder-1 (old schema) winners carry NULL value, folder-2 winners
      // their real value; versionnumber/eventtype must be value-correct
      // even though folder 1's CSV order had them swapped.
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val cut = CdcFixtureGen.cut(ev.count())
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      def latest(df: org.apache.spark.sql.DataFrame) =
        df.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
          .where(col("rn") === 1).drop("rn")
      val tgt = latest(ev.where(col("event_id") < cut)).where(col("event_type") =!= "error")
      val stg = latest(ev.where(col("event_id") >= cut))
      val expected = tgt.as("t")
        .join(stg.as("s"), col("t.user_id") === col("s.user_id"), "full_outer")
        .where(!org.apache.spark.sql.functions.coalesce(
          col("s.event_type") === "error", org.apache.spark.sql.functions.lit(false)))
        .select(
          org.apache.spark.sql.functions.coalesce(col("s.user_id"), col("t.user_id")).as("user_id"),
          org.apache.spark.sql.functions.when(col("s.event_id").isNotNull, col("s.event_id"))
            .otherwise(col("t.event_id")).as("event_id"),
          org.apache.spark.sql.functions.when(col("s.event_id").isNotNull, col("s.event_type"))
            .otherwise(col("t.event_type")).as("event_type"),
          // folder-1 rows were exported without a value column → NULL
          org.apache.spark.sql.functions.when(col("s.event_id").isNotNull, col("s.value")).as("value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3))))
        .toSet
      assert(got === expected)
      // at this data density every user has a folder-2 winner, so the
      // final state is all-valued; the NULL leg is pinned after backfill
      assert(got.exists(_._4 != null), "streamed new-schema winners should carry real values")
    }
  }

  test("batch scan parses each folder under its OWN model.json (reorder + missing trailing column)") {
    val root = tmpDir("cdm-churn-src")
    writeChurnExport(root)
    val rows = spark.read.format("synapse-cdm")
      .option("path", root).option("entity", "churn_e")
      .load()
      .select("Id", "name", "ver", "extra")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(rows === Array(
      ("id1", "alpha", "5", null), // historical order honored; extra → NULL
      ("id2", "beta", "7", "x"),
      ("id3", "gamma", "9", "y"))) // no folder model.json → newest order
  }

  test("per-folder schema authority is ENTITY-scoped: two entities in one model.json, different churn each") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    val root = tmpDir("cdm-multient-churn")
    def put(parts: String*)(content: String): Unit = {
      val p = Paths.get(root, parts: _*)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    }
    // one model.json per generation declares BOTH entities (the real
    // Synapse export shape); the folder-1 generation reorders entity A's
    // columns but NOT entity B's, so a scan of B must not pick up A's
    // contemporary order and vice versa
    def model(aCols: Seq[String], bCols: Seq[String]): String = {
      def ent(name: String, cols: Seq[String]) =
        s"""{"$$type":"LocalEntity","name":"$name","attributes":[
           |${cols.map(c => s"""{"name":"$c","dataType":"string"}""").mkString(",")}]}""".stripMargin
      s"""{"name":"cdm","version":"1","entities":[${ent("ent_a", aCols)},${ent("ent_b", bCols)}]}"""
    }
    val newModel = model(Seq("x", "y"), Seq("p", "q"))
    val oldModel = model(Seq("y", "x"), Seq("p", "q")) // only A churned
    put("model.json")(newModel)
    put("2024-03-01T00.00.00Z", "model.json")(oldModel)
    put("2024-03-01T00.00.00Z", "ent_a", "0.csv")("\"y1\",\"x1\"\n") // A's old order: y, x
    put("2024-03-01T00.00.00Z", "ent_b", "0.csv")("\"p1\",\"q1\"\n")
    put("2024-03-02T00.00.00Z", "model.json")(newModel)
    put("2024-03-02T00.00.00Z", "ent_a", "0.csv")("\"x2\",\"y2\"\n")
    put("2024-03-02T00.00.00Z", "ent_b", "0.csv")("\"p2\",\"q2\"\n")
    put("Changelog", "changelog.info")("2024-03-02T00.00.00Z")
    def scan(entity: String): Set[Seq[String]] =
      spark.read.format("synapse-cdm").option("path", root).option("entity", entity)
        .load().drop("_folder", "_chunk_idx", "_chunk_last")
        .collect().map(r => (0 until r.size).map(r.getString)).toSet
    assert(scan("ent_a") == Set(Seq("x1", "y1"), Seq("x2", "y2")),
      "entity A must parse folder 1 under ITS churned order")
    assert(scan("ent_b") == Set(Seq("p1", "q1"), Seq("p2", "q2")),
      "entity B's unchanged order must be untouched by A's churn")
  }

  test("property: any folder-schema permutation/subset parses name-aligned into the unified schema") {
    import java.nio.charset.StandardCharsets
    import java.nio.file.{Files, Paths}
    val root = tmpDir("cdm-perm-src")
    val rnd = new scala.util.Random(20260814L)
    val allCols = (1 to 8).map(i => s"c$i")
    def model(cols: Seq[String]): String =
      s"""{"name":"cdm","version":"1","entities":[{"$$type":"LocalEntity","name":"perm_e","attributes":[
         |${cols.map(c => s"""{"name":"$c","dataType":"string"}""").mkString(",")}]}]}""".stripMargin
    def put(parts: String*)(content: String): Unit = {
      val p = Paths.get(root, parts: _*)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    }
    put("model.json")(model(allCols)) // newest = c1..c8 in order
    // 30 folders, each with a random permutation of a random non-empty
    // subset of the columns as its contemporary schema; every 5th folder
    // has NO model.json (must fall back to the newest order, full row).
    val expected = scala.collection.mutable.Map.empty[String, Map[String, String]]
    (0 until 30).foreach { i =>
      val folder = f"2024-02-01T$i%02d.00.00Z"
      val hasModel = i % 5 != 0
      // the NEWEST (changelog) folder's model.json is authoritative for
      // the unified output schema — it carries the full column set; the
      // historical folders get random permutations of random subsets
      val cols =
        if (hasModel && i != 29) rnd.shuffle(allCols).take(1 + rnd.nextInt(allCols.size)).toSeq
        else allCols
      if (hasModel) put(folder, "model.json")(model(cols))
      val vals = cols.map(c => c -> s"f$i-$c").toMap
      put(folder, "perm_e", "0.csv")(cols.map(vals).mkString(",") + "\n")
      expected(folder) = vals
    }
    put("Changelog", "changelog.info")("2024-02-01T29.00.00Z")
    val rows = spark.read.format("synapse-cdm")
      .option("path", root).option("entity", "perm_e")
      .load()
      .select((allCols.map(col) :+ col("_folder")).toIndexedSeq: _*)
      .collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val folder = r.getString(allCols.size)
      val exp = expected(folder)
      allCols.zipWithIndex.foreach { case (c, idx) =>
        val got = if (r.isNullAt(idx)) null else r.getString(idx)
        assert(got == exp.getOrElse(c, null),
          s"folder $folder column $c: got $got expected ${exp.get(c)}")
      }
    }
  }

  test("one micro-batch spanning two model.json generations stages both folders value-correct") {
    val root = tmpDir("cdm-churn-stream")
    writeChurnExport(root)
    val q = spark.readStream.format("synapse-cdm")
      .option("path", root).option("entity", "churn_e")
      .load()
      .select("Id", "name", "ver", "extra", "_folder")
      .writeStream.format("memory").queryName("churn_stream").start()
    try q.processAllAvailable()
    finally q.stop()
    val rows = spark.table("churn_stream").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(rows === Array(
      ("id1", "alpha", "5", null),
      ("id2", "beta", "7", "x"),
      ("id3", "gamma", "9", "y")))
  }
}
