package graft

import graft.tables.{DeltaExport, SnapshotTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

/** Delta Lake log export: incremental diffs, idempotence, schema
  * evolution, time travel, and the loud MoR / rollback / format refusals.
  */
class DeltaExportSpec extends SparkSpec {
  import spark.implicits._

  private def hfs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshTable(name: String): (SnapshotTable, String) = {
    val root = tmpDir(name)
    (SnapshotTable(spark, s"$root/table"), s"$root/delta")
  }

  private def rows(ids: Range, v: Long) =
    ids.map(i => (i.toLong, s"n$i", v, false)).toDF("id", "name", "v", "is_del")

  test("incremental export: v0 full, later commits carry only the diff; read-back matches table") {
    val (tbl, delta) = freshTable("delta-incr")
    tbl.createOrReplace(rows(1 to 100, 1L), "id", numBuckets = 8)
    tbl.exportDelta(delta)
    val out = new Path(delta)
    assert(DeltaExport.logVersions(hfs, out) == Seq(0L))

    // merge: updates to 2 buckets + a tombstone → some files replaced
    val staged = rows(1 to 3, 2L)
      .withColumn("is_del", $"id" === 3L)
    tbl.merge(staged, "id", "v", "is_del")
    tbl.exportDelta(delta)
    assert(DeltaExport.logVersions(hfs, out) == Seq(0L, 1L))

    // the v1 commit must be a DIFF, not a re-add of every live file
    val v1 = scala.io.Source.fromFile(s"$delta/_delta_log/00000000000000000001.json")
      .getLines().toSeq
    val adds = v1.count(_.contains("\"add\""))
    val removes = v1.count(_.contains("\"remove\""))
    val live = tbl.currentSnapshot.files.size
    assert(adds > 0 && removes > 0 && adds < live,
      s"v1 must carry only changed files: adds=$adds removes=$removes live=$live")

    // read-back THROUGH the log equals the table's own read (the export
    // additionally publishes the id_bucket partition column — selected
    // away here; DeltaPartitionSpec pins its correctness)
    val viaLog = DeltaExport.readTable(spark, out)
      .select($"id", $"name", $"v", $"is_del").orderBy($"id")
      .as[(Long, String, Long, Boolean)].collect().toSeq
    val direct = tbl.read().orderBy($"id")
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(viaLog == direct)
    assert(!viaLog.exists(_._1 == 3L) && viaLog.count(_._3 == 2L) == 2)

    // idempotence: same engine snapshot → no new log entry
    tbl.exportDelta(delta)
    assert(DeltaExport.logVersions(hfs, out) == Seq(0L, 1L))
  }

  test("schema evolution republishes metaData with a stable table id; time travel replays old state") {
    val (tbl, delta) = freshTable("delta-schema")
    tbl.createOrReplace(rows(1 to 20, 1L), "id", numBuckets = 2)
    tbl.exportDelta(delta)
    val out = new Path(delta)
    val id0 = scala.io.Source.fromFile(s"$delta/_delta_log/00000000000000000000.json")
      .getLines().find(_.contains("metaData")).get

    tbl.addColumns(Seq(StructField("score", LongType, nullable = true)))
    tbl.merge(rows(21 to 25, 1L).withColumn("score", $"id" * 10), "id", "v", "is_del")
    tbl.exportDelta(delta)
    val v1Meta = scala.io.Source.fromFile(s"$delta/_delta_log/00000000000000000001.json")
      .getLines().find(_.contains("metaData"))
    assert(v1Meta.nonEmpty, "schema change must republish metaData")
    def tid(s: String) = """"id":"([0-9a-f-]+)"""".r.findFirstMatchIn(s).get.group(1)
    assert(tid(id0) == tid(v1Meta.get), "table id must be stable across schema changes")

    // head sees the new column; time travel to v0 sees the old schema/rows
    val head = DeltaExport.readTable(spark, out)
    assert(head.columns.contains("score") && head.count() == 25)
    val at0 = DeltaExport.readTable(spark, out, at = Some(0L))
    assert(!at0.columns.contains("score") && at0.count() == 20)
  }

  test("spec checkpoint at interval 10: anchored replay equals full-JSON replay; validator concurs") {
    val (tbl, delta) = freshTable("delta-ckpt")
    tbl.createOrReplace(rows(1 to 40, 1L), "id", numBuckets = 4)
    tbl.exportDelta(delta)
    // 11 more commits → delta versions 1..11, checkpoint at 10
    (1 to 11).foreach { k =>
      tbl.merge(rows(k to k, k + 1L), "id", "v", "is_del")
      tbl.exportDelta(delta)
    }
    val out = new Path(delta)
    assert(DeltaExport.logVersions(hfs, out) == (0L to 11L),
      "one delta version per engine commit")
    assert(hfs.exists(new Path(s"$delta/_delta_log/00000000000000000010.checkpoint.parquet")),
      "checkpoint must land at version 10")
    assert(hfs.exists(new Path(s"$delta/_delta_log/_last_checkpoint")))

    // checkpoint-anchored replay (readTable) ≡ pure-JSON replay (readFiles)
    val viaJson = DeltaExport.readFiles(hfs, out).toMap
    val viaCkpt = DeltaExport.readTable(spark, out)
    val direct = tbl.read()
    assert(viaCkpt.count() == direct.count())
    assert(viaCkpt.select($"id", $"v").except(direct.select($"id", $"v")).isEmpty)
    assert(viaCkpt.inputFiles.length == viaJson.size,
      "checkpoint-anchored and JSON-replayed file sets must be the same size")

    // time travel BEFORE the checkpoint still works (pure JSON range)
    assert(DeltaExport.readTable(spark, out, at = Some(0L)).count() == 40)

    // idempotence after a checkpoint: no new version, no new checkpoint
    tbl.exportDelta(delta)
    assert(DeltaExport.logVersions(hfs, out) == (0L to 11L))

    // the independent python validator cross-checks checkpoint vs JSON
    if (scala.util.Try(scala.sys.process.Process(
        Seq("python3", "-c", "import duckdb")).! == 0).getOrElse(false)) {
      val outTxt = new StringBuilder
      val code = scala.sys.process.Process(
        Seq("python3", "tools/delta_validate.py", delta, "--expect-rows", "40"))
        .!(scala.sys.process.ProcessLogger(l => outTxt.append(l), _ => ()))
      assert(code == 0, s"validator failed on checkpointed log: $outTxt")
    }
  }

  test("adoptDeltaTable: an external Delta table's live files join without rewrite and merge on") {
    // "external" Delta table = another engine table exported through the
    // log — the adoption side must rely ONLY on the _delta_log
    val (src, srcDelta) = freshTable("delta-adopt-src")
    src.createOrReplace(rows(1 to 50, 1L), "id", numBuckets = 2)
    src.exportDelta(srcDelta) // delta v0: 50 rows, pre-tombstone
    val staged = rows(1 to 5, 2L).withColumn("is_del", $"id" === 5L)
    src.merge(staged, "id", "v", "is_del")
    src.exportDelta(srcDelta) // delta v1: 49 live rows

    val (dst, _) = freshTable("delta-adopt-dst")
    dst.createOrReplace(rows(100 to 120, 1L), "id", numBuckets = 2)
    val before = dst.currentSnapshot.files.map(_.path).toSet
    dst.adoptDeltaTable(srcDelta)
    // adoption is metadata-only: every pre-existing file survives verbatim
    assert(before.subsetOf(dst.currentSnapshot.files.map(_.path).toSet))
    // head state adopted: 49 live source rows (id 5 tombstoned) + 21 native
    assert(dst.read().count() == 49 + 21)
    assert(dst.read().where($"id" === 5L).count() == 0)
    // adopted rows merge like native ones
    dst.merge(rows(1 to 1, 9L), "id", "v", "is_del")
    assert(dst.read().where($"id" === 1L).select($"v").head().getLong(0) == 9L)
    // time travel: adopting AT delta v0 would bring the pre-merge state
    val (dst0, _) = freshTable("delta-adopt-v0")
    dst0.createOrReplace(rows(200 to 201, 1L), "id", numBuckets = 2)
    dst0.adoptDeltaTable(srcDelta, at = Some(0L))
    assert(dst0.read().count() == 50 + 2, "v0 predates the tombstone")
  }

  test("add.path is percent-encoded per protocol; replay decodes back to the real file") {
    val base = tmpDir("delta-enc")
    // a data file whose path needs encoding: space AND a literal percent
    val dataDir = new java.io.File(s"$base/da ta%dir")
    dataDir.mkdirs()
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s").coalesce(1)
    df.write.parquet(s"$base/tmpw")
    val part = new java.io.File(s"$base/tmpw").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val target = new java.io.File(dataDir, "f 1%.parquet")
    java.nio.file.Files.move(part.toPath, target.toPath)

    val uri = new Path(target.getAbsolutePath).toString
    val delta = new Path(s"$base/delta")
    DeltaExport.write(hfs, delta, df.schema, snapshotVersion = 1L, timestampMs = 1000L,
      files = Seq(DeltaExport.ExportFile(uri, target.length(), 2L)))
    val logTxt = scala.io.Source.fromFile(s"$base/delta/_delta_log/00000000000000000000.json")
      .getLines().mkString("\n")
    assert(logTxt.contains("%20") && logTxt.contains("%25"),
      s"space and percent must be RFC-2396 encoded in add.path: $logTxt")
    // replay decodes back to the REAL file and the data reads
    val files = DeltaExport.readFiles(hfs, delta)
    assert(files.map(_._1).exists(p => p.endsWith("f 1%.parquet")), files.toString)
    assert(DeltaExport.readTable(spark, delta).count() == 2)
  }

  test("stats ride along; refusals: outstanding MoR deletes, older snapshot, missing version") {
    val (tbl, delta) = freshTable("delta-refuse")
    tbl.createOrReplace(rows(1 to 30, 1L), "id", numBuckets = 2)
    tbl.exportDelta(delta)
    val out = new Path(delta)
    val v0 = scala.io.Source.fromFile(s"$delta/_delta_log/00000000000000000000.json")
      .getLines().mkString("\n")
    assert(v0.contains("numRecords"), "add actions must carry numRecords stats")
    assert(v0.contains("minReaderVersion"), "v0 must declare the protocol")

    // outstanding MoR deletes export as protocol deletion vectors (the
    // full DV contract is pinned by DeltaDvSpec); a later compaction
    // returns the log to plain adds
    tbl.mergeOnRead(rows(1 to 3, 2L), "id", "v", "is_del")
    tbl.exportDelta(delta)
    assert(DeltaExport.readTable(spark, out).where($"v" === 2L).count() == 3)
    tbl.compact(fileSizeThresholdBytes = Long.MaxValue)
    tbl.exportDelta(delta)
    assert(DeltaExport.readTable(spark, out).where($"v" === 2L).count() == 3)

    // time travel to a nonexistent version is loud
    intercept[IllegalArgumentException](DeltaExport.readTable(spark, out, at = Some(99L)))
  }
}
