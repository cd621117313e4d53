package graft

import graft.tables.{IcebergExport, SnapshotTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

import scala.jdk.CollectionConverters._

/** Round-14 Iceberg-export hardening: O(new files) incremental cost
  * (manifest-sourced row counts — zero per-file IO for carried files),
  * equality-delete manifests for merge-on-read tables, durable field ids,
  * EXISTING/ADDED/DELETED entry statuses and honest operation summaries.
  */
class IcebergExportSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def readMeta(fs: org.apache.hadoop.fs.FileSystem, p: Path) = {
    val in = fs.open(p)
    try mapper.readTree(new String(in.readAllBytes())) finally in.close()
  }

  private def currentMeta(fs: org.apache.hadoop.fs.FileSystem, exportDir: String) = {
    val hint = IcebergExport.readVersionHint(fs, new Path(exportDir))
    readMeta(fs, new Path(new Path(exportDir, "metadata"), s"v$hint.metadata.json"))
  }

  private def readAvro(fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[org.apache.avro.generic.GenericRecord] = {
    val in = fs.open(p)
    val s = new org.apache.avro.file.DataFileStream[org.apache.avro.generic.GenericRecord](
      in, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try Iterator.continually(if (s.hasNext) Some(s.next()) else None)
      .takeWhile(_.isDefined).flatten.toVector
    finally s.close()
  }

  /** Raw manifest entries of the CURRENT snapshot with the given content
    * (0=data, 1=deletes).
    */
  private def rawManifestEntries(fs: org.apache.hadoop.fs.FileSystem, exportDir: String,
      content: Int): Seq[org.apache.avro.generic.GenericRecord] = {
    val meta = currentMeta(fs, exportDir)
    val curId = meta.get("current-snapshot-id").asLong()
    val sn = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == curId).get
    readAvro(fs, new Path(sn.get("manifest-list").asText()))
      .filter(_.get("content").asInstanceOf[Int] == content)
      .flatMap(mf => readAvro(fs, new Path(mf.get("manifest_path").toString)))
  }

  private def manifestEntries(fs: org.apache.hadoop.fs.FileSystem, exportDir: String,
      content: Int): Seq[(Int, Long, Long, String)] =
    // (status, snapshot_id, sequence_number, file_path)
    rawManifestEntries(fs, exportDir, content).map { e =>
      val df = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      (e.get("status").asInstanceOf[Int], e.get("snapshot_id").asInstanceOf[Long],
        e.get("sequence_number").asInstanceOf[Long], df.get("file_path").toString)
    }

  test("incremental export performs ZERO reads of carried data files (manifest-sourced counts)") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.counting.impl", classOf[CountingFileSystem].getName)
    conf.set("fs.AbstractFileSystem.counting.impl", classOf[CountingAbstractFileSystem].getName)
    val base = tmpDir("iceberg-count")
    val tableLoc = s"counting://$base/table"
    val exportDir = s"counting://$base/iceberg"
    val t = SnapshotTable(spark, tableLoc)
    val df = (1 to 200).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 8)
    t.exportIceberg(exportDir)

    // a merge touching few keys rewrites few buckets; everything else carries
    val change = Seq(("k1", 5L, "u1", false), ("k2", 5L, null: String, true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.merge(change, "arcane_merge_key", "versionnumber", "IsDelete")

    CountingFileSystem.reset()
    t.exportIceberg(exportDir)
    val dataReads = CountingFileSystem.openedPaths.filter(_.contains("/table/data/"))
    assert(dataReads.isEmpty,
      s"export must not open ANY table data file (counts come from the manifest); opened: $dataReads")
    // and the export is still correct: chain row count == live rows
    val fs = new Path(exportDir).getFileSystem(conf)
    val chain = IcebergExport.readDataFiles(fs, new Path(exportDir))
    assert(chain.map(_._2).sum == t.read().count())
  }

  test("write-time sort order exports as an Iceberg sort order with durable field ids") {
    val t = SnapshotTable(spark, tmpDir("iceberg-sort"))
    val df = (1 to 60).map(i => (s"k$i", i.toLong, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 4,
      extraProps = Map(SnapshotTable.PropSortOrder -> "versionnumber,payload"))
    val exportDir = tmpDir("iceberg-sort-out")
    t.exportIceberg(exportDir)
    val fs = new Path(exportDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = currentMeta(fs, exportDir)
    assert(meta.get("default-sort-order-id").asInt() == 1)
    val orders = meta.get("sort-orders").elements().asScala.toSeq
    assert(orders.map(_.get("order-id").asInt()) == Seq(0, 1),
      "order 0 (unsorted) must remain for pre-property snapshots")
    val fields = orders(1).get("fields").elements().asScala.toSeq
    // field ids must match the published schema's ids for those names
    val schemaIds = meta.get("schemas").get(0).get("fields").elements().asScala
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
    assert(fields.map(_.get("source-id").asInt()) ==
      Seq(schemaIds("versionnumber"), schemaIds("payload")))
    assert(fields.forall(f => f.get("transform").asText() == "identity" &&
      f.get("direction").asText() == "asc" && f.get("null-order").asText() == "nulls-first"))
    // the independent python validator still accepts the chain
    import scala.sys.process._
    val out = Seq("python3", "/root/repo/tools/iceberg_validate.py", exportDir,
      "--expect-rows", "60").!
    assert(out == 0, "python validator must accept a sorted-table export")
  }

  test("crashed half-export recovery: stale vN+1 leftovers are superseded, readers never see them") {
    val t = SnapshotTable(spark, tmpDir("iceberg-crash"))
    val df = (1 to 50).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 4)
    val exportDir = tmpDir("iceberg-crash-out")
    t.exportIceberg(exportDir)
    val fs = new Path(exportDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(exportDir, "metadata")
    val hintBefore = IcebergExport.readVersionHint(fs, new Path(exportDir)).toInt

    // Simulate a writer that died between metadata write and hint publish:
    // orphan v(N+1).metadata.json (garbage) + an unreferenced manifest.
    // The hint is the ONLY publish point, so readers must never follow these.
    def writeGarbage(p: Path): Unit = {
      val o = fs.create(p, true); o.write("NOT JSON / NOT AVRO".getBytes); o.close()
    }
    writeGarbage(new Path(metaDir, s"v${hintBefore + 1}.metadata.json"))
    writeGarbage(new Path(metaDir, "deadbeef-crashed-m0.avro"))
    // a reader between the crash and the retry resolves the OLD hint fine
    assert(IcebergExport.readDataFiles(fs, new Path(exportDir)).map(_._2).sum == 50)

    // the retried commit+export supersedes the stale vN+1 in place
    val change = Seq(("k1", 5L, "u1", false), ("knew", 5L, "x", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.merge(change, "arcane_merge_key", "versionnumber", "IsDelete")
    t.exportIceberg(exportDir)
    assert(IcebergExport.readVersionHint(fs, new Path(exportDir)).toInt == hintBefore + 1)
    val meta = currentMeta(fs, exportDir)
    assert(meta.get("snapshots") != null, "superseded metadata must parse as real JSON")
    // full chain reads the post-merge state; the garbage manifest is never touched
    val live = IcebergExport.readLiveRows(spark, exportDir, t.schema)
    assert(live.count() == t.read().count())
    val manifestLists = meta.get("snapshots").elements().asScala
      .map(_.get("manifest-list").asText()).toSeq
    val referenced = manifestLists ++ manifestLists.flatMap(ml =>
      readAvro(fs, new Path(ml)).map(_.get("manifest_path").toString))
    assert(!referenced.exists(_.contains("deadbeef")),
      "crashed leftovers must not be referenced by the published chain")
  }

  test("manifest statuses: carried files EXISTING with original identity, new ADDED, removed DELETED; operation overwrite") {
    val t = SnapshotTable(spark, tmpDir("iceberg-status"))
    val df = (1 to 200).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 8)
    val exportDir = tmpDir("iceberg-status-out")
    t.exportIceberg(exportDir)
    val fs = new Path(exportDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    val first = manifestEntries(fs, exportDir, 0)
    assert(first.nonEmpty && first.forall(_._1 == 1), "first export: every file ADDED")
    val firstMeta = currentMeta(fs, exportDir)
    val firstSnapId = firstMeta.get("current-snapshot-id").asLong()
    assert(firstMeta.get("snapshots").get(0).get("summary").get("operation").asText() == "append")
    val firstByPath = first.map(e => e._4 -> e).toMap

    val change = Seq(("k1", 5L, "u1", false)).toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.merge(change, "arcane_merge_key", "versionnumber", "IsDelete")
    t.exportIceberg(exportDir)

    val second = manifestEntries(fs, exportDir, 0)
    val byStatus = second.groupBy(_._1)
    // carried files: EXISTING(0), keeping the ORIGINAL snapshot id and sequence
    val existing = byStatus.getOrElse(0, Seq.empty)
    assert(existing.nonEmpty, "a 1-key merge must carry most buckets as EXISTING")
    existing.foreach { case (_, sid, seq, path) =>
      val orig = firstByPath(path)
      assert(sid == orig._2 && seq == orig._3,
        s"EXISTING entry must keep original snapshot_id/sequence for $path")
      assert(sid == firstSnapId)
    }
    // the rewritten bucket: its old file DELETED, its new file ADDED
    val added = byStatus.getOrElse(1, Seq.empty)
    val deleted = byStatus.getOrElse(2, Seq.empty)
    assert(added.nonEmpty && deleted.nonEmpty)
    assert(added.forall(_._2 != firstSnapId), "ADDED entries belong to the new snapshot")
    assert(deleted.map(_._4).toSet.subsetOf(firstByPath.keySet),
      "DELETED tombstones must reference previously-exported files")
    // DELETED tombstones keep the file's ORIGINAL data sequence (a file's
    // sequence never changes after add); the REMOVING commit is the entry's
    // snapshot_id — sequence-based reasoning over removed files stays sound
    deleted.foreach { case (_, sid, sq, path) =>
      assert(sq == firstByPath(path)._3, s"DELETED entry must keep original sequence for $path")
      assert(sid != firstSnapId, "DELETED entry's snapshot_id is the removing commit")
    }
    // incremental-append accounting: operation is overwrite, added counts ADDED-only
    val meta2 = currentMeta(fs, exportDir)
    val snap2 = meta2.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == meta2.get("current-snapshot-id").asLong()).get
    assert(snap2.get("summary").get("operation").asText() == "overwrite")
    assert(snap2.get("summary").get("added-data-files").asText().toInt == added.size)
    assert(snap2.get("summary").get("deleted-data-files").asText().toInt == deleted.size)
    // readDataFiles never returns DELETED entries
    val live = IcebergExport.readDataFiles(fs, new Path(exportDir)).map(_._1).toSet
    assert(deleted.map(_._4).forall(p => !live.contains(p)))
  }

  test("merge-on-read export: equality-delete manifest, v2 sequence rule, no compaction needed") {
    val t = SnapshotTable(spark, tmpDir("iceberg-mor"))
    val df = (1 to 100).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 4)
    // update k1, tombstone k2, insert knew — then RESURRECT k2 in a later
    // commit, so the reader must apply the strictly-greater sequence rule
    t.mergeOnRead(Seq(("k1", 5L, "u1", false), ("k2", 5L, null: String, true), ("knew", 5L, "fresh", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    t.mergeOnRead(Seq(("k2", 9L, "back", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    assert(t.currentSnapshot.deletes.nonEmpty, "the scenario must leave outstanding deletes")

    val exportDir = tmpDir("iceberg-mor-out")
    t.exportIceberg(exportDir) // no compaction first — must NOT throw
    val fs = new Path(exportDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // the delete manifest exists, content=2 entries carrying the merge-key field id
    val (dataFiles, delFiles) = IcebergExport.readFiles(fs, new Path(exportDir))
    assert(delFiles.nonEmpty, "outstanding equality deletes must be exported")
    val meta = currentMeta(fs, exportDir)
    val idOfKey = meta.get("schemas").get(0).get("fields").elements().asScala
      .find(_.get("name").asText() == "arcane_merge_key").get.get("id").asInt()
    assert(delFiles.forall(_.equalityFieldIds == Seq(idOfKey)))
    assert(dataFiles.nonEmpty)

    // an external v2 reader (readLiveRows) sees EXACTLY the table's live rows
    val liveDf = IcebergExport.readLiveRows(spark, exportDir, t.schema)
    val viaExport = liveDf
      .select("arcane_merge_key", "versionnumber", "payload")
      .as[(String, Long, String)].collect().toSet
    // scale pin: the delete side is change-set-sized, so the final
    // (post-AQE) plan must BROADCAST it — a shuffle join here would
    // reshuffle the whole data scan per read at 100 TB
    val finalPlan = liveDf.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin"),
      s"delete-applying join must broadcast the delete keys:\n${finalPlan.take(2000)}")
    val direct = t.read().select("arcane_merge_key", "versionnumber", "payload")
      .as[(String, Long, String)].collect().toSet
    assert(viaExport == direct)
    assert(viaExport.exists(r => r._1 == "k2" && r._3 == "back"),
      "a key re-inserted AFTER its delete must survive (strictly-greater sequence rule)")
    assert(viaExport.exists(r => r._1 == "k1" && r._3 == "u1"))

    // after compaction the next export drops the delete files (DELETED entries)
    t.compact(fileSizeThresholdBytes = Long.MaxValue)
    t.exportIceberg(exportDir)
    val (_, delAfter) = IcebergExport.readFiles(fs, new Path(exportDir))
    assert(delAfter.isEmpty, "compaction absorbs deletes; the export must retire them")
    val viaExport2 = IcebergExport.readLiveRows(spark, exportDir, t.schema)
      .select("arcane_merge_key", "versionnumber", "payload")
      .as[(String, Long, String)].collect().toSet
    assert(viaExport2 == direct)
  }

  test("an equality-delete file missing the key column fails loudly, never silently deletes") {
    // The fast path reads delete files with the explicit single-key schema
    // (skipping inference); Spark reads a column ABSENT from a parquet file
    // as all-NULL, and the downstream NULL-safe key join would tombstone
    // every NULL-key data row — silent wrong deletes. The footer guard must
    // detect the foreign/renamed-schema file and route to the inferring
    // reader, which fails loudly on the missing column instead.
    val t = SnapshotTable(spark, tmpDir("iceberg-mor-badeq"))
    val df = (1 to 50).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 4)
    t.mergeOnRead(Seq(("k1", 5L, "u1", false), ("k2", 5L, null: String, true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    val exportDir = tmpDir("iceberg-mor-badeq-out")
    t.exportIceberg(exportDir)
    val fs = new Path(exportDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (_, delFiles) = IcebergExport.readFiles(fs, new Path(exportDir))
    assert(delFiles.nonEmpty)
    // doctor one delete file in place: same keys, RENAMED column (the
    // shape a foreign writer with its own field naming would produce)
    val victim = new Path(delFiles.head.path)
    val doctored = spark.read.parquet(victim.toString)
      .withColumnRenamed("arcane_merge_key", "renamed_key")
    val scratch = tmpDir("iceberg-mor-badeq-scratch")
    doctored.coalesce(1).write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(f => f.isFile && f.getName.startsWith("part-")).get
    fs.delete(victim, false)
    fs.copyFromLocalFile(new Path(part.getAbsolutePath), victim)
    val e = intercept[Exception] {
      IcebergExport.readLiveRows(spark, exportDir, t.schema).collect()
    }
    val msg = e.getMessage
    assert(msg != null && (msg.contains("arcane_merge_key") || msg.contains("UNRESOLVED")),
      s"expected a loud missing-column failure, got: ${e.getClass.getName}: $msg")
  }

  test("ORC merge-on-read export: ORC data files + parquet delete files read back correctly") {
    // the reader's per-format dispatch: data groups scan as ORC while the
    // equality-delete side is always parquet (writeDeletes' format)
    val t = SnapshotTable(spark, tmpDir("iceberg-mor-orc"))
    val df = (1 to 80).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 4,
      extraProps = Map(SnapshotTable.PropFormat -> "orc"))
    t.mergeOnRead(Seq(("k1", 5L, "u1", false), ("k2", 5L, null: String, true), ("knew", 5L, "fresh", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    assert(t.currentSnapshot.deletes.nonEmpty)
    val exportDir = tmpDir("iceberg-mor-orc-out")
    t.exportIceberg(exportDir)
    val fs = new Path(exportDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (dataFiles, delFiles) = IcebergExport.readFiles(fs, new Path(exportDir))
    assert(dataFiles.forall(_.fileFormat.equalsIgnoreCase("ORC")))
    assert(delFiles.nonEmpty)
    val viaExport = IcebergExport.readLiveRows(spark, exportDir, t.schema)
      .select("arcane_merge_key", "versionnumber", "payload")
      .as[(String, Long, String)].collect().toSet
    val direct = t.read().select("arcane_merge_key", "versionnumber", "payload")
      .as[(String, Long, String)].collect().toSet
    assert(viaExport == direct)
    assert(!viaExport.exists(_._1 == "k2") && viaExport.exists(r => r._1 == "k1" && r._3 == "u1"))
  }

  test("position deletes: foreign-shaped v2 table, at-or-below sequence rule, scheme-insensitive paths, mixed with equality deletes") {
    // This engine's own merges never WRITE position deletes, but foreign
    // v2 writers do — build a spec-shaped table by hand and prove
    // readTable consumes it: content=1 manifest entries, file_path/pos
    // rows, the ≤ sequence rule (a commit may delete rows from files it
    // just added), and path matching that survives different scheme
    // renderings between the delete-file writer and Spark's
    // _metadata.file_path.
    import org.apache.spark.sql.types._
    val base = tmpDir("iceberg-posdel")
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))

    def partFile(dir: String): org.apache.hadoop.fs.FileStatus =
      fs.listStatus(new Path(dir)).filter(_.getPath.getName.endsWith(".parquet")).head
    def writeData(sub: String, rows: Seq[(String, Long)], seq: Long): IcebergExport.ExportFile = {
      val dir = s"$base/$sub"
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(dir)
      val f = partFile(dir)
      IcebergExport.ExportFile(f.getPath.toString, f.getLen, rows.size, seq)
    }
    // file A rows k1..k4 at pos 0..3; B k5..k8; C added later
    val a = writeData("dataA", (1 to 4).map(i => (s"k$i", i.toLong)), 1L)
    val b = writeData("dataB", (5 to 8).map(i => (s"k$i", i.toLong)), 1L)
    val exportDir = s"$base/export"
    IcebergExport.write(fs, new Path(exportDir), schema, 1L,
      1000L, Seq(a, b), Map.empty)

    // commit 2: new file C, plus a position delete at seq 2 removing
    // (A, pos 1) = k2 — an OLDER file — and (C, pos 0) = k9 — a file of
    // the SAME commit (the ≤ rule). A's path is written in an alternate
    // scheme rendering (file:// + uri-path) to exercise normalization.
    val c = writeData("dataC", (9 to 12).map(i => (s"k$i", i.toLong)), 2L)
    val altA = "file://" + new Path(a.path).toUri.getPath
    val pdDir = s"$base/posdel"
    Seq((altA, 1L), (c.path, 0L)).toDF("file_path", "pos")
      .coalesce(1).write.mode("overwrite").parquet(pdDir)
    val pdf = partFile(pdDir)
    val pd = IcebergExport.ExportPosDeleteFile(pdf.getPath.toString, pdf.getLen, 2L, 2L)
    IcebergExport.write(fs, new Path(exportDir), schema, 2L,
      2000L, Seq(a, b, c), Map.empty, posDeletes = Seq(pd))

    val (_, delFiles) = IcebergExport.readFiles(fs, new Path(exportDir))
    assert(delFiles.map(_.content) == Seq(1), "the delete manifest entry must be content=1")
    val live2 = IcebergExport.readTable(spark, exportDir)
    val keys2 = live2.select("k").as[String].collect().toSet
    assert(keys2 == ((1 to 12).map(i => s"k$i").toSet -- Set("k2", "k9")),
      s"pos deletes must remove k2 (older file) AND k9 (same-commit file): $keys2")
    val plan = live2.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"position-delete join must broadcast the delete rows:\n${plan.take(2000)}")
    // structural summary accounting
    val meta2 = currentMeta(fs, exportDir)
    val snap2 = meta2.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == meta2.get("current-snapshot-id").asLong()).get
    assert(snap2.get("summary").get("operation").asText() == "overwrite")
    assert(snap2.get("summary").get("added-position-delete-files").asText().toInt == 1)
    assert(snap2.get("summary").get("added-position-deletes").asText().toLong == 2L)
    assert(snap2.get("summary").get("added-data-files").asText().toInt == 1)

    // time travel to the first snapshot (id = version+1 = 2): no deletes yet
    val keys1 = IcebergExport.readTable(spark, exportDir, atSnapshotId = Some(2L))
      .select("k").as[String].collect().toSet
    assert(keys1 == (1 to 8).map(i => s"k$i").toSet)

    // commit 3: carry the position delete, add an EQUALITY delete of k5
    // at seq 3 — both kinds must coexist and the carried entry stays
    // content=1 with EXISTING status
    val d = writeData("dataD", Seq(("k13", 13L)), 3L)
    val eqDir = s"$base/eqdel"
    Seq("k5").toDF("k").coalesce(1).write.mode("overwrite").parquet(eqDir)
    val eqf = partFile(eqDir)
    IcebergExport.write(fs, new Path(exportDir), schema, 3L,
      3000L, Seq(a, b, c, d), Map.empty,
      deletes = Seq(IcebergExport.ExportDeleteFile(eqf.getPath.toString, eqf.getLen, 1L, 3L)),
      equalityDeleteColumn = Some("k"), posDeletes = Seq(pd))
    val delEntries3 = rawManifestEntries(fs, exportDir, 1)
    val byPath3 = delEntries3.map { e =>
      val df0 = e.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
      df0.get("file_path").toString ->
        ((e.get("status").asInstanceOf[Int], df0.get("content").asInstanceOf[Int]))
    }.toMap
    assert(byPath3(pd.path) == ((0, 1)), "carried pos delete: EXISTING status, content=1 preserved")
    assert(byPath3(eqf.getPath.toString) == ((1, 2)), "new eq delete: ADDED status, content=2")
    val meta3 = currentMeta(fs, exportDir)
    val snap3 = meta3.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == meta3.get("current-snapshot-id").asLong()).get
    assert(snap3.get("summary").get("added-equality-delete-files").asText().toInt == 1)
    assert(!snap3.get("summary").has("added-position-delete-files"),
      "a carried position delete must not re-count as added")
    val keys3 = IcebergExport.readTable(spark, exportDir).select("k").as[String].collect().toSet
    assert(keys3 == ((1 to 13).map(i => s"k$i").toSet -- Set("k2", "k9", "k5")),
      s"equality (k5) and position (k2, k9) deletes must both apply: $keys3")
  }

  test("field ids are durable: names keep ids across replace, dropped ids never reused, bad re-bind fails loudly") {
    val t = SnapshotTable(spark, tmpDir("iceberg-ids"))
    val df = (1 to 50).map(i => (s"k$i", 1L, s"v$i")).toDF("arcane_merge_key", "versionnumber", "payload")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 4)
    val exportDir = tmpDir("iceberg-ids-out")
    t.exportIceberg(exportDir)
    val fs = new Path(exportDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids1 = currentMeta(fs, exportDir).get("schemas").get(0).get("fields").elements().asScala
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap

    // a backfill Overwrite replaces the table: drops `payload`, REORDERS
    // the remaining columns, adds `extra` — names must keep their ids, the
    // new name must get a fresh id ABOVE the dropped one's
    val df2 = (1 to 50).map(i => (i.toLong, s"k$i", s"e$i"))
      .toDF("versionnumber", "arcane_merge_key", "extra")
    t.createOrReplace(df2, "arcane_merge_key", numBuckets = 4)
    t.exportIceberg(exportDir)
    val meta2 = currentMeta(fs, exportDir)
    val curSchemaId = meta2.get("current-schema-id").asInt()
    val schema2 = meta2.get("schemas").elements().asScala
      .find(_.get("schema-id").asInt() == curSchemaId).get
    val ids2 = schema2.get("fields").elements().asScala
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
    assert(ids2("arcane_merge_key") == ids1("arcane_merge_key"), "known name must keep its id despite reordering")
    assert(ids2("versionnumber") == ids1("versionnumber"))
    assert(ids2("extra") > ids1.values.max, "fresh name must get an id above every prior id")
    assert(!ids2.values.exists(_ == ids1("payload")), "a dropped column's id must never be reused")
    assert(meta2.get("last-column-id").asInt() >= ids2.values.max)
    // name mapping published for field-id-less data files
    val nm = mapper.readTree(meta2.get("properties").get("schema.name-mapping.default").asText())
    val nmMap = nm.elements().asScala.map(e =>
      e.get("names").get(0).asText() -> e.get("field-id").asInt()).toMap
    assert(nmMap == ids2)

    // re-binding a known name to an incompatible type fails the export loudly
    val df3 = (1 to 50).map(i => (s"k$i", s"not-a-long-$i")).toDF("arcane_merge_key", "versionnumber")
    t.createOrReplace(df3, "arcane_merge_key", numBuckets = 4)
    val e = intercept[IllegalArgumentException] { t.exportIceberg(exportDir) }
    assert(e.getMessage.contains("column identity") || e.getMessage.contains("incompatible"))
  }

  test("manifest bounds: stats-indexed columns export as lower/upper_bounds; carried entries keep them") {
    import org.apache.avro.generic.GenericRecord
    val t = SnapshotTable(spark, tmpDir("iceberg-bounds"))
    val df = (1 to 100).map(i => (s"k$i", i.toLong, i * 1.5, false))
      .toDF("arcane_merge_key", "versionnumber", "score", "IsDelete")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 4,
      extraProps = Map(SnapshotTable.PropStatsColumns -> "versionnumber,score"))
    val exportDir = tmpDir("iceberg-bounds-out")
    t.exportIceberg(exportDir)
    val fs = new Path(exportDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    def boundsByField(e: org.apache.avro.generic.GenericRecord, which: String): Map[Int, Array[Byte]] = {
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      Option(df.get(which)).map(_.asInstanceOf[java.util.List[GenericRecord]].asScala.map { kv =>
        val bb = kv.get("value").asInstanceOf[java.nio.ByteBuffer].duplicate()
        val arr = new Array[Byte](bb.remaining()); bb.get(arr)
        kv.get("key").asInstanceOf[Int] -> arr
      }.toMap).getOrElse(Map.empty)
    }
    def le(b: Array[Byte]) = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val meta = currentMeta(fs, exportDir)
    val ids = meta.get("schemas").get(0).get("fields").elements().asScala
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap

    def rawEntries(): Seq[GenericRecord] = rawManifestEntries(fs, exportDir, content = 0)
    val entries = rawEntries()
    assert(entries.nonEmpty)
    // every file's bounds CONTAIN its true column range: union of file
    // bounds covers the table range, and each long lower <= upper
    val verLows = entries.map(e => le(boundsByField(e, "lower_bounds")(ids("versionnumber"))).getLong)
    val verHighs = entries.map(e => le(boundsByField(e, "upper_bounds")(ids("versionnumber"))).getLong)
    assert(verLows.min <= 1L && verHighs.max >= 100L, s"bounds must cover [1,100]: ${verLows.min}..${verHighs.max}")
    verLows.zip(verHighs).foreach { case (lo, hi) => assert(lo <= hi) }
    val scoreLows = entries.map(e => le(boundsByField(e, "lower_bounds")(ids("score"))).getDouble)
    val scoreHighs = entries.map(e => le(boundsByField(e, "upper_bounds")(ids("score"))).getDouble)
    assert(scoreLows.min == 1.5 && scoreHighs.max == 150.0, "double bounds are exact")

    // a 1-key merge carries most files as EXISTING — bounds must survive
    // the carry verbatim (PriorEntry re-appends the raw Avro values)
    val withBounds = entries.count(e => boundsByField(e, "lower_bounds").nonEmpty)
    val change = Seq(("k1", 1000L, 9.9, false))
      .toDF("arcane_merge_key", "versionnumber", "score", "IsDelete")
    t.merge(change, "arcane_merge_key", "versionnumber", "IsDelete")
    t.exportIceberg(exportDir)
    val after = rawEntries()
    val existing = after.filter(_.get("status").asInstanceOf[Int] == 0)
    assert(existing.nonEmpty)
    existing.foreach { e =>
      assert(boundsByField(e, "lower_bounds").contains(ids("versionnumber")) &&
        boundsByField(e, "upper_bounds").contains(ids("score")),
        "carried EXISTING entries must keep their bounds maps")
    }
    assert(after.count(e => e.get("status").asInstanceOf[Int] != 2 &&
      boundsByField(e, "lower_bounds").nonEmpty) >= withBounds - 1)
  }

  test("readTableRange: external-reader file skipping from manifest bounds; exact, delete-aware") {
    import org.apache.spark.sql.functions.col
    val grid = (0 until 4096).map(i => (s"k$i", i.toLong, (i / 64).toLong, (i % 64).toLong, false))
      .toDF("arcane_merge_key", "versionnumber", "a", "b", "IsDelete")
    val t = SnapshotTable(spark, tmpDir("iceberg-range"))
    t.createOrReplace(grid, "arcane_merge_key", numBuckets = 1,
      extraProps = Map(SnapshotTable.PropMaxRowsPerFile -> "256",
        SnapshotTable.PropStatsColumns -> "a",
        SnapshotTable.PropSortOrder -> "a"))
    val exportDir = tmpDir("iceberg-range-out")
    t.exportIceberg(exportDir)
    val fs = new Path(exportDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val allFiles = IcebergExport.readFiles(fs, new Path(exportDir))._1
    assert(allFiles.size > 4)

    // exactness + skipping: same slice as the table-side readRange test
    val ranged = IcebergExport.readTableRange(spark, exportDir, "a", 4.0, 7.0)
    val exact = t.read().where(col("a") >= 4 && col("a") <= 7)
      .select("arcane_merge_key").as[String].collect().toSet
    assert(ranged.select("arcane_merge_key").as[String].collect().toSet == exact)
    assert(exact.size == 4 * 64)
    val scanned = ranged.inputFiles.count(f => allFiles.exists(_.path.endsWith(new Path(f).getName)))
    // long bounds are SAFELY WIDENED at export (boundBytes: ±1 at integer
    // boundaries so double rounding can never make a bound too tight), so
    // the export path may keep one extra boundary file per side vs the
    // table's own exact-stats readRange (<= 2 here)
    assert(scanned <= 4,
      s"a 4/64 a-slice should plan <= 4 of ${allFiles.size} sorted files, got $scanned")
    // residual predicate pushes down to parquet on the bare column
    val planned = ranged.queryExecution.executedPlan.toString
    assert(planned.contains("PushedFilters") && planned.contains("GreaterThanOrEqual(a,4)"),
      s"typed-literal residual must reach the scan:\n${planned.take(1500)}")

    // a column with NO exported bounds prunes nothing but stays exact
    val noStats = IcebergExport.readTableRange(spark, exportDir, "b", 10.0, 12.0)
    assert(noStats.count() == t.read().where(col("b").between(10, 12)).count())
    val scannedNoStats = noStats.inputFiles
      .count(f => allFiles.exists(_.path.endsWith(new Path(f).getName)))
    assert(scannedNoStats == allFiles.size)

    // a range outside every file's bounds: empty result, correct schema, no error
    val empty = IcebergExport.readTableRange(spark, exportDir, "a", 1000.0, 2000.0)
    assert(empty.count() == 0 && empty.columns.contains("versionnumber"))

    // deletes still apply to kept rows: tombstone a key INSIDE the range
    // merge-on-read (no compaction), re-export, and read through the range
    // version must BEAT the target's (update-if-newer): k300's is 300
    t.mergeOnRead(Seq(("k300", 99999L, 4L, 44L, true))
      .toDF("arcane_merge_key", "versionnumber", "a", "b", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    t.exportIceberg(exportDir)
    assert(t.currentSnapshot.deletes.nonEmpty, "the tombstone must leave an outstanding delete")
    val afterDel = IcebergExport.readTableRange(spark, exportDir, "a", 4.0, 7.0)
      .select("arcane_merge_key").as[String].collect().toSet
    assert(afterDel == exact - "k300",
      "equality deletes must still suppress rows inside the pruned range scan")
  }

  test("boundBytes: long bounds widen safely, int/double exact, non-numeric skipped") {
    import org.apache.spark.sql.types._
    def le(b: Array[Byte]) = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // exact small long: widening must not move the bound past an adjacent value
    assert(le(IcebergExport.boundBytes(LongType, 42.0, lower = true).get).getLong <= 42L)
    assert(le(IcebergExport.boundBytes(LongType, 42.0, lower = false).get).getLong >= 42L)
    // a long above 2^53 whose double representation rounded: the SAFE
    // property is containment — lower <= any value that could have
    // produced this double <= upper
    val big = 9007199254740995L // not representable; double rounds to ...996
    val d = big.toDouble
    assert(le(IcebergExport.boundBytes(LongType, d, lower = true).get).getLong <= big)
    assert(le(IcebergExport.boundBytes(LongType, d, lower = false).get).getLong >= big)
    // extremes clamp instead of overflowing
    assert(le(IcebergExport.boundBytes(LongType, Double.MaxValue, lower = false).get).getLong == Long.MaxValue)
    assert(le(IcebergExport.boundBytes(IntegerType, 7.0, lower = true).get).getInt == 7)
    assert(le(IcebergExport.boundBytes(DoubleType, 1.5, lower = true).get).getDouble == 1.5)
    assert(IcebergExport.boundBytes(StringType, 1.0, lower = true).isEmpty)
  }

  test("upgrade path: first incremental export over a LEGACY manifest (no equality_ids/bounds fields) succeeds") {
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val t = SnapshotTable(spark, tmpDir("iceberg-legacy"))
    val df = (1 to 60).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 4)
    val exportDir = tmpDir("iceberg-legacy-out")
    t.exportIceberg(exportDir)
    val fs = new Path(exportDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // Rewrite the current manifest under the PRE-R14 entry schema (no
    // equality_ids, no bounds) — byte-faithful stand-in for an export dir
    // written by the previous release.
    val legacySchema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int","field-id":0},
        |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
        |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
        |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        |  {"name":"content","type":"int","field-id":134},
        |  {"name":"file_path","type":"string","field-id":100},
        |  {"name":"file_format","type":"string","field-id":101},
        |  {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
        |  {"name":"record_count","type":"long","field-id":103},
        |  {"name":"file_size_in_bytes","type":"long","field-id":104}
        |]}}
        |]}""".stripMargin)
    val meta = currentMeta(fs, exportDir)
    val curId = meta.get("current-snapshot-id").asLong()
    val sn = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == curId).get
    val manifestPath = new Path(
      readAvro(fs, new Path(sn.get("manifest-list").asText())).head.get("manifest_path").toString)
    val entries = readAvro(fs, manifestPath)
    val legacyDataFileSchema = legacySchema.getField("data_file").schema()
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](legacySchema))
    w.setMeta("schema", IcebergExport.avroMeta(fs, manifestPath, "schema"))
    w.setMeta("format-version", "2"); w.setMeta("content", "data")
    val out = fs.create(manifestPath, true)
    w.create(legacySchema, out)
    entries.foreach { e =>
      val od = e.get("data_file").asInstanceOf[GenericRecord]
      val nd = new GenericData.Record(legacyDataFileSchema)
      Seq("content", "file_path", "file_format", "record_count", "file_size_in_bytes")
        .foreach(f => nd.put(f, od.get(f)))
      nd.put("partition", new GenericData.Record(legacyDataFileSchema.getField("partition").schema()))
      val ne = new GenericData.Record(legacySchema)
      Seq("status", "snapshot_id", "sequence_number", "file_sequence_number")
        .foreach(f => ne.put(f, e.get(f)))
      ne.put("data_file", nd)
      w.append(ne)
    }
    w.close()

    // the next commit's export must read the legacy manifest (absent
    // optional fields -> null), carry files as EXISTING, and stay readable
    val change = Seq(("k1", 9L, "updated", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.merge(change, "arcane_merge_key", "versionnumber", "IsDelete")
    t.exportIceberg(exportDir) // pre-fix: AvroRuntimeException("Not a valid schema field")
    val statuses = manifestEntries(fs, exportDir, 0).groupBy(_._1)
    assert(statuses.getOrElse(0, Seq.empty).nonEmpty, "legacy files must carry as EXISTING")
    val viaExport = IcebergExport.readLiveRows(spark, exportDir, t.schema)
      .select("arcane_merge_key", "payload").as[(String, String)].collect().toMap
    assert(viaExport("k1") == "updated" && viaExport.size == t.read().count().toInt)
  }

  test("readTable: schema-on-metadata consumption — no caller schema, types round-trip, time travel") {
    val t = SnapshotTable(spark, tmpDir("iceberg-readtable"))
    val df = (1 to 50).map(i => (s"k$i", i.toLong, i * 0.5, i % 2 == 0, BigDecimal(i).setScale(2)))
      .toDF("arcane_merge_key", "versionnumber", "score", "flag", "amount")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 4)
    val exportDir = tmpDir("iceberg-readtable-out")
    t.exportIceberg(exportDir)
    val fs = new Path(exportDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val firstSnapId = t.currentSnapshot.version + 1

    // no schema passed: types come from the metadata's own schema JSON
    val viaMeta = IcebergExport.readTable(spark, exportDir)
    assert(viaMeta.schema.map(f => (f.name, f.dataType)) ==
      t.schema.map(f => (f.name, f.dataType)),
      s"metadata-derived schema must equal the table's: ${viaMeta.schema} vs ${t.schema}")
    val key = (r: org.apache.spark.sql.Row) => r.getString(0)
    assert(viaMeta.orderBy("arcane_merge_key").collect().map(key).toSeq ==
      t.read().orderBy("arcane_merge_key").collect().map(key).toSeq)
    assert(viaMeta.count() == 50)

    // a second commit + time travel: the OLD snapshot reads under the
    // metadata-declared schema without any caller input
    val change = Seq(("knew", 9L, 1.5, true, BigDecimal(9).setScale(2)))
      .toDF("arcane_merge_key", "versionnumber", "score", "flag", "amount")
      .withColumn("IsDelete", lit(false))
    t.addColumns(Seq(org.apache.spark.sql.types.StructField("IsDelete",
      org.apache.spark.sql.types.BooleanType)))
    t.merge(change, "arcane_merge_key", "versionnumber", "IsDelete")
    t.exportIceberg(exportDir)
    assert(IcebergExport.readTable(spark, exportDir).count() == 51)
    assert(IcebergExport.readTable(spark, exportDir, Some(firstSnapId)).count() == 50,
      "time travel must read the pre-merge state from metadata alone")
  }

  test("legal type promotions keep the field id (int->long, float->double, decimal widening)") {
    assert(IcebergExport.legalPromotion("int", "long"))
    assert(IcebergExport.legalPromotion("float", "double"))
    assert(IcebergExport.legalPromotion("decimal(10, 2)", "decimal(18, 2)"))
    assert(!IcebergExport.legalPromotion("decimal(18, 2)", "decimal(10, 2)"))
    assert(!IcebergExport.legalPromotion("decimal(10, 2)", "decimal(18, 3)"))
    assert(!IcebergExport.legalPromotion("long", "int"))
    assert(!IcebergExport.legalPromotion("string", "long"))
    assert(IcebergExport.legalPromotion("string", "string"))
  }

  test("iceberg export format pre-flight: Overwrite resolves the SPEC's format, Merge the table's") {
    import graft.pipeline.{CdcPipeline, StreamSpec}
    import java.time.{OffsetDateTime, ZoneOffset}
    val root = tmpDir("fmt-src")
    CdmFixture.initRoot(root)
    CdmFixture.uploadBatch(root, OffsetDateTime.of(2026, 1, 2, 11, 0, 0, 0, ZoneOffset.UTC),
      updateChangelog = true)
    val target = tmpDir("fmt-target") + "/t"
    def spec(behavior: String, format: Option[String]) = StreamSpec(
      sourcePath = root, entityName = CdmFixture.entityName, targetLocation = target,
      backfillBehavior = behavior, numBuckets = 4, format = format,
      icebergExportDir = Some(tmpDir("fmt-ice")))
    // parquet target exists
    CdcPipeline.runBackfill(spark, spec("Overwrite", None))
    val table = SnapshotTable(spark, target)
    val v0 = table.currentSnapshot.version
    // an avro OVERWRITE would REPLACE the parquet table and then fail the
    // post-commit export — the pre-flight must reject it BEFORE any commit
    val e = intercept[IllegalArgumentException] {
      CdcPipeline.runBackfill(spark, spec("Overwrite", Some("avro")))
    }
    assert(e.getMessage.contains("avro"))
    assert(table.currentSnapshot.version == v0, "rejected run must not have committed")
    // a MERGE keeps the existing table's parquet format — the spec's avro
    // is ignored by the write path, so the pre-flight accepts it
    CdcPipeline.runBackfill(spark, spec("Merge", Some("avro")))
    assert(table.currentSnapshot.version > v0)
    assert(table.properties.getOrElse(SnapshotTable.PropFormat, "parquet") == "parquet")
  }

  test("per-commit MoR stream wiring: startStream accepts icebergExportDir with merge-on-read") {
    // the validation no longer rejects the combination (delete manifests
    // make the export representable); the symlink export still does
    import graft.pipeline.{CdcPipeline, StreamSpec}
    val spec = StreamSpec(
      sourcePath = tmpDir("mor-wire-src"),
      entityName = "nosuch",
      targetLocation = tmpDir("mor-wire-tgt"),
      mergeMode = "merge-on-read",
      exportDir = Some(tmpDir("mor-wire-exp")))
    val e = intercept[IllegalArgumentException] { CdcPipeline.startStream(spark, spec) }
    assert(e.getMessage.contains("symlink") || e.getMessage.contains("exportDir"))
  }

  test("table locations containing '+' and spaces survive export + readLiveRows") {
    // The one-scan sequence attach joins the scan's URI-percent-encoded
    // _metadata.file_path against driver-rendered manifest paths — the
    // exact normalization-divergence class the Delta leg fixed
    // (canonicalPathCol/canonicalPath). A mismatch here does not lose
    // deletes, it loses DATA ROWS (inner join) — so pin a location with
    // both a '+' and a space through the MoR export + delete-applying read.
    val base = tmpDir("iceberg mor+plus")
    val t = SnapshotTable(spark, s"$base/ta+ble dir")
    t.createOrReplace((1 to 50).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", numBuckets = 4)
    t.mergeOnRead((1 to 10).map(i => (s"k$i", 2L, (null: String), true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    assert(t.currentSnapshot.deletes.nonEmpty)
    val ice = s"$base/ice+berg out"
    t.exportIceberg(ice)
    val viaChain = IcebergExport.readLiveRows(spark, ice, t.schema)
      .select($"arcane_merge_key").as[String].collect().toSet
    val direct = t.read().select($"arcane_merge_key").as[String].collect().toSet
    assert(direct.size === 40, "engine read must apply the tombstones")
    assert(viaChain === direct,
      "a '+'/space location must not break the sequence-attach or delete joins")
  }
}
