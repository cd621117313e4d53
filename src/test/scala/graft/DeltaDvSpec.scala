package graft

import graft.tables.{DeltaExport, SnapshotTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import scala.sys.process._

/** Delta deletion vectors (protocol reader v3 / writer v7): an
  * uncompacted merge-on-read stream exports through `_delta_log` with
  * position-ized equality deletes as RoaringBitmapArray DV files —
  * incremental across commits (a file whose DV changes is removed with
  * its old DV and re-added), protocol upgraded exactly once and only
  * when first needed, applied by readTable, refused by the raw file
  * list, and independently decoded by the Python validator (whose DV
  * decoder must also CATCH corruption, not just accept well-formed
  * files).
  */
class DeltaDvSpec extends SparkSpec {
  import spark.implicits._

  private def hfs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pythonWithDuckdb: Boolean =
    scala.util.Try(Seq("python3", "-c", "import duckdb").! == 0).getOrElse(false)

  private def validate(dir: String, args: Seq[String] = Seq.empty): (Int, String) = {
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/delta_validate.py", dir) ++ args)
      .!(ProcessLogger(l => { out.append(l); () }, _ => ()))
    (code, out.toString)
  }

  test("uncompacted MoR exports incrementally with DVs; reads and validator stay exact") {
    val base = tmpDir("delta-dv")
    val t = SnapshotTable(spark, s"$base/table")
    val delta = s"$base/delta"
    val rows = (1 to 120).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.createOrReplace(rows, "arcane_merge_key", numBuckets = 4)
    // clean export first: protocol must stay reader 1 (max compatibility)
    t.exportDelta(delta)
    val v0 = scala.io.Source.fromFile(s"$delta/_delta_log/00000000000000000000.json")
      .getLines().mkString("\n")
    assert(v0.contains("\"minReaderVersion\":1"))

    // MoR merge: updates + tombstones leave OUTSTANDING equality deletes
    val change = Seq(("k1", 2L, "updated", false), ("k2", 2L, null, true), ("k3", 2L, null, true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.mergeOnRead(change, "arcane_merge_key", "versionnumber", "IsDelete")
    assert(t.currentSnapshot.deletes.nonEmpty)
    t.exportDelta(delta)
    // protocol upgraded exactly once, with the feature declared
    val v1 = scala.io.Source.fromFile(s"$delta/_delta_log/00000000000000000001.json")
      .getLines().mkString("\n")
    assert(v1.contains("\"minReaderVersion\":3") && v1.contains("deletionVectors"))
    assert(v1.contains("\"deletionVector\""))

    // the read through the log equals the table's own MoR read
    def viaLog = DeltaExport.readTable(spark, new Path(delta))
      .select($"arcane_merge_key", $"versionnumber", $"payload")
      .as[(String, Long, String)].collect().toSet
    def direct = t.read().select($"arcane_merge_key", $"versionnumber", $"payload")
      .as[(String, Long, String)].collect().toSet
    assert(viaLog == direct)
    assert(!viaLog.exists(_._1 == "k2") && viaLog.exists(r => r._1 == "k1" && r._3 == "updated"))

    // a SECOND MoR merge deepens the DV on the same bucket's files: the
    // changed file must be removed (with its OLD dv) and re-added
    val change2 = Seq(("k4", 3L, null, true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.mergeOnRead(change2, "arcane_merge_key", "versionnumber", "IsDelete")
    t.exportDelta(delta)
    assert(viaLog == direct, "DV evolution must track the table exactly")
    val v2 = scala.io.Source.fromFile(s"$delta/_delta_log/00000000000000000002.json")
      .getLines().toSeq
    assert(!v2.exists(_.contains("minReaderVersion")), "no duplicate protocol upgrade")

    // raw file list refuses: physical files over-count live rows
    val e = intercept[IllegalStateException](DeltaExport.readFiles(hfs, new Path(delta)))
    assert(e.getMessage.contains("deletion vectors"))
    // and so does adopting it into another table
    val t2 = SnapshotTable(spark, s"$base/table2")
    t2.createOrReplace(rows, "arcane_merge_key", numBuckets = 2)
    intercept[IllegalStateException](t2.adoptDeltaTable(delta))

    // independent Python decode, exact row count
    assume(pythonWithDuckdb, "python3 + duckdb not available")
    val expectRows = direct.size
    val (code, out) = validate(delta, Seq("--expect-rows", expectRows.toString))
    assert(code == 0 && out.contains("\"errors\": 0"), s"validator: $out")

    // tamper detection: flip one byte INSIDE a DV bitmap — the checksum
    // (or cardinality) check must flag it
    val dvFile = new java.io.File(s"$delta/deletion_vectors").listFiles()
      .filter(_.getName.endsWith(".bin")).maxBy(_.lastModified())
    val bytes = java.nio.file.Files.readAllBytes(dvFile.toPath)
    val orig = bytes.clone()
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x7f).toByte
    java.nio.file.Files.write(dvFile.toPath, bytes)
    java.nio.file.Files.deleteIfExists(
      new java.io.File(dvFile.getParent, s".${dvFile.getName}.crc").toPath)
    try {
      val (codeBad, outBad) = validate(delta)
      assert(codeBad != 0, s"validator must flag a corrupted DV: $outBad")
    } finally {
      java.nio.file.Files.write(dvFile.toPath, orig)
      java.nio.file.Files.deleteIfExists(
        new java.io.File(dvFile.getParent, s".${dvFile.getName}.crc").toPath)
    }
  }

  test("unchanged DVs are reused across commits — no re-add churn at stream cadence") {
    val base = tmpDir("delta-dv-reuse")
    val t = SnapshotTable(spark, s"$base/table")
    val delta = s"$base/delta"
    t.createOrReplace((1 to 200).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", numBuckets = 8)
    // DV on whatever buckets k2/k3 live in
    t.mergeOnRead(Seq(("k2", 2L, null, true), ("k3", 2L, null, true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    t.exportDelta(delta)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def addsOf(v: Long): Seq[String] =
      scala.io.Source.fromFile(f"$delta/_delta_log/$v%020d.json").getLines()
        .map(mapper.readTree).filter(_.has("add"))
        .map(_.get("add").get("path").asText()).toSeq
    val dvAdds1 = scala.io.Source.fromFile(s"$delta/_delta_log/00000000000000000000.json")
      .getLines().map(mapper.readTree).filter(_.has("add"))
      .filter(n => !n.get("add").get("deletionVector").isInstanceOf[
        com.fasterxml.jackson.databind.node.MissingNode] &&
        n.get("add").has("deletionVector"))
      .map(_.get("add").get("path").asText()).toSeq
    assert(dvAdds1.nonEmpty)
    // a merge that rewrites a DIFFERENT key's bucket leaves the DV'd
    // files' positions unchanged — the next export must NOT re-add them
    val otherKey = (1 to 200).map(i => s"k$i").find { k =>
      val b = spark.range(1).select(expr(s"iceberg_bucket('$k', 8)"))
        .collect().head.getInt(0)
      val b2 = spark.range(1).select(expr("iceberg_bucket('k2', 8)"))
        .collect().head.getInt(0)
      val b3 = spark.range(1).select(expr("iceberg_bucket('k3', 8)"))
        .collect().head.getInt(0)
      b != b2 && b != b3
    }.get
    t.merge(Seq((otherKey, 5L, "rewritten", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    assert(t.currentSnapshot.deletes.nonEmpty, "the other bucket's deletes must survive")
    t.exportDelta(delta)
    val adds2 = addsOf(1L)
    assert(adds2.nonEmpty, "the rewritten bucket's files must be added")
    dvAdds1.foreach { p =>
      assert(!adds2.contains(p),
        s"unchanged-DV file $p must not be re-added (descriptor reuse)")
    }
    // and the replayed read still matches the table
    val viaLog = DeltaExport.readTable(spark, new Path(delta))
      .select($"arcane_merge_key", $"payload").as[(String, String)].collect().toSet
    val direct = t.read().select($"arcane_merge_key", $"payload")
      .as[(String, String)].collect().toSet
    assert(viaLog == direct)
  }

  test("NULL-keyed tombstones reach the exported deletion vector") {
    // NULL is a supported merge key (null-key bucket n); the DV
    // position-izing join must be null-safe (<=>) like the engine's own
    // delete application — a plain === would leave the NULL-keyed row out
    // of the DV and every external Delta reader would resurrect it.
    val base = tmpDir("delta-dv-nullkey")
    val t = SnapshotTable(spark, s"$base/table")
    val delta = s"$base/delta"
    val rows = ((1 to 40).map(i => (s"k$i", 1L, s"v$i", false)) :+
      ((null: String), 1L, "vnull", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.createOrReplace(rows, "arcane_merge_key", numBuckets = 4)
    t.mergeOnRead(
      Seq(((null: String), 2L, (null: String), true))
        .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    assert(t.currentSnapshot.deletes.nonEmpty)
    t.exportDelta(delta)
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df
      .select($"arcane_merge_key", $"payload").as[(String, String)].collect().toSet
    val direct = rowsOf(t.read())
    val viaLog = rowsOf(DeltaExport.readTable(spark, new Path(delta)))
    assert(!direct.exists(_._2 == "vnull"), "engine read must apply the NULL-key tombstone")
    assert(viaLog == direct, "exported DV must suppress the NULL-keyed row like the engine")
  }

  test("DV export is distributed — the driver collects descriptors, never positions") {
    val base = tmpDir("delta-dv-dist")
    val t = SnapshotTable(spark, s"$base/table")
    val delta = s"$base/delta"
    val n = 5000
    t.createOrReplace((1 to n).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", numBuckets = 8)
    // tombstone 80% of the keys: thousands of deleted positions spread
    // over every bucket's files
    t.mergeOnRead((1 to n).filter(_ % 5 != 0)
      .map(i => (s"k$i", 2L, (null: String), true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    SnapshotTable.lastDvExportDriverRows = -1L
    t.exportDelta(delta)
    // parse the committed adds: per-file descriptors with total cardinality
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val dvAdds = new java.io.File(s"$delta/_delta_log").listFiles()
      .filter(_.getName.endsWith(".json")).sorted
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
      .map(mapper.readTree).filter(_.has("add"))
      .map(_.get("add")).filter(_.hasNonNull("deletionVector")).toSeq
    val totalDeleted = dvAdds.map(_.get("deletionVector").get("cardinality").asLong()).sum
    assert(totalDeleted == (n - n / 5).toLong, "every tombstoned row must be position-ized")
    // THE instrumented bound: the export's only collect brought back one
    // row per DV'd FILE — O(files), not the 4000-position backlog
    assert(SnapshotTable.lastDvExportDriverRows == dvAdds.size.toLong,
      s"driver collected ${SnapshotTable.lastDvExportDriverRows} rows for ${dvAdds.size} DV'd files")
    assert(SnapshotTable.lastDvExportDriverRows < totalDeleted / 10,
      "driver-side rows must be bounded by files, not deleted positions")
    // and the replayed read still matches the engine exactly
    assert(DeltaExport.readTable(spark, new Path(delta)).count() === t.read().count())
    assert(t.read().count() === (n / 5).toLong)
    // read-side mirror of the driver bound: forcing the backlog over the
    // driver/broadcast threshold switches to executor-side DV decode + a
    // shuffle anti join — same rows, no driver position materialization
    val viaDistributed = DeltaExport.readTable(spark, new Path(delta), dvDriverBound = 1L)
      .select($"arcane_merge_key").as[String].collect().toSet
    val viaDriver = DeltaExport.readTable(spark, new Path(delta))
      .select($"arcane_merge_key").as[String].collect().toSet
    assert(viaDistributed == viaDriver, "distributed DV decode must match the driver path")
  }

  test("compaction after DV exports returns the log to plain adds") {
    val base = tmpDir("delta-dv-compact")
    val t = SnapshotTable(spark, s"$base/table")
    val delta = s"$base/delta"
    t.createOrReplace((1 to 60).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", numBuckets = 2)
    t.mergeOnRead(Seq(("k5", 2L, null, true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    t.exportDelta(delta)
    t.compact(fileSizeThresholdBytes = Long.MaxValue)
    t.exportDelta(delta)
    // post-compaction: live adds carry no DVs again; readFiles works
    val files = DeltaExport.readFiles(hfs, new Path(delta))
    assert(files.nonEmpty)
    assert(DeltaExport.readTable(spark, new Path(delta)).count() === 59)
  }

  private def capturingErr[A](body: => A): (A, String) = {
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
    try { val r = body; (r, buf.toString("UTF-8")) }
    finally System.setErr(old)
  }

  test("delete-key broadcast bound moves via StreamSpec; shuffle path and unknown legacy counts stay exact") {
    val base = tmpDir("delta-dv-bound")
    val t = SnapshotTable(spark, s"$base/table")
    t.createOrReplace((1 to 80).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", numBuckets = 4)
    t.mergeOnRead((1 to 20).map(i => (s"k$i", 2L, (null: String), true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    def rowsOf(dir: String) = DeltaExport.readTable(spark, new Path(dir))
      .select($"arcane_merge_key").as[String].collect().toSet
    // default bound: broadcast position-izing, quiet
    val (_, errA) = capturingErr(t.exportDelta(s"$base/deltaA"))
    assert(!errA.contains("exceed the broadcast"), "small backlog must broadcast quietly")
    val expect = rowsOf(s"$base/deltaA")
    assert(expect.size === 60)
    // the bound arrives from a parsed spec — a deployment tunes it in the
    // stream JSON, no recompile — and forcing 0 degrades LOUDLY to the
    // shuffle join while the exported DVs stay exact
    val spec = graft.pipeline.StreamSpec.fromJson(
      s"""{"sourcePath":"x","entityName":"e","targetLocation":"y",
         |"deleteBroadcastMaxRows":0}""".stripMargin)
    assert(spec.deleteBroadcastMaxRows === 0L)
    val (_, errB) = capturingErr(
      t.exportDelta(s"$base/deltaB", spec.deleteBroadcastMaxRows))
    assert(errB.contains("exceed the broadcast"), "forced shuffle must announce itself")
    assert(rowsOf(s"$base/deltaB") === expect)
    // legacy manifest entries with rows = -1 (unknown) must force the
    // shuffle path even under the default bound: counting unknown as zero
    // could broadcast-materialize an arbitrarily large backlog
    val cur = java.nio.file.Paths.get(s"$base/table/_current")
    val snapName = new String(java.nio.file.Files.readAllBytes(cur), "UTF-8").trim
    val snapPath = java.nio.file.Paths.get(s"$base/table/_snapshots/$snapName")
    val snap = SnapshotTable.fromJson(
      new String(java.nio.file.Files.readAllBytes(snapPath), "UTF-8"))
    val patched = snap.copy(deletes = snap.deletes.map(_.copy(rows = -1L)))
    java.nio.file.Files.write(snapPath, SnapshotTable.toJson(patched).getBytes("UTF-8"))
    // the raw overwrite invalidates Hadoop LocalFileSystem's checksum sidecar
    java.nio.file.Files.deleteIfExists(
      snapPath.resolveSibling("." + snapPath.getFileName.toString + ".crc"))
    assert(t.currentSnapshot.deletes.forall(_.rows == -1L))
    val (_, errC) = capturingErr(t.exportDelta(s"$base/deltaC"))
    assert(errC.contains("exceed the broadcast"),
      "unknown delete-row counts must refuse the broadcast, loudly")
    assert(rowsOf(s"$base/deltaC") === expect)
  }

  test("DV export is incremental across commits: untouched buckets' files are never opened") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.counting.impl", classOf[CountingFileSystem].getName)
    conf.set("fs.AbstractFileSystem.counting.impl", classOf[CountingAbstractFileSystem].getName)
    val base = tmpDir("delta-dv-incr")
    val t = SnapshotTable(spark, s"counting://$base/table")
    val delta = s"counting://$base/delta"
    t.createOrReplace((1 to 400).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", numBuckets = 8)
    // deletes spread over every bucket → first export DVs many buckets
    t.mergeOnRead((1 to 400 by 10).map(i => (s"k$i", 2L, (null: String), true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    t.exportDelta(delta)
    val delsBefore = t.currentSnapshot.deletes.map(d => (d.path, d.bucket)).toSet
    // a second MoR merge touching ONE key → one bucket's delete set changes
    t.mergeOnRead(Seq(("k3", 3L, (null: String), true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    val touched = t.currentSnapshot.deletes.map(d => (d.path, d.bucket)).toSet
      .diff(delsBefore).map(_._2)
    assert(touched.size === 1, s"one bucket must be touched, got $touched")
    val bStar = touched.head
    SnapshotTable.lastDvExportSkippedBuckets = -1L
    CountingFileSystem.reset()
    t.exportDelta(delta)
    val dataReads = CountingFileSystem.openedPaths.filter(_.contains("/table/data/"))
    assert(dataReads.nonEmpty, "the touched bucket must be position-ized")
    val offBucket = dataReads.filterNot(_.contains(s"/gbk=$bStar/"))
    assert(offBucket.isEmpty,
      s"untouched buckets' candidate/delete files must not be opened: $offBucket")
    assert(SnapshotTable.lastDvExportSkippedBuckets > 0,
      "unchanged DV'd buckets must reuse prior descriptors without a scan")
    // the reused descriptors keep the replayed read exact
    val viaLog = DeltaExport.readTable(spark, new Path(delta))
      .select($"arcane_merge_key").as[String].collect().toSet
    val direct = t.read().select($"arcane_merge_key").as[String].collect().toSet
    assert(viaLog === direct)
    assert(!direct.contains("k3") && !direct.contains("k11"))
    // a commit touching NO DV'd bucket state (pure re-export after the
    // above) — the idempotence fast path — then a plain-insert merge into
    // fresh keys: the export position-izes nothing it can reuse... the
    // third export must open NO file outside buckets whose state changed
    CountingFileSystem.reset()
    t.exportDelta(delta)
    assert(CountingFileSystem.openedPaths.forall(!_.contains("/table/data/")),
      "an idempotent re-export must not open any data file")
  }

  test("table locations containing '+' and spaces survive export + readTable") {
    // '+' is the character where URI percent-encoding and
    // x-www-form-urlencoded disagree: url_decode turns a bare '+' into a
    // space, while the driver-side Path.toUri.getPath keeps it literal.
    // Without the canonicalPathCol re-escape the two sides of every path
    // join disagree and exported DVs silently vanish (tombstoned rows
    // resurrected in external readers) — so pin a location with BOTH a
    // '+' and a space through the full MoR export + replay.
    val base = tmpDir("delta dv+plus")
    val t = SnapshotTable(spark, s"$base/ta+ble dir")
    val delta = s"$base/de+lta out"
    t.createOrReplace((1 to 50).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", numBuckets = 4)
    t.mergeOnRead((1 to 10).map(i => (s"k$i", 2L, (null: String), true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    assert(t.currentSnapshot.deletes.nonEmpty)
    t.exportDelta(delta)
    val viaLog = DeltaExport.readTable(spark, new Path(delta))
      .select($"arcane_merge_key").as[String].collect().toSet
    val direct = t.read().select($"arcane_merge_key").as[String].collect().toSet
    assert(direct.size === 40, "engine read must apply the tombstones")
    assert(viaLog === direct,
      "a '+'/space location must not break the DV path joins")
    // the partitioned point lookup's inner join on _tpath is the other
    // consumer of the same normalization
    val hit = DeltaExport.readTableForKey(spark, new Path(delta), "k20")
    assert(hit.count() === 1L)
    val miss = DeltaExport.readTableForKey(spark, new Path(delta), "k5")
    assert(miss.count() === 0L, "tombstoned key must resolve empty through the DV")
  }

  test("driver-materialization bounds parse from spec JSON, default, and validate") {
    val spec = graft.pipeline.StreamSpec.fromJson(
      """{"sourcePath":"x","entityName":"e","targetLocation":"y",
        |"deleteBroadcastMaxRows":123,"dvDriverDecodeMaxRows":456,
        |"dedupMaxPushdownIds":7}""".stripMargin)
    assert(spec.deleteBroadcastMaxRows === 123L)
    assert(spec.dvDriverDecodeMaxRows === 456L)
    assert(spec.dedupMaxPushdownIds === 7)
    val dft = graft.pipeline.StreamSpec.fromJson(
      """{"sourcePath":"x","entityName":"e","targetLocation":"y"}""")
    assert(dft.deleteBroadcastMaxRows === 2000000L)
    assert(dft.dvDriverDecodeMaxRows === 2000000L)
    assert(dft.dedupMaxPushdownIds === 10000)
    intercept[IllegalArgumentException](dft.copy(deleteBroadcastMaxRows = -1L))
    intercept[IllegalArgumentException](dft.copy(dvDriverDecodeMaxRows = -1L))
    intercept[IllegalArgumentException](dft.copy(dedupMaxPushdownIds = -1))
  }
}
