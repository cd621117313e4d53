package graft

import graft.ext.IvfIndex
import graft.tables.{AtomicRename, DeltaExport, SnapshotTable}
import org.apache.hadoop.fs.{FileAlreadyExistsException, Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._

import java.net.URI

/** A FileSystem registered WITHOUT an AbstractFileSystem binding — the
  * stock-s3a shape (Hadoop's core-default ships `fs.s3a.impl` guidance but
  * no `fs.AbstractFileSystem.s3a.impl`), under which every
  * FileContext-based atomic rename throws UnsupportedFileSystemException.
  */
class FsOnlyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "fsonly"
  override def getUri: URI = URI.create("fsonly:///")
}

/** [[graft.tables.AtomicRename]] — the one helper behind every pointer
  * swap / log publish. Pins (r19 verdict item 2) that a scheme with only a
  * FileSystem impl can still COMMIT everywhere: snapshot `_current`, Delta
  * log entries, the Iceberg version-hint and the IVF manifest all publish
  * through the loud FileSystem-only fallback instead of hard-failing —
  * previously a stock-configured S3 deployment could not commit at all.
  */
class AtomicRenameSpec extends SparkSpec {
  import spark.implicits._

  private def registerFsOnly(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.fsonly.impl", classOf[FsOnlyFileSystem].getName)

  private def fsFor(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("helper semantics on a FileSystem-only scheme: overwrite replaces, put-if-absent collides loudly, degrade warns") {
    registerFsOnly()
    val base = s"fsonly://${tmpDir("fsonly-helper")}"
    val fs = fsFor(base)
    val conf = spark.sparkContext.hadoopConfiguration
    def write(p: Path, s: String): Unit = {
      val o = fs.create(p, true); try o.write(s.getBytes("UTF-8")) finally o.close()
    }
    def read(p: Path): String = {
      val in = fs.open(p); try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val target = new Path(s"$base/ptr")
    val t1 = new Path(s"$base/t1"); write(t1, "v1")
    AtomicRename.overwrite(fs, conf, t1, target)
    assert(read(target) === "v1")
    val t2 = new Path(s"$base/t2"); write(t2, "v2")
    AtomicRename.overwrite(fs, conf, t2, target) // replace, not fail
    assert(read(target) === "v2")
    // the fallback renames the old target ASIDE (crash leaves a
    // recoverable dot-hidden .prev, never nothing) and cleans it up on
    // success
    assert(!fs.exists(new Path(s"$base/.ptr.prev")),
      "the aside pointer must be cleaned up after a successful publish")

    val t3 = new Path(s"$base/t3"); write(t3, "v3")
    intercept[FileAlreadyExistsException] {
      AtomicRename.putIfAbsent(fs, conf, t3, target)
    }
    assert(read(target) === "v2", "a refused put-if-absent must not clobber the target")
    val fresh = new Path(s"$base/fresh")
    AtomicRename.putIfAbsent(fs, conf, t3, fresh)
    assert(read(fresh) === "v3")

    assert(AtomicRename.warnedSchemes.contains("fsonly"),
      "the FileSystem-only degrade must warn (once per scheme)")

    // post-crash retry semantics: with the target MISSING and .prev
    // holding the only copy (the mid-publish crash state), a retry must
    // not destroy .prev before the new target is live
    val crashedPrev = new Path(s"$base/.ptr.prev")
    write(crashedPrev, "old-pointer")
    fs.delete(target, false) // simulate the crash window
    val t4 = new Path(s"$base/t4"); write(t4, "v4")
    AtomicRename.overwrite(fs, conf, t4, target)
    assert(read(target) === "v4")
    assert(!fs.exists(crashedPrev), "recovery state superseded once the publish lands")
  }

  test("snapshot commits, Delta log publish, Iceberg hint and IVF manifest all work on a FileSystem-only scheme") {
    registerFsOnly()
    val base = s"fsonly://${tmpDir("fsonly-e2e")}"

    // snapshot table: create + merge = two _current pointer swaps
    val t = SnapshotTable(spark, s"$base/table")
    t.createOrReplace((1 to 100).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", numBuckets = 4)
    t.merge((1 to 10).map(i => (s"k$i", 2L, s"v$i-upd", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    assert(t.read().count() === 100L)
    assert(t.read().where(col("payload") === "v1-upd").count() === 1L)

    // branch-head publishes route the SAME fallback with currentPtr under
    // _branches/ — the dot-hidden aside file must never surface as a
    // phantom branch in listings
    t.createBranch("audit")
    t.branchView("audit").merge(
      Seq(("k11", 3L, "v11-branch", false))
        .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    assert(t.listBranches === Seq("audit"),
      s"aside files must not read as branches: ${t.listBranches}")
    t.dropBranch("audit")

    // delta export: a put-if-absent commit JSON publish per version
    t.exportDelta(s"$base/delta")
    assert(DeltaExport.readTable(spark, new Path(s"$base/delta")).count() === 100L)

    // iceberg export: the version-hint overwrite publish
    t.exportIceberg(s"$base/iceberg")
    val hint = new Path(s"$base/iceberg/metadata/version-hint.text")
    val fs = fsFor(base)
    assert(fs.exists(hint), "iceberg export must publish its version hint")

    // IVF index: manifest swings on create and append
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = emb.where(col("vec_id") < 4).orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>"))
      .collect().map(r => graft.ext.Similarity.unitVector(r.getSeq[Double](0).toArray))
    val idx = s"$base/ivf"
    IvfIndex.create(spark, idx, cents, emb)
    IvfIndex.append(spark, idx,
      emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")), name = "inc1")
    assert(IvfIndex.topK(spark, idx, emb.where(col("vec_id") < 5), k = 3).count() > 0)

    assert(AtomicRename.warnedSchemes.contains("fsonly"))
  }
}
