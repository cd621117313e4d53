package graft

import graft.tables.SnapshotTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

/** Bucket-layout versioning ([[graft.tables.SnapshotTable.PropBucketFn]]):
  * new tables physically bucket by the Iceberg spec's `bucket[N]`
  * transform, pre-migration manifests keep pruning under xxhash64, and
  * [[graft.tables.SnapshotTable.migrateBucketLayout]] rewrites one into
  * the other without changing table content — the layout half of the
  * truthful-partition-spec story (the export half is pinned by
  * IcebergExportSpec / the Python validator).
  */
class BucketLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def df100 = (1 to 100).map(i => (s"k$i", i.toLong, s"v$i"))
    .toDF("arcane_merge_key", "versionnumber", "payload")

  private def fileBuckets(t: SnapshotTable, loc: String): Seq[(Int, Set[Int])] = {
    val snap = t.currentSnapshot
    val n = snap.numBuckets
    snap.files.map { f =>
      val actual = spark.read.parquet(s"$loc/data/${f.path}")
        .select(expr(s"iceberg_bucket(arcane_merge_key, $n)"))
        .distinct().collect().map(_.getInt(0)).toSet
      (f.bucket, actual)
    }
  }

  test("new tables default to the iceberg layout and place rows spec-exactly") {
    val loc = tmpDir("bkt-new")
    val t = SnapshotTable(spark, loc)
    t.createOrReplace(df100, "arcane_merge_key", numBuckets = 4)
    assert(SnapshotTable.bucketFnOf(t.properties) === SnapshotTable.BucketFnIceberg)
    // every data file's rows hash into exactly the manifest's bucket
    fileBuckets(t, loc).foreach { case (manifest, actual) =>
      assert(actual === Set(manifest),
        s"file claims bucket $manifest but holds rows of buckets $actual")
    }
    // and the layout survives a merge
    t.addColumns(Seq(StructField("IsDelete", org.apache.spark.sql.types.BooleanType)))
    val change = Seq(("k1", 1000L, "updated", false), ("knew", 5L, "fresh", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.merge(change, "arcane_merge_key", "versionnumber", "IsDelete")
    fileBuckets(t, loc).foreach { case (manifest, actual) => assert(actual === Set(manifest)) }
  }

  test("a manifest without the property parses to xxhash64 and keeps pruning correctly") {
    val loc = tmpDir("bkt-legacy")
    val t = SnapshotTable(spark, loc)
    // pin the OLD layout explicitly, then strip the property from the
    // manifest on disk — exactly the shape of a manifest written before
    // the property existed
    t.createOrReplace(df100, "arcane_merge_key", numBuckets = 4,
      extraProps = Map(SnapshotTable.PropBucketFn -> SnapshotTable.BucketFnXxhash))
    val cur = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$loc/_current")).trim
    val snapPath = java.nio.file.Paths.get(s"$loc/_snapshots/$cur")
    val stripped = java.nio.file.Files.readString(snapPath)
      .replace("\"write.bucket.fn\":\"xxhash64\",", "")
      .replace(",\"write.bucket.fn\":\"xxhash64\"", "")
    assert(stripped != java.nio.file.Files.readString(snapPath), "property must have been present")
    java.nio.file.Files.writeString(snapPath, stripped)
    // the local FS keeps a checksum sidecar; drop it for the in-place edit
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$loc/_snapshots/.$cur.crc"))
    val t2 = SnapshotTable(spark, loc)
    assert(SnapshotTable.bucketFnOf(t2.properties) === SnapshotTable.BucketFnXxhash)
    // bucket-pruned reads still honor the hash the files were placed by
    val full = t2.read().where(pmod(xxhash64(col("arcane_merge_key")), lit(4)) === 2)
      .select("arcane_merge_key").as[String].collect().sorted.toSeq
    val pruned = t2.read(Some(Set(2))).select("arcane_merge_key").as[String].collect().sorted.toSeq
    assert(pruned === full && pruned.nonEmpty)
  }

  test("the iceberg bucket column stays inside whole-stage codegen") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    // spark.range leaf: a LocalRelation would constant-fold the expression
    // away and prove nothing
    val df = spark.range(1000)
      .select(concat(lit("k"), col("id")).as("k"))
      .select(SnapshotTable.bucketColumn(col("k"), 16, SnapshotTable.BucketFnIceberg).as("b"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty,
      s"bucket assignment must be codegen'd (it runs per row on every write):\n" +
        df.queryExecution.executedPlan)
    assert(df.distinct().count() <= 16)
  }

  test("migrateBucketLayout rewrites xxhash64 tables in place, content-identical") {
    val loc = tmpDir("bkt-migrate")
    val t = SnapshotTable(spark, loc)
    t.createOrReplace(df100, "arcane_merge_key", numBuckets = 4,
      extraProps = Map(SnapshotTable.PropBucketFn -> SnapshotTable.BucketFnXxhash))
    t.addColumns(Seq(StructField("IsDelete", org.apache.spark.sql.types.BooleanType)))
    // leave outstanding MoR deletes so the migration must absorb them
    val change = Seq(("k1", 1000L, "updated", false), ("k3", 1000L, null, true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.mergeOnRead(change, "arcane_merge_key", "versionnumber", "IsDelete")
    assert(t.currentSnapshot.deletes.nonEmpty)
    val before = t.read().select("arcane_merge_key", "versionnumber", "payload")
      .as[(String, Long, String)].collect().toSet

    val migrated = t.migrateBucketLayout()
    assert(SnapshotTable.bucketFnOf(migrated.properties) === SnapshotTable.BucketFnIceberg)
    assert(migrated.deletes.isEmpty, "migration rewrite must absorb equality deletes")
    val after = t.read().select("arcane_merge_key", "versionnumber", "payload")
      .as[(String, Long, String)].collect().toSet
    assert(after === before)
    // physically on the new layout
    fileBuckets(t, loc).foreach { case (manifest, actual) => assert(actual === Set(manifest)) }
    // idempotent
    assert(t.migrateBucketLayout().version === migrated.version)
    // the PRE-migration snapshot time-travels with ITS hash: its
    // properties still say xxhash64, so per-snapshot pruning stays exact
    val old = t.readAt(migrated.version - 1)
    assert(old.count() === before.size.toLong)
  }
}
