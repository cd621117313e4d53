package graft

import graft.tables.{DeltaExport, SnapshotTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The bucket layout as a Delta PARTITION COLUMN: iceberg-layout tables
  * publish `<key>_bucket` in partitionColumns with per-add
  * `partitionValues` (protocol: partition data lives in the log, not the
  * parquet files) plus the transform parameters in
  * `metaData.configuration` (`graft.bucket.source`/`graft.bucket.n`), so
  * an external reader doing the reference's point-lookup pattern prunes
  * adds by recomputing `iceberg_bucket(key, n)`. xxhash64-layout tables
  * stay unpartitioned — a published layout over the wrong hash would
  * silently mis-prune.
  */
class DeltaPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("iceberg-layout export publishes the partition column with truthful per-add values") {
    val base = tmpDir("delta-part")
    val t = SnapshotTable(spark, s"$base/table")
    val df = (1 to 200).map(i => (s"k$i", i.toLong, s"v$i"))
      .toDF("arcane_merge_key", "versionnumber", "payload")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 8)
    t.exportDelta(s"$base/delta")

    val log = scala.io.Source.fromFile(s"$base/delta/_delta_log/00000000000000000000.json")
      .getLines().toSeq
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = log.map(mapper.readTree).find(_.has("metaData")).get.get("metaData")
    // partition column declared, in the schema, with the transform params
    assert(meta.get("partitionColumns").elements().next().asText()
      === "arcane_merge_key_bucket")
    assert(meta.get("schemaString").asText().contains("arcane_merge_key_bucket"))
    assert(meta.get("configuration").get("graft.bucket.source").asText()
      === "arcane_merge_key")
    assert(meta.get("configuration").get("graft.bucket.n").asText() === "8")
    // every add's partition value equals the recomputed bucket of its keys
    val adds = log.map(mapper.readTree).filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty)
    adds.foreach { a =>
      val v = a.get("partitionValues").get("arcane_merge_key_bucket").asText().toInt
      val uri = java.net.URLDecoder.decode(a.get("path").asText(), "UTF-8")
      val actual = spark.read.parquet(uri)
        .select(expr("iceberg_bucket(arcane_merge_key, 8)"))
        .distinct().collect().map(_.getInt(0)).toSet
      assert(actual === Set(v), s"$uri: declared $v, actual $actual")
    }

    // readTable materializes the column from the log — per-row equal to
    // the recomputed transform — and a partition-filtered read is exact
    val viaLog = DeltaExport.readTable(spark, new Path(s"$base/delta"))
    assert(viaLog.columns.contains("arcane_merge_key_bucket"))
    assert(viaLog.where(
      col("arcane_merge_key_bucket") =!= expr("iceberg_bucket(arcane_merge_key, 8)"))
      .count() === 0)
    val b = spark.range(1).select(expr("iceberg_bucket('k7', 8)")).as[Int].head()
    val hit = viaLog.where(col("arcane_merge_key_bucket") === b &&
      col("arcane_merge_key") === "k7").select("payload").as[String].collect()
    assert(hit.toSeq === Seq("v7"))
  }

  test("xxhash64-layout tables export unpartitioned; a partitioned dir refuses a layout flip") {
    val base = tmpDir("delta-part-old")
    val t = SnapshotTable(spark, s"$base/table")
    val df = (1 to 50).map(i => (s"k$i", i.toLong, s"v$i"))
      .toDF("arcane_merge_key", "versionnumber", "payload")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 4,
      extraProps = Map(SnapshotTable.PropBucketFn -> SnapshotTable.BucketFnXxhash))
    t.exportDelta(s"$base/delta")
    val log = scala.io.Source.fromFile(s"$base/delta/_delta_log/00000000000000000000.json")
      .getLines().toSeq
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = log.map(mapper.readTree).find(_.has("metaData")).get.get("metaData")
    assert(!meta.get("partitionColumns").elements().hasNext)
    assert(!DeltaExport.readTable(spark, new Path(s"$base/delta"))
      .columns.contains("arcane_merge_key_bucket"))
    // migrating the table mid-dir must NOT silently flip the dir's layout
    // (prior adds carry empty tuples) — the dir stays unpartitioned
    t.migrateBucketLayout()
    t.exportDelta(s"$base/delta")
    val head = DeltaExport.logVersions(fs, new Path(s"$base/delta")).last
    val log1 = scala.io.Source.fromFile(
      f"$base/delta/_delta_log/$head%020d.json").getLines().toSeq
    log1.map(mapper.readTree).find(_.has("metaData")).foreach { m =>
      assert(!m.get("metaData").get("partitionColumns").elements().hasNext)
    }
    assert(DeltaExport.readTable(spark, new Path(s"$base/delta")).count() === 50)
  }

  test("null-key rows publish the protocol's null partition value") {
    val base = tmpDir("delta-part-null")
    val t = SnapshotTable(spark, s"$base/table")
    val df = Seq(("k1", 1L, "a"), (null.asInstanceOf[String], 1L, "nullkey"), ("k2", 1L, "b"))
      .toDF("arcane_merge_key", "versionnumber", "payload")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 4)
    t.exportDelta(s"$base/delta")
    val log = scala.io.Source.fromFile(s"$base/delta/_delta_log/00000000000000000000.json")
      .getLines().toSeq
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val nullAdds = log.map(mapper.readTree).filter(_.has("add")).map(_.get("add"))
      .filter(_.get("partitionValues").get("arcane_merge_key_bucket").isNull)
    assert(nullAdds.size === 1, "the null-key bucket must publish a null partition value")
    // and the reader materializes it as a null column value
    val viaLog = DeltaExport.readTable(spark, new Path(s"$base/delta"))
    val row = viaLog.where(col("payload") === "nullkey")
      .select("arcane_merge_key_bucket").collect()
    assert(row.length === 1 && row.head.isNullAt(0))
  }

  test("readTableForKey plans only the key's bucket files and applies its DVs") {
    val base = tmpDir("delta-part-lookup")
    val t = SnapshotTable(spark, s"$base/table")
    val delta = new Path(s"$base/delta")
    t.createOrReplace((1 to 400).map(i => (s"k$i", 1L, s"v$i"))
      .toDF("arcane_merge_key", "versionnumber", "payload"),
      "arcane_merge_key", numBuckets = 8)
    // tombstone k7 via merge-on-read so the lookup must apply a DV
    t.addColumns(Seq(org.apache.spark.sql.types.StructField("IsDelete",
      org.apache.spark.sql.types.BooleanType)))
    t.mergeOnRead(Seq(("k7", 2L, (null: String), true), ("k9", 2L, "updated", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    assert(t.currentSnapshot.deletes.nonEmpty)
    t.exportDelta(delta.toString)
    // PRUNING: the planned set is a strict subset covering one bucket
    val (kept, all) = DeltaExport.plannedFilesForKey(spark, delta, "k9")
    assert(kept.nonEmpty && kept.size < all.size,
      s"lookup must prune: kept ${kept.size} of ${all.size}")
    assert(kept.toSet.subsetOf(all.toSet))
    // value correctness through the pruned path: updated, untouched,
    // DV-tombstoned (empty), and absent keys
    def lookup(k: String) = DeltaExport.readTableForKey(spark, delta, k)
      .select($"arcane_merge_key", $"payload").as[(String, String)].collect().toSeq
    assert(lookup("k9") == Seq(("k9", "updated")))
    assert(lookup("k123") == Seq(("k123", "v123")))
    assert(lookup("k7").isEmpty, "a DV-tombstoned key must resolve empty through the pruned set")
    assert(lookup("nosuchkey").isEmpty)
    // an unpartitioned (xxhash64-layout or legacy) export refuses loudly
    val t2 = SnapshotTable(spark, s"$base/table2")
    t2.createOrReplace(Seq(("a", 1L, "x")).toDF("arcane_merge_key", "versionnumber", "payload"),
      "arcane_merge_key", numBuckets = 2,
      extraProps = Map(SnapshotTable.PropBucketFn -> SnapshotTable.BucketFnXxhash))
    t2.exportDelta(s"$base/delta2")
    val e = intercept[IllegalArgumentException](
      DeltaExport.readTableForKey(spark, new Path(s"$base/delta2"), "a"))
    assert(e.getMessage.contains("no bucket partition column"))
  }
}
