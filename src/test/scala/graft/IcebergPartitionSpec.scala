package graft

import graft.tables.{IcebergExport, SnapshotTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

import scala.jdk.CollectionConverters._

/** The published `bucket[N]` partition spec end to end
  * (`/root/reference/docs/crd.md:211` — the reference's targets declare
  * `bucket(arcane_merge_key, 10)` so external engines prune point
  * lookups): an iceberg-layout table's export publishes the spec with
  * per-file tuples, a pre-migration xxhash64 table keeps an EMPTY spec
  * (a published spec over the wrong hash would mis-prune external
  * readers), adopted foreign files ride unpartitioned, and a
  * merge-key-filtered external-style read PLANS only matching-bucket
  * files — asserted against the scan's actual inputFiles, not just the
  * metadata.
  */
class IcebergPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(prefix: String, extraProps: Map[String, String] = Map.empty)
      : (SnapshotTable, String) = {
    val loc = tmpDir(prefix)
    val t = SnapshotTable(spark, loc)
    val df = (1 to 200).map(i => (s"k$i", i.toLong, s"v$i"))
      .toDF("arcane_merge_key", "versionnumber", "payload")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 8, extraProps = extraProps)
    (t, loc)
  }

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("iceberg-layout export publishes bucket(N, key) with per-file tuples") {
    val (t, loc) = mkTable("ice-part")
    t.exportIceberg(s"$loc/iceberg")
    val metaDir = new Path(s"$loc/iceberg/metadata")
    val hint = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$loc/iceberg/metadata/version-hint.text"))).trim
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"${metaDir.toString}/v$hint.metadata.json")))
    // default spec declares the bucket transform over the merge key
    assert(meta.get("default-spec-id").asInt() === 1)
    val spec = meta.get("partition-specs").elements()
    var found = false
    while (spec.hasNext) {
      val s = spec.next()
      if (s.get("spec-id").asInt() == 1) {
        val f = s.get("fields").elements().next()
        assert(f.get("name").asText() === "arcane_merge_key_bucket")
        assert(f.get("transform").asText() === "bucket[8]")
        assert(f.get("field-id").asInt() === 1000)
        found = true
      }
    }
    assert(found)
    // every live entry's tuple equals the recomputed bucket of its keys
    val (files, _) = IcebergExport.readFiles(fs, new Path(s"$loc/iceberg"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val tupleVal = f.partition.get("arcane_merge_key_bucket")
      assert(tupleVal.isDefined, s"${f.path}: no partition tuple")
      val actual = spark.read.parquet(f.path)
        .select(expr("iceberg_bucket(arcane_merge_key, 8)"))
        .distinct().collect().map(_.getInt(0)).toSet
      assert(actual === Set(tupleVal.get.get),
        s"${f.path}: tuple ${tupleVal.get} vs actual key buckets $actual")
    }
  }

  test("a key-filtered external-style read plans ONLY matching-bucket files") {
    val (t, loc) = mkTable("ice-prune")
    // a merge so the export carries EXISTING + ADDED entries
    t.addColumns(Seq(StructField("IsDelete", org.apache.spark.sql.types.BooleanType)))
    val change = Seq(("k7", 1000L, "updated", false), ("knew", 5L, "fresh", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.merge(change, "arcane_merge_key", "versionnumber", "IsDelete")
    t.exportIceberg(s"$loc/iceberg")

    val (planned, all) = IcebergExport.plannedDataFilesForKey(spark, s"$loc/iceberg", "k7")
    assert(planned.nonEmpty && planned.size < all.size,
      s"pruning must drop files: planned ${planned.size} of ${all.size}")
    val expected = spark.range(1).select(expr("iceberg_bucket('k7', 8)")).as[Int].head()
    planned.foreach { f =>
      assert(f.partition("arcane_merge_key_bucket") === Some(expected))
    }
    // the SCAN itself touches only the planned files (inputFiles = what
    // Spark will actually open), and the result is exact
    val df = IcebergExport.readTableForKey(spark, s"$loc/iceberg", "k7")
    def norm(s: String) = new java.net.URI(s).getPath
    val scanned = df.inputFiles.map(norm).toSet
    assert(scanned === planned.map(f => norm(f.path)).toSet)
    val rows = df.select("arcane_merge_key", "payload").as[(String, String)].collect()
    assert(rows.toSeq === Seq(("k7", "updated")))
  }

  test("xxhash64-layout tables export an EMPTY spec — never a lying one") {
    val (t, loc) = mkTable("ice-oldfn",
      Map(SnapshotTable.PropBucketFn -> SnapshotTable.BucketFnXxhash))
    t.exportIceberg(s"$loc/iceberg")
    val hint = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$loc/iceberg/metadata/version-hint.text")).trim
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$loc/iceberg/metadata/v$hint.metadata.json")))
    assert(meta.get("default-spec-id").asInt() === 0)
    val (files, _) = IcebergExport.readFiles(fs, new Path(s"$loc/iceberg"))
    assert(files.forall(_.partition.isEmpty))
    // and migration flips the export to the published layout
    t.migrateBucketLayout()
    t.exportIceberg(s"$loc/iceberg")
    val hint2 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$loc/iceberg/metadata/version-hint.text")).trim
    val meta2 = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$loc/iceberg/metadata/v$hint2.metadata.json")))
    assert(meta2.get("default-spec-id").asInt() === 1)
  }

  test("adopted foreign files ride unpartitioned and key lookups still scan them") {
    val (t, loc) = mkTable("ice-adopt")
    // a foreign parquet file outside the bucket layout
    val foreignDir = s"$loc/foreign"
    Seq(("zadopt1", 1L, "foreign1"), ("zadopt2", 1L, "foreign2"))
      .toDF("arcane_merge_key", "versionnumber", "payload")
      .coalesce(1).write.mode("overwrite").parquet(foreignDir)
    val part = new java.io.File(foreignDir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-")).map(_.getAbsolutePath).toSeq
    t.adoptFiles(part)
    t.exportIceberg(s"$loc/iceberg")
    val (files, _) = IcebergExport.readFiles(fs, new Path(s"$loc/iceberg"))
    val (tuples, plain) = files.partition(_.partition.nonEmpty)
    assert(tuples.nonEmpty && plain.size === 1, "adopted file must be the one unpartitioned entry")
    // a key lookup keeps the unpartitioned file (no claim → must scan) and
    // finds the adopted row
    val rows = IcebergExport.readTableForKey(spark, s"$loc/iceberg", "zadopt1")
      .select("payload").as[String].collect()
    assert(rows.toSeq === Seq("foreign1"))
    // while still pruning the bucketed files
    val (planned, all) = IcebergExport.plannedDataFilesForKey(spark, s"$loc/iceberg", "zadopt1")
    assert(planned.size < all.size)
  }

  test("MoR equality deletes still apply under a pruned key lookup") {
    val (t, loc) = mkTable("ice-prune-mor")
    t.addColumns(Seq(StructField("IsDelete", org.apache.spark.sql.types.BooleanType)))
    val change = Seq(("k7", 1000L, null.asInstanceOf[String], true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.mergeOnRead(change, "arcane_merge_key", "versionnumber", "IsDelete")
    assert(t.currentSnapshot.deletes.nonEmpty)
    t.exportIceberg(s"$loc/iceberg")
    val rows = IcebergExport.readTableForKey(spark, s"$loc/iceberg", "k7").collect()
    assert(rows.isEmpty, "deleted key must not resurface through the pruned read")
    val alive = IcebergExport.readTableForKey(spark, s"$loc/iceberg", "k8")
      .select("payload").as[String].collect()
    assert(alive.toSeq === Seq("v8"))
    // the equality-delete manifest is bucket-partitioned too: an external
    // reader planning one bucket applies only that bucket's delete files
    val hint = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$loc/iceberg/metadata/version-hint.text")).trim
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$loc/iceberg/metadata/v$hint.metadata.json")))
    val mlPath = meta.get("snapshots").elements().asScala.toSeq
      .find(_.get("snapshot-id").asLong() == meta.get("current-snapshot-id").asLong())
      .get.get("manifest-list").asText()
    val delManifests = readManifestList(mlPath).filter(_._2 == 1)
    assert(delManifests.nonEmpty && delManifests.exists(_._3 == 1),
      s"delete manifest must carry the bucket spec id: $delManifests")
  }

  test("numBuckets change across CREATE OR REPLACE evolves the spec, never mutates it") {
    val loc = tmpDir("ice-spec-evolve")
    val t = SnapshotTable(spark, loc)
    val df = (1 to 100).map(i => (s"k$i", i.toLong, s"v$i"))
      .toDF("arcane_merge_key", "versionnumber", "payload")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 8)
    t.exportIceberg(s"$loc/iceberg")
    // a replace rewrites everything — the new layout may change N
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 16)
    t.exportIceberg(s"$loc/iceberg")
    val hint = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$loc/iceberg/metadata/version-hint.text")).trim
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$loc/iceberg/metadata/v$hint.metadata.json")))
    val specs = meta.get("partition-specs").elements().asScala.toSeq
      .map(s => s.get("spec-id").asInt() ->
        s.get("fields").elements().asScala.map(_.get("transform").asText()).toSeq).toMap
    // specs are append-only: 0 (unpartitioned), 1 (bucket[8]), 2 (bucket[16])
    assert(specs(0).isEmpty && specs(1) == Seq("bucket[8]") && specs(2) == Seq("bucket[16]"))
    assert(meta.get("default-spec-id").asInt() === 2)
    // fresh partition field id for the new spec (ids are never reused)
    val fid2 = meta.get("partition-specs").elements().asScala.toSeq
      .find(_.get("spec-id").asInt() == 2).get
      .get("fields").elements().asScala.next().get("field-id").asInt()
    assert(fid2 === 1001 && meta.get("last-partition-id").asInt() === 1001)
    // lookups resolve the CURRENT spec's modulus
    val rows = IcebergExport.readTableForKey(spark, s"$loc/iceberg", "k42")
      .select("payload").as[String].collect()
    assert(rows.toSeq === Seq("v42"))
  }

  /** (manifest_path, content, partition_spec_id) rows of a manifest list. */
  private def readManifestList(p: String): Seq[(String, Int, Int)] = {
    val in = fs.open(new Path(p))
    val stream = new org.apache.avro.file.DataFileStream[org.apache.avro.generic.GenericRecord](
      in, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    try {
      val out = Seq.newBuilder[(String, Int, Int)]
      while (stream.hasNext) {
        val r = stream.next()
        out += ((r.get("manifest_path").toString,
          r.get("content").asInstanceOf[Int],
          r.get("partition_spec_id").asInstanceOf[Int]))
      }
      out.result()
    } finally stream.close()
  }
}
