package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.GraftManifestRead
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The listing-free scan bridge ([[org.apache.spark.sql.GraftManifestRead]])
  * must be OBSERVATIONALLY IDENTICAL to `spark.read.schema(s).parquet(paths)`
  * — it swaps only the FileIndex (manifest-known sizes instead of a
  * filesystem listing), so rows, schema-on-read semantics, `_metadata`
  * columns and pushdown must all survive unchanged. These pin the
  * contract the snapshot/Iceberg/Delta readers now rely on.
  */
class ManifestReadSpec extends SparkSpec {

  private def writeParts(dir: String): Seq[(Path, Long)] = {
    spark.range(1000)
      .select(col("id"), (col("id") * 3).as("v"), concat(lit("s"), col("id") % 7).as("tag"))
      .repartition(3)
      .write.mode("overwrite").parquet(dir)
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .sortBy(_.getName)
      .map(f => (new Path("file:" + f.getAbsolutePath), f.length()))
      .toSeq
  }

  test("manifest-fed scan returns the same rows and schema as the listing reader") {
    val dir = tmpDir("manifest-read")
    val files = writeParts(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType), StructField("tag", StringType)))
    val viaListing = spark.read.schema(schema).parquet(files.map(_._1.toString): _*)
    val viaManifest = GraftManifestRead.read(spark, "parquet", schema, files)
    assert(viaManifest.schema === viaListing.schema)
    assert(viaManifest.count() === 1000)
    assert(viaManifest.exceptAll(viaListing).isEmpty && viaListing.exceptAll(viaManifest).isEmpty)
  }

  test("schema-on-read fills a column missing from the files with NULL (ADD COLUMNS semantics)") {
    val dir = tmpDir("manifest-read-evolve")
    val files = writeParts(dir)
    val widened = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType),
      StructField("tag", StringType), StructField("added_later", DoubleType)))
    val df = GraftManifestRead.read(spark, "parquet", widened, files)
    assert(df.schema.fieldNames.toSeq === Seq("id", "v", "tag", "added_later"))
    assert(df.where(col("added_later").isNotNull).count() === 0)
    assert(df.count() === 1000)
  }

  test("_metadata.file_path and row_index resolve through the manifest index (DV/seq-attach contract)") {
    val dir = tmpDir("manifest-read-meta")
    val files = writeParts(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType), StructField("tag", StringType)))
    val df = GraftManifestRead.read(spark, "parquet", schema, files)
      .select(col("id"), col("_metadata.file_path").as("fp"), col("_metadata.row_index").as("ri"))
    val paths = df.select("fp").distinct().collect().map(_.getString(0)).toSet
    assert(paths === files.map(_._1.toString).toSet)
    // row_index restarts at 0 within each file
    assert(df.groupBy("fp").agg(min("ri")).collect().forall(_.getLong(1) === 0L))
    assert(df.count() === 1000)
  }

  test("filter pushdown reaches the scan (PushedFilters non-empty) and prunes rows") {
    val dir = tmpDir("manifest-read-pushdown")
    val files = writeParts(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType), StructField("tag", StringType)))
    val df = GraftManifestRead.read(spark, "parquet", schema, files).where(col("id") < 10)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.isDefined, "expected a FileSourceScanExec over the manifest index")
    assert(scan.get.metadata.get("PushedFilters").exists(_.contains("LessThan(id,10)")),
      s"pushed filters missing: ${scan.get.metadata.get("PushedFilters")}")
    assert(df.count() === 10)
  }

  test("an understated length is refused upstream: callers must pass true sizes") {
    // the bridge itself requires strictly positive lengths; the table
    // layer guards bytes > 0 and falls back — pin the require so a future
    // caller cannot silently truncate a scan with a -1 (or an
    // empty-scan-planning 0) placeholder
    val dir = tmpDir("manifest-read-guard")
    val files = writeParts(dir)
    val schema = StructType(Seq(StructField("id", LongType)))
    intercept[IllegalArgumentException] {
      GraftManifestRead.read(spark, "parquet", schema, files.map { case (p, _) => (p, -1L) })
    }
    intercept[IllegalArgumentException] {
      GraftManifestRead.read(spark, "parquet", schema, files.map { case (p, _) => (p, 0L) })
    }
  }

  test("_metadata.file_modification_time is epoch 0 on manifest-fed scans (pinned contract)") {
    // The synthesized FileStatus carries mtime 0 — manifests do not record
    // modification times, and none of the engine's readers consume the
    // column. This pins that OBSERVABLE divergence from the listing reader
    // explicitly: a future consumer of file_modification_time must either
    // carry real mtimes into the bridge or keep using the listing reader.
    val dir = tmpDir("manifest-read-mtime")
    val files = writeParts(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", LongType), StructField("tag", StringType)))
    val mtimes = GraftManifestRead.read(spark, "parquet", schema, files)
      .select(col("_metadata.file_modification_time").cast("long").as("mt"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(mtimes === Set(0L), s"expected pinned epoch-0 mtimes, got $mtimes")
  }
}
