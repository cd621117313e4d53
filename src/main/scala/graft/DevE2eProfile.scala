package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: phase timings for the CDC e2e gate (deleted before commit). */
object DevE2eProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    import graft.pipeline.{CdcPipeline, StreamSpec}
    import graft.queries.CdcFixtureGen
    import graft.tables.SnapshotTable
    import org.apache.spark.sql.functions._

    // force regeneration to measure materialize honestly
    val digest = java.lang.Integer.toHexString(sfDir.hashCode)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"${System.getProperty("java.io.tmpdir")}/graft-cdc-export-$digest"))

    val root = timed("materialize") { CdcFixtureGen.materialize(spark, sfDir) }
    val target = s"${System.getProperty("java.io.tmpdir")}/graft-cdc-target-prof"
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/graft-cdc-ckpt-prof"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(target))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val spec = StreamSpec(
      sourcePath = root, entityName = CdcFixtureGen.EntityName,
      targetLocation = target, backfillBehavior = "Overwrite", numBuckets = 16,
      changeCaptureIntervalSeconds = 0, checkpointLocation = Some(ckpt))

    CdcFixtureGen.stampChangelog(root, CdcFixtureGen.Folder1)
    // fine-grained backfill phases
    locally {
      import graft.sources.SynapseCdmLayout
      val layout = SynapseCdmLayout(spec.sourcePath, spec.entityName, "Changelog/changelog.info")
      val conf = spark.sparkContext.hadoopConfiguration
      val typedSchema = timed("bf:schema") { layout.entitySchema(conf, layout.changelogValue(conf)) }
      val raw = timed("bf:read.load") {
        spark.read.format("synapse-cdm")
          .option("path", spec.sourcePath).option("entity", spec.entityName).load()
      }
      val staged = timed("bf:stage(plan)") { CdcPipeline.stage(raw, typedSchema, spec) }
      timed("bf:raw.count cold") { raw.count() }
      timed("bf:raw.count warm") { raw.count() }
      val typedOnly = graft.cdm.CsvCast(typedSchema, raw.drop("_folder"))
      timed("bf:cast.count") { typedOnly.count() }
      timed("bf:cast.agg") { typedOnly.agg(max(col("versionnumber"))).head() }
      timed("bf:count") { staged.count() }
      timed("bf:count warm") { staged.count() }
      val table = SnapshotTable(spark, spec.targetLocation)
      timed("bf:createOrReplace") {
        val live = staged.where(!coalesce(col("IsDelete").cast("boolean"), lit(false)))
        table.createOrReplace(live, graft.ops.MergeKey.ColumnName, spec.numBuckets,
          Map(SnapshotTable.PropWatermark -> CdcFixtureGen.Folder1))
      }
      timed("bf:createOrReplace warm") {
        val live = staged.where(!coalesce(col("IsDelete").cast("boolean"), lit(false)))
        table.createOrReplace(live, graft.ops.MergeKey.ColumnName, spec.numBuckets,
          Map(SnapshotTable.PropWatermark -> CdcFixtureGen.Folder1))
      }
    }
    CdcFixtureGen.stampChangelog(root, CdcFixtureGen.Folder2)
    val q = timed("startStream") { CdcPipeline.startStream(spark, spec) }
    timed("processAllAvailable") { q.processAllAvailable() }
    timed("stop") { q.stop() }
    timed("final read+count") {
      SnapshotTable(spark, target).read().select(col("Id")).count()
    }
    spark.stop()
  }
}
