package graft

import graft.queries.Queries

/** The bench's r18 sections: the MoR export phase/IO profile and the
  * loud-degrade legs. Pins that the fragments are valid JSON, that the
  * degraded plans return BIT-IDENTICAL results to the bounded ones
  * (match:true — the contract that makes a loud degrade safe), and that
  * the idempotent re-export's IO is a small fraction of the first
  * export's (the measured form of "per-commit cost tracks the change
  * set").
  */
class ExportProfileSpec extends SparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def parse(fragment: String) = mapper.readTree(s"{$fragment}")

  test("export profile: valid JSON, both legs read rows, re-export IO is metadata-sized") {
    val node = parse(Queries.exportProfileJson(spark, sf()))
    val prof = node.get("export_profile")
    Seq("iceberg_mor", "delta_mor").foreach { leg =>
      val l = prof.get(leg)
      assert(l != null, s"missing $leg")
      assert(l.get("read_rows").asLong() > 0, leg)
      assert(l.get("export_files_opened").asLong() > 0, leg)
      // an idempotent re-export may re-read export metadata, but it must
      // not open a single table DATA file — the O(new files) invariant
      assert(l.get("reexport_data_files_opened").asLong() === 0L,
        s"$leg re-export opened data files: ${l.get("reexport_data_files_opened")}")
    }
  }

  test("export profile survives a PRIOR section caching a counting FS under a conf without the AbstractFileSystem key (r19 bench order)") {
    // the r19 failure, reproduced in the bench's exact section order:
    // (1) a conf that has ONLY fs.counting.impl (the old incwork
    // registration), (2) a spark.read through counting: that CACHES a
    // CountingFileSystem whose frozen conf clone lacks the
    // AbstractFileSystem binding, (3) the export-profile legs, whose
    // Delta commit publish used to resolve FileContext from that stale
    // fs.getConf and die with UnsupportedFileSystemException — silently
    // swallowed into "export_profile":{} by the bench wrapper. The fix is
    // two-sided (incwork registers BOTH keys; the rename helper resolves
    // from the LIVE conf), so this passes even from the stale-cache state.
    val conf = spark.sparkContext.hadoopConfiguration
    // evict any counting FS a prior suite cached with a healthy conf,
    // then re-cache one under the broken-shape conf
    org.apache.hadoop.fs.FileSystem
      .get(java.net.URI.create("counting:///"), conf).close()
    conf.unset("fs.AbstractFileSystem.counting.impl")
    conf.set("fs.counting.impl", classOf[CountingFileSystem].getName)
    spark.read.parquet(s"counting:${sf()}/documents.parquet").count()

    // bench order: the incremental-tier work section first...
    assert(Queries.incrementalTierWorkJson(spark, sf()).nonEmpty)
    // ...then the export profile, which must be COMPLETE, not {}
    val prof = parse(Queries.exportProfileJson(spark, sf())).get("export_profile")
    Seq("iceberg_mor", "delta_mor").foreach { leg =>
      val l = prof.get(leg)
      assert(l != null, s"missing $leg after a stale counting-FS cache")
      assert(l.get("read_rows").asLong() > 0, leg)
      assert(l.get("reexport_data_files_opened").asLong() === 0L, leg)
    }
  }

  test("degraded legs: shuffle position-izing, executor DV decode and lazy candidate plan all match the bounded paths") {
    val node = parse(Queries.degradedPathsJson(spark, sf()))
    val d = node.get("degraded")
    assert(d.get("delta_read_executor_dv").get("match").asBoolean(),
      "executor-DV-decode read must be bit-identical to the driver-decode read")
    assert(d.get("delta_read_executor_dv").get("rows").asLong() > 0)
    assert(d.get("indexed_near_dup_lazy").get("match").asBoolean(),
      "lazy-plan candidate path must be bit-identical to the pushdown path")
    Seq("delta_export_shuffle_positionize", "delta_read_executor_dv", "indexed_near_dup_lazy")
      .foreach(k => assert(d.get(k).get("sec").asDouble() > 0, k))
  }
}
