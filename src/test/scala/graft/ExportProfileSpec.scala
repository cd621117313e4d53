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
