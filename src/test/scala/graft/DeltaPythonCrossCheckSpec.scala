package graft

import graft.tables.SnapshotTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField}

import scala.sys.process._

/** Cross-IMPLEMENTATION validation of the Delta log export:
  * `tools/delta_validate.py` is an independently-written pure-Python
  * reader (JSON log replay + DuckDB parquet recount, zero shared code
  * with the Scala writer/reader) following only the public Delta
  * transaction-log protocol. It re-reads every live parquet file,
  * cross-checks `stats.numRecords` and `size` against real footers, and
  * enforces the structural invariants (contiguous versions, protocol +
  * metaData at v0, stable table id, adds/removes well-formed) — the same
  * role the Iceberg python validator plays for that leg.
  */
class DeltaPythonCrossCheckSpec extends SparkSpec {
  import spark.implicits._

  private def pythonWithDuckdb: Boolean =
    scala.util.Try(Seq("python3", "-c", "import duckdb").! == 0).getOrElse(false)

  private def validate(exportDir: String, args: Seq[String]): (Int, String) = {
    val out = new StringBuilder
    val code = Process(Seq("python3", "tools/delta_validate.py", exportDir) ++ args)
      .!(ProcessLogger(l => out.append(l), l => info(s"[validator] $l")))
    (code, out.toString)
  }

  test("python validator replays head + time travel across merge and schema evolution") {
    assume(pythonWithDuckdb, "python3 + duckdb not available")
    val base = tmpDir("delta-crosscheck")
    val t = SnapshotTable(spark, s"$base/table")
    val delta = s"$base/delta"

    val a = (1 to 200).map(i => (i.toLong, s"v$i", 1L, false))
      .toDF("id", "payload", "versionnumber", "IsDelete")
    t.createOrReplace(a, "id", numBuckets = 4)
    t.exportDelta(delta)

    // commit 1: update 5 keys, tombstone 2
    val upd = (1 to 7).map(i => (i.toLong, s"V$i", 2L, i <= 2))
      .toDF("id", "payload", "versionnumber", "IsDelete")
    t.merge(upd, "id", "versionnumber", "IsDelete")
    t.exportDelta(delta)

    // commit 2: widen schema, insert 10 new keys
    t.addColumns(Seq(StructField("score", LongType, nullable = true)))
    val ins = (201 to 210).map(i => (i.toLong, s"v$i", 1L, false, i * 10L))
      .toDF("id", "payload", "versionnumber", "IsDelete", "score")
    t.merge(ins, "id", "versionnumber", "IsDelete")
    t.exportDelta(delta)

    val (c2, out2) = validate(delta, Seq("--expect-rows", "208"))
    assert(c2 == 0, s"head validation failed: $out2")
    assert(out2.contains("\"errors\": 0") && out2.contains("\"version\": 2"), out2)

    val (c0, out0) = validate(delta, Seq("--at", "0", "--expect-rows", "200"))
    assert(c0 == 0, s"time travel to v0 failed: $out0")

    val (c1, out1) = validate(delta, Seq("--at", "1", "--expect-rows", "198"))
    assert(c1 == 0, s"time travel to v1 failed: $out1")

    // the validator must actually CATCH corruption: flip a numRecords stat
    // in the HEAD commit (v0 adds may be superseded by later rewrites)
    val v0 = new java.io.File(s"$delta/_delta_log/00000000000000000002.json")
    val txt = scala.io.Source.fromFile(v0).mkString
    val broken = txt.replaceFirst("\\\\\"numRecords\\\\\":(\\d+)", "\\\\\"numRecords\\\\\":999999")
    assert(broken != txt, "fixture must contain a numRecords stat to corrupt")
    val bak = txt
    try {
      java.nio.file.Files.writeString(v0.toPath, broken)
      val (cBad, outBad) = validate(delta, Seq.empty)
      assert(cBad != 0 && outBad.contains("numRecords"),
        s"validator must flag a stats/footer mismatch: $outBad")
    } finally java.nio.file.Files.writeString(v0.toPath, bak)
  }
}
