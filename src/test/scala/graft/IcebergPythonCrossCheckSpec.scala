package graft

import graft.tables.SnapshotTable
import org.apache.spark.sql.functions._

import scala.sys.process._

/** Cross-IMPLEMENTATION validation of the Iceberg v2 export: the export
  * is consumed by `tools/iceberg_validate.py`, an independently-written
  * pure-Python reader (its own Avro binary decoder + DuckDB row
  * reconstruction) that shares zero code with the Scala writer/reader
  * pair and follows only the public Avro + Iceberg specs. This is the
  * offline stand-in for the reference's live-catalog round-trip through
  * Trino (`/root/reference/docker-compose.yaml:54-78`): a spec-
  * interpretation bug in the writer that the Scala reader compensates
  * for would surface here as a validator ERROR or a row/hash mismatch.
  *
  * The validator re-counts every live parquet file, recomputes manifest-
  * list file/row counts from the entries, checks actual column min/max
  * against the exported bounds, and rebuilds the live row set applying
  * both v2 delete-sequence rules — so the scenario below (update +
  * tombstone + re-insert across merge-on-read commits) only passes if
  * the exported sequence numbers encode exactly the spec's semantics.
  */
class IcebergPythonCrossCheckSpec extends SparkSpec {
  import spark.implicits._

  private def pythonWithDuckdb: Boolean =
    scala.util.Try(Seq("python3", "-c", "import duckdb").! == 0).getOrElse(false)

  private val validator = "tools/iceberg_validate.py"

  /** Run the validator; returns (exitCode, stdout JSON line). */
  private def validate(exportDir: String, args: Seq[String]): (Int, String) = {
    val out = new StringBuilder
    val code = Process(Seq("python3", validator, exportDir) ++ args)
      .!(ProcessLogger(l => out.append(l), l => info(s"[validator] $l")))
    (code, out.toString)
  }

  test("python validator round-trips head + time travel through a MoR lifecycle") {
    assume(pythonWithDuckdb, "python3 + duckdb not available")
    val base = tmpDir("py-crosscheck")
    val tableLoc = s"$base/table"
    val exportDir = s"$base/iceberg"
    val t = SnapshotTable(spark, tableLoc)

    // snapshot A: 200 keys
    val df = (1 to 200).map(i => (s"k$i", 1L, s"v$i", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete")
    t.createOrReplace(df, "arcane_merge_key", numBuckets = 8)
    val snapA = t.currentSnapshot.version + 1
    t.exportIceberg(exportDir)

    // snapshot B (merge-on-read): update k1, tombstone k2 — equality
    // deletes outstanding, NO compaction
    t.mergeOnRead(Seq(("k1", 5L, "u1", false), ("k2", 5L, null: String, true))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    val snapB = t.currentSnapshot.version + 1
    t.exportIceberg(exportDir)

    // snapshot C (merge-on-read): RE-INSERT k2 at a higher version — the
    // snapshot-B equality delete must not suppress it (strictly-smaller-
    // sequence rule), which only holds if the exported sequence numbers
    // are spec-correct
    t.mergeOnRead(Seq(("k2", 7L, "back", false))
      .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", "versionnumber", "IsDelete")
    val snapC = t.currentSnapshot.version + 1
    t.exportIceberg(exportDir)

    // head: 200 live rows (k2 resurrected); every structural/deep check green
    val (codeC, outC) = validate(exportDir, Seq("--expect-rows", "200"))
    assert(codeC == 0, s"validator failed at head: $outC")
    assert(outC.contains("\"errors\": 0"))
    assert(snapC > snapB && snapB > snapA) // distinct exported snapshots

    // time travel: B = 199 rows (k2 tombstoned), A = 200 originals
    val (codeB, outB) = validate(exportDir,
      Seq("--at", snapB.toString, "--expect-rows", "199"))
    assert(codeB == 0, s"validator failed at snapshot B: $outB")
    val (codeA, outA) = validate(exportDir,
      Seq("--at", snapA.toString, "--expect-rows", "200"))
    assert(codeA == 0, s"validator failed at snapshot A: $outA")

    // VALUE-level cross-check at head: the validator's order-insensitive
    // md5 over its reconstructed rows must equal the same hash over the
    // ENGINE's own read() — computed by DuckDB from a fresh parquet dump,
    // so both sides format values identically and only the row SETS are
    // compared. k1 must carry the update, k2 the re-insert.
    val dump = s"$base/expected"
    t.read().select("arcane_merge_key", "versionnumber", "payload", "IsDelete")
      .coalesce(1).write.mode("overwrite").parquet(dump)
    val hashPy =
      """import duckdb, hashlib, glob, json, sys
        |rows = duckdb.sql("select * from read_parquet('%s/*.parquet')").fetchall()
        |h = hashlib.md5()
        |for r in sorted(repr(tuple(x)) for x in rows):
        |    h.update(r.encode()); h.update(b"\n")
        |print(h.hexdigest())""".stripMargin.format(dump)
    val expectedHash = Seq("python3", "-c", hashPy).!!.trim
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val got = mapper.readTree(outC)
    assert(got.get("hash").asText() == expectedHash,
      s"independent reconstruction hash ${got.get("hash").asText()} != engine read hash $expectedHash")
  }

  test("python validator flags a corrupted manifest (sanity: it can actually fail)") {
    assume(pythonWithDuckdb, "python3 + duckdb not available")
    val base = tmpDir("py-crosscheck-neg")
    val t = SnapshotTable(spark, s"$base/table")
    t.createOrReplace(
      (1 to 50).map(i => (s"k$i", 1L, s"v$i", false))
        .toDF("arcane_merge_key", "versionnumber", "payload", "IsDelete"),
      "arcane_merge_key", numBuckets = 4)
    val exportDir = s"$base/iceberg"
    t.exportIceberg(exportDir)

    // tamper: drop one live data file — the validator must notice the
    // missing file AND the record-count totals no longer matching
    def parquetFiles(d: java.io.File): Seq[java.io.File] =
      d.listFiles().toSeq.flatMap {
        case f if f.isFile && f.getName.endsWith(".parquet") => Seq(f)
        case sub if sub.isDirectory => parquetFiles(sub)
        case _ => Seq.empty
      }
    val victim = parquetFiles(new java.io.File(s"$base/table/data")).minBy(_.getPath)
    assert(victim.delete())
    val (code, out) = validate(exportDir, Seq("--quiet"))
    assert(code != 0, s"validator should fail on a missing live file: $out")
  }
}
