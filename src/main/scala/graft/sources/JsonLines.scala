package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-Lines corpus IO — the interchange format LLM training-data
  * pipelines actually ship documents in (one JSON object per line).
  * Thin, contract-bearing wrappers over Spark's native JSON source; the
  * value is the pinned scale contract, not the mechanics:
  *
  *  - the SCHEMA IS EXPLICIT, never inferred: `spark.read.json` without a
  *    schema runs a full inference scan first — at 100 TB that doubles
  *    the read. Callers pass the schema they expect (the gate derives it
  *    from the authoritative parquet table).
  *  - JSONL is line-splittable, so read parallelism is byte-range based
  *    exactly like CSV/parquet — no multiline JSON (a single-document
  *    `multiLine` array is NOT splittable and serializes the whole file
  *    through one task; this wrapper never enables it).
  *  - malformed lines are DATA, not crashes (same corrupt-is-data stance
  *    as [[graft.ext.Multimodal]]'s decoders): PERMISSIVE mode captures
  *    the raw line in `corrupt_record` and nulls the typed columns, so
  *    one bad line in a 100 TB crawl cannot kill the job; callers filter
  *    or route the quarantine column.
  *
  * Gate: q_jsonl_roundtrip writes the documents table as JSONL (with a
  * planted malformed line), reads it back through [[read]], drops the
  * quarantined row and must reproduce the parquet table bit-exactly
  * against the DuckDB oracle reading parquet directly.
  */
object JsonLines {

  val CorruptCol = "corrupt_record"

  /** Write `df` as JSON-Lines under `path` (one object per line; null
    * fields omitted — Spark's native writer). Overwrites.
    */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSONL at `path` with an EXPLICIT data schema. The returned
    * frame carries `schema`'s columns plus [[CorruptCol]] (the raw text
    * of any line that failed to parse; null for good rows — on corrupt
    * rows the data columns are null).
    *
    * Parsed as a TEXT scan + `from_json` rather than a raw JSON scan:
    * same line-splittable byte ranges, same Jackson parser and
    * PERMISSIVE corrupt capture — but free of the raw-scan restriction
    * that rejects any query whose referenced columns are only
    * [[CorruptCol]] (`UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_`
    * `COLUMN`), which a plain `count()` after the usual
    * quarantine filter trips (count prunes every data column away).
    * Blank lines are skipped like the native JSON reader; a line whose
    * parse yields no object at all (e.g. a bare `null`) quarantines.
    * Out-of-contract JSONL — a line holding a top-level ARRAY of objects,
    * which the raw-scan reader would have expanded into several rows —
    * quarantines instead (JSONL is one object per line; expansion was an
    * accident of the raw scan, not a promise).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"data schema must not already contain '$CorruptCol'")
    import org.apache.spark.sql.functions._
    val full = schema.add(CorruptCol, StringType)
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), full, opts).as("_j"), col("value"))
      .select(schema.fieldNames.map(f => col(s"_j.`$f`").as(f)).toIndexedSeq :+
        when(col("_j").isNull, col("value"))
          .otherwise(col(s"_j.`$CorruptCol`")).as(CorruptCol): _*)
  }
}
