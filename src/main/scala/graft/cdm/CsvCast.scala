package graft.cdm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** String → typed casts for Synapse Link incremental-CSV values.
  *
  * The raw CSV is read with an all-string schema (quotes/nulls handled by the
  * CSV reader); this layer produces the typed columns. Everything here is
  * built from `org.apache.spark.sql.functions` so the whole cast surface stays
  * inside whole-stage codegen — no UDFs.
  *
  * Value shapes evidenced by the reference fixtures
  * (`/root/reference/src/test/scala/integration/SynapseMetadata.scala:7-22`):
  *   - `dateTime`: either D365-style `"1/1/2020 0:00:00 PM"` (hour 0..23 WITH
  *     a meridiem marker — `H` and `a` conflict, so strict pattern parsing is
  *     impossible) or ISO `"2020-01-01T00:15:00.0000000Z"` with a 7-digit
  *     fraction (Spark parses at most 6).
  *   - `dateTimeOffset`: ISO with `+00:00` offset, or no suffix at all
  *     (`"0001-01-03T00:00:00.0000000"` in the delete tombstone).
  *   - `boolean`: literals `True` / `False` (capitalized), empty = NULL.
  *   - empty field = NULL for every type.
  *
  * Meridiem resolution for the D365 format: hour is taken as hour-of-day when
  * it is 0 or >12 (the marker is vestigial there); otherwise standard 12-hour
  * resolution applies (12 AM → 0, h PM → h+12).
  */
object CsvCast {

  /** ISO timestamp with the fraction truncated to Spark's 6-digit max and any
    * trailing `Z` / `+HH:MM` offset stripped (values are UTC-normalized by
    * Synapse; we treat the wall-clock part as the NTZ value).
    */
  private def isoNormalized(s: Column): Column = {
    val noOffset = regexp_replace(s, "(Z|[+-]\\d{2}:\\d{2})$", "")
    regexp_replace(noOffset, "(\\.\\d{6})\\d+", "$1")
  }

  // try_to_timestamp parses in the session zone (pinned to UTC); the cast to
  // NTZ then keeps the wall-clock value — equivalent to a direct NTZ parse.
  private def parseIsoNtz(s: Column): Column =
    coalesce(
      try_to_timestamp(isoNormalized(s), lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
      try_to_timestamp(isoNormalized(s), lit("yyyy-MM-dd'T'HH:mm:ss"))
    ).cast(TimestampNTZType)

  /** `"1/1/2020 0:00:00 PM"` — ONE regex pass (the shape guard) plus ONE
    * split, rebuilt with make_timestamp_ntz; all codegen-friendly
    * built-ins. Previously this ran the SAME pattern through seven
    * regexp_extract calls (8 regex executions per row — and every
    * reference-fixture `dateTime` is this shape, so the whole CSV intake
    * paid it). Within a string matching the guard the delimiters `[/ :]`
    * occur exactly six times, so `split` yields the regex's seven capture
    * groups field for field; `get` (0-based, NULL out of bounds) keeps
    * non-matching rows ANSI-safe even though the when() guard already
    * short-circuits them. Field-for-field identical to the
    * regexp_extract formulation — pinned by CsvPropertySpec.
    */
  private def parseD365(s: Column): Column = {
    val re = "^(\\d{1,2})/(\\d{1,2})/(\\d{4}) (\\d{1,2}):(\\d{2}):(\\d{2}) (AM|PM)$"
    val parts = split(s, "[/ :]")
    def field(i: Int): Column = get(parts, lit(i - 1))
    val month = try_cast_long(field(1))
    val day = try_cast_long(field(2))
    val year = try_cast_long(field(3))
    val rawHour = try_cast_long(field(4))
    val minute = try_cast_long(field(5))
    val sec = try_cast_long(field(6))
    val mer = field(7)
    val hour = when(rawHour === 0 || rawHour > 12, rawHour)
      .otherwise((rawHour % 12) + when(mer === "PM", 12).otherwise(0))
    when(s.rlike(re),
      make_timestamp_ntz(year.cast(IntegerType), month.cast(IntegerType), day.cast(IntegerType),
        hour.cast(IntegerType), minute.cast(IntegerType), sec.cast(DecimalType(16, 6))))
      .otherwise(lit(null).cast(StringType).cast(TimestampNTZType))
  }

  private def try_cast_long(c: Column): Column = c.try_cast(LongType)

  // D365 first: the two formats are DISJOINT (the D365 guard needs
  // "d/m/yyyy … AM|PM", which no ISO string matches, and
  // try_to_timestamp fails on every D365 string), so coalesce order
  // cannot change any result — but codegen's coalesce is lazy, and the
  // reference's dateTime exports are D365-shaped, so leading with the
  // cheap guard+split saves the 4-regex + 2-parse ISO attempt on every
  // such row; an ISO row pays one extra failing rlike.
  def timestampNtz(s: Column): Column =
    coalesce(parseD365(s), parseIsoNtz(s))

  /** dateTimeOffset → TimestampType. Values are offset-qualified ISO strings;
    * missing offset is treated as UTC (session timezone must be UTC).
    */
  def timestampTz(s: Column): Column = {
    val frac6 = regexp_replace(s, "(\\.\\d{6})\\d+(?=(Z|[+-]\\d{2}:\\d{2})?$)", "$1")
    coalesce(
      try_to_timestamp(frac6, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS[XXX]")),
      try_to_timestamp(frac6, lit("yyyy-MM-dd'T'HH:mm:ss[XXX]")),
      timestampNtz(s).cast(TimestampType)
    )
  }

  def boolean(s: Column): Column =
    when(lower(s).isin("true", "1"), lit(true))
      .when(lower(s).isin("false", "0"), lit(false))
      .otherwise(lit(null).cast(BooleanType))

  /** Typed column for one target field from its raw string column. */
  def cast(field: StructField, raw: Column): Column = {
    val c = field.dataType match {
      case TimestampNTZType => timestampNtz(raw)
      case TimestampType    => timestampTz(raw)
      case BooleanType      => boolean(raw)
      case BinaryType       => unbase64(raw)
      case StringType       => raw
      case dt               => raw.try_cast(dt)
    }
    c.as(field.name, field.metadata)
  }

  /** Apply the full typed schema to an all-string DataFrame (same field
    * names). Extra columns in `df` that are not in `schema` (e.g. the
    * source's `_folder`/`_file` metadata columns) are passed through.
    */
  def apply(schema: StructType, df: DataFrame): DataFrame = {
    val byName = schema.fields.map(f => f.name -> f).toMap
    val cols = df.schema.fieldNames.map { n =>
      byName.get(n) match {
        case Some(f) => cast(f, col(n))
        case None    => col(n)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
