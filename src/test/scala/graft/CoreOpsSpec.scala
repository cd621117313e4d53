package graft

import graft.cdm.{CdmModel, CdmSchema, CsvCast}
import graft.ops.{FieldSelection, FieldSelectionRule, LatestVersionDedup, MergeKey}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-operator unit specs for the core CDM/CDC layer (SURVEY.md §5 test
  * plan: schema factory, CSV cast matrix, field rules, merge key, dedup).
  */
class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- schema factory

  test("model.json parse + StructType mapping incl. decimal traits") {
    val json =
      """{"name":"cdm","version":"1.0","entities":[
        |  {"$type":"LocalEntity","name":"currency","attributes":[
        |    {"name":"Id","dataType":"guid"},
        |    {"name":"roundingprecision","dataType":"decimal","cdm:traits":[
        |      {"traitReference":"is.dataFormat.numeric.shaped","arguments":[
        |        {"name":"precision","value":"38"},{"name":"scale","value":"6"}]}]},
        |    {"name":"cur$code","dataType":"string","maxLength":3},
        |    {"name":"iseuro","dataType":"int64"},
        |    {"name":"createdon","dataType":"dateTimeOffset"},
        |    {"name":"modifiedon","dataType":"dateTime"},
        |    {"name":"IsDelete","dataType":"boolean"},
        |    {"name":"mystery","dataType":"somethingNew"}]}]}""".stripMargin
    val schema = CdmSchema.forEntity(CdmModel.parse(json), "currency")
    assert(schema.fieldNames.toSeq ==
      Seq("Id", "roundingprecision", "curcode", "iseuro", "createdon", "modifiedon", "IsDelete", "mystery"))
    assert(schema("roundingprecision").dataType == DecimalType(38, 6))
    assert(schema("curcode").metadata.getLong(CdmSchema.MaxLengthMetadataKey) == 3L)
    assert(schema("iseuro").dataType == LongType)
    assert(schema("createdon").dataType == TimestampType)
    assert(schema("modifiedon").dataType == TimestampNTZType)
    assert(schema("IsDelete").dataType == BooleanType)
    assert(schema("mystery").dataType == StringType) // unknown types degrade, don't fail
  }

  // ---------------------------------------------------------- cast matrix

  test("cast matrix: D365 timestamps, ISO 7-digit fractions, booleans, nulls") {
    val rows = Seq(
      // (dateTime string, expected NTZ as string)
      ("1/1/2020 0:00:00 PM", "2020-01-01 00:00:00"),   // hour 0 WITH meridiem (vestigial)
      ("1/1/2020 0:00:01 PM", "2020-01-01 00:00:01"),
      ("3/14/2021 1:30:00 PM", "2021-03-14 13:30:00"),  // normal 12h resolution
      ("3/14/2021 12:00:00 AM", "2021-03-14 00:00:00"), // 12 AM → 0
      ("2020-01-01T00:15:00.0000000Z", "2020-01-01 00:15:00"),
      ("2020-01-01T00:15:00.1234567Z", "2020-01-01 00:15:00.123456"), // 7→6 digit truncation
      ("2020-06-01T10:15:00", "2020-06-01 10:15:00")
    ).toDF("raw", "expected")
    val out = rows.select(CsvCast.timestampNtz(col("raw")).cast("string").as("got"), col("expected"))
      .as[(String, String)].collect()
    out.foreach { case (got, exp) => assert(got == exp, s"got $got expected $exp") }

    val tz = Seq(
      ("2020-01-01T00:15:00.0000000+00:00", "2020-01-01 00:15:00"),
      ("2020-01-01T02:15:00.0000000+02:00", "2020-01-01 00:15:00"), // offset applied
      ("0001-01-03T00:00:00.0000000", "0001-01-03 00:00:00")        // tombstone, no offset
    ).toDF("raw", "expected")
    tz.select(CsvCast.timestampTz(col("raw")).cast("string").as("got"), col("expected"))
      .as[(String, String)].collect()
      .foreach { case (got, exp) => assert(got == exp, s"got $got expected $exp") }

    val bools = Seq(("True", Some(true)), ("False", Some(false)), ("true", Some(true)),
      ("1", Some(true)), ("0", Some(false)), ("", None), ("garbage", None))
      .toDF("raw", "expected")
    bools.select(CsvCast.boolean(col("raw")).as("got"), col("expected"))
      .as[(Option[Boolean], Option[Boolean])].collect()
      .foreach { case (got, exp) => assert(got == exp) }
  }

  test("D365 split-parse ≡ the regexp_extract formulation across the hour×meridiem grid") {
    // r22: parseD365 was rewritten from 7 same-pattern regexp_extract
    // calls to one guard + one split. This pins field-for-field
    // equivalence by evaluating the ORIGINAL formulation side by side
    // over every (hour, meridiem) combination plus malformed shapes.
    val re = "^(\\d{1,2})/(\\d{1,2})/(\\d{4}) (\\d{1,2}):(\\d{2}):(\\d{2}) (AM|PM)$"
    def refParse(s: Column): Column = {
      def g(i: Int) = regexp_extract(s, re, i).try_cast(LongType)
      val (month, day, year, rawHour, minute, sec) = (g(1), g(2), g(3), g(4), g(5), g(6))
      val mer = regexp_extract(s, re, 7)
      val hour = when(rawHour === 0 || rawHour > 12, rawHour)
        .otherwise((rawHour % 12) + when(mer === "PM", 12).otherwise(0))
      when(s.rlike(re),
        make_timestamp_ntz(year.cast(IntegerType), month.cast(IntegerType), day.cast(IntegerType),
          hour.cast(IntegerType), minute.cast(IntegerType), sec.cast(DecimalType(16, 6))))
        .otherwise(lit(null).cast(StringType).cast(TimestampNTZType))
    }
    val valid = for {
      m <- Seq(1, 12); d <- Seq(1, 28); h <- 0 to 23
      mi <- Seq(0, 59); se <- Seq(0, 59); mer <- Seq("AM", "PM")
    } yield f"$m/$d/2020 $h:$mi%02d:$se%02d $mer"
    val malformed = Seq(
      "1/1/20 1:00:00 AM",        // 2-digit year
      "1/1/2020 1:00:00 am",      // lowercase meridiem
      "1/1/2020 1:00:00",         // no meridiem
      "1/1/2020  1:00:00 PM",     // double space
      "001/1/2020 1:00:00 PM",    // 3-digit month
      "2020-01-01T00:15:00.0000000Z", // ISO — not this parser's shape
      "", "garbage")
    val df = (valid ++ malformed).toDF("raw")
    val diff = df.select(col("raw"),
        CsvCast.timestampNtz(col("raw")).as("split_based"),
        coalesce(lit(null).cast(TimestampNTZType), refParse(col("raw"))).as("ref"))
      .where(!(col("split_based") <=> col("ref")) &&
        // ISO rows resolve through the ISO branch in timestampNtz; the
        // D365 reference alone returns NULL there — exclude that one
        // deliberate difference from the D365-equivalence claim
        !col("raw").contains("T"))
      .collect()
    assert(diff.isEmpty, s"split/regexp divergence: ${diff.mkString("; ")}")
  }

  test("cast applies full schema: empty → NULL, decimal, passthrough extras") {
    val schema = StructType(Seq(
      StructField("Id", StringType),
      StructField("amount", DecimalType(38, 6)),
      StructField("n", LongType),
      StructField("IsDelete", BooleanType)))
    val raw = Seq(("a-1", "12.345678", "42", ""), ("b-2", "", "", "True"))
      .toDF("Id", "amount", "n", "IsDelete")
      .select(col("Id"), when(col("amount") === "", lit(null)).otherwise(col("amount")).as("amount"),
        when(col("n") === "", lit(null)).otherwise(col("n")).as("n"),
        when(col("IsDelete") === "", lit(null)).otherwise(col("IsDelete")).as("IsDelete"))
      .withColumn("_folder", lit("f1"))
    val typed = CsvCast(schema, raw)
    assert(typed.schema("amount").dataType == DecimalType(38, 6))
    assert(typed.schema("_folder").dataType == StringType) // passthrough
    val r = typed.orderBy("Id").collect()
    assert(r(0).getDecimal(1).toPlainString == "12.345678")
    assert(r(0).getLong(2) == 42L)
    assert(r(0).isNullAt(3))
    assert(r(1).isNullAt(1) && r(1).isNullAt(2) && r(1).getBoolean(3))
  }

  // ------------------------------------------------------------ csv parser

  test("csv parser: quotes, escaped quotes, embedded commas/newlines, trailing nulls") {
    import graft.sources.CsvRecordParser
    val content =
      "a,\"b,with,commas\",\"say \"\"hi\"\"\",,True\r\n" +
        "\"multi\nline\",x,,y,\n" +
        "plain,1,2,3,4\n"
    val recs = CsvRecordParser.parse(content, 5).toArray
    assert(recs.length == 3)
    assert(recs(0).toSeq == Seq("a", "b,with,commas", "say \"hi\"", null, "True"))
    assert(recs(1).toSeq == Seq("multi\nline", "x", null, "y", null))
    assert(recs(2).toSeq == Seq("plain", "1", "2", "3", "4"))
    // quoted empty string is an empty string, unquoted empty is null
    val r = CsvRecordParser.parse("\"\",b\n", 2).toArray
    assert(r(0)(0) == "" && r(0)(1) == "b")
  }

  test("csv parser streams: records crossing the read-buffer boundary parse intact") {
    import graft.sources.CsvRecordParser
    // A quoted field longer than the 64 KiB buffer, with an escaped quote
    // planted far past the boundary so the `""` lookahead must span refills.
    val big = "x" * 70000 + "\"\"" + "y" * 1000
    val content = s"first,\"$big\",last\nshort,a,b\n"
    val recs = CsvRecordParser.parse(new java.io.StringReader(content), 3).toArray
    assert(recs.length == 2)
    assert(recs(0)(0) == "first" && recs(0)(2) == "last")
    assert(recs(0)(1) == "x" * 70000 + "\"" + "y" * 1000)
    assert(recs(1).toSeq == Seq("short", "a", "b"))
  }

  test("reader factory ships the driver Hadoop conf to executors (serialization round-trip)") {
    import graft.sources.SerializableHadoopConf
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("fs.graft.test.credential", "secret-value")
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(new SerializableHadoopConf(conf)); oos.close()
      bos.toByteArray
    }
    val back = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[SerializableHadoopConf]
    assert(back.value.get("fs.graft.test.credential") == "secret-value")
  }

  test("changelog offsets round-trip sub-folder progress") {
    import graft.sources.ChangelogOffset
    assert(ChangelogOffset.parse("2020-01-01T00.00.00Z") == ChangelogOffset("2020-01-01T00.00.00Z", -1))
    assert(ChangelogOffset.parse("2020-01-01T00.00.00Z#3") == ChangelogOffset("2020-01-01T00.00.00Z", 3))
    assert(ChangelogOffset("f", 2).json() == "f#2")
    assert(ChangelogOffset("f").json() == "f")
    assert(ChangelogOffset.parse(ChangelogOffset("f", 0).json()) == ChangelogOffset("f", 0))
  }

  test("poll jitter draws a bounded per-stream interval deterministically") {
    import graft.pipeline.{CdcPipeline, StreamSpec}
    val spec = StreamSpec("s", "e", "t", changeCaptureIntervalSeconds = 100,
      changeCaptureJitterVariance = 0.1, changeCaptureJitterSeed = 7)
    val a = CdcPipeline.jitteredIntervalMs(spec)
    assert(a == CdcPipeline.jitteredIntervalMs(spec), "same seed → same interval")
    assert(a >= 90000 && a <= 110000, s"interval $a outside ±variance band")
    assert(CdcPipeline.jitteredIntervalMs(spec.copy(changeCaptureJitterVariance = 0.0)) == 100000L)
    // seed 0 derives a per-stream seed from the identity → distinct streams diverge
    val b = CdcPipeline.jitteredIntervalMs(spec.copy(changeCaptureJitterSeed = 0))
    val c = CdcPipeline.jitteredIntervalMs(spec.copy(changeCaptureJitterSeed = 0, entityName = "other"))
    assert(b != c)
  }

  test("retryable failure classification: IOException or configured message → exit 2") {
    val needles = Seq("No worker nodes available", "Query killed")
    assert(graft.app.Main.isRetryable(new java.io.IOException("conn reset"), Nil))
    assert(graft.app.Main.isRetryable(new RuntimeException(new java.io.IOException("x")), Nil))
    assert(graft.app.Main.isRetryable(
      new RuntimeException("merge failed: No worker nodes available right now"), needles))
    assert(graft.app.Main.isRetryable(
      new RuntimeException(new IllegalStateException("Query killed by admin")), needles))
    assert(!graft.app.Main.isRetryable(new RuntimeException("schema mismatch"), needles))
    assert(!graft.app.Main.isRetryable(new RuntimeException("boom"), Nil))
  }

  test("graceful-stop guard only recognizes batch cancellation, not real failures") {
    import graft.app.Main
    // the shapes Spark produces when stop() races an in-flight micro-batch
    assert(Main.isCancellation(new RuntimeException(
      new org.apache.spark.SparkException("Job 7 cancelled because SparkContext was shut down"))))
    assert(Main.isCancellation(new java.util.concurrent.CancellationException()))
    assert(Main.isCancellation(new RuntimeException(new InterruptedException())))
    // a genuine merge/commit failure racing the shutdown hook must NOT
    // classify as a clean stop (it falls through to exit 1/2)
    assert(!Main.isCancellation(new RuntimeException("merge failed: duplicate key")))
    assert(!Main.isCancellation(new RuntimeException(new OutOfMemoryError("java heap space"))))
  }

  // ------------------------------------------------------- field selection

  test("field selection rules keep essential fields") {
    val df = Seq((1L, "x", "y", 2L, false)).toDF("Id", "a", "b", "versionnumber", "IsDelete")
    assert(FieldSelection(df, FieldSelectionRule.All).columns.toSeq ==
      Seq("Id", "a", "b", "versionnumber", "IsDelete"))
    assert(FieldSelection(df, FieldSelectionRule.Include(Set("a"))).columns.toSeq ==
      Seq("Id", "a", "versionnumber", "IsDelete"))
    assert(FieldSelection(df, FieldSelectionRule.Exclude(Set("b", "versionnumber"))).columns.toSeq ==
      Seq("Id", "a", "versionnumber", "IsDelete")) // essential survives exclude
  }

  // ------------------------------------------------------------ merge key

  test("merge key derivation lowercases and joins multi-keys") {
    val df = Seq(("ABC-123", "West")).toDF("Id", "region")
    assert(MergeKey(df).select(MergeKey.ColumnName).as[String].head() == "abc-123")
    assert(MergeKey(df, Seq("Id", "region")).select(MergeKey.ColumnName).as[String].head() == "abc-123|west")
  }

  test("raw-key bucket fast path only engages for string-typed keys") {
    import graft.pipeline.CdcPipeline.rawKeyBucketsStable
    val s = StructType(Seq(
      StructField("Id", StringType),
      StructField("code", StringType),
      StructField("seq", LongType),
      StructField("amount", DecimalType(38, 6)),
      StructField("modified", TimestampNTZType)))
    assert(rawKeyBucketsStable(s, Seq("Id")))
    assert(rawKeyBucketsStable(s, Seq("Id", "code")))
    assert(rawKeyBucketsStable(s, Seq("id"))) // case-insensitive lookup
    // int64 "0042" → "42", decimal "1.5" → "1.500000", dateTime reformats:
    // raw-string hashing would diverge from the typed write-time bucket.
    assert(!rawKeyBucketsStable(s, Seq("seq")))
    assert(!rawKeyBucketsStable(s, Seq("Id", "amount")))
    assert(!rawKeyBucketsStable(s, Seq("modified")))
    assert(!rawKeyBucketsStable(s, Seq("missing"))) // absent column → safe path
  }

  // ---------------------------------------------------------------- as-of

  test("asOfJoin: latest right row at-or-before, inclusive ties, null when none") {
    import spark.implicits._
    val left = Seq((1L, 10L, "c1"), (1L, 5L, "c2"), (1L, 2L, "c3"), (2L, 7L, "c4"))
      .toDF("k", "ts", "ev")
    val right = Seq((1L, 3L, "p-early"), (1L, 10L, "p-tie"), (3L, 1L, "p-other"))
      .toDF("k", "ts", "state")
    val out = graft.ops.AsOfJoin.asOfJoin(left, right,
        keyCols = Seq("k"), leftTsCol = "ts", rightTsCol = "ts",
        rightPayloadCols = Seq("state"))
      .select("ev", "state").as[(String, Option[String])].collect().toMap
    assert(out("c1").contains("p-tie"))    // equal ts matches (inclusive)
    assert(out("c2").contains("p-early"))  // latest ≤ 5 is ts=3
    assert(out("c3").isEmpty)              // nothing at-or-before ts=2... ts=3 is after
    assert(out("c4").isEmpty)              // key 2 has no right rows
  }

  test("asOfJoinForward: earliest right row at-or-after, inclusive ties, null when none") {
    import spark.implicits._
    val left = Seq((1L, 10L, "c1"), (1L, 5L, "c2"), (1L, 2L, "c3"), (2L, 7L, "c4"), (1L, 11L, "c5"))
      .toDF("k", "ts", "ev")
    val right = Seq((1L, 3L, "p-early"), (1L, 10L, "p-tie"), (3L, 1L, "p-other"))
      .toDF("k", "ts", "state")
    val out = graft.ops.AsOfJoin.asOfJoinForward(left, right,
        keyCols = Seq("k"), leftTsCol = "ts", rightTsCol = "ts",
        rightPayloadCols = Seq("state"))
      .select("ev", "state").as[(String, Option[String])].collect().toMap
    assert(out("c1").contains("p-tie"))   // equal ts matches (inclusive)
    assert(out("c2").contains("p-tie"))   // earliest ≥ 5 is ts=10
    assert(out("c3").contains("p-early")) // earliest ≥ 2 is ts=3
    assert(out("c4").isEmpty)             // key 2 has no right rows
    assert(out("c5").isEmpty)             // nothing at-or-after ts=11
  }

  test("Cohorts.retention: hand-computed weekly grid; chatty users count once per period") {
    import spark.implicits._
    val wk = 7L * 24 * 3600 * 1000000 // periodUs
    def ts(week: Long, off: Long = 1000L) =
      new java.sql.Timestamp((week * wk + off) / 1000) // micros → millis
    val ev = Seq(
      (1L, ts(100)), (1L, ts(100, 2000)), (1L, ts(101)),  // cohort 100, active w100 (×2 events), w101
      (2L, ts(100)), (2L, ts(102)),                       // cohort 100, active w100, w102
      (3L, ts(101))                                       // cohort 101, active w101 only
    ).toDF("user_id", "ts")
    val out = graft.ops.Cohorts.retention(ev)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (100L, 0L, 2L), // users 1,2 in their first week
      (100L, 1L, 1L), // user 1 back at offset 1
      (100L, 2L, 1L), // user 2 back at offset 2
      (101L, 0L, 1L)  // user 3's cohort
    ), s"got $out")
  }

  test("asOfJoin both directions: NULL timestamps never match (SQL ASOF semantics)") {
    import spark.implicits._
    val left = Seq((1L, Some(5L), "c-real"), (1L, None, "c-null")).toDF("k", "ts", "ev")
    val right = Seq((1L, Some(3L), "p-real"), (1L, None, "p-null")).toDF("k", "ts", "state")
    val back = graft.ops.AsOfJoin.asOfJoin(left, right,
        Seq("k"), "ts", "ts", Seq("state"))
      .select("ev", "state").as[(String, Option[String])].collect().toMap
    assert(back("c-real").contains("p-real")) // 3 ≤ 5
    assert(back("c-null").isEmpty, "NULL left ts matches nothing (backward)")
    val fwd = graft.ops.AsOfJoin.asOfJoinForward(left, right,
        Seq("k"), "ts", "ts", Seq("state"))
      .select("ev", "state").as[(String, Option[String])].collect().toMap
    assert(fwd("c-real").isEmpty, "no right row at-or-after ts=5 (the NULL one must not match)")
    assert(fwd("c-null").isEmpty, "NULL left ts matches nothing (forward)")
    // the left rows themselves survive (left-join shape)
    assert(back.size == 2 && fwd.size == 2)
  }

  test("bloomSemiJoin matches across key TYPES (int build side vs bigint probe side)") {
    import graft.ops.JoinOps
    // xxhash64(int 1) != xxhash64(long 1): without aligning the build
    // side's type to the probe side's, every true match is a false negative
    val large = spark.range(0, 100).selectExpr("id AS k")                  // bigint
    val small = Seq(1, 2, 3).toDF("sk").selectExpr("CAST(sk AS INT) AS sk") // int
    val out = JoinOps.bloomSemiJoin(large, small, "k", "sk")
      .select("k").as[Long].collect().toSet
    assert(out === Set(1L, 2L, 3L))
  }

  test("orderInvariantChecksum distinguishes NULL-shifted rows") {
    import graft.ops.Integrity
    val a = Seq(("x", null.asInstanceOf[String])).toDF("c1", "c2")
    val b = Seq((null.asInstanceOf[String], "x")).toDF("c1", "c2")
    val ca = Integrity.orderInvariantChecksum(a, Seq("c1", "c2")).head().getLong(1)
    val cb = Integrity.orderInvariantChecksum(b, Seq("c1", "c2")).head().getLong(1)
    assert(ca !== cb, "('x',NULL) and (NULL,'x') must not collide")
  }

  test("composite merge keys with NULL components do not collide") {
    import graft.ops.MergeKey
    val df = Seq(("a", null.asInstanceOf[String]), (null.asInstanceOf[String], "a"), (null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("k1", "k2")
    val keys = MergeKey(df, Seq("k1", "k2")).select(MergeKey.ColumnName).as[String].collect()
    assert(keys.distinct.length === 3, s"expected 3 distinct keys, got ${keys.toSeq}")
  }

  test("bloomSemiJoin equals the exact semi join (no false negatives survive)") {
    import spark.implicits._
    val large = Seq.tabulate(1000)(i => (i.toLong, s"p$i")).toDF("k", "payload")
    val small = Seq.tabulate(50)(i => (i * 7L, "x")).toDF("sk", "v")
    val out = graft.ops.JoinOps.bloomSemiJoin(large, small, "k", "sk", expectedItems = 100L)
      .select("k").as[Long].collect().toSet
    val exact = (0 until 50).map(_ * 7L).filter(_ < 1000).toSet
    assert(out == exact)
  }

  test("saltedJoin preserves join multiplicity, including duplicate rows") {
    import spark.implicits._
    // hot key 1 appears 100× on the large side, plus a duplicated row pair
    val large = (Seq.fill(100)((1L, "hot")) ++ Seq((2L, "a"), (2L, "a"), (3L, "b")))
      .toDF("k", "payload")
    val small = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "price")
    val out = graft.ops.JoinOps.saltedJoin(large, small, "k", saltFactor = 8)
      .groupBy("k").count().as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 100L, 2L -> 2L)) // k=3 unmatched, dup rows kept
  }

  test("rangeJoin equals the naive range join, including bucket-boundary and degenerate cases") {
    import spark.implicits._
    // points planted ON bucket boundaries, interval endpoints, negatives;
    // intervals spanning multiple buckets, zero-width, inverted, NULL
    val points = Seq(0.0, 5.0, 9.999, 10.0, 15.0, 25.0, -3.5, 100.0)
      .zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
      .union(Seq((99L, Option.empty[Double])).toDF("pid", "x"))
    val intervals = Seq(
      (1L, Some(0.0), Some(10.0)),   // multi-bucket, inclusive both ends
      (2L, Some(9.999), Some(9.999)),// zero-width
      (3L, Some(-5.0), Some(-1.0)),  // negative range
      (4L, Some(20.0), Some(5.0)),   // inverted -> matches nothing
      (5L, None, Some(50.0)),        // NULL lo -> matches nothing
      (6L, Some(14.0), Some(30.0)),
      // non-finite bounds cannot be bucketized -> dropped, not exploded
      // into ~2^63 buckets (documented contract: clamp upstream instead)
      (7L, Some(Double.NegativeInfinity), Some(1.0)),
      (8L, Some(0.0), Some(Double.PositiveInfinity)),
      (9L, Some(Double.NaN), Some(1.0))
    ).toDF("iid", "lo", "hi")
    val out = graft.ops.JoinOps.rangeJoin(points, intervals, "x", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // naive reference over the FINITE intervals (non-finite bounds are
    // dropped by contract, so they are excluded from the reference too)
    val naive = points.join(intervals.where(col("iid") <= 6L),
        col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == naive, s"bucketized vs naive diverge: ${out -- naive} / ${naive -- out}")
    assert(out.contains((3L, 1L)) && out.contains((2L, 2L)) && out.contains((6L, 3L)))
    assert(!out.exists(p => p._2 >= 4L && p._2 != 6L), "inverted/NULL/non-finite intervals match nothing")
    // explicit width exercising >2 buckets per interval
    val wide = graft.ops.JoinOps.rangeJoin(points, intervals, "x", "lo", "hi", bucketWidth = Some(2.5))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(wide == naive, "explicit narrow buckets must not change the result")
  }

  test("topKPerGroup equals the window formulation, ties broken by the id column") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val df = (1 to 2000).map { i =>
      (i % 13L, rnd.nextInt(50).toDouble, i.toLong, s"p$i")
    }.toDF("g", "v", "id", "payload")
    val out = graft.ops.TopK.topKPerGroup(df, Seq("g"), Seq("v", "id"), k = 3)
    val expected = df
      .withColumn("_rn", row_number().over(Window.partitionBy("g").orderBy(col("v").desc, col("id").desc)))
      .where(col("_rn") <= 3).drop("_rn")
    assert(out.columns.toSeq == df.columns.toSeq, "original column set preserved")
    val o = out.select("g", "v", "id", "payload").as[(Long, Double, Long, String)].collect()
    val e = expected.select("g", "v", "id", "payload").as[(Long, Double, Long, String)].collect()
    assert(o.toSet == e.toSet, s"heap vs window diverge: ${o.toSet -- e.toSet} / ${e.toSet -- o.toSet}")
    // largest-first within each group
    o.groupBy(_._1).values.foreach { rows =>
      val ord = rows.map(r => (r._2, r._3)).toSeq
      assert(ord == ord.sortBy { case (v, id) => (-v, -id) }, s"group not largest-first: $ord")
    }
    // k larger than the group returns the whole group
    val all = graft.ops.TopK.topKPerGroup(df.where(col("g") === 0L), Seq("g"), Seq("v", "id"), k = 10000)
    assert(all.count() == df.where(col("g") === 0L).count())
  }

  test("count-min sketch never undercounts; exact on a collision-free domain; candidate cap enforced") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i.toLong, s"key${i % 137}")).toDF("id", "k")
    val sketch = graft.ops.Freq.countMin(df, "k", eps = 0.001)
    val exact = df.groupBy("k").count().as[(String, Long)].collect().toMap
    val est = graft.ops.Freq.estimateCounts(df.select("k").distinct(), "k", sketch)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS must never undercount ($k: ${est(k)} < $n)")
    }
    // eps 0.001 over 5000 rows -> overcount bounded by ~eps*N per key
    val worst = exact.map { case (k, n) => est(k) - n }.max
    assert(worst <= (0.001 * 5000).toLong + 1, s"worst overcount $worst beyond eps*N")
    // the candidate-set contract is enforced, not silently truncated
    val big = spark.range(0, 200).selectExpr("cast(id as string) as k")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Freq.estimateCounts(big, "k", sketch, maxKeys = 100)
    }
    assert(e.getMessage.contains("candidate"))
  }

  // ---------------------------------------------------------------- dedup

  test("latest-version dedup: tombstone with lower version must not shadow") {
    val df = Seq(
      ("k1", 5L, "new", false),
      ("k1", 3L, "tomb", true),  // older delete — must lose
      ("k1", 1L, "old", false),
      ("k2", 1L, "only", false),
      ("k2", 1L, "only", false)  // exact replay — collapses
    ).toDF("arcane_merge_key", "versionnumber", "v", "IsDelete")
    val out = LatestVersionDedup(df).orderBy("arcane_merge_key")
      .as[(String, Long, String, Boolean)].collect().toSeq
    assert(out == Seq(("k1", 5L, "new", false), ("k2", 1L, "only", false)))
  }

  // ------------------------------------------------------- JSONL source

  test("JsonLines round-trips values and quarantines malformed lines as data") {
    import graft.sources.JsonLines
    val dir = tmpDir("jsonl")
    val docs = Seq(
      (1L, Some("plain"), Some("en")),
      (2L, Some("uni éü \"quoted\" \t tab \n newline"), None),
      (3L, None, Some("de"))).toDF("doc_id", "text", "lang")
    JsonLines.write(docs, dir)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/zz-bad.json"), "{broken\n{\"doc_id\": oops}\n")
    val back = JsonLines.read(spark, dir, docs.schema)
    // Two malformed lines -> two quarantined rows carrying the raw text
    // (a data column rides along: Spark refuses corrupt-column-ONLY
    // projections over raw JSON, see JsonLines scaladoc).
    val bad = back.where(col(JsonLines.CorruptCol).isNotNull)
      .select(col(JsonLines.CorruptCol), col("doc_id"))
      .as[(String, Option[Long])].collect().toSeq.sortBy(_._1)
    assert(bad == Seq(("{\"doc_id\": oops}", None), ("{broken", None)))
    // Good rows reproduce the frame exactly (nulls, unicode, escapes).
    val good = back.where(col(JsonLines.CorruptCol).isNull)
      .drop(JsonLines.CorruptCol)
      .as[(Long, Option[String], Option[String])].collect().toSeq.sortBy(_._1)
    assert(good == Seq(
      (1L, Some("plain"), Some("en")),
      (2L, Some("uni éü \"quoted\" \t tab \n newline"), None),
      (3L, None, Some("de"))))
  }

  test("JsonLines.read rejects a schema that already claims the corrupt column") {
    import graft.sources.JsonLines
    val ex = intercept[IllegalArgumentException] {
      JsonLines.read(spark, "/tmp/none", new StructType().add(JsonLines.CorruptCol, StringType))
    }
    assert(ex.getMessage.contains(JsonLines.CorruptCol))
  }

  test("intervalOverlapJoin equals the naive overlap join, each pair exactly once") {
    import spark.implicits._
    val a = Seq((1L, 101L, 0.0, 10.0), (1L, 102L, 20.0, 30.0), (2L, 201L, 0.0, 10.0))
      .toDF("k", "a_id", "a_lo", "a_hi")
    val b = Seq(
      (1L, 301L, 5.0, 15.0),   // overlaps 101
      (1L, 302L, 10.0, 12.0),  // touches 101 at the endpoint (inclusive)
      (1L, 303L, 30.0, 40.0),  // touches 102
      (1L, 304L, 11.0, 19.0),  // gap — no match
      (2L, 305L, 5.0, 15.0),   // other key: overlaps 201 only
      (1L, 306L, -100.0, 100.0) // wide: spans many buckets, overlaps both a-rows
    ).toDF("k", "b_id", "b_lo", "b_hi")
    // small bucketWidth forces multi-bucket explosion → exactly-once matters
    val out = graft.ops.JoinOps.intervalOverlapJoin(
      a, b, "a_lo", "a_hi", "b_lo", "b_hi", keys = Seq("k"), bucketWidth = Some(3.0))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((101L, 301L), (101L, 302L), (101L, 306L),
      (102L, 303L), (102L, 306L), (201L, 305L)))
    // default width (max span) gives the same answer
    val outDefault = graft.ops.JoinOps.intervalOverlapJoin(
      a, b, "a_lo", "a_hi", "b_lo", "b_hi", keys = Seq("k"))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted
    assert(outDefault.toSeq == out.toSeq)
    // degenerate rows (inverted/NULL bounds) are dropped, not crashed on
    val bad = Seq((1L, 999L, 50.0, 40.0)).toDF("k", "a_id", "a_lo", "a_hi")
    assert(graft.ops.JoinOps.intervalOverlapJoin(
      bad, b, "a_lo", "a_hi", "b_lo", "b_hi", keys = Seq("k")).count() == 0)
  }

  test("CdmSchema.diff reports added/removed/retyped columns and entities") {
    def model(attrs: String, extraEntity: String = "") = CdmModel.parse(
      s"""{"name":"m","version":"1.0","entities":[
         |  {"name":"cust","attributes":[$attrs]}$extraEntity]}""".stripMargin)
    val oldM = model(
      """{"name":"Id","dataType":"guid"},{"name":"amount","dataType":"decimal"},
        |{"name":"gone","dataType":"string"}""".stripMargin)
    val newM = model(
      """{"name":"I$d","dataType":"guid"},{"name":"amount","dataType":"int64"},
        |{"name":"fresh","dataType":"string"}""".stripMargin,
      """,{"name":"orders","attributes":[{"name":"Id","dataType":"guid"}]}""")
    val changes = CdmSchema.diff(oldM, newM)
    assert(changes.contains(CdmSchema.SchemaChange("orders", "added-entity", "", "", "")))
    assert(changes.contains(CdmSchema.SchemaChange("cust", "added-column", "fresh", "", "string")))
    assert(changes.contains(CdmSchema.SchemaChange("cust", "removed-column", "gone", "string", "")))
    assert(changes.contains(CdmSchema.SchemaChange("cust", "retyped-column", "amount", "decimal", "int64")))
    // "Id" -> "I$d": special-char-only rename — same normalized identity
    // as the reader uses, NOT drift
    assert(!changes.exists(_.column == "Id"))
    assert(CdmSchema.diff(oldM, oldM).isEmpty)
  }
}
