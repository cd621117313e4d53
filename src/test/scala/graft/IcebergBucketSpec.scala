package graft

import graft.sql.IcebergBucket
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pins [[graft.sql.IcebergBucket]] against the Iceberg table spec's
  * Appendix B "32-bit Hash Requirements" test vectors — the contract that
  * lets the table layer physically bucket rows by the EXACT transform the
  * spec defines, so the Iceberg export's published `bucket[N]` partition
  * spec is truthful for external readers. Also pins codegen/interpreted
  * agreement and the analysis-time validation of `n`.
  */
class IcebergBucketSpec extends SparkSpec {

  test("murmur3 matches the Iceberg spec Appendix B vectors") {
    // int and long hash identically via their 64-bit little-endian form
    assert(IcebergBucket.hashLong(34L) === 2017239379)
    // string: UTF-8 bytes
    assert(IcebergBucket.hashUtf8(UTF8String.fromString("iceberg")) === 1210000089)
    // decimal 14.20: minimal two's-complement big-endian unscaled bytes
    assert(IcebergBucket.hashDecimal(Decimal(BigDecimal("14.20"))) === -500754589)
    // date 2017-11-16 = epoch day 17486, hashed as a long
    assert(IcebergBucket.hashLong(17486L) === -653330422)
    // binary 00 01 02 03: raw bytes
    assert(IcebergBucket.hashBytes(Array[Byte](0, 1, 2, 3)) === -188683207)
  }

  test("bucket value is (hash & Int.MaxValue) % n, never negative") {
    // decimal vector hashes negative; the spec's mask keeps the bucket in [0, n)
    val h = IcebergBucket.hashDecimal(Decimal(BigDecimal("14.20")))
    assert(h < 0)
    val b = IcebergBucket.toBucket(h, 10)
    assert(b >= 0 && b < 10)
    assert(b === ((h & Int.MaxValue) % 10))
  }

  test("int and long inputs of the same value land in the same bucket") {
    val viaInt = IcebergBucket(Literal(34, IntegerType), Literal(16)).eval(null)
    val viaLong = IcebergBucket(Literal(34L, LongType), Literal(16)).eval(null)
    assert(viaInt === viaLong)
  }

  test("codegen and interpreted evaluation agree on every supported type") {
    val df = spark.range(0, 500).select(
      col("id").cast("int").as("i"),
      col("id").as("l"),
      concat(lit("key-"), col("id")).as("s"),
      (col("id").cast("decimal(12,2)") / lit(7)).cast("decimal(12,2)").as("d"),
      encode(col("id").cast("string"), "UTF-8").as("b"),
      date_add(lit(java.sql.Date.valueOf("2017-01-01")), col("id").cast("int")).as("dt"))
    // whole-stage codegen path (doGenCode)
    val codegen = df.selectExpr(
      "iceberg_bucket(i, 32)", "iceberg_bucket(l, 32)", "iceberg_bucket(s, 32)",
      "iceberg_bucket(d, 32)", "iceberg_bucket(b, 32)", "iceberg_bucket(dt, 32)").collect()
    // interpreted path (nullSafeEval) over the same inputs
    val rows = df.collect()
    rows.zip(codegen).foreach { case (in, out) =>
      def interp(v: Any, dt: DataType): Any =
        IcebergBucket(Literal.create(v, dt), Literal(32)).eval(null)
      assert(interp(in.getInt(0), IntegerType) === out.getInt(0))
      assert(interp(in.getLong(1), LongType) === out.getInt(1))
      assert(interp(UTF8String.fromString(in.getString(2)), StringType) === out.getInt(2))
      assert(interp(Decimal(in.getDecimal(3)), DecimalType(12, 2)) === out.getInt(3))
      assert(interp(in.getAs[Array[Byte]](4), BinaryType) === out.getInt(4))
      assert(interp(in.getDate(5).toLocalDate.toEpochDay.toInt, DateType) === out.getInt(5))
    }
  }

  test("null input returns null (spec: transforms return null for null)") {
    val out = spark.sql("SELECT iceberg_bucket(CAST(NULL AS STRING), 8) AS b").collect()
    assert(out.head.isNullAt(0))
  }

  test("n is validated at analysis: non-literal, null, zero and negative all rejected") {
    def fails(sql: String): Unit =
      intercept[AnalysisException](spark.sql(sql).collect())
    fails("SELECT iceberg_bucket('x', 0)")
    fails("SELECT iceberg_bucket('x', -4)")
    fails("SELECT iceberg_bucket('x', CAST(NULL AS INT))")
    fails("SELECT iceberg_bucket(s, n) FROM VALUES ('a', 4) AS t(s, n)")
    // unsupported source type (the spec defines no bucket for double)
    fails("SELECT iceberg_bucket(CAST(1.0 AS DOUBLE), 8)")
  }
}
