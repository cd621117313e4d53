package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `iceberg_bucket(value, n)` — Apache Iceberg's `bucket[N]` partition
  * transform (Iceberg table spec, "Bucket Transform Details" + Appendix B):
  * `(murmur3_x86_32(iceberg_encoded_value) & Int.MaxValue) % N`, with the
  * spec's per-type byte encodings (int/long/date/timestamp hash their
  * 64-bit little-endian form, strings their UTF-8 bytes, decimals the
  * minimal two's-complement big-endian unscaled value, binary its raw
  * bytes).
  *
  * This IS the engine's table bucket function for tables on the
  * `iceberg` bucket-layout version ([[graft.tables.SnapshotTable
  * .bucketExpr]], property [[graft.tables.SnapshotTable.PropBucketFn]] —
  * the default for new tables; pre-migration tables stay on xxhash64
  * until [[graft.tables.SnapshotTable.migrateBucketLayout]] or a CREATE
  * OR REPLACE rewrites them). Because rows are physically bucketed by the
  * exact transform the Iceberg spec defines, the Iceberg export publishes
  * `bucket(N, merge_key)` as the table's partition spec TRUTHFULLY — an
  * external Iceberg reader that plans `WHERE merge_key = 'x'` computes
  * this same murmur3 bucket and prunes to one bucket's files, instead of
  * scanning every live file of a 100 TB table. (The reference documents
  * exactly this layout for its targets: `/root/reference/docs/crd.md:211`
  * `bucket(arcane_merge_key, 10)`.)
  *
  * Native Catalyst expression with whole-stage codegen (a static call per
  * row, no boxing); the murmur3 here is the CANONICAL x86_32 variant with
  * seed 0 — deliberately not Spark's `hash()` (seed 42, different tail
  * mixing) nor `xxhash64`, neither of which matches Iceberg's definition.
  * NULL input returns NULL, mirroring the spec's "transforms must return
  * null for null input" rule; callers that need a physical home for
  * null-key rows wrap this with an explicit sentinel.
  */
case class IcebergBucket(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable

  /** `n` is validated HERE, at analysis: foldable int, non-null, > 0. A
    * null or non-positive n rejected per-row instead would surface as an
    * execution-time NPE/ArithmeticException deep inside a write job — and
    * a null n accepted silently would make the expression evaluate to
    * null while declaring `nullable = left.nullable`, which null-aware
    * optimizer rules are allowed to miscompile.
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    val okValue = left.dataType match {
      case StringType | BinaryType | IntegerType | ShortType | ByteType | LongType |
           DateType | TimestampType | TimestampNTZType | _: DecimalType => true
      case _ => false
    }
    if (!okValue)
      TypeCheckResult.TypeCheckFailure(
        s"iceberg_bucket supports the Iceberg spec's bucket source types " +
          s"(int/long/decimal/date/timestamp/string/binary), got ${left.dataType.simpleString}")
    else if (!(right.foldable && right.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure("iceberg_bucket n must be an int literal")
    else right.eval() match {
      case null => TypeCheckResult.TypeCheckFailure("iceberg_bucket n must not be null")
      case v: Int if v <= 0 =>
        TypeCheckResult.TypeCheckFailure(s"iceberg_bucket n must be positive, got $v")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
  }

  override protected def nullSafeEval(value: Any, nVal: Any): Any = {
    val h = left.dataType match {
      case StringType                                 => IcebergBucket.hashUtf8(value.asInstanceOf[UTF8String])
      case BinaryType                                 => IcebergBucket.hashBytes(value.asInstanceOf[Array[Byte]])
      case IntegerType | DateType                     => IcebergBucket.hashLong(value.asInstanceOf[Int].toLong)
      case ShortType                                  => IcebergBucket.hashLong(value.asInstanceOf[Short].toLong)
      case ByteType                                   => IcebergBucket.hashLong(value.asInstanceOf[Byte].toLong)
      case LongType | TimestampType | TimestampNTZType => IcebergBucket.hashLong(value.asInstanceOf[Long])
      case _: DecimalType                             => IcebergBucket.hashDecimal(value.asInstanceOf[org.apache.spark.sql.types.Decimal])
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    IcebergBucket.toBucket(h, nVal.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = IcebergBucket.getClass.getName.stripSuffix("$")
    val hashOf: String => String = left.dataType match {
      case StringType                                  => c => s"$cls.hashUtf8($c)"
      case BinaryType                                  => c => s"$cls.hashBytes($c)"
      case IntegerType | ShortType | ByteType | DateType => c => s"$cls.hashLong((long)$c)"
      case LongType | TimestampType | TimestampNTZType => c => s"$cls.hashLong($c)"
      case _: DecimalType                              => c => s"$cls.hashDecimal($c)"
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    defineCodeGen(ctx, ev, (c, nv) => s"$cls.toBucket(${hashOf(c)}, $nv)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "iceberg_bucket"
}

object IcebergBucket {

  /** Canonical murmur3_x86_32, seed 0 — the hash the Iceberg spec names
    * for the bucket transform (pinned against the spec's Appendix B test
    * vectors in IcebergBucketSpec).
    */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0 // seed 0 per the Iceberg spec
    val len = data.length
    val roundedEnd = len & 0xfffffffc
    var i = 0
    while (i < roundedEnd) {
      var k1 = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | (data(i + 3) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    var k1 = 0
    (len & 3) match {
      case 3 =>
        k1 = (data(roundedEnd + 2) & 0xff) << 16
        k1 |= (data(roundedEnd + 1) & 0xff) << 8
        k1 |= data(roundedEnd) & 0xff
      case 2 =>
        k1 = (data(roundedEnd + 1) & 0xff) << 8
        k1 |= data(roundedEnd) & 0xff
      case 1 =>
        k1 = data(roundedEnd) & 0xff
      case _ => ()
    }
    if ((len & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** int/long/date/timestamp hash as the 64-bit LITTLE-ENDIAN form (spec:
    * `hashLong(v)` for all of them — so `bucket(34 : int)` ==
    * `bucket(34L)`, keeping buckets stable under int→long promotion).
    */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3(b)
  }

  def hashBytes(b: Array[Byte]): Int = murmur3(b)

  def hashUtf8(s: UTF8String): Int = murmur3(s.getBytes)

  /** Decimals hash the MINIMAL two's-complement big-endian bytes of the
    * unscaled value (spec Appendix B) — exactly
    * `java.math.BigInteger.toByteArray`.
    */
  def hashDecimal(d: org.apache.spark.sql.types.Decimal): Int =
    murmur3(d.toJavaBigDecimal.unscaledValue().toByteArray)

  def toBucket(hash: Int, n: Int): Int = (hash & Int.MaxValue) % n

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[IcebergBucket].getName, null, "iceberg_bucket",
    "_FUNC_(value, n) - Apache Iceberg bucket[N] partition transform: " +
      "(murmur3_x86_32(encoded value) & MaxInt) % n.", "")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"iceberg_bucket expects 2 arguments, got ${args.length}")
    IcebergBucket(args(0), args(1))
  }
}
