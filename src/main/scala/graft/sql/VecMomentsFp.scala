package graft.sql

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `vec_moments_fp(v)` — ONE-PASS fixed-point first and second moments of
  * a vector column: per row, every coordinate and every upper-triangle
  * product x_i·x_j (j ≥ i) is floored onto the 1e-12 grid
  * (`floor(x * 1e12)` — the same grid as `Embeddings.dimensionStats`,
  * chosen because IEEE floor is bit-identical across engines and
  * partitionings, where a double→decimal cast is a round-half trap), and
  * the integers are summed EXACTLY in 128-bit accumulators.
  *
  * Returns `struct(n: long, sums: array<decimal(38,0)> (d),
  * prods: array<decimal(38,0)> (d·(d+1)/2, row-major upper triangle))`.
  *
  * This replaces PCA-fit's Generate-over-Generate plan (a double
  * `posexplode` materializing d·(d+1)/2 ROWS per input vector — ~10⁵–10⁶
  * intermediates per vector at realistic d): here the expansion happens
  * INSIDE the aggregation buffer, so the plan is one map-side partial
  * aggregate per partition and ONE Exchange carrying a single ~(d²/2)
  * buffer per partition — zero row expansion. Exact integer sums make
  * the result partition-invariant, which is what makes the fit
  * bit-stable under repartitioning (pinned by q_pca_contract's refit
  * check).
  *
  * Null vectors are skipped; a null COORDINATE contributes nothing but
  * the row still counts (the semantics of the sum/count formulation this
  * replaces). Vectors of differing lengths fail loudly — a silent
  * truncation would corrupt the covariance. Per-element magnitudes
  * beyond the fixed-point range (|x_i·x_j| > ~9e6 at the 1e-12 grid)
  * fail loudly rather than overflow silently.
  */
case class VecMomentsFp(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMomentsFp.Buffer] with UnaryLike[Expression] {

  import VecMomentsFp._

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DecimalType(38, 0), containsNull = false)),
    StructField("prods", ArrayType(DecimalType(38, 0), containsNull = false))))
  override def nullable: Boolean = false
  override def prettyName: String = "vec_moments_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_moments_fp requires array<double>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Buffer = new Buffer(-1, null, null, 0L)

  override def update(buf: Buffer, input: InternalRow): Buffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.d < 0) Buffer.sized(d) else buf
    require(b.d == d,
      s"vec_moments_fp: vector length changed mid-aggregation (${b.d} vs $d)")
    val t = d * (d + 1) / 2
    var i = 0
    var k = 0
    while (i < d) {
      if (!arr.isNullAt(i)) {
        val xi = arr.getDouble(i)
        b.add(i, fp(xi))
        var j = i
        while (j < d) {
          if (!arr.isNullAt(j)) b.add(d + k + (j - i), fp(xi * arr.getDouble(j)))
          j += 1
        }
      }
      k += d - i
      i += 1
    }
    require(k == t, "triangle walk out of step") // cheap internal invariant
    b.n += 1
    b
  }

  override def merge(buf: Buffer, other: Buffer): Buffer = {
    if (other.d < 0) return buf
    if (buf.d < 0) return other
    require(buf.d == other.d,
      s"vec_moments_fp: merging buffers of different dims (${buf.d} vs ${other.d})")
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: Buffer): Any = {
    require(buf.d >= 0, "vec_moments_fp over zero vectors — nothing to fit")
    val d = buf.d
    val t = d * (d + 1) / 2
    def dec(k: Int): Decimal = Decimal(buf.toBigDecimal(k), 38, 0)
    new GenericInternalRow(Array[Any](
      buf.n,
      new GenericArrayData(Array.tabulate[Any](d)(dec)),
      new GenericArrayData(Array.tabulate[Any](t)(i => dec(d + i)))))
  }

  override def serialize(buf: Buffer): Array[Byte] = {
    val len = if (buf.d < 0) 0 else buf.lo.length
    val bb = ByteBuffer.allocate(4 + 8 + 16 * len)
    bb.putInt(buf.d)
    bb.putLong(buf.n)
    var i = 0
    while (i < len) { bb.putLong(buf.lo(i)); bb.putLong(buf.hi(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val n = bb.getLong
    if (d < 0) return new Buffer(-1, null, null, n)
    val len = d + d * (d + 1) / 2
    val lo = new Array[Long](len)
    val hi = new Array[Long](len)
    var i = 0
    while (i < len) { lo(i) = bb.getLong; hi(i) = bb.getLong; i += 1 }
    new Buffer(d, lo, hi, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMomentsFp =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMomentsFp =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecMomentsFp =
    copy(child = newChild)
}

object VecMomentsFp {

  val FpScale = 1e12

  /** floor onto the 1e-12 grid, loud on fixed-point range overflow. */
  private def fp(x: Double): Long = {
    val f = math.floor(x * FpScale)
    require(f >= -9.1e18 && f <= 9.1e18,
      s"vec_moments_fp: |value| too large for the 1e-12 fixed-point grid: $x")
    f.toLong
  }

  /** 128-bit signed accumulators: `lo` holds the unsigned low word, `hi`
    * the signed high word (value = hi·2⁶⁴ + unsigned(lo)). Exact for
    * ~8.5e25 rows of 1e12-scale terms — unbounded for any real corpus.
    */
  final class Buffer(var d: Int, var lo: Array[Long], var hi: Array[Long], var n: Long) {

    def add(k: Int, v: Long): Unit = {
      val a = lo(k)
      val s = a + v
      lo(k) = s
      // carry-out of the unsigned low addition + sign extension of v
      hi(k) += (v >> 63) + (((a & v) | ((a | v) & ~s)) >>> 63)
    }

    def mergeFrom(o: Buffer): Unit = {
      var k = 0
      while (k < lo.length) {
        val a = lo(k)
        val b = o.lo(k)
        val s = a + b
        lo(k) = s
        hi(k) += o.hi(k) + (((a & b) | ((a | b) & ~s)) >>> 63)
        k += 1
      }
      n += o.n
    }

    def toBigDecimal(k: Int): BigDecimal = {
      val big = java.math.BigInteger.valueOf(hi(k)).shiftLeft(64)
        .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo(k))))
      BigDecimal(new java.math.BigDecimal(big))
    }
  }

  object Buffer {
    def sized(d: Int): Buffer = {
      val len = d + d * (d + 1) / 2
      new Buffer(d, new Array[Long](len), new Array[Long](len), 0L)
    }
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[VecMomentsFp].getName, null, "vec_moments_fp",
    "_FUNC_(v) - one-pass fixed-point (1e-12 grid) exact first moments and " +
      "upper-triangle second moments of a vector column: " +
      "struct(n, sums[d], prods[d*(d+1)/2]).", "")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, s"vec_moments_fp expects 1 argument, got ${args.length}")
    VecMomentsFp(args(0))
  }
}
