package graft.sql

import java.nio.ByteBuffer
import java.util.TreeSet

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `kmv_agg(hash, k)` — per-group KMV distinct sketch: the k smallest
  * DISTINCT long values of the input, as an `array<long>` ascending.
  *
  * Why an aggregate, not a `distinct + top_k_agg` composition: dedup as a
  * pre-aggregation (`groupBy(group, hv)`) shuffles every (group, hash)
  * pair — at 100 TB that's a shuffle proportional to the raw distinct
  * cardinality. This buffer dedups AND trims inside the aggregation
  * (a bounded sorted set, ≤ k longs per group), so with map-side partial
  * aggregation the shuffle carries at most k values per group per input
  * partition — the same contract as `top_k_agg` (CollectTopK), which
  * cannot be used directly here because its heap keeps duplicate values.
  *
  * The merge of two buffers is the sketch of the union of the underlying
  * key sets (merge-then-trim commutes with hashing — the KMV law pinned
  * by KmvSpec), which is exactly why partial aggregation is sound.
  *
  * Null inputs are skipped (NULL is not a key). `k` must be an int
  * literal ≥ 16 — it sizes the buffer at plan time.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TreeSet[java.lang.Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_agg requires an integral hash column, got $other")
  }

  override def createAggregationBuffer(): TreeSet[java.lang.Long] = new TreeSet[java.lang.Long]()

  private def add(buf: TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last && buf.add(v)) { buf.pollLast(); () }

  override def update(buf: TreeSet[java.lang.Long], input: InternalRow): TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Number].longValue)
    buf
  }

  override def merge(buf: TreeSet[java.lang.Long], other: TreeSet[java.lang.Long]): TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object KmvAgg {
  val info = new ExpressionInfo(classOf[KmvAgg].getName, "kmv_agg")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"kmv_agg(hash, k) takes 2 arguments, got ${args.length}")
    val k = args(1).eval() match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(s"kmv_agg k must be an int literal, got $other")
    }
    require(k >= 16, s"kmv_agg k must be >= 16 for a usable estimate, got $k")
    KmvAgg(args(0), k)
  }
}
