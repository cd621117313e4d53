package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `vec_top_lists(v, centroids_flat, dim, nprobe)` — the `nprobe` centroid
  * indices with the highest cosine score against `v`, ordered best-first
  * (ties broken toward the LARGER index, matching Spark's
  * `reverse(array_sort(struct(score, list)))` ordering so existing IVF
  * oracles replay bit-identically; score = dot/‖v‖ in the same IEEE op
  * order as the `vec_dot`-based formulation it replaces).
  *
  * Scale rationale: the previous `greatest(struct(...), ...numLists)` /
  * `array_sort(array(...numLists))` formulation builds an O(numLists)
  * EXPRESSION TREE — fine at 8 lists, but Janino cannot compile it at the
  * ~10^4-10^5 lists a 100 TB IVF index needs (numLists ~ √N). This
  * expression is a DATA-driven loop over a broadcast flat centroid matrix:
  * constant code size at any list count, one multiply-add per (list, dim)
  * cell, `CodegenFallback` deliberate (arithmetic-dominated tight loop,
  * same pattern as [[MinHashSig]]).
  */
case class VecTopLists(children: Seq[Expression]) extends Expression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = children.head.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def numArray(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (children.length == 4 && numArray(children(0)) && numArray(children(1)) &&
      children(2).dataType == IntegerType && children(3).dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "vec_top_lists(vec array, centroids_flat array, dim int, nprobe int)")
  }

  import VecTopLists.{better, elemType, get}

  override def eval(input: InternalRow): Any = {
    val v = children(0).eval(input)
    if (v == null) return null
    val va = v.asInstanceOf[ArrayData]
    val cents = children(1).eval(input).asInstanceOf[ArrayData]
    val dim = children(2).eval(input).asInstanceOf[Int]
    val nprobe = children(3).eval(input).asInstanceOf[Int]
    val vt = elemType(children(0))
    val ct = elemType(children(1))
    val vn = va.numElements()
    // ‖v‖ accumulated in array order — bit-identical to sqrt(vec_dot(v, v))
    var ss = 0.0
    var i = 0
    while (i < vn) {
      if (!va.isNullAt(i)) { val x = get(va, i, vt); ss += x * x }
      i += 1
    }
    val norm = math.sqrt(ss)
    val numLists = cents.numElements() / math.max(1, dim)
    val k = math.max(0, math.min(nprobe, numLists))
    val topIdx = new Array[Int](k)
    val topScore = new Array[Double](k)
    var filled = 0
    var li = 0
    while (li < numLists) {
      val base = li * dim
      val m = math.min(dim, vn)
      var d = 0.0
      var j = 0
      while (j < m) {
        if (!va.isNullAt(j)) d += get(va, j, vt) * get(cents, base + j, ct)
        j += 1
      }
      val score = d / norm
      var pos = -1
      if (filled < k) { pos = filled; filled += 1 }
      else if (k > 0 && better(score, li, topScore(k - 1), topIdx(k - 1))) pos = k - 1
      if (pos >= 0) {
        topScore(pos) = score; topIdx(pos) = li
        var p = pos
        while (p > 0 && better(topScore(p), topIdx(p), topScore(p - 1), topIdx(p - 1))) {
          val ts = topScore(p); topScore(p) = topScore(p - 1); topScore(p - 1) = ts
          val ti = topIdx(p); topIdx(p) = topIdx(p - 1); topIdx(p - 1) = ti
          p -= 1
        }
      }
      li += 1
    }
    new GenericArrayData(topIdx.take(filled))
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)

  override def prettyName: String = "vec_top_lists"
}

object VecTopLists {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[VecTopLists].getName, null, "vec_top_lists",
    "_FUNC_(v, centroids_flat, dim, nprobe) - top-nprobe centroid indices by cosine, best-first.", "")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 4, s"vec_top_lists expects 4 arguments, got ${args.length}")
    VecTopLists(args)
  }

  private[sql] def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  private[sql] def get(a: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType   => a.getLong(i).toDouble
    case _          => 0.0
  }

  // better-than under descending (score, index) — Double.compare semantics
  // match Spark's double ordering for the sort this replaces
  private[sql] def better(s1: Double, i1: Int, s2: Double, i2: Int): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 > i2)
  }
}

/** Broadcast-matrix variant of [[VecTopLists]] for the Scala API path: the
  * flat centroid matrix rides a real `Broadcast` handle instead of a plan
  * `Literal`. At the 10^4–10^5-list × dim scale a 100 TB IVF index needs
  * (numLists ~ √N), a literal matrix is tens of MB serialized into every
  * task closure and rendered into plan strings/UI; the broadcast ships the
  * matrix to each executor once via the block manager and the plan carries
  * only a handle. The scoring loop keeps [[VecTopLists]]'s exact IEEE op
  * order (same norm accumulation, same multiply-add order, same
  * descending (score, index) tie-break), so IVF oracle results are
  * bit-identical between the two forms.
  */
case class VecTopListsBcast(
    child: Expression,
    centroids: org.apache.spark.broadcast.Broadcast[Array[Double]],
    dim: Int,
    nprobe: Int
) extends UnaryExpression with CodegenFallback {
  import VecTopLists.{better, get}

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "vec_top_lists_bcast(vec numeric-array)")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val va = v.asInstanceOf[ArrayData]
    val cents = centroids.value
    val vt = VecTopLists.elemType(child)
    val vn = va.numElements()
    var ss = 0.0
    var i = 0
    while (i < vn) {
      if (!va.isNullAt(i)) { val x = get(va, i, vt); ss += x * x }
      i += 1
    }
    val norm = math.sqrt(ss)
    val numLists = cents.length / math.max(1, dim)
    val k = math.max(0, math.min(nprobe, numLists))
    val topIdx = new Array[Int](k)
    val topScore = new Array[Double](k)
    var filled = 0
    var li = 0
    while (li < numLists) {
      val base = li * dim
      val m = math.min(dim, vn)
      var d = 0.0
      var j = 0
      while (j < m) {
        if (!va.isNullAt(j)) d += get(va, j, vt) * cents(base + j)
        j += 1
      }
      val score = d / norm
      var pos = -1
      if (filled < k) { pos = filled; filled += 1 }
      else if (k > 0 && better(score, li, topScore(k - 1), topIdx(k - 1))) pos = k - 1
      if (pos >= 0) {
        topScore(pos) = score; topIdx(pos) = li
        var p = pos
        while (p > 0 && better(topScore(p), topIdx(p), topScore(p - 1), topIdx(p - 1))) {
          val ts = topScore(p); topScore(p) = topScore(p - 1); topScore(p - 1) = ts
          val ti = topIdx(p); topIdx(p) = topIdx(p - 1); topIdx(p - 1) = ti
          p -= 1
        }
      }
      li += 1
    }
    new GenericArrayData(topIdx.take(filled))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "vec_top_lists_bcast"
}
