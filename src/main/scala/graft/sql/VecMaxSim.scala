package graft.sql

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vec_max_sim_bcast(v)` — the maximum cosine similarity of `v` against
  * every row of a broadcast row-major matrix (an eval/benchmark embedding
  * set). The kernel of SEMANTIC DECONTAMINATION: a training corpus is
  * scanned once, each row scored against the full eval set map-side, and
  * rows above a threshold flagged — no join, no shuffle, no corpus-sized
  * state anywhere.
  *
  * Scale shape: the eval matrix (benchmarks are 10^3–10^5 vectors) ships
  * to each executor ONCE via the block manager as a real `Broadcast`
  * (plan carries only a handle — same rationale as [[VecTopListsBcast]]);
  * per input row the loop is one multiply-add per (eval row, dim) cell
  * with constant code size, so Janino never sees the eval-set size.
  *
  * Row norms ride pre-computed beside the matrix (second element of the
  * broadcast tuple) — computed driver-side in array order so the score
  * arithmetic `dot / (normV * normRow)` replays bit-identically as
  * `list_dot_product(a,b) / (sqrt(list_dot_product(a,a)) *
  * sqrt(list_dot_product(b,b)))` in an external engine. IEEE max over
  * rows is order-independent (no NaN for finite non-degenerate inputs),
  * so the result does not depend on eval row order. NULL vector (or an
  * EMPTY eval matrix) yields NULL — "no evidence of contamination" stays
  * distinguishable from a 0.0 score.
  */
case class VecMaxSimBcast(
    child: Expression,
    data: Broadcast[(Array[Double], Array[Double])], // (flat matrix, row norms)
    dim: Int
) extends UnaryExpression with CodegenFallback {
  import VecTopLists.get

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "vec_max_sim_bcast(vec numeric-array)")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val va = v.asInstanceOf[ArrayData]
    val (matrix, norms) = data.value
    val numRows = norms.length
    if (numRows == 0) return null
    val vt = VecTopLists.elemType(child)
    val vn = va.numElements()
    // ‖v‖ in array order — bit-identical to sqrt(list_dot_product(v, v))
    var ss = 0.0
    var i = 0
    while (i < vn) {
      if (!va.isNullAt(i)) { val x = get(va, i, vt); ss += x * x }
      i += 1
    }
    val normV = math.sqrt(ss)
    // Degenerate inputs score NULL ("no evidence"), never a sentinel:
    //  - dimension mismatch: a truncated dot against a partial norm would
    //    silently DEFLATE similarity and miss contamination;
    //  - zero-norm: no direction, cosine undefined, and the 0/0 NaN has
    //    ENGINE-SPECIFIC max semantics (IEEE comparisons ignore NaN; some
    //    SQL engines sort it above all values);
    //  - NaN elements: normV is NaN, every score is NaN, and the IEEE
    //    `>` would quietly leave best at -Infinity.
    // Zero-norm/NaN EVAL rows are skipped for the same reason (NaN > 0.0
    // is false, so the norms(r) guard covers both).
    if (vn != dim || normV == 0.0 || java.lang.Double.isNaN(normV)) return null
    var best = Double.NegativeInfinity
    var any = false
    var r = 0
    while (r < numRows) {
      if (norms(r) > 0.0) {
        val base = r * dim
        var d = 0.0
        var j = 0
        while (j < dim) {
          if (!va.isNullAt(j)) d += get(va, j, vt) * matrix(base + j)
          j += 1
        }
        val score = d / (normV * norms(r))
        if (score > best) best = score
        any = true
      }
      r += 1
    }
    if (any) best else null
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "vec_max_sim_bcast"
}
