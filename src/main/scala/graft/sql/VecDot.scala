package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vec_dot(a, b)` — dot product of two numeric array columns in double
  * precision, as a native Catalyst expression with whole-stage codegen.
  *
  * Rationale (SURVEY.md §2.C north-star similarity ops): the
  * `aggregate(zip_with(...))` higher-order-function formulation is
  * interpreted and boxes every element — measured ~5× slower on the ANN
  * queries. This expression compiles to a primitive `for` loop over the
  * columnar `ArrayData`, stays inside WholeStageCodegen, and sums in array
  * order (left-to-right), bit-identical to the sequential HOF/DuckDB
  * evaluation the correctness oracles use.
  *
  * Null elements are skipped (treated as 0 contribution); a null array
  * yields null (standard null-safe binary expression semantics).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires numeric array arguments, got ${left.dataType} and ${right.dataType}")
  }

  private def get(a: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case _ => 0.0
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += get(a, i, ta) * get(b, i, tb)
      i += 1
    }
    s
  }

  private def genGet(arr: String, i: String, et: DataType): String = et match {
    case FloatType => s"(double)$arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"(double)$arr.getInt($i)"
    case LongType => s"(double)$arr.getLong($i)"
    case _ => "0.0"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ${genGet(a, i, elemType(left))} * ${genGet(b, i, elemType(right))};
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[VecDot].getName, null, "vec_dot",
    "_FUNC_(a, b) - double-precision dot product of two numeric arrays.", "")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"vec_dot expects 2 arguments, got ${args.length}")
    VecDot(args.head, args(1))
  }

  /** Back-compat alias: register all engine functions. */
  def ensureRegistered(spark: SparkSession): Unit = GraftExtensions.ensureRegistered(spark)
}
