package graft.sql

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc(text)` / `nfkc(text)` — Unicode canonical (NFC) or compatibility
  * (NFKC) composition, as a native Catalyst expression with whole-stage
  * codegen.
  *
  * Training-corpus hygiene needs byte-identical text for exact dedup and
  * fingerprinting: the same word arrives both precomposed (`é` U+00E9)
  * and decomposed (`e` + U+0301) from different crawls, and they neither
  * hash- nor string-compare equal until normalized. No Spark built-in
  * exposes java.text.Normalizer, and a Scala UDF would box the string and
  * fall out of codegen — this expression stays in the WholeStageCodegen
  * span.
  *
  * Scale fast path: `Normalizer.isNormalized` is a cheap scan (ASCII and
  * already-composed text — the overwhelming majority of a web corpus —
  * returns true without allocating), so the normalize allocation is paid
  * only on rows that actually need it.
  */
case class UnicodeNormalize(child: Expression, compat: Boolean) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], compat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.UnicodeNormalize.normalize($c, $compat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = if (compat) "nfkc" else "nfc"
}

object UnicodeNormalize {

  /** Static entry point shared by interpreted eval and generated code
    * (scalac emits a static forwarder on the companion class, which is
    * what Janino resolves). Returns the INPUT object unchanged when the
    * text is already normalized — zero allocation on the hot path.
    */
  def normalize(s: UTF8String, compat: Boolean): UTF8String = {
    val str = s.toString
    val form = if (compat) Normalizer.Form.NFKC else Normalizer.Form.NFC
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  val nfcInfo: ExpressionInfo = new ExpressionInfo(
    classOf[UnicodeNormalize].getName, null, "nfc",
    "_FUNC_(text) - Unicode NFC (canonical composition) normalization.", "")
  val nfkcInfo: ExpressionInfo = new ExpressionInfo(
    classOf[UnicodeNormalize].getName, null, "nfkc",
    "_FUNC_(text) - Unicode NFKC (compatibility composition) normalization.", "")

  val nfcBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, s"nfc expects 1 argument, got ${args.length}")
    UnicodeNormalize(args.head, compat = false)
  }
  val nfkcBuilder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, s"nfkc expects 1 argument, got ${args.length}")
    UnicodeNormalize(args.head, compat = true)
  }
}
