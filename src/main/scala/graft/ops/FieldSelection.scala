package graft.ops

import org.apache.spark.sql.DataFrame

/** Field-selection rule: `all` | `include{fields}` | `exclude{fields}`, with
  * a set of essential fields that are always kept regardless of the rule.
  *
  * Mirrors the reference's `FieldsFilteringService`/`FieldFilteringTransformer`
  * (`/root/reference/src/main/scala/main.scala:20,37-40,78,81`; rule shape and
  * the default essential set `id, versionnumber, isdelete, arcane_merge_key`
  * from `.helm/templates/crd-microsoft-synapse-link-beta.yaml:474-523`).
  *
  * Implemented as a plain projection so Catalyst's column pruning pushes it
  * into the scan (the reference's `isServerSide` variant is the same thing
  * expressed at the source; with Spark the optimizer does it for free).
  */
sealed trait FieldSelectionRule
object FieldSelectionRule {
  case object All extends FieldSelectionRule
  final case class Include(fields: Set[String]) extends FieldSelectionRule
  final case class Exclude(fields: Set[String]) extends FieldSelectionRule
}

object FieldSelection {
  /** Default always-kept columns (CRD beta:487-495, lowercase match). */
  val DefaultEssentialFields: Set[String] =
    Set("id", "versionnumber", "isdelete", "arcane_merge_key")

  def apply(
      df: DataFrame,
      rule: FieldSelectionRule,
      essential: Set[String] = DefaultEssentialFields
  ): DataFrame = {
    val essLower = essential.map(_.toLowerCase)
    def isEssential(c: String) = essLower.contains(c.toLowerCase)
    val keep: Seq[String] = rule match {
      case FieldSelectionRule.All => df.columns.toSeq
      case FieldSelectionRule.Include(fs) =>
        val inc = fs.map(_.toLowerCase)
        df.columns.toSeq.filter(c => inc.contains(c.toLowerCase) || isEssential(c))
      case FieldSelectionRule.Exclude(fs) =>
        val exc = fs.map(_.toLowerCase)
        df.columns.toSeq.filterNot(c => exc.contains(c.toLowerCase) && !isEssential(c))
    }
    df.select(keep.map(df.col): _*)
  }
}
