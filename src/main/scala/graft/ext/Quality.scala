package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ / dbt-test / Great
  * Expectations surface a production pipeline wraps around every ingest):
  * a rule set is evaluated into one report row per rule —
  * `(rule, violations, checked)` — with the scan work shaped for 100 TB:
  *
  *  - every ROW-LEVEL rule (not-null, range, set, regex, predicate) is
  *    fused into ONE aggregate over ONE scan of the table, each rule a
  *    `sum(violation)` / `sum(applicable)` pair with map-side partial
  *    combine — adding a rule adds two counters, never a pass;
  *  - a UNIQUE rule is one hash aggregate on its key (violations =
  *    rows in excess of their key's first occurrence);
  *  - a FOREIGN-KEY rule is one left-anti join against the parent's
  *    projected key (AQE broadcasts dimension-sized parents), counting
  *    child rows whose non-NULL key has no parent — SQL FK semantics:
  *    NULL keys are not violations (use NotNull to forbid them).
  *
  * Reports are deterministic (counts only, no sampled examples) so runs
  * are comparable across engines and cluster sizes; each rule row carries
  * `checked` (rows the rule applied to) so a violation count can be read
  * as a rate. Rules never throw on dirty data — dirty data is the
  * expected input; gating/alerting is the caller's policy.
  */
object Quality {

  sealed trait Rule { def name: String }

  /** Column must be non-NULL. */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
  }

  /** Non-NULL values must fall in [lo, hi] (inclusive). NULLs are not
    * checked (compose with [[NotNull]] to forbid them).
    */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($column,$lo,$hi)"
  }

  /** Non-NULL values must be one of `values`. */
  final case class InSet(column: String, values: Seq[String]) extends Rule {
    val name = s"in_set($column)"
  }

  /** Non-NULL values must match the (RE2-safe) regex. */
  final case class Matches(column: String, regex: String) extends Rule {
    val name = s"matches($column)"
  }

  /** Arbitrary row predicate; rows where it evaluates false or NULL are
    * violations (a constraint that cannot be evaluated is not satisfied).
    */
  final case class Predicate(label: String, holds: Column) extends Rule {
    val name = s"predicate($label)"
  }

  /** The key column set must identify rows uniquely. `violations` counts
    * the EXCESS rows (n − distinct keys): 0 means unique, and the count
    * is how many rows a perfect dedup would drop. NULLs participate as
    * key values (two NULL-keyed rows collide), matching groupBy.
    */
  final case class Unique(columns: Seq[String]) extends Rule {
    val name = s"unique(${columns.mkString(",")})"
  }

  /** Every non-NULL child key must exist in the parent's key column. */
  final case class ForeignKey(column: String, parent: DataFrame, parentColumn: String) extends Rule {
    val name = s"foreign_key($column)"
  }

  /** Evaluate all rules; returns `(rule, violations, checked)` ordered by
    * rule name. See the object scaladoc for the per-rule-kind plan shape.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Quality.check needs at least one rule")
    val spark = df.sparkSession
    import spark.implicits._

    val rowRules: Seq[(String, Column, Column)] = rules.collect {
      // (name, applicable?, violated?) — violated implies applicable
      case r @ NotNull(c) =>
        (r.name, lit(true), col(c).isNull)
      case r @ InRange(c, lo, hi) =>
        (r.name, col(c).isNotNull,
          col(c).isNotNull && !(col(c).cast("double") >= lo && col(c).cast("double") <= hi))
      case r @ InSet(c, vs) =>
        (r.name, col(c).isNotNull, col(c).isNotNull && !col(c).isInCollection(vs))
      case r @ Matches(c, re) =>
        (r.name, col(c).isNotNull, col(c).isNotNull && !col(c).rlike(re))
      case r @ Predicate(_, p) =>
        (r.name, lit(true), !coalesce(p, lit(false)))
    }

    val fused: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else Some {
        val aggs = rowRules.flatMap { case (n, app, vio) =>
          Seq(sum(vio.cast("long")).as(s"v:$n"), sum(app.cast("long")).as(s"c:$n"))
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        // one row of 2k counters → k report rows via stack (driver-free)
        val pairs = rowRules.map { case (n, _, _) =>
          s"'${n.replace("'", "''")}', coalesce(`v:$n`, 0L), coalesce(`c:$n`, 0L)"
        }
        one.selectExpr(
          s"stack(${rowRules.size}, ${pairs.mkString(", ")}) as (rule, violations, checked)")
      }

    val uniques = rules.collect { case r @ Unique(cols) =>
      val n = df.count()
      val nKeys = df.groupBy(cols.map(col).toIndexedSeq: _*).count().count()
      Seq((r.name, n - nKeys, n)).toDF("rule", "violations", "checked")
    }

    val fks = rules.collect { case r @ ForeignKey(c, parent, pc) =>
      val child = df.select(col(c).as("_fk")).where(col("_fk").isNotNull)
      val checked = child.count()
      val orphans = child
        .join(parent.select(col(pc).as("_fk")).distinct(), Seq("_fk"), "left_anti")
        .count()
      Seq((r.name, orphans, checked)).toDF("rule", "violations", "checked")
    }

    (fused.toSeq ++ uniques ++ fks)
      .reduce(_ unionByName _)
      .orderBy(col("rule"))
  }
}
