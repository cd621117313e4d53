package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history from a CDC change stream —
  * the canonical downstream consumer of the reference's merge output
  * (the reference lands versioned rows keyed by `arcane_merge_key` with
  * `versionnumber` ordering, cf.
  * /root/reference/src/main/scala/main.scala:22-24 via the Synapse CDM
  * model; an SCD2 view is what a warehouse reads off such a table).
  *
  * Semantics: per key, order changes by (ts, tie-break ord); collapse
  * consecutive rows whose tracked attributes are unchanged (a true SCD2
  * row opens only when an attribute CHANGES — reprocessing the same
  * state twice must not fork a version); then `valid_from` = the change
  * ts, `valid_to` = the next change's ts (NULL while current),
  * `is_current`, and a per-key `version` number.
  *
  * 100 TB shape: ONE shuffle on the key — both windows (the
  * change-collapse lag and the validity lead) and the final row_number
  * partition by the same key, so Catalyst plans a single Exchange and
  * sorts once; the collapse filter runs between them without
  * repartitioning. No driver state, no joins.
  */
object Scd2 {

  /** @param df       change stream (one row per observed state)
    * @param keyCol   entity key
    * @param tsCol    change timestamp (valid_from of the new state)
    * @param ordCol   unique tie-breaker within equal timestamps
    * @param attrCols tracked attributes (change in ANY opens a version)
    */
  def history(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      attrCols: Seq[String]
  ): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    require(!df.columns.exists(Set("_sig", "_prev")),
      "columns _sig/_prev are reserved by Scd2.history")
    val outCols = Set("version", "valid_from", "valid_to", "is_current")
    require(!df.columns.exists(outCols),
      s"input already has an output column (${outCols.mkString("/")}) — " +
        "rename it; withColumn would silently overwrite it")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    // NULL-safe change signature: struct equality treats NULL = NULL as
    // equal, so a NULL attribute does not fork a version on every row.
    val sig = struct(attrCols.map(col): _*)
    val changes = df
      .withColumn("_sig", sig)
      .withColumn("_prev", lag(col("_sig"), 1).over(w))
      // first row per key (prev IS NULL) or any tracked attribute changed
      .where(col("_prev").isNull || !(col("_prev") <=> col("_sig")))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_sig", "_prev")
  }
}
