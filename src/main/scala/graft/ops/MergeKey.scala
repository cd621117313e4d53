package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Synthetic merge-key derivation.
  *
  * The reference adds an `arcane_merge_key` column derived from the entity
  * key (`Id` for Synapse Link) and partitions/merges on it
  * (`/root/reference/.helm/templates/crd-microsoft-synapse-link-beta.yaml:492-495`,
  * `/root/reference/docs/crd.md:211` — `bucket(arcane_merge_key, 10)`).
  */
object MergeKey {
  val ColumnName = "arcane_merge_key"

  /** Key expression: lowercased string form of the entity key column(s);
    * multiple key columns are joined with '|'. NULL components render as
    * an explicit marker — `concat_ws` SKIPS null arguments, so without it
    * composite keys ('a', NULL) and (NULL, 'a') would collide on the
    * merge key 'a' and the MERGE would silently collapse two distinct
    * entities' changes into one.
    */
  def expression(keyCols: Seq[Column]): Column =
    lower(concat_ws("|",
      keyCols.map(c => coalesce(c.cast("string"), lit("\u0000null"))): _*))

  def apply(df: DataFrame, keyColumns: Seq[String] = Seq("Id")): DataFrame =
    df.withColumn(ColumnName, expression(keyColumns.map(df.col)))
}

/** Latest-version-wins dedup inside one staged batch.
  *
  * The reference collapses multiple change rows per key to the single row
  * with the highest `versionnumber` before MERGE (merge sources must be
  * key-unique; proven by the replay/upsert integration scenario,
  * `/root/reference/src/test/scala/integration/StreamRunner.scala:184-233`).
  * A delete tombstone with a LOWER versionnumber must NOT shadow a newer
  * upsert — ordering is strictly by version (SURVEY.md §7 hard-part 4).
  *
  * Implemented with `max_by(struct(*), versionnumber)` — a single hash
  * aggregation with map-side partial combine, which at scale shuffles one
  * pre-aggregated row per key per partition instead of sorting whole
  * partitions the way a `row_number()` window would.
  */
object LatestVersionDedup {
  def apply(
      df: DataFrame,
      keyCol: String = MergeKey.ColumnName,
      versionCol: String = "versionnumber"
  ): DataFrame = {
    val valueCols = df.columns.filter(_ != keyCol)
    // Tie-break deterministically on the full row (struct comparison) so
    // replayed identical rows collapse stably.
    val payload = struct(col(versionCol) +: valueCols.filter(_ != versionCol).map(col): _*)
    df.groupBy(col(keyCol))
      .agg(max(payload).as("_latest"))
      .select(col(keyCol) +: (versionCol +: valueCols.filter(_ != versionCol).toSeq)
        .map(n => col(s"_latest.$n").as(n)): _*)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
