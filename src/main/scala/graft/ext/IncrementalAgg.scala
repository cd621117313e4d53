package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of grouped COUNT/SUM aggregates off a
  * [[graft.tables.SnapshotTable]] change feed — the materialized-view
  * refresh a reporting layer runs after every CDC merge, without
  * rescanning the table.
  *
  * COUNT and SUM are retractable aggregates: an insert contributes
  * (+1, +x), a delete (−1, −x), an update (+1, +new) + (−1, −old) — so
  * the new aggregate state is `old state ⊎ group deltas`, computable from
  * [[graft.tables.SnapshotTable.changesBetweenDetailed]] alone. AVG is
  * sum/count at read time; MIN/MAX are NOT retractable (a deleted minimum
  * needs a rescan of its group) and are deliberately absent.
  *
  * Scale shape: the change feed is bucket-pruned (cost tracks the delta),
  * the delta aggregation is one hash agg over change rows with map-side
  * combine, and the state merge is a group-key union-aggregate between
  * two group-cardinality-sized frames — the table itself is never read.
  * Sums are carried as DECIMAL(38,6) so state is EXACTLY equal to a full
  * recompute under any partitioning or refresh schedule (float sums would
  * drift by addition order and the gate's full-recompute equality would
  * be unprovable).
  *
  * State schema: group columns ++ `n` (count) ++ `sum_<col>` per sum
  * column. Groups whose count reaches zero are dropped (a full recompute
  * would not show them either). NULL measure values contribute zero to
  * sums, like SQL SUM ignoring NULLs; rows still count toward `n`.
  */
object IncrementalAgg {

  private val Dec = "decimal(38,6)"

  /** Aggregate a table read (or any frame) into the state shape — the
    * initial materialization, and the full-recompute oracle in tests.
    */
  def full(df: DataFrame, groupCols: Seq[String], sumCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(coalesce(col(c).cast(Dec), lit(0).cast(Dec))).as(s"sum_$c")): _*)

  /** Per-group deltas from a detailed change feed: +after − before. */
  def groupDeltas(changes: DataFrame, groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    def side(img: String, sign: Int) =
      changes.where(col(img).isNotNull).select(
        groupCols.map(c => col(s"$img.`$c`").as(c)) ++
          Seq(lit(sign.toLong).as("_dn")) ++
          sumCols.map(c =>
            (coalesce(col(s"$img.`$c`").cast(Dec), lit(0).cast(Dec)) * sign).as(s"_ds_$c")): _*)
    side("after", 1).unionByName(side("before", -1))
      .groupBy(groupCols.map(col).toIndexedSeq: _*)
      .agg(sum(col("_dn")).as("dn"),
        sumCols.map(c => sum(col(s"_ds_$c")).as(s"ds_$c")): _*)
  }

  /** New state = previous state ⊎ deltas; zero-count groups drop out. */
  def applyDeltas(prev: DataFrame, deltas: DataFrame,
      groupCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val p = prev.select(
      groupCols.map(col) ++ Seq(col("n").as("dn")) ++
        sumCols.map(c => col(s"sum_$c").cast(Dec).as(s"ds_$c")): _*)
    p.unionByName(deltas)
      .groupBy(groupCols.map(col).toIndexedSeq: _*)
      .agg(sum(col("dn")).as("n"),
        sumCols.map(c => sum(col(s"ds_$c")).as(s"sum_$c")): _*)
      .where(col("n") > 0)
  }

  /** One refresh step: fold the change window into the previous state. */
  def refresh(prev: DataFrame, table: graft.tables.SnapshotTable,
      fromVersion: Long, toVersion: Long,
      groupCols: Seq[String], sumCols: Seq[String]): DataFrame =
    applyDeltas(prev,
      groupDeltas(table.changesBetweenDetailed(fromVersion, toVersion), groupCols, sumCols),
      groupCols, sumCols)
}
