package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for every left row, the right row with the same
  * key and the greatest right timestamp ≤ the left timestamp (the
  * point-in-time lookup of CDC/versioned-dimension pipelines: "state as
  * of the event"). Spark has no native ASOF JOIN; the naive range-join
  * formulation (`l.k = r.k AND r.ts <= l.ts` + argmax) explodes to every
  * (left, earlier-right) pair before pruning — quadratic per key.
  *
  * This is the scalable union-merge formulation instead: tag both sides,
  * union, and run ONE per-key window ordered by (ts, side) carrying the
  * last non-null right payload — each left row then holds exactly the
  * latest right row at-or-before it. Cost: one shuffle on the key + one
  * per-key sort; linear in |L| + |R|, never |L|×|R|. Right rows sort
  * BEFORE left rows at equal timestamps, so the match is inclusive
  * (ties-at-ts match), like DuckDB/kdb ASOF semantics.
  *
  * Determinism: callers must make the right side unique per (key, ts)
  * (e.g. argmax-dedup first) — with duplicates the winner among
  * equal-timestamp right rows is partition-order dependent.
  *
  * Skew: a hot key is one window partition. For extreme per-key row
  * counts, pre-bucket by coarse time range (run the join per range with
  * the previous range's final state unioned in) — same pattern, bounded
  * partitions.
  */
object AsOfJoin {

  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightPayloadCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty, "asOfJoin needs at least one key column")
    val clash = rightPayloadCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"right payload columns collide with left columns: $clash — alias first")

    val leftType = StructType(left.schema.fields)
    val rightType = StructType(rightPayloadCols.map(c => right.schema(c)).toArray)

    val lp = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("_ts"), lit(1).as("_side"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("_l"),
        lit(null).cast(rightType).as("_r")): _*)
    val rp = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTsCol).as("_ts"), lit(0).as("_side"),
        lit(null).cast(leftType).as("_l"),
        struct(rightPayloadCols.map(col).toIndexedSeq: _*).as("_r")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // NULL-timestamp semantics, matching SQL/DuckDB ASOF (a NULL never
    // satisfies the inequality): a right row with NULL ts can match
    // nothing and is dropped from the walk (it would otherwise sort
    // nulls-first and be carried as a phantom match for every early left
    // row); a left row with NULL ts keeps its row but matches nothing.
    lp.unionByName(rp.where(col("_ts").isNotNull))
      .withColumn("_m",
        when(col("_ts").isNotNull, last(col("_r"), ignoreNulls = true).over(w)))
      .where(col("_side") === 1)
      .select(
        left.columns.map(c => col(s"_l.$c").as(c)).toIndexedSeq ++
          rightPayloadCols.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** FORWARD as-of join — for every left row, the right row with the same
    * key and the SMALLEST right timestamp ≥ the left timestamp ("the next
    * state after the event": label-with-next-outcome joins, lead-time
    * analyses). Same union-merge shape as [[asOfJoin]] — one shuffle on
    * the key, one per-key sort, linear in |L| + |R| — with the traversal
    * reversed: the window walks timestamps DESCENDING carrying the last
    * right payload seen, so each left row holds the earliest right row
    * at-or-after it. Right rows sort before left rows at equal
    * timestamps in the reversed order too, so ties-at-ts match
    * (inclusive), mirroring the backward variant.
    */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      rightPayloadCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty, "asOfJoinForward needs at least one key column")
    val clash = rightPayloadCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"right payload columns collide with left columns: $clash — alias first")

    val leftType = StructType(left.schema.fields)
    val rightType = StructType(rightPayloadCols.map(c => right.schema(c)).toArray)

    val lp = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("_ts"), lit(1).as("_side"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("_l"),
        lit(null).cast(rightType).as("_r")): _*)
    val rp = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTsCol).as("_ts"), lit(0).as("_side"),
        lit(null).cast(leftType).as("_l"),
        struct(rightPayloadCols.map(col).toIndexedSeq: _*).as("_r")): _*)

    // descending traversal: at equal _ts the right row (side 0) still
    // comes first, so an exactly-at-ts right row is visible to the left
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").desc, col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // same NULL-timestamp rule as [[asOfJoin]]: NULL-ts right rows match
    // nothing (desc puts nulls LAST, where the walk would hand the
    // smallest-ts right row to a NULL-ts left row — mask it instead)
    lp.unionByName(rp.where(col("_ts").isNotNull))
      .withColumn("_m",
        when(col("_ts").isNotNull, last(col("_r"), ignoreNulls = true).over(w)))
      .where(col("_side") === 1)
      .select(
        left.columns.map(c => col(s"_l.$c").as(c)).toIndexedSeq ++
          rightPayloadCols.map(c => col(s"_m.$c").as(c)): _*)
  }
}
