package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) statistics for data-quality screening —
  * the outlier detector that survives the outliers it is hunting
  * (mean/stddev z-scores are dragged by the very rows they should flag;
  * median and MAD have a 50% breakdown point — Hampel 1974, Leys et al.
  * 2013). North-star extension: the "drop documents whose length /
  * score / value is wildly off for their group" primitive of a training
  * -data pipeline.
  *
  * Everything here is INTEGER-EXACT on integral inputs: the median is
  * the rank-⌈n/2⌉ element (the discrete lower median, `percentile_disc`
  * semantics — never the interpolated mean of two middle values), so
  * median, MAD, and the `|x − med| > c·MAD` comparison are all integer
  * arithmetic an oracle replays bit-exactly. Continuous signals should
  * be quantized first (e.g. `floor(value · 1000)` — fixed-point
  * permille, the house pattern).
  *
  * Scale shape: medians are computed by COUNTING, not sorting — a hash
  * agg onto distinct (group, value) pairs, then a running-sum window
  * over each group's distinct VALUES (bounded by value cardinality,
  * never row count). No row is ever sorted; rows are only hash-shuffled
  * once per median. The group-stats frames join back broadcast-style
  * when groups are few (AQE decides). For signals whose distinct
  * cardinality approaches row count, quantize coarser — that is the
  * knob, and it also tightens the window.
  */
object Robust {

  /** Discrete (lower) median per group by counting: the smallest value
    * whose cumulative count reaches ⌈n/2⌉ (`2·cum ≥ n` in integers).
    * NULL values are excluded. Returns `groupCols :+ (median)`.
    */
  def histogramMedian(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String
  ): DataFrame =
    histogramQuantile(df, groupCols, valueCol, Seq(500))
      .drop("q_permille").withColumnRenamed("value", "median")

  /** Discrete (lower) quantiles per group by counting — every requested
    * permille from ONE counting pass: for each q‰, the smallest value
    * whose cumulative count reaches rank ⌈q·n/1000⌉ (`1000·cum ≥ q·n`
    * in integers — exact, no interpolation, `percentile_disc`
    * semantics). The p50/p90/p99-per-group screen with the same scale
    * shape as the median: one hash agg onto distinct (group, value),
    * one running-sum window over distinct values, then the tiny
    * quantile list joins in by explode. NULL values are excluded.
    *
    * Returns `groupCols :+ (q_permille, value)`, one row per
    * group × quantile.
    */
  def histogramQuantile(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      quantilesPermille: Seq[Int]
  ): DataFrame = {
    require(groupCols.nonEmpty, "histogramQuantile needs at least one group column")
    require(quantilesPermille.nonEmpty && quantilesPermille.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be permille values in [1, 1000], got $quantilesPermille")
    require(quantilesPermille.distinct.length == quantilesPermille.length,
      s"duplicate quantiles: $quantilesPermille")
    require(!df.columns.exists(Set("_c", "_cum", "_n", "q_permille")),
      "columns _c/_cum/_n/q_permille are reserved by histogramQuantile")
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    counts
      .withColumn("_cum", sum(col("_c")).over(byGroup.orderBy(col(valueCol))))
      .withColumn("_n", sum(col("_c")).over(byGroup))
      .select((groupCols :+ valueCol :+ "_cum" :+ "_n").map(col) :+
        explode(array(quantilesPermille.map(lit(_)): _*)).as("q_permille"): _*)
      .where(col("_cum") * 1000 >= col("q_permille").cast("long") * col("_n"))
      .groupBy((groupCols :+ "q_permille").map(col): _*)
      .agg(min(col(valueCol)).as("value"))
  }

  /** Row-level robust outlier flags: joins each row to its group's
    * median, then to the group's MAD (median absolute deviation, again a
    * counting median), and flags `|x − median| > cutoff · MAD`. With
    * `cutoff = 3` on integral values the comparison is exact integer
    * arithmetic. A group whose MAD is 0 (over half the rows share one
    * value) flags every row off the median — the standard degenerate
    * case; widen with a floor on MAD upstream if that is too eager.
    *
    * Returns the input columns plus `(_median, _abs_dev, _mad,
    * is_outlier)`.
    */
  def madFlag(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      cutoff: Int = 3
  ): DataFrame = {
    require(cutoff > 0, "cutoff must be positive")
    require(!df.columns.exists(Set("_median", "_abs_dev", "_mad", "is_outlier")),
      "columns _median/_abs_dev/_mad/is_outlier are reserved by madFlag")
    val med = histogramMedian(df, groupCols, valueCol)
      .withColumnRenamed("median", "_median")
    val withDev = df.where(col(valueCol).isNotNull)
      .join(med, groupCols)
      .withColumn("_abs_dev", abs(col(valueCol) - col("_median")))
    val mad = histogramMedian(withDev, groupCols, "_abs_dev")
      .withColumnRenamed("median", "_mad")
    withDev.join(mad, groupCols)
      .withColumn("is_outlier", col("_abs_dev") > col("_mad") * cutoff)
  }

  /** Per-group robust summary for screening dashboards and gates:
    * `(groupCols..., median, mad, n, n_outliers)`. Same arithmetic as
    * [[madFlag]], aggregated.
    */
  def madSummary(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      cutoff: Int = 3
  ): DataFrame =
    madFlag(df, groupCols, valueCol, cutoff)
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(col("_median")).as("median"),
        max(col("_mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(col("is_outlier").cast("long")).as("n_outliers"))

  /** Per-group winsorization: clip `valueCol` to its group's
    * [lo‰, hi‰] counting quantiles — the standard tail-taming transform
    * before means/regressions on heavy-tailed telemetry (a trimmed
    * cousin of [[madFlag]]: instead of flagging outliers it caps them).
    * Quantiles are [[histogramQuantile]]'s discrete `percentile_disc`
    * ranks, so on integral values every step — the thresholds, the
    * `least/greatest` clip, and any downstream integer aggregate — is
    * exact and engine-replayable; no interpolation, no float drift.
    *
    * Scale shape: the quantile pass (one hash agg onto distinct
    * (group, value) + one running-sum window) produces a
    * groups × 2 threshold table that broadcast-joins back onto the data
    * (AQE picks the broadcast; the threshold table is group-count-sized
    * by construction) — the data itself is touched by exactly two scans
    * and never shuffled on the value.
    *
    * Returns the input columns plus `(_lo, _hi, _w)` where `_w` is the
    * clipped value.
    */
  def winsorize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      loPermille: Int = 50,
      hiPermille: Int = 950
  ): DataFrame = {
    require(loPermille < hiPermille,
      s"loPermille must be < hiPermille, got [$loPermille, $hiPermille]")
    require(!df.columns.exists(Set("_lo", "_hi", "_w")),
      "columns _lo/_hi/_w are reserved by winsorize")
    val qs = histogramQuantile(df, groupCols, valueCol, Seq(loPermille, hiPermille))
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(when(col("q_permille") === loPermille, col("value"))).as("_lo"),
        max(when(col("q_permille") === hiPermille, col("value"))).as("_hi"))
    df.where(col(valueCol).isNotNull)
      .join(qs, groupCols)
      .withColumn("_w", least(greatest(col(valueCol), col("_lo")), col("_hi")))
  }

  /** Per-group TRIMMED summary: drop each group's tails strictly outside
    * its [lo‰, hi‰] counting quantiles and aggregate what remains — the
    * robust-mean sibling of [[winsorize]] (winsorize CAPS tail values,
    * trim EXCLUDES them; a trimmed mean follows the surviving sum/count).
    * Same discrete-quantile machinery, so the thresholds and the kept-set
    * membership are exact and engine-replayable; the kept-sum rides
    * DECIMAL so the summary is bit-stable under any partitioning.
    *
    * Scale shape identical to [[winsorize]]: one counting-quantile pass
    * (hash agg on distinct (group, value) + running-sum window over the
    * value-histogram, never the rows), a group-count-sized threshold
    * table broadcast back, one filtered aggregate. Returns
    * `(groupCols…, n_total, n_kept, kept_sum, lo, hi)`.
    */
  def trimmedSummary(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      loPermille: Int = 50,
      hiPermille: Int = 950
  ): DataFrame = {
    require(loPermille < hiPermille,
      s"loPermille must be < hiPermille, got [$loPermille, $hiPermille]")
    val qs = histogramQuantile(df, groupCols, valueCol, Seq(loPermille, hiPermille))
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(when(col("q_permille") === loPermille, col("value"))).as("_lo"),
        max(when(col("q_permille") === hiPermille, col("value"))).as("_hi"))
    df.where(col(valueCol).isNotNull)
      .join(qs, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_total"),
        sum((col(valueCol) >= col("_lo") && col(valueCol) <= col("_hi")).cast("long")).as("n_kept"),
        sum(when(col(valueCol) >= col("_lo") && col(valueCol) <= col("_hi"),
          col(valueCol).cast("decimal(38,6)")).otherwise(lit(0).cast("decimal(38,6)"))).as("kept_sum"),
        max(col("_lo")).as("lo"),
        max(col("_hi")).as("hi"))
  }
}
