package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped top-k as a bounded-heap AGGREGATION instead of a window. */
object TopK {

  /** `row_number() OVER (PARTITION BY g ORDER BY o DESC) <= k` sorts
    * EVERY group's every row inside one exchange — at 100 TB the shuffle
    * carries the whole table and each task sorts its partitions. This
    * formulation aggregates with Spark's internal `CollectTopK` buffer
    * (≤ k rows per group, surfaced as the engine function `top_k_agg`),
    * with map-side partial combine — so the shuffle carries at most k
    * candidate rows per group per input partition and nothing is ever
    * fully sorted. Same results as the window formulation (gate-oracled).
    *
    * `orderCols` (compared left-to-right, descending) must make the
    * ordering TOTAL — append a unique id as the last tiebreaker; a heap
    * drops ties nondeterministically otherwise. Rows come back
    * largest-first per group with the original column set.
    */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[String],
      k: Int
  ): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.exists(Set("_top", "_t")), "columns _top/_t are reserved by topKPerGroup")
    require(groupCols.forall(df.columns.contains) && orderCols.forall(df.columns.contains),
      s"group/order columns must exist in the frame: ${df.columns.mkString(",")}")
    graft.sql.GraftExtensions.ensureRegistered(df.sparkSession)
    val payload = df.columns.filterNot(groupCols.contains).toSeq
    val ranked = struct((orderCols ++ payload.filterNot(orderCols.contains)).map(col): _*)
    df.groupBy(groupCols.map(col): _*)
      // reverse=false is CollectTopK's "largest" direction (reverse=true
      // flips to smallest — pinned by the spec's largest-first assertion)
      .agg(call_function("top_k_agg", ranked, lit(k), lit(false)).as("_top"))
      .select(groupCols.map(col) :+ explode(col("_top")).as("_t"): _*)
      .select(df.columns.map(c =>
        if (groupCols.contains(c)) col(c) else col(s"_t.$c").as(c)).toIndexedSeq: _*)
  }
}
