package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count / set-operation sketching beyond HLL registers
  * ([[Graph.hllRegisters]]): the KMV / theta family (Bar-Yossef et al.
  * 2002; Dasgupta et al. 2016's theta sketches are the production
  * descendant). North-star extension — no reference counterpart.
  *
  * A KMV sketch is the k SMALLEST distinct hash values of a key set.
  * Unlike HLL it supports SET EXPRESSIONS: the union of two sketches is
  * the k smallest of the merged states, and intersection cardinality
  * falls out of Jaccard over the union's threshold (the theta trick) —
  * the primitive behind "how many users did A AND B" at 100 TB without
  * a shuffle of the raw keys. State is k longs; merge is re-sort + trim.
  *
  * Everything below the estimate is INTEGER: hash values, sort order,
  * trim — so sketch STATE is bit-exact across engines/partitionings
  * (`ORDER BY hash LIMIT k` replays it; Spark plans the global sort+limit
  * as per-partition heaps + a driver merge of k rows,
  * TakeOrderedAndProject — never a full sort, same shape as
  * [[Datasets.weightedSample]]). Estimates (floats) happen after, like
  * [[Graph.hllEstimate]].
  */
object Sketches {

  /** Hash-value domain size for the 32-bit sketches: 2^32. */
  val HashSpace: Double = 4294967296.0

  /** KMV sketch state: the `k` smallest DISTINCT 32-bit hash values of
    * `keyCol`, one row per value, ascending. Default hash is xxhash64
    * folded to 32 bits (avalanche, for honest estimates); pass
    * [[Graph.replayableHash]] for cross-engine-replayable state (gates),
    * same split as [[Graph.hllRegisters]]. NULL keys are skipped.
    *
    * Returns `(hv)` with `count(*) ≤ k`.
    */
  def kmvSketch(
      df: DataFrame,
      keyCol: String,
      k: Int = 1024,
      hashCol: Option[Column] = None
  ): DataFrame = {
    require(k >= 16, s"k must be >= 16 for a usable estimate, got $k")
    val h32 = hashCol.getOrElse(pmod(xxhash64(col(keyCol)), lit(4294967296L)))
    df.where(col(keyCol).isNotNull)
      .select(h32.as("hv"))
      .distinct()
      .orderBy(col("hv"))
      .limit(k)
  }

  /** Per-group KMV sketch states via the native `kmv_agg` aggregate
    * ([[graft.sql.KmvAgg]]): one hash aggregation whose buffer dedups and
    * trims to k, so the shuffle carries ≤ k longs per group per input
    * partition — never the raw distinct (group, key) pairs. The per-group
    * answer to "distinct users per page / per segment / per day" whose
    * states then compose with [[kmvMergeCol]] / [[kmvJaccardCol]] for
    * cross-frame set expressions ("did A AND B") without re-reading keys.
    *
    * Returns `groupCols :+ (kmv: array<long> ascending, ≤ k)`.
    */
  def kmvSketchPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      keyCol: String,
      k: Int = 1024,
      hashCol: Option[Column] = None
  ): DataFrame = {
    require(k >= 16, s"k must be >= 16 for a usable estimate, got $k")
    graft.sql.GraftExtensions.ensureRegistered(df.sparkSession)
    val h32 = hashCol.getOrElse(pmod(xxhash64(col(keyCol)), lit(4294967296L)))
    df.where(col(keyCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(call_function("kmv_agg", h32, lit(k)).as("kmv"))
  }

  /** Columnar KMV cardinality estimate over a sketch-state array column
    * (the [[kmvEstimate]] formula, per row instead of per driver call):
    * exact size below k, else `(k − 1) / (hv_(k) / 2^32)`.
    */
  def kmvEstimateCol(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) / (element_at(sketch, k).cast("double") / HashSpace))

  /** Columnar merge of two sketch-state array columns: k smallest of the
    * deduped concatenation — the sketch of the set union, rowwise
    * (`array_union` dedups; sort + slice trims).
    */
  def kmvMergeCol(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Columnar Jaccard / intersection / union estimates from two
    * sketch-state array columns (the [[kmvIntersect]] theta trick,
    * rowwise — join two grouped sketch frames on the group key and apply
    * this to the pair): over the merged sketch's values, the fraction
    * present in BOTH inputs estimates J; intersection ≈ J · |A ∪ B|.
    * Returns a struct `(jaccard, inter_est, union_est)` (doubles — the
    * float math happens after the integer states, as everywhere).
    */
  /** Integral theta-sketch membership count: how many of the MERGED
    * sketch's values appear in BOTH input sketch states — the numerator
    * of every KMV Jaccard estimate. One place owns the membership rule
    * ([[kmvJaccardCol]] and TextAnalysis.sourceOverlapKmv both build on
    * it); stays an integer so integer-only gates can use it directly.
    */
  def kmvCommonCol(a: Column, b: Column, merged: Column): Column =
    size(array_intersect(array_intersect(merged, a), b))

  def kmvJaccardCol(a: Column, b: Column, k: Int): Column = {
    val merged = kmvMergeCol(a, b, k)
    val inBoth = kmvCommonCol(a, b, merged)
    val jac = inBoth.cast("double") / size(merged).cast("double")
    val unionEst = kmvEstimateCol(merged, k)
    struct(jac.as("jaccard"), (jac * unionEst).as("inter_est"), unionEst.as("union_est"))
  }

  /** Merge KMV sketch states: k smallest of the combined distinct values
    * — EXACTLY the sketch of the underlying set union (merge-then-trim
    * commutes with hashing; KmvSpec pins `merge(kmv(A), kmv(B)) ==
    * kmv(A ∪ B)`). Associative, so shards/days/tables combine in any
    * order.
    */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int = 1024): DataFrame =
    a.select(col("hv")).unionByName(b.select(col("hv")))
      .distinct().orderBy(col("hv")).limit(k)

  /** Distinct-cardinality estimate from a KMV state: `(k − 1) / t` where
    * `t = hv_(k) / 2^32` is the k-th smallest normalized hash (the
    * unbiased KMV estimator). A state with fewer than `k` values saw the
    * whole key set — its size IS the exact distinct count. Driver-side
    * over ≤ k rows by design.
    */
  def kmvEstimate(sketch: DataFrame, k: Int = 1024): Double = {
    val hs = sketch.select(col("hv")).orderBy(col("hv")).collect().map(_.getLong(0))
    if (hs.length < k) hs.length.toDouble
    else (k - 1).toDouble / (hs.last.toDouble / HashSpace)
  }

  /** Jaccard and intersection estimates for two KEY SETS from their KMV
    * states (the theta-sketch a-priori trick): over the MERGED sketch's
    * k values (threshold θ = its k-th value), count how many appear in
    * both input states — that fraction estimates J(A,B); intersection ≈
    * J · |A ∪ B| with |A ∪ B| estimated from the merged state. Returns
    * `(jaccardEst, interEst, unionEst)`. Driver-side over ≤ 3k longs.
    */
  def kmvIntersect(a: DataFrame, b: DataFrame, k: Int = 1024): (Double, Double, Double) = {
    val sa = a.select(col("hv")).collect().map(_.getLong(0)).toSet
    val sb = b.select(col("hv")).collect().map(_.getLong(0)).toSet
    val merged = (sa ++ sb).toArray.sorted.take(k)
    val inBoth = merged.count(h => sa.contains(h) && sb.contains(h))
    val jac = inBoth.toDouble / merged.length
    val unionEst =
      if (merged.length < k) merged.length.toDouble // saw the whole union
      else (merged.length - 1).toDouble / (merged.last.toDouble / HashSpace)
    (jac, jac * unionEst, unionEst)
  }
}
