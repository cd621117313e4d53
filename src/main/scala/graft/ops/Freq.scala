package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency estimation with a count-min sketch — the fixed-size,
  * map-side answer to "how often does each key occur" when the key
  * cardinality makes an exact groupBy-count shuffle the bottleneck.
  * Completes the engine's sketch family (bloom membership, HLL
  * distinct, MinHash/SimHash similarity, approx percentiles).
  */
object Freq {

  /** Build a [[CountMinSketch]] over a column — Spark's public
    * `df.stat.countMinSketch`: one pass, map-side partial sketches merged
    * on the driver; sketch size depends only on (eps, confidence), never
    * on rows or cardinality, so the same call runs at 100 TB. Estimates
    * NEVER undercount a NON-NULL key; they overcount by ≤ eps·N with
    * probability `confidence` (the collision structure depends only on
    * the seed and the key hashes — data-size independent, so a gate
    * pinned at one SF holds at every SF). NULLs are outside the sketch:
    * Spark's sketch build skips null rows, so a null candidate estimates
    * 0 regardless of how many null rows the corpus holds — count nulls
    * with an `isNull` aggregate if they matter.
    */
  def countMin(
      df: DataFrame,
      column: String,
      eps: Double = 0.0001,
      confidence: Double = 0.99,
      seed: Int = 42
  ): CountMinSketch =
    df.stat.countMinSketch(column, eps, confidence, seed)

  /** Estimated counts for a CANDIDATE key frame (a distinct sample, a
    * domain table, heavy-hitter candidates — small by contract; capped by
    * `maxKeys` to keep the collect bounded) against a sketch built over
    * the corpus. Keys are collected and estimated on the driver — a
    * candidate set is driver-sized by definition, and this keeps the
    * engine's zero-UDF property (the sketch lookup is a JVM method, not
    * an expression). Corpus-sized frames belong in [[countMin]]'s one
    * scan, never here.
    */
  def estimateCounts(
      keys: DataFrame,
      keyCol: String,
      sketch: CountMinSketch,
      maxKeys: Int = 100000
  ): DataFrame = {
    val spark = keys.sparkSession
    val vals = keys.select(col(keyCol)).distinct().limit(maxKeys + 1).collect()
    require(vals.length <= maxKeys,
      s"estimateCounts got more than $maxKeys candidate keys — it is for candidate sets, not corpora")
    val outRows = vals.toSeq.map { r =>
      val v = if (r.isNullAt(0)) null else r.get(0)
      org.apache.spark.sql.Row(v, if (v == null) 0L else sketch.estimateCount(v))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      keys.schema(keyCol).copy(name = keyCol),
      org.apache.spark.sql.types.StructField("est_count", org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(outRows, 1), schema)
  }
}
