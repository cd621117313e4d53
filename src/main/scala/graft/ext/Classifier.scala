package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based corpus filtering: a linear text classifier over hashed
  * n-gram features — the "quality classifier" stage of modern pretraining
  * pipelines (fastText-style filtering in DataComp-LM, Li et al. 2024;
  * the educational-value classifier of FineWeb-Edu, Penedo et al. 2024;
  * the original CommonCrawl-vs-WebText filter of GPT-3, Brown et al.
  * 2020 §2.2 / appendix A). Train on a small labeled seed set (positives
  * = a trusted reference corpus, negatives = a random crawl sample), then
  * score the full corpus map-only and keep what clears a threshold.
  *
  * Shares [[Datasets.dsirBuckets]]'s featurization (hashed unigram +
  * word-bigram buckets) so the feature space is BOUNDED (`numBuckets`)
  * regardless of corpus vocabulary — the property that lets scoring run
  * as a per-row fold with a broadcast weight vector over 100 TB.
  *
  * Determinism: training is full-batch logistic-regression gradient
  * descent whose gradient is accumulated in FIXED-POINT integer
  * arithmetic (per-row residuals quantized to `1/FixedPointScale`, then
  * summed as exact Longs). Long addition commutes, so the fitted weights
  * are BIT-IDENTICAL under any partitioning / shuffle order — the same
  * exact-arithmetic rule every hash-gated operator here follows, and what
  * makes a trained-model gate replayable at all. Each iteration costs one
  * map pass (scores, row-local fold) plus ONE bucket-keyed aggregation
  * (map-side combined, ≤ `numBuckets` rows per partition) collected to
  * the driver (≤ `numBuckets` rows — bounded, not corpus-sized).
  *
  * Scale shape: fit touches only the LABELED set (seed sets are
  * 10³–10⁶ docs by contract — label collection is the expensive thing,
  * not compute); the corpus-sized pass is [[scoreWith]], which is
  * map-only with an O(numBuckets) broadcast literal. Fixed-point
  * headroom: |residual| ≤ 1 quantizes to ≤ 2²⁸, so Long sums stay exact
  * up to 2³⁵ ≈ 34 G token occurrences in the training set — far beyond
  * the seed-set contract; [[fit]] fails loudly rather than overflow.
  */
object Classifier {

  /** Residual quantization: 2^28 steps per unit. Precision 3.7e-9 per
    * occurrence (far below GD's own tolerance); headroom 2^63/2^28 = 2^35
    * token occurrences per gradient sum.
    */
  val FixedPointScale: Long = 1L << 28

  /** A fitted binary linear model over the hashed n-gram space.
    * `weights(b)` multiplies each occurrence of bucket `b`; the decision
    * function is `sigmoid(bias + Σ_occurrences weights(bucket))`.
    */
  final case class LinearModel(weights: Seq[Double], bias: Double) {
    def numBuckets: Int = weights.size
  }

  /** Fit by `iterations` full-batch GD steps with learning rate
    * `learningRate / n` (n = labeled rows) and optional L2 `l2`
    * (weight decay applied driver-side, deterministic).
    *
    * `labelCol` must be 0/1 (castable to double). The featurized labeled
    * set is cached across iterations; unpersisted before returning.
    */
  def fit(
      labeled: DataFrame,
      textCol: String = "text",
      labelCol: String = "label",
      numBuckets: Int = 1 << 16,
      iterations: Int = 30,
      learningRate: Double = 8.0,
      l2: Double = 0.0
  ): LinearModel = {
    val feats = Datasets.withDsirTokens(labeled, textCol)
      .select(col(labelCol).cast("double").as("_y"),
        Datasets.dsirBuckets(col("_dsir_toks"), numBuckets).as("_buckets"))
      .persist()
    try fitFeaturized(feats, numBuckets, iterations, learningRate, l2)
    finally feats.unpersist()
  }

  /** GD over an ALREADY-FEATURIZED (and caller-cached) `(_y, _buckets)`
    * frame — the shared core of [[fit]] and [[fitMulti]], so the k
    * one-vs-rest fits reuse ONE tokenization+bucketing pass instead of
    * re-running it per class.
    */
  private def fitFeaturized(
      feats: DataFrame,
      numBuckets: Int,
      iterations: Int,
      learningRate: Double,
      l2: Double
  ): LinearModel = {
    require(numBuckets > 0 && iterations >= 0)
    locally {
      // One fused pre-pass: row count, occurrence headroom and label
      // domain. A label outside {0,1} would silently skew every residual
      // (sigmoid(z) − 2 is a gradient, just a wrong one) — fail loudly.
      val pre = feats.agg(count(lit(1)), sum(size(col("_buckets"))),
        sum(when(col("_y").isNull || !col("_y").isin(0.0, 1.0), 1L).otherwise(0L))).first()
      val n = pre.getLong(0)
      require(n > 0, "classifier fit needs at least one labeled row")
      val occ = pre.getLong(1)
      require(occ < (Long.MaxValue / FixedPointScale),
        s"training set too large for exact gradient accumulation ($occ token occurrences)")
      require(pre.getLong(2) == 0L,
        s"labels must be exactly 0/1 (non-null); ${pre.getLong(2)} rows violate")

      var w = new Array[Double](numBuckets)
      var bias = 0.0
      val step = learningRate / n
      for (_ <- 0 until iterations) {
        val scored = feats.withColumn("_r_fp", residualFp(col("_buckets"), col("_y"), w, bias))
        // ONE bucket-keyed exact aggregation; ≤ numBuckets+1 rows collected.
        // Bias gradient rides along as bucket −1 (grouping sets would scan
        // twice; a union of one extra row per input row is what explode
        // already produces, so tag the row itself).
        val grad = scored
          .select(explode(concat(array(lit(-1)), col("_buckets"))).as("_b"), col("_r_fp"))
          .groupBy("_b").agg(sum("_r_fp").as("_g"))
          .collect()
        val g = new Array[Long](numBuckets)
        var gBias = 0L
        grad.foreach { r =>
          val b = r.getInt(0)
          if (b < 0) gBias = r.getLong(1) else g(b) = r.getLong(1)
        }
        val decay = 1.0 - step * l2
        val w2 = new Array[Double](numBuckets)
        var i = 0
        while (i < numBuckets) {
          w2(i) = w(i) * decay - step * (g(i).toDouble / FixedPointScale)
          i += 1
        }
        w = w2
        bias = bias - step * (gBias.toDouble / FixedPointScale)
      }
      LinearModel(w.toSeq, bias)
    }
  }

  /** Quantized residual `round((sigmoid(z) − y) · FixedPointScale)` with
    * `z` a ROW-LOCAL fold over the bucket array — deterministic per row,
    * no cross-row float order anywhere.
    */
  private def residualFp(buckets: Column, y: Column, w: Array[Double], bias: Double): Column = {
    val lam = typedLit(w.toSeq)
    val z = aggregate(buckets, lit(bias), (acc, b) => acc + element_at(lam, b + 1))
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    round((p - y) * FixedPointScale).cast("long")
  }

  /** Score a corpus with a fitted model: adds `quality_score` =
    * sigmoid(bias + Σ weights(bucket)) ∈ (0, 1). Map-only; the weight
    * vector ships once as an O(numBuckets) literal (the DSIR pattern).
    */
  def scoreWith(model: LinearModel, df: DataFrame, textCol: String = "text"): DataFrame = {
    val lam = typedLit(model.weights)
    Datasets.withDsirTokens(df, textCol)
      .withColumn("quality_score",
        lit(1.0) / (lit(1.0) + exp(-aggregate(
          Datasets.dsirBuckets(col("_dsir_toks"), model.numBuckets),
          lit(model.bias),
          (acc, b) => acc + element_at(lam, b + 1)))))
      .drop("_dsir_toks")
  }

  /** Keep rows whose `quality_score` clears `threshold` — the filter
    * stage. Threshold selection is the caller's policy (fixed, or a
    * corpus quantile via approx_percentile on a sample).
    */
  def filterWith(model: LinearModel, df: DataFrame, threshold: Double,
      textCol: String = "text"): DataFrame =
    scoreWith(model, df, textCol).where(col("quality_score") >= threshold)

  /** One-vs-rest multi-class fit (domain / topic labeling — the source
    * classifier of corpus-mixture pipelines): one [[LinearModel]] per
    * distinct value of `classCol`, each trained as that-class-vs-rest on
    * the same cached featurization contract. Class count is bounded by
    * contract (domains, not an open vocabulary).
    */
  def fitMulti(
      labeled: DataFrame,
      textCol: String = "text",
      classCol: String = "class",
      numBuckets: Int = 1 << 16,
      iterations: Int = 30,
      learningRate: Double = 8.0,
      l2: Double = 0.0
  ): Map[String, LinearModel] = {
    // featurize ONCE: tokenization + bucketing is the per-fit corpus scan,
    // and every OvR class consumes the identical featurized rows — only
    // the 0/1 label differs, a map-only projection over the cached frame
    val feats = Datasets.withDsirTokens(labeled, textCol)
      .select(col(classCol).cast("string").as("_cls"),
        Datasets.dsirBuckets(col("_dsir_toks"), numBuckets).as("_buckets"))
      .persist()
    try {
      val classes = feats.select(col("_cls"))
        .distinct().collect().map(_.getString(0)).sorted
      classes.map { c =>
        c -> fitFeaturized(
          feats.select((col("_cls") === c).cast("double").as("_y"), col("_buckets")),
          numBuckets, iterations, learningRate, l2)
      }.toMap
    } finally feats.unpersist()
  }

  /** Argmax-class labeling with a one-vs-rest model set: adds
    * `predicted_class` (ties → lexicographically smallest class, exact
    * rule so the choice replays anywhere). Map-only: all k weight vectors
    * ship as literals; k is domain-count-bounded.
    */
  def classifyWith(models: Map[String, LinearModel], df: DataFrame,
      textCol: String = "text"): DataFrame = {
    require(models.nonEmpty, "classifyWith needs at least one class model")
    val ordered = models.toSeq.sortBy(_._1)
    val toks = Datasets.withDsirTokens(df, textCol)
    val scored = ordered.foldLeft(toks) { case (acc, (c, m)) =>
      val lam = typedLit(m.weights)
      acc.withColumn(s"_score_$c",
        lit(m.bias) + aggregate(
          Datasets.dsirBuckets(col("_dsir_toks"), m.numBuckets),
          lit(0.0), (a, b) => a + element_at(lam, b + 1)))
    }
    // argmax with smallest-class tie-break: fold over (score, class) pairs
    val best = ordered.map { case (c, _) => struct(col(s"_score_$c").as("s"), lit(c).as("c")) }
      .reduceLeft((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored.withColumn("predicted_class", best.getField("c"))
      .drop("_dsir_toks" +: ordered.map { case (c, _) => s"_score_$c" }: _*)
  }
}
