package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space preprocessing for vector curation pipelines:
  * per-dimension standardization (diagonal whitening) and PCA
  * (dimensionality reduction / decorrelation — the preprocessing step of
  * SemDeDup-style clustering and the OPQ lineage of quantizers).
  *
  * Scale design: each fit is ONE bounded aggregation over a corpus scan
  * — standardize shuffles d dimension-index rows, PCA shuffles a single
  * ~d²/2 fixed-point buffer per partition ([[graft.sql.VecMomentsFp]]) —
  * and the driver reassembles at most a d×d matrix. All sums go through exact
  * DECIMAL accumulation, so fitted statistics are BIT-deterministic under
  * any partitioning — which is what lets a gate hash a standardized
  * similarity result against an external replay. At 100 TB fit on a
  * deterministic hash-sample (PCA needs O(d²) rows, not the corpus);
  * scoring/projection is a map-only fold over broadcast literals.
  */
object Embeddings {

  /** Fixed-point grid for the standardization moments: values and squares
    * are floored onto a 1e-12 grid BEFORE summation, so the accumulator is
    * an exact integer sum — commutative (partition-invariant) and, unlike
    * a double→decimal cast, free of round-half ambiguity across engines
    * (`floor` of an IEEE product is bit-defined; a decimal cast of a
    * dyadic float like 0.1871337890625 is a half-tie that Spark rounds
    * HALF_UP and DuckDB HALF_EVEN — measured on the test corpus). The
    * 1e-12 quantization error on a mean/std is orders below float32 input
    * precision. Same fixed-point-for-determinism pattern as
    * [[Classifier]]'s gradient accumulator.
    */
  private val FpScale = 1e12

  /** Per-dimension mean / population std-dev of an `array<float|double>`
    * column, one posexplode + one hash aggregation (map-side combined,
    * d-row shuffle). Returns `(pos, mean, std)`; moments are exact
    * integer sums on the [[FpScale]] grid (decimal(38,0) so 10^12-row
    * corpora cannot overflow) — replayable bit-for-bit in any engine (the
    * q_embed_standardize oracle replays it in DuckDB).
    */
  def dimensionStats(corpus: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val e = corpus.where(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
    def fpSum(c: Column) = sum(floor(c * FpScale).cast("decimal(38,0)"))
    e.groupBy(col("pos"))
      .agg(
        ((fpSum(col("x")).cast("double") / FpScale) / count(lit(1))).as("mean"),
        ((fpSum(col("x") * col("x")).cast("double") / FpScale) / count(lit(1))).as("ex2"))
      .select(col("pos"), col("mean"),
        sqrt(greatest(col("ex2") - col("mean") * col("mean"), lit(0.0))).as("std"))
  }

  /** Standardize every vector to z-scores (diagonal whitening): the fit is
    * [[dimensionStats]]; the stats are reassembled into two aligned arrays
    * in ONE tiny aggregation and broadcast-joined back, so the projection
    * is a map-only `zip_with` chain over the corpus scan. Dimensions with
    * zero variance map to 0 (they carry no information; dividing would
    * poison the row). Output column `zCol` is appended.
    */
  def standardize(
      corpus: DataFrame,
      vecCol: String = "embedding",
      zCol: String = "z"
  ): DataFrame = {
    val statsArr = dimensionStats(corpus, vecCol)
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
          s => s.getField("mean")).as("_means"),
        transform(array_sort(collect_list(struct(col("pos"), col("std")))),
          s => s.getField("std")).as("_stds"))
    corpus.crossJoin(broadcast(statsArr))
      .withColumn(zCol,
        zip_with(
          zip_with(col(vecCol).cast("array<double>"), col("_means"), (x, m) => x - m),
          col("_stds"),
          (c, s) => when(s > 0.0, c / s).otherwise(lit(0.0))))
      .drop("_means", "_stds")
  }

  /** A fitted PCA basis: `mean` (d), `components` (m rows of d, unit,
    * mutually orthogonal, eigenvalue-descending), `eigenvalues` (m,
    * variances along each component).
    */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def dim: Int = mean.length
    def m: Int = components.length
  }

  /** The PCA fit's single aggregation: ONE map-side pass over the corpus
    * ([[graft.sql.VecMomentsFp]] — per-dimension sums AND the whole
    * d·(d+1)/2 second-moment triangle accumulate exactly, in fixed point,
    * INSIDE the agg buffer), one Exchange carrying one ~d²/2 buffer per
    * partition, zero row expansion. Exposed for the plan pin in
    * EmbeddingsSpec (no Generate, exactly one Exchange) — the previous
    * formulation was a Generate-over-Generate materializing d·(d+1)/2
    * ROWS per input vector, the suite's slowest gate.
    */
  private[graft] def momentFrame(corpus: DataFrame, vecCol: String): DataFrame = {
    graft.sql.GraftExtensions.ensureRegistered(corpus.sparkSession)
    corpus.where(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>").as("v"))
      .agg(call_function("vec_moments_fp", col("v")).as("m"))
  }

  /** Fit PCA over an embedding column: one bounded job — the one-pass
    * exact fixed-point moments ([[momentFrame]]) — then the d×d
    * covariance is assembled on the driver and eigendecomposed with
    * cyclic Jacobi. The integer moment sums are partition-invariant, so
    * the whole fit is bit-stable under repartitioning (pinned by
    * q_pca_contract's refit check). Components get a sign convention
    * (largest-|coordinate| positive) so eigenvector sign ambiguity cannot
    * flip between runs.
    *
    * At 100 TB: fit on `corpus.where(pmod(xxhash64(id), N) < k)` — the
    * moments need O(d²) effective samples; the projection pass is the
    * only corpus-sized stage and it is map-only.
    */
  def pcaFit(
      corpus: DataFrame,
      numComponents: Int,
      vecCol: String = "embedding"
  ): PcaModel = {
    val m = momentFrame(corpus, vecCol).head().getStruct(0)
    val n = m.getLong(0)
    val sums = m.getSeq[java.math.BigDecimal](1)
    val prods = m.getSeq[java.math.BigDecimal](2)
    val d = sums.length
    require(numComponents >= 1 && numComponents <= d,
      s"numComponents must be in [1, $d], got $numComponents")

    val fp = graft.sql.VecMomentsFp.FpScale
    val mean = sums.map(s => s.doubleValue() / fp / n).toArray
    val cov = Array.ofDim[Double](d, d)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val e = prods(k).doubleValue() / fp / n
        val c = e - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        k += 1; j += 1
      }
      i += 1
    }

    val (values, vectors) = jacobiEigen(cov)
    // order: eigenvalue desc, index asc on exact ties — deterministic
    val order = values.indices.sortBy(i => (-values(i), i)).take(numComponents)
    val comps = order.map { i =>
      val c = vectors.map(_(i))
      // sign convention: the largest-|coordinate| entry is positive
      val k = c.indices.maxBy(j => (math.abs(c(j)), -j))
      if (c(k) < 0) c.map(x => -x) else c
    }.toArray
    PcaModel(mean, comps, order.map(values).toArray)
  }

  /** Project a vector column onto a fitted [[PcaModel]]:
    * p_c = <v, comp_c> − <mean, comp_c>. The mean dot is folded into a
    * scalar constant per component, so the per-row work is m codegen'd
    * `vec_dot` calls over broadcast plan literals — map-only, no
    * higher-order zip in the hot path.
    */
  def pcaProject(vec: Column, model: PcaModel): Column =
    array(model.components.map { c =>
      val off = c.zip(model.mean).map { case (a, b) => a * b }.sum
      call_function("vec_dot", vec, lit(c)) - lit(off)
    }: _*)

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix. Returns
    * (eigenvalues, eigenvector matrix with eigenvectors in COLUMNS,
    * aligned with the value order). Deterministic: fixed sweep order,
    * fixed convergence threshold; d ≤ a few hundred is instantaneous on
    * the driver.
    */
  private[ext] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val vtx = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = vtx(k)(p); val vkq = vtx(k)(q)
              vtx(k)(p) = c * vkp - s * vkq
              vtx(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), vtx)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }
}
