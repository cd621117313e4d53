package graft

import graft.ext.{Embeddings, Similarity}
import org.apache.spark.sql.functions._

/** Embedding preprocessing: standardization (diagonal whitening) and PCA. */
class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  private def syntheticVectors(n: Int, dim: Int, seed: Int = 11) = {
    val rnd = new scala.util.Random(seed)
    // anisotropic data: dimension j has std ~ (j+1), mean j — PCA must
    // find the high-variance directions, standardize must undo the scale
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j => j + (j + 1.0) * rnd.nextGaussian()))
    }
  }

  test("dimensionStats/standardize: exact moments, z-scores unit-ish, zero-variance dim maps to 0") {
    val rows = syntheticVectors(500, 6).map { case (id, v) =>
      (id, v.updated(3, 7.0)) // dim 3 constant → std 0
    }
    val df = rows.toDF("vec_id", "embedding")
    val stats = Embeddings.dimensionStats(df).orderBy($"pos")
      .as[(Int, Double, Double)].collect()
    assert(stats.length == 6)
    assert(math.abs(stats(3)._2 - 7.0) < 1e-9 && stats(3)._3 == 0.0)
    // moments are partition-invariant (exact fixed-point sums)
    val stats2 = Embeddings.dimensionStats(df.repartition(13)).orderBy($"pos")
      .as[(Int, Double, Double)].collect()
    assert(stats.toSeq == stats2.toSeq, "fixed-point moments must be bit-identical under repartitioning")

    val z = Embeddings.standardize(df).select($"vec_id", $"z").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // constant dim → exactly 0 for every row
    assert(z.values.forall(_(3) == 0.0))
    // standardized dims have ~zero mean, ~unit std
    val col0 = z.values.map(_.head).toSeq
    val m0 = col0.sum / col0.size
    val s0 = math.sqrt(col0.map(x => (x - m0) * (x - m0)).sum / col0.size)
    assert(math.abs(m0) < 1e-6 && math.abs(s0 - 1.0) < 1e-6)
  }

  test("pcaFit: orthonormal eigenvalue-ordered basis, recovers variance ranking, deterministic") {
    val df = syntheticVectors(800, 8).toDF("vec_id", "embedding")
    val model = Embeddings.pcaFit(df, numComponents = 4)
    assert(model.m == 4 && model.dim == 8)
    // eigenvalues descending and positive
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1)))
    assert(model.eigenvalues.forall(_ > 0))
    // orthonormal components
    for (i <- 0 until 4; j <- i until 4) {
      val dot = model.components(i).zip(model.components(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"components ($i, $j) dot = $dot")
    }
    // the top component aligns with the highest-variance axis (dim 7)
    assert(model.components.head.zipWithIndex.maxBy(p => math.abs(p._1))._2 == 7)
    // deterministic under repartitioning (exact-decimal moments + fixed Jacobi)
    val model2 = Embeddings.pcaFit(df.repartition(17), numComponents = 4)
    assert(model.components.zip(model2.components).forall { case (a, b) =>
      java.util.Arrays.equals(a, b) }, "PCA fit must be bit-identical under repartitioning")
    assert(java.util.Arrays.equals(model.eigenvalues, model2.eigenvalues))
  }

  test("pcaFit plan: zero row expansion — no Generate, exactly one Exchange") {
    val df = syntheticVectors(100, 8).toDF("vec_id", "embedding")
    // AQE wraps the physical plan; pin on the rendered tree (collect does
    // not descend into AdaptiveSparkPlan's inner plan before execution)
    val plan = Embeddings.momentFrame(df, "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"),
      s"the moment pass must not explode rows (was the Generate-over-Generate regression):\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"one partial-agg Exchange expected, got $exchanges:\n$plan")
    assert(plan.contains("partial_vec_moments_fp"),
      s"map-side partial aggregation must be present:\n$plan")
  }

  test("pcaFit handles null vectors and null coordinates like the sum/count formulation") {
    val rows = syntheticVectors(200, 4).map { case (id, v) => (id, v) }
    val df = rows.toDF("vec_id", "embedding")
      .unionByName(Seq((9999L, null.asInstanceOf[Array[Double]]))
        .toDF("vec_id", "embedding"))
    val model = Embeddings.pcaFit(df, numComponents = 2) // must not throw
    assert(model.dim == 4 && model.eigenvalues.forall(_ > 0))
  }

  test("pcaProject: projected-space ANN keeps high recall vs full-space brute force") {
    val df = syntheticVectors(400, 16, seed = 23).toDF("vec_id", "embedding")
    val model = Embeddings.pcaFit(df, numComponents = 8)
    // captured variance dominates (anisotropic data — top half of dims)
    val totalVar = Embeddings.pcaFit(df, numComponents = 16).eigenvalues.sum
    assert(model.eigenvalues.sum / totalVar > 0.85,
      s"8/16 components must capture most variance, got ${model.eigenvalues.sum / totalVar}")
    def topk(m: Int): Set[(Long, Long)] = {
      val mod = if (m == model.m) model else Embeddings.pcaFit(df, numComponents = m)
      val proj = df.select($"vec_id", Embeddings.pcaProject($"embedding", mod).as("p"))
      Similarity.bruteForceTopK(proj.where($"vec_id" < 20), proj, k = 10, vecCol = "p")
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    }
    // full-rank projection = rotation of the CENTERED space: cosine top-k
    // is exactly invariant under an orthonormal basis change
    val centered = topk(16)
    assert(centered == topk(16), "full-rank projection must be deterministic")
    // 12/16 components: high-recall approximation of the centered baseline
    val recall = centered.intersect(topk(12)).size.toDouble / centered.size
    assert(recall >= 0.75, s"PCA(12/16) ANN recall $recall below floor")
    // projection is map-only (vec_dot over plan literals, no shuffle)
    val plan = df.select(Embeddings.pcaProject($"embedding", model))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "pcaProject must not shuffle")
  }
}
