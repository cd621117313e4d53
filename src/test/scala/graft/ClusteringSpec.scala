package graft

import org.apache.spark.sql.functions._
import graft.ext.{Clustering, Similarity}

/** [[graft.ext.Clustering]] — the cluster-then-curate stage: assignment
  * reuses the IVF machinery (so its semantics are pinned by the ANN
  * gates); these cases pin the curation layers on top of it.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated unit clusters on coordinate axes: ids 0-9 near e1,
  // ids 10-29 near e2 (4-dim). Deterministic, separable, unequal sizes.
  private lazy val corpus = {
    val rows = (0 until 30).map { i =>
      val v =
        if (i < 10) Array(1.0, 0.01 * i, 0.0, 0.0)
        else Array(0.0, 0.0, 1.0, 0.005 * i)
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }
  private val centroids = Array(
    Array(1.0, 0.0, 0.0, 0.0),
    Array(0.0, 0.0, 1.0, 0.0))

  test("assignClusters puts every row in its obvious cluster with sim <= 1") {
    val out = Clustering.assignClusters(corpus, centroids)
      .select($"vec_id", $"cluster_id", $"centroid_sim")
      .as[(Long, Int, Double)].collect()
    assert(out.length == 30)
    out.foreach { case (id, cl, sim) =>
      assert(cl == (if (id < 10) 0 else 1), s"vec $id in cluster $cl")
      assert(sim > 0.9 && sim <= 1.0 + 1e-12, s"vec $id sim $sim")
    }
  }

  test("NULL-embedding rows drop from assignment (documented contract)") {
    val withNull = corpus.unionByName(
      Seq((99L, null.asInstanceOf[Seq[Double]])).toDF("vec_id", "embedding"))
    val out = Clustering.assignClusters(withNull, centroids)
    assert(out.count() == 30 && out.where($"vec_id" === 99L).count() == 0)
  }

  test("clusterSummary reports size and tightness per cluster") {
    val out = Clustering.clusterSummary(corpus, centroids)
      .orderBy($"cluster_id")
      .select($"cluster_id", $"n", $"mean_sim", $"min_sim", $"max_sim")
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((0, 10L), (1, 20L)))
    out.foreach { case (_, _, mean, mn, mx) =>
      assert(mn <= mean && mean <= mx && mn > 0.9)
    }
  }

  test("prototypePrune keeps ceil(n*p/1000) hardest rows per cluster") {
    val kept = Clustering.prototypePrune(corpus, centroids, keepPermille = 400)
      .select($"vec_id", $"cluster_id").as[(Long, Int)].collect()
    val byCluster = kept.groupBy(_._2).view.mapValues(_.map(_._1).sorted.toSeq).toMap
    // cluster 0: n=10 → keep 4; hardest = lowest cosine to e1 = largest
    // second component = ids 6..9. cluster 1: n=20 → keep 8 = ids 22..29.
    assert(byCluster(0) == Seq(6L, 7L, 8L, 9L))
    assert(byCluster(1) == (22L to 29L))
  }

  test("prototypePrune keepHardest=false flips to the most prototypical") {
    val kept = Clustering
      .prototypePrune(corpus, centroids, keepPermille = 400, keepHardest = false)
      .where($"cluster_id" === 0).select($"vec_id").as[Long].collect().sorted
    // easiest 4 of cluster 0 = smallest perturbation = ids 0..3
    assert(kept.toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("prototypePrune permille bounds: 0 keeps nothing... almost, 1000 keeps all") {
    // ⌈n·0/1000⌉ = 0 rows; ⌈n·1000/1000⌉ = n rows
    assert(Clustering.prototypePrune(corpus, centroids, 0).count() == 0)
    assert(Clustering.prototypePrune(corpus, centroids, 1000).count() == 30)
    intercept[IllegalArgumentException] {
      Clustering.prototypePrune(corpus, centroids, 1001)
    }
  }

  test("clusterBalancedSample caps dominant clusters, keeps tail coverage") {
    val out = Clustering.clusterBalancedSample(corpus, centroids, perCluster = 5)
      .select($"vec_id", $"cluster_id").as[(Long, Int)].collect()
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes == Map(0 -> 5, 1 -> 5))
    // replayable: a second run picks the identical rows
    val again = Clustering.clusterBalancedSample(corpus, centroids, perCluster = 5)
      .select($"vec_id").as[Long].collect().sorted
    assert(again.toSeq == out.map(_._1).sorted.toSeq)
  }

  test("assignment semantics match ivfAssign exactly (shared machinery)") {
    val viaClustering = Clustering.assignClusters(corpus, centroids)
      .select($"vec_id", $"cluster_id").as[(Long, Int)].collect().toMap
    val viaIvf = corpus.withColumn("l",
        Similarity.ivfAssign(col("embedding").cast("array<double>"), centroids))
      .select($"vec_id", $"l").as[(Long, Int)].collect().toMap
    assert(viaClustering == viaIvf)
  }

  test("sf0.1 corpus: trained centroids tighten clusters vs seed centroids") {
    // the production regime: k-means-trained centroids (the IVF build the
    // cluster-then-curate stage shares) must produce TIGHTER clusters than
    // raw seed vectors — mean cosine-to-centroid strictly improves, which
    // is the whole point of paying for the training pass before curation.
    val emb = spark.read.parquet(s"${sf("sf0.1")}/embeddings.parquet")
    def meanSim(cents: Array[Array[Double]]): Double =
      Clustering.assignClusters(emb, cents)
        .agg(avg($"centroid_sim")).first().getDouble(0)
    val seed = Similarity.sampleCentroids(emb, numLists = 16)
    val trained = Similarity.trainCentroids(emb, numLists = 16, iters = 3)
    val (sSeed, sTrained) = (meanSim(seed), meanSim(trained))
    info(f"sf0.1 mean centroid_sim: seed $sSeed%.4f -> trained $sTrained%.4f")
    assert(sTrained > sSeed, "training must tighten clusters")
    // and every corpus row stays covered (assignment is total)
    assert(Clustering.clusterSummary(emb, trained)
      .agg(org.apache.spark.sql.functions.sum($"n")).first().getLong(0) == emb.count())
  }

  test("gate shape on real embeddings: disjoint flags compose, all rows covered") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val out = graft.queries.Queries.qClusterCuration(spark, sf())
    val n = emb.count()
    assert(out.count() == n, "one output row per corpus row")
    val kept = out.where($"kept").count()
    // keep-rate ⌈·400‰⌉ per cluster: between 40% and 40%+k extra rows
    assert(kept >= (n * 2 + 4) / 5 && kept <= n * 2 / 5 + 8)
    assert(out.where($"balanced").count() <= 8 * 20)
    assert(out.select($"cluster_id").distinct().count() <= 8)
  }
}
