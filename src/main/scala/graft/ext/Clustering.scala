package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space corpus clustering for training-data curation — the
  * cluster-then-curate stage modern corpus pipelines run between near-dup
  * removal and mixing (cluster-balanced sampling in DataComp-style
  * curation; prototypicality pruning after Sorscher et al., "Beyond
  * neural scaling laws: beating power law scaling via data pruning",
  * NeurIPS 2022; SemDeDup's per-cluster scoping, Abbas et al. 2023).
  *
  * Reuses the ANN family's k-means machinery ([[Similarity.trainCentroids]]
  * k-means‖ with D² seeding, [[Similarity.ivfAssign]] broadcast argmax-
  * cosine assignment), so fit cost and assignment semantics are identical
  * to the IVF index build — one training pass, then ONE map-only
  * assignment pass over the corpus.
  *
  * Scale shape: assignment is map-only (centroid matrix broadcast); the
  * per-cluster ranking ops shuffle ONCE on `cluster_id`. Cluster-partition
  * skew is bounded by k-means balance — choose k so the expected cluster
  * is partition-sized (k ≈ corpus/10⁶ at 100 TB), the same sizing rule
  * the IVF index documents. The windows are rank-only (streaming sort per
  * partition, spillable), never whole-corpus collects.
  */
object Clustering {

  /** Assign every row to its argmax-cosine centroid and attach the
    * similarity to that centroid. `cluster_id` uses [[Similarity.ivfAssign]]
    * (ties → larger list, the IVF gates' pinned order); `centroid_sim` is
    * cosine(v, centroid) with unit centroids, so it is `dot / ‖v‖`.
    * Map-only plus one BROADCAST join of k centroid rows — no shuffle of
    * the corpus.
    *
    * Rows with a NULL embedding have no position in the space and DROP
    * from the output (the inner centroid join filters their NULL
    * cluster_id) — curation over them is meaningless; filter them out
    * explicitly upstream if their absence should be loud.
    */
  def assignClusters(
      df: DataFrame,
      centroids: Array[Array[Double]],
      vecCol: String = "embedding"
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.sql.VecDot.ensureRegistered(spark)
    val cents = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster_id", "_centroid")
    val v = col(vecCol).cast("array<double>")
    df.withColumn("cluster_id", Similarity.ivfAssign(v, centroids))
      .join(broadcast(cents), "cluster_id")
      .withColumn("centroid_sim",
        Similarity.dot(v, col("_centroid")) / Similarity.norm(v))
      .drop("_centroid")
  }

  /** Per-cluster curation report: size, mean/min/max centroid similarity
    * (tightness — a loose cluster is a mixed topic; a tiny tight one is a
    * near-dup pocket). ONE hash aggregation, k output rows.
    */
  def clusterSummary(
      df: DataFrame,
      centroids: Array[Array[Double]],
      vecCol: String = "embedding"
  ): DataFrame =
    assignClusters(df, centroids, vecCol)
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n"),
        avg("centroid_sim").as("mean_sim"),
        min("centroid_sim").as("min_sim"),
        max("centroid_sim").as("max_sim"))

  /** Prototypicality pruning (Sorscher et al. 2022): keep `keepPermille`‰
    * of each cluster. With `keepHardest = true` (the large-dataset
    * regime) the rows FARTHEST from their centroid survive — the most
    * prototypical mass is redundant once the corpus is big; flip it for
    * the small-data regime where easy examples matter most.
    *
    * Kept rows per cluster = ⌈n · keepPermille / 1000⌉ computed in exact
    * integer arithmetic, rank order `(centroid_sim, id)` fully
    * deterministic — replayable row-for-row by any engine. One shuffle
    * (the cluster_id window).
    */
  def prototypePrune(
      df: DataFrame,
      centroids: Array[Array[Double]],
      keepPermille: Int,
      keepHardest: Boolean = true,
      vecCol: String = "embedding",
      idCol: String = "vec_id"
  ): DataFrame = {
    require(keepPermille >= 0 && keepPermille <= 1000,
      s"keepPermille must be in [0, 1000], got $keepPermille")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
    val order =
      if (keepHardest) Seq(col("centroid_sim").asc, col(idCol).asc)
      else Seq(col("centroid_sim").desc, col(idCol).asc)
    assignClusters(df, centroids, vecCol)
      .withColumn("_rn", row_number().over(w.orderBy(order: _*)))
      .withColumn("_n", count(lit(1)).over(w))
      // ⌈n·p/1000⌉ as (n·p + 999) div 1000 — integer-exact in any engine
      .where(col("_rn") * 1000 <= col("_n") * keepPermille + lit(999))
      .drop("_rn", "_n")
  }

  /** Cluster-balanced sample: up to `perCluster` rows from EVERY cluster,
    * chosen by the replayable multiplicative-hash order every sampler in
    * [[Datasets]] uses — deterministic across runs, engines and
    * partitionings, and immune to how ids cluster (the hash decorrelates
    * id order from selection). Caps dominant clusters (the head topics of
    * a crawl) while keeping full tail-topic coverage — the diversity
    * rebalancing step of DataComp-style curation. One shuffle.
    */
  def clusterBalancedSample(
      df: DataFrame,
      centroids: Array[Array[Double]],
      perCluster: Int,
      vecCol: String = "embedding",
      idCol: String = "vec_id"
  ): DataFrame = {
    require(perCluster > 0, s"perCluster must be positive, got $perCluster")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
      .orderBy(pmod(col(idCol) * Datasets.GoldenRatioHash, lit(1L << 31)).asc,
        col(idCol).asc)
    assignClusters(df, centroids, vecCol)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= perCluster)
      .drop("_rn")
  }
}
