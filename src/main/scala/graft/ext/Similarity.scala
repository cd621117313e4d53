package graft.ext

import graft.sql.VecDot
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exact baseline, plus two scale paths — random
  * hyperplane LSH bucketing and IVF (inverted-file) coarse quantization.
  * North-star extension (no reference counterpart, SURVEY.md §2.C);
  * algorithms are the public standards (Charikar '02 random hyperplane LSH,
  * IVF from the FAISS paper lineage).
  *
  * Scale design: dot products are the custom codegen'd
  * [[graft.sql.VecDot]] expression (primitive loop inside whole-stage
  * codegen; distributed, no driver collect). Brute force is an explicit
  * broadcast of the (small) query set against the (huge) corpus — a map-only
  * scan, shuffle only for the final per-query top-k aggregation. The ANN
  * variants cut the scanned fraction by bucketing both sides on a coarse
  * key so the join only compares within-bucket candidates.
  */
object Similarity {

  /** Dot product of two equal-length numeric-array columns in double
    * precision — the custom codegen'd [[graft.sql.VecDot]] expression
    * (the HOF `aggregate(zip_with(...))` formulation is interpreted and
    * measured ~5× slower). Requires `vec_dot` registered on the session
    * (GraftExtensions, or `VecDot.ensureRegistered` — all DataFrame-level
    * ops here do it).
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: for every query vector, the `k`
    * nearest corpus vectors. The query side is broadcast (small by
    * contract); the corpus is scanned once, map-side; one shuffle for the
    * per-query top-k (window over query id). Ties break on corpus id for
    * determinism. Norms are computed once per vector BEFORE the join —
    * per-pair work is a single dot product.
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    pairwiseTopK(q, c, k, col("query_id") =!= col("neighbor_id"))
  }

  /** The shared exact-scoring plan under [[bruteForceTopK]] and
    * [[hardNegatives]]: broadcast the (pre-normed) query frame, scan the
    * corpus once, keep pairs passing `pairFilter` BEFORE the per-query
    * top-k window so excluded pairs never enter its shuffle. One place
    * owns the tie-break (score desc, neighbor id) and the norm-once
    * contract so the exact and negative variants cannot drift.
    */
  private def pairwiseTopK(
      q: DataFrame,
      c: DataFrame,
      k: Int,
      pairFilter: org.apache.spark.sql.Column
  ): DataFrame = {
    VecDot.ensureRegistered(q.sparkSession)
    // queries×corpus dot products run inside the corpus SCAN stage — spread
    // a small corpus across cores so the coarse pass isn't single-split
    val scored = graft.ext.Spread.acrossCores(c)
      .crossJoin(broadcast(q))
      .where(pairFilter)
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Hard-negative mining for contrastive/embedding training: for every
    * query vector, the `k` most-similar corpus vectors whose `labelCol`
    * DIFFERS from the query's — the "close but wrong" examples that make
    * the strongest negatives (e.g. in-batch negatives for dual encoders,
    * DPR-style retrieval training). Identical plan shape to
    * [[bruteForceTopK]] — broadcast query side, one corpus scan, per-pair
    * work a single codegen'd dot product, one shuffle for the per-query
    * top-k — with the label inequality applied BEFORE the window so
    * same-label pairs never enter the top-k shuffle. Swap the corpus for
    * an IVF/LSH candidate set (the other operators here) when the corpus
    * outgrows a scan per query batch; the exact form is the recall
    * baseline the approximate variants are graded against.
    *
    * Ties break on corpus id, like every top-k here. Returns
    * `(query_id, neighbor_id, score)`.
    */
  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"
  ): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      col(labelCol).as("q_label"), norm(col(vecCol)).as("q_norm"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      col(labelCol).as("c_label"), norm(col(vecCol)).as("c_norm"))
    pairwiseTopK(q, c, k, col("c_label") =!= col("q_label"))
  }

  // ------------------------------------------- random-hyperplane LSH ANN

  /** Deterministic pseudo-random hyperplanes: `numPlanes` x `dim` doubles
    * from a fixed-seed PRNG (gaussian), materialized as a plan literal —
    * broadcast for free, no join. Public so the correctness oracle can
    * render the same plane constants into its SQL (SparkEntry).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** LSH sign-bucket key: bit i = sign of <v, plane_i>. Vectors with equal
    * keys lie in the same angular region — candidates for high cosine.
    * The per-plane `when` chain is bounded by the 64-bit bucket word
    * (numPlanes ≤ 63 by representation, not corpus size — 2^63 buckets
    * outstrips any corpus), so unlike the old per-centroid IVF tree this
    * expression tree cannot grow past codegen limits.
    */
  def lshBucket(vec: Column, numPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    require(numPlanes > 0 && numPlanes <= 63, s"numPlanes must be in [1,63], got $numPlanes")
    val planes = hyperplanes(numPlanes, dim, seed)
    val bits = planes.zipWithIndex.map { case (p, i) =>
      when(call_function("vec_dot", vec, lit(p)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k via LSH buckets with multi-probe widening: the
    * query side probes its own bucket plus every bucket at Hamming
    * distance 1 (each sign bit flipped) — the standard multi-probe trick
    * that recovers most of the recall lost to boundary effects while
    * keeping an equi-join. Scanned pairs drop from n² to
    * (1+numPlanes)/2^numPlanes of the corpus per query; recall/cost is
    * tuned with `numPlanes`.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      dim: Int,
      numPlanes: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    VecDot.ensureRegistered(queries.sparkSession)
    val probes = explode(array(
      col("q_bucket") +: (0 until numPlanes).map(i => col("q_bucket").bitwiseXOR(lit(1L << i))): _*))
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        norm(col(vecCol)).as("q_norm"),
        lshBucket(col(vecCol), numPlanes, dim).as("q_bucket"))
      .select(col("query_id"), col("q_vec"), col("q_norm"), probes.as("probe_bucket"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"),
      lshBucket(col(vecCol), numPlanes, dim).as("c_bucket"))
    val scored = c
      .join(broadcast(q), col("probe_bucket") === col("c_bucket") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k).drop("_rn")
  }

  /** Embedding near-duplicate pairs at scale: bucket every vector by its
    * LSH sign key and compare only within-bucket pairs — the O(n²/2^planes)
    * scale path for duplicate detection over a whole corpus (the exact
    * pairwise variant is the bounded-id baseline). Exact duplicates
    * share a bucket (identical signs), so in an UNGUARDED bucket recall on
    * true duplicates is 1 by construction; near-duplicates at very high
    * cosine share it with probability (1 − θ/π)^planes ≈ 1. In a bucket
    * over `maxBucketSize` the guard below keeps only rep↔member edges, so
    * the full-recall claim holds bucket-by-bucket only up to the cap —
    * duplicate GROUPS in hot buckets still surface (via the
    * representative), member↔member edges there do not.
    *
    * Skew guard: clustered corpora (the norm for embeddings) concentrate
    * mass in few sign buckets, and the within-bucket O(n_b²) pairing then
    * skews onto one straggler task. Buckets larger than `maxBucketSize`
    * degrade to LINEAR representative-vs-rest pairing (min-id member vs
    * each other member) instead of being dropped — mass-duplicated
    * vectors are exactly the hot buckets, and dropping them would hide
    * the worst duplication. The count/rep windows reuse the self-join's
    * own `bucket` exchange, so the guard costs no extra shuffle (the
    * [[graft.ext.Dedup.nearDuplicatePairs]] pattern). At scale, raise
    * `numPlanes` with corpus size so buckets stay under the cap.
    */
  def lshNearDupPairs(
      corpus: DataFrame,
      threshold: Double,
      numPlanes: Int,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxBucketSize: Int = 10000
  ): DataFrame = {
    VecDot.ensureRegistered(corpus.sparkSession)
    val w = Window.partitionBy(col("bucket"))
    val b = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"), lshBucket(col(vecCol), numPlanes, dim).as("bucket"))
      .withColumn("bucket_n", count(lit(1)).over(w))
      .withColumn("rep", min(struct(col("id"), col("v"), col("nrm"))).over(w))
    val normal = b.where(col("bucket_n") <= maxBucketSize)
    val a = normal.select(col("bucket"), col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val c = normal.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    val allPairs = a.join(c, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .where(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select(col("id_a"), col("id_b"))
    val hotPairs = b.where(col("bucket_n") > maxBucketSize && col("id") > col("rep.id"))
      .where(dot(col("rep.v"), col("v")) / (col("rep.nrm") * col("nrm")) >= threshold)
      .select(col("rep.id").as("id_a"), col("id").as("id_b"))
    allPairs.unionByName(hotPairs)
  }

  // ------------------------------------------------- int8 quantization

  /** Scalar int8 quantization of an embedding: per-vector symmetric scale
    * `max|v_i| / 127`, components rounded to `tinyint` — the standard 4×
    * memory cut for vector search at scale (FAISS SQ8 lineage). Columnar
    * `transform`, no UDF; zero vectors quantize to scale 0 / all-zero
    * codes. Reconstruction error per component is ≤ scale/2 by
    * construction.
    */
  def quantizeInt8(vec: Column): Column = {
    val scale = array_max(transform(vec, x => abs(x))).cast("double") / 127.0
    struct(
      scale.as("scale"),
      transform(vec, x =>
        when(scale =!= 0.0, round(x.cast("double") / scale).cast("tinyint"))
          .otherwise(lit(0).cast("tinyint"))).as("codes"))
  }

  /** Dequantize back to `array<double>` (codes × scale). */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))

  /** Int8-quantized ANN with exact rerank (the FAISS SQ8 search pattern):
    * the coarse pass ranks every corpus vector by the cosine of its int8
    * CODES against the query's codes — per-vector symmetric scales cancel
    * in cosine, so the coarse score needs ONE integer dot product and two
    * precomputed code norms, no per-component float math — then the top
    * `m` candidates per query are reranked with full-precision cosine and
    * the top `k` returned.
    *
    * Scale story: at 100 TB the coarse scan reads the 4×-smaller code
    * arrays (int8 vs float32) — memory-bandwidth, cache and shuffle all
    * shrink 4× — while full vectors are touched only for queries×m rerank
    * pairs. Every number in the coarse score is integer-exact in doubles
    * (|codes| ≤ 127, dims ≤ 2^40), so results are deterministic under any
    * partitioning and engine-replayable. Zero vectors (scale 0) cannot
    * rank and are excluded from both sides. Ties break on neighbor id,
    * both passes.
    */
  def int8RerankTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int = 10,
      m: Int = 40,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    int8RerankTopKFromIndex(queries, sq8Index(corpus, idCol, vecCol), corpus, k, m, idCol, vecCol)

  /** The PERSISTABLE SQ8 artifact: per-vector `(id, scale, codes)` — what
    * [[ModelStore.saveSq8Index]] stores beside the corpus so a later job
    * searches the 4x-smaller codes without re-quantizing 100 TB of
    * vectors. `scale` rides along even though code-cosine cancels it:
    * dequantization ([[dequantizeInt8]]) and any dot/L2 scoring need it,
    * and an index that cannot reconstruct its vectors is not an artifact.
    */
  def sq8Index(corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol), quantizeInt8(col(vecCol)).as("_q"))
      .select(col(idCol), col("_q.scale").as("scale"), col("_q.codes").as("codes"))

  /** [[int8RerankTopK]] with the coarse pass over a PRE-QUANTIZED index
    * ([[sq8Index]], possibly [[ModelStore]]-reloaded) — the direct path
    * delegates here, so stored-state search is hash-identical to inline
    * quantization by construction. `corpus` supplies the full-precision
    * vectors for the rerank of the queries x m candidate pool only.
    */
  def int8RerankTopKFromIndex(
      queries: DataFrame,
      index: DataFrame,
      corpus: DataFrame,
      k: Int = 10,
      m: Int = 40,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(m >= k, s"rerank pool m=$m must be >= k=$k")
    VecDot.ensureRegistered(queries.sparkSession)
    def codesOf(v: Column) = transform(quantizeInt8(v).getField("codes"), _.cast("int"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        codesOf(col(vecCol)).as("q_codes"))
      .withColumn("q_cn", sqrt(dot(col("q_codes"), col("q_codes"))))
      .withColumn("q_norm", norm(col("q_vec")))
      .where(col("q_cn") > 0.0)
    val c = index.select(col(idCol).as("neighbor_id"),
        transform(col("codes"), _.cast("int")).as("c_codes"))
      .withColumn("c_cn", sqrt(dot(col("c_codes"), col("c_codes"))))
      .where(col("c_cn") > 0.0)
    // the coarse integer-dot scan is queries×corpus compute inside the
    // index scan stage — spread a small index across cores
    val coarse = graft.ext.Spread.acrossCores(c)
      .crossJoin(broadcast(q.select(col("query_id"), col("q_codes"), col("q_cn"))))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("q_codes"), col("c_codes")) / (col("q_cn") * col("c_cn"))).as("coarse"))
    val wc = Window.partitionBy(col("query_id")).orderBy(col("coarse").desc, col("neighbor_id"))
    val pool = coarse.withColumn("_rn", row_number().over(wc)).where(col("_rn") <= m)
      .select(col("query_id"), col("neighbor_id"))
    // rerank: full-precision cosine on the m-candidate pool only
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"))
    val rer = pool
      .join(broadcast(q.select(col("query_id"), col("q_vec"), col("q_norm"))), Seq("query_id"))
      .join(cv, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))).as("score"))
    val wr = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    rer.withColumn("_rn", row_number().over(wr)).where(col("_rn") <= k).drop("_rn")
  }

  // --------------------------------------------------------- IVF ANN

  /** IVF coarse assignment: nearest of `centroids` (by cosine) per vector
    * — map-only columnar argmax via the [[graft.sql.VecTopLists]]
    * expression (a data-driven loop over the broadcast flat centroid
    * matrix: constant code size at ANY list count, where a
    * `greatest(struct...)` tree is O(numLists) generated code and stops
    * compiling at the ~10^4-10^5 lists a 100 TB IVF index needs).
    * Centroids arrive as a driver-side array (k-means training is a
    * separate, offline concern).
    */
  def ivfAssign(vec: Column, centroids: Array[Array[Double]]): Column =
    element_at(ivfProbes(vec, centroids, 1), 1)

  /** [[ivfAssign]] over an already-broadcast flat centroid matrix. */
  def ivfAssign(vec: Column, centroids: Broadcast[Array[Double]], dim: Int, numLists: Int): Column =
    element_at(ivfProbes(vec, centroids, dim, numLists, 1), 1)

  /** Sample-based centroid bootstrap: take `numLists` deterministic sample
    * vectors as centroids (k-means++ seeding step 1). Good enough to
    * demonstrate the IVF plumbing; [[trainCentroids]] refines them.
    */
  def sampleCentroids(corpus: DataFrame, numLists: Int, idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Double]] =
    corpus
      .orderBy(xxhash64(col(idCol)))
      .limit(numLists)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      // UNIT centroids: IVF scoring is dot/‖v‖, which equals cosine only
      // when the centroid side is normalized — raw corpus vectors as
      // centroids would rank by raw dot product and let large-norm
      // centroids absorb everything (skewed lists, broken cosine contract)
      .map(_.getSeq[Double](0).toArray)
      .map(Similarity.unit)

  /** D²-weighted distributed seeding for IVF coarse centroids — the
    * k-means|| formulation of k-means++ (Bahmani et al. VLDB'12): instead
    * of one distributed pass PER centroid (classic k-means++, k passes —
    * unusable at the 10^4-10^5 lists a 100 TB index needs), run `rounds`
    * passes that each sample ~2·numLists candidates with probability
    * ∝ d²(v, pool) (spherical distance 1 − max-cosine), then reduce the
    * ≤ 1 + 2·numLists·rounds candidate pool to `numLists` seeds with a
    * driver-side WEIGHTED k-means++ (weights = corpus vectors assigned to
    * each candidate). Better-spread seeds than uniform sampling → tighter
    * IVF lists at the same training budget (AnnRecallSpec pins the
    * objective ordering).
    *
    * Scale shape: each round is two jobs — an aggregation for Σd² and a
    * Bernoulli-sample collect whose expected size is 2·numLists (hash
    * -seeded, deterministic across runs and partitionings; collected rows
    * are id-sorted so the driver reduction is order-stable). Driver state
    * is bounded by the candidate pool, never corpus size. The max-cosine
    * kernel is the same broadcast codegen expression semantic
    * decontamination uses ([[graft.sql.VecMaxSimBcast]]) — map-only, no
    * shuffle.
    */
  def seedCentroids(
      corpus: DataFrame,
      numLists: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rounds: Int = 4,
      seed: Long = 42L
  ): Array[Array[Double]] = {
    VecDot.ensureRegistered(corpus.sparkSession)
    if (numLists <= 1) return sampleCentroids(corpus, numLists, idCol, vecCol)
    val sc = corpus.sparkSession.sparkContext
    val v = corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .where(col("v").isNotNull && size(col("v")) > 0)
    val dim = v.select(size(col("v"))).head().getInt(0)
    val oversample = 2 * numLists
    var pool = sampleCentroids(corpus, 1, idCol, vecCol) // unit; k-means|| step 1
    for (r <- 1 to rounds) {
      val bc = sc.broadcast((pool.flatten, pool.map(_ => 1.0))) // unit → norms all 1
      // d² of a vector to the pool; NULL max-sim (zero-norm vector) reads
      // as distance 1 — directionless rows stay sampleable, not poisonous
      val d2 = greatest(lit(0.0), lit(1.0) - coalesce(vecMaxSim(col("v"), bc, dim), lit(0.0)))
      val total = v.agg(sum(d2)).head() match {
        case row if row.isNullAt(0) => 0.0
        case row => row.getDouble(0)
      }
      if (total > 0) {
        // deterministic Bernoulli draw: hash of (id, round) → uniform [0,1)
        val u = pmod(xxhash64(col("id"), lit(seed + r)), lit(1L << 40)).cast("double") /
          lit((1L << 40).toDouble)
        val sampled = v
          .where(u < least(lit(1.0), lit(oversample.toDouble) * d2 / lit(total)))
          .orderBy(col("id"))
          .select(col("v"))
          .collect()
          .map(row => Similarity.unit(row.getSeq[Double](0).toArray))
        pool = pool ++ sampled
      }
      bc.unpersist(false)
    }
    // candidate weights: corpus vectors whose nearest pool member is i
    val bcAll = broadcastCentroids(pool)
    val weights = new Array[Long](pool.length)
    v.select(ivfAssign(col("v"), bcAll, dim, pool.length).as("c"))
      .groupBy(col("c")).count().collect()
      .foreach(row => weights(row.getInt(0)) = row.getLong(1))
    bcAll.unpersist(false)
    reduceWeightedKpp(pool, weights, numLists, seed)
  }

  private val logger = org.slf4j.LoggerFactory.getLogger("graft.ext.Similarity")

  /** Driver-side weighted k-means++ over a small candidate pool: first
    * pick = heaviest candidate, then D²·weight-proportional draws from a
    * fixed-seed PRNG. O(k · |pool| · dim) — pool is O(numLists · rounds).
    *
    * Degenerate inputs are reported, not hidden (mirroring the
    * rounds-count observability on connectedComponentsDetailed): a pool
    * smaller than k returns all of it (fewer than k seeds — k-means then
    * trains fewer lists) and an exhausted D²·weight mass repeats the first
    * pick (duplicate seeds — the duplicates only ever own empty lists);
    * both log at WARN so an IVF index trained on a too-small or collapsed
    * corpus is visible in the driver log instead of silently degrading.
    */
  private def reduceWeightedKpp(
      pool: Array[Array[Double]], weights: Array[Long], k: Int, seed: Long
  ): Array[Array[Double]] = {
    if (pool.length <= k) {
      if (pool.length < k)
        logger.warn(s"k-means|| seeding: candidate pool has ${pool.length} vectors < numLists=$k; " +
          "index will train with fewer lists (corpus smaller or less diverse than numLists)")
      return pool
    }
    val rnd = new scala.util.Random(seed)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val chosen = scala.collection.mutable.ArrayBuffer(pool(weights.indices.maxBy(weights)))
    val d2 = Array.fill(pool.length)(Double.MaxValue)
    while (chosen.size < k) {
      val last = chosen.last
      var i = 0
      while (i < pool.length) {
        d2(i) = math.min(d2(i), math.max(0.0, 1.0 - cos(pool(i), last)))
        i += 1
      }
      val total = d2.indices.map(j => d2(j) * weights(j)).sum
      if (total <= 0) {
        // pool exhausted (all candidates coincide with picks): pad the rest
        // with the heaviest pick in one step — once the D²·weight mass hits
        // zero it stays zero (re-picking an existing centroid changes no
        // distance), so further draws are pointless. Duplicate centroids
        // only ever own empty lists.
        logger.warn(s"k-means|| seeding: D²·weight mass exhausted at ${chosen.size} of $k seeds; " +
          s"padding with duplicates of the heaviest pick (corpus has fewer distinct directions than numLists=$k)")
        while (chosen.size < k) chosen += chosen.head
      } else {
        var r = rnd.nextDouble() * total
        var j = 0
        while (j < pool.length - 1 && r >= d2(j) * weights(j)) { r -= d2(j) * weights(j); j += 1 }
        chosen += pool(j)
      }
    }
    chosen.toArray
  }

  /** Distributed spherical k-means for IVF coarse centroids (the training
    * step the FAISS lineage runs offline). Per iteration ONE job: every
    * vector is assigned to its max-cosine centroid (map-only columnar
    * argmax) fused with `posexplode` into a single per-(list, dim) average
    * (hash agg with map-side combine) — the only shuffle, keyed on
    * (list, dim). The numLists × dim mean rows are reassembled into the
    * centroid matrix on the DRIVER (bounded by numLists·dim, corpus-size
    * independent) and re-normalized to unit length (the spherical variant,
    * which makes the cosine objective monotone non-decreasing), so the
    * same plan trains on 100 TB. Empty lists keep their previous centroid.
    *
    * Early exit: iteration stops once the largest per-centroid movement
    * `1 − cos(old, new)` drops to `tol`; the default tol=0 stops only at a
    * BITWISE fixpoint (tested by array equality, since the floating dot
    * product of a fixpoint rounds to ±1 ulp of 1, not exactly 1) — there
    * further iterations provably change nothing, so results are
    * bit-identical to running all `iters`.
    */
  def trainCentroids(
      corpus: DataFrame,
      numLists: Int,
      iters: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      tol: Double = 0.0
  ): Array[Array[Double]] = {
    VecDot.ensureRegistered(corpus.sparkSession)
    var centroids = seedCentroids(corpus, numLists, idCol, vecCol) // D² seeds, already unit
    val v = corpus.select(col(vecCol).cast("array<double>").as("v"))
    var it = 0
    var moved = Double.MaxValue
    while (it < iters && moved > tol) {
      // Fresh centroids each iteration → fresh broadcast; the collect()
      // below ends every job that reads it, so eager unpersist is safe and
      // keeps k×dim×iters blocks from accumulating on executors.
      val bc = broadcastCentroids(centroids)
      val meanRows = v
        .select(
          ivfAssign(col("v"), bc, centroids.head.length, centroids.length).as("list"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("list"), col("pos")).agg(avg(col("x")).as("m"))
        .collect()
      bc.unpersist(false)
      val byList = meanRows.groupBy(_.getInt(0))
      val next = centroids.zipWithIndex.map { case (old, i) =>
        byList.get(i).map { rs =>
          val arr = new Array[Double](rs.length)
          rs.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
          Similarity.unit(arr)
        }.getOrElse(old)
      }
      // Exact-fixpoint test by ARRAY equality, not the dot product: at a
      // true fixpoint 1 − Σaᵢ² is ±1 ulp of 0, so a dot-based test with
      // tol=0 would almost never fire (and could fire spuriously). The
      // cosine movement metric only arbitrates a user-supplied tol > 0.
      moved =
        if (centroids.zip(next).forall { case (o, n) => java.util.Arrays.equals(o, n) }) 0.0
        else centroids.zip(next).map { case (o, n) =>
          math.max(0.0, 1.0 - o.zip(n).map { case (a, b) => a * b }.sum)
        }.max.max(Double.MinPositiveValue) // non-identical arrays never read as 0
      centroids = next
      it += 1
    }
    centroids
  }

  /** Unit-normalize (norm accumulated in array order — bit-identical to
    * `x / sqrt(list_dot_product(v, v))` in an external engine). Zero
    * vectors pass through unchanged.
    */
  def unitVector(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }
  private def unit(v: Array[Double]): Array[Double] = unitVector(v)

  /** Top-`nprobe` centroid lists by cosine — the IVF multi-probe widening
    * (nprobe > 1 recovers recall lost at list boundaries at the cost of
    * scanning nprobe/numLists of the corpus). Same
    * [[graft.sql.VecTopListsBcast]] scale shape as [[ivfAssign]]; tie
    * order (larger list first) and IEEE op order match the array_sort
    * formulation it replaced, keeping the IVF oracles bit-identical.
    *
    * The centroid matrix ships as a real broadcast variable (one
    * block-manager transfer per executor), NOT a plan literal — at the
    * 10^4–10^5-list scale a 100 TB index needs, a literal would serialize
    * tens of MB into every task closure and plan string. Each call
    * broadcasts once; to share one broadcast across several columns, use
    * the `Broadcast` overload.
    */
  def ivfProbes(vec: Column, centroids: Array[Array[Double]], nprobe: Int): Column = {
    require(centroids.nonEmpty, "ivfProbes requires at least one centroid")
    ivfProbes(vec, broadcastCentroids(centroids), centroids.head.length,
      centroids.length, nprobe)
  }

  /** [[ivfProbes]] over an already-broadcast flat centroid matrix
    * (`numLists × dim`, row-major) — lets one broadcast serve both sides
    * of an IVF join or every iteration of a training loop.
    */
  def ivfProbes(
      vec: Column,
      centroids: Broadcast[Array[Double]],
      dim: Int,
      numLists: Int,
      nprobe: Int
  ): Column =
    GraftSqlBridge.column(graft.sql.VecTopListsBcast(
      GraftSqlBridge.expression(vec), centroids, dim, math.min(nprobe, numLists)))

  /** Broadcast a driver-side centroid matrix (row-major flattening) for
    * reuse across [[ivfProbes]]/[[ivfAssign]] call sites.
    */
  def broadcastCentroids(centroids: Array[Array[Double]]): Broadcast[Array[Double]] =
    org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(centroids.flatten)

  /** Collect + broadcast an eval/benchmark embedding set for
    * [[vecMaxSim]]/[[decontaminateSemantic]]: row-major flat matrix plus
    * per-row norms accumulated in ARRAY ORDER (so the downstream score
    * `dot / (normV * normRow)` replays bit-identically as
    * `list_dot_product(c,e)/(sqrt(ldp(c,c))*sqrt(ldp(e,e)))` in an
    * external engine). The collect is bounded BY CONTRACT: an eval set is
    * 10^3–10^5 vectors (a benchmark), never corpus-sized. Returns the
    * broadcast handle and the dimension (0 rows → dim 0; scoring then
    * yields NULL for every corpus row).
    */
  def broadcastEvalMatrix(
      eval: DataFrame,
      vecCol: String = "embedding"
  ): (Broadcast[(Array[Double], Array[Double])], Int) = {
    // NULL/empty eval vectors carry no evidence — skip them (the corpus
    // side already treats NULL as unscorable); any numeric element type
    // is accepted. RAGGED dims are a configuration error, not data: a
    // silently misaligned row-major matrix would read the wrong cells and
    // miss contamination, so fail fast with the offending sizes.
    val rows: Array[Array[Double]] = eval.select(col(vecCol)).collect()
      .flatMap { r =>
        if (r.isNullAt(0)) None
        else {
          val v = r.getSeq[Any](0).map {
            case n: java.lang.Number => n.doubleValue
            case null => 0.0
          }.toArray
          if (v.isEmpty) None else Some(v)
        }
      }
    val dim = if (rows.isEmpty) 0 else rows.head.length
    rows.find(_.length != dim).foreach { bad =>
      throw new IllegalArgumentException(
        s"eval set has inconsistent embedding dims: $dim vs ${bad.length}")
    }
    val norms = rows.map { v =>
      var ss = 0.0; var i = 0
      while (i < v.length) { ss += v(i) * v(i); i += 1 }
      math.sqrt(ss)
    }
    val bc = org.apache.spark.sql.SparkSession.active.sparkContext
      .broadcast((rows.flatten, norms))
    (bc, dim)
  }

  /** Max cosine of a vector column against a broadcast eval matrix — the
    * codegen-friendly map-side kernel of semantic decontamination
    * ([[graft.sql.VecMaxSimBcast]]): no join, no shuffle, eval set ships
    * once per executor.
    */
  def vecMaxSim(vec: Column, data: Broadcast[(Array[Double], Array[Double])], dim: Int): Column =
    GraftSqlBridge.column(graft.sql.VecMaxSimBcast(GraftSqlBridge.expression(vec), data, dim))

  /** SEMANTIC DECONTAMINATION: score every corpus row's embedding against
    * a benchmark/eval embedding set (max cosine over the whole set) and
    * flag rows at or above `threshold` — the embedding-space counterpart
    * of the n-gram [[Dedup.decontaminate]]. Adds `max_eval_sim` (NULL
    * when the eval set is empty or the vector is NULL — "no evidence"
    * stays distinct from a low score) and `contaminated` to the corpus
    * frame.
    *
    * 100 TB shape: one map-only corpus scan; the eval set is a single
    * broadcast; no shuffle at any size. A 10× eval set changes per-row
    * cost linearly, not the plan.
    */
  def decontaminateSemantic(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      threshold: Double = 0.999
  ): DataFrame = {
    val (bc, dim) = broadcastEvalMatrix(evalSet, vecCol)
    corpus
      .withColumn("max_eval_sim", vecMaxSim(col(vecCol), bc, dim))
      .withColumn("contaminated",
        when(col("max_eval_sim").isNull, lit(false))
          .otherwise(col("max_eval_sim") >= threshold))
  }

  // --------------------------------------------------- product quantization

  /** Readable PQ codebooks: subspace `m`'s codewords are the `m`-th slices
    * of the first `codebookSize` corpus vectors by id — deterministic AND
    * restatable from the table itself, so a DuckDB oracle can replay the
    * whole encode→reconstruct→score pipeline exactly (the
    * [[graft.queries.Queries.qAnnIvf]] readable-centroid trick, extended
    * to PQ). [[pqTrainCodebooks]] refines these with per-subspace L2
    * k-means for production recall. Returns `numSub × codebookSize ×
    * (dim/numSub)` (row-major subspace order).
    */
  def pqCodebooksFromRows(
      corpus: DataFrame,
      numSub: Int,
      codebookSize: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Array[Array[Array[Double]]] = {
    val rows = corpus.orderBy(col(idCol)).limit(codebookSize)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(rows.length >= 2, s"PQ needs >= 2 seed rows, corpus has ${rows.length}")
    val dim = rows.head.length
    require(dim % numSub == 0, s"dim $dim not divisible by numSub=$numSub")
    val dsub = dim / numSub
    Array.tabulate(numSub)(m => rows.map(v => v.slice(m * dsub, (m + 1) * dsub)))
  }

  /** Per-subspace code assignment: `argmin_j L2(sub, book(j))`, computed as
    * `argmax_j (<sub, book_j> − ‖book_j‖²/2)` (equivalent for fixed `sub`;
    * the dot form shares IEEE op order with the oracle's
    * `list_dot_product(sub, c) - nsq/2` replay, so near-ties resolve the
    * same way on both engines). Tie → smaller code. The `greatest` struct
    * tree is O(codebookSize) generated code, which is why PQ codebooks
    * stay at the FAISS-typical 16-256 entries (bounded by representation:
    * an 8-bit code) — list counts grow in the IVF layer, not here.
    */
  private def pqAssign(sub: Column, book: Array[Array[Double]]): Column = {
    val scored = book.zipWithIndex.map { case (c, j) =>
      val nsq = c.map(x => x * x).sum
      struct((dot(sub, lit(c)) - lit(nsq / 2)).as("s"), lit(-j).as("nj"))
    }
    (-greatest(scored.toIndexedSeq: _*).getField("nj")).cast("int")
  }

  /** PQ encode: `numSub` codes per vector (`array<int>`; values fit a byte
    * for codebookSize ≤ 256 — the storage contract is numSub bytes per
    * vector, a 32-64× cut vs raw float32/float64 at dim 64). Map-only
    * columnar expression; the codebooks ride the plan as literals
    * (numSub × codebookSize × dsub doubles — a few KB at PQ scales).
    */
  def pqEncode(vec: Column, books: Array[Array[Array[Double]]]): Column = {
    val dsub = books.head.head.length
    val subs = books.zipWithIndex.map { case (book, m) =>
      pqAssign(slice(vec.cast("array<double>"), m * dsub + 1, dsub), book)
    }
    array(subs.toIndexedSeq: _*)
  }

  /** Reconstruct the quantized vector from its codes: concatenation of the
    * chosen codeword per subspace. The scoring side of [[ivfPqTopK]] works
    * ENTIRELY off this — raw vectors never ship with the index, which is
    * the point of PQ at 100 TB (codes + codebooks fit where floats do
    * not). Scoring via the reconstruction's full-vector dot keeps IEEE op
    * order identical to an external engine's
    * `list_dot_product(q, recon)` replay; the classic per-query LUT
    * lookup (O(numSub) per pair instead of O(dim)) is a CPU optimization
    * with a DIFFERENT summation grouping — bit-exactness vs the oracle
    * would be lost, so it belongs behind the same interface if profiling
    * ever demands it, not in the gated path.
    */
  def pqReconstruct(codes: Column, books: Array[Array[Array[Double]]]): Column = {
    val booksLit = typedlit(books.map(_.map(_.toSeq).toSeq).toSeq)
    flatten(zip_with(booksLit, codes, (bk, c) => element_at(bk, c + 1)))
  }

  /** Per-subspace L2 k-means (Lloyd) refinement of PQ codebooks — the
    * FAISS-standard training step. Seeds from [[pqCodebooksFromRows]];
    * each iteration per subspace is ONE job: assign every sub-vector to
    * its nearest codeword (map-only [[pqAssign]]) fused with `posexplode`
    * into per-(code, pos) means — the same single-shuffle shape as
    * [[trainCentroids]], with plain means instead of spherical
    * re-normalization (PQ approximates the raw vector, so magnitude
    * matters). Empty codes keep their previous codeword; exact-fixpoint
    * early exit. numSub × iters bounded-size jobs total — PQ training is
    * an offline pass; at 100 TB train on a sampled corpus (standard FAISS
    * practice), the codebooks generalize.
    */
  def pqTrainCodebooks(
      corpus: DataFrame,
      numSub: Int,
      codebookSize: Int,
      iters: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): Array[Array[Array[Double]]] = {
    VecDot.ensureRegistered(corpus.sparkSession)
    val seeds = pqCodebooksFromRows(corpus, numSub, codebookSize, idCol, vecCol)
    val dsub = seeds.head.head.length
    seeds.zipWithIndex.map { case (seed, m) =>
      val sub = corpus.select(
        slice(col(vecCol).cast("array<double>"), m * dsub + 1, dsub).as("s"))
      var book = seed
      var it = 0
      var moving = true
      while (it < iters && moving) {
        val meanRows = sub
          .select(pqAssign(col("s"), book).as("code"), posexplode(col("s")).as(Seq("pos", "x")))
          .groupBy(col("code"), col("pos")).agg(avg(col("x")).as("mean"))
          .collect()
        val byCode = meanRows.groupBy(_.getInt(0))
        val next = book.zipWithIndex.map { case (old, j) =>
          byCode.get(j).map { rs =>
            val arr = new Array[Double](dsub)
            rs.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            arr
          }.getOrElse(old)
        }
        moving = !book.zip(next).forall { case (o, n) => java.util.Arrays.equals(o, n) }
        book = next
        it += 1
      }
      book
    }
  }

  /** IVF-PQ top-k: IVF's probed-list equi-join bounds WHICH pairs are
    * compared ([[ivfTopK]]); PQ bounds WHAT the index stores per corpus
    * vector — (list, numSub byte codes) instead of the raw floats, the
    * composition that fits a 100 TB index in executor memory. Candidates
    * are scored `cos(query, reconstruct(codes))` (asymmetric distance:
    * exact query side, quantized corpus side), so results are the
    * DECLARED approximation of the algorithm, replayable codeword-exact
    * by an external oracle. Recall floors vs brute force live in
    * AnnRecallSpec.
    */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      centroids: Array[Array[Double]],
      books: Array[Array[Array[Double]]],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 1
  ): DataFrame = {
    VecDot.ensureRegistered(queries.sparkSession)
    require(centroids.nonEmpty, "ivfPqTopK requires at least one centroid")
    val bc = broadcastCentroids(centroids)
    val (dim, nLists) = (centroids.head.length, centroids.length)
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"),
      explode(ivfProbes(col(vecCol), bc, dim, nLists, nprobe)).as("q_list"))
    // the stored index: (id, list, codes) — raw vectors dropped before the
    // join; scoring reconstructs from codes alone
    val c = corpus
      .select(
        col(idCol).as("neighbor_id"),
        ivfAssign(col(vecCol), bc, dim, nLists).as("c_list"),
        pqEncode(col(vecCol), books).as("codes"))
      .withColumn("recon", pqReconstruct(col("codes"), books))
      .withColumn("r_norm", norm(col("recon")))
    val scored = c
      .join(broadcast(q), col("q_list") === col("c_list") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("q_vec"), col("recon")) / (col("q_norm") * col("r_norm"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k).drop("_rn")
  }

  /** IVF top-k: the corpus is assigned to its single nearest centroid list;
    * each query probes its `nprobe` nearest lists (nprobe=1 = the classic
    * coarse quantizer). The equi-join on list id bounds comparisons to
    * probed-list pairs.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      centroids: Array[Array[Double]],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 1
  ): DataFrame = {
    VecDot.ensureRegistered(queries.sparkSession)
    require(centroids.nonEmpty, "ivfTopK requires at least one centroid")
    // One broadcast serves both sides of the list-id equi-join.
    val bc = broadcastCentroids(centroids)
    val (dim, nLists) = (centroids.head.length, centroids.length)
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"),
      explode(ivfProbes(col(vecCol), bc, dim, nLists, nprobe)).as("q_list"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      norm(col(vecCol)).as("c_norm"),
      ivfAssign(col(vecCol), bc, dim, nLists).as("c_list"))
    val scored = c
      .join(broadcast(q), col("q_list") === col("c_list") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k).drop("_rn")
  }

  /** Blocking observables of [[ivfTopK]]/[[ivfPqTopK]] (which share the
    * coarse list equi-join): `(probedCells, candidates, maxList)` —
    * probed (query, list) cells, the list-join's exact candidate row
    * count (the scoring cost driver; =!= self-exclusion included), and
    * the largest inverted list (the assignment-skew signal). Recorded in
    * the bench's sf1 block next to the wall-clock so an ANN timing
    * outlier is ATTRIBUTABLE: flat counts at 10x rows name host noise,
    * growing probed-list mass names real work (the exact epistemic hole
    * the near-dup work counts closed in r16, extended to the last
    * unadjudicable query family per the r16 verdict). Id-only — no
    * vector payloads move, so the count costs one assignment pass plus a
    * key join.
    */
  def ivfWorkCounts(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: Array[Array[Double]],
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 1
  ): (Long, Long, Long) = {
    VecDot.ensureRegistered(queries.sparkSession)
    require(centroids.nonEmpty, "ivfWorkCounts requires at least one centroid")
    val bc = broadcastCentroids(centroids)
    val (dim, nLists) = (centroids.head.length, centroids.length)
    val probes = queries.select(col(idCol).as("query_id"),
      explode(ivfProbes(col(vecCol), bc, dim, nLists, nprobe)).as("q_list"))
    val assigned = corpus.select(col(idCol).as("neighbor_id"),
      ivfAssign(col(vecCol), bc, dim, nLists).as("c_list"))
    val probedCells = probes.count()
    val candidates = assigned
      .join(broadcast(probes),
        col("q_list") === col("c_list") && col("query_id") =!= col("neighbor_id"))
      .count()
    val maxList = assigned.groupBy("c_list").count()
      .agg(max(col("count"))).head().getLong(0)
    (probedCells, candidates, maxList)
  }

  /** Semantic deduplication, SemDeDup-style (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus by nearest centroid, then prune
    * near-duplicates WITHIN each cluster only — the clustering is what
    * bounds the otherwise O(n²) pairwise cosine to O(Σ m_c²) over cluster
    * sizes, the property that makes embedding dedup feasible at corpus
    * scale. A row is removed when some other row in its cluster has
    * cosine ≥ `threshold` with it and precedes it in the deterministic
    * keep order (lower cosine-to-centroid first — the paper keeps the
    * example FARTHEST from the centroid as the cluster's representative —
    * then lower id). Returns the surviving ids.
    *
    * Plan shape: assignment is the map-only broadcast argmax
    * ([[ivfAssign]]); the per-row centroid similarity comes from a
    * broadcast equi-join against the k-row centroid table (scale-safe at
    * any list count, unlike a k-wide literal in the plan); the prune is a
    * single LEFT ANTI self-join hash-partitioned on the cluster id — one
    * shuffle of (id, vec, norm, sim), no window, no driver state. Cluster
    * sizes are the skew knob: size `centroids.length` so expected cluster
    * size stays in the 10²-10⁴ range (the paper's regime); a pathological
    * hot cluster degrades that one partition to its m² pairs, the
    * declared semantics.
    *
    * Cross-engine determinism: the domination predicate compares cosines
    * computed with the same IEEE op sequence on both sides
    * (`dot(r,s)/(nrm_r*nrm_s)`; centroid sim `dot(v,cv)/nrm_v`), so an
    * external replay (q_semdedup) matches bit-for-bit.
    */
  def semDedup(
      corpus: DataFrame,
      centroids: Array[Array[Double]],
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val spark = corpus.sparkSession
    VecDot.ensureRegistered(spark)
    require(centroids.nonEmpty, "semDedup requires at least one centroid")
    val bc = broadcastCentroids(centroids)
    val (dim, nLists) = (centroids.head.length, centroids.length)
    import spark.implicits._
    val centTable = centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, c) }
      .toSeq.toDF("list", "cv")
    val assigned = corpus
      .select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .withColumn("list", ivfAssign(col("v"), bc, dim, nLists))
      .join(broadcast(centTable), "list")
      .withColumn("sim", dot(col("v"), col("cv")) / col("nrm"))
      .select(col("vec_id"), col("v"), col("nrm"), col("list"), col("sim"))
    val s = assigned.select(
      col("vec_id").as("s_id"), col("v").as("s_v"), col("nrm").as("s_nrm"),
      col("list").as("s_list"), col("sim").as("s_sim"))
    assigned
      .join(s,
        col("list") === col("s_list") && col("vec_id") =!= col("s_id") &&
          dot(col("v"), col("s_v")) / (col("nrm") * col("s_nrm")) >= threshold &&
          (col("s_sim") < col("sim") ||
            (col("s_sim") === col("sim") && col("s_id") < col("vec_id"))),
        "left_anti")
      .select(col("vec_id"))
  }
}
