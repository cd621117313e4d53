package graft

import graft.queries.Queries

/** Query-level recall floors for the approximate ANN gate queries. The
  * DuckDB oracles pin WHAT q_ann_lsh / q_ann_ivf return (the declared
  * approximate algorithm, bit-exactly); these pin that what they return is
  * USEFUL — recall@10 against the exact brute-force top-k on the same
  * corpus. Floors are calibrated on the uniform random test embeddings
  * (measured: LSH ≈ 0.46, IVF ≈ 0.33; no angular clustering — real
  * embedding corpora cluster and do far better) with slack for corpus
  * regeneration, and the whole pipeline is seeded/deterministic.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  private lazy val dir = sf("sf0.01")
  private lazy val exact = pairs(Queries.qAnnBruteForce(spark, dir))

  test("q_ann_lsh recall@10 vs brute force clears 0.35") {
    val recall = exact.count(pairs(Queries.qAnnLsh(spark, dir)).contains).toDouble / exact.size
    assert(recall >= 0.35, s"LSH recall@10 $recall below floor")
  }

  test("q_ann_ivf recall@10 vs brute force clears 0.20") {
    val recall = exact.count(pairs(Queries.qAnnIvf(spark, dir)).contains).toDouble / exact.size
    assert(recall >= 0.20, s"IVF recall@10 $recall below floor")
  }

  test("q_ann_ivfpq recall@10 clears the IVF floor minus 0.05, and PQ training does not lose recall") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    // The PQ tier re-ranks within the SAME probed lists as q_ann_ivf using
    // reconstructed (quantized) corpus vectors — the recall cost of the
    // 32x storage cut must stay within 0.05 of the exact-scoring IVF
    // floor (0.20). Training the codebooks (per-subspace L2 k-means) must
    // not do worse than the raw row-sliced seeds at the same budget.
    val recallPq = exact.count(pairs(Queries.qAnnIvfPq(spark, dir)).contains).toDouble / exact.size
    info(s"IVF-PQ recall@10 (row-seeded 8x16 codebooks, nprobe=1): $recallPq")
    assert(recallPq >= 0.15, s"IVF-PQ recall@10 $recallPq below IVF floor - 0.05")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = Similarity.trainCentroids(emb, numLists = 8, iters = 3)
    def recall(books: Array[Array[Array[Double]]]): Double = {
      val approx = pairs(
        Similarity.ivfPqTopK(emb.where(col("vec_id") < 50), emb, k = 10, cents, books))
      exact.count(approx.contains).toDouble / exact.size
    }
    val seeded = recall(Similarity.pqCodebooksFromRows(emb, numSub = 8, codebookSize = 16))
    val trained = recall(Similarity.pqTrainCodebooks(emb, numSub = 8, codebookSize = 16, iters = 3))
    info(s"IVF-PQ recall@10 over trained coarse lists: row-seeded $seeded, L2-trained $trained")
    assert(trained >= seeded, s"PQ training must not lose recall ($seeded -> $trained)")
    assert(trained >= 0.15, s"trained IVF-PQ recall@10 $trained below floor")
  }

  test("PQ reconstruction: training tightens quantization error; codes stay within codebook range") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def meanCos(books: Array[Array[Array[Double]]]): Double =
      emb.select(avg(
        Similarity.cosine(
          col("embedding").cast("array<double>"),
          Similarity.pqReconstruct(Similarity.pqEncode(col("embedding"), books), books))))
        .head().getDouble(0)
    val seeded = meanCos(Similarity.pqCodebooksFromRows(emb, numSub = 8, codebookSize = 16))
    val trained = meanCos(Similarity.pqTrainCodebooks(emb, numSub = 8, codebookSize = 16, iters = 3))
    info(s"mean cos(v, reconstruct(v)): row-seeded $seeded, L2-trained $trained")
    // Lloyd iterations minimize within-code L2, which on ~uniform-norm
    // vectors maps to higher reconstruction cosine. Floor calibrated on
    // the UNIFORM random test corpus — PQ's worst case (no cluster
    // structure for codewords to exploit; measured: seeded 0.567, trained
    // 0.662 — real clustered embeddings reconstruct far higher); slack
    // covers corpus regeneration only.
    assert(trained > seeded, s"L2 training should tighten reconstruction ($seeded -> $trained)")
    assert(trained >= 0.60, s"trained reconstruction cosine $trained below calibrated floor")
    val codes = emb.select(
      Similarity.pqEncode(col("embedding"),
        Similarity.pqCodebooksFromRows(emb, numSub = 8, codebookSize = 16)).as("c"))
    val bad = codes.where(exists(col("c"), c => c < 0 || c >= 16)).count()
    assert(bad == 0, "every PQ code must index its codebook")
  }

  test("IVF over D²-seeded trained centroids raises recall vs a uniform seed at the same nprobe") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def recall(cs: Array[Array[Double]]): Double = {
      val approx = pairs(Similarity.ivfTopK(emb.where(col("vec_id") < 50), emb, k = 10, cs))
      exact.count(approx.contains).toDouble / exact.size
    }
    // same nprobe=1, same numLists: the only variable is centroid quality.
    // Measured on this corpus: uniform sample 0.230 -> D² seed 0.258 ->
    // trained-from-D² 0.266 (deterministic pipeline; floor has slack only
    // for corpus regeneration). The fixed q_ann_ivf gate centroids score
    // "higher" (0.328) by DEGENERACY — raw unbalanced vectors give one
    // dominant list, so probing it rescans most of the corpus; balanced
    // trained lists buy the same recall while scanning ~1/numLists.
    val rUniform = recall(Similarity.sampleCentroids(emb, numLists = 8))
    val rTrained = recall(Similarity.trainCentroids(emb, numLists = 8, iters = 3))
    info(s"IVF recall@10 at nprobe=1: uniform seed $rUniform, D²-trained $rTrained")
    assert(rTrained >= 0.25, s"trained-IVF recall@10 $rTrained below floor")
    assert(rTrained > rUniform, s"D²-seeded training should beat a raw uniform seed ($rUniform -> $rTrained)")
  }

  test("sf0.1 corpus: trained-centroid IVF / IVF-MP / IVF-PQ recall@10 floors hold at 4x scale") {
    // The gate-level floors run at sf0.01 (500 vectors); this measures the
    // same recall discipline on the largest generated corpus (sf0.1, 2000
    // vectors — 4x rows, denser lists) with TRAINED centroids (the scale
    // path: D²-seeded k-means‖, not raw row seeds) at a fixed nprobe
    // budget. Floors are the sf0.01 calibrations minus 0.05 scale slack.
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    val emb01 = spark.read.parquet(s"${sf("sf0.1")}/embeddings.parquet")
    val queries = emb01.where(col("vec_id") < 50)
    val exact01 = pairs(Similarity.bruteForceTopK(queries, emb01, k = 10))
    val cents = Similarity.trainCentroids(emb01, numLists = 16, iters = 3)
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      exact01.count(pairs(df).contains).toDouble / exact01.size
    val rIvf = recall(Similarity.ivfTopK(queries, emb01, k = 10, cents, nprobe = 2))
    val rMp = recall(Similarity.ivfTopK(queries, emb01, k = 10, cents, nprobe = 6))
    val books = Similarity.pqTrainCodebooks(emb01, numSub = 8, codebookSize = 16, iters = 3)
    val rPq = recall(Similarity.ivfPqTopK(queries, emb01, k = 10, cents, books, nprobe = 2))
    info(f"sf0.1 recall@10 (16 trained lists): ivf(np=2) $rIvf%.3f, ivf-mp(np=6) $rMp%.3f, ivf-pq(np=2) $rPq%.3f")
    // Measured on this corpus: ivf 0.332, mp 0.712, pq 0.138. Floors are
    // each tier's sf0.01 gate calibration (IVF 0.25, MP monotone, PQ
    // 0.15) minus 0.05 scale slack. PQ's 32x-compressed re-rank pays the
    // most at 4x density (the uniform corpus is PQ's worst case — no
    // cluster structure for codewords); its floor is its OWN tier's, not
    // exact-scoring IVF's.
    assert(rIvf >= 0.20, s"sf0.1 trained-IVF recall@10 $rIvf below floor")
    assert(rMp >= rIvf, s"multiprobe must not lose recall ($rIvf -> $rMp)")
    assert(rMp >= 0.45, s"sf0.1 IVF-MP(np=6) recall@10 $rMp below floor")
    assert(rPq >= 0.10, s"sf0.1 IVF-PQ recall@10 $rPq below floor (0.15 - 0.05)")
  }

  test("sf0.1 corpus: LSH multi-probe recall@10 floor holds at 4x scale") {
    // The LSH tier's sf0.1 leg, alongside the IVF tiers above: the gate's
    // floor (0.35 at sf0.01, 4 planes) re-measured on the 4x corpus at the
    // SCALED plane count — buckets ≈ 2^planes should track corpus size, so
    // 5 planes keeps expected bucket occupancy comparable while the
    // 1-bit-flip multiprobe ring still covers planes+1 buckets per query.
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    val emb01 = spark.read.parquet(s"${sf("sf0.1")}/embeddings.parquet")
    val dim = emb01.select(size(col("embedding"))).head().getInt(0)
    val queries = emb01.where(col("vec_id") < 50)
    val exact01 = pairs(Similarity.bruteForceTopK(queries, emb01, k = 10))
    val got = pairs(Similarity.lshTopK(queries, emb01, k = 10, dim = dim, numPlanes = 5))
    val recall = exact01.count(got.contains).toDouble / exact01.size
    info(f"sf0.1 LSH(planes=5) recall@10: $recall%.3f")
    assert(recall >= 0.30, s"sf0.1 LSH recall@10 $recall below floor (0.35 gate - 0.05 scale slack)")
  }

  test("broadcast centroid path is bit-identical to the literal function and keeps the matrix out of the plan") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    graft.sql.VecDot.ensureRegistered(spark)
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .where(col("vec_id") < 200)
    val centroids = Similarity.sampleCentroids(emb, numLists = 8)
    val viaBcast = emb.select(col("vec_id"),
      Similarity.ivfProbes(col("embedding"), centroids, 3).as("p"))
    val viaLit = emb.select(col("vec_id"),
      call_function("vec_top_lists", col("embedding"), lit(centroids.flatten),
        lit(centroids.head.length), lit(3)).as("p"))
    val b = viaBcast.orderBy("vec_id").as[(Long, Seq[Int])].collect().toSeq
    val l = viaLit.orderBy("vec_id").as[(Long, Seq[Int])].collect().toSeq
    assert(b == l, "broadcast and literal vec_top_lists must agree bit-exactly")
    // the literal plan embeds numLists×dim doubles; the broadcast plan
    // carries only a handle — that delta is the whole point of the change
    val bLen = viaBcast.queryExecution.executedPlan.toString.length
    val lLen = viaLit.queryExecution.executedPlan.toString.length
    assert(bLen + centroids.map(_.length).sum * 8 < lLen,
      s"broadcast plan ($bLen chars) should be far smaller than literal plan ($lLen chars)")
  }

  test("IVF multi-probe: nprobe=all equals brute force exactly, nprobe grows recall monotonically") {
    import graft.ext.Similarity
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val queries = emb.where(org.apache.spark.sql.functions.col("vec_id") < 20)
    val centroids = Similarity.sampleCentroids(emb, numLists = 8)
    val exactSet = pairs(Similarity.bruteForceTopK(queries, emb, k = 5))
    def ivf(nprobe: Int) = pairs(Similarity.ivfTopK(queries, emb, k = 5, centroids, nprobe = nprobe))
    // probing every list scans the whole corpus → must reproduce brute force
    assert(ivf(8) == exactSet, "nprobe=numLists must equal exact top-k")
    val r1 = exactSet.count(ivf(1).contains).toDouble / exactSet.size
    val r4 = exactSet.count(ivf(4).contains).toDouble / exactSet.size
    assert(r4 >= r1, s"recall must not drop when probing more lists (r1=$r1 r4=$r4)")
    assert(r4 > r1, s"on this corpus widening probes should strictly help (r1=$r1 r4=$r4)")
  }

  private def quantizerObjective(cs: Array[Array[Double]]): Double = {
    import org.apache.spark.sql.functions._
    // mean over the corpus of max-cosine to any centroid — the spherical
    // k-means objective the training loop ascends
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val best = greatest(cs.map(c =>
      call_function("vec_dot", col("embedding"), lit(c)) /
        (sqrt(call_function("vec_dot", col("embedding"), col("embedding"))) *
          math.sqrt(c.map(x => x * x).sum))): _*)
    emb.select(avg(best)).head().getDouble(0)
  }

  test("spherical k-means training improves (never degrades) the quantizer objective") {
    import graft.ext.Similarity
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val seeded = Similarity.sampleCentroids(emb, numLists = 8)
    val trained = Similarity.trainCentroids(emb, numLists = 8, iters = 3)
    val (o0, o1) = (quantizerObjective(seeded), quantizerObjective(trained))
    info(s"objective: sampled seed $o0 -> trained $o1")
    assert(o1 >= o0 - 1e-9, s"training must not degrade the objective ($o0 -> $o1)")
    assert(o1 > o0 + 1e-4, s"three Lloyd iterations should measurably improve a sampled seed ($o0 -> $o1)")
  }

  test("D² (k-means||) seeding beats uniform sampling on the quantizer objective") {
    import graft.ext.Similarity
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val uniform = Similarity.sampleCentroids(emb, numLists = 8)
    val dsq = Similarity.seedCentroids(emb, numLists = 8)
    assert(dsq.length == 8, s"seeding must return numLists seeds, got ${dsq.length}")
    val (oU, oD) = (quantizerObjective(uniform), quantizerObjective(dsq))
    info(s"objective: uniform seed $oU, D² seed $oD")
    assert(oD > oU, s"D²-weighted seeds should spread better than a uniform sample ($oU -> $oD)")
  }

  test("semantic decontamination flags exactly the planted leak; empty eval set flags nothing") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    // planted leak: the eval set IS a subset of the corpus, so those rows
    // score max cosine ~1 against themselves and must all be flagged
    val evalIds = Set(3L, 17L, 101L)
    val eval = emb.where(col("vec_id").isin(evalIds.toSeq: _*))
    val out = Similarity.decontaminateSemantic(emb, eval, threshold = 0.999)
      .select("vec_id", "max_eval_sim", "contaminated")
    val flagged = out.where(col("contaminated")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(evalIds.subsetOf(flagged), s"planted leak not fully flagged: $flagged")
    // uniform random embeddings: nothing else comes near cosine 0.999
    assert(flagged === evalIds, s"false positives: ${flagged -- evalIds}")
    // every row got a real score against a non-empty eval set
    assert(out.where(col("max_eval_sim").isNull).count() === 0)
    // empty eval set: max_eval_sim NULL everywhere ("no evidence"), no flags
    val empty = Similarity.decontaminateSemantic(emb, eval.where(lit(false)))
    assert(empty.where(col("max_eval_sim").isNotNull).count() === 0)
    assert(empty.where(col("contaminated")).count() === 0)
    // zero-norm vectors have no direction: NULL score (portable — never a
    // NaN whose max semantics differ between engines), zero-norm eval rows
    // skipped rather than poisoning every score
    import spark.implicits._
    val withZero = emb.select("vec_id", "embedding").limit(5).union(
      Seq((999999L, Array.fill(64)(0f))).toDF("vec_id", "embedding"))
    val scored = Similarity.decontaminateSemantic(withZero, withZero, threshold = 0.999)
    val zeroRow = scored.where(col("vec_id") === 999999L).collect().head
    assert(zeroRow.isNullAt(zeroRow.fieldIndex("max_eval_sim")))
    assert(!zeroRow.getBoolean(zeroRow.fieldIndex("contaminated")))
    // the real vectors still self-match despite the zero eval row present
    assert(scored.where(col("vec_id") =!= 999999L && col("contaminated")).count() === 5)
  }

  test("semantic decontamination degenerate inputs: NULL/ragged eval rows, NaN and dim-mismatch vectors") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select("vec_id", "embedding").limit(4)
    // a NULL eval row carries no evidence: skipped, not an NPE on the driver
    val evalWithNull = base.union(
      Seq((888L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val ok = Similarity.decontaminateSemantic(base, evalWithNull, threshold = 0.999)
    assert(ok.where(col("contaminated")).count() === 4) // self-matches intact
    // ragged eval dims are a configuration error -> fail fast, not silent misalignment
    val ragged = base.union(Seq((777L, Array.fill(3)(0.5f))).toDF("vec_id", "embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.decontaminateSemantic(base, ragged)
    }
    assert(e.getMessage.contains("inconsistent embedding dims"))
    // corpus-side degenerate vectors score NULL, never a sentinel:
    // wrong dims (truncated dot would deflate similarity) and NaN elements
    val weird = Seq(
      (1L, Array.fill(3)(0.5f)),                       // dim mismatch vs 64-dim eval
      (2L, Array.fill(64)(Float.NaN))                  // NaN elements
    ).toDF("vec_id", "embedding")
    val scored = Similarity.decontaminateSemantic(weird, base, threshold = 0.999)
    assert(scored.where(col("max_eval_sim").isNotNull).count() === 0)
    assert(scored.where(col("contaminated")).count() === 0)
  }

  test("int8-quantized brute force keeps high top-k agreement with exact") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val dq = emb.select(col("vec_id"),
      Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))).as("embedding"))
    val approx = pairs(Similarity.bruteForceTopK(dq.where(col("vec_id") < 50), dq, k = 10))
    val overlap = exact.count(approx.contains).toDouble / exact.size
    assert(overlap >= 0.8, s"quantized top-k overlap $overlap below 0.8 — SQ8 should barely move rankings")
  }

  test("hardNegatives excludes same-label vectors even at cosine 1, ranks by cosine then id") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    // q = (1,0) label 0. Same-label exact duplicate (id 2) must never
    // appear; the different-label top-2 are (0.9,0.1) then (0,1).
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 0),  // same label, cosine 1 — excluded
      (3L, Array(0.9f, 0.1f), 1),
      (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(-1.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(rows.where(col("vec_id") === 1), rows, k = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L), (1L, 4L)))
  }

  test("hardNegatives matches brute-force top-k filtered to other-label on the test corpus") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = pairs(Similarity.hardNegatives(emb.where(col("vec_id") < 10), emb, k = 5))
    // Independent reference: unlimited brute-force ranking (k = corpus),
    // keep other-label rows, take 5 per query.
    val labels = emb.select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    val all = Similarity.bruteForceTopK(emb.where(col("vec_id") < 10), emb, k = 100000)
      .select(col("query_id"), col("neighbor_id"), col("score"))
      .as[(Long, Long, Double)].collect()
    val expect = all.groupBy(_._1).iterator.flatMap { case (q, ns) =>
      ns.filter(p => labels(p._2) != labels(q))
        .sortBy(p => (-p._3, p._2)).take(5).map(p => (q, p._2))
    }.toSet
    assert(got == expect)
  }

  test("lshNearDupPairs recovers ε-noised (non-identical) planted near-dups above floor") {
    // The q_embedding_near_dup_lsh gate plants EXACT copies (recall 1.0 by
    // construction — identical sign pattern). This spec plants genuinely
    // NEAR duplicates: v + ε·|v|·û with ε = 0.0316 → cosine ≈
    // 1/sqrt(1+ε²) ≈ 0.9995, above the 0.999 verify threshold but free to
    // land across a hyperplane. Theoretical bucket-agreement probability is
    // (1 − θ/π)^8 ≈ 0.92 at θ = arccos(0.9995); the floor sits below that
    // with slack for the seeded noise draw.
    import graft.ext.Similarity
    val dim = 64
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet").select("vec_id", "embedding")
    val rows = emb.as[(Long, Seq[Float])].collect()
    val rnd = new scala.util.Random(7)
    val eps = 0.0316
    val noised = rows.toSeq.map { case (id, v) =>
      val u = Array.fill(dim)(rnd.nextGaussian())
      val un = math.sqrt(u.map(x => x * x).sum)
      val vn = math.sqrt(v.map(x => x.toDouble * x).sum)
      (id + 1000000L, v.toArray.zip(u).map { case (x, y) => (x + eps * vn * y / un).toFloat }.toSeq)
    }
    val corpus = emb.unionByName(noised.toDF("vec_id", "embedding"))
    val found = Similarity.lshNearDupPairs(corpus, threshold = 0.999, numPlanes = 8, dim = dim)
      .as[(Long, Long)].collect().toSet
    val planted = rows.map(r => (r._1, r._1 + 1000000L)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.75, s"ε-noised near-dup recall $recall below floor 0.75")
    // and the pairs it reports are real: every found planted pair clears the
    // cosine threshold by construction of the operator's verify stage
    assert(found.nonEmpty)
  }

  test("semDedup keeps the farthest-from-centroid representative, lower id on ties") {
    import graft.ext.Similarity
    // Hand-checkable 2-D corpus over two axis centroids. Cluster 0: id 0
    // and id 1 are near-dups (cos ≈ 1); id 1 has the larger norm → smaller
    // cosine-to-centroid → SemDeDup keeps it (farthest from centroid).
    // Cluster 1: ids 2 and 3 are identical → equal centroid sim → lower
    // id 2 survives.
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val corpus = Seq(
      (0L, Array(10.0, 0.1)),
      (1L, Array(10.0, 0.1001)),
      (2L, Array(0.1, 5.0)),
      (3L, Array(0.1, 5.0))
    ).toDF("vec_id", "embedding")
    val survivors = Similarity.semDedup(corpus, cents, threshold = 0.999)
      .as[Long].collect().toSet
    assert(survivors == Set(1L, 2L), s"expected {1, 2}, got $survivors")
  }

  test("semDedup: planted exact copies never survive and never change which originals do") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.select(col("vec_id"), col("embedding"))
    val corpus = base.unionByName(
      base.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
    val cents = Similarity.trainCentroids(emb, numLists = 8, iters = 2)
    val withCopies = Similarity.semDedup(corpus, cents, threshold = 0.999)
      .as[Long].collect().toSet
    // A copy ties its original on centroid sim and loses the id tiebreak →
    // every survivor is an original.
    assert(withCopies.forall(_ < 1000000L), "a planted exact copy survived semDedup")
    // And domination by a copy implies domination by its original, so the
    // surviving-original set is invariant under planting.
    val baseOnly = Similarity.semDedup(base, cents, threshold = 0.999)
      .as[Long].collect().toSet
    assert(withCopies == baseOnly,
      s"planting copies changed the survivor set (${withCopies.size} vs ${baseOnly.size})")
  }

  test("annWorkCounts mirrors the gates' coarse join (independent formulation)") {
    import graft.ext.Similarity
    import org.apache.spark.sql.functions._
    val w = Queries.annWorkCounts(spark, dir)
    // 50 query vectors, nprobe 1 / 2
    assert(w.probedCells == 50L && w.probedCellsMp == 100L)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(w.corpusRows == emb.count())
    // Independent candidate formulation: Σ over probed (query, list)
    // cells of |list| minus the self matches (every query is a corpus
    // member whose own assignment is among its probes at any nprobe ≥ 1,
    // the argmax being probe #1) — must equal the join-counted number.
    val cents = emb.where(col("vec_id") < 8).orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>"))
      .collect().map(r => Similarity.unitVector(r.getSeq[Double](0).toArray))
    val bc = Similarity.broadcastCentroids(cents)
    val listSizes = emb
      .select(Similarity.ivfAssign(col("embedding"), bc, cents.head.length, cents.length).as("l"))
      .groupBy("l").count()
    def expected(nprobe: Int): Long = emb.where(col("vec_id") < 50)
      .select(explode(Similarity.ivfProbes(col("embedding"), bc,
        cents.head.length, cents.length, nprobe)).as("l"))
      .join(listSizes, "l")
      .agg(sum(col("count"))).head().getLong(0) - 50L
    assert(w.candidates == expected(1), s"ivf candidates ${w.candidates} != ${expected(1)}")
    assert(w.candidatesMp == expected(2), s"mp candidates ${w.candidatesMp} != ${expected(2)}")
    assert(w.candidatesMp >= w.candidates && w.maxList > 0 && w.buildSec >= 0.0)
  }
}
