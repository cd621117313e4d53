package graft

import org.apache.spark.sql.functions._
import graft.ext.{Classifier, Datasets, Dedup, ModelStore}

/** [[graft.ext.ModelStore]] — durable pipeline state. The load-side
  * contract is BIT-identical behavior: a model stored by the fit job and
  * loaded by a scoring job must produce the same bytes-out as the
  * original object.
  */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  test("classifier round-trip scores bit-identically") {
    val train = (0 until 80).map { i =>
      (i.toLong, if (i % 2 == 0) "good solid prose here" else "spammy junk link bait", i % 2)
    }.toDF("doc_id", "text", "label")
    val m = Classifier.fit(train, numBuckets = 1 << 8, iterations = 8)
    val path = tmpDir("modelstore") + "/clf.json"
    ModelStore.saveClassifier(spark, path, m)
    val m2 = ModelStore.loadClassifier(spark, path)
    assert(m2.bias == m.bias && m2.weights == m.weights)
    val probe = Seq((1L, "good solid prose here")).toDF("doc_id", "text")
    val a = Classifier.scoreWith(m, probe).select($"quality_score").as[Double].head()
    val b = Classifier.scoreWith(m2, probe).select($"quality_score").as[Double].head()
    assert(a == b)
  }

  test("dsir round-trip preserves log-ratios exactly") {
    val raw = (0 until 60).map(i => (i.toLong, s"plain web text number $i")).toDF("doc_id", "text")
    val target = (0 until 20).map(i => (i.toLong, s"curated reference prose $i")).toDF("doc_id", "text")
    val m = Datasets.dsirFit(raw, target, numBuckets = 1 << 8)
    val path = tmpDir("modelstore") + "/dsir.json"
    ModelStore.saveDsir(spark, path, m)
    val m2 = ModelStore.loadDsir(spark, path)
    assert(m2 == m)
  }

  test("bloom index round-trip keeps membership; wrong-kind loads fail loudly") {
    val corpus = (0 until 100).map(i => (i.toLong, s"doc body $i")).toDF("doc_id", "text")
    val idx = Dedup.exactIndex(corpus, expectedItems = 500L)
    val dir = tmpDir("modelstore")
    ModelStore.saveBloomIndex(spark, s"$dir/corpus.bloom", idx)
    val idx2 = ModelStore.loadBloomIndex(spark, s"$dir/corpus.bloom")
    assert(java.util.Arrays.equals(idx, idx2))
    // the loaded index drops every true duplicate (no false negatives survive serde)
    assert(Dedup.dedupExactIncrementFast(idx2, corpus).count() == 0)
    // kind confusion fails loudly in both directions
    ModelStore.saveCentroids(spark, s"$dir/cents.json", Array(Array(1.0, 0.0)))
    intercept[IllegalArgumentException](ModelStore.loadBloomIndex(spark, s"$dir/cents.json"))
    intercept[IllegalArgumentException](ModelStore.loadClassifier(spark, s"$dir/cents.json"))
  }

  test("centroid matrix round-trip is exact; corrupt shapes rejected") {
    val cents = Array(Array(1.0, 2.5e-17, -3.0), Array(0.1, 0.2, 0.3))
    val path = tmpDir("modelstore") + "/cents.json"
    ModelStore.saveCentroids(spark, path, cents)
    val back = ModelStore.loadCentroids(spark, path)
    assert(back.length == 2 && back.zip(cents).forall { case (a, b) => a.sameElements(b) })
    intercept[IllegalArgumentException](
      ModelStore.saveCentroids(spark, path, Array(Array(1.0), Array(1.0, 2.0))))
  }

  test("SQ8 index round-trip: q_ann_int8_rerank from a reloaded index is hash-identical") {
    import graft.ext.Similarity
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val queries = emb.where($"vec_id" < 20)
    // the gate's own search, inline quantization
    val direct = Similarity.int8RerankTopK(queries, emb, k = 10, m = 40)
      .select($"query_id", $"neighbor_id", $"score")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    // persist the trained artifact, reload in a "later job", search again
    val dir = tmpDir("modelstore") + "/sq8"
    ModelStore.saveSq8Index(spark, dir, Similarity.sq8Index(emb))
    val reloaded = ModelStore.loadSq8Index(spark, dir)
    val viaStore = Similarity.int8RerankTopKFromIndex(queries, reloaded, emb, k = 10, m = 40)
      .select($"query_id", $"neighbor_id", $"score")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaStore == direct,
      "stored-state search must be bit-identical to inline quantization")
    // wrong-kind load fails loudly
    intercept[IllegalArgumentException](ModelStore.loadMinHashIndex(spark, dir))
  }

  test("OPH MinHash index round-trip: near-dup pairs from stored signatures are identical") {
    import graft.ext.Dedup
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select($"doc_id", $"text").where($"doc_id" < 400)
    val params = Dedup.MinHashParams(
      numHashes = 64, numBands = 16, shingleSize = 3, seed = 42L, oph = true)
    val direct = Dedup.nearDuplicatePairs(docs, numHashes = params.numHashes,
      numBands = params.numBands, threshold = 0.5, oph = true)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val dir = tmpDir("modelstore") + "/minhash"
    ModelStore.saveMinHashIndex(spark, dir,
      Dedup.minHashSignatures(docs, shingleSize = params.shingleSize,
        numHashes = params.numHashes, seed = params.seed, oph = params.oph),
      params)
    val (sigs, p2) = ModelStore.loadMinHashIndex(spark, dir)
    assert(p2 == params, "generation parameters must reconstruct exactly")
    val shingled = docs.select($"doc_id".as("id"),
      Dedup.wordShingles($"text", p2.shingleSize).as("shingles"))
    val viaStore = Dedup.nearDuplicatePairsFromSignatures(sigs, shingled,
      p2.numHashes, p2.numBands, threshold = 0.5)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaStore == direct,
      "stored-signature near-dup must be identical to the direct pipeline")
  }

  test("incremental near-dup from a stored corpus index matches the direct operator") {
    import graft.ext.Dedup
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select($"doc_id", $"text").where($"doc_id" < 300)
    // a planted increment: near-copies of 10 corpus docs plus 5 novel rows
    val inc = docs.where($"doc_id" < 10)
      .select(($"doc_id" + 500000L).as("doc_id"),
        concat($"text", lit(" tail")).as("text"))
      .unionByName((0 until 5).map(i => (600000L + i, s"entirely novel text $i unique"))
        .toDF("doc_id", "text"))
    val params = Dedup.MinHashParams(
      numHashes = 64, numBands = 16, shingleSize = 3, seed = 42L, oph = false)
    val direct = Dedup.incrementalNearDups(docs, inc, threshold = 0.5,
      numHashes = params.numHashes, numBands = params.numBands)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(direct.nonEmpty, "the planted near-copies must pair")
    val dir = tmpDir("modelstore") + "/minhash-inc"
    ModelStore.saveMinHashIndex(spark, dir,
      Dedup.minHashSignatures(docs, numHashes = params.numHashes), params)
    val (sigs, p2) = ModelStore.loadMinHashIndex(spark, dir)
    val viaStore = Dedup.incrementalNearDupsFromIndex(sigs, docs, inc, p2, threshold = 0.5)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaStore == direct,
      "stored-index incremental near-dup must be identical to the direct operator")
    // the pushdown bound moves via StreamSpec: 0 forces the lazy-plan
    // fallback (broadcast semi-join verify, no driver collect of the
    // candidate set) and the result must be identical — "degrades, stays
    // exact" as configuration, not a recompile
    val tuned = graft.pipeline.StreamSpec.fromJson(
      """{"sourcePath":"x","entityName":"e","targetLocation":"y",
        |"dedupMaxPushdownIds":0}""".stripMargin)
    val viaFallback = Dedup.incrementalNearDupsFromIndex(sigs, docs, inc, p2,
      threshold = 0.5, maxPushdownIds = tuned.dedupMaxPushdownIds)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(viaFallback == direct,
      "past-bound lazy fallback must be identical to the pushdown path")
  }
}
