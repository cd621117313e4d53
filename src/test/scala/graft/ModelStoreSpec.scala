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
}
