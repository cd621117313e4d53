package graft

import org.apache.spark.sql.functions._
import graft.ext.Classifier

/** [[graft.ext.Classifier]] — model-based quality filtering. Planted
  * marker vocabularies make the classes separable, so held-out accuracy
  * is a hard floor, and fixed-point gradient accumulation makes the fit
  * BIT-deterministic under repartitioning (asserted exactly).
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val B = 1 << 10

  // Planted two-class corpus: positives speak quality-marker words,
  // negatives spam-marker words, on top of shared filler vocabulary.
  private def planted(n: Int, offset: Int = 0) = {
    val filler = Array("the", "a", "of", "data", "spark", "rows", "table", "scan")
    (0 until n).map { i =>
      val id = (i + offset).toLong
      val label = i % 2
      val marker = if (label == 1) "excellent wellwritten thorough" else "clickbait spamlink garbage"
      val fill = (0 until 6).map(j => filler((i * 7 + j * 3) % filler.length)).mkString(" ")
      (id, s"$fill $marker $fill", label)
    }.toDF("doc_id", "text", "label")
  }

  test("planted classes: held-out accuracy 1.0") {
    val model = Classifier.fit(planted(200), numBuckets = B, iterations = 25)
    val holdout = planted(120, offset = 1000)
    val scored = Classifier.scoreWith(model, holdout)
    val acc = scored
      .select((((col("quality_score") >= 0.5).cast("int") === col("label")).cast("int")).as("ok"))
      .agg(avg("ok")).first().getDouble(0)
    assert(acc == 1.0, s"held-out accuracy $acc")
  }

  test("fit is bit-deterministic under repartitioning") {
    val data = planted(150)
    val m7 = Classifier.fit(data.repartition(7), numBuckets = B, iterations = 10)
    val m3 = Classifier.fit(data.repartition(3), numBuckets = B, iterations = 10)
    assert(m7.bias == m3.bias)
    assert(m7.weights == m3.weights, "weights must be bit-identical across partitionings")
  }

  test("scores are probabilities and ordered by class evidence") {
    val model = Classifier.fit(planted(200), numBuckets = B, iterations = 25)
    val probe = Seq(
      (1L, "excellent wellwritten thorough analysis"),
      (2L, "clickbait spamlink garbage now")).toDF("doc_id", "text")
    val s = Classifier.scoreWith(model, probe)
      .select($"doc_id", $"quality_score").as[(Long, Double)].collect().toMap
    assert(s.values.forall(p => p > 0.0 && p < 1.0))
    assert(s(1L) > 0.9 && s(2L) < 0.1, s"separation: $s")
  }

  test("filterWith keeps exactly the rows clearing the threshold") {
    val model = Classifier.fit(planted(200), numBuckets = B, iterations = 25)
    val holdout = planted(100, offset = 5000)
    val kept = Classifier.filterWith(model, holdout, threshold = 0.5)
    assert(kept.count() == 50)  // exactly the planted positives
    assert(kept.select(min("label")).first().getInt(0) == 1)
  }

  test("one-vs-rest multi-class: argmax labeling recovers planted domains") {
    val domains = Map(
      "science" -> "experiment hypothesis measurement",
      "sports" -> "tournament goalkeeper championship",
      "finance" -> "dividend portfolio liquidity")
    def corpus(n: Int, offset: Int) = (0 until n).map { i =>
      val c = domains.keys.toSeq.sorted.apply(i % 3)
      (i.toLong + offset, s"some shared words ${domains(c)} and more text", c)
    }.toDF("doc_id", "text", "class")
    val models = Classifier.fitMulti(corpus(120, 0), numBuckets = B, iterations = 20)
    assert(models.keySet == domains.keySet)
    val out = Classifier.classifyWith(models, corpus(60, 9000))
    val acc = out.select((col("predicted_class") === col("class")).cast("int").as("ok"))
      .agg(avg("ok")).first().getDouble(0)
    assert(acc == 1.0, s"multi-class accuracy $acc")
  }

  test("classifyWith tie-break is the lexicographically smallest class") {
    // Two identical models → identical scores on any doc → smallest wins.
    val m = Classifier.LinearModel(Seq.fill(B)(0.0), 0.0)
    val out = Classifier.classifyWith(Map("zeta" -> m, "alpha" -> m),
      Seq((1L, "whatever text")).toDF("doc_id", "text"))
    assert(out.select($"predicted_class").as[String].head() == "alpha")
  }

  test("loud contract failures: empty fit, oversized training set") {
    intercept[IllegalArgumentException] {
      Classifier.fit(Seq.empty[(Long, String, Int)].toDF("doc_id", "text", "label"))
    }
    // The occurrence-headroom require is unreachable with real data in a
    // test; pin the constant instead so a scale change is a conscious one.
    assert(Classifier.FixedPointScale == (1L << 28))
  }
}
