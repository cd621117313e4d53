package graft

import graft.ext.{Graph, Sketches}
import org.apache.spark.sql.functions._

/** KMV / theta sketches (ext/Sketches.scala): state exactness (the k
  * smallest distinct hashes, any partitioning), the merge-commutes-with-
  * union law, and the estimators' error bands.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("sketch state is the k smallest distinct hashes, partition-invariant") {
    val ids = ((1L to 3000L) ++ (1L to 3000L)).toDF("id") // dups must not matter
    val k = 64
    val a = Sketches.kmvSketch(ids.repartition(1), "id", k).as[Long].collect()
    val b = Sketches.kmvSketch(ids.repartition(17), "id", k).as[Long].collect()
    assert(a.sameElements(b))
    assert(a.length == k && a.sorted.sameElements(a))
    // Independent replay: hash every id in one pass (no distinct/sort/limit
    // — none of the sketch machinery), trim on the driver.
    val expected = (1L to 3000L).toDF("id")
      .select(pmod(xxhash64(col("id")), lit(4294967296L)).as("hv"))
      .as[Long].collect().distinct.sorted.take(k)
    assert(a.sameElements(expected))
  }

  test("merge(kmv(A), kmv(B)) == kmv(A ∪ B)") {
    val k = 128
    val a = Sketches.kmvSketch((1L to 5000L).toDF("id"), "id", k)
    val b = Sketches.kmvSketch((3000L to 9000L).toDF("id"), "id", k)
    val merged = Sketches.kmvMerge(a, b, k).as[Long].collect()
    val direct = Sketches.kmvSketch(((1L to 5000L) ++ (3000L to 9000L)).toDF("id"), "id", k)
      .as[Long].collect()
    assert(merged.sameElements(direct))
  }

  test("cardinality estimate: exact below k, within the error band above") {
    // Below k the sketch saw everything — the answer is exact.
    assert(Sketches.kmvEstimate(
      Sketches.kmvSketch((1L to 100L).toDF("id"), "id", 1024), 1024) == 100.0)
    // Above k: rse ≈ 1/sqrt(k-2) ≈ 3.1% at k=1024; allow 3 sigma.
    for (n <- Seq(20000L, 100000L)) {
      val est = Sketches.kmvEstimate(Sketches.kmvSketch((1L to n).toDF("id"), "id", 1024), 1024)
      assert(math.abs(est - n) / n < 0.10, s"n=$n est=$est")
    }
  }

  test("intersection estimate tracks true Jaccard of overlapping key ranges") {
    // |A| = |B| = 10000, overlap 5000 → J = 1/3, inter = 5000.
    val k = 1024
    val a = Sketches.kmvSketch((1L to 10000L).toDF("id"), "id", k)
    val b = Sketches.kmvSketch((5001L to 15000L).toDF("id"), "id", k)
    val (jac, inter, uni) = Sketches.kmvIntersect(a, b, k)
    assert(math.abs(jac - 1.0 / 3.0) < 0.06, s"jac=$jac")
    assert(math.abs(inter - 5000.0) / 5000.0 < 0.20, s"inter=$inter")
    assert(math.abs(uni - 15000.0) / 15000.0 < 0.10, s"union=$uni")
  }

  test("kmv_agg grouped state == per-group global sketch, partition-invariant") {
    // Three groups of different sizes, with duplicate ids inside groups.
    val rows = (1L to 2000L).map(id => (id % 3, id)) ++ (1L to 500L).map(id => (0L, id))
    val df = rows.toDF("g", "id")
    val k = 32
    val grouped = Sketches.kmvSketchPerGroup(df.repartition(13), Seq("g"), "id", k)
      .as[(Long, Array[Long])].collect().toMap
    assert(grouped.keySet == Set(0L, 1L, 2L))
    for ((g, state) <- grouped) {
      val expected = Sketches.kmvSketch(df.where(col("g") === g), "id", k).as[Long].collect()
      assert(state.sameElements(expected), s"group $g")
      assert(state.sorted.sameElements(state) && state.distinct.length == state.length)
    }
    // Partition invariance (map-side partial merge exercised differently).
    val g1 = Sketches.kmvSketchPerGroup(df.repartition(1), Seq("g"), "id", k)
      .as[(Long, Array[Long])].collect().toMap
    assert(grouped.keySet.forall(g => grouped(g).sameElements(g1(g))))
  }

  test("kmv_agg skips NULL keys; a small group's state is its exact hash set") {
    val df = Seq[(Long, java.lang.Long)]((1L, 5L), (1L, 5L), (1L, null), (2L, 7L))
      .toDF("g", "id")
    val state = Sketches.kmvSketchPerGroup(df, Seq("g"), "id", 16)
      .as[(Long, Array[Long])].collect().toMap
    assert(state(1L).length == 1 && state(2L).length == 1) // dups + NULL dropped
  }

  test("columnar estimate/merge/jaccard match the driver-side estimators") {
    val k = 256
    val a = Sketches.kmvSketch((1L to 10000L).toDF("id"), "id", k)
    val b = Sketches.kmvSketch((5001L to 15000L).toDF("id"), "id", k)
    val paired = a.agg(collect_list("hv").as("a"))
      .crossJoin(b.agg(collect_list("hv").as("b")))
      .select(
        Sketches.kmvEstimateCol(array_sort(col("a")), k).as("est_a"),
        Sketches.kmvJaccardCol(array_sort(col("a")), array_sort(col("b")), k).as("j"))
      .select(col("est_a"), col("j.jaccard"), col("j.inter_est"), col("j.union_est"))
      .as[(Double, Double, Double, Double)].head()
    val estA = Sketches.kmvEstimate(a, k)
    val (jac, inter, uni) = Sketches.kmvIntersect(a, b, k)
    assert(paired._1 == estA)
    assert(paired._2 == jac && paired._3 == inter && paired._4 == uni)
    assert(math.abs(jac - 1.0 / 3.0) < 0.10, s"jac=$jac")
  }

  test("replayable-hash state matches the DuckDB-shaped formula") {
    val ids = (1L to 500L).toDF("id")
    val got = Sketches.kmvSketch(ids, "id", 32,
      hashCol = Some(Graph.replayableHash(col("id")))).as[Long].collect()
    val expected = (1L to 500L).map(id => (id * 2654435761L) % 4294967296L)
      .distinct.sorted.take(32)
    assert(got.sameElements(expected))
  }

  test("sourceOverlapKmv: identical vocabularies estimate 1000‰, disjoint 0‰") {
    val docs = Seq(
      (1L, "alpha beta gamma", "s1"), (2L, "gamma beta alpha", "s2"),
      (3L, "delta epsilon", "s3"))
      .toDF("doc_id", "text", "source")
    val r = graft.ext.TextAnalysis.sourceOverlapKmv(docs, k = 16)
      .select(col("label_a"), col("label_b"), col("sketch_union"), col("n_common"),
        col("jacc_permille"))
      .as[(String, String, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    assert(r(("s1", "s2")) == ((3L, 3L, 1000L)))
    assert(r(("s1", "s3")) == ((5L, 0L, 0L)))
    assert(r(("s2", "s3")) == ((5L, 0L, 0L)))
  }

  test("sourceOverlapKmv: half-overlapping small vocabularies below k are exact") {
    // Vocabularies below k make the sketch the full set — the estimate
    // IS the true Jaccard: |{b,c}| / |{a,b,c,d}| = 2/4 = 500‰.
    val docs = Seq((1L, "a b c", "x"), (2L, "b c d", "y")).toDF("doc_id", "text", "source")
    val r = graft.ext.TextAnalysis.sourceOverlapKmv(docs, k = 16)
      .select(col("sketch_union"), col("n_common"), col("jacc_permille"))
      .as[(Long, Long, Long)].head()
    assert(r == ((4L, 2L, 500L)))
  }
}
