package graft

import graft.ext.Robust
import org.apache.spark.sql.functions._

/** Median/MAD robust statistics (ext/Robust.scala): discrete-median
  * rank semantics, the counting formulation's exactness, and the
  * outlier contract including the MAD=0 degenerate case.
  */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("histogramMedian is the rank-ceil(n/2) lower median, by counting") {
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), // even n: lower median 2
      ("b", -5L), ("b", -1L), ("b", 0L), // negatives: median -1
      ("c", 7L), ("c", 7L), ("c", 9L) // duplicates: median 7
    ).toDF("g", "x")
    val m = Robust.histogramMedian(df, Seq("g"), "x")
      .as[(String, Long)].collect().toMap
    assert(m == Map("a" -> 2L, "b" -> -1L, "c" -> 7L))
  }

  test("histogramMedian excludes NULLs and is partition-invariant") {
    val df = Seq[(String, java.lang.Long)](
      ("a", 1L), ("a", null), ("a", 3L), ("a", 5L)).toDF("g", "x")
    val m1 = Robust.histogramMedian(df.repartition(1), Seq("g"), "x").as[(String, Long)].head()
    val m7 = Robust.histogramMedian(df.repartition(7), Seq("g"), "x").as[(String, Long)].head()
    assert(m1 == (("a", 3L)) && m7 == m1)
  }

  test("histogramQuantile: exact rank-ceil(q*n/1000) semantics, one pass") {
    val df = (1L to 10L).map(("a", _)).toDF("g", "x")
    val q = Robust.histogramQuantile(df, Seq("g"), "x", Seq(100, 500, 900, 990, 1000))
      .as[(String, Int, Long)].collect().map { case (_, qp, v) => qp -> v }.toMap
    // n=10: ranks ceil(1)=1, ceil(5)=5, ceil(9)=9, ceil(9.9)=10, ceil(10)=10
    assert(q == Map(100 -> 1L, 500 -> 5L, 900 -> 9L, 990 -> 10L, 1000 -> 10L))
  }

  test("madSummary: known group — median 5, mad 2, one outlier at cutoff 3") {
    // x = 1..9 plus 100: median 5; |x-5| sorted = 0,1,1,2,2,3,3,4,4,95
    // -> mad (rank 5) = 2; outliers: |x-5| > 6 -> only 100.
    val df = ((1L to 9L) :+ 100L).map(("a", _)).toDF("g", "x")
    val s = Robust.madSummary(df, Seq("g"), "x")
      .as[(String, Long, Long, Long, Long)].head()
    assert(s == (("a", 5L, 2L, 10L, 1L)))
  }

  test("madFlag rows agree with madSummary; MAD=0 flags every off-median row") {
    val df = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("a", 6L)).toDF("g", "x")
    val rows = Robust.madFlag(df, Seq("g"), "x")
      .select(col("x"), col("_median"), col("_mad"), col("is_outlier"))
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(rows == Set((5L, 5L, 0L, false), (6L, 5L, 0L, true)))
    val s = Robust.madSummary(df, Seq("g"), "x").as[(String, Long, Long, Long, Long)].head()
    assert(s == (("a", 5L, 0L, 4L, 1L)))
  }

  test("winsorize: counting-quantile thresholds clip both tails exactly") {
    // x = 1..10, [200‰, 800‰]: lo = smallest x with 1000·cum ≥ 200·10 = 2;
    // hi = smallest x with 1000·cum ≥ 800·10 = 8. Clipped: 1→2, 9→8, 10→8.
    val df = (1L to 10L).map(("a", _)).toDF("g", "x")
    val w = Robust.winsorize(df, Seq("g"), "x", loPermille = 200, hiPermille = 800)
    val rows = w.select(col("x"), col("_lo"), col("_hi"), col("_w"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows.forall { case (_, lo, hi, _) => lo == 2L && hi == 8L })
    assert(rows.map { case (x, _, _, cw) => x -> cw } ==
      ((1L to 10L).map(x => x -> math.min(math.max(x, 2L), 8L))).toSet)
    assert(w.agg(sum(col("_w"))).as[Long].head() == 53L)
  }

  test("winsorize: groups clip independently; NULL values are excluded") {
    val df = ((1L to 10L).map(x => ("a", Some(x))) ++
      Seq(("b", Some(100L)), ("b", Some(200L)), ("b", Some(300L)), ("b", None)))
      .toDF("g", "x")
    val w = Robust.winsorize(df, Seq("g"), "x", loPermille = 200, hiPermille = 800)
    // group b, n=3: lo = smallest with 1000·cum ≥ 600 → cum ≥ 1 → 100;
    // hi = smallest with 1000·cum ≥ 2400 → cum ≥ 3 → 300: nothing clips.
    val b = w.where(col("g") === "b").select(col("x"), col("_w"))
      .as[(Long, Long)].collect().toSet
    assert(b == Set((100L, 100L), (200L, 200L), (300L, 300L)))
    assert(w.count() == 13) // the NULL row is dropped, not clipped
  }

  test("trimmedSummary: tails excluded, winsorize's thresholds, exact kept sum") {
    // same domain as the winsorize spec: x = 1..10, [200‰, 800‰] → lo=2,
    // hi=8; kept = 2..8 (7 values, sum 35); 1, 9, 10 EXCLUDED (winsorize
    // would have clipped them into the aggregate as 2, 8, 8)
    val df = (1L to 10L).map(("a", _)).toDF("g", "x")
    val t = Robust.trimmedSummary(df, Seq("g"), "x", loPermille = 200, hiPermille = 800)
      .select(col("g"), col("n_total"), col("n_kept"),
        col("kept_sum").cast("long"), col("lo"), col("hi"))
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(t == (("a", 10L, 7L, 35L, 2L, 8L)))
  }

  test("trimmedSummary: groups trim independently; NULLs excluded from n_total") {
    val df = ((1L to 10L).map(x => ("a", Some(x))) ++
      Seq(("b", Some(100L)), ("b", Some(200L)), ("b", Some(300L)), ("b", None)))
      .toDF("g", "x")
    val out = Robust.trimmedSummary(df, Seq("g"), "x", loPermille = 200, hiPermille = 800)
      .select(col("g"), col("n_total"), col("n_kept"), col("kept_sum").cast("long"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, a, b, c) => g -> ((a, b, c)) }.toMap
    // group b: thresholds 100/300 → nothing trims; NULL row never counted
    assert(out("b") == ((3L, 3L, 600L)))
    assert(out("a") == ((10L, 7L, 35L)))
  }
}
