package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join patterns for the 100 TB regime. Results are EXACTLY the plain
  * join's — these operators change the physical shape (what gets shuffled,
  * how skew spreads), never the answer, so both are gate-able against a
  * vanilla SQL oracle.
  */
object JoinOps {

  /** Bloom-pre-filtered left-semi join: build a Bloom filter over the
    * small side's keys (one aggregation row), broadcast it, and drop
    * non-matching large-side rows BEFORE the exact semi join — so the
    * shuffle (or even the scan output, once pushed) carries only probable
    * matches. This is the runtime-filter pattern Spark's AQE injects for
    * selective joins, exposed as an explicit operator: at 100 TB the
    * large side is scanned once map-side against ~MBs of bloom bits, and
    * the exact semi join then works on the surviving fraction. No false
    * negatives (Bloom property) + exact finish ⇒ result ≡ plain semi
    * join; false positives only cost work.
    */
  def bloomSemiJoin(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      expectedItems: Long = 1000000L
  ): DataFrame = {
    graft.sql.GraftExtensions.ensureRegistered(large.sparkSession)
    // might_contain requires a CONSTANT bloom binary, so the filter is
    // materialized on the driver — the same shape as Spark's own runtime
    // filter (aggregate the build side, broadcast the bits). Size is
    // bounded by numBits/8 (≤ 8 MiB at the 64M-bit cap), independent of
    // the build side's row count.
    // Hash the build side AS THE PROBE SIDE'S TYPE: xxhash64 hashes an
    // INT and a BIGINT of equal value differently, so without the cast a
    // type-mismatched key pair silently drops true matches (a false
    // negative — the one failure mode a bloom semi join must never have).
    val keyType = large.schema(largeKey).dataType
    val bf = small.agg(
      call_function("bloom_agg", xxhash64(col(smallKey).cast(keyType)),
        lit(expectedItems), lit(math.min(expectedItems * 8, 67108864L))).as("_bf"))
      .head().getAs[Array[Byte]](0)
    large
      .where(call_function("bloom_might_contain", lit(bf), xxhash64(col(largeKey))))
      .join(small.select(col(smallKey).cast(keyType).as(largeKey)).distinct(), Seq(largeKey), "left_semi")
  }

  /** Salted equi-join for skewed keys: the large side gets a DETERMINISTIC
    * salt (row-content hash mod `saltFactor`), the small side is exploded
    * `saltFactor`× — so one hot key's rows spread over `saltFactor`
    * reducers instead of one straggler task. Join multiplicity is
    * preserved exactly (every large row meets each matching small row in
    * precisely one salt bucket) ⇒ result ≡ plain join. Cost: small side
    * ×saltFactor — size it like a broadcast decision. AQE's skew-join
    * split handles sort-merge skew automatically; explicit salting is the
    * portable form that also covers aggregations and older planners.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int
  ): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val l = large.withColumn("_salt",
      pmod(xxhash64(struct(large.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Bucketized RANGE join: points joined to the intervals containing
    * them (`lo <= x <= hi`, both inclusive — SQL BETWEEN semantics).
    * Spark's native plan for a pure range predicate is a broadcast
    * nested-loop join — O(|points| · |intervals|) compares, a
    * scale-killer the moment neither side is tiny. This operator makes
    * it an EQUI join: pick a bucket width (default: the widest interval,
    * one tiny aggregation), explode each interval to the buckets it
    * overlaps (≤ 2 buckets when width = max span), map each point to
    * its single bucket, hash-join on the bucket id, and verify the
    * exact range predicate inside the join. Each (point, interval)
    * match lands in exactly one bucket — the point's — so no dedup pass
    * is needed and the result ≡ the plain range join (gate-oracled
    * against DuckDB's). Shuffle is keyed on bucket id, cost
    * |points| + Σ interval-spans; interval-dense buckets spread exactly
    * like any hot equi-join key (AQE skew split or salting compose on
    * top).
    */
  /** Bucketized INTERVAL-OVERLAP join: pairs of intervals with
    * `aLo <= bHi AND bLo <= aHi` (inclusive — the standard overlap
    * predicate), optionally under equi keys (`keys` — e.g. per user).
    * Spark's native plan for the pure inequality conjunction is a
    * nested-loop join; like [[rangeJoin]] this makes it an EQUI join:
    * both sides explode to the grid buckets they overlap, candidates
    * hash-join on (keys, bucket), the exact predicate verifies inside,
    * and each true pair is emitted EXACTLY ONCE by keeping only the
    * bucket containing `greatest(aLo, bLo)` — the overlap's left
    * endpoint, which lies in both intervals by definition, so no
    * dedup pass. Default bucket width = the larger side's max span
    * (every interval explodes to ≤ 2 buckets).
    *
    * Column names must be disjoint across the two frames (keys
    * excepted) — the join carries both rows wholesale.
    */
  def intervalOverlapJoin(
      a: DataFrame,
      b: DataFrame,
      aLo: String,
      aHi: String,
      bLo: String,
      bHi: String,
      keys: Seq[String] = Nil,
      bucketWidth: Option[Double] = None
  ): DataFrame = {
    val clash = a.columns.diff(keys).intersect(b.columns.diff(keys))
    require(clash.isEmpty, s"overlapping non-key columns: ${clash.mkString(", ")}")
    require(!a.columns.exists(Set("_bucket")) && !b.columns.exists(Set("_bucket")),
      "column _bucket is reserved by intervalOverlapJoin")
    def clean(df: DataFrame, lo: String, hi: String) = {
      def finite(c: org.apache.spark.sql.Column) =
        c.isNotNull && c.cast("double") > Double.NegativeInfinity &&
          c.cast("double") < Double.PositiveInfinity
      df.where(finite(col(lo)) && finite(col(hi)) && col(lo) <= col(hi))
    }
    val ca = clean(a, aLo, aHi)
    val cb = clean(b, bLo, bHi)
    val width = bucketWidth.getOrElse {
      def maxSpan(df: DataFrame, lo: String, hi: String): Double = {
        val row = df.agg(max((col(hi) - col(lo)).cast("double"))).head()
        if (row.isNullAt(0)) 1.0 else row.getDouble(0)
      }
      val w = math.max(maxSpan(ca, aLo, aHi), maxSpan(cb, bLo, bHi))
      if (w > 0) w else 1.0
    }
    require(width > 0 && !width.isInfinite && !width.isNaN,
      s"bucketWidth must be positive and finite, got $width")
    def bucketOf(c: org.apache.spark.sql.Column) = floor(c / lit(width)).cast("long")
    val ea = ca.withColumn("_bucket", explode(sequence(bucketOf(col(aLo)), bucketOf(col(aHi)))))
    val eb = cb.withColumn("_bucket", explode(sequence(bucketOf(col(bLo)), bucketOf(col(bHi)))))
    ea.join(eb, keys :+ "_bucket")
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi)
        && col("_bucket") === bucketOf(greatest(col(aLo), col(bLo))))
      .drop("_bucket")
  }

  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Option[Double] = None
  ): DataFrame = {
    // degenerate rows (NULL/NaN bounds, inverted intervals, NULL points)
    // cannot match BETWEEN — drop them before anything else. A ±Infinity
    // bound is dropped the same way: it cannot be bucketized (the explode
    // would enumerate ~2^63 buckets); clamp "unbounded" intervals to the
    // point domain upstream if that semantic is wanted.
    def finite(c: org.apache.spark.sql.Column) =
      c.isNotNull && c.cast("double") > Double.NegativeInfinity &&
        c.cast("double") < Double.PositiveInfinity
    val clean = intervals.where(finite(col(loCol)) && finite(col(hiCol)) && col(loCol) <= col(hiCol))
    val width = bucketWidth.getOrElse {
      // cast before the agg: int/long/decimal interval columns would
      // otherwise make getDouble throw ClassCastException
      val row = clean.agg(max((col(hiCol) - col(loCol)).cast("double"))).head()
      val w = if (row.isNullAt(0)) 1.0 else row.getDouble(0)
      if (w > 0) w else 1.0
    }
    require(width > 0 && !width.isInfinite && !width.isNaN,
      s"bucketWidth must be positive and finite, got $width")
    def bucketOf(c: org.apache.spark.sql.Column) = floor(c / lit(width)).cast("long")
    val iv = clean
      .withColumn("_bucket", explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val pt = points
      .where(col(pointCol).isNotNull)
      .withColumn("_bucket", bucketOf(col(pointCol)))
    pt.join(iv, Seq("_bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bucket")
  }
}
