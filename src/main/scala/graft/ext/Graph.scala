package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation. Web-crawl pipelines rank
  * pages by link structure to pick what to keep/crawl (PageRank, Brin &
  * Page '98; CommonCrawl publishes harmonic/PageRank host ranks for
  * exactly this use). North-star extension (SURVEY.md §2.C) — no
  * reference counterpart.
  *
  * The whole computation is FIXED-POINT INTEGER arithmetic: ranks are
  * longs scaled by 10^12, per-edge contributions are integer divisions,
  * and the damping multiply-divide is `(d_permille * x) / 1000` in longs.
  * Long sums are exact and associative, so results are bit-identical
  * under ANY partitioning, executor count, or external replay engine —
  * unlike double-based PageRank, whose shuffle-order-dependent float sums
  * drift between runs (the same reason the repo's aggregates use decimal
  * `xsum`). Max mass is the scale (10^12); `850 * mass` stays < 2^63.
  */
object Graph {

  /** Total rank mass: ranks are fractions of 1 scaled by this. */
  val RankScale = 1000000000000L

  /** Dataset.unpersist is a no-op on a localCheckpoint'd frame — release
    * the checkpoint's RDD blocks directly (cf. Dedup.releaseCheckpoint).
    */
  private def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Fixed-iteration PageRank over an edge list.
    *
    * Per iteration, with `R` the scaled rank map and `n` the node count:
    * each node with out-degree `g` sends `R(v) div g` along every
    * out-edge (multi-edges count multiply — multigraph semantics);
    * dangling mass `D = Σ R(v)` over out-degree-0 nodes is shared as
    * `D div n` to every node; and
    * `R'(v) = base + (d‰ · (inflow(v) + D div n)) div 1000` where
    * `base = ((scale div n) · (1000 − d‰)) div 1000`. Division remainders
    * are dropped (deterministic mass leak ≤ a few ulp of 10^-12 per node
    * per iteration — invisible at ranking granularity and the price of
    * exactness).
    *
    * Scale shape: one shuffle per iteration (the inflow aggregation,
    * map-side combined on `dst`), one broadcast-scalar reduce for the
    * dangling mass, and a broadcast hash join of ranks against the
    * out-degree table when degrees are few (AQE decides). Each
    * iteration's rank frame is `localCheckpoint`ed and the previous
    * round's RDD blocks explicitly released (same discipline as
    * [[Dedup.connectedComponentsDetailed]]) — without the checkpoint
    * every round's logical plan embeds all prior rounds, so analysis
    * cost grows superlinearly with the iteration count even though the
    * data is tiny. Driver state is two scalars (n, D) per iteration,
    * never a node vector.
    *
    * Returns `(node, rank)` — rank summing to ≈ `RankScale` over nodes.
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int,
      dampingPermille: Int = 850,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille must be in [0, 1000], got $dampingPermille")
    // Checkpoint the (tiny relative to the corpus) edge list once so every
    // round re-analyzes a leaf RDD scan, not the upstream derivation plan.
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val n = nodes.count() // served from the checkpoint cache
    require(n > 0, "pageRank needs at least one edge")
    val base = RankScale / n * (1000 - dampingPermille) / 1000
    var ranks = nodes.withColumn("rank", lit(RankScale / n)).localCheckpoint()
    for (_ <- 1 to iterations) {
      // Dangling mass: one scalar reduce per iteration.
      val dangling = ranks.join(outDeg, col("node") === col("src"), "left")
        .where(col("deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0L))).head().getLong(0)
      val dangShare = dangling / n
      val inflow = e
        .join(ranks.join(outDeg, col("node") === col("src")).select(
          col("node"), expr("rank div deg").as("contrib")),
          e("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("inflow"))
      val next = nodes
        .join(inflow, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampingPermille * (coalesce(inflow, 0L) + ${dangShare}L)) div 1000"))
            .as("rank"))
        .localCheckpoint() // eager: materializes and truncates lineage
      release(ranks)
      ranks = next
    }
    release(nodes)
    release(outDeg)
    val out = ranks.select(col("node"), col("rank"))
    release(e)
    out
  }

  /** Fixed-point integer HITS (Kleinberg '99): hub and authority scores
    * over an edge list, L1-normalized each half-step so scores are
    * fractions of [[RankScale]].
    *
    * Per iteration: `a_raw(v) = Σ h(u)` over in-edges `u→v` (multi-edges
    * count multiply), then `a(v) = (a_raw(v) · S) div Σ a_raw`; then
    * `h_raw(v) = Σ a(w)` over out-edges `v→w` and the same
    * normalization. The normalizing multiply runs in DECIMAL(38,0)
    * (`a_raw · 10^12` overflows a long when Σ h concentrates on a high
    * in-degree node) and `div` truncates back to a long — an external
    * replay does the identical op in 128-bit integers, so scores are
    * bit-exact across engines and partitionings, like [[pageRank]].
    * L1 (not the textbook L2) keeps the iteration transcendental-free:
    * normalization is a per-step scaling, so the score ORDERING matches
    * the power iteration's at every step; only the reported magnitudes
    * differ from an L2-normalized run.
    *
    * Scale shape: two shuffles per iteration (the in-edge and out-edge
    * sum aggregations, map-side combined), two scalar totals on the
    * driver, `localCheckpoint` + release per half-step exactly as in
    * [[pageRank]] so plan analysis stays O(1) per round.
    *
    * Returns `(node, hub, auth)`.
    */
  def hits(
      edges: DataFrame,
      iterations: Int,
      srcCol: String = "src",
      dstCol: String = "dst"
  ): DataFrame = {
    require(iterations >= 1, "hits needs at least one iteration")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "hits needs at least one edge")

    // One half-step: raw = Σ other(score) grouped on `groupSide` of the
    // edge, densified over all nodes, L1-normalized to RankScale.
    def halfStep(scores: DataFrame, joinSide: String, groupSide: String): DataFrame = {
      val raw = e.join(scores, col(joinSide) === col("node"))
        .groupBy(col(groupSide)).agg(sum(col("score")).as("raw"))
      val dense = nodes.join(raw, col("node") === col(groupSide), "left")
        .select(col("node"), coalesce(col("raw"), lit(0L)).as("raw"))
        .localCheckpoint()
      val total = dense.agg(coalesce(sum(col("raw")), lit(0L))).head().getLong(0)
      require(total > 0, "hits: score mass vanished (graph has no 2-step paths)")
      val next = dense.select(col("node"),
        expr(s"CAST(raw AS DECIMAL(38,0)) * $RankScale div ${total}L").as("score"))
        .localCheckpoint()
      release(dense)
      next
    }

    var hub = nodes.withColumn("score", lit(RankScale / n)).localCheckpoint()
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      val authNext = halfStep(hub, joinSide = "src", groupSide = "dst")
      if (auth != null) release(auth)
      auth = authNext
      val hubNext = halfStep(auth, joinSide = "dst", groupSide = "src")
      release(hub)
      hub = hubNext
    }
    val out = hub.select(col("node"), col("score").as("hub"))
      .join(auth.select(col("node").as("anode"), col("score").as("auth")),
        col("node") === col("anode"))
      .select(col("node"), col("hub"), col("auth"))
    release(nodes)
    release(e)
    out
  }
}
