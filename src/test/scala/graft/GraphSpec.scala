package graft

import graft.ext.Graph
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank (ext/Graph.scala). The dangling-node case
  * is pinned against hand-computed longs — every division truncates, so
  * the expected values are exact, not approximate.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")

  test("iteration 0 is the uniform distribution") {
    val r = Graph.pageRank(edges(1L -> 2L, 2L -> 3L), iterations = 0)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 333333333333L, 2L -> 333333333333L, 3L -> 333333333333L))
  }

  test("one iteration with a dangling node matches hand-computed longs") {
    // Graph: 1 -> {2, 3}, 2 -> 3; node 3 dangles.
    // n = 3, S = 10^12, rank0 = S div 3 = 333333333333 each.
    // base = (S div 3) * 150 div 1000 = 49999999999.
    // dangling D = rank(3) = 333333333333; share = D div 3 = 111111111111.
    // contrib(1) = rank0 div 2 = 166666666666 to each of 2 and 3;
    // contrib(2) = 333333333333 to 3.
    // rank1(1) = base + 850 * (0 + share) div 1000            = 144444444443
    // rank1(2) = base + 850 * (166666666666 + share) div 1000 = 286111111109
    // rank1(3) = base + 850 * (499999999999 + share) div 1000 = 569444444442
    val r = Graph.pageRank(edges(1L -> 2L, 1L -> 3L, 2L -> 3L), iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 144444444443L, 2L -> 286111111109L, 3L -> 569444444442L))
  }

  test("multi-edges count multiply (multigraph semantics)") {
    // 1 -> 2 twice and 1 -> 3 once: deg(1) = 3, node 2 receives two
    // shares, node 3 one. Nodes 2 and 3 dangle.
    val r = Graph.pageRank(edges(1L -> 2L, 1L -> 2L, 1L -> 3L), iterations = 1)
      .as[(Long, Long)].collect().toMap
    val share = (333333333333L * 2 / 3) // dangling mass of 2 and 3 over n=3
    val base = 49999999999L
    val per = 333333333333L / 3
    assert(r(2L) == base + 850L * (2 * per + share) / 1000)
    assert(r(3L) == base + 850L * (per + share) / 1000)
    assert(r(1L) == base + 850L * share / 1000)
  }

  test("mass is conserved up to truncation leak; more iterations concentrate rank") {
    // Cycle with a feeder: 1 -> 2 -> 3 -> 1, 4 -> 1.
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 1L)
    for (iters <- Seq(1, 5, 20)) {
      val r = Graph.pageRank(e, iterations = iters).as[(Long, Long)].collect().toMap
      val total = r.values.sum
      // Truncation drops at most a few units per node per iteration.
      assert(total <= Graph.RankScale)
      assert(total >= Graph.RankScale - 1000L * r.size * iters)
      // Node 4 has no in-edges: its rank is the teleport floor.
      assert(r(4L) == r.values.min)
      // Node 1 gets the feeder plus the cycle: strictly above uniform.
      assert(r(1L) > Graph.RankScale / 4)
    }
  }

  test("results are identical across repartitionings (integer determinism)") {
    val pairs = (0L until 400L).map(i => (i % 37) -> ((i * 7 + 3) % 41))
    val a = Graph.pageRank(edges(pairs: _*).repartition(1), iterations = 4)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(edges(pairs: _*).repartition(13), iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("HITS matches hand-computed longs (two iterations, L1-normalized)") {
    // Graph: 1 -> 3, 2 -> 3, 3 -> 1. Node 3 is the authority (two
    // in-edges), nodes 1 and 2 the hubs. Replayed in exact integer
    // arithmetic: after iter 1 auth = (1/3, 0, 2/3)·S,
    // hub = (0.4, 0.4, 0.2)·S; after iter 2 auth = (0.2, 0, 0.8)·S,
    // hub = (4/9, 4/9, 1/9)·S (truncating divisions).
    val r = Graph.hits(edges(1L -> 3L, 2L -> 3L, 3L -> 1L), iterations = 2)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r == Map(
      1L -> ((444444444444L, 200000000000L)),
      2L -> ((444444444444L, 0L)),
      3L -> ((111111111111L, 800000000000L))))
  }

  test("HITS is identical across repartitionings") {
    val pairs = (0L until 400L).map(i => (i % 37) -> ((i * 7 + 3) % 41))
    val a = Graph.hits(edges(pairs: _*).repartition(1), iterations = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = Graph.hits(edges(pairs: _*).repartition(13), iterations = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("q_pagerank gate query returns ranked nodes at sf0.001") {
    val df = graft.queries.Queries.all("q_pagerank")(spark, sf())
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum <= Graph.RankScale)
  }

  test("triangles: K4 has 4 triangles, 3 per node, lcc = 1000") {
    // Complete graph on 4 nodes: every node closes C(3,2) = 3 triangles,
    // clustering coefficient exactly 1.
    val k4 = for { i <- 0L until 4L; j <- (i + 1) until 4L } yield (i, j)
    val r = Graph.triangles(edges(k4: _*))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.length == 4)
    assert(r.forall { case (_, deg, tri, lcc) => deg == 3 && tri == 3 && lcc == 1000 })
  }

  test("triangles: a path closes none; loops and parallel edges are ignored") {
    // Path 1-2-3-4 plus a self-loop and a duplicated edge: still 0
    // triangles, degrees unchanged by the loop/multi-edge.
    val r = Graph.triangles(edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 2L -> 2L, 3L -> 2L))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.map(_._3).forall(_ == 0L))
    assert(r.map(t => t._1 -> t._2).toMap == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    assert(r.map(_._4).forall(_ == 0L))
  }

  test("triangles: one triangle with a pendant vertex (lcc truncation)") {
    // Triangle 1-2-3 plus pendant edge 3-4: node 3 has deg 3, 1 triangle,
    // lcc = 2000 * 1 div (3 * 2) = 333 permille (truncating).
    val r = Graph.triangles(edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L))
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 2L, 1L, 1000L)))
    assert(r(3L) == ((3L, 3L, 1L, 333L)))
    assert(r(4L) == ((4L, 1L, 0L, 0L)))
  }

  test("triangles are identical across repartitionings and edge orderings") {
    val pairs = (0L until 500L).map(i => (i % 29) -> ((i * 13 + 5) % 31))
    val a = Graph.triangles(edges(pairs: _*).repartition(1))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val b = Graph.triangles(edges(pairs.reverse: _*).repartition(13))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
    // Triangle-sum sanity: Σ per-node tri = 3 · (number of triangles).
    assert(a.map(_._3).sum % 3 == 0)
  }

  test("bfsLevels: hop distances on a known graph, undirected, cap honored") {
    // 0-1-2-3-4 path, plus a triangle 1-5-6 and an island 9-10.
    val e = edges((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (5L, 6L), (6L, 1L), (9L, 10L))
    val seeds = Seq(0L).toDF("node")
    val got = Graph.bfsLevels(e, seeds).as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 5L -> 2, 6L -> 2, 3L -> 3, 4L -> 4))
    // Cap: maxLevels=2 truncates the wave, island unreached either way.
    val capped = Graph.bfsLevels(e, seeds, maxLevels = 2).as[(Long, Int)].collect().toMap
    assert(capped == Map(0L -> 0, 1L -> 1, 2L -> 2, 5L -> 2, 6L -> 2))
    // Multi-source: nearest seed wins; direction of edge rows is ignored.
    val multi = Graph.bfsLevels(e, Seq(4L, 6L).toDF("node")).as[(Long, Int)].collect().toMap
    assert(multi == Map(4L -> 0, 6L -> 0, 3L -> 1, 1L -> 1, 5L -> 1, 2L -> 2, 0L -> 2))
  }

  test("hll registers: known small input replayed by hand") {
    // p = 4 → W = 28, bucket = h >> 28, rank = 29 - bitlen(low 28 bits).
    val ids = Seq(1L, 2L, 3L).toDF("id")
    val r = Graph.hllRegisters(ids, "id", p = 4,
        hashCol = Some(Graph.replayableHash(col("id"))))
      .as[(Long, Long)].collect().toMap
    val expected = Seq(1L, 2L, 3L).map { id =>
      val h = (id * 2654435761L) % 4294967296L
      val w = h & ((1L << 28) - 1)
      val rank = if (w == 0) 29L else 29L - java.lang.Long.toBinaryString(w).length
      (h >> 28) -> rank
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(r == expected)
  }

  test("hll registers are duplicate-idempotent and partition-invariant") {
    val ids = (1L to 2000L).toDF("id")
    val dup = ((1L to 2000L) ++ (1L to 2000L)).toDF("id").repartition(17)
    val a = Graph.hllRegisters(ids, "id").as[(Long, Long)].collect().sortBy(_._1)
    val b = Graph.hllRegisters(dup, "id").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("personalized PageRank: restart and dangling mass confined to seeds (hand-computed)") {
    // Graph: 1 -> 2; seeds = {1}. S = 10^12, base = S·150 div 1000 = 1.5e11.
    // r0 = (1e12, 0). it1: dang = r0(2) = 0; inflow(2) = 1e12.
    //   r1(1) = base = 150000000000; r1(2) = 850·1e12 div 1000 = 850000000000.
    // it2: dang = r1(2) (node 2 dangles) = 8.5e11, share to seed only;
    //   r2(1) = base + 850·8.5e11 div 1000 = 872500000000;
    //   r2(2) = 850·r1(1) div 1000 = 127500000000.
    val r = Graph.personalizedPageRank(edges(1L -> 2L), Seq(1L).toDF("node"), iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 872500000000L, 2L -> 127500000000L))
  }

  test("personalized PageRank: seeds outside the edge set join the universe; partition-invariant") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val seeds = Seq(9L).toDF("node") // isolated seed: keeps all restart mass
    val r = Graph.personalizedPageRank(e, seeds, 2).as[(Long, Long)].collect().toMap
    assert(r(9L) > 0 && r.keySet == Set(1L, 2L, 3L, 9L))
    // 9 has no out-edges: its rank is base + 850·dang div 1000 each round
    val a = Graph.personalizedPageRank(e.repartition(7), seeds, 3)
      .as[(Long, Long)].collect().sortBy(_._1)
    val b = Graph.personalizedPageRank(e, seeds, 3).as[(Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("kCore: K4 with a pendant chain peels to the 3-core; a cycle peels to nothing") {
    // K4 on {1,2,3,4} + chain 1-5-6. k=3: round 1 drops 5 (deg 2) and 6
    // (deg 1); survivors all have deg 3 — stable.
    val k4 = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L,
      1L -> 5L, 5L -> 6L)
    val r = Graph.kCore(k4, k = 3, rounds = 3).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // A 4-cycle is 2-regular: the 3-core is empty.
    val cyc = edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L)
    assert(Graph.kCore(cyc, k = 3, rounds = 3).isEmpty)
    // Fixed rounds past the fixpoint change nothing; partition-invariant.
    val a = Graph.kCore(k4.repartition(9), 3, 6).as[(Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(r.toArray.sortBy(_._1)))
  }

  test("label propagation: two triangles with a bridge resolve to two communities") {
    // {1,2,3} and {10,11,12} triangles, bridge 3-10. Hand-rolled sync
    // rounds (plurality, min-label ties): after 3 rounds the left
    // triangle settles on label 1 and the right on label 3 (the bridge
    // node's round-1 label invades the right triangle).
    val e = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 10L -> 11L, 11L -> 12L, 10L -> 12L, 3L -> 10L)
    val r = Graph.labelPropagation(e, iterations = 3).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 3L, 11L -> 3L, 12L -> 3L))
  }

  test("label propagation is identical across repartitionings and edge direction") {
    val base = edges(1L -> 2L, 2L -> 3L, 1L -> 3L, 10L -> 11L, 11L -> 12L, 10L -> 12L, 3L -> 10L)
    val flipped = base.select(col("dst").as("src"), col("src").as("dst")).repartition(13)
    val a = Graph.labelPropagation(base, 3).as[(Long, Long)].collect().sortBy(_._1)
    val b = Graph.labelPropagation(flipped, 3).as[(Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("random walks: hand-computed 2-step walk; seed without out-edges stops at step 0") {
    // 1 -> {2(idx0), 3(idx1)} deg 2; 2 -> 1; 3 -> 1. Walk from 1:
    // step1 idx = (1000003 + 40503 + 9973) % 2 = 1 -> 3;
    // step2 idx = (1000003 + 3*40503 + 2*9973) % 1 = 0 -> 1.
    // Seed 4 has no out-edges: only its step-0 row appears.
    val e = edges(1L -> 2L, 1L -> 3L, 2L -> 1L, 3L -> 1L)
    val seeds = Seq(1L, 4L).toDF("node")
    val rows = Graph.randomWalks(e, seeds, steps = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 0L, 1L), (1L, 1L, 3L), (1L, 2L, 1L), (4L, 0L, 4L)))
  }

  test("random walks are identical across repartitionings and duplicate edges") {
    val e = edges(1L -> 2L, 1L -> 3L, 2L -> 3L, 3L -> 1L, 2L -> 1L)
    val dup = e.unionByName(e).repartition(11) // distinct() inside must dedup
    val seeds = Seq(1L, 2L, 3L).toDF("node")
    val a = Graph.randomWalks(e, seeds, 5).as[(Long, Long, Long)].collect().sorted
    val b = Graph.randomWalks(dup, seeds, 5).as[(Long, Long, Long)].collect().sorted
    assert(a.sameElements(b))
  }

  test("hll estimate within the expected error band (p=12 → ~1.6% rse)") {
    // Default hash is xxhash64 folded to 32 bits: rank estimation needs
    // low-bit avalanche, which the replayable multiplicative hash lacks
    // on structured ids (sequential ids estimate 47% high — see the
    // hllRegisters scaladoc); that hash is for gate replay only.
    for (n <- Seq(500L, 20000L)) {
      val est = Graph.hllEstimate(Graph.hllRegisters((1L to n).toDF("id"), "id"))
      assert(math.abs(est - n) / n < 0.05, s"n=$n est=$est")
    }
  }
}
