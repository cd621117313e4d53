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
}
