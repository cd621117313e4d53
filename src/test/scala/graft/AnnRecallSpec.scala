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
}
