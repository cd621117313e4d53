package graft

import graft.ext.Spread
import org.apache.spark.sql.functions._

/** [[graft.ext.Spread.acrossCores]] — the guarded scan-parallelism floor
  * under the compute-heavy map operators (r21 optimization). The guard
  * conditions are the contract: small pure map trees spread to the
  * session's parallelism, everything else is returned UNTOUCHED (no
  * exchange sneaks into a production-scale plan or past a caller-chosen
  * repartition).
  */
class SpreadSpec extends SparkSpec {
  import spark.implicits._

  private def plansRoundRobin(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Repartition => true
      case _ => false
    }

  test("small pure map tree is spread to the session parallelism") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val out = Spread.acrossCores(docs)
    assert(plansRoundRobin(out), "tiny scan should gain a round-robin repartition")
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // row multiset unchanged
    assert(out.count() == docs.count())
  }

  test("a frame that already contains an exchange-introducing node is untouched") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val agg = docs.groupBy("lang").count()
    assert(Spread.acrossCores(agg) eq agg)
    val rep = docs.repartition(17)
    assert(Spread.acrossCores(rep) eq rep, "caller-chosen repartition must stay observable")
    val joined = docs.join(docs.select(col("doc_id")), "doc_id")
    assert(Spread.acrossCores(joined) eq joined)
  }

  test("a frame the optimizer estimates above cores x maxPartitionBytes is untouched") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      // shrink the split size so the tiny fixture's estimate exceeds
      // cores x maxSplit — the production-scale regime, simulated
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16")
      assert(Spread.acrossCores(docs) eq docs)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("spread output content is identical (signatures downstream unchanged)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val a = graft.ext.Dedup.minHashSignatures(docs, numHashes = 16)
      .select(col("id"), xxhash64(concat_ws(",", col("signature").cast("array<string>"))).as("h"))
    val b = docs.sort(col("doc_id")).coalesce(1) // different partitioning, same rows
    val bSig = graft.ext.Dedup.minHashSignatures(b, numHashes = 16)
      .select(col("id"), xxhash64(concat_ws(",", col("signature").cast("array<string>"))).as("h"))
    assert(a.join(bSig.withColumnRenamed("h", "h2"), "id")
      .where(col("h") =!= col("h2")).count() == 0)
  }
}
