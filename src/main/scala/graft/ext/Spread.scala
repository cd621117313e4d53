package graft.ext

import org.apache.spark.sql.DataFrame

/** Scan-parallelism floor for COMPUTE-heavy map stages (guide §2.6/§6:
  * "minPartitionNum sets a floor on scan parallelism" — but a byte-range
  * floor cannot split a single-row-group parquet file, which is exactly
  * what a small corpus ships as).
  *
  * Per-row work in the sketch/scoring operators (MinHash signatures over
  * every shingle × k hashes, SimHash, deletion-variant explosion, vector
  * dot products against a broadcast side, language-ID marker scans) is
  * orders of magnitude heavier than the scan itself, so the stage's
  * wall-clock is bounded by the SCAN's split count, not the data volume.
  * A corpus at production scale plans far more splits than cores and this
  * is a NO-OP there (guarded on the optimizer's own size estimate); a
  * corpus below `cores × maxPartitionBytes` would otherwise serialize its
  * whole compute on a handful of cores while the rest of the cluster
  * idles — measured locally as single-task 0.4-1.8 s stages on 32 idle
  * cores. The round-robin exchange this inserts only exists in the regime
  * where the exchanged bytes are, by the same estimate, trivially small.
  */
object Spread {
  def acrossCores(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    if (p <= 1 || df.isStreaming) return df
    val plan = df.queryExecution.optimizedPlan
    // Only pure map trees (scan/project/filter/generate/union…) qualify:
    // past any exchange-introducing node (join, aggregate, window, sort,
    // caller repartition) the downstream compute already runs at shuffle
    // width — and a caller-chosen repartition (e.g. the replayability
    // gates' repartition(17)/(13) variants) must stay observable.
    import org.apache.spark.sql.catalyst.plans.logical._
    val postExchange = plan.find {
      case _: Join | _: Aggregate | _: Window | _: Sort | _: RepartitionOperation |
           _: GlobalLimit | _: Distinct | _: Deduplicate => true
      case _ => false
    }.isDefined
    if (postExchange) return df
    val maxSplit = math.max(1L,
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")))
    // The optimizer's own size estimate: leaf-relation bytes propagated up
    // — available without executing anything (never triggers a job, unlike
    // rdd.getNumPartitions, which would materialize AQE stages on frames
    // that already contain exchanges).
    val estBytes = plan.stats.sizeInBytes
    if (estBytes >= BigInt(maxSplit) * p) df else df.repartition(p)
  }
}
