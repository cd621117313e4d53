package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: time DataFrame CONSTRUCTION (transform chain + eager
  * analysis) for every query, without executing the final frame. Queries
  * that run pipeline fixtures inside their builder execute those jobs here
  * too — their numbers read as "fixture + construction", everyone else's
  * as pure driver-side plan building.
  * Usage: runMain graft.tools.BuildProf <sfDir> [query ...]
  */
object BuildProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .config("spark.speculation", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = names.flatMap { n =>
      val fn = graft.SparkEntry.queries(n)
      try {
        fn(spark, sfDir) // warm (schema inference, fixture materialization)
        val t0 = System.nanoTime()
        fn(spark, sfDir)
        val t1 = System.nanoTime()
        fn(spark, sfDir)
        val t2 = System.nanoTime()
        Some((n, math.min(t1 - t0, t2 - t1) / 1e6))
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[buildprof] $n failed: ${e.getMessage}")
          None
      }
    }
    println("\n==== construction ms (min of 2, descending) ====")
    out.sortBy(-_._2).foreach { case (n, ms) => println(f"$n%-40s ${ms}%9.1f ms") }
    println(f"TOTAL build ms: ${out.map(_._2).sum}%.1f over ${out.size} queries")
    spark.stop()
  }
}
