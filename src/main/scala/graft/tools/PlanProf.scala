package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler for DRIVER-side cost: splits a warm query run into
  * DataFrame construction, Catalyst phases (analysis / optimization /
  * physical planning, from QueryPlanningTracker) and execution, so the
  * "driver gap" Prof reports (job wall sum vs total wall) is attributable
  * to a phase instead of guessed.
  * Usage: runMain graft.tools.PlanProf <sfDir> <query ...>
  */
object PlanProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
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
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, sfDir).count() // per-shape init, unprofiled
      fn(spark, sfDir).count() // bench steady state
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.assertAnalyzed()
        val t2 = System.nanoTime()
        qe.optimizedPlan // forces optimization
        val t3 = System.nanoTime()
        qe.executedPlan // forces physical planning
        val t4 = System.nanoTime()
        val rows = qe.toRdd.count() // executes (incl. AQE re-planning)
        val t5 = System.nanoTime()
        def ms(a: Long, b: Long): String = f"${(b - a) / 1e6}%8.1f"
        println(f"$n%-32s rep$rep build=${ms(t0, t1)} analyze=${ms(t1, t2)} " +
          f"optimize=${ms(t2, t3)} plan=${ms(t3, t4)} exec=${ms(t4, t5)} " +
          f"total=${ms(t0, t5)} ms rows=$rows")
      }
    }
    spark.stop()
  }
}
