package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries N times in one session (JIT/plan warm).
  * Usage: runMain graft.QTime <sfDir> <reps> <query ...>
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      // committer v2 + no _SUCCESS: engine-session setting, rationale at
      // Main.scala's builder (manifest-level visibility)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      // speculation pinned off: the v2-committer + post-job manifest
      // listing contract assumes one committed attempt per task (see
      // Main.scala's builder for the full rationale)
      .config("spark.speculation", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        // the two bench SECTIONS are timeable here too (dev iteration on
        // the export-profile / degraded legs without a full bench run)
        val out = n match {
          case "export_profile" => graft.queries.Queries.exportProfileJson(spark, sfDir)
          case "degraded" => graft.queries.Queries.degradedPathsJson(spark, sfDir)
          case "incwork" => graft.queries.Queries.incrementalTierWorkJson(spark, sfDir)
          case "cdcwork" => graft.queries.Queries.cdcPipelineWorkJson(spark, sfDir)
          case _ => s"${SparkEntry.queries(n)(spark, sfDir).count()} rows"
        }
        println(f"$n rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($out)")
      }
    }
    spark.stop()
  }
}
