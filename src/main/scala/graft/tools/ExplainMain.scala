package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of registered gate
  * queries — the "is this the plan you'd want at 100x" feedback loop.
  *
  * Usage: runMain graft.tools.ExplainMain <query-name>... (optional env
  * SPARK_GRAFT_SF_DIR, default sf0.001). Prints each query's
  * `explain("formatted")` — check for: filters reaching the scan
  * (PushedFilters), pruned ReadSchema, broadcast vs shuffle joins on the
  * expected sides, and unbroken WholeStageCodegen spans.
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // --exec: run the query first and print the FINAL adaptive plan —
    // the only way to see AQE's runtime decisions (ReusedExchange,
    // skew-join splits, runtime broadcast demotion), which the static
    // formatted plan cannot show.
    val exec = args.contains("--exec")
    val names0 = args.toSeq.filterNot(_ == "--exec")
    val names = if (names0.nonEmpty) names0 else SparkEntryNames.all
    names.foreach { name =>
      println(s"===== $name =====")
      graft.SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          if (exec) {
            // Drive THIS df's own query execution (count() would build a
            // NEW one around an added aggregate, leaving this
            // AdaptiveSparkPlan unexecuted — isFinalPlan=false — and
            // hiding every runtime AQE decision the flag exists to show).
            // toLocalIterator streams partitions, so row-heavy gates
            // don't materialize on the driver the way collect() would.
            val it = df.toLocalIterator()
            while (it.hasNext) it.next()
            println(df.queryExecution.executedPlan.toString)
          } else df.explain("formatted")
        case None => println(s"unknown query '$name' — known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      }
    }
    spark.stop()
  }

  private object SparkEntryNames {
    def all: Seq[String] = graft.SparkEntry.queries.keys.toSeq.sorted
  }
}
