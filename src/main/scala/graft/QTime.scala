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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"$n rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
      }
    }
    spark.stop()
  }
}
