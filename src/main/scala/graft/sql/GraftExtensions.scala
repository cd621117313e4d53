package graft.sql

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine SQL extensions — registered with
  * `spark.sql.extensions=graft.sql.GraftExtensions` (or
  * `SparkSession.builder.withExtensions`). Injects the custom codegen'd /
  * single-pass expressions used by the similarity and dedup operators.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      extensions.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", VecDot.info, VecDot.builder),
    ("vec_top_lists", VecTopLists.info, VecTopLists.builder),
    ("minhash_sig", MinHashSig.info, MinHashSig.builder),
    ("simhash64", SimHash64.info, SimHash64.builder),
    ("jaccard_sim", JaccardSim.info, JaccardSim.builder),
    ("word_shingles", WordShingles.info, WordShingles.builder),
    // Spark's internal runtime-filter expressions, surfaced as engine
    // functions for the explicit bloom-pre-filter join pattern
    // (org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    // blooms xxhash64'd longs; BloomFilterMightContain probes the binary).
    ("bloom_agg",
      new ExpressionInfo(
        "org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate", "bloom_agg"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2))),
    ("bloom_might_contain",
      new ExpressionInfo(
        "org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain", "bloom_might_contain"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(args(0), args(1)))
  )

  /** Idempotently register every engine function on an existing session
    * (for sessions not built with the extensions config).
    * `SparkSession.sessionState` is `private[sql]`, so this goes through
    * the public-at-bytecode accessor reflectively.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists(functions.head._1)) {
      val ss = spark.getClass.getMethod("sessionState").invoke(spark)
      val fr = ss.getClass.getMethod("functionRegistry").invoke(ss)
        .asInstanceOf[FunctionRegistry]
      functions.foreach { case (name, info, builder) =>
        fr.registerFunction(FunctionIdentifier(name), info, builder)
      }
    }
}
