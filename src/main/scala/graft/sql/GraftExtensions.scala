package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Engine SQL extensions — registered with
  * `spark.sql.extensions=graft.sql.GraftExtensions` (or
  * `SparkSession.builder.withExtensions`). Currently injects the custom
  * codegen'd vector functions used by the similarity-search operators.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((FunctionIdentifier("vec_dot"), VecDot.info, VecDot.builder))
  }
}
