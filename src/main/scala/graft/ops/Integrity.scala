package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-invariant table content checksum — the "did the
  * migration/export/merge preserve the data" primitive. Each row is
  * digested (md5 of a \u0001-joined rendering of the chosen columns),
  * folded to a 31-bit value, and SUMMED: addition is commutative, so the
  * checksum is independent of partitioning, task order and row order — two
  * tables match iff (n_rows, checksum) match (up to the digest's collision
  * bound). One map-side pass + a scalar aggregation; no sort, no shuffle
  * beyond the final combine, runs identically at any scale.
  *
  * Cross-engine note: callers pick columns whose STRING rendering is
  * engine-stable (integers, strings, booleans — not floats, whose
  * formatting differs between engines). The 31-bit fold keeps the sum
  * exact in a BIGINT for up to 2^32 rows; for larger tables aggregate as
  * DECIMAL.
  */
object Integrity {

  /** (n_rows, checksum) in one row. `cols` are rendered with CAST AS
    * STRING and joined on \u0001 before hashing.
    */
  def orderInvariantChecksum(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "checksum needs at least one column")
    // NULLs render as an explicit marker: concat_ws SKIPS null arguments,
    // so without it ('x', NULL) and (NULL, 'x') digest identically and a
    // column-shifted migration would pass the integrity check.
    val h = md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0002NULL"))): _*))
    // The last 8 digest bytes read little-endian (= DuckDB's
    // md5_number_lower): reverse the hex pairs, parse base-16, fold mod 2^31.
    val revLe = concat((0 until 8).reverse.map(i => substring(h, 17 + i * 2, 2)): _*)
    val digest = pmod(conv(revLe, 16, 10).cast("decimal(20,0)"), lit(2147483648L)).cast("long")
    df.agg(count(lit(1)).as("n_rows"), sum(digest).as("checksum"))
  }
}
