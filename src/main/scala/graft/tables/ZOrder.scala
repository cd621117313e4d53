package graft.tables

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton-curve) multi-column data layout — the OPTIMIZE
  * ZORDER BY of the Delta/Iceberg lineage, for [[SnapshotTable]]: rows
  * sorted by the bit-interleaving of per-column 16-bit ranks cluster
  * SIMULTANEOUSLY on every z-column, so parquet row-group and file
  * min/max stats prune scans with predicates on ANY of them — a linear
  * sort gives that skipping power only to its leading column. At 100 TB
  * the difference is whole scan fan-outs: a two-column box predicate
  * over a z-ordered table touches O(box volume) files instead of a full
  * stripe of the table.
  *
  * The z-value is a pure columnar expression (shift/and/or over the
  * normalized ranks — codegen'd, no UDF); normalization bounds come from
  * ONE aggregation pass over the frame being written. Content is
  * untouched — layout only — so every table gate stays bit-identical.
  */
object ZOrder {

  private val RankBits = 16

  /** Columns orderable on the z-curve: anything with a total order that
    * casts losslessly-enough to double for RANGE normalization. Strings
    * are rejected loudly (hashing one would destroy the locality that is
    * the whole point).
    */
  private def toDouble(df: DataFrame, c: String): Column = {
    df.schema(c).dataType match {
      case _: NumericType => col(c).cast("double")
      case TimestampType  => col(c).cast("double")
      case DateType       => unix_date(col(c)).cast("double")
      case BooleanType    => col(c).cast("int").cast("double")
      case other => throw new IllegalArgumentException(
        s"z-order column '$c' has unorderable-for-layout type $other " +
          "(numeric, timestamp, date or boolean required)")
    }
  }

  /** The interleaved z-value for `cols` (≤ 4 columns, 16 bits each): one
    * stats pass over `df` for min/max, then a pure expression. NULLs rank
    * 0 (cluster together at the curve origin); constant columns contribute
    * rank 0 everywhere.
    */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(cols.size <= 4, s"z-order supports up to 4 columns, got ${cols.size}")
    val doubles = cols.map(c => toDouble(df, c))
    val aggs = doubles.zipWithIndex.map { case (d, i) => min(d).as(s"_lo$i") } ++
      doubles.zipWithIndex.map { case (d, i) => max(d).as(s"_hi$i") }
    val statRow = df.agg(aggs.head, aggs.tail: _*).head()
    val k = cols.size
    // the interleave must stay inside the long's 63 VALUE bits: at k = 4,
    // 16-bit ranks would place column 4's top bit at bit 63 (the sign
    // bit), making the upper half of that column sort NEGATIVE — the
    // curve's two halves would swap and the straddling file's min/max box
    // would span the column's whole range. 63/k bits per column keeps the
    // highest bit at k*floor(63/k)-1 <= 62.
    val rankBits = math.min(RankBits, 63 / k)
    val maxRank = (1 << rankBits) - 1
    val rankCols = doubles.zipWithIndex.map { case (d, i) =>
      val (lo, hi) =
        (if (statRow.isNullAt(i)) 0.0 else statRow.getDouble(i),
          if (statRow.isNullAt(k + i)) 0.0 else statRow.getDouble(k + i))
      val rank =
        if (hi <= lo) lit(0L)
        else least(lit(maxRank.toLong),
          greatest(lit(0L), floor((d - lit(lo)) / lit(hi - lo) * lit(maxRank + 1)).cast("long")))
      coalesce(rank, lit(0L))
    }
    // bit interleave: output bit (i*k + j) = bit i of column j's rank
    rankCols.zipWithIndex.map { case (r, j) =>
      (0 until rankBits).map { i =>
        shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * k + j)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }
}
