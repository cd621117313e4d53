package graft.tables

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.types.{NumericType, StructType}

import scala.jdk.CollectionConverters._

/** Per-file column min/max from PARQUET FOOTERS — metadata-only reads
  * (no data pages touched), so collecting stats for a commit costs
  * O(new files) small IO ops regardless of data volume. The stats land
  * in the snapshot manifest ([[DataFile.stats]]) and drive FILE-level
  * skipping in [[SnapshotTable.readRange]] before Spark even plans the
  * scan — the Iceberg manifest-pruning pattern; parquet's own row-group
  * stats then prune further inside the files that survive.
  */
object FileStats {

  /** Min/max per requested NUMERIC column of one parquet file, folded
    * across its row groups. Columns that are non-numeric in `schema`,
    * absent from the file (pre-ADD COLUMNS files), or all-NULL are
    * omitted — absence means "no evidence", and the read path keeps
    * files without stats.
    */
  def parquetMinMax(
      conf: Configuration,
      file: Path,
      cols: Seq[String],
      schema: StructType
  ): Map[String, (Double, Double)] =
    parquetMinMaxAndCount(conf, file, cols, schema)._1

  /** Min/max (as [[parquetMinMax]]) AND the footer row count from ONE
    * footer open — the write path needs both for every new file, and a
    * single `ParquetFileReader.open` halves the per-file metadata IO.
    */
  def parquetMinMaxAndCount(
      conf: Configuration,
      file: Path,
      cols: Seq[String],
      schema: StructType
  ): (Map[String, (Double, Double)], Long) = {
    val numeric = cols.filter(c => schema.fields.exists(f =>
      f.name.equalsIgnoreCase(c) && f.dataType.isInstanceOf[NumericType])).toSet
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val count = reader.getRecordCount
      if (numeric.isEmpty) return (Map.empty, count)
      val acc = scala.collection.mutable.Map.empty[String, (Double, Double)]
      reader.getFooter.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala.foreach { chunk =>
          val name = chunk.getPath.toDotString
          if (numeric.contains(name)) {
            val st = chunk.getStatistics
            if (st != null && st.hasNonNullValue) {
              (toDouble(st.genericGetMin), toDouble(st.genericGetMax)) match {
                case (Some(mn), Some(mx)) =>
                  val prev = acc.get(name)
                  acc(name) = (prev.fold(mn)(p => math.min(p._1, mn)),
                    prev.fold(mx)(p => math.max(p._2, mx)))
                case _ => ()
              }
            }
          }
        }
      }
      (acc.toMap, count)
    } finally reader.close()
  }

  /** Whether one parquet file's footer schema carries a top-level field
    * of the given name (case-insensitive) — the guard an explicit-schema
    * read needs before trusting itself: Spark reads a column MISSING from
    * the file as all-NULL rather than failing, which downstream NULL-safe
    * key joins would treat as real NULL keys (silent wrong deletes).
    */
  def parquetHasField(conf: Configuration, file: Path, name: String): Boolean = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try reader.getFileMetaData.getSchema.getFields.asScala
      .exists(_.getName.equalsIgnoreCase(name))
    finally reader.close()
  }

  /** Footer-only row count of one parquet file (no data pages). */
  def parquetRowCount(conf: Configuration, file: Path): Long = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try reader.getRecordCount
    finally reader.close()
  }

  /** Footer-only row count of one ORC file. */
  def orcRowCount(conf: Configuration, file: Path): Long = {
    val reader = org.apache.orc.OrcFile.createReader(
      file, org.apache.orc.OrcFile.readerOptions(conf))
    try reader.getNumberOfRows
    finally reader.close()
  }

  private def toDouble(v: Any): Option[Double] = v match {
    case n: java.lang.Number => Some(n.doubleValue)
    case _ => None // binary/bool stats — not a numeric column
  }
}
