package org.apache.spark.sql

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources._
import org.apache.spark.sql.execution.datasources.orc.OrcFileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType

/** Scan a file set whose paths AND byte lengths are already known from
  * table metadata (snapshot manifest, Iceberg manifest list, Delta log),
  * skipping Spark's file listing entirely.
  *
  * `spark.read.parquet(paths: _*)` builds an `InMemoryFileIndex`, which
  * issues a `getFileStatus`/`listStatus` round-trip per path — and past
  * `spark.sql.sources.parallelPartitionDiscovery.threshold` (32) launches
  * a whole Spark JOB just to re-discover metadata the manifest already
  * holds. On an object store that is O(files) LIST/HEAD calls per read;
  * locally it is a measurable fixed cost on every snapshot/export read
  * (~0.2 s per 96-file listing job at the bench's scale). Manifest-based
  * table formats exist precisely so readers never list directories — this
  * bridge closes the loop by feeding the manifest's (path, length) pairs
  * straight into the scan as a [[FileIndex]].
  *
  * Semantics are identical to `spark.read.schema(schema).parquet(paths)`:
  * same `HadoopFsRelation` relation, same FileFormat (so codegen,
  * vectorization, predicate pushdown, column pruning and `_metadata`
  * columns behave exactly as before), no partition columns (explicit leaf
  * file lists never partition-infer). Only the listing is gone. Lives in
  * `org.apache.spark.sql` for the same reason as [[GraftSqlBridge]]:
  * `Dataset.ofRows` is `private[sql]`.
  *
  * The declared length must be the file's TRUE length: Spark plans splits
  * from it, and an understated length would silently truncate the scan.
  * Callers therefore only route manifests whose entries carry real sizes
  * (recorded from `FileStatus.getLen` at write time, or the format spec's
  * mandatory `file_size_in_bytes`/`size` fields) and fall back to the
  * listing reader otherwise.
  */
object GraftManifestRead {

  /** A [[FileIndex]] fed from table-format metadata: no filesystem calls,
    * no partition inference. File-level pruning (bucket/min-max) happens
    * in the table layer before this index is built, so `listFiles`
    * ignores the pushed filters — exactly like `InMemoryFileIndex` for a
    * non-partitioned relation.
    */
  private final class ManifestFileIndex(statuses: Seq[FileStatus]) extends FileIndex {
    override def rootPaths: Seq[Path] = statuses.map(_.getPath)
    override def listFiles(
        partitionFilters: Seq[Expression], dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))
    override def inputFiles: Array[String] = statuses.map(_.getPath.toString).toArray
    override def refresh(): Unit = ()
    override def sizeInBytes: Long = statuses.map(_.getLen).sum
    override def partitionSchema: StructType = StructType(Nil)
  }

  /** DataFrame over explicit `(path, byteLength)` files of a known
    * `schema`. `format` is "parquet" or "orc" (the two footer-bearing
    * formats snapshot manifests and the export protocols carry sizes
    * for); callers keep the listing reader for anything else.
    */
  def read(
      session: SparkSession,
      format: String,
      schema: StructType,
      files: Seq[(Path, Long)]): DataFrame = {
    require(files.nonEmpty, "GraftManifestRead.read needs at least one file")
    // strictly positive: parquet/orc files are never 0 bytes, and a
    // 0-length status would plan an EMPTY scan of a real file — silently
    // dropped rows. Callers guard the same way and fall back to listing.
    require(files.forall(_._2 > 0), "GraftManifestRead.read needs true positive byte lengths")
    val spark = session.asInstanceOf[classic.SparkSession]
    val statuses = files.map { case (p, len) =>
      // mtime 0: nothing downstream reads it (no FileStatusCache on this
      // index; `_metadata.file_modification_time` is unused by the
      // engine's readers) — an OBSERVABLE divergence from the listing
      // reader, pinned explicitly by ManifestReadSpec so no future
      // consumer can rely on it unknowingly. Block size is irrelevant to
      // split planning — FilePartition sizing uses session
      // maxPartitionBytes.
      new FileStatus(len, false, 1, 128L << 20, 0L, p)
    }
    val fileFormat = format match {
      case "orc" => new OrcFileFormat
      case "parquet" => new ParquetFileFormat
      case other => throw new IllegalArgumentException(
        s"GraftManifestRead supports parquet/orc, got '$other'")
    }
    val relation = HadoopFsRelation(
      location = new ManifestFileIndex(statuses),
      partitionSchema = StructType(Nil),
      dataSchema = schema,
      bucketSpec = None,
      fileFormat = fileFormat,
      options = Map.empty[String, String])(spark)
    classic.Dataset.ofRows(spark, LogicalRelation(relation, isStreaming = false))
  }
}
