package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.charset.StandardCharsets
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Delta Lake transaction-log export — the second open-table-format
  * interop leg next to [[IcebergExport]], written purely from the PUBLIC
  * Delta protocol (delta-io/delta PROTOCOL.md): a `_delta_log/` directory
  * of newline-delimited-JSON commit files any Delta reader (Spark +
  * delta-spark, Trino, DuckDB delta, delta-rs) replays to the live file
  * set.
  *
  * Layout under `exportDir`:
  * {{{
  *   _delta_log/00000000000000000000.json   # protocol + metaData + adds
  *   _delta_log/00000000000000000001.json   # commitInfo + adds/removes
  * }}}
  *
  * Design mirrors the Iceberg exporter:
  *  - METADATA-ONLY and incremental: data files are referenced by
  *    absolute URI (no copies); each engine commit appends ONE log entry
  *    containing only the add/remove DIFF vs the previously exported file
  *    set, with row counts / byte sizes from the snapshot manifest — a
  *    per-commit export does zero per-file IO (O(new files)).
  *  - Idempotent: re-exporting the same engine snapshot is a no-op (the
  *    engine snapshot version rides in `commitInfo`).
  *  - Atomic publish: the commit file is written to a temp name and
  *    renamed into place; Delta's contract is put-if-absent, so an
  *    already-existing target (a concurrent writer, forbidden by the
  *    table's single-writer contract) fails loudly instead of clobbering.
  *  - Schema changes publish a fresh `metaData` action (same stable table
  *    id); Delta's schemaString IS Spark's StructType JSON, so engine and
  *    log schemas cannot drift.
  *  - Time travel: [[readTable]] replays the log up to any version.
  *
  * Deliberate constraints (loud, never silent): parquet tables only
  * (Delta data files are parquet by spec) and no outstanding
  * merge-on-read deletes (the protocol's deletion vectors are a
  * writer-v7 feature; equality deletes have NO Delta representation —
  * compact first, exactly the pre-delete-manifest Iceberg rule).
  */
object DeltaExport {

  private val mapper = new ObjectMapper()

  /** One live data file to publish: absolute URI, byte length, row count,
    * per-column (min, max) double stats from the snapshot manifest.
    */
  final case class ExportFile(
      uri: String, length: Long, rows: Long,
      stats: Map[String, (Double, Double)] = Map.empty)

  private def logDir(exportDir: Path) = new Path(exportDir, "_delta_log")
  private def commitName(v: Long) = f"$v%020d.json"

  /** Replayed log state: last delta version, stable table id, last
    * published schema JSON, live (uri → size) set, last engine snapshot.
    */
  private final case class LogState(
      version: Long, tableId: String, schemaString: String,
      files: Map[String, Long], graftSnapshot: Long)

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  /** List commit versions present, ascending. */
  private def versions(fs: FileSystem, dir: Path): Seq[Long] =
    if (!fs.exists(logDir(dir))) Seq.empty
    else fs.listStatus(logDir(dir)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && n.length == 25 && n.dropRight(5).forall(_.isDigit))
      .map(_.dropRight(5).toLong)
      .sorted

  /** Replay the log through `at` (inclusive; None = head). Returns None
    * for an empty/absent log.
    */
  private def replay(fs: FileSystem, dir: Path, at: Option[Long]): Option[LogState] = {
    val all = versions(fs, dir)
    val upTo = at match {
      case Some(a) =>
        require(all.contains(a), s"delta log has no version $a under $dir")
        all.filter(_ <= a)
      case None => all
    }
    if (upTo.isEmpty) return None
    var tableId = ""
    var schemaString = ""
    var graftSnapshot = -1L
    val files = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    upTo.foreach { v =>
      readText(fs, new Path(logDir(dir), commitName(v))).linesIterator
        .filter(_.nonEmpty).foreach { line =>
          val n = mapper.readTree(line)
          if (n.has("metaData")) {
            tableId = n.get("metaData").get("id").asText()
            schemaString = n.get("metaData").get("schemaString").asText()
          }
          if (n.has("commitInfo") && n.get("commitInfo").has("operationParameters")) {
            val op = n.get("commitInfo").get("operationParameters")
            if (op.has("graftSnapshotVersion"))
              graftSnapshot = op.get("graftSnapshotVersion").asText().toLong
          }
          if (n.has("add")) {
            val a = n.get("add")
            files(a.get("path").asText()) = a.get("size").asLong()
          }
          if (n.has("remove")) files.remove(n.get("remove").get("path").asText())
        }
    }
    Some(LogState(upTo.last, tableId, schemaString, files.toMap, graftSnapshot))
  }

  private def statsJson(f: ExportFile): String = {
    val root = mapper.createObjectNode()
    root.put("numRecords", f.rows)
    if (f.stats.nonEmpty) {
      val mins = root.putObject("minValues")
      val maxs = root.putObject("maxValues")
      f.stats.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
        mins.put(c, lo); maxs.put(c, hi)
      }
    }
    mapper.writeValueAsString(root)
  }

  /** Publish `files` as the next Delta commit. Returns the commit file
    * path. No-op (returns the existing head) when `snapshotVersion` is
    * already published; refuses to move BACKWARDS (a rollback must export
    * into a fresh directory — Delta versions are append-only).
    */
  def write(
      fs: FileSystem,
      exportDir: Path,
      schema: StructType,
      snapshotVersion: Long,
      timestampMs: Long,
      files: Seq[ExportFile],
      properties: Map[String, String] = Map.empty
  ): Path = {
    val prior = replay(fs, exportDir, at = None)
    prior.foreach { st =>
      if (st.graftSnapshot == snapshotVersion)
        return new Path(logDir(exportDir), commitName(st.version)) // idempotent
      require(st.graftSnapshot < snapshotVersion,
        s"delta export dir is at engine snapshot ${st.graftSnapshot}, refusing to publish " +
          s"older snapshot $snapshotVersion (append-only log; export a rollback to a fresh dir)")
    }
    fs.mkdirs(logDir(exportDir))

    val nextVersion = prior.map(_.version + 1).getOrElse(0L)
    val tableId = prior.map(_.tableId).filter(_.nonEmpty)
      .getOrElse(UUID.nameUUIDFromBytes(exportDir.toString.getBytes(StandardCharsets.UTF_8)).toString)
    val schemaString = schema.json

    val prevFiles = prior.map(_.files).getOrElse(Map.empty)
    val nextFiles = files.map(f => f.uri -> f).toMap
    val adds = files.filter(f => !prevFiles.contains(f.uri))
    val removes = prevFiles.keys.filterNot(nextFiles.contains).toSeq.sorted

    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val commitInfo = mapper.createObjectNode()
    val ci = commitInfo.putObject("commitInfo")
    ci.put("timestamp", timestampMs)
    ci.put("operation", if (nextVersion == 0L) "WRITE" else "MERGE")
    ci.putObject("operationParameters").put("graftSnapshotVersion", snapshotVersion.toString)
    ci.put("engineInfo", "graft-snapshot-export")
    lines += mapper.writeValueAsString(commitInfo)

    if (nextVersion == 0L) {
      val proto = mapper.createObjectNode()
      val p = proto.putObject("protocol")
      p.put("minReaderVersion", 1)
      p.put("minWriterVersion", 2)
      lines += mapper.writeValueAsString(proto)
    }
    if (prior.forall(_.schemaString != schemaString)) {
      val meta = mapper.createObjectNode()
      val m = meta.putObject("metaData")
      m.put("id", tableId)
      val fmt = m.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      m.put("schemaString", schemaString)
      m.putArray("partitionColumns")
      val conf = m.putObject("configuration")
      properties.toSeq.sortBy(_._1).foreach { case (k, v) => conf.put(s"graft.$k", v) }
      m.put("createdTime", timestampMs)
      lines += mapper.writeValueAsString(meta)
    }
    removes.foreach { uri =>
      val rm = mapper.createObjectNode()
      val r = rm.putObject("remove")
      r.put("path", uri)
      r.put("deletionTimestamp", timestampMs)
      r.put("dataChange", true)
      lines += mapper.writeValueAsString(rm)
    }
    adds.foreach { f =>
      val ad = mapper.createObjectNode()
      val a = ad.putObject("add")
      a.put("path", f.uri)
      a.putObject("partitionValues")
      a.put("size", f.length)
      a.put("modificationTime", timestampMs)
      a.put("dataChange", true)
      a.put("stats", statsJson(f))
      lines += mapper.writeValueAsString(ad)
    }

    val target = new Path(logDir(exportDir), commitName(nextVersion))
    require(!fs.exists(target),
      s"delta commit $target already exists — concurrent writer? (single-writer contract)")
    val tmp = new Path(logDir(exportDir), s".${commitName(nextVersion)}.tmp")
    val out = fs.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"atomic publish of $target failed (tmp rename)")
    target
  }

  /** Latest exported engine snapshot version, if any — the per-commit
    * exporter's idempotence probe.
    */
  def currentExportedSnapshot(fs: FileSystem, exportDir: Path): Option[Long] =
    replay(fs, exportDir, at = None).map(_.graftSnapshot).filter(_ >= 0)

  /** Live (uri, size) file set at `at` (None = head), by log replay only —
    * the reader half used by the gate, which must see the table
    * EXCLUSIVELY through the exported log.
    */
  def readFiles(fs: FileSystem, exportDir: Path, at: Option[Long] = None): Seq[(String, Long)] = {
    val st = replay(fs, exportDir, at).getOrElse(
      throw new IllegalArgumentException(s"no delta log under $exportDir"))
    st.files.toSeq.sortBy(_._1)
  }

  /** Read the exported table through the log: schema from the last
    * `metaData` action (never inferred from data files), files from
    * replay. `at` time-travels to a specific delta version.
    */
  def readTable(spark: SparkSession, exportDir: Path, at: Option[Long] = None): DataFrame = {
    val fs = exportDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = replay(fs, exportDir, at).getOrElse(
      throw new IllegalArgumentException(s"no delta log under $exportDir"))
    val schema = DataType.fromJson(st.schemaString).asInstanceOf[StructType]
    if (st.files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(st.files.keys.toSeq.sorted: _*)
  }

  /** Delta version history (ascending) — for time-travel tests. */
  def logVersions(fs: FileSystem, exportDir: Path): Seq[Long] = versions(fs, exportDir)
}
