package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
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
  private def checkpointName(v: Long) = f"$v%020d.checkpoint.parquet"

  /** Write a spec checkpoint every N commits. Without checkpoints every
    * reader — and this exporter's own incremental diff — replays the
    * WHOLE JSON log, an O(commits) driver cost per commit that compounds
    * to O(n²) over a stream's life (the same growth shape as the Iceberg
    * footer-read finding r13 flagged). With them, replay cost is
    * O(live files + commits since last checkpoint) — bounded.
    */
  val CheckpointInterval = 10

  /** Spec checkpoint schema (PROTOCOL.md "Checkpoints"): one column per
    * action type, one row per action; the `txn` action carries the engine
    * snapshot version so a checkpoint-anchored replay keeps idempotence
    * without reading any JSON.
    */
  private val checkpointSchema: StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("txn", StructType(Seq(
        StructField("appId", StringType), StructField("version", LongType)))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(
          StructField("provider", StringType),
          StructField("options", MapType(StringType, StringType))))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType)),
        StructField("createdTime", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", org.apache.spark.sql.types.BooleanType),
        StructField("stats", StringType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType),
        StructField("deletionTimestamp", LongType),
        StructField("dataChange", org.apache.spark.sql.types.BooleanType))))))
  }

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

  /** One LIST of `_delta_log` serving both name families — object-store
    * LIST is the dominant metadata cost of a per-commit export, so it is
    * paid once per replay, not twice. Returns (commit versions,
    * checkpoint versions), each ascending.
    */
  private def listLog(fs: FileSystem, dir: Path): (Seq[Long], Seq[Long]) =
    if (!fs.exists(logDir(dir))) (Seq.empty, Seq.empty)
    else {
      val names = fs.listStatus(logDir(dir)).toSeq.map(_.getPath.getName)
      val commits = names
        .filter(n => n.endsWith(".json") && n.length == 25 && n.dropRight(5).forall(_.isDigit))
        .map(_.dropRight(5).toLong).sorted
      val ckpts = names
        .filter(n => n.endsWith(".checkpoint.parquet") &&
          n.stripSuffix(".checkpoint.parquet").forall(_.isDigit))
        .map(_.stripSuffix(".checkpoint.parquet").toLong).sorted
      (commits, ckpts)
    }

  /** Load state AT a checkpoint version — a DRIVER-side parquet read via
    * the parquet-hadoop example Group API: the checkpoint is one KB-scale
    * single-part file, and a Spark job (scheduling + executor round trip)
    * per streaming commit just to read it would dominate low-latency
    * triggers.
    */
  private def loadCheckpoint(fs: FileSystem, dir: Path, v: Long): LogState = {
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    import org.apache.parquet.example.data.Group
    val p = new Path(logDir(dir), checkpointName(v))
    var tableId = ""
    var schemaString = ""
    var graftSnapshot = -1L
    val files = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val reader: ParquetReader[Group] =
      ParquetReader.builder(new GroupReadSupport(), p).withConf(fs.getConf).build()
    try {
      var g = reader.read()
      while (g != null) {
        def has(f: String) = g.getType.containsField(f) && g.getFieldRepetitionCount(f) > 0
        if (has("metaData")) {
          val md = g.getGroup("metaData", 0)
          tableId = md.getString("id", 0)
          schemaString = md.getString("schemaString", 0)
        }
        if (has("txn")) {
          val tx = g.getGroup("txn", 0)
          if (tx.getString("appId", 0) == "graft-export") graftSnapshot = tx.getLong("version", 0)
        }
        if (has("add")) {
          val ad = g.getGroup("add", 0)
          files(decodePath(ad.getString("path", 0))) = ad.getLong("size", 0)
        }
        g = reader.read()
      }
    } finally reader.close()
    require(schemaString.nonEmpty, s"checkpoint $v under $dir carries no metaData")
    LogState(v, tableId, schemaString, files.toMap, graftSnapshot)
  }

  /** Write the spec checkpoint for the state just committed at `v`, plus
    * `_last_checkpoint`. One single-part parquet file (coalesce(1) +
    * rename), so readers do one footer read.
    */
  private def writeCheckpoint(spark: SparkSession, fs: FileSystem, dir: Path, v: Long,
      tableId: String, schemaString: String, snapshotVersion: Long, timestampMs: Long,
      files: Seq[ExportFile], properties: Map[String, String]): Unit = {
    import org.apache.spark.sql.Row
    val conf = properties.toSeq.sortBy(_._1).map { case (k, vv) => (s"graft.$k", vv) }.toMap
    val rows = Seq(
      Row(Row("graft-export", snapshotVersion), null, null, null, null),
      Row(null, Row(1, 2), null, null, null),
      Row(null, null,
        Row(tableId, Row("parquet", Map.empty[String, String]), schemaString,
          Seq.empty[String], conf, timestampMs), null, null)) ++
      files.map(f => Row(null, null, null,
        Row(encodePath(f.uri), Map.empty[String, String], f.length, timestampMs, true,
          statsJson(f)), null))
    val tmp = new Path(logDir(dir), s".checkpoint-$v-tmp")
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), checkpointSchema)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = fs.listStatus(tmp).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .getOrElse(throw new java.io.IOException(s"no part file under $tmp"))
    val target = new Path(logDir(dir), checkpointName(v))
    fs.delete(target, false)
    if (!fs.rename(part, target))
      throw new java.io.IOException(s"checkpoint publish of $target failed")
    fs.delete(tmp, true)
    val lc = mapper.createObjectNode()
    lc.put("version", v)
    lc.put("size", rows.size.toLong)
    val lcTmp = new Path(logDir(dir), "._last_checkpoint.tmp")
    val out = fs.create(lcTmp, true)
    try out.write(mapper.writeValueAsString(lc).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val lcPath = new Path(logDir(dir), "_last_checkpoint")
    fs.delete(lcPath, false)
    if (!fs.rename(lcTmp, lcPath))
      throw new java.io.IOException("publish of _last_checkpoint failed")
  }

  /** Replay the log through `at` (inclusive; None = head). Returns None
    * for an empty/absent log. Replay anchors on the newest checkpoint ≤
    * target (driver-side parquet read) and walks only the JSON commits
    * after it — bounded by [[CheckpointInterval]] regardless of log age.
    */
  private def replay(fs: FileSystem, dir: Path, at: Option[Long]): Option[LogState] = {
    val (all, ckpts) = listLog(fs, dir)
    val upToAll = at match {
      case Some(a) =>
        require(all.contains(a), s"delta log has no version $a under $dir")
        all.filter(_ <= a)
      case None => all
    }
    if (upToAll.isEmpty) return None
    val anchor = ckpts.filter(_ <= upToAll.last).lastOption
      .map(v => loadCheckpoint(fs, dir, v))
    var tableId = anchor.map(_.tableId).getOrElse("")
    var schemaString = anchor.map(_.schemaString).getOrElse("")
    var graftSnapshot = anchor.map(_.graftSnapshot).getOrElse(-1L)
    val files = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    anchor.foreach(_.files.foreach { case (k, v) => files(k) = v })
    val upTo = upToAll.filter(v => anchor.forall(v > _.version))
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
            files(decodePath(a.get("path").asText())) = a.get("size").asLong()
          }
          if (n.has("remove")) files.remove(decodePath(n.get("remove").get("path").asText()))
        }
    }
    Some(LogState(upToAll.last, tableId, schemaString, files.toMap, graftSnapshot))
  }

  /** Delta `add.path`/`remove.path` are RFC 2396 percent-encoded URIs —
    * spec readers (delta-spark, delta-rs) URL-DECODE them before opening,
    * so a raw path containing e.g. a literal '%' or space would resolve
    * to the wrong file. Encode on write, decode on read; the multi-arg
    * URI constructor percent-encodes exactly the illegal characters.
    */
  private def encodePath(raw: String): String = {
    val u = new Path(raw).toUri
    new java.net.URI(u.getScheme, u.getAuthority, u.getPath, null, null).toASCIIString
  }

  private def decodePath(encoded: String): String =
    new Path(new java.net.URI(encoded)).toString

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
      properties: Map[String, String] = Map.empty,
      spark: Option[SparkSession] = None
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
      r.put("path", encodePath(uri))
      r.put("deletionTimestamp", timestampMs)
      r.put("dataChange", true)
      lines += mapper.writeValueAsString(rm)
    }
    adds.foreach { f =>
      val ad = mapper.createObjectNode()
      val a = ad.putObject("add")
      a.put("path", encodePath(f.uri))
      a.putObject("partitionValues")
      a.put("size", f.length)
      a.put("modificationTime", timestampMs)
      a.put("dataChange", true)
      a.put("stats", statsJson(f))
      lines += mapper.writeValueAsString(ad)
    }

    val target = new Path(logDir(exportDir), commitName(nextVersion))
    val tmp = new Path(logDir(exportDir), s".${commitName(nextVersion)}.tmp")
    val out = fs.create(tmp, true)
    try out.write((lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // PUT-IF-ABSENT publish: FileContext.rename with Rename.NONE throws
    // FileAlreadyExistsException instead of replacing — a plain
    // FileSystem.rename on POSIX silently clobbers an existing target, so
    // a concurrent-writer race would lose the first writer's diff without
    // a trace. (Single-writer is the contract; this makes breaking it
    // loud, not silent.)
    try org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, fs.getConf)
      .rename(tmp, target)
    catch {
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        fs.delete(tmp, false)
        throw new IllegalStateException(
          s"delta commit $target already exists — concurrent writer? (single-writer contract)", e)
    }
    // Spec checkpoint: due every CheckpointInterval commits — caps every
    // future replay (readers AND this exporter's own diff) at one parquet
    // read + at most ~CheckpointInterval JSON commits. BEST-EFFORT with
    // catch-up: the commit above is already durable, so a transient
    // checkpoint failure must not fail a batch whose export succeeded —
    // and because the due-test is "behind by >= interval", the NEXT commit
    // retries instead of waiting a whole interval with replay unbounded.
    val ckptDue = spark.nonEmpty && nextVersion > 0 &&
      (nextVersion % CheckpointInterval == 0 ||
        nextVersion - lastCheckpointVersion(fs, exportDir) >= CheckpointInterval)
    if (ckptDue) {
      try writeCheckpoint(spark.get, fs, exportDir, nextVersion, tableId, schemaString,
        snapshotVersion, timestampMs, files, properties)
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"DELTA EXPORT: checkpoint at v$nextVersion failed " +
            s"(commit is durable; next commit retries): ${e.getMessage}")
      }
    }
    target
  }

  private def lastCheckpointVersion(fs: FileSystem, exportDir: Path): Long =
    listLog(fs, exportDir)._2.lastOption.getOrElse(0L)

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
  def logVersions(fs: FileSystem, exportDir: Path): Seq[Long] = listLog(fs, exportDir)._1
}
