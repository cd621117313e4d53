package graft.tables

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Apache Iceberg FORMAT-VERSION-2 metadata export for a [[SnapshotTable]]
  * snapshot — the offline-feasible half of the reference's biggest interop
  * property: its targets are genuine Iceberg tables that any engine reads
  * through a catalog (`/root/reference/src/main/scala/main.scala:105-110`,
  * `docker-compose.yaml:54-78`). The Iceberg TABLE SPEC is public; writing
  * spec-conformant metadata needs no Iceberg runtime JAR, so the export
  * closes the any-engine-readable promise for every reader that speaks
  * Iceberg (Spark+iceberg-runtime, Trino, DuckDB's iceberg extension,
  * pyiceberg) even though this sandbox cannot load one to round-trip it.
  *
  * Layout written under `exportDir` (HadoopCatalog / filesystem-table
  * convention, discoverable via `version-hint.text`):
  * {{{
  * <exportDir>/metadata/
  *   version-hint.text            # "1"
  *   v1.metadata.json             # TableMetadata (format-version 2)
  *   snap-<id>-manifest-list.avro # manifest list (one manifest entry)
  *   <uuid>-m0.avro               # manifest: one entry per live data file
  * }}}
  *
  * Data files are referenced by ABSOLUTE URI (spec-legal; Iceberg resolves
  * `file_path` directly), so the export is metadata-only: O(live files)
  * footer reads for record counts, zero data copies — the only shape that
  * survives a 100 TB table. Dead files from superseded snapshots are
  * simply not referenced; that is exactly how Iceberg readers isolate
  * from in-progress rewrites.
  *
  * [[readDataFiles]] walks the chain back (version-hint → metadata.json →
  * manifest list → manifests → file paths) using only the public spec —
  * the correctness gate reads the table THROUGH the export, proving an
  * external reader following Iceberg metadata sees exactly the live rows.
  */
object IcebergExport {

  private val mapper = new ObjectMapper()

  // ---------------------------------------------------------------- schemas

  /** Spark → Iceberg primitive type names (Iceberg spec "Primitive Types"). */
  private[tables] def icebergType(dt: DataType): String = dt match {
    case BooleanType      => "boolean"
    case IntegerType      => "int"
    case ShortType        => "int" // Iceberg has no short; int is the spec'd promotion
    case ByteType         => "int"
    case LongType         => "long"
    case FloatType        => "float"
    case DoubleType       => "double"
    case StringType       => "string"
    case BinaryType       => "binary"
    case DateType         => "date"
    case TimestampType    => "timestamptz"
    case TimestampNTZType => "timestamp"
    case d: DecimalType   => s"decimal(${d.precision}, ${d.scale})"
    case other =>
      throw new IllegalArgumentException(
        s"cannot export ${other.simpleString} to an Iceberg primitive type")
  }

  /** Iceberg schema JSON (field ids assigned 1..n in schema order). */
  private[tables] def icebergSchemaJson(schema: StructType): String = {
    val root = mapper.createObjectNode()
    root.put("type", "struct")
    root.put("schema-id", 0)
    val fields = root.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fo = fields.addObject()
      fo.put("id", i + 1)
      fo.put("name", f.name)
      fo.put("required", !f.nullable)
      fo.put("type", icebergType(f.dataType))
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  // Avro schemas from the Iceberg spec's manifest-list / manifest tables
  // (field-id properties are what Iceberg readers map columns by).
  private val ManifestFileSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514},
      |{"name":"partitions","type":["null",{"type":"array","items":{
      |  "type":"record","name":"field_summary","fields":[
      |  {"name":"contains_null","type":"boolean","field-id":509},
      |  {"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
      |  {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
      |  {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}]},
      |  "element-id":508}],"default":null,"field-id":507}
      |]}""".stripMargin)

  // data_file struct limited to the spec's REQUIRED v2 fields (all optional
  // stats fields omitted — legal per spec; readers treat them as unknown).
  private val ManifestEntrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int","field-id":134},
      |  {"name":"file_path","type":"string","field-id":100},
      |  {"name":"file_format","type":"string","field-id":101},
      |  {"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
      |  {"name":"record_count","type":"long","field-id":103},
      |  {"name":"file_size_in_bytes","type":"long","field-id":104}
      |]}}
      |]}""".stripMargin)

  /** One live data file: absolute URI, byte length, footer row count. */
  final case class ExportFile(path: String, sizeBytes: Long, recordCount: Long)

  /** Exported snapshots retained in the metadata's history window; older
    * entries are pruned with their manifest files (the Iceberg
    * `expire_snapshots` role, applied at export time).
    */
  val KeepSnapshots = 10

  /** Snapshot id currently published by an export dir, if any — the
    * idempotence check a caller runs before collecting footer stats.
    */
  def currentExportedSnapshotId(fs: FileSystem, exportDir: Path): Option[Long] = {
    val metaDir = new Path(exportDir, "metadata")
    val hintPath = new Path(metaDir, "version-hint.text")
    if (!fs.exists(hintPath)) None
    else {
      val hint = readText(fs, hintPath).trim
      val metaPath = new Path(metaDir, s"v$hint.metadata.json")
      if (!fs.exists(metaPath)) None
      else Some(mapper.readTree(readText(fs, metaPath)).get("current-snapshot-id").asLong())
    }
  }

  // ----------------------------------------------------------------- write

  /** Write the Iceberg v2 metadata tree for one snapshot; returns the new
    * metadata.json path. INCREMENTAL: when the export dir already carries
    * metadata, the new snapshot is appended to its history — vN+1
    * .metadata.json keeps the previous `snapshots` entries (up to
    * [[KeepSnapshots]]; older ones are pruned with their manifest files),
    * links `parent-snapshot-id`, and extends `snapshot-log`/`metadata-log`
    * — so an external Iceberg reader can time-travel across exported
    * commits, not just read the head. Re-exporting the same table version
    * is a no-op (same snapshot id).
    *
    * Field-id stability across exports relies on the table only ever
    * ADDING columns (SnapshotTable's schema migration contract):
    * positional ids 1..n stay bound to the same names, and a new column
    * extends the id space — the Iceberg column-identity rule holds.
    */
  def write(
      fs: FileSystem,
      exportDir: Path,
      schema: StructType,
      snapshotVersion: Long,
      timestampMs: Long,
      files: Seq[ExportFile],
      properties: Map[String, String],
      keepSnapshots: Int = KeepSnapshots,
      fileFormat: String = "PARQUET"
  ): Path = {
    val metaDir = new Path(exportDir, "metadata")
    val snapshotId = snapshotVersion + 1 // Iceberg snapshot ids must be != -1; keep them stable per version
    val seq = snapshotVersion

    // Prior state (incremental export): version counter, retained
    // snapshot entries, the previous metadata file for metadata-log.
    val hintPath = new Path(metaDir, "version-hint.text")
    val prior: Option[(Int, com.fasterxml.jackson.databind.JsonNode)] =
      if (!fs.exists(hintPath)) None
      else {
        val hint = readText(fs, hintPath).trim.toInt
        val p = new Path(metaDir, s"v$hint.metadata.json")
        if (fs.exists(p)) Some((hint, mapper.readTree(readText(fs, p)))) else None
      }
    prior match {
      case Some((hint, meta)) if meta.get("current-snapshot-id").asLong() == snapshotId =>
        return new Path(metaDir, s"v$hint.metadata.json") // already published — no-op
      case _ => ()
    }
    fs.mkdirs(metaDir)

    // 1. manifest: one entry per live data file, all status=ADDED(1).
    val manifestPath = fs.makeQualified(new Path(metaDir, s"${UUID.randomUUID()}-m0.avro"))
    val entryDatum = new GenericDatumWriter[GenericRecord](ManifestEntrySchema)
    val entryWriter = new DataFileWriter[GenericRecord](entryDatum)
    entryWriter.setMeta("schema", icebergSchemaJson(schema))
    entryWriter.setMeta("schema-id", "0")
    entryWriter.setMeta("partition-spec", "[]")
    entryWriter.setMeta("partition-spec-id", "0")
    entryWriter.setMeta("format-version", "2")
    entryWriter.setMeta("content", "data")
    val mOut = fs.create(manifestPath, true)
    entryWriter.create(ManifestEntrySchema, mOut)
    val dataFileSchema = ManifestEntrySchema.getField("data_file").schema()
    val partitionSchema = dataFileSchema.getField("partition").schema()
    files.foreach { f =>
      val df = new GenericData.Record(dataFileSchema)
      df.put("content", 0)
      df.put("file_path", f.path)
      df.put("file_format", fileFormat)
      df.put("partition", new GenericData.Record(partitionSchema))
      df.put("record_count", f.recordCount)
      df.put("file_size_in_bytes", f.sizeBytes)
      val e = new GenericData.Record(ManifestEntrySchema)
      e.put("status", 1)
      e.put("snapshot_id", snapshotId)
      e.put("sequence_number", seq)
      e.put("file_sequence_number", seq)
      e.put("data_file", df)
      entryWriter.append(e)
    }
    entryWriter.close()
    val manifestLen = fs.getFileStatus(manifestPath).getLen

    // 2. manifest list: one manifest_file row naming the manifest above.
    val listPath = fs.makeQualified(new Path(metaDir, s"snap-$snapshotId-manifest-list.avro"))
    val listDatum = new GenericDatumWriter[GenericRecord](ManifestFileSchema)
    val listWriter = new DataFileWriter[GenericRecord](listDatum)
    listWriter.setMeta("snapshot-id", snapshotId.toString)
    listWriter.setMeta("sequence-number", seq.toString)
    listWriter.setMeta("format-version", "2")
    val lOut = fs.create(listPath, true)
    listWriter.create(ManifestFileSchema, lOut)
    val mf = new GenericData.Record(ManifestFileSchema)
    mf.put("manifest_path", manifestPath.toString)
    mf.put("manifest_length", manifestLen)
    mf.put("partition_spec_id", 0)
    mf.put("content", 0) // data
    mf.put("sequence_number", seq)
    mf.put("min_sequence_number", seq)
    mf.put("added_snapshot_id", snapshotId)
    mf.put("added_files_count", files.size)
    mf.put("existing_files_count", 0)
    mf.put("deleted_files_count", 0)
    mf.put("added_rows_count", files.map(_.recordCount).sum)
    mf.put("existing_rows_count", 0L)
    mf.put("deleted_rows_count", 0L)
    listWriter.append(mf)
    listWriter.close()

    // 3. metadata.json (TableMetadata, format-version 2). Schema identity:
    // the schema whose field list matches keeps its schema-id; a widened
    // schema (ADD COLUMN) gets a fresh id appended to `schemas`.
    val priorMeta = prior.map(_._2)
    val newVersion = prior.map(_._1 + 1).getOrElse(1)
    val schemaJsonNode = mapper.readTree(icebergSchemaJson(schema))
    val priorSchemas: Seq[com.fasterxml.jackson.databind.JsonNode] =
      priorMeta.map(m => m.get("schemas").elements().asScala.toSeq).getOrElse(Seq.empty)
    def fieldsOf(n: com.fasterxml.jackson.databind.JsonNode): Seq[String] =
      n.get("fields").elements().asScala.map(_.toString).toSeq
    val matching = priorSchemas.find(s => fieldsOf(s) == fieldsOf(schemaJsonNode))
    val schemaId = matching.map(_.get("schema-id").asInt())
      .getOrElse(priorSchemas.map(_.get("schema-id").asInt()).maxOption.map(_ + 1).getOrElse(0))
    ((schemaJsonNode): @unchecked) match {
      case o: ObjectNode => o.put("schema-id", schemaId)
    }
    val allSchemas = if (matching.isDefined) priorSchemas else priorSchemas :+ schemaJsonNode

    // retained prior snapshots (newest keepSnapshots - 1, so the new one fits)
    val priorSnaps: Seq[com.fasterxml.jackson.databind.JsonNode] =
      priorMeta.map(m => m.get("snapshots").elements().asScala.toSeq).getOrElse(Seq.empty)
    val retained = priorSnaps.takeRight(math.max(0, keepSnapshots - 1))
    val pruned = priorSnaps.dropRight(math.max(0, keepSnapshots - 1))
    val parentId = priorMeta.map(_.get("current-snapshot-id").asLong())

    val root = mapper.createObjectNode()
    root.put("format-version", 2)
    root.put("table-uuid",
      priorMeta.map(_.get("table-uuid").asText()).getOrElse(UUID.nameUUIDFromBytes(
        exportDir.toString.getBytes(StandardCharsets.UTF_8)).toString))
    root.put("location", fs.makeQualified(exportDir).toString)
    root.put("last-sequence-number", seq)
    root.put("last-updated-ms", timestampMs)
    root.put("last-column-id", schema.fields.length)
    root.put("current-schema-id", schemaId)
    val schemasArr = root.putArray("schemas")
    allSchemas.foreach(schemasArr.add)
    root.put("default-spec-id", 0)
    val specs = root.putArray("partition-specs")
    val spec0 = specs.addObject()
    spec0.put("spec-id", 0)
    spec0.putArray("fields")
    root.put("last-partition-id", 999) // partition field ids start at 1000; none assigned
    root.put("default-sort-order-id", 0)
    val orders = root.putArray("sort-orders")
    val order0 = orders.addObject()
    order0.put("order-id", 0)
    order0.putArray("fields")
    val props = root.putObject("properties")
    properties.foreach { case (k, v) => props.put(k, v) }
    root.put("current-snapshot-id", snapshotId)
    val refs = root.putObject("refs")
    val mainRef = refs.putObject("main")
    mainRef.put("snapshot-id", snapshotId)
    mainRef.put("type", "branch")
    val snaps = root.putArray("snapshots")
    retained.foreach(snaps.add)
    val s0 = snaps.addObject()
    s0.put("sequence-number", seq)
    s0.put("snapshot-id", snapshotId)
    parentId.foreach(p => s0.put("parent-snapshot-id", p))
    s0.put("timestamp-ms", timestampMs)
    val summary = s0.putObject("summary")
    summary.put("operation", "append")
    summary.put("added-data-files", files.size.toString)
    summary.put("added-records", files.map(_.recordCount).sum.toString)
    s0.put("manifest-list", listPath.toString)
    s0.put("schema-id", schemaId)
    root.putArray("statistics")
    // history logs: append this commit, trim to the retention window
    val priorSnapLog: Seq[com.fasterxml.jackson.databind.JsonNode] =
      priorMeta.flatMap(m => Option(m.get("snapshot-log")))
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    val snapLog = root.putArray("snapshot-log")
    priorSnapLog.takeRight(math.max(0, keepSnapshots - 1)).foreach(snapLog.add)
    val sl = snapLog.addObject()
    sl.put("timestamp-ms", timestampMs)
    sl.put("snapshot-id", snapshotId)
    val priorMetaLog: Seq[com.fasterxml.jackson.databind.JsonNode] =
      priorMeta.flatMap(m => Option(m.get("metadata-log")))
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    val metaLog = root.putArray("metadata-log")
    // keep-2: the retained metadata FILES are v(newVersion-keep+1)..vN, and
    // the log only lists PRIOR files — one fewer than the file window, or
    // the log's oldest entry would name the file pruned below
    priorMetaLog.takeRight(math.max(0, keepSnapshots - 2)).foreach(metaLog.add)
    prior.foreach { case (hint, _) =>
      val ml = metaLog.addObject()
      ml.put("timestamp-ms", timestampMs)
      ml.put("metadata-file", fs.makeQualified(new Path(metaDir, s"v$hint.metadata.json")).toString)
    }

    val metadataPath = new Path(metaDir, s"v$newVersion.metadata.json")
    writeText(fs, metadataPath,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
    writeText(fs, hintPath, newVersion.toString)

    // prune manifests of snapshots that fell out of the history window
    // (manifest lists and manifests are per-snapshot here, never shared)
    pruned.foreach { sn =>
      val lp = new Path(sn.get("manifest-list").asText())
      try {
        if (fs.exists(lp)) {
          readAvro(fs, lp).foreach { mf =>
            val mp = new Path(mf.get("manifest_path").toString)
            if (fs.exists(mp)) fs.delete(mp, false)
          }
          fs.delete(lp, false)
        }
      } catch { case scala.util.control.NonFatal(_) => () } // pruning is best-effort
    }
    // Old metadata.json files beyond the window go too (metadata-log is
    // already trimmed to match). Only the newly-expiring version — plus a
    // small catch-up margin for previously-failed deletes — is probed:
    // scanning from v1 would cost O(total commits) fs.exists calls per
    // commit on a long-lived per-commit exporter.
    val newestExpired = newVersion - keepSnapshots
    (math.max(1, newestExpired - 3) to newestExpired).foreach { v =>
      val p = new Path(metaDir, s"v$v.metadata.json")
      if (fs.exists(p)) fs.delete(p, false)
    }
    metadataPath
  }

  // ------------------------------------------------------------------ read

  private[graft] def readVersionHint(fs: FileSystem, exportDir: Path): String =
    readText(fs, new Path(new Path(exportDir, "metadata"), "version-hint.text")).trim

  /** Follow the Iceberg metadata chain exactly as an external reader does
    * — version-hint → vN.metadata.json → a snapshot's manifest list →
    * manifests → data files (status != DELETED(2), content = data(0)) —
    * and return `(file_path, record_count)` per live data file. Reads the
    * CURRENT snapshot by default; pass `atSnapshotId` to time-travel to
    * any snapshot retained in the export's history window. Used by the
    * correctness gate so the compared read goes THROUGH the export.
    */
  def readDataFiles(
      fs: FileSystem, exportDir: Path, atSnapshotId: Option[Long] = None): Seq[(String, Long)] = {
    val metaDir = new Path(exportDir, "metadata")
    val hint = readVersionHint(fs, exportDir)
    val meta = mapper.readTree(readText(fs, new Path(metaDir, s"v$hint.metadata.json")))
    require(meta.get("format-version").asInt() == 2, "expected format-version 2")
    val currentId = atSnapshotId.getOrElse(meta.get("current-snapshot-id").asLong())
    val snapNode = {
      val it = meta.get("snapshots").elements()
      var found: com.fasterxml.jackson.databind.JsonNode = null
      while (it.hasNext && found == null) {
        val n = it.next()
        if (n.get("snapshot-id").asLong() == currentId) found = n
      }
      require(found != null, s"current-snapshot-id $currentId not in snapshots")
      found
    }
    val manifestPaths = readAvro(fs, new Path(snapNode.get("manifest-list").asText()))
      .filter(r => r.get("content").asInstanceOf[Int] == 0)
      .map(_.get("manifest_path").toString)
    manifestPaths.flatMap { mp =>
      readAvro(fs, new Path(mp)).flatMap { e =>
        val status = e.get("status").asInstanceOf[Int]
        if (status == 2) None
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          if (df.get("content").asInstanceOf[Int] != 0) None
          else Some((df.get("file_path").toString, df.get("record_count").asInstanceOf[Long]))
        }
      }
    }
  }

  private def readAvro(fs: FileSystem, p: Path): Seq[GenericRecord] = {
    val in = fs.open(p)
    val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[GenericRecord]
      while (stream.hasNext) out += stream.next()
      out.result()
    } finally stream.close()
  }

  /** Avro container metadata of one file (for structural assertions). */
  private[graft] def avroMeta(fs: FileSystem, p: Path, key: String): String = {
    val in = fs.open(p)
    val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try new String(stream.getMeta(key), StandardCharsets.UTF_8)
    finally stream.close()
  }

  private def writeText(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readText(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }
}
