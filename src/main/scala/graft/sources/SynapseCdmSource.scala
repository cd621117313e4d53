package graft.sources

import graft.cdm.{CdmModel, CdmSchema}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BooleanType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern
import scala.jdk.CollectionConverters._

/** DataSource V2 provider for Microsoft Synapse Link "Incremental CSV"
  * exports — registered as `synapse-cdm` (SURVEY.md §2.A1/A2/A10).
  *
  * Storage layout consumed (reference
  * `/root/reference/src/test/scala/integration/Fixtures.scala:25-72`):
  * {{{
  * <root>/
  *   model.json                       # root copy of the CDM model
  *   Changelog/changelog.info         # name of newest CLOSED batch folder
  *   <yyyy-MM-dd'T'HH.mm.ss'Z'>/      # one folder per change batch
  *     model.json                     # per-batch schema
  *     <entity>/<chunk>.csv           # change rows (names collide ACROSS folders)
  * }}}
  *
  * Semantics:
  *  - The changelog blob is the offset log: `latestOffset` is its content,
  *    so a folder becomes visible only after Synapse closes it
  *    (`Fixtures.scala:66-72` stamps the changelog after uploading data —
  *    that ordering guarantee replaces event-time watermarks, SURVEY.md §2.C).
  *  - An offset is a batch-folder name; names are `yyyy-MM-dd'T'HH.mm.ss'Z'`
  *    so lexicographic order == chronological order.
  *  - A micro-batch (start, end] expands to every closed folder in that
  *    range; each CSV chunk is one `InputPartition` (file-parallel reads).
  *  - Admission control (`SupportsAdmissionControl`): `maxFoldersPerTrigger`
  *    caps folders per micro-batch — the Spark-native form of the
  *    reference's throughput shaper (CRD beta:401-470).
  *
  * The scan emits RAW STRING columns (normalized CDM attribute names, in
  * model.json order) plus `_folder` — typed casts are applied downstream by
  * [[graft.cdm.CsvCast]] inside whole-stage codegen, keeping this reader
  * trivially simple and the cast surface in Catalyst.
  *
  * Options: `path`, `entity`, `startingWatermark` (exclusive folder name),
  * `maxFoldersPerTrigger`, `backfillStartDate` (inclusive folder cutoff for
  * batch reads — SURVEY.md §2.A21).
  */
class SynapseCdmSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "synapse-cdm"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val layout = SynapseCdmLayout(options, spark.sparkContext.hadoopConfiguration)
    // `includeDroppedColumns` (batch/backfill reads): widen the output to
    // the union of scanned folder schemas so a column dropped from the
    // newest model still surfaces its history — see
    // [[SynapseCdmLayout.unionEntitySchema]]. Off by default (and for
    // streams, whose folders always carry the newest schema): a stream's
    // output schema must not depend on pre-watermark history.
    if (options.getBoolean("includeDroppedColumns", false))
      layout.rawSchemaWithMeta(Some(Option(options.get("backfillStartDate"))))
    else layout.rawSchemaWithMeta
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]
  ): Table =
    new SynapseCdmTable(schema, new CaseInsensitiveStringMap(properties))
}

/** Path/layout helpers shared by streaming and batch scans. Serializable so
  * executors can relist on their own if ever needed (they don't today — all
  * listing happens on the driver, partitions carry explicit file paths).
  */
final case class SynapseCdmLayout(root: String, entity: String, changelogPath: String,
    retry: graft.pipeline.RetryPolicy = graft.pipeline.RetryPolicy(),
    maxResultsPerPage: Int = SynapseCdmLayout.DefaultMaxResultsPerPage) {

  @transient private var fsCache: FileSystem = _
  private def fs(conf: Configuration): FileSystem = {
    if (fsCache == null) {
      fsCache =
        if (maxResultsPerPage == SynapseCdmLayout.DefaultMaxResultsPerPage)
          new Path(root).getFileSystem(conf)
        else
          // The reference's blob-API page-size knob (CRD beta:576-598) is a
          // LISTING-RPC property, which Hadoop filesystems read from their
          // own config keys — wire it to the object-store implementations
          // that honor it. Resolved through a PROCESS-WIDE (uri, pageSize)
          // cache, NOT a per-layout newInstance: inferSchema, each Batch
          // and each MicroBatchStream build their own layout, so uncached
          // instances would leak connection pools/threads across stream
          // restarts in a long-lived session.
          SynapseCdmLayout.pagedFs(new Path(root).toUri, conf, maxResultsPerPage)
    }
    fsCache
  }

  /** Every metadata round trip (changelog read, folder/chunk listing,
    * model.json read) runs under the listing retry policy — the reference's
    * blob-API `httpMaxRetries`/delay knobs (CRD beta:576-598). A flaky
    * store's transient exception is retried with backoff in place; the
    * final attempt's failure propagates to the poll (and from there to the
    * exit-code-2 path). Data-path reads are covered separately by Spark
    * task retries.
    */
  private def listing[T](body: => T): T = graft.pipeline.Retry(retry)(body)

  /** Latest closed batch folder per the changelog blob; None before the
    * first batch closes.
    */
  def changelogValue(conf: Configuration): Option[String] = listing {
    val p = new Path(root, changelogPath)
    val f = fs(conf)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** Batch folders with `start < name <= end` in ascending (chronological)
    * order. When both bounds are real folder names spanning at most
    * [[SynapseCdmLayout.MaxBoundedListingDays]] days, the listing is bounded
    * to per-day `yyyy-MM-ddT*` glob prefixes — on object stores these become
    * prefix listings, so a steady-state poll (watermark near head) costs
    * O(folders-per-day), not O(all folders ever exported). Falls back to the
    * full root scan for unbounded reads (backfill, first poll).
    */
  def foldersInRange(conf: Configuration, startExclusive: String, endInclusive: String): Seq[String] = listing {
    val f = fs(conf)
    val bounded = SynapseCdmLayout.FolderName.matcher(startExclusive).matches() &&
      SynapseCdmLayout.FolderName.matcher(endInclusive).matches()
    val names: Seq[String] =
      if (bounded) {
        val startDay = java.time.LocalDate.parse(startExclusive.take(10))
        val endDay = java.time.LocalDate.parse(endInclusive.take(10))
        val span = java.time.temporal.ChronoUnit.DAYS.between(startDay, endDay)
        if (span >= 0 && span <= SynapseCdmLayout.MaxBoundedListingDays) {
          Iterator.iterate(startDay)(_.plusDays(1)).takeWhile(!_.isAfter(endDay))
            .flatMap { d =>
              Option(f.globStatus(new Path(root, s"${d}T*"))).iterator.flatten
                .filter(_.isDirectory).map(_.getPath.getName)
            }
            .toSeq
        } else listAll(f)
      } else listAll(f)
    names
      .filter(SynapseCdmLayout.FolderName.matcher(_).matches())
      .filter(n => n > startExclusive && n <= endInclusive)
      .sorted
  }

  /** Full root listing, STREAMED: `listStatusIterator` pages through the
    * directory (a RemoteIterator — object-store implementations fetch it
    * in listing-API pages, sized by `maxResultsPerPage` via the fs config
    * keys set in [[fs]]), so driver memory holds the iterator's current
    * page plus the MATCHING folder names — never every directory entry of
    * a years-deep export root at once.
    */
  private def listAll(f: FileSystem): Seq[String] = {
    val it = f.listStatusIterator(new Path(root))
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      if (st.isDirectory) out += st.getPath.getName
    }
    out.result()
  }

  /** CSV chunks of one folder for our entity — folder-qualified paths
    * (chunk names recur across folders; SURVEY.md §7 hard-part 5).
    */
  // Chunk listings are fetched on two paths per trigger (admission
  // budgeting in latestOffset, then partition planning) — without a cache
  // every admitted folder costs double the metadata RPCs. Closed folders
  // (everything at or below the changelog value — the only folders ever
  // listed) are IMMUTABLE, so a small bounded memo is safe; LRU-bounded so
  // a months-deep backfill cannot grow driver state with the backlog.
  @transient private lazy val chunkCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Seq[(String, Long)]](64, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, Seq[(String, Long)]]): Boolean =
          size() > 64
      })

  def chunkFiles(conf: Configuration, folder: String): Seq[(String, Long)] = {
    val cached = chunkCache.get(folder)
    if (cached != null) cached
    else {
      val fresh = listing {
        val d = new Path(new Path(root, folder), entity)
        val f = fs(conf)
        if (!f.exists(d)) Seq.empty
        else
          f.listStatus(d)
            .filter(st => st.isFile && st.getPath.getName.endsWith(".csv"))
            .map(st => (st.getPath.toString, st.getLen))
            .sortBy(_._1)
            .toSeq
      }
      // empty listings are NOT cached: an in-flight folder (changelog
      // stamped before its files became visible to this lister) must be
      // re-listed next trigger, not pinned empty
      if (fresh.nonEmpty) chunkCache.put(folder, fresh)
      fresh
    }
  }

  /** Entity schema from a model.json: the NEWEST (changelog) folder's copy
    * when present — the authoritative current schema — else the root copy.
    * This is the UNIFIED output schema of the scan; positional CSV parsing
    * inside each folder follows that folder's OWN model.json
    * ([[folderCsvCols]]).
    */
  def entitySchema(conf: Configuration, folder: Option[String]): StructType = listing {
    val f = fs(conf)
    val candidates = folder.map(fo => new Path(new Path(root, fo), "model.json")).toSeq :+
      new Path(root, "model.json")
    val p = candidates.find(f.exists).getOrElse(
      throw new IllegalArgumentException(s"no model.json found under $root"))
    val in = f.open(p)
    val json = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    CdmSchema.forEntity(CdmModel.parse(json), entity)
  }

  // Per-folder model.json entity schemas (typed, normalized names, in that
  // folder's CSV order). Closed folders are immutable, so the memo is
  // safe; LRU-bounded like chunkCache so a months-deep backfill cannot
  // grow driver state with the backlog. ABSENCE is NOT cached — the same
  // policy as chunkFiles' empty listings: if a just-closed folder's
  // model.json lagged listing visibility on an eventually-consistent
  // store, pinning None would silently parse that folder under the newest
  // schema forever (the exact misalignment class per-folder parsing
  // exists to prevent); an uncached miss is retried next trigger.
  @transient private lazy val folderSchemaCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, StructType](64, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[String, StructType]): Boolean =
          size() > 256
      })

  /** Typed entity schema of one folder per ITS OWN model.json; `None` when
    * the folder has no model.json or doesn't carry the entity.
    */
  def folderEntitySchema(conf: Configuration, folder: String): Option[StructType] = {
    val cached = folderSchemaCache.get(folder)
    if (cached != null) Some(cached)
    else {
      val fresh: Option[StructType] = listing {
        val p = new Path(new Path(root, folder), "model.json")
        val f = fs(conf)
        if (!f.exists(p)) None
        else {
          val in = f.open(p)
          val json = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
          CdmModel.parse(json).entity(entity).map(CdmSchema.forEntity)
        }
      }
      fresh.foreach(folderSchemaCache.put(folder, _))
      fresh
    }
  }

  /** CSV column order of one folder per ITS OWN model.json — the reference
    * groups rows by each batch folder's schema
    * (`/root/reference/docs/backfill.md:8-12`), so a historical folder
    * written before a column reorder / mid-schema insert parses under its
    * contemporary layout, not the newest one. `None` when the folder has no
    * model.json or doesn't carry the entity; the caller falls back to the
    * unified newest-model order.
    */
  def folderCsvCols(conf: Configuration, folder: String): Option[Array[String]] =
    folderEntitySchema(conf, folder).map(_.fieldNames)

  /** Unified BACKFILL schema (`docs/backfill.md:14-19` staging-vs-target
    * parity): the NEWEST model's fields — the authoritative current schema
    * — plus every column that appears in a scanned folder's own model.json
    * but was DROPPED from the newest model, appended in first-seen
    * (chronological) order with its contemporary type and marked with
    * [[SynapseCdmLayout.DroppedColumnMetadataKey]]. A years-deep backfill
    * of an entity that dropped a column thus keeps that column's history
    * (old rows carry values, new-schema rows read NULL) instead of
    * silently narrowing the scan. Cost: one cached model.json read per
    * folder in the range — the same reads partition planning performs —
    * bounded by folder count, never by data.
    */
  def unionEntitySchema(conf: Configuration, backfillStartDate: Option[String]): StructType = {
    // ONE changelog read serves both the newest-model choice and the range
    // end — two reads would race a concurrent changelog advance (the new
    // head's schema would then be mistaken for a historical one)
    val head = changelogValue(conf)
    val newest = entitySchema(conf, head)
    val start = backfillStartDate.map(SynapseCdmLayout.decrementLexically).getOrElse("")
    val end = head.getOrElse("￿")
    val have = scala.collection.mutable.Set.from(newest.fieldNames)
    val dropped = Seq.newBuilder[StructField]
    foldersInRange(conf, start, end).foreach { folder =>
      folderEntitySchema(conf, folder).foreach(_.fields.foreach { f =>
        if (have.add(f.name))
          dropped += f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putBoolean(SynapseCdmLayout.DroppedColumnMetadataKey, true).build())
      })
    }
    StructType(newest.fields ++ dropped.result())
  }

  def rawSchemaWithMeta: StructType = rawSchemaWithMeta(None)

  def rawSchemaWithMeta(unionBackfillStart: Option[Option[String]]): StructType = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val typed = unionBackfillStart match {
      case Some(start) => unionEntitySchema(conf, start)
      case None        => entitySchema(conf, changelogValue(conf))
    }
    // _chunk_idx/_chunk_last carry per-chunk resume metadata so the
    // pipeline can commit a watermark that encodes PARTIAL folder progress
    // ("folder#chunksDone") instead of overshooting to the folder name
    // while chunks remain unread (a checkpoint-less restart from such an
    // overshot watermark would silently skip them).
    StructType(CdmSchema.rawStringSchema(typed).fields ++ Seq(
      StructField("_folder", StringType, nullable = false),
      StructField("_chunk_idx", IntegerType, nullable = false),
      StructField("_chunk_last", BooleanType, nullable = false)))
  }
}

object SynapseCdmLayout {
  private[sources] val FolderName = Pattern.compile("\\d{4}-\\d{2}-\\d{2}T\\d{2}\\.\\d{2}\\.\\d{2}Z")

  /** Widest start→end day span served by per-day prefix globs; beyond this
    * (a months-deep backlog) one full root listing is cheaper than
    * per-day round trips.
    */
  val MaxBoundedListingDays = 62L

  /** Default listing page size; at the default the shared cached
    * FileSystem is used unchanged (no per-layout fs instance).
    */
  val DefaultMaxResultsPerPage = 5000

  /** StructField metadata marking a union-schema column that the NEWEST
    * model no longer carries ([[SynapseCdmLayout.unionEntitySchema]]) —
    * folders without their own model.json parse under the newest layout,
    * which excludes these.
    */
  val DroppedColumnMetadataKey = "cdm.droppedColumn"

  /** Largest string strictly below `s` with the same sort position — makes
    * the inclusive backfillStartDate cutoff work with the exclusive-start
    * range listing.
    */
  def decrementLexically(s: String): String =
    if (s.isEmpty) s else s.init + (s.last - 1).toChar + "￿"

  /** Process-wide FileSystem instances for non-default listing page sizes,
    * keyed by (store URI, pageSize) — Hadoop's own FileSystem.CACHE keys
    * by (uri, ugi) only, so a page-size-carrying conf needs its own
    * instance, but ONE per distinct (store, size) for the JVM's lifetime
    * (like Hadoop's cache, closed at exit), not one per layout: layouts
    * are created per scan/stream and would otherwise leak object-store
    * client pools on every stream restart.
    */
  private val pagedFsCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), FileSystem]()

  private[sources] def pagedFs(uri: java.net.URI, conf: Configuration, pageSize: Int): FileSystem =
    pagedFsCache.computeIfAbsent((uri.getScheme + "://" + Option(uri.getAuthority).getOrElse(""),
      pageSize), { _ =>
      val c = new Configuration(conf)
      c.setInt("fs.azure.list.max.results", pageSize) // ABFS
      c.setInt("fs.s3a.paging.maximum", pageSize)     // S3A
      FileSystem.newInstance(uri, c)
    })

  def apply(options: CaseInsensitiveStringMap, conf: Configuration): SynapseCdmLayout = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("synapse-cdm requires option 'path'"))
    val entity = Option(options.get("entity")).getOrElse(
      throw new IllegalArgumentException("synapse-cdm requires option 'entity'"))
    val retry = graft.pipeline.RetryPolicy(
      maxAttempts = math.max(1, options.getInt("httpMaxRetries", 3)),
      baseDelayMs = options.getLong("httpRetryDelayMs", 1000L),
      ioOnly = true)
    SynapseCdmLayout(root, entity,
      Option(options.get("changelogPath")).getOrElse("Changelog/changelog.info"), retry,
      maxResultsPerPage = math.max(1,
        options.getInt("maxResultsPerPage", SynapseCdmLayout.DefaultMaxResultsPerPage)))
  }
}

class SynapseCdmTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"synapse-cdm:${options.get("path")}#${options.get("entity")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(opts.asCaseSensitiveMap())
    new SynapseCdmScanBuilder(tableSchema, new CaseInsensitiveStringMap(merged))
  }
}

class SynapseCdmScanBuilder(schema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  // Column pruning pushed into the reader: unread CSV fields are parsed
  // positionally but never materialized into rows (the reference's
  // `isServerSide` field selection — CRD beta:483-486).
  private var required: StructType = schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (requiredSchema.nonEmpty) required = requiredSchema
  override def build(): Scan = new SynapseCdmScan(schema, required, options)
}

class SynapseCdmScan(fullSchema: StructType, required: StructType, options: CaseInsensitiveStringMap)
    extends Scan {
  override def readSchema(): StructType = required
  override def description(): String = "SynapseCdmScan"

  override def toBatch: Batch = new Batch {
    private val conf = SparkSession.active.sparkContext.hadoopConfiguration
    private val layout = SynapseCdmLayout(options, conf)
    override def planInputPartitions(): Array[InputPartition] = {
      val start = Option(options.get("backfillStartDate"))
        .map(SynapseCdmLayout.decrementLexically).getOrElse("")
      val end = layout.changelogValue(conf).getOrElse("￿")
      val folders = layout.foldersInRange(conf, start, end)
      SynapseCdmScanHelper.partitions(layout, conf, folders.map(f => (f, 0, -1)), fullSchema, required)
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new CsvChunkReaderFactory(new SerializableHadoopConf(conf))
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynapseCdmMicroBatchStream(fullSchema, required, options)
}

/** Offset = last processed batch-folder name (the reference's
  * `SynapseWatermark.version`, SURVEY.md §2.A15), optionally with
  * sub-folder progress: `chunksDone >= 0` means only the first `chunksDone`
  * CSV chunks of `folder` are processed (admission split a folder across
  * micro-batches); -1 means the folder is complete. Empty string = nothing
  * processed yet. JSON form `folder[#chunksDone]` stays readable in
  * checkpoints and parses old folder-only offsets unchanged.
  */
case class ChangelogOffset(folder: String, chunksDone: Int = -1) extends Offset {
  override def json(): String = if (chunksDone < 0) folder else s"$folder#$chunksDone"
}

object ChangelogOffset {
  def parse(s: String): ChangelogOffset = s.lastIndexOf('#') match {
    case -1 => ChangelogOffset(s)
    case i  => ChangelogOffset(s.take(i), s.drop(i + 1).toInt)
  }
}

class SynapseCdmMicroBatchStream(fullSchema: StructType, required: StructType, options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val conf = SparkSession.active.sparkContext.hadoopConfiguration
  private val layout = SynapseCdmLayout(options, conf)
  private val startingWatermark = Option(options.get("startingWatermark")).getOrElse("")
  private val maxFoldersPerTrigger = Option(options.get("maxFoldersPerTrigger")).map(_.toInt)
  private val maxChunksPerTrigger = Option(options.get("maxChunksPerTrigger")).map(_.toInt)
  private val memoryBound = Option(options.get("shaper")).exists(_.equalsIgnoreCase("memoryBound"))
  private val memoryHeadroomFraction =
    Option(options.get("memoryHeadroomFraction")).map(_.toDouble).getOrElse(0.2)
  // CSV text expands ~4x when parsed into row objects — the same role as the
  // reference's objectTypeSizeEstimate/fallbackStringTypeSizeEstimate knobs
  // (CRD beta:438-470).
  private val bytesExpansionFactor =
    Option(options.get("bytesExpansionFactor")).map(_.toDouble).getOrElse(4.0)

  // parse, not wrap: a committed watermark can carry sub-folder progress
  // ("folder#chunksDone") — a restart from it must resume the partial
  // folder's remaining chunks, not skip them
  override def initialOffset(): Offset = ChangelogOffset.parse(startingWatermark)
  override def deserializeOffset(json: String): Offset = ChangelogOffset.parse(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def latestOffset(): Offset =
    layout.changelogValue(conf).map(ChangelogOffset(_))
      .getOrElse(ChangelogOffset.parse(startingWatermark))

  override def getDefaultReadLimit: ReadLimit =
    maxFoldersPerTrigger.map(n => ReadLimit.maxFiles(n)).getOrElse(ReadLimit.allAvailable())

  /** Admission control — the reference's throughput-shaper surface
    * (CRD beta:401-470) in Spark's `SupportsAdmissionControl` form:
    *  - static shaper: `maxFoldersPerTrigger` → `ReadLimit.maxFiles`;
    *  - sub-folder grouping: `maxChunksPerTrigger` caps CSV chunks per
    *    micro-batch (the `rowsPerGroup` analog — Synapse pre-chunks rows, so
    *    the chunk is the natural grouping unit, `docs/crd.md:36-43`);
    *  - memory-bound shaper (`shaper=memoryBound`): admit chunks until the
    *    estimated in-memory batch size (CSV bytes × expansion factor)
    *    exceeds `memoryHeadroomFraction` of current free heap — the
    *    Spark-native analog of the reference's free-heap sigmoid cost model.
    * Chunk-level budgets SPLIT oversized folders across micro-batches
    * (offset records sub-folder progress), so one huge folder can't blow
    * the memory budget; at least one chunk is always admitted so the
    * stream can't stall.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ChangelogOffset]
    val newest = layout.changelogValue(conf).getOrElse(s.folder)
    val newFolders = layout.foldersInRange(conf, s.folder, newest)
    // Candidates: the partially-read start folder's remaining chunks first,
    // then each newer closed folder from chunk 0.
    val candidates: Seq[(String, Int)] =
      (if (s.chunksDone >= 0) Seq(s.folder -> s.chunksDone) else Seq.empty) ++ newFolders.map(_ -> 0)
    val staticCapped = limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        candidates.take(math.max(1, mf.maxFiles()))
      case _ => candidates
    }
    if (staticCapped.isEmpty) return s

    val chunkBudget = maxChunksPerTrigger.getOrElse(Int.MaxValue)
    val byteBudget =
      if (!memoryBound) Long.MaxValue
      else {
        val rt = Runtime.getRuntime
        val freeHeap = rt.maxMemory() - (rt.totalMemory() - rt.freeMemory())
        (freeHeap * memoryHeadroomFraction).toLong
      }
    if (chunkBudget == Int.MaxValue && byteBudget == Long.MaxValue) {
      // No sub-folder shaping: whole folders through (no chunk listing RPCs).
      return ChangelogOffset(staticCapped.last._1)
    }

    var usedBytes = 0L
    var usedChunks = 0
    var endFolder = s.folder
    var endDone = s.chunksDone
    var stop = false
    staticCapped.iterator.takeWhile(_ => !stop).foreach { case (folder, skip) =>
      val files = layout.chunkFiles(conf, folder)
      if (files.size <= skip) { endFolder = folder; endDone = -1 } // empty folder closes
      else {
        var i = skip
        while (i < files.size && !stop) {
          val cost = (files(i)._2 * bytesExpansionFactor).toLong
          if (usedChunks > 0 && (usedBytes + cost > byteBudget || usedChunks + 1 > chunkBudget)) stop = true
          else {
            usedBytes += cost
            usedChunks += 1
            endFolder = folder
            endDone = if (i == files.size - 1) -1 else i + 1
            i += 1
          }
        }
      }
    }
    val end = ChangelogOffset(endFolder, endDone)
    if (end == s) s else end
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ChangelogOffset]
    val e = end.asInstanceOf[ChangelogOffset]
    // (folder, fromChunk, untilChunk); untilChunk -1 = through end of folder.
    val slices: Seq[(String, Int, Int)] =
      if (s.folder == e.folder) {
        if (e.chunksDone == s.chunksDone) Seq.empty
        else Seq((s.folder, math.max(s.chunksDone, 0), e.chunksDone))
      } else {
        val mids = layout.foldersInRange(conf, s.folder, e.folder) // (s, e]
        val startSlice = if (s.chunksDone >= 0) Seq((s.folder, s.chunksDone, -1)) else Seq.empty
        startSlice ++ mids.map(f => if (f == e.folder) (f, 0, e.chunksDone) else (f, 0, -1))
      }
    SynapseCdmScanHelper.partitions(layout, conf, slices, fullSchema, required)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CsvChunkReaderFactory(new SerializableHadoopConf(conf))
}

object SynapseCdmScanHelper {
  /** One InputPartition per CSV chunk in the given folder slices
    * (`(folder, fromChunk, untilChunk)`, until -1 = rest of folder; chunk
    * order is the sorted file listing, stable because closed folders are
    * immutable).
    *
    * The positional projection is computed PER FOLDER from that folder's
    * own model.json (the reference groups rows by each batch's schema,
    * `/root/reference/docs/backfill.md:8-12`): columns are matched into the
    * unified output schema BY NORMALIZED NAME, so a historical folder whose
    * contemporary model.json reorders columns — or lacks a column added
    * later — parses value-correct (missing columns read NULL). Folders
    * without their own model.json fall back to the newest-model order.
    */
  private val MetaCols = Set("_folder", "_chunk_idx", "_chunk_last")

  /** Output column has no source column in this folder's schema → NULL. */
  private[sources] val MissingCol = Int.MinValue

  def partitions(
      layout: SynapseCdmLayout,
      conf: Configuration,
      slices: Seq[(String, Int, Int)],
      fullSchema: StructType,
      required: StructType
  ): Array[InputPartition] = {
    // Fallback CSV order for folders WITHOUT their own model.json = the
    // NEWEST model's columns only: union-schema columns marked dropped
    // ([[SynapseCdmLayout.DroppedColumnMetadataKey]]) exist in historical
    // folders' schemas, never in a newest-layout CSV, so including them in
    // the fallback would misalign every column after the drop point.
    val csvCols = fullSchema.fields
      .filterNot(f => MetaCols.contains(f.name))
      .filterNot(f => f.metadata.contains(SynapseCdmLayout.DroppedColumnMetadataKey))
      .map(_.name)
    def projectionFor(cols: Array[String]): Array[Int] = required.fieldNames.map {
      case "_folder"     => -1
      case "_chunk_idx"  => -2
      case "_chunk_last" => -3
      case n             => val i = cols.indexOf(n); if (i < 0) MissingCol else i
    }
    val newestProj = projectionFor(csvCols)
    slices.flatMap { case (folder, from, until) =>
      val folderCols = layout.folderCsvCols(conf, folder).getOrElse(csvCols)
      val (proj, nCols) =
        if (java.util.Arrays.equals(
            folderCols.asInstanceOf[Array[AnyRef]], csvCols.asInstanceOf[Array[AnyRef]]))
          (newestProj, csvCols.length)
        else (projectionFor(folderCols), folderCols.length)
      val files = layout.chunkFiles(conf, folder)
      val sliced = if (until < 0) files.zipWithIndex.drop(from)
        else files.zipWithIndex.slice(from, until)
      sliced.map { case ((path, _), idx) =>
        CsvChunkPartition(path, folder, nCols, proj,
          chunkIdx = idx, lastInFolder = idx == files.size - 1)
      }
    }.toArray
  }
}

/** `projection(i)` = CSV column index (in THIS folder's schema) feeding
  * output column i; -1 = `_folder`, -2 = `_chunk_idx`, -3 = `_chunk_last`,
  * [[SynapseCdmScanHelper.MissingCol]] = column absent from this folder's
  * schema → NULL. `numCsvCols` is the folder's own column count.
  */
final case class CsvChunkPartition(
    path: String,
    folder: String,
    numCsvCols: Int,
    projection: Array[Int],
    chunkIdx: Int,
    lastInFolder: Boolean
) extends InputPartition

/** Serializable carrier shipping the DRIVER's Hadoop configuration to
  * executor-side chunk readers, so filesystem credentials configured on the
  * session (fs.azure.*, fs.s3a.* — the reference's native ABFS habitat,
  * `/root/reference/dev.env.example:13-19`) apply wherever the partition is
  * read. Uses Hadoop's own Writable serialization (Spark's equivalent
  * helper is private[spark]).
  */
final class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

class CsvChunkReaderFactory(conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CsvChunkPartition]
    new PartitionReader[InternalRow] {
      private val path = new Path(p.path)
      private val fs = path.getFileSystem(conf.value)
      // Stream the chunk through the Reader-based parser: constant memory
      // regardless of chunk size (no whole-blob String materialization).
      private val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(path), StandardCharsets.UTF_8), 1 << 16)
      private val it = CsvRecordParser.parse(reader, p.numCsvCols)
      private val folderUtf8 = UTF8String.fromString(p.folder)
      private var current: InternalRow = _

      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          val rec = it.next()
          val vals = new Array[Any](p.projection.length)
          var i = 0
          while (i < p.projection.length) {
            val src = p.projection(i)
            vals(i) =
              if (src == -1) folderUtf8
              else if (src == -2) p.chunkIdx
              else if (src == -3) p.lastInFolder
              else if (src >= 0 && src < rec.length && rec(src) != null)
                UTF8String.fromString(rec(src)) // src < 0 here = MissingCol → NULL
              else null
            i += 1
          }
          current = new GenericInternalRow(vals)
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = reader.close()
    }
  }
}
