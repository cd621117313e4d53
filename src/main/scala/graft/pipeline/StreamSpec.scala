package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import graft.ops.{FieldSelection, FieldSelectionRule}

import scala.jdk.CollectionConverters._

/** Typed stream configuration — the Spark-native equivalent of the
  * reference's single-JSON-document context
  * (`/root/reference/stream-context-serialized-example.json:1-139`,
  * `MicrosoftSynapseLinkPluginStreamContext.scala:21-38`): one document
  * selects source location/entity, run mode (stream vs backfill), sink
  * target, throughput shaping and maintenance cadence.
  */
final case class MaintenanceSettings(
    batchThreshold: Int = 60,                       // CRD beta:353-366
    fileSizeThresholdBytes: Long = 100L * 1024 * 1024,
    snapshotRetentionMs: Long = 6L * 3600 * 1000,   // CRD beta:339-352
    analyzeBatchThreshold: Int = 180,               // CRD beta:367-383
    analyzedColumns: Seq[String] = Seq.empty        // ANALYZE includedColumns (docs/crd.md:142-148)
)

final case class StreamSpec(
    sourcePath: String,
    entityName: String,
    targetLocation: String,
    backfill: Boolean = false,
    backfillBehavior: String = "Overwrite",          // Overwrite | Merge (docs/backfill.md:40-47)
    backfillStartDate: Option[String] = None,
    changeCaptureIntervalSeconds: Int = 300,         // CRD beta:213-215
    changeCaptureJitterVariance: Double = 0.1,       // CRD beta:216-218
    changeCaptureJitterSeed: Long = 0,               // CRD beta:219-221 (0 = derive per stream)
    maxFoldersPerTrigger: Option[Int] = None,        // throughput shaping (CRD beta:401-470)
    maxChunksPerTrigger: Option[Int] = None,         // sub-folder grouping (rowsPerGroup analog, docs/crd.md:36-43)
    retryableFailureMessages: Seq[String] = Seq.empty, // stream failures → exit 2 (StreamFailException convention)
    fieldSelectionRuleName: String = "all",          // all | include | exclude (CRD beta:474-523)
    fieldSelectionFields: Set[String] = Set.empty,
    essentialFields: Set[String] = FieldSelection.DefaultEssentialFields,
    numBuckets: Int = 10,                            // bucket(arcane_merge_key, 10) (docs/crd.md:211)
    keyColumns: Seq[String] = Seq("Id"),
    versionColumn: String = "versionnumber",
    isDeleteColumn: String = "IsDelete",
    maintenance: MaintenanceSettings = MaintenanceSettings(),
    checkpointLocation: Option[String] = None,
    statsdAddress: Option[String] = None,              // A26 observability
    metricTags: Map[String, String] = Map.empty,
    retry: RetryPolicy = RetryPolicy(),                // A27 merge-query retry
    shaper: Option[String] = None,                     // A10: memoryBound | none
    memoryHeadroomFraction: Double = 0.2,
    sortedBy: Seq[String] = Seq.empty,                 // write-time sort order (CRD beta:302-306)
    bloomFilterColumns: Seq[String] = Seq.empty,       // parquetBloomFilterColumns
    format: Option[String] = None,                     // CREATE TABLE format: parquet (default) | orc (CRD beta:294-318)
    isUnifiedSchema: Boolean = false,                  // disable auto schema migration (CRD beta:166-169)
    httpMaxRetries: Int = 3,                           // source listing retry (CRD beta:576-598)
    maxResultsPerPage: Int = 5000,                     // blob-listing page size (CRD beta:576-598)
    httpRetryDelayMs: Long = 1000,                     // httpMinRetryDelay
    httpMaxRetryDelayMs: Long = 30000,                 // httpMaxRetryDelay — backoff growth cap
    maxRowsPerFile: Option[Long] = None,               // sink.maxRowsPerFile
    targetTableProperties: Map[String, String] = Map.empty, // arbitrary table props passthrough
    exportDir: Option[String] = None,                  // re-export symlink manifest after every commit
    icebergExportDir: Option[String] = None,           // re-export Iceberg v2 metadata after every commit
    deltaExportDir: Option[String] = None,             // re-export a Delta Lake _delta_log after every commit
    logShipAddress: Option[String] = None,             // DataDog-shape shipper: udp://host:port | file:/path
    mergeMode: String = "copy-on-write",               // copy-on-write | merge-on-read (Iceberg v2 write.merge.mode)
    maintenanceRun: Boolean = false,                   // one-shot standalone maintenance (TargetMaintenanceProcessor shape)
    // Driver-materialization bounds — each caps how much data a stage may
    // pull onto the driver (or into a BroadcastExchange) before degrading
    // LOUDLY to the distributed path, which stays exact. The defaults are
    // sized for a multi-GB driver; a small-driver deployment lowers them
    // here instead of recompiling.
    deleteBroadcastMaxRows: Long = 2000000L,   // exportDelta: delete-KEY broadcast bound (past it: shuffle position-izing)
    dvDriverDecodeMaxRows: Long = 2000000L,    // Delta read side: summed-DV-cardinality bound for driver decode + broadcast anti join (past it: executor decode + shuffle)
    dedupMaxPushdownIds: Int = 10000,          // indexed near-dup: candidate-id In-filter pushdown bound (past it: lazy plan, no collect)
    // Content dedup: when set, every streamed micro-batch's NON-delete rows
    // are near-dup deduped on this column against a persisted, self-
    // maintained MinHash band index (StreamOps.dedupBatchMaintainingIndex)
    // BEFORE the merge — the daily-crawl steady state wired into the CDC
    // loop. Delete tombstones always pass (a delete must reach the merge
    // regardless of its payload text), and keys already LIVE in the target
    // are exempt (an UPDATE must not be suppressed by its own prior
    // version's bands). An Overwrite/first backfill SEEDS the index from
    // its live rows; the stream then appends each batch's survivors'
    // bands. Both fields go together.
    // LOUD CAVEAT (default layout): the index keeps content history
    // across deletes (bands carry no ids, so tombstones cannot retract
    // them) — a RE-INSERT of a previously deleted key whose text
    // near-dups anything already seen stays suppressed. That is the
    // crawl-dedup contract; for sources that re-insert deleted keys with
    // recycled content, set dedupRetractOnDelete below.
    dedupTextColumn: Option[String] = None,
    dedupIndexLocation: Option[String] = None,
    dedupIndexCompactEvery: Int = 0,           // compact the band index every N stream batches (0 = never)
    // Delete retraction for key-recycling sources: the index stores
    // (_rid, band, key) rows and every batch's delete tombstones record
    // their keys under tombstones/ — probes anti-join retracted ids out,
    // so a deleted key's own content history stops suppressing its
    // re-insert. Costs one string id per stored band row plus the
    // tombstone list; the default (false) keeps the id-less crawl-dedup
    // layout and semantics. Pinned into the index at first init — an
    // existing id-less index cannot retract (init location afresh).
    dedupRetractOnDelete: Boolean = false
) {
  require(Set("copy-on-write", "merge-on-read").contains(mergeMode.toLowerCase),
    s"mergeMode must be copy-on-write or merge-on-read, got '$mergeMode'")
  require(deleteBroadcastMaxRows >= 0L,
    s"deleteBroadcastMaxRows must be >= 0, got $deleteBroadcastMaxRows")
  require(dvDriverDecodeMaxRows >= 0L,
    s"dvDriverDecodeMaxRows must be >= 0, got $dvDriverDecodeMaxRows")
  require(dedupMaxPushdownIds >= 0,
    s"dedupMaxPushdownIds must be >= 0, got $dedupMaxPushdownIds")
  require(dedupTextColumn.isEmpty == dedupIndexLocation.isEmpty,
    "dedupTextColumn and dedupIndexLocation must be set together (content dedup needs both " +
      "the column to sign and the index location to maintain)")
  require(dedupIndexCompactEvery >= 0,
    s"dedupIndexCompactEvery must be >= 0, got $dedupIndexCompactEvery")
  require(!dedupRetractOnDelete || dedupTextColumn.nonEmpty,
    "dedupRetractOnDelete requires content dedup (dedupTextColumn/dedupIndexLocation)")
  // NOTE: the exportDir × merge-on-read incompatibility is validated in
  // CdcPipeline.startStream, NOT here — Main applies the
  // STREAMCONTEXT__MAINTENANCE env override AFTER construction, and a
  // constructor require would reject the documented maintenance-export
  // spec (mergeMode=merge-on-read + exportDir + env-var maintenance mode)
  // before the override could run. Only an actual STREAM is invalid.

  def useMergeOnRead: Boolean = mergeMode.equalsIgnoreCase("merge-on-read")
  def fieldSelectionRule: FieldSelectionRule = fieldSelectionRuleName.toLowerCase match {
    case "include" => FieldSelectionRule.Include(fieldSelectionFields)
    case "exclude" => FieldSelectionRule.Exclude(fieldSelectionFields)
    case _         => FieldSelectionRule.All
  }

  /** Retry policy for source-side metadata operations (changelog read,
    * folder/chunk listing, model.json read) — the reference's blob-listing
    * `httpMaxRetries`/delay knobs. IO-only: transient store failures
    * (IOException in the cause chain) retry with backoff; anything else
    * (malformed changelog, missing model.json, logic errors) propagates on
    * the first throw instead of burning the backoff budget.
    */
  def listingRetry: RetryPolicy =
    RetryPolicy(maxAttempts = math.max(1, httpMaxRetries), baseDelayMs = httpRetryDelayMs,
      maxDelayMs = httpMaxRetryDelayMs, ioOnly = true)
}

object StreamSpec {
  private val mapper = new ObjectMapper()

  /** Parse from JSON (environment-delivered, like the reference's
    * `STREAMCONTEXT__SPEC`). Unknown fields ignored; absent fields default.
    */
  def fromJson(json: String): StreamSpec = {
    val r = mapper.readTree(json)
    def str(f: String, d: String) = if (r.has(f)) r.get(f).asText() else d
    def opt(f: String) = if (r.has(f) && !r.get(f).isNull) Some(r.get(f).asText()) else None
    def int(f: String, d: Int) = if (r.has(f)) r.get(f).asInt(d) else d
    val maint =
      if (!r.has("maintenance")) MaintenanceSettings()
      else {
        val m = r.get("maintenance")
        MaintenanceSettings(
          batchThreshold = if (m.has("batchThreshold")) m.get("batchThreshold").asInt(60) else 60,
          fileSizeThresholdBytes =
            if (m.has("fileSizeThresholdBytes")) m.get("fileSizeThresholdBytes").asLong() else 100L * 1024 * 1024,
          snapshotRetentionMs =
            if (m.has("snapshotRetentionMs")) m.get("snapshotRetentionMs").asLong() else 6L * 3600 * 1000,
          analyzeBatchThreshold =
            if (m.has("analyzeBatchThreshold")) m.get("analyzeBatchThreshold").asInt(180) else 180,
          analyzedColumns =
            if (m.has("analyzedColumns")) m.get("analyzedColumns").elements().asScala.map(_.asText()).toSeq
            else Seq.empty
        )
      }
    StreamSpec(
      sourcePath = opt("sourcePath").getOrElse(sys.error("sourcePath required")),
      entityName = opt("entityName").getOrElse(sys.error("entityName required")),
      targetLocation = opt("targetLocation").getOrElse(sys.error("targetLocation required")),
      backfill = r.has("backfill") && r.get("backfill").asBoolean(false),
      backfillBehavior = str("backfillBehavior", "Overwrite"),
      backfillStartDate = opt("backfillStartDate"),
      changeCaptureIntervalSeconds = int("changeCaptureIntervalSeconds", 300),
      changeCaptureJitterVariance =
        if (r.has("changeCaptureJitterVariance")) r.get("changeCaptureJitterVariance").asDouble(0.1) else 0.1,
      changeCaptureJitterSeed =
        if (r.has("changeCaptureJitterSeed")) r.get("changeCaptureJitterSeed").asLong() else 0L,
      maxFoldersPerTrigger = opt("maxFoldersPerTrigger").map(_.toInt),
      maxChunksPerTrigger = opt("maxChunksPerTrigger").map(_.toInt),
      retryableFailureMessages =
        if (r.has("retryableFailureMessages"))
          r.get("retryableFailureMessages").elements().asScala.map(_.asText()).toSeq
        else Seq.empty,
      fieldSelectionRuleName = str("fieldSelectionRuleName", "all"),
      fieldSelectionFields =
        if (r.has("fieldSelectionFields")) r.get("fieldSelectionFields").elements().asScala.map(_.asText()).toSet
        else Set.empty,
      numBuckets = int("numBuckets", 10),
      keyColumns =
        if (r.has("keyColumns")) r.get("keyColumns").elements().asScala.map(_.asText()).toSeq else Seq("Id"),
      versionColumn = str("versionColumn", "versionnumber"),
      isDeleteColumn = str("isDeleteColumn", "IsDelete"),
      maintenance = maint,
      checkpointLocation = opt("checkpointLocation"),
      statsdAddress = opt("statsdAddress"),
      metricTags =
        if (r.has("metricTags"))
          r.get("metricTags").properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
        else Map.empty,
      retry =
        if (!r.has("retry")) RetryPolicy()
        else {
          val q = r.get("retry")
          RetryPolicy(
            maxAttempts = if (q.has("maxAttempts")) q.get("maxAttempts").asInt(3) else 3,
            baseDelayMs = if (q.has("baseDelayMs")) q.get("baseDelayMs").asLong() else 100L,
            scaleFactor = if (q.has("scaleFactor")) q.get("scaleFactor").asDouble(2.0) else 2.0,
            retryOnMessageContains =
              if (q.has("retryOnMessageContains"))
                q.get("retryOnMessageContains").elements().asScala.map(_.asText()).toSeq
              else Seq.empty,
            mode = if (q.has("mode")) q.get("mode").asText("always") else "always"
          )
        },
      shaper = opt("shaper"),
      memoryHeadroomFraction =
        if (r.has("memoryHeadroomFraction")) r.get("memoryHeadroomFraction").asDouble(0.2) else 0.2,
      sortedBy =
        if (r.has("sortedBy")) r.get("sortedBy").elements().asScala.map(_.asText()).toSeq else Seq.empty,
      format = opt("format"),
      bloomFilterColumns =
        if (r.has("bloomFilterColumns")) r.get("bloomFilterColumns").elements().asScala.map(_.asText()).toSeq
        else Seq.empty,
      isUnifiedSchema = r.has("isUnifiedSchema") && r.get("isUnifiedSchema").asBoolean(false),
      httpMaxRetries = int("httpMaxRetries", 3),
      httpRetryDelayMs = if (r.has("httpRetryDelayMs")) r.get("httpRetryDelayMs").asLong() else 1000L,
      httpMaxRetryDelayMs =
        if (r.has("httpMaxRetryDelayMs")) r.get("httpMaxRetryDelayMs").asLong() else 30000L,
      maxRowsPerFile =
        if (r.has("maxRowsPerFile") && !r.get("maxRowsPerFile").isNull)
          Some(r.get("maxRowsPerFile").asLong()) else None,
      targetTableProperties =
        if (r.has("targetTableProperties"))
          r.get("targetTableProperties").properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap
        else Map.empty,
      maxResultsPerPage = int("maxResultsPerPage", 5000),
      exportDir = opt("exportDir"),
      icebergExportDir = opt("icebergExportDir"),
      deltaExportDir = opt("deltaExportDir"),
      logShipAddress = opt("logShipAddress"),
      mergeMode = str("mergeMode", "copy-on-write"),
      maintenanceRun = r.has("maintenanceRun") && r.get("maintenanceRun").asBoolean(false),
      deleteBroadcastMaxRows =
        if (r.has("deleteBroadcastMaxRows")) r.get("deleteBroadcastMaxRows").asLong() else 2000000L,
      dvDriverDecodeMaxRows =
        if (r.has("dvDriverDecodeMaxRows")) r.get("dvDriverDecodeMaxRows").asLong() else 2000000L,
      dedupMaxPushdownIds = int("dedupMaxPushdownIds", 10000),
      dedupTextColumn = opt("dedupTextColumn"),
      dedupIndexLocation = opt("dedupIndexLocation"),
      dedupIndexCompactEvery = int("dedupIndexCompactEvery", 0),
      dedupRetractOnDelete =
        r.has("dedupRetractOnDelete") && r.get("dedupRetractOnDelete").asBoolean(false)
    )
  }
}
