package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over event streams: event-time windowed
  * aggregation with watermarks (tumbling / sliding / session) and custom
  * keyed state via `flatMapGroupsWithState`.
  *
  * The reference handles late data structurally (Synapse only advances
  * `changelog.info` once a folder is closed — SURVEY.md §2.C), so it has no
  * event-time windows; these operators extend the engine to generic event
  * streams (the `events` testdata table shape) the Spark-native way:
  * `readStream → withWatermark → groupBy(window(...)) → writeStream`.
  *
  * The window/session/funnel operators work identically on batch
  * DataFrames (Spark's unified semantics) — the batch specs assert
  * values, the streaming specs assert incremental emission. The dedup
  * operators ([[dedupStream]], [[nearDedupStream]]) are STREAMING-ONLY:
  * `dropDuplicatesWithinWatermark` rejects batch frames by design — the
  * batch counterparts are [[graft.ext.Dedup.exact]] and
  * [[graft.ext.Dedup.nearDuplicatePairs]].
  */
object StreamOps {

  /** Tumbling or sliding event-time aggregation. Watermark bounds state: at
    * 100 TB/day the state store holds only windows newer than the delay.
    */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowDuration: String,
      slideDuration: Option[String] = None,
      keys: Seq[Column] = Seq.empty,
      aggs: Seq[Column]
  ): DataFrame = {
    val win = slideDuration match {
      case Some(slide) => window(col(tsCol), windowDuration, slide)
      case None        => window(col(tsCol), windowDuration)
    }
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(win +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Streaming exact dedup on the normalized-text fingerprint: keeps the
    * FIRST occurrence per fingerprint, dropping later duplicates that
    * arrive within the watermark horizon
    * (`dropDuplicatesWithinWatermark`) — the streaming counterpart of
    * [[graft.ext.Dedup.exact]] for continuous corpus ingestion. Watermark
    * bounds the dedup state store: at 100 TB/day the state holds only
    * fingerprints newer than the delay, instead of growing without bound
    * the way plain `dropDuplicates` state would.
    */
  def dedupStream(
      docs: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      textCol: String = "text"
  ): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      // NULL text never dedups (same contract as Dedup.exact): a NULL
      // fingerprint would collapse every null-text row in the watermark
      // window into one survivor
      .withColumn("_fp", coalesce(
        graft.ext.TextAnalysis.fingerprint(col(textCol)),
        concat(lit("\u0000null:"), expr("uuid()"))))
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")

  /** Streaming NEAR-duplicate dedup via MinHash banding — the streaming
    * counterpart of [[graft.ext.Dedup.nearDuplicatePairs]]'s CANDIDATE
    * stage for continuous corpus ingestion: a document is suppressed when
    * ANY of its LSH band keys was already seen inside the watermark
    * horizon, so a paraphrased late duplicate is dropped, not just a
    * byte-identical one.
    *
    * SEMANTICS — candidate collision IS the decision. Batch banding only
    * generates candidates and then verifies exact Jaccard ≥ threshold
    * (Dedup.scala); a stream cannot re-read the earlier document, so
    * here a band collision suppresses directly. The effective behavior
    * is probabilistic in the similarity J: P(suppress) = 1-(1-J^r)^b
    * with r = numHashes/numBands rows per band. The defaults
    * (128 hashes, 16 bands → r = 8) give ≈ 99.96% suppression at
    * J = 0.9, ≈ 6% false-suppression at J = 0.5, ≈ 0.02% at J = 0.3 —
    * tune toward fewer bands (longer rows) for stricter matching, more
    * bands for higher paraphrase recall. Workloads needing an exact
    * verified threshold should micro-batch through the batch operator
    * instead.
    *
    * Two chained stateful stages, both watermark-bounded:
    *   1. explode each doc into its `numBands` band keys and
    *      `dropDuplicatesWithinWatermark` on the band key — first
    *      occurrence of a band wins; a near-dup's shared bands are
    *      swallowed here. State = band keys newer than the delay.
    *   2. re-aggregate band survivors per (doc, event-time window): a doc
    *      is emitted iff ALL its band rows survived stage 1 — i.e. no
    *      band collided with an earlier doc. Emission happens when the
    *      watermark closes the doc's window (latency = watermark delay,
    *      the price of an exact all-bands decision in append mode).
    *
    * NULL/empty text never near-dups anything: such rows get one unique
    * synthetic band (same contract as [[dedupStream]] /
    * [[graft.ext.Dedup.exact]]) and pass through. Near-dups arriving in
    * the SAME micro-batch: one of the two is suppressed (stage 1 keeps
    * one row per band; intra-batch order is not defined).
    *
    * At 100 TB/day both state stores are bounded: stage 1 holds
    * numBands keys per doc inside the horizon, stage 2 one count per
    * in-flight doc window; both shuffle on high-cardinality keys.
    */
  def nearDedupStream(
      docs: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleSize: Int = 3,
      numHashes: Int = 128,
      numBands: Int = 16
  ): DataFrame =
    emitIfAllBandsSurvive(
      bandedDocs(docs, tsCol, watermarkDelay, idCol, textCol, shingleSize, numHashes, numBands)
        .dropDuplicatesWithinWatermark("_b"),
      tsCol, idCol, docs.columns.toSeq)

  /** Shared banding stage of the streaming dedup family: watermark, one
    * exploded row per (doc, LSH band key), `_expected` = band count.
    * NULL/empty text gets ONE synthetic band — `band = -1` (real bands
    * are ≥ 0, so it can never collide with a corpus or neighbor band)
    * keyed by a DETERMINISTIC per-id hash: distinct empty docs stay
    * distinct, while a REDELIVERED copy of the same row (at-least-once
    * sources) reproduces the same band and collapses in the downstream
    * dedup instead of inflating the band count and suppressing the doc —
    * a per-row `uuid()` here would lose every redelivered empty doc.
    */
  private def bandedDocs(
      docs: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      numHashes: Int,
      numBands: Int
  ): DataFrame = {
    graft.sql.GraftExtensions.ensureRegistered(docs.sparkSession)
    val sig = call_function("minhash_sig",
      graft.ext.Dedup.wordShingles(col(textCol), shingleSize), lit(numHashes), lit(42L))
    docs
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("_bands",
        when(coalesce(length(trim(col(textCol))), lit(0)) === 0,
          array(struct(lit(-1).as("band"),
            xxhash64(concat(lit("\u0000null:"), col(idCol).cast("string"))).as("key"))))
          .otherwise(graft.ext.Dedup.lshBandKeys(sig, numHashes, numBands)))
      .withColumn("_expected", size(col("_bands")))
      .withColumn("_b", explode(col("_bands")))
      .drop("_bands")
  }

  /** Shared emission stage: a doc surfaces iff ALL its band rows reached
    * this point (none were swallowed by the dedup/anti-join step in
    * between); emission at window close, original column set restored.
    */
  private def emitIfAllBandsSurvive(
      banded: DataFrame, tsCol: String, idCol: String, cols: Seq[String]): DataFrame = {
    val carried = cols.filterNot(_ == idCol)
    val aggs = Seq(count(lit(1)).as("_survived"), first(col("_expected")).as("_exp")) ++
      carried.map(c => first(col(c)).as(c))
    banded
      .groupBy(window(col(tsCol), "1 second"), col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .where(col("_survived") === col("_exp"))
      .select(cols.map(col): _*)
  }

  /** The band-key index a [[dedupStreamAgainstCorpus]] caller
    * materializes ONCE from the stored corpus (and refreshes on corpus
    * append): one row per (band struct) — compact (numBands longs per
    * corpus doc, distinct-ed), so a 100 TB corpus indexes to a
    * band-key table a few thousandths of its size. Batch job; persist
    * the result where the stream can read it.
    */
  def corpusBandIndex(
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleSize: Int = 3,
      numHashes: Int = 128,
      numBands: Int = 16
  ): DataFrame =
    graft.ext.Dedup
      .minHashLsh(corpus, idCol, textCol, shingleSize, numHashes, numBands)
      .select(explode(col("bands")).as("_b"))
      .distinct()

  // -------------------------------- maintained persistent band index

  private val indexMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val bandSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.LongType)))

  // id-carrying layout (storeIds indexes): each band row also names the
  // document it came from — "_rid" as a STRING (merge keys are strings,
  // doc ids longs — one universal type; underscore-prefixed so it can
  // never collide with a caller's id column inside the probe join) — and
  // the EPOCH it was indexed in ("_seq" = the stream batch id; -1 for
  // seed/corpus appends, which predate every stream batch). A tombstone
  // retracts only rows with `_seq < tombstone._seq`: the id's PRE-DELETE
  // epochs stop suppressing, while a later re-insert of the same id
  // indexes under a higher _seq and suppresses normally — the exact
  // sequence-number semantics of the snapshot table's equality deletes,
  // applied to band rows.
  private val bandSchemaWithIds = org.apache.spark.sql.types.StructType(
    Seq(org.apache.spark.sql.types.StructField("_rid", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_seq", org.apache.spark.sql.types.LongType)) ++
      bandSchema.fields.toSeq)

  private val tombstoneSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("_rid", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("_seq", org.apache.spark.sql.types.LongType)))

  private def indexFs(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  /** Initialize a PERSISTED, incrementally-maintained corpus band index
    * at `dir` — the stateful form of [[corpusBandIndex]] for a
    * long-running crawl: `_params.json` pins the MinHash family
    * (mismatched parameters silently collapse recall — the
    * [[graft.ext.ModelStore]] contract), `data/` holds flat
    * `(band int, key long)` parquet subdirectories — an optional `seed`
    * from an existing corpus, one `batch-N` per micro-batch appended by
    * [[dedupBatchMaintainingIndex]], `compact-...` from
    * [[compactBandIndex]]. Written params-last, so a crashed init is
    * invisible.
    */
  /** `storeIds = true` switches the index to the ID-CARRYING layout
    * (`(_rid, band, key)` rows instead of `(band, key)`): the extra
    * column is what makes DELETE RETRACTION possible —
    * [[retractFromBandIndex]] records tombstoned ids and every probe
    * anti-joins their rows out, so a deleted-then-reinserted key's own
    * history stops suppressing it. Default stays id-less (the crawl-dedup
    * contract: previously seen content is a duplicate even if its row was
    * deleted) — the layout choice is pinned in `_params.json` at init and
    * every later write/read follows it.
    */
  def initBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      params: graft.ext.Dedup.MinHashParams,
      corpus: Option[DataFrame] = None,
      idCol: String = "doc_id",
      textCol: String = "text",
      storeIds: Boolean = false
  ): Unit = {
    val (p, fs) = indexFs(spark, dir)
    val paramsPath = new org.apache.hadoop.fs.Path(p, "_params.json")
    require(!fs.exists(paramsPath), s"band index already initialized at $dir")
    fs.mkdirs(new org.apache.hadoop.fs.Path(p, "data"))
    corpus.foreach { c =>
      bandRows(c, idCol, textCol, params, storeIds, seq = -1L)
        .write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(p, "data/seed").toString)
    }
    val root = indexMapper.createObjectNode()
    root.put("kind", "band-index")
    root.put("numHashes", params.numHashes)
    root.put("numBands", params.numBands)
    root.put("shingleSize", params.shingleSize)
    root.put("seed", params.seed)
    root.put("oph", params.oph)
    root.put("storeIds", storeIds)
    val out = fs.create(paramsPath, false)
    try out.write(indexMapper.writeValueAsString(root).getBytes("UTF-8")) finally out.close()
  }

  /** Whether the index stores `(_rid, band, key)` rows (the retraction
    * layout). Absent field = false: pre-upgrade indexes keep their id-less
    * layout and semantics.
    */
  def bandIndexStoresIds(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val (p, fs) = indexFs(spark, dir)
    val in = fs.open(new org.apache.hadoop.fs.Path(p, "_params.json"))
    val node = try indexMapper.readTree(in.readAllBytes()) finally in.close()
    Option(node.get("storeIds")).exists(_.asBoolean())
  }

  /** The stored row set for one corpus/batch under the index layout:
    * distinct `(band, key)`, or distinct `(_rid, _seq, band, key)` when
    * ids are stored (the same band may legitimately repeat across ids and
    * epochs there — retraction must remove only the deleted id's
    * pre-delete copies).
    */
  private def bandRows(
      docs: DataFrame, idCol: String, textCol: String,
      params: graft.ext.Dedup.MinHashParams, storeIds: Boolean, seq: Long): DataFrame = {
    val flat = bandsFlat(docs, idCol, textCol, params)
    if (storeIds)
      flat.select(col(idCol).cast("string").as("_rid"), lit(seq).as("_seq"),
        col("band"), col("key")).distinct()
    else flat.select("band", "key").distinct()
  }

  /** Whether a band index has been (fully) initialized at `dir` —
    * `_params.json` is written LAST by [[initBandIndex]], so its presence
    * is the completion marker a crashed init never leaves behind.
    */
  def bandIndexExists(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val (p, fs) = indexFs(spark, dir)
    fs.exists(new org.apache.hadoop.fs.Path(p, "_params.json"))
  }

  /** Fold a corpus's bands into an EXISTING index as one named subdirectory
    * — the Merge-backfill path of the CDC content dedup: backfilled rows
    * are authoritative history (never suppressed), but later stream
    * batches must dedup against them. `name` must not impersonate a
    * `batch-` subdir: those names carry [[dedupBatchMaintainingIndex]]'s
    * replay-exclusion and [[compactBandIndex]]'s keep-recent protection.
    * Overwrite-idempotent under one fixed name; distinct appends need
    * distinct names.
    */
  def appendCorpusToBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      corpus: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      name: String = "seed-backfill"
  ): Unit = {
    require(!name.startsWith("batch-") && !name.startsWith("compact-"),
      s"appendCorpusToBandIndex name '$name' would impersonate a maintained subdir class")
    val (p, _) = indexFs(spark, dir)
    val params = bandIndexParams(spark, dir)
    // corpus appends index at epoch -1: authoritative history that
    // PREDATES every stream tombstone, so a retracted key's backfilled
    // content reads as pre-delete history and stays retracted — WHILE
    // THE TOMBSTONE SURVIVES. Compaction prunes a tombstone once every
    // row it retracts is physically gone; a backfill arriving AFTER that
    // re-introduces the content as live corpus (the index legitimately
    // no longer remembers the deleted epoch), which is the semantics a
    // re-asserted authoritative row should have.
    bandRows(corpus, idCol, textCol, params, bandIndexStoresIds(spark, dir), seq = -1L)
      .write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(p, s"data/$name").toString)
  }

  /** Record DELETED ids so their indexed bands stop suppressing — the
    * retraction half of the `storeIds` layout: `(_rid, _seq)` tombstones
    * land under `tombstones/<name>/` (overwrite-idempotent per name, the
    * same replay contract as the batch subdirs) and every later probe
    * anti-joins out the id's rows with `_seq < seq` — pre-delete epochs
    * only, so a LATER re-insert of the same id indexes and suppresses
    * normally (the snapshot table's equality-delete sequence semantics).
    * Requires an id-carrying index: an id-less one has nothing to retract
    * BY (bands are shared across docs — dropping a dead doc's band would
    * under-suppress live content that legitimately shares it).
    * [[compactBandIndex]] folds accumulated tombstone dirs into one and
    * PRUNES entries that no longer retract any readable row, so the
    * tombstone set stays bounded by the ids whose pre-delete history is
    * still on disk — footprint is one (string, long) per such id.
    */
  def retractFromBandIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      ids: DataFrame,
      idCol: String = "doc_id",
      name: String,
      seq: Long
  ): Unit = {
    require(bandIndexStoresIds(spark, dir),
      s"band index at $dir stores no ids — retraction needs initBandIndex(storeIds = true)")
    val (p, _) = indexFs(spark, dir)
    ids.select(col(idCol).cast("string").as("_rid"), lit(seq).as("_seq")).distinct()
      .write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(p, s"tombstones/$name").toString)
  }

  private def tombstoneDirs(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    val t = new org.apache.hadoop.fs.Path(p, "tombstones")
    if (!fs.exists(t)) Seq.empty
    else fs.listStatus(t).toSeq.filter(_.isDirectory).map(_.getPath)
  }

  /** Stored band rows of `subdirs` with tombstoned ids retracted (storeIds
    * layout) — the ONE probe-side read both the batch dedup and the
    * compaction fold share, projected down to `(band, key)` for the
    * collision join.
    */
  private def liveIndexRows(
      spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path,
      subdirs: Seq[org.apache.hadoop.fs.Path],
      storeIds: Boolean,
      projectBandKey: Boolean): DataFrame = {
    val schema = if (storeIds) bandSchemaWithIds else bandSchema
    val rows = spark.read.schema(schema).parquet(subdirs.map(_.toString): _*)
    val tombs = if (storeIds) tombstoneDirs(fs, p) else Seq.empty
    val live =
      if (tombs.isEmpty) rows
      else {
        val t = spark.read.schema(tombstoneSchema).parquet(tombs.map(_.toString): _*)
          .distinct().withColumnRenamed("_rid", "_t_rid").withColumnRenamed("_seq", "_t_seq")
        // retract pre-delete epochs only: any tombstone NEWER than the
        // row's epoch kills it; rows indexed after the delete survive
        rows.join(t, rows("_rid") === t("_t_rid") && rows("_seq") < t("_t_seq"), "left_anti")
      }
    if (projectBandKey && storeIds) live.select("band", "key") else live
  }

  /** The index's pinned MinHash family. */
  def bandIndexParams(
      spark: org.apache.spark.sql.SparkSession, dir: String): graft.ext.Dedup.MinHashParams = {
    val (p, fs) = indexFs(spark, dir)
    val in = fs.open(new org.apache.hadoop.fs.Path(p, "_params.json"))
    val node = try indexMapper.readTree(in.readAllBytes()) finally in.close()
    require(node.get("kind").asText() == "band-index", s"$dir is not a band index")
    graft.ext.Dedup.MinHashParams(
      node.get("numHashes").asInt(), node.get("numBands").asInt(),
      node.get("shingleSize").asInt(), node.get("seed").asLong(), node.get("oph").asBoolean())
  }

  /** Flat `(id, band, key)` band rows for non-empty-text docs under the
    * index's exact MinHash family (seed and OPH included — [[corpusBandIndex]]
    * delegates to the library defaults; this path must reproduce the
    * PERSISTED family).
    */
  private def bandsFlat(
      docs: DataFrame, idCol: String, textCol: String,
      p: graft.ext.Dedup.MinHashParams): DataFrame =
    graft.ext.Dedup.minHashSignatures(
        docs.where(coalesce(length(trim(col(textCol))), lit(0)) > 0),
        idCol, textCol, p.shingleSize, p.numHashes, p.seed, p.oph)
      .select(col("id").as(idCol),
        explode(graft.ext.Dedup.lshBandKeys(col("signature"), p.numHashes, p.numBands)).as("_b"))
      .select(col(idCol), col("_b.band").as("band"), col("_b.key").as("key"))

  private def indexSubdirs(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    val data = new org.apache.hadoop.fs.Path(p, "data")
    if (!fs.exists(data)) Seq.empty
    else fs.listStatus(data).toSeq.filter(_.isDirectory).map(_.getPath)
  }

  /** The `foreachBatch` body of an INDEX-MAINTAINING streaming dedup —
    * the continuous daily-crawl loop: dedup the micro-batch against
    * everything indexed so far (seed corpus + every PRIOR batch's
    * survivors), then append THIS batch's survivors' bands as
    * `data/batch-<batchId>/`. Prior batches are consulted through their
    * STORED bands only — their texts are never re-signed (the property
    * StreamOpsSpec pins), so per-batch cost is one map-only scan of the
    * compact index plus the batch's own signatures.
    *
    * Retry-safe per Structured Streaming's `foreachBatch` contract: the
    * append is a deterministic OVERWRITE of the batchId-named
    * subdirectory, and the dedup read EXCLUDES that subdirectory — a
    * replayed batch neither double-appends nor suppresses itself against
    * its own half-written bands. NULL/empty-text rows pass through
    * un-indexed ([[dedupStreamAgainstCorpus]]'s contract). Intra-batch
    * near-dups both survive (compose [[nearDedupStream]] upstream, the
    * family's usual layering). Single maintainer per index dir.
    *
    * `exemptIds` (a THUNK returning one `idCol` column; bounded by the
    * micro-batch's key count, so broadcastable by construction): ids that
    * are NEVER suppressed whatever their bands collide with — the CDC
    * pipeline passes the batch keys already live in the target so an
    * UPDATE whose text still near-dups its own indexed prior version
    * reaches the merge instead of being silently dropped. A thunk, not a
    * frame: liveness only matters for ids that actually COLLIDED, so on
    * collision-free batches (the daily-crawl steady state) the caller's
    * exemption scan never runs at all. Exempt survivors still append
    * their (possibly changed) bands like any other survivor.
    */
  def dedupBatchMaintainingIndex(
      batch: DataFrame,
      dir: String,
      batchId: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      exemptIds: Option[() => DataFrame] = None
  ): DataFrame = {
    val spark = batch.sparkSession
    val (p, fs) = indexFs(spark, dir)
    val params = bandIndexParams(spark, dir)
    val storeIds = bandIndexStoresIds(spark, dir)
    val own = f"batch-$batchId%020d"
    val prior = indexSubdirs(fs, p).filterNot(_.getName == own)
    val emptyText = coalesce(length(trim(col(textCol))), lit(0)) === 0
    // materialize the batch's bands ONCE (eager localCheckpoint, blocks
    // GC-managed): they are consumed by both the dedup probe and the
    // survivor append, and recomputing would re-sign the batch twice
    val bands = bandsFlat(batch, idCol, textCol, params).localCheckpoint()
    // matched ids: ONE map-only pass over the stored index with the
    // batch's bands broadcast — the index is never shuffled (on a
    // storeIds index the scan first anti-joins the tombstoned ids'
    // rows out: retracted history must not suppress)
    val dupIds =
      if (prior.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(bands.schema.fields.take(1)))
      // materialized (batch-bounded, GC-managed): consumed by the empty
      // short-circuit AND the survivors join, and pinning it here keeps
      // the index scan at exactly one pass per batch
      else liveIndexRows(spark, fs, p, prior, storeIds, projectBandKey = true)
        .join(broadcast(bands), Seq("band", "key"))
        .select(col(idCol)).distinct().localCheckpoint()
    val dupEff = exemptIds match {
      case Some(mk) if !dupIds.isEmpty =>
        dupIds.join(broadcast(mk().select(col(idCol)).distinct()), Seq(idCol), "leftanti")
      case _ => dupIds
    }
    val survivors = batch.where(!emptyText)
      .join(broadcast(dupEff), Seq(idCol), "leftanti")
    val survivorBands =
      bands.join(broadcast(survivors.select(col(idCol))), Seq(idCol), "leftsemi")
    (if (storeIds)
       survivorBands.select(col(idCol).cast("string").as("_rid"),
         lit(batchId).as("_seq"), col("band"), col("key")).distinct()
     else survivorBands.select("band", "key").distinct())
      .write.mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(p, s"data/$own").toString)
    // materialize ONCE (micro-batch-sized, GC-managed): a foreachBatch
    // consumer invariably runs several actions over the result (empty
    // check, merge write, watermark agg), and a lazy plan would re-run
    // the index scan + dedup join for each — breaking the documented
    // one-index-scan-per-batch cost
    batch.where(emptyText).unionByName(survivors).localCheckpoint()
  }

  /** Maintenance-cadence compaction of a band index: fold the
    * accumulated per-batch subdirectories into one distinct-ed
    * `compact-*` subdirectory and drop the absorbed ones. Crash-safe in
    * the only direction that matters: the compacted subdir lands BEFORE
    * the absorbed ones are deleted, so a mid-compaction crash leaves
    * duplicate band rows (harmless to the semi-join decision), never a
    * hole.
    *
    * The NEWEST `keepRecent` batch subdirs are never absorbed:
    * [[dedupBatchMaintainingIndex]]'s replay safety excludes the
    * replayed batch's own bands BY SUBDIR NAME, and Structured Streaming
    * can replay the latest uncommitted batch after a crash — absorbing
    * it into a compacted blob would make that replay dedup the batch
    * against its own bands and suppress every row. The compacted target
    * carries a UUID (a nanoTime name could collide with a prior JVM's
    * and overwrite an input). One maintainer per index dir.
    */
  def compactBandIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      keepRecent: Int = 2): Unit = {
    val (p, fs) = indexFs(spark, dir)
    val storeIds = bandIndexStoresIds(spark, dir)
    val all = indexSubdirs(fs, p)
    val protectedBatches = all.filter(_.getName.startsWith("batch-"))
      .sortBy(_.getName).takeRight(math.max(0, keepRecent)).toSet
    val subdirs = all.filterNot(protectedBatches)
    if (subdirs.size > 1) {
      val target = new org.apache.hadoop.fs.Path(p,
        s"data/compact-${java.util.UUID.randomUUID()}")
      // on a storeIds index the fold physically drops retracted rows (the
      // tombstone anti-join) — the tombstone FILES are maintained below
      liveIndexRows(spark, fs, p, subdirs, storeIds, projectBandKey = false)
        .distinct()
        .write.mode("overwrite").parquet(target.toString)
      subdirs.foreach(fs.delete(_, true))
    }
    // tombstone maintenance (storeIds only): without it a long-running
    // deleting stream accumulates one tiny tombstones/batch-N dir per
    // deleting batch FOREVER, and every probe lists and anti-joins all of
    // them. Fold them into one distinct-ed compact dir, PRUNED to the
    // entries that still retract something: a tombstone is live iff some
    // CURRENT data row (the folded blob + the protected recent batches —
    // i.e. everything a probe can still read) has its _rid at a lower
    // _seq. Crash-safe ordering: the fold above already deleted the
    // absorbed data dirs, so liveness is judged against exactly the
    // post-fold state; the pruned tombstone dir lands BEFORE the old
    // tombstone dirs drop, so a crash leaves duplicate or unpruned
    // tombstones (harmless to the anti-join), never a lost retraction.
    val tombDirs = tombstoneDirs(fs, p)
    if (storeIds && tombDirs.nonEmpty) {
      val rows = {
        val dirsNow = indexSubdirs(fs, p)
        if (dirsNow.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            bandSchemaWithIds)
        else spark.read.schema(bandSchemaWithIds).parquet(dirsNow.map(_.toString): _*)
      }.select(col("_rid").as("_r_rid"), col("_seq").as("_r_seq"))
      val tombs = spark.read.schema(tombstoneSchema)
        .parquet(tombDirs.map(_.toString): _*).distinct().localCheckpoint()
      val live = tombs.join(rows,
        tombs("_rid") === rows("_r_rid") && rows("_r_seq") < tombs("_seq"),
        "left_semi").localCheckpoint()
      // rewrite when there is something to FOLD (multiple dirs) or
      // something to PRUNE (a dead entry in the single remaining dir —
      // e.g. its last retracted rows were absorbed out by THIS tick's
      // data fold); a single all-live dir is left untouched, so the
      // steady state does not churn a rewrite per tick
      if (tombDirs.size > 1 || live.count() < tombs.count()) {
        val tombTarget = new org.apache.hadoop.fs.Path(p,
          s"tombstones/compact-${java.util.UUID.randomUUID()}")
        live.write.mode("overwrite").parquet(tombTarget.toString)
        tombDirs.foreach(fs.delete(_, true))
      }
    }
  }

  /** Streaming dedup against a STATIC stored corpus — the continuous
    * form of [[graft.ext.Dedup.dedupIncrement]]: a stream document is
    * suppressed when ANY of its MinHash band keys appears in the
    * corpus's band index ([[corpusBandIndex]]). Same
    * candidate-collision-is-the-decision semantics (and the same
    * P(suppress) curve in true Jaccard) as [[nearDedupStream]]; compose
    * with [[nearDedupStream]] upstream for intra-stream near-dups.
    *
    * Shape: explode stream bands → stream-static LEFT ANTI join against
    * the index (stateless, per micro-batch; Spark broadcasts the index
    * when it fits, else both sides hash-partition on the band key — the
    * stream side is only ever micro-batch-sized) → one watermark-bounded
    * aggregation emits a doc iff ALL its bands survived. The static side
    * is re-planned per micro-batch, which is why the index is a
    * PRECOMPUTED compact table, not the corpus itself: pass the
    * persisted index, not `corpusBandIndex(corpus)` inline, unless the
    * corpus is trivially small. NULL/empty text passes through (unique
    * synthetic band, never in the index — same contract as
    * [[nearDedupStream]]).
    */
  def dedupStreamAgainstCorpus(
      docs: DataFrame,
      corpusBands: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleSize: Int = 3,
      numHashes: Int = 128,
      numBands: Int = 16
  ): DataFrame =
    emitIfAllBandsSurvive(
      bandedDocs(docs, tsCol, watermarkDelay, idCol, textCol, shingleSize, numHashes, numBands)
        // collapse REDELIVERED copies of the same row ((id, band) state,
        // NOT band-only — band-only would be intra-stream near-dup
        // suppression, which composes upstream via [[nearDedupStream]]):
        // without this, an at-least-once source delivering a novel doc
        // twice doubles its band count past `_expected` and the doc is
        // emitted ZERO times
        .dropDuplicatesWithinWatermark(idCol, "_b")
        .join(corpusBands, Seq("_b"), "left_anti"),
      tsCol, idCol, docs.columns.toSeq)

  /** EXACT streaming dedup against stored corpus state — the streaming
    * form of [[graft.ext.Dedup.dedupExactIncrementFast]]: drop every
    * stream row whose normalized fingerprint the persisted bloom index
    * ([[graft.ext.Dedup.exactIndex]], typically loaded via
    * [[graft.ext.ModelStore.loadBloomIndex]]) may contain. Purely
    * map-side per micro-batch: the index bytes ship once in the plan, no
    * state store, no join — the zero-corpus-IO membership filter at
    * stream cadence. Probabilistic like its batch sibling (~1 % of novel
    * rows lost to false positives); route bloom-positives through the
    * exact batch verify instead when exactness matters. NULL text passes
    * through (no content to match — the family's shared contract).
    */
  def dedupStreamExact(
      docs: DataFrame,
      index: Array[Byte],
      textCol: String = "text"
  ): DataFrame =
    graft.ext.Dedup.dedupExactIncrementFast(index, docs, textCol)

  /** Conversion-funnel pairs via an interval self-join: every `fromType`
    * event joined to the same user's `toType` events that land strictly
    * after it and within `maxSpan`. Works identically on batch frames
    * (watermark is a no-op) and as a STREAM-STREAM interval join: the time
    * bound plus per-side watermarks let Spark evict join state older than
    * `watermarkDelay + maxSpan`, so state is O(recent events), not
    * O(history). The join shuffles both sides on the user key once — the
    * standard distributed funnel plan; the range predicate is evaluated
    * post-match inside the same exchange.
    */
  def funnelPairs(
      events: DataFrame,
      fromType: String,
      toType: String,
      maxSpan: String,
      watermarkDelay: String,
      tsCol: String = "ts",
      userCol: String = "user_id",
      typeCol: String = "event_type",
      idCol: String = "event_id"
  ): DataFrame = {
    val from = events.where(col(typeCol) === fromType)
      .select(col(userCol).as("_fuser"), col(idCol).as("from_id"), col(tsCol).as("from_ts"))
      .withWatermark("from_ts", watermarkDelay)
    val to = events.where(col(typeCol) === toType)
      .select(col(userCol).as("_tuser"), col(idCol).as("to_id"), col(tsCol).as("to_ts"))
      .withWatermark("to_ts", watermarkDelay)
    from.join(to,
        col("_fuser") === col("_tuser") &&
          col("to_ts") > col("from_ts") &&
          col("to_ts") <= col("from_ts") + expr(s"INTERVAL $maxSpan"))
      .select(col("_fuser").as(userCol), col("from_id"), col("to_id"),
        col("from_ts"), col("to_ts"))
  }

  /** Funnel WITH abandonment: [[funnelPairs]] as a LEFT-OUTER
    * stream-stream interval join, so every `fromType` event is emitted
    * exactly once — joined to each in-window `toType` event, or with NULL
    * `to_id`/`to_ts` if none arrived ("viewed, never bought"). The
    * abandoned row cannot be emitted eagerly (a matching event may still
    * be in flight), so Spark holds the from-row in join state and
    * releases the NULL-extended row once the watermark passes
    * `from_ts + maxSpan` — abandonment latency = watermark delay + span,
    * the price of an exact answer under late data. State stays
    * O(in-horizon events) exactly as the inner variant: the time bound
    * plus both-side watermarks let the join evict rows older than
    * `watermarkDelay + maxSpan`; one shuffle of both sides on the user
    * key at any scale.
    */
  def funnelWithAbandoned(
      events: DataFrame,
      fromType: String,
      toType: String,
      maxSpan: String,
      watermarkDelay: String,
      tsCol: String = "ts",
      userCol: String = "user_id",
      typeCol: String = "event_type",
      idCol: String = "event_id"
  ): DataFrame = {
    val from = events.where(col(typeCol) === fromType)
      .select(col(userCol).as("_fuser"), col(idCol).as("from_id"), col(tsCol).as("from_ts"))
      .withWatermark("from_ts", watermarkDelay)
    val to = events.where(col(typeCol) === toType)
      .select(col(userCol).as("_tuser"), col(idCol).as("to_id"), col(tsCol).as("to_ts"))
      .withWatermark("to_ts", watermarkDelay)
    from.join(to,
        col("_fuser") === col("_tuser") &&
          col("to_ts") > col("from_ts") &&
          col("to_ts") <= col("from_ts") + expr(s"INTERVAL $maxSpan"),
        "left_outer")
      .select(col("_fuser").as(userCol), col("from_id"), col("to_id"),
        col("from_ts"), col("to_ts"))
  }

  /** LAST-TOUCH ATTRIBUTION — the ad-tech/product-analytics primitive:
    * each `toType` conversion is attributed to the MOST RECENT qualifying
    * `fromType` event by the same user within `maxSpan` (impression →
    * click, view → purchase). [[funnelPairs]] emits ALL in-window pairs;
    * this folds them to one row per conversion: the interval join, then a
    * per-conversion argmax — `max(struct(from_ts, from_id, …))`, ties on
    * `from_ts` broken toward the larger `from_id`, the attributed row's
    * user/to_ts riding in the struct (constant per conversion, so the
    * argmax cannot disturb them).
    *
    * Batch/stream unified. Under streaming the argmax group is
    * `(window(to_ts, windowSize), to_id)` — each conversion lives in
    * exactly one tumbling window, so the window key changes nothing in
    * the result but gives the aggregation its event-time eviction
    * boundary (same pattern as [[funnelRates]] step 1): state is one
    * candidate-max row per in-horizon conversion, emitted at window
    * close + join horizon. Scale: one shuffle of both streams on the
    * user key (the join), one hash agg with map-side combine keyed by
    * conversion — no global sort, no per-user window function.
    *
    * Returns `(to_id, userCol, from_id, from_ts, to_ts, n_candidates)`.
    * Conversions with NO qualifying prior event do not appear (inner
    * semantics; route [[funnelWithAbandoned]] for the unattributed set).
    */
  def lastTouchAttribution(
      events: DataFrame,
      fromType: String,
      toType: String,
      maxSpan: String,
      watermarkDelay: String,
      windowSize: String = "1 hour",
      tsCol: String = "ts",
      userCol: String = "user_id",
      typeCol: String = "event_type",
      idCol: String = "event_id"
  ): DataFrame =
    funnelPairs(events, fromType, toType, maxSpan, watermarkDelay,
        tsCol, userCol, typeCol, idCol)
      .groupBy(window(col("to_ts"), windowSize), col("to_id"))
      .agg(
        max(struct(col("from_ts"), col("from_id"), col(userCol), col("to_ts"))).as("best"),
        count(lit(1)).as("n_candidates"))
      .select(col("to_id"), col("best")(userCol).as(userCol),
        col("best")("from_id").as("from_id"), col("best")("from_ts").as("from_ts"),
        col("best")("to_ts").as("to_ts"), col("n_candidates"))

  /** Windowed funnel CONVERSION RATES — the metric funnel users actually
    * read: per tumbling event-time window of funnel STARTS, how many
    * `fromType` events arrived (`started`), how many converted to at
    * least one in-span `toType` event (`converted`), and their ratio.
    *
    * Built as [[funnelWithAbandoned]] (every start emits, paired or
    * NULL-extended) followed by two chained windowed aggregations, all
    * batch/stream unified:
    *   1. per (window, from_id): fold the pair rows into one 0/1
    *      conversion flag — a start with several conversions must count
    *      once, and `count(distinct)` is not available under streaming
    *      (this grouped-max formulation is, since each from event lives
    *      in exactly one tumbling window; state = one row per in-horizon
    *      start, watermark-evicted);
    *   2. per window: `started = count`, `converted = sum(flag)` — a
    *      chained time-window aggregation, re-keyed on the step-1 window.
    *
    * Emission at window close + join horizon (the abandonment price from
    * [[funnelWithAbandoned]] applies — a start is only classifiable once
    * the watermark passes `from_ts + maxSpan`). Scale shape: the
    * stream-stream join shuffles on the user key; both aggregations are
    * hash aggs with map-side partial combine; state is O(in-horizon
    * events) at any rate.
    */
  def funnelRates(
      events: DataFrame,
      fromType: String,
      toType: String,
      maxSpan: String,
      watermarkDelay: String,
      windowDuration: String,
      tsCol: String = "ts",
      userCol: String = "user_id",
      typeCol: String = "event_type",
      idCol: String = "event_id"
  ): DataFrame = {
    val pairs = funnelWithAbandoned(
      events, fromType, toType, maxSpan, watermarkDelay, tsCol, userCol, typeCol, idCol)
    // the join output already carries from_ts's watermark — re-declaring it
    // here would trip "Redefining watermark is disallowed" under the
    // multiple-stateful-operator propagation
    pairs
      .groupBy(window(col("from_ts"), windowDuration), col("from_id"))
      .agg(max(when(col("to_id").isNotNull, 1L).otherwise(0L)).as("_conv"))
      .groupBy(col("window"))
      .agg(count(lit(1)).as("started"), sum(col("_conv")).as("converted"))
      .select(
        col("window.start").as("window_start"),
        col("started"), col("converted"),
        (col("converted").cast("double") / col("started")).as("conversion_rate"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * for each consecutive pair of events of one user (event-time order,
    * event-id tiebreak for a TOTAL order — two events on the same
    * timestamp sort deterministically), count `from_type → to_type` and
    * derive the row-normalized transition probability in permille
    * (truncating integer division → engine-replayable, like every
    * permille in this repo). The matrix behind "what do users do after
    * a click": next-step prediction, anomaly flags (transitions that
    * never happen), funnel discovery without pre-declaring the steps.
    *
    * BATCH-ONLY by design: `lag` over a user-ordered window needs the
    * user's full history in one place; the streaming equivalent is
    * sessionized state (`flatMapGroupsWithState`, cf. [[idleSessionBursts]])
    * emitting step pairs incrementally — different operator, different
    * latency/exactness trade.
    *
    * Scale shape: ONE shuffle (hash-partition on user for the lag
    * window; per-user histories sort within partitions), then a
    * map-side-combined hash agg onto the |types|² matrix — tiny — and a
    * window over `from_type` for row totals on that tiny frame. Users
    * are high-cardinality so the lag partitioning has no skew pole;
    * a single hyperactive user degrades one task by its own history
    * length only.
    *
    * Returns `(from_type, to_type, n, row_total, prob_permille)`.
    */
  def transitionCounts(
      events: DataFrame,
      tsCol: String = "ts",
      userCol: String = "user_id",
      typeCol: String = "event_type",
      idCol: String = "event_id"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("_from", lag(col(typeCol), 1).over(w))
      .where(col("_from").isNotNull)
      .groupBy(col("_from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("prob_permille", expr("(1000 * n) div row_total"))
  }

  /** Per-window grouped TOP-K over a stream: for each (event-time window,
    * key) emit the k largest rows by `orderCols` (left-to-right
    * descending; include a unique id as the last tiebreaker for a total
    * order). The bounded-heap `top_k_agg` (Spark's `CollectTopK`) keeps
    * the streaming aggregation state at ≤ k rows per live (window, key)
    * — the window formulation would be unbounded per group — and the
    * watermark closes windows and evicts their state, so this runs
    * forever at any rate. Emission in append mode happens at window
    * close (the price of an exact top-k: a later row can displace an
    * earlier one until the watermark passes).
    */
  def windowedTopK(
      events: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowDuration: String,
      keyCols: Seq[String],
      orderCols: Seq[String],
      k: Int
  ): DataFrame = {
    require(k > 0, "k must be positive")
    graft.sql.GraftExtensions.ensureRegistered(events.sparkSession)
    val payload = events.columns.filterNot(c => orderCols.contains(c) || keyCols.contains(c)).toSeq
    val ranked = struct((orderCols ++ payload).map(col): _*)
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration) +: keyCols.map(col): _*)
      .agg(call_function("top_k_agg", ranked, lit(k), lit(false)).as("_top"))
      .withColumn("_t", explode(col("_top")))
      .select((col("window") +: keyCols.map(col)) ++ (orderCols ++ payload).map(c => col(s"_t.$c").as(c)): _*)
  }

  /** Deterministic uniform k-sample per event-time window: the rows
    * whose replayable id hashes (`(id · 2654435761) mod 2^32`, the house
    * hash) are the k SMALLEST in the window — a KMV-style hash
    * reservoir. Sampling by hash order is uniform AND replayable: the
    * same window always yields the same sample regardless of arrival
    * order, partitioning, or batch/stream execution (batch equivalence
    * pinned in StreamOpsSpec), which is what makes downstream eval sets
    * and debugging reproducible. The `top_k_agg` buffer (reverse=true →
    * k smallest) bounds state at ≤ k rows per live window; the watermark
    * closes windows and evicts state, so the stream runs forever at any
    * rate. Same id bound as [[graft.ext.Datasets.permilleBucket]]
    * (ids below ~3.46e9; pre-fold larger spaces).
    */
  def windowedUniformSample(
      events: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowDuration: String,
      idCol: String,
      k: Int
  ): DataFrame = {
    require(k > 0, "k must be positive")
    graft.sql.GraftExtensions.ensureRegistered(events.sparkSession)
    val hv = pmod(col(idCol).cast("long") * lit(2654435761L), lit(4294967296L))
    val payload = events.columns.toSeq
    val ranked = struct(hv.as("_hv") +: payload.map(col): _*)
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(call_function("top_k_agg", ranked, lit(k), lit(true)).as("_s"))
      .withColumn("_t", explode(col("_s")))
      .select(col("window") +: payload.map(c => col(s"_t.$c").as(c)): _*)
  }

  /** Session-window aggregation (built-in `session_window`, gap-based close;
    * watermark required so closed sessions can be finalized and state
    * evicted).
    */
  def sessionWindowAgg(
      events: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      gapDuration: String,
      keys: Seq[Column],
      aggs: Seq[Column]
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gapDuration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  // ----------------------------------------------- custom state (FMGWS)

  /** Input shape for the stateful ops (the events table). */
  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

  /** Per-user running state. */
  final case class UserState(user_id: Long, n: Long, total: Double, lastEventMs: Long)

  /** Emitted when a user goes idle past the timeout: a closed activity
    * burst with its totals.
    */
  final case class ClosedBurst(user_id: Long, n: Long, total: Double)

  /** Custom keyed state with EVENT-TIME timeout: accumulate per-user
    * totals; when the watermark passes `lastEvent + idleGapMs` for a key,
    * emit the closed burst and clear its state — the
    * `flatMapGroupsWithState` pattern the built-in windows can't express
    * (emission on inactivity, measured in event time — deterministic under
    * replay, no wall-clock dependence).
    *
    * State is partitioned by user across the cluster; each key's state is a
    * constant-size record and the watermark evicts idle keys, so state
    * store size is O(recently-active users) at any corpus scale.
    */
  def idleSessionBursts(
      events: Dataset[Event],
      idleGapMs: Long,
      watermarkDelay: String = "0 seconds"
  ): Dataset[ClosedBurst] = {
    implicit val stateEnc = Encoders.product[UserState]
    implicit val outEnc = Encoders.product[ClosedBurst]
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[UserState, ClosedBurst](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedBurst(s.user_id, s.n, s.total))
          } else {
            val prev = state.getOption.getOrElse(UserState(userId, 0L, 0.0, 0L))
            val next = rows.foldLeft(prev) { (s, e) =>
              UserState(userId, s.n + 1, s.total + e.value, math.max(s.lastEventMs, e.ts.getTime))
            }
            state.update(next)
            state.setTimeoutTimestamp(next.lastEventMs + idleGapMs)
            Iterator.empty
          }
      }
  }
}
