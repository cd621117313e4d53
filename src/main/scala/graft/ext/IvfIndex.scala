package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A PERSISTED inverted-file (IVF) ANN index with INCREMENTAL APPEND — the
  * similarity-search analog of the near-dup family's maintained band index
  * (the daily-crawl steady state): train/choose centroids once, assign the
  * corpus, store the ASSIGNED corpus partitioned by list id, and fold each
  * day's new vectors in by assigning them to the FROZEN centroids — no
  * retraining, no re-assignment of the existing corpus, no touch of any
  * stored file.
  *
  * Layout at `dir`:
  *   - `_centroids.json` — the frozen coarse quantizer
  *     ([[ModelStore.saveCentroids]] format)
  *   - `data/seed/list=N/` and `data/<append-name>/list=N/` parquet
  *     — `(id, vector)` rows hive-partitioned by their assigned list, so a
  *     probe-time `list IN (...)` filter prunes DIRECTORIES: query IO is
  *     proportional to the probed lists' data, never the corpus (the IVF
  *     promise, enforced by the storage layout rather than the planner's
  *     goodwill; IvfIndexSpec pins the planned file set)
  *   - `_manifest.json` — the LIVE subdir set (tmp-then-rename pointer):
  *     readers plan only manifested subdirs, which is what makes
  *     [[compact]] publishable without a duplicate-visibility window
  *   - `_retired.json` — the deletion-grace ledger: subdir → the moment a
  *     compact unreferenced it (the clock the sweep and the append
  *     name-recycle guard age against — mtime-free, so object-store safe)
  *   - `_params.json` — written LAST: its presence is the completion
  *     marker, a crashed create is invisible
  *
  * Appends arrive at maintenance cadence (daily increments) and
  * [[compact]] folds them back to one subdir on the same cadence the band
  * index uses; reads are ONE scan regardless of accumulated appends. The
  * rebuild story for a drifted quantizer is [[create]] with re-trained
  * centroids (recall drift under appended mass is floored by
  * IvfIndexSpec's brute-force comparison).
  *
  * Reference scope: the reference engine ships no vector search; this is
  * part of the training-data-pipeline surface built on the same
  * store-and-maintain contracts as its CDC tables.
  */
object IvfIndex {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  private def paramsPath(p: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(p, "_params.json")

  def exists(spark: SparkSession, dir: String): Boolean = {
    val (p, fs) = fsOf(spark, dir)
    fs.exists(paramsPath(p))
  }

  private val Kinds = Set("ivf-index", "ivf-pq-index")

  private def kindOf(spark: SparkSession, dir: String): String = {
    val (p, fs) = fsOf(spark, dir)
    val in = fs.open(paramsPath(p))
    val node = try mapper.readTree(in.readAllBytes()) finally in.close()
    val k = node.get("kind").asText()
    require(Kinds.contains(k), s"$dir is not an IVF index (kind=$k)")
    k
  }

  /** Whether the index stores PQ CODES instead of raw vectors. */
  def isPq(spark: SparkSession, dir: String): Boolean =
    kindOf(spark, dir) == "ivf-pq-index"

  /** (dim, numLists) as pinned at create time. */
  def params(spark: SparkSession, dir: String): (Int, Int) = {
    val (p, fs) = fsOf(spark, dir)
    val in = fs.open(paramsPath(p))
    val node = try mapper.readTree(in.readAllBytes()) finally in.close()
    require(Kinds.contains(node.get("kind").asText()), s"$dir is not an IVF index")
    (node.get("dim").asInt(), node.get("numLists").asInt())
  }

  def centroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    ModelStore.loadCentroids(spark, s"$dir/_centroids.json")

  // PQ codebooks persist as their own JSON artifact beside the centroids
  // (numSub × codebookSize × dsub doubles — a few KB at PQ scales).
  private def pqPath(dir: String) = s"$dir/_pq.json"

  private def savePqBooks(spark: SparkSession, dir: String,
      books: Array[Array[Array[Double]]]): Unit = {
    val (_, fs) = fsOf(spark, dir)
    val root = mapper.createObjectNode()
    root.put("kind", "pq-codebooks")
    root.put("numSub", books.length)
    root.put("codebookSize", books.head.length)
    root.put("dsub", books.head.head.length)
    val arr = root.putArray("books")
    books.foreach { book =>
      val b = arr.addArray()
      book.foreach { cw => val c = b.addArray(); cw.foreach(c.add) }
    }
    val out = fs.create(new org.apache.hadoop.fs.Path(pqPath(dir)), true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8")) finally out.close()
  }

  /** The frozen PQ codebooks of an `ivf-pq-index`. */
  def pqBooks(spark: SparkSession, dir: String): Array[Array[Array[Double]]] = {
    val (_, fs) = fsOf(spark, dir)
    val in = fs.open(new org.apache.hadoop.fs.Path(pqPath(dir)))
    val node = try mapper.readTree(in.readAllBytes()) finally in.close()
    require(node.get("kind").asText() == "pq-codebooks", s"${pqPath(dir)}: corrupt codebooks")
    val it = node.get("books").elements()
    val b = Array.newBuilder[Array[Array[Double]]]
    while (it.hasNext) {
      val bi = it.next().elements()
      val bb = Array.newBuilder[Array[Double]]
      while (bi.hasNext) {
        val ci = bi.next().elements()
        val cb = Array.newBuilder[Double]
        while (ci.hasNext) cb += ci.next().asDouble()
        bb += cb.result()
      }
      b += bb.result()
    }
    b.result()
  }

  /** Assign `vecs` to the frozen centroid set and write one
    * list-partitioned subdir. The assignment is [[Similarity.ivfAssign]]'s
    * exact argmax (score DESC, list DESC tie) — identical at create and
    * append time, so an appended copy of a stored vector lands in its
    * original's list by construction.
    */
  /** A NULL embedding gets no list from [[Similarity.ivfAssign]] (a
    * hive-default partition every probed read would choke on), and an
    * EMPTY or ALL-ZERO one is worse: its norm is 0, every score is
    * 0/0 = NaN, NaN wins every descending comparison, so the assignment
    * is silently non-null and the stored vector becomes the NaN-scored
    * top-1 neighbor of every query probing its list. A vector with a NaN
    * COMPONENT is the same poison through a different door: its norm is
    * NaN (not null, not 0 — it passes the null/zero test), the NaN still
    * wins the assignment argmax, and its stored cosine still outranks
    * every real neighbor. An INFINITE component is the fifth door: its
    * norm is +Inf (not null/0/NaN), and at query time Inf/Inf and
    * 0·Inf both score NaN — the same silent top-1 poisoning. Guard on
    * the norm being null, 0, NaN OR Inf — that covers all five
    * degenerate shapes — and fail THIS create/append/probe loudly
    * (executor-side raise_error: the id is in the message).
    */
  private def requiredList(
      listCol: org.apache.spark.sql.Column,
      nrm: org.apache.spark.sql.Column,
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(listCol.isNull || coalesce(nrm, lit(0.0)) === 0.0 || isnan(nrm) ||
        nrm === lit(Double.PositiveInfinity), raise_error(concat(
      lit("IvfIndexNullAssignment: id "), id.cast("string"),
      lit(" has a null/empty/zero/NaN/Inf embedding — cannot assign an IVF list"))).cast("int"))
      .otherwise(listCol)

  private def writeAssigned(
      vecs: DataFrame, out: String, cents: Array[Array[Double]],
      idCol: String, vecCol: String): Unit = {
    graft.sql.VecDot.ensureRegistered(vecs.sparkSession)
    val bc = Similarity.broadcastCentroids(cents)
    vecs.select(col(idCol).as("id"), col(vecCol).as("vec"),
        Similarity.ivfAssign(col(vecCol), bc, cents.head.length, cents.length)
          .cast("int").as("list"),
        Similarity.norm(col(vecCol)).as("_nrm"))
      .withColumn("list", requiredList(col("list"), col("_nrm"), col("id")))
      .drop("_nrm")
      // one shuffle keyed by list id: each output task writes whole lists,
      // so a list's rows land in O(1) files instead of one per input task
      .repartition(col("list"))
      .write.mode("overwrite").partitionBy("list").parquet(out)
  }

  /** PQ twin of [[writeAssigned]]: the stored payload is (id, CODES,
    * list) — no raw vector ever lands in the index, the memory contract
    * that fits a 100 TB corpus's search index where floats do not
    * (numSub small ints per vector vs dim floats). Encoding is
    * [[Similarity.pqEncode]]'s exact op order, identical at create and
    * append time under the frozen codebooks.
    */
  private def writeEncoded(
      vecs: DataFrame, out: String, cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]], idCol: String, vecCol: String): Unit = {
    graft.sql.VecDot.ensureRegistered(vecs.sparkSession)
    val bc = Similarity.broadcastCentroids(cents)
    vecs.select(col(idCol).as("id"),
        Similarity.pqEncode(col(vecCol), books).as("codes"),
        Similarity.ivfAssign(col(vecCol), bc, cents.head.length, cents.length)
          .cast("int").as("list"),
        Similarity.norm(col(vecCol)).as("_nrm"))
      .withColumn("list", requiredList(col("list"), col("_nrm"), col("id")))
      .drop("_nrm")
      .repartition(col("list"))
      .write.mode("overwrite").partitionBy("list").parquet(out)
  }

  private def writeParams(spark: SparkSession, dir: String, kind: String,
      cents: Array[Array[Double]]): Unit = {
    val (p, fs) = fsOf(spark, dir)
    val root = mapper.createObjectNode()
    root.put("kind", kind)
    root.put("dim", cents.head.length)
    root.put("numLists", cents.length)
    val out = fs.create(paramsPath(p), false)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8")) finally out.close()
  }

  /** Initialize the index: freeze `cents`, assign and store `corpus`.
    * Overwrites any previous index at `dir`.
    */
  def create(
      spark: SparkSession, dir: String, cents: Array[Array[Double]],
      corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(cents.nonEmpty, "IvfIndex.create requires at least one centroid")
    val (_, fs) = fsOf(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    ModelStore.saveCentroids(spark, s"$dir/_centroids.json", cents)
    writeAssigned(corpus, s"$dir/data/seed", cents, idCol, vecCol)
    writeManifest(spark, dir, Seq("seed"))
    writeParams(spark, dir, "ivf-index", cents)
  }

  /** Initialize a PQ-CODED index: freeze `cents` AND `books`, encode and
    * store `corpus` as (id, codes, list). Queries run asymmetric scoring
    * (exact query, reconstructed corpus) via [[topKPq]]; raw vectors are
    * never stored. Overwrites any previous index at `dir`.
    */
  def createPq(
      spark: SparkSession, dir: String, cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]], corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(cents.nonEmpty, "IvfIndex.createPq requires at least one centroid")
    require(books.nonEmpty && books.head.nonEmpty, "IvfIndex.createPq requires PQ codebooks")
    require(books.length * books.head.head.length == cents.head.length,
      s"codebooks cover dim ${books.length * books.head.head.length}, centroids have dim ${cents.head.length}")
    fsOf(spark, dir)._2.delete(new org.apache.hadoop.fs.Path(dir), true)
    ModelStore.saveCentroids(spark, s"$dir/_centroids.json", cents)
    savePqBooks(spark, dir, books)
    writeEncoded(corpus, s"$dir/data/seed", cents, books, idCol, vecCol)
    writeManifest(spark, dir, Seq("seed"))
    writeParams(spark, dir, "ivf-pq-index", cents)
  }

  // ---------------------------------------------------------- manifest
  // The LIVE subdir set is a tiny JSON pointer, not a directory listing:
  // readers plan only manifested subdirs, so compaction can publish its
  // folded subdir and retire the absorbed ones without a window where a
  // reader sees both (duplicate vectors would corrupt top-k ranks).
  // Written tmp-then-rename (the ModelStore pattern). Single maintainer
  // per index dir, same contract as the band index.

  private def manifestPath(p: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(p, "_manifest.json")

  private def readManifest(spark: SparkSession, dir: String): Seq[String] = {
    val (p, fs) = fsOf(spark, dir)
    val mp = manifestPath(p)
    if (!fs.exists(mp))
      // NAMED error, never a bare FileNotFoundException: the manifest is
      // published by an OVERWRITING atomic rename, so a hole here means
      // external damage (or a pre-upgrade artifact), and which subdirs
      // are live is genuinely unknowable from a listing alone — after a
      // crashed compact both the folded blob and its absorbed inputs may
      // coexist, and re-listing them all would double-count vectors.
      throw new IllegalStateException(
        s"IvfIndexManifestMissing: no _manifest.json at $dir — the live subdir set is " +
          "unrecoverable from a listing (a crashed compact may leave both the folded and " +
          "absorbed subdirs present); rebuild the index with create/createPq")
    val in = fs.open(mp)
    val node = try mapper.readTree(in.readAllBytes()) finally in.close()
    val it = node.get("subdirs").elements()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next().asText()
    b.result()
  }

  private def writeManifest(spark: SparkSession, dir: String, names: Seq[String]): Unit = {
    val (p, fs) = fsOf(spark, dir)
    val root = mapper.createObjectNode()
    val arr = root.putArray("subdirs")
    names.distinct.sorted.foreach(arr.add)
    val target = fs.makeQualified(manifestPath(p))
    val tmp = fs.makeQualified(
      new org.apache.hadoop.fs.Path(p, s".manifest.tmp.${java.util.UUID.randomUUID()}"))
    val o = fs.create(tmp, true)
    try o.write(mapper.writeValueAsString(root).getBytes("UTF-8")) finally o.close()
    // OVERWRITING rename: delete-then-rename would leave a manifest-less
    // window in which any concurrent topK/readAssigned/semDedupIncrement
    // fails — readers are not covered by the single-MAINTAINER contract,
    // only writers are. Schemes without an AbstractFileSystem binding
    // (stock s3a) degrade to exactly that small window, LOUDLY, instead
    // of being unable to publish at all.
    graft.tables.AtomicRename.overwrite(
      fs, spark.sparkContext.hadoopConfiguration, tmp, target)
  }

  /** Fold new vectors in WITHOUT retraining: assign them to the frozen
    * centroids, write `data/<name>`, then publish it in the manifest — no
    * stored file is read or rewritten (IvfIndexSpec pins the seed
    * byte-identical). `name` is the idempotence key: re-running the same
    * increment under the same name overwrites itself; distinct increments
    * need distinct names. Data lands BEFORE the manifest references it, so
    * a crashed append is invisible to readers.
    */
  def append(
      spark: SparkSession, dir: String, vecs: DataFrame, name: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      graceMs: Long = DefaultCompactGraceMs): Unit = {
    require(exists(spark, dir), s"no IVF index at $dir")
    require(name.nonEmpty && name != "seed" && !name.startsWith("compact-") && !name.contains("/"),
      s"append name '$name' must be a non-reserved single path segment")
    // a name colliding with a RETIRED subdir still inside its grace
    // window is refused: overwrite-mode would delete that subdir's files
    // through a path compact's deferral cannot protect — a reader planned
    // on the PRIOR manifest (which still references it) loses its files
    // mid-scan. The common trigger is re-appending a recycled name (e.g.
    // "increment") right after a compact absorbed it. ONLY ledgered
    // (compact-retired) names are refused, and each against the grace its
    // retiring compact recorded: a never-manifested leftover (a crashed
    // append) was never planned by any reader, so the documented
    // same-name retry overwrites it freely — and a retired name older
    // than its grace is a legitimate overwrite target (the sweep would
    // have deleted it). graceMs <= 0 is the explicit opt-out (spec/
    // rebuild mode: caller asserts no concurrent readers).
    if (graceMs > 0) {
      val (p, fs) = fsOf(spark, dir)
      val sub = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(p, "data"), name)
      if (!readManifest(spark, dir).contains(name) && fs.exists(sub)) {
        readRetired(spark, dir).get(name).foreach { case (ts, g) =>
          val age = System.currentTimeMillis() - ts
          if (age < g) throw new IllegalStateException(
            s"IvfIndexAppendNameInGrace: data/$name was retired by a compact ${age}ms ago, " +
              s"inside its ${g}ms deletion grace — a reader planned on the prior manifest " +
              "may be scanning it; append under a fresh name, or wait out the grace")
        }
      }
    }
    // the stored payload follows the index KIND: raw vectors for a plain
    // IVF index, frozen-codebook codes for a PQ one — an append can never
    // mix payloads into a layout queries would misread
    if (isPq(spark, dir))
      writeEncoded(vecs, s"$dir/data/$name", centroids(spark, dir), pqBooks(spark, dir),
        idCol, vecCol)
    else
      writeAssigned(vecs, s"$dir/data/$name", centroids(spark, dir), idCol, vecCol)
    writeManifest(spark, dir, readManifest(spark, dir) :+ name)
  }

  /** Deletion grace for subdirs a compaction unreferences: a reader that
    * planned its file set from the PRIOR manifest may still be scanning
    * when the manifest swings — deleting its files mid-query fails the
    * query (the remove_orphan_files hazard class; the single-MAINTAINER
    * contract covers writers, not readers). Absorbed subdirs are swept
    * only once OLDER than this grace (each [[compact]] tick sweeps what
    * earlier ticks deferred), so any reader whose scan outlives the
    * grace is the misconfiguration, sized like a query timeout.
    */
  val DefaultCompactGraceMs: Long = 15 * 60 * 1000L

  // ------------------------------------------------------ retired ledger
  // The grace clock lives in a tiny JSON sidecar (`_retired.json`:
  // subdir name → unreference timestamp), not in directory mtimes: the
  // previous setTimes-based stamp was a SILENT no-op on object stores
  // (directory prefixes have no mutable mtime), and then the very tick
  // that absorbed a subdir would sweep it instantly by age-at-creation —
  // under a reader planned on the prior manifest, on exactly the
  // filesystems the grace exists for. The ledger is written BEFORE the
  // manifest swings (a crash in between leaves stamps for dirs still
  // referenced, which the sweep ignores and the retrying tick re-stamps),
  // published by the same atomic-rename helper as the manifest, and
  // consulted by both the sweep and [[append]]'s name-recycle guard.
  // Crash-orphaned subdirs (written, never manifested, so never in the
  // ledger) keep the creation-mtime clock — on an mtime-less store they
  // sweep eagerly, which is safe: no reader ever planned them.

  private def retiredPath(p: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(p, "_retired.json")

  /** Ledger entry: (unreference timestamp ms, the grace the RETIRING
    * compact promised). The grace rides in the entry so a later caller
    * with a different (or default) graceMs cannot shorten a promise an
    * operator made with a longer one — the sweep and the append
    * name-recycle guard both age each entry against ITS OWN grace.
    */
  private def readRetired(spark: SparkSession, dir: String): Map[String, (Long, Long)] = {
    val (p, fs) = fsOf(spark, dir)
    val rp = retiredPath(p)
    if (!fs.exists(rp)) return Map.empty
    val in = fs.open(rp)
    val node = try mapper.readTree(in.readAllBytes()) finally in.close()
    val it = node.get("subdirs").fields()
    val b = Map.newBuilder[String, (Long, Long)]
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      // tolerate the flat pre-grace format (name -> unreference ms):
      // such entries age against the default grace — the same tolerant-
      // parse convention as bandIndexStoresIds' absent-field default,
      // instead of breaking all maintenance on a pre-upgrade index
      b += e.getKey -> (if (v.isNumber) (v.asLong(), DefaultCompactGraceMs)
                        else ((v.get("ts").asLong(), v.get("graceMs").asLong())))
    }
    b.result()
  }

  private def writeRetired(spark: SparkSession, dir: String, m: Map[String, (Long, Long)]): Unit = {
    val (p, fs) = fsOf(spark, dir)
    val root = mapper.createObjectNode()
    val subs = root.putObject("subdirs")
    m.toSeq.sortBy(_._1).foreach { case (k, (ts, g)) =>
      val e = subs.putObject(k); e.put("ts", ts); e.put("graceMs", g)
    }
    val tmp = new org.apache.hadoop.fs.Path(p, s".retired.tmp.${java.util.UUID.randomUUID()}")
    val o = fs.create(tmp, true)
    try o.write(mapper.writeValueAsString(root).getBytes("UTF-8")) finally o.close()
    graft.tables.AtomicRename.overwrite(
      fs, spark.sparkContext.hadoopConfiguration, tmp, retiredPath(p))
  }

  /** Maintenance-cadence compaction: fold every manifested subdir into one
    * `compact-<uuid>`, publish the new one-entry manifest, then sweep
    * unreferenced data subdirs older than `graceMs` (which also collects
    * orphans from a previously crashed compact/append — and, on THIS
    * tick, the subdirs a PRIOR tick absorbed but deferred). Crash-safe in
    * the direction that matters: the folded subdir lands before the
    * manifest swings to it, and the manifest swings before anything is
    * deleted — a reader never plans a half-written or double-counted
    * vector, and a reader mid-scan on the prior manifest keeps its files
    * for the grace window.
    */
  def compact(spark: SparkSession, dir: String, graceMs: Long = DefaultCompactGraceMs): Unit = {
    val (p, fs) = fsOf(spark, dir)
    val data = new org.apache.hadoop.fs.Path(p, "data")
    val live = readManifest(spark, dir)
    if (live.size > 1) {
      val target = s"compact-${java.util.UUID.randomUUID()}"
      // rows are already assigned/encoded — fold verbatim whatever payload
      // the index kind stores, keeping the list column as the partition key
      // (no re-assignment, the quantizer and codebooks are frozen)
      readAssigned(spark, dir)
        .repartition(col("list"))
        .write.mode("overwrite").partitionBy("list").parquet(s"$dir/data/$target")
      // the grace clock starts at UNREFERENCE, not at creation: stamp the
      // soon-to-be-absorbed subdirs into the retired LEDGER before the
      // manifest swings — stamping a still-referenced dir is harmless
      // (the sweep only looks at unreferenced ones), while stamping after
      // the swing leaves a crash window in which a retried tick sees no
      // stamp and sweeps by creation age under a reader planned on the
      // prior manifest. A ledger, not mtimes: see the retired-ledger note.
      if (graceMs > 0) {
        val stampAt = System.currentTimeMillis()
        writeRetired(spark, dir,
          readRetired(spark, dir) ++ live.map(_ -> ((stampAt, graceMs))))
      }
      writeManifest(spark, dir, Seq(target))
    }
    // sweep runs even when nothing folded: a one-entry manifest can still
    // have deferred-absorbed (ledger-stamped at unreference) or
    // crash-orphaned (never manifested, never stamped — creation-mtime
    // clock) subdirs waiting out the grace from earlier ticks
    val keep = readManifest(spark, dir).toSet
    if (fs.exists(data)) {
      val retired = readRetired(spark, dir)
      val now = System.currentTimeMillis()
      val unref = fs.listStatus(data).filter(_.isDirectory)
        .filterNot(s => keep.contains(s.getPath.getName))
      // graceMs <= 0 = NO grace (sweep every unreferenced subdir now) —
      // the spec/rebuild mode, never a production default. Ledgered
      // entries age against the grace their RETIRING compact recorded;
      // never-ledgered crash orphans against this call's grace by
      // creation mtime (no reader ever planned them).
      val sweep = unref.filter { s =>
        graceMs <= 0 || retired.get(s.getPath.getName)
          .map { case (ts, g) => now - ts >= g }
          .getOrElse(s.getModificationTime < now - graceMs)
      }
      sweep.foreach(s => fs.delete(s.getPath, true))
      // ledger hygiene: keep only entries for unreferenced dirs that
      // SURVIVED this sweep — swept, re-referenced (a crashed tick's
      // stamp) and externally-vanished names all drop out
      val keepEntries = (unref.map(_.getPath.getName).toSet --
        sweep.map(_.getPath.getName).toSet)
      val remaining = retired.view.filterKeys(keepEntries.contains).toMap
      if (remaining != retired) writeRetired(spark, dir, remaining)
    }
  }

  /** The stored assigned corpus `(id, vec, list)`, optionally pruned to a
    * probe set — as ONE scan regardless of how many appends accumulated:
    * the concrete `list=N` directories of every manifested subdir are
    * enumerated on the driver (probe filtering happens HERE, so pruning is
    * a planning-time directory cut, not a runtime filter), read in a
    * single `spark.read`, and the list id is re-derived map-side from the
    * file path. The alternative — one scan node per subdir — is the exact
    * per-increment plan accretion the Iceberg MoR read had to collapse;
    * a year of daily appends must not cost 365 codegen'd scan nodes.
    */
  /** The concrete `list=N` directories the given probe set plans, across
    * every manifested subdir — the planning-time directory cut readers
    * build their single scan from.
    */
  private def listDirs(
      spark: SparkSession, dir: String,
      keep: Option[Set[Int]]): Seq[org.apache.hadoop.fs.Path] = {
    val (p, fs) = fsOf(spark, dir)
    readManifest(spark, dir).flatMap { sub =>
      val sp = new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(p, "data"), sub)
      fs.listStatus(sp).toSeq.filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("list="))
        .filter { d =>
          val idStr = d.getName.stripPrefix("list=")
          // the write path rejects null assignments, so a non-numeric
          // partition dir is external damage — name it, don't NumberFormat
          require(idStr.nonEmpty && idStr.forall(_.isDigit),
            s"IvfIndexCorruptListDir: $d is not a numeric list partition")
          keep.forall(_.contains(idStr.toInt))
        }
    }
  }

  /** Concrete parquet part files a probe set plans — the sf1 work-count
    * observable that proves probe IO tracks the probed lists' data, not
    * the corpus (seconds drift with the host; planned files do not).
    */
  private def plannedFileCount(spark: SparkSession, dir: String, probed: Seq[Int]): Long = {
    val (_, fs) = fsOf(spark, dir)
    listDirs(spark, dir, Some(probed.toSet)).map { d =>
      fs.listStatus(d).count(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith(".")).toLong
    }.sum
  }

  def readAssigned(
      spark: SparkSession, dir: String, probeLists: Option[Seq[Int]] = None): DataFrame = {
    val listDirs = this.listDirs(spark, dir, probeLists.map(_.toSet))
    if (listDirs.isEmpty) {
      import org.apache.spark.sql.types._
      val payload =
        if (isPq(spark, dir)) StructField("codes", ArrayType(IntegerType))
        else StructField("vec", ArrayType(FloatType))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("id", LongType), payload, StructField("list", IntegerType))))
    }
    spark.read.parquet(listDirs.map(_.toString): _*)
      .withColumn("list",
        regexp_extract(col("_metadata.file_path"), "/list=([0-9]+)/", 1).cast("int"))
  }

  /** Driver-materialization bound for the query/increment side of the
    * stored-index joins (the StreamSpec.deleteBroadcastMaxRows family):
    * the side is broadcast only while its EXPLODED row count is within
    * the bound; past it the join degrades LOUDLY to a shuffled hash join
    * — the stored corpus side may then shuffle, results stay exact. A
    * gate-scale query set is operator input, not admission-controlled
    * micro-batch output: nothing else bounds a bulk query set or a large
    * daily increment, so an unconditional broadcast would OOM the
    * BroadcastExchange with no warning.
    */
  val DefaultBroadcastMaxRows: Long = 2000000L

  /** Byte twin of [[DefaultBroadcastMaxRows]]: a raw row bound is blind to
    * WIDTH — topK/topKPq/semDedupIncrement broadcast rows that carry the
    * full query vector, so at dim 768 the 2M-row default is ~12 GB, past
    * Spark's 8 GB broadcast hard cap and any sane driver heap, and the
    * bound meant to prevent the BroadcastExchange OOM would not bound it.
    * The effective bound is therefore rows AND estimated bytes
    * (rows × (8·dim + overhead), dim known at call time from the frozen
    * centroids), whichever trips first; narrow id-only sides (the work
    * counters) size by overhead alone. 512 MB default: comfortably inside
    * the 8 GB cap and typical `spark.driver.memory`. At the gate dim (64)
    * it tightens the 2M row default to ~930k — still three orders of
    * magnitude above any gate's query side, so gate plans are unchanged;
    * at dim 768 it is the only bound that actually binds (~86k rows).
    */
  val DefaultBroadcastMaxBytes: Long = 512L * 1024 * 1024

  /** Effective broadcast row bound: the caller's row cap tightened by the
    * byte cap at this dim. Spec-visible (the bound arithmetic is pinned
    * without needing a 12 GB fixture).
    */
  private[graft] def broadcastRowBound(
      maxRows: Long, maxBytes: Long, dim: Int, carriesVector: Boolean): Long = {
    val rowBytes = if (carriesVector) 8L * dim + 64L else 64L
    math.min(maxRows, math.max(1L, maxBytes / rowBytes))
  }

  /** One action answers BOTH planner questions: the distinct probed lists
    * (drives the planning-time directory cut) and the exploded row count
    * of the side that wants to broadcast (drives the bound decision).
    */
  private def probeStats(side: DataFrame, listCol: String): (Seq[Int], Long) = {
    val rows = side.groupBy(col(listCol)).agg(count(lit(1))).collect()
    // a null list here means null/empty embeddings in an INCREMENT (query
    // sides explode their probes, which drops null rows) — same loud
    // contract as the write path, not a driver-side NPE
    rows.find(_.isNullAt(0)).foreach(r => throw new IllegalArgumentException(
      s"IvfIndexNullAssignment: ${r.getLong(1)} increment row(s) have a null/empty " +
        "embedding — cannot assign an IVF list"))
    (rows.map(_.getInt(0)).toSeq, rows.map(_.getLong(1)).sum)
  }

  /** Exploded (query_id[, q_vec, q_norm], q_list) probe rows with a LOUD
    * null guard: `explode` silently DROPS a null probe array, so a
    * null/empty-embedding query would simply vanish from the top-k output
    * — the silent-result-shrink twin of the write path's
    * IvfIndexNullAssignment, converted to the same named executor-side
    * error instead.
    */
  private def probeSide(
      queries: DataFrame, bc: org.apache.spark.broadcast.Broadcast[Array[Double]],
      dim: Int, nLists: Int, nprobe: Int,
      idCol: String, vecCol: String, withVec: Boolean): DataFrame = {
    val probes = Similarity.ivfProbes(col(vecCol), bc, dim, nLists, nprobe).cast("array<int>")
    // null/0/NaN/Inf norm covers NULL, EMPTY, ALL-ZERO, NaN- and
    // Inf-COMPONENT queries (zero/NaN/Inf ones would otherwise probe a
    // NaN-argmax list and score NaN cosines that beat every real
    // neighbor)
    val nrm = Similarity.norm(col(vecCol))
    val guarded = when(probes.isNull || coalesce(nrm, lit(0.0)) === 0.0 || isnan(nrm) ||
        nrm === lit(Double.PositiveInfinity),
      raise_error(concat(
        lit("IvfIndexNullAssignment: query "), col(idCol).cast("string"),
        lit(" has a null/empty/zero/NaN/Inf embedding — cannot probe the index"))).cast("array<int>"))
      .otherwise(probes)
    if (withVec)
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        Similarity.norm(col(vecCol)).as("q_norm"), explode(guarded).as("q_list"))
    else
      queries.select(col(idCol).as("query_id"), explode(guarded).as("q_list"))
  }

  private def hintSmall(df: DataFrame, small: Boolean, what: String, rows: Long): DataFrame =
    if (small) broadcast(df)
    else {
      System.err.println(
        s"IVF INDEX: $rows $what rows exceed the broadcast bound — " +
          "joining via a shuffled hash join (still exact)")
      df.hint("shuffle_hash")
    }

  /** Cosine top-k THROUGH the stored index: queries probe their `nprobe`
    * nearest centroid lists; only those lists' partitions are scanned.
    * Same scoring op order as [[Similarity.ivfTopK]] (and the q_ann_ivf
    * DuckDB oracle): `dot(q,c) / (sqrt(dot(q,q)) * sqrt(dot(c,c)))`, ties
    * by neighbor id — so the indexed path is bit-comparable to the direct
    * one.
    *
    * The probe set is collected on the driver to drive partition pruning:
    * it is bounded by `numLists` (the centroid count, itself
    * driver-resident), never by the query or corpus size. The query side
    * is broadcast only within `broadcastMaxRows` (exploded by nprobe);
    * past it the join loudly degrades to a shuffle — see
    * [[DefaultBroadcastMaxRows]].
    */
  def topK(
      spark: SparkSession, dir: String, queries: DataFrame, k: Int,
      nprobe: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastMaxRows: Long = DefaultBroadcastMaxRows,
      broadcastMaxBytes: Long = DefaultBroadcastMaxBytes): DataFrame = {
    require(!isPq(spark, dir), s"$dir stores PQ codes — use topKPq (raw vectors are not stored)")
    graft.sql.VecDot.ensureRegistered(spark)
    val cents = centroids(spark, dir)
    val bc = Similarity.broadcastCentroids(cents)
    val (dim, nLists) = (cents.head.length, cents.length)
    val q = probeSide(queries, bc, dim, nLists, nprobe, idCol, vecCol, withVec = true)
    val (probed, qRows) = probeStats(q, "q_list")
    val bound = broadcastRowBound(broadcastMaxRows, broadcastMaxBytes, dim, carriesVector = true)
    val c = readAssigned(spark, dir, Some(probed)).select(
      col("id").as("neighbor_id"), col("vec").as("c_vec"),
      Similarity.norm(col("vec")).as("c_norm"), col("list").as("c_list"))
    val scored = c
      .join(hintSmall(q, qRows <= bound, "exploded query", qRows),
        col("q_list") === col("c_list") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (Similarity.dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k).drop("_rn")
  }

  /** Probe-side work observables for [[topK]]/[[topKPq]] (the bench's sf1
    * work block): (exploded query-probe rows, scored candidate pairs,
    * planned part files). Counts are deterministic where seconds are not
    * — flat candidates + planned files at a high wall-clock ratio name
    * host noise; growing counts name real work growth. Payload-agnostic
    * (id/list only), so one method serves both index kinds.
    */
  def probeWorkCounts(
      spark: SparkSession, dir: String, queries: DataFrame,
      nprobe: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastMaxRows: Long = DefaultBroadcastMaxRows,
      broadcastMaxBytes: Long = DefaultBroadcastMaxBytes): (Long, Long, Long) = {
    graft.sql.VecDot.ensureRegistered(spark)
    val cents = centroids(spark, dir)
    val bc = Similarity.broadcastCentroids(cents)
    val (dim, nLists) = (cents.head.length, cents.length)
    val q = probeSide(queries, bc, dim, nLists, nprobe, idCol, vecCol, withVec = false)
    val (probed, qRows) = probeStats(q, "q_list")
    // the count twin's probe side is id+list only (no vector), so its
    // byte bound sizes by the narrow row — but it must still not OOM a
    // broadcast the measured leg would have refused
    val bound = broadcastRowBound(broadcastMaxRows, broadcastMaxBytes, dim, carriesVector = false)
    val c = readAssigned(spark, dir, Some(probed))
      .select(col("id"), col("list").as("c_list"))
    val candidates = c.join(hintSmall(q, qRows <= bound, "exploded query", qRows),
      col("q_list") === col("c_list") && col("query_id") =!= col("id")).count()
    (qRows, candidates, plannedFileCount(spark, dir, probed))
  }

  /** Work observables for [[semDedupIncrement]]: (increment rows, probed
    * lists, stored corpus rows the pruned scan reads, planned part
    * files) — the "IO tracks the increment, never the corpus" claim as
    * counts.
    */
  def semDedupWorkCounts(
      spark: SparkSession, dir: String, increment: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): (Long, Long, Long, Long) = {
    graft.sql.VecDot.ensureRegistered(spark)
    val cents = centroids(spark, dir)
    val bc = Similarity.broadcastCentroids(cents)
    val inc = increment.select(
      requiredList(
        Similarity.ivfAssign(col(vecCol), bc, cents.head.length, cents.length).cast("int"),
        Similarity.norm(col(vecCol)), col(idCol)).as("_list"))
    val (probed, incRows) = probeStats(inc, "_list")
    val corpusRows = readAssigned(spark, dir, Some(probed)).count()
    (incRows, probed.size.toLong, corpusRows, plannedFileCount(spark, dir, probed))
  }

  /** SemDedup INCREMENT against the stored index — the fourth member of
    * the incremental-tier family (exact dedup → bloom index, near-dup →
    * MinHash band index, ANN → this IVF index, and now semantic dedup
    * through the SAME stored artifact): an increment vector is suppressed
    * when ANY same-cluster stored vector has cosine ≥ `threshold` with it.
    * Stored corpus members all precede the increment in
    * [[Similarity.semDedup]]'s keep order by arrival, so no order
    * predicate is needed; intra-increment near-dups both survive (compose
    * the batch [[Similarity.semDedup]] upstream — the family's usual
    * layering). Survivors are what the caller [[append]]s back, closing
    * the daily loop.
    *
    * Plan shape: assignment is the map-only broadcast argmax; the stored
    * corpus is scanned ONCE, pruned to the increment's own clusters
    * (planning-time directory cut — IO ∝ the increment's cluster data,
    * never the corpus), with the increment broadcast to it while it fits
    * `broadcastMaxRows` — past the bound both joins loudly degrade to
    * shuffles (the corpus side may then shuffle; the suppression set is
    * identical — see [[DefaultBroadcastMaxRows]]). Cosines use
    * [[Similarity.semDedup]]'s exact IEEE op order, so the DuckDB oracle
    * (q_semdedup_increment) replays the suppression decision bit-for-bit.
    */
  def semDedupIncrement(
      spark: SparkSession, dir: String, increment: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastMaxRows: Long = DefaultBroadcastMaxRows,
      broadcastMaxBytes: Long = DefaultBroadcastMaxBytes): DataFrame = {
    require(!isPq(spark, dir),
      s"$dir stores PQ codes — semantic dedup needs exact cosines over a raw-vector index")
    graft.sql.VecDot.ensureRegistered(spark)
    val cents = centroids(spark, dir)
    val bc = Similarity.broadcastCentroids(cents)
    val (dim, nLists) = (cents.head.length, cents.length)
    // materialize once (increment-sized): consumed by the probe collect,
    // the domination join, and the final anti join
    val inc = increment.select(col(idCol), col(vecCol),
        Similarity.ivfAssign(col(vecCol), bc, dim, nLists).cast("int").as("_list"),
        Similarity.norm(col(vecCol)).as("_nrm"))
      .withColumn("_list", requiredList(col("_list"), col("_nrm"), col(idCol)))
      .localCheckpoint()
    val (probed, incRows) = probeStats(inc, "_list")
    val incSmall =
      incRows <= broadcastRowBound(broadcastMaxRows, broadcastMaxBytes, dim, carriesVector = true)
    if (!incSmall) System.err.println(
      s"IVF INDEX: $incRows increment rows exceed the broadcast bound — both the " +
        "suppression join and the dominated-id anti join run as shuffled hash joins (still exact)")
    // dominated ⊆ the increment's keys, so ONE bound decision governs both
    // hints (and one warning names the side that is actually big)
    def hint(df: DataFrame): DataFrame =
      if (incSmall) broadcast(df) else df.hint("shuffle_hash")
    val corpus = readAssigned(spark, dir, Some(probed)).select(
      col("vec").as("_s_v"), Similarity.norm(col("vec")).as("_s_nrm"),
      col("list").as("_s_list"))
    val dominated = corpus
      .join(hint(inc), col("_s_list") === col("_list") &&
        Similarity.dot(col(vecCol), col("_s_v")) / (col("_nrm") * col("_s_nrm")) >= threshold)
      .select(col(idCol)).distinct()
    inc.join(hint(dominated), Seq(idCol), "left_anti")
      .select(col(idCol), col(vecCol))
  }

  /** Asymmetric top-k THROUGH a PQ-coded index: exact query side,
    * reconstructed corpus side — [[Similarity.ivfPqTopK]]'s exact scoring
    * op order (`dot(q, reconstruct(codes)) / (q_norm * recon_norm)`, ties
    * by neighbor id), with the codes read from STORAGE instead of encoded
    * on the fly. The scan ships (id, numSub small ints, list) per
    * candidate — never a raw vector — and prunes to the probed `list=`
    * directories like [[topK]]: the IVF layer bounds WHICH pairs are
    * scored, PQ bounds WHAT each candidate costs to store and move.
    */
  def topKPq(
      spark: SparkSession, dir: String, queries: DataFrame, k: Int,
      nprobe: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      broadcastMaxRows: Long = DefaultBroadcastMaxRows,
      broadcastMaxBytes: Long = DefaultBroadcastMaxBytes): DataFrame = {
    require(isPq(spark, dir), s"$dir stores raw vectors — use topK")
    graft.sql.VecDot.ensureRegistered(spark)
    val cents = centroids(spark, dir)
    val books = pqBooks(spark, dir)
    val bc = Similarity.broadcastCentroids(cents)
    val (dim, nLists) = (cents.head.length, cents.length)
    val q = probeSide(queries, bc, dim, nLists, nprobe, idCol, vecCol, withVec = true)
    val (probed, qRows) = probeStats(q, "q_list")
    val bound = broadcastRowBound(broadcastMaxRows, broadcastMaxBytes, dim, carriesVector = true)
    val c = readAssigned(spark, dir, Some(probed))
      .select(col("id").as("neighbor_id"), col("list").as("c_list"),
        Similarity.pqReconstruct(col("codes"), books).as("recon"))
      .withColumn("r_norm", Similarity.norm(col("recon")))
    val scored = c
      .join(hintSmall(q, qRows <= bound, "exploded query", qRows),
        col("q_list") === col("c_list") && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (Similarity.dot(col("q_vec"), col("recon")) / (col("q_norm") * col("r_norm"))).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k).drop("_rn")
  }
}
