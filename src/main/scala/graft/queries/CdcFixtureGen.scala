package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

/** Deterministically materializes the `events` table as a Synapse Link
  * incremental-CSV export (batch folders + model.json + changelog) so the
  * gate can drive the REAL CDC pipeline end-to-end and compare its merged
  * output against a DuckDB oracle.
  *
  * CDC mapping of the events stream: key = `user_id` (→ CDM `Id`),
  * version = `event_id` (→ `versionnumber`), tombstone =
  * `event_type == "error"` (→ `IsDelete`). Folder 1 holds events below the
  * half cut, folder 2 the rest — the same split as `q_cdc_merge`, so the
  * expected post-merge state is SQL-expressible.
  */
object CdcFixtureGen {
  val EntityName = "events_cdm"
  val Folder1 = "2024-01-01T00.00.00Z"
  val Folder2 = "2024-01-02T00.00.00Z"

  private val modelJson =
    s"""{"name":"cdm","version":"1.0","entities":[
       |  {"$$type":"LocalEntity","name":"$EntityName","attributes":[
       |    {"name":"Id","dataType":"guid"},
       |    {"name":"SinkCreatedOn","dataType":"dateTime"},
       |    {"name":"eventtype","dataType":"string"},
       |    {"name":"versionnumber","dataType":"int64"},
       |    {"name":"IsDelete","dataType":"boolean"}]}]}""".stripMargin

  /** The sf-proportional half cut, identical to `Queries.qCdcMerge`. */
  def cut(totalEvents: Long): Long = 500L * math.max(1L, totalEvents / 1000L)

  /** Write (or reuse) the export at a location derived from the source dir;
    * returns the export root. Rows are sorted by event_id so repeated
    * generations are byte-identical.
    */
  def materialize(spark: SparkSession, sfDir: String): String = {
    // Cache key: full sanitized path (a 32-bit hashCode can collide across
    // SF dirs and serve one SF's export for another) + the source
    // parquet's (length, mtime) so a REGENERATED events table invalidates
    // the cached export instead of stale-serving the old table.
    val src = new java.io.File(s"$sfDir/events.parquet")
    val srcSig = s"${src.length}-${src.lastModified}"
    val dirKey = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val root = Paths.get(System.getProperty("java.io.tmpdir"), s"graft-cdc-export-$dirKey")
    val done = root.resolve("_complete")
    // Cross-process exclusion: Verify and a test session may materialize
    // the same export concurrently; without the lock one JVM's clean-slate
    // delete races the other's chunk writes and the e2e ingests a partial
    // folder nondeterministically.
    Files.createDirectories(root.getParent)
    val lockCh = java.nio.channels.FileChannel.open(
      root.getParent.resolve(s".graft-cdc-export-$dirKey.lock"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    val lock = lockCh.lock()
    try {
      materializeLocked(spark, sfDir, root, done, srcSig)
    } finally {
      lock.release(); lockCh.close()
    }
  }

  private def materializeLocked(
      spark: SparkSession, sfDir: String, root: Path, done: Path, srcSig: String): String = {
    if (Files.exists(done) &&
      new String(Files.readAllBytes(done), StandardCharsets.UTF_8) == srcSig)
      return root.toString
    // missing/mismatched marker → prior generation died mid-write or the
    // source changed; start from a clean slate so stale chunks can't
    // duplicate rows
    org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)

    // nanosAsLong is session-build config (Main/Bench/Verify/test session)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    // One Spark action: collect unsorted, order driver-side (cheap at any
    // tested SF), derive the cut from the collected length — avoids the
    // separate count() and the distributed sort.
    val rows = events
      .select(col("event_id"), col("user_id"), col("event_type"))
      .collect()
      .sortBy(_.getLong(0))
    val c = cut(rows.length.toLong)

    def csvLine(eventId: Long, userId: Long, eventType: String): String = {
      val isDel = if (eventType == "error") "True" else ""
      s"""$userId,"1/1/2024 0:00:00 PM","$eventType",$eventId,$isDel"""
    }
    def writeFolder(name: String, lines: Array[String]): Unit = {
      val d = root.resolve(name).resolve(EntityName)
      Files.createDirectories(d)
      Files.write(root.resolve(name).resolve("model.json"), modelJson.getBytes(StandardCharsets.UTF_8))
      // several chunk files per folder — exercises file-parallel partitions;
      // chunks are independent → write them concurrently
      val chunkSize = math.max(1, lines.length / 8 + 1)
      val chunks = lines.grouped(chunkSize).zipWithIndex.toArray
      java.util.Arrays.stream(chunks).parallel().forEach { case (chunk, i) =>
        Files.write(d.resolve(s"$i.csv"), (chunk.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
      }
    }

    val (first, second) = rows.partition(_.getLong(0) < c)
    writeFolder(Folder1, first.map(r => csvLine(r.getLong(0), r.getLong(1), r.getString(2))))
    writeFolder(Folder2, second.map(r => csvLine(r.getLong(0), r.getLong(1), r.getString(2))))
    Files.write(root.resolve("model.json"), modelJson.getBytes(StandardCharsets.UTF_8))
    Files.createDirectories(root.resolve("Changelog"))
    Files.write(done, srcSig.getBytes(StandardCharsets.UTF_8))
    root.toString
  }

  // ------------------------------------------------ schema-churn fixture

  val ChurnEntity = "events_churn"

  /** NEWEST model (root + folder 2): canonical order, with a `value` column
    * added after the historical batch was written.
    */
  private val churnModelNew =
    s"""{"name":"cdm","version":"2.0","entities":[
       |  {"$$type":"LocalEntity","name":"$ChurnEntity","attributes":[
       |    {"name":"Id","dataType":"guid"},
       |    {"name":"SinkCreatedOn","dataType":"dateTime"},
       |    {"name":"eventtype","dataType":"string"},
       |    {"name":"versionnumber","dataType":"int64"},
       |    {"name":"IsDelete","dataType":"boolean"},
       |    {"name":"value","dataType":"double"}]}]}""".stripMargin

  /** HISTORICAL model (folder 1): written before the churn — `versionnumber`
    * and `eventtype` are SWAPPED relative to the newest order, and `value`
    * does not exist yet. Parsing these CSVs under the newest model's
    * positions would silently put event types into the version column.
    */
  private val churnModelOld =
    s"""{"name":"cdm","version":"1.0","entities":[
       |  {"$$type":"LocalEntity","name":"$ChurnEntity","attributes":[
       |    {"name":"Id","dataType":"guid"},
       |    {"name":"SinkCreatedOn","dataType":"dateTime"},
       |    {"name":"versionnumber","dataType":"int64"},
       |    {"name":"eventtype","dataType":"string"},
       |    {"name":"IsDelete","dataType":"boolean"}]}]}""".stripMargin

  /** Materialize a SCHEMA-CHURN export: folder 1 holds first-half events
    * under the historical model (reordered columns, no `value`), folder 2
    * the rest under the newest model. The changelog is stamped at folder 2
    * so a batch read covers both. Gates the reference's per-batch schema
    * authority (`/root/reference/docs/backfill.md:8-12`): rows in each
    * folder must parse under that folder's OWN model.json.
    */
  def materializeChurn(spark: SparkSession, sfDir: String): String = {
    val src = new java.io.File(s"$sfDir/events.parquet")
    val srcSig = s"churn1-${src.length}-${src.lastModified}"
    val dirKey = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val root = Paths.get(System.getProperty("java.io.tmpdir"), s"graft-cdc-churn-$dirKey")
    val done = root.resolve("_complete")
    Files.createDirectories(root.getParent)
    val lockCh = java.nio.channels.FileChannel.open(
      root.getParent.resolve(s".graft-cdc-churn-$dirKey.lock"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    val lock = lockCh.lock()
    try {
      if (Files.exists(done) &&
        new String(Files.readAllBytes(done), StandardCharsets.UTF_8) == srcSig)
        return root.toString
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)

      val rows = spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .collect()
        .sortBy(_.getLong(0))
      val c = cut(rows.length.toLong)
      def isDel(t: String) = if (t == "error") "True" else ""
      // folder 1, HISTORICAL column order: Id, SinkCreatedOn, versionnumber, eventtype, IsDelete
      def oldLine(r: org.apache.spark.sql.Row): String =
        s"""${r.getLong(1)},"1/1/2024 0:00:00 PM",${r.getLong(0)},"${r.getString(2)}",${isDel(r.getString(2))}"""
      // folder 2, NEWEST order: Id, SinkCreatedOn, eventtype, versionnumber, IsDelete, value
      // (Double.toString is shortest-roundtrip → the cast re-reads the exact bits)
      def newLine(r: org.apache.spark.sql.Row): String =
        s"""${r.getLong(1)},"1/1/2024 0:00:00 PM","${r.getString(2)}",${r.getLong(0)},${isDel(r.getString(2))},${r.getDouble(3)}"""

      def writeFolder(name: String, model: String, lines: Array[String]): Unit = {
        val d = root.resolve(name).resolve(ChurnEntity)
        Files.createDirectories(d)
        Files.write(root.resolve(name).resolve("model.json"), model.getBytes(StandardCharsets.UTF_8))
        val chunkSize = math.max(1, lines.length / 4 + 1)
        lines.grouped(chunkSize).zipWithIndex.foreach { case (chunk, i) =>
          Files.write(d.resolve(s"$i.csv"), (chunk.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
        }
      }
      val (first, second) = rows.partition(_.getLong(0) < c)
      writeFolder(Folder1, churnModelOld, first.map(oldLine))
      writeFolder(Folder2, churnModelNew, second.map(newLine))
      Files.write(root.resolve("model.json"), churnModelNew.getBytes(StandardCharsets.UTF_8))
      stampChangelog(root.toString, Folder2)
      Files.write(done, srcSig.getBytes(StandardCharsets.UTF_8))
      root.toString
    } finally {
      lock.release(); lockCh.close()
    }
  }

  def stampChangelog(root: String, folder: String): Unit = {
    val p = Paths.get(root, "Changelog")
    Files.createDirectories(p)
    Files.write(p.resolve("changelog.info"), folder.getBytes(StandardCharsets.UTF_8))
  }

  // --------------------------------------------- streaming-content fixture

  val DocsEntity = "docs_cdm"
  val DocsFolders: Seq[String] = (1 to 5).map(i => s"2024-03-0${i}T00.00.00Z")

  private val docsModel =
    s"""{"name":"cdm","version":"1.0","entities":[
       |  {"$$type":"LocalEntity","name":"$DocsEntity","attributes":[
       |    {"name":"Id","dataType":"int64"},
       |    {"name":"SinkCreatedOn","dataType":"dateTime"},
       |    {"name":"body","dataType":"string"},
       |    {"name":"versionnumber","dataType":"int64"},
       |    {"name":"IsDelete","dataType":"boolean"}]}]}""".stripMargin

  /** 5-token synthetic body for doc `d` under family `prefix`: every token
    * embeds BOTH the prefix and d, so two bodies share a 3-gram shingle iff
    * they have the same (prefix, d) — families are exactly-disjoint and the
    * only MinHash collisions are the planted identical copies.
    */
  def docBody(prefix: String, d: Long): String =
    s"${prefix}a$d ${prefix}b$d ${prefix}c$d ${prefix}d$d ${prefix}e$d"

  /** Materialize a 5-folder Synapse export of synthetic DOCUMENT rows (one
    * per `documents.doc_id`) with cross-batch planted duplicates, for the
    * content-dedup streaming gate (q_stream_near_dup_e2e). The plant:
    *
    *   F1 (v1): every d            → (d,        zq·d)   all fresh (the gate
    *            backfills this folder: rows indexed as the seed, never
    *            suppressed)
    *   F2 (v2): d%3==0             → (1e6+d,    zq·d)   dup of F1   [drop]
    *            d%5==0             → (2e6+d,    zr·d)   fresh       [keep]
    *            d%7==0             → (d, IsDelete=True) tombstone   [apply]
    *   F3 (v3): d%10==0            → (3e6+d,    zr·d)   dup of F2   [drop]
    *            d%4==0             → (4e6+d,    zs·d)   fresh       [keep]
    *   F4 (v4): d%6==0             → (5e6+d,    zt·d)   fresh       [keep]
    *     — after F4 (the third STREAMED batch, cadence 3) the pipeline
    *       compacts the band index: the backfill seed and batch-0 fold
    *       into one compact blob, batch-1/2 stay protected
    *   F5 (v5): d%8==0             → (6e6+d,    zq·d)   dup via the COMPACTED blob [drop]
    *            d%12==0            → (7e6+d,    zs·d)   dup via protected batch-1  [drop]
    *            d%18==0            → (8e6+d,    zt·d)   dup via protected batch-2  [drop]
    *            d%9==0             → (9e6+d,    zu·d)   fresh       [keep]
    *            d%11==0 && d%7!=0  → (d,        zq·d)   IN-PLACE UPDATE of a live
    *            key with its own (near-dup) prior text — the same-key
    *            exemption must let it through to the merge at v5; without
    *            it the row's own seed bands would suppress the version bump
    *
    * Duplicates are EXACT copies — identical text gives an identical
    * signature, so every band matches and LSH suppression is certain (the
    * probabilistic near-dup recall curve is gated separately by
    * q_near_dup_pairs / q_incremental_near_dup); what THIS fixture gates is
    * the maintained index's lifecycle: batch appends, replay-safe naming,
    * compaction, and suppression sourced from each index-subdir class.
    */
  def materializeStreamDocs(spark: SparkSession, sfDir: String): String = {
    val src = new java.io.File(s"$sfDir/documents.parquet")
    val srcSig = s"docs2-${src.length}-${src.lastModified}"
    val dirKey = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val root = Paths.get(System.getProperty("java.io.tmpdir"), s"graft-cdc-docs-$dirKey")
    val done = root.resolve("_complete")
    Files.createDirectories(root.getParent)
    val lockCh = java.nio.channels.FileChannel.open(
      root.getParent.resolve(s".graft-cdc-docs-$dirKey.lock"),
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    val lock = lockCh.lock()
    try {
      if (Files.exists(done) &&
        new String(Files.readAllBytes(done), StandardCharsets.UTF_8) == srcSig)
        return root.toString
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)

      val ids = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id")).collect().map(_.getLong(0)).sorted

      def line(id: Long, body: String, v: Long, isDel: Boolean): String =
        s"""$id,"1/1/2024 0:00:00 PM","$body",$v,${if (isDel) "True" else ""}"""
      def writeFolder(name: String, lines: Array[String]): Unit = {
        val d = root.resolve(name).resolve(DocsEntity)
        Files.createDirectories(d)
        Files.write(root.resolve(name).resolve("model.json"), docsModel.getBytes(StandardCharsets.UTF_8))
        val chunkSize = math.max(1, lines.length / 4 + 1)
        lines.grouped(chunkSize).zipWithIndex.foreach { case (chunk, i) =>
          Files.write(d.resolve(s"$i.csv"), (chunk.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
        }
      }

      writeFolder(DocsFolders(0), ids.map(d => line(d, docBody("zq", d), 1L, isDel = false)))
      writeFolder(DocsFolders(1),
        ids.filter(_ % 3 == 0).map(d => line(1000000L + d, docBody("zq", d), 2L, isDel = false)) ++
        ids.filter(_ % 5 == 0).map(d => line(2000000L + d, docBody("zr", d), 2L, isDel = false)) ++
        ids.filter(_ % 7 == 0).map(d => line(d, "", 2L, isDel = true)))
      writeFolder(DocsFolders(2),
        ids.filter(_ % 10 == 0).map(d => line(3000000L + d, docBody("zr", d), 3L, isDel = false)) ++
        ids.filter(_ % 4 == 0).map(d => line(4000000L + d, docBody("zs", d), 3L, isDel = false)))
      writeFolder(DocsFolders(3),
        ids.filter(_ % 6 == 0).map(d => line(5000000L + d, docBody("zt", d), 4L, isDel = false)))
      writeFolder(DocsFolders(4),
        ids.filter(_ % 8 == 0).map(d => line(6000000L + d, docBody("zq", d), 5L, isDel = false)) ++
        ids.filter(_ % 12 == 0).map(d => line(7000000L + d, docBody("zs", d), 5L, isDel = false)) ++
        ids.filter(_ % 18 == 0).map(d => line(8000000L + d, docBody("zt", d), 5L, isDel = false)) ++
        ids.filter(_ % 9 == 0).map(d => line(9000000L + d, docBody("zu", d), 5L, isDel = false)) ++
        ids.filter(d => d % 11 == 0 && d % 7 != 0)
          .map(d => line(d, docBody("zq", d), 5L, isDel = false)))
      Files.write(root.resolve("model.json"), docsModel.getBytes(StandardCharsets.UTF_8))
      Files.createDirectories(root.resolve("Changelog"))
      Files.write(done, srcSig.getBytes(StandardCharsets.UTF_8))
      root.toString
    } finally {
      lock.release(); lockCh.close()
    }
  }
}
