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

  def stampChangelog(root: String, folder: String): Unit = {
    val p = Paths.get(root, "Changelog")
    Files.createDirectories(p)
    Files.write(p.resolve("changelog.info"), folder.getBytes(StandardCharsets.UTF_8))
  }
}
