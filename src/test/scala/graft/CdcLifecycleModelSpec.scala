package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.OffsetDateTime

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.pipeline.{CdcPipeline, StreamSpec}
import graft.tables.SnapshotTable

/** Randomized end-to-end CDC lifecycle model test: seeded random op
  * sequences (inserts, newer/STALE updates, deletes, stale tombstones,
  * re-inserts after delete, multi-chunk folders) flow through the REAL
  * path — backfill Overwrite over the opening folders, then streamed
  * per-folder merges (`maxFoldersPerTrigger = 1`) — and the final table
  * must equal an independent in-memory model of the reference's merge
  * rules:
  *
  *  - backfill = ONE batch: per key, max-version row wins across all
  *    closed folders; a winning tombstone means absent
  *    (`CdcPipeline.runBackfill` stages the whole range then drops
  *    deletes);
  *  - each streamed folder = in-batch latest-version dedup, then
  *    update-if-newer / matched-delete / insert vs the target, target
  *    winning version ties (`SnapshotTable.merge`'s (version, pri)
  *    ordering) — so a stale update or stale tombstone is a no-op, and a
  *    re-insert after a delete lands regardless of the dead version.
  *
  * The directed ConformanceSpec cases pin each rule once; this spec walks
  * hundreds of random interleavings of all of them per seed.
  */
class CdcLifecycleModelSpec extends SparkSpec {

  private val keyPool: IndexedSeq[String] =
    (0 until 24).map(i => f"aaaa$i%04d-1111-2222-3333-444444444444")

  private sealed trait Op { def key: String; def version: Long }
  private case class Upsert(key: String, version: Long, display: String) extends Op
  private case class Delete(key: String, version: Long) extends Op

  /** One folder = a list of ops. `seen` spans the WHOLE seed run: per-key
    * version ties are excluded globally, because an equal-version tie
    * resolves by a full-row struct comparison in-batch (an implementation
    * detail this model deliberately does not restate) while the
    * vs-target tie rule (target wins) IS modeled and still exercised —
    * stale versions below the target's live version hit it constantly.
    */
  private def genFolder(rng: Random, nextV: () => Long, folderTag: String,
      seen: collection.mutable.Map[String, Set[Long]]): Seq[Op] = {
    val nOps = 3 + rng.nextInt(8)
    val ops = Seq.newBuilder[Op]
    for (i <- 0 until nOps) {
      val key = keyPool(rng.nextInt(keyPool.size))
      // 25% stale version (possibly below anything live), else monotone
      var v = if (rng.nextInt(4) == 0) 1 + rng.nextLong(50) else nextV()
      while (seen(key).contains(v)) v += 1  // no per-key version reuse
      seen(key) = seen(key) + v
      if (rng.nextInt(5) == 0) ops += Delete(key, v)
      else ops += Upsert(key, v, s"$folderTag-op$i-v$v")
    }
    ops.result()
  }

  private def writeFolder(root: String, ts: OffsetDateTime, ops: Seq[Op], rng: Random): String = {
    val folder = CdmFixture.folderName(ts)
    val fdir = Paths.get(root, folder, CdmFixture.entityName)
    Files.createDirectories(fdir)
    Files.write(Paths.get(root, folder, "model.json"),
      CdmFixture.modelJson().getBytes(StandardCharsets.UTF_8))
    val rows = ops.map {
      case Upsert(k, v, d) => CdmFixture.insertRow(k, rng.nextInt(40), v, d)
      case Delete(k, v)    => CdmFixture.deleteRow(k, v)
    }
    // split into 1..3 chunk files with distinct small-int names
    val nChunks = 1 + rng.nextInt(math.min(3, rows.size))
    val chunks = Array.fill(nChunks)(Seq.newBuilder[String])
    rows.zipWithIndex.foreach { case (r, i) => chunks(i % nChunks) += r }
    chunks.zipWithIndex.foreach { case (c, i) =>
      val content = c.result()
      if (content.nonEmpty)
        Files.write(fdir.resolve(s"${i + 1}.csv"),
          (content.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    }
    folder
  }

  /** The reference merge rules, independently restated. */
  private def applyBatch(state: Map[String, (Long, Option[String])],
      ops: Seq[Op]): Map[String, (Long, Option[String])] = {
    // in-batch winner per key: strictly by version (ties excluded by gen)
    val winners = ops.groupBy(_.key).map { case (k, os) => os.maxBy(_.version) }
    winners.foldLeft(state) { (st, w) =>
      st.get(w.key) match {
        case Some((tv, _)) =>
          if (w.version > tv) w match {
            case Upsert(k, v, d) => st.updated(k, (v, Some(d)))
            case Delete(k, _)    => st - k
          } else st                       // stale or tie: target wins, no-op
        case None => w match {
          case Upsert(k, v, d) => st.updated(k, (v, Some(d)))
          case Delete(_, _)    => st      // tombstone for absent key: no-op
        }
      }
    }
  }

  private def runSeed(seed: Int): Unit = {
    val rng = new Random(seed)
    var vCounter = 100L
    val nextV = () => { vCounter += 7; vCounter }
    val seen = collection.mutable.Map[String, Set[Long]]().withDefaultValue(Set.empty)
    val root = tmpDir(s"cdc-model-$seed")
    val target = tmpDir(s"cdc-model-tgt-$seed")
    val ckpt = tmpDir(s"cdc-model-ckpt-$seed")
    Files.write(Paths.get(root, "model.json"),
      CdmFixture.modelJson().getBytes(StandardCharsets.UTF_8))
    val base = OffsetDateTime.parse("2020-01-01T00:00:00Z")

    // ---- backfill phase: 2 closed folders, ONE batch in the model
    val bfOps = (0 until 2).map(i => genFolder(rng, nextV, s"s$seed-bf$i", seen))
    val bfFolders = bfOps.zipWithIndex.map { case (ops, i) =>
      writeFolder(root, base.plusMinutes(20 * i), ops, rng)
    }
    CdmFixture.stampChangelog(root, bfFolders.last)
    var model = applyBatch(Map.empty, bfOps.flatten)

    val spec = StreamSpec(
      sourcePath = root,
      entityName = CdmFixture.entityName,
      targetLocation = target,
      backfillBehavior = "Overwrite",
      numBuckets = 4,
      changeCaptureIntervalSeconds = 1,
      maxFoldersPerTrigger = Some(1), // folder-per-commit: sequential model
      checkpointLocation = Some(ckpt),
      mergeMode = if (seed % 2 == 0) "copy-on-write" else "merge-on-read")
    CdcPipeline.runBackfill(spark, spec)

    // ---- stream phase: 4 more folders, applied per-folder in the model
    val streamOps = (0 until 4).map(i => genFolder(rng, nextV, s"s$seed-st$i", seen))
    var last = ""
    streamOps.zipWithIndex.foreach { case (ops, i) =>
      last = writeFolder(root, base.plusHours(1).plusMinutes(20 * i), ops, rng)
      model = applyBatch(model, ops)
    }
    CdmFixture.stampChangelog(root, last)
    val q = CdcPipeline.startStream(spark, spec)
    try q.processAllAvailable()
    finally q.stop()

    val table = SnapshotTable(spark, target)
    val actual = table.read()
      .select(col("Id"), col("versionnumber"), col("displayvalue"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), Option(r.getString(2))))
      .toMap
    assert(actual == model,
      s"seed $seed diverged:\n  only-engine: ${actual.toSet -- model.toSet}" +
        s"\n  only-model: ${model.toSet -- actual.toSet}")
    assert(table.properties(SnapshotTable.PropWatermark) == last)
  }

  for (seed <- Seq(11, 12, 13)) {
    test(s"random lifecycle seed $seed matches the independent merge model " +
      s"(${if (seed % 2 == 0) "copy-on-write" else "merge-on-read"})") {
      runSeed(seed)
    }
  }
}
