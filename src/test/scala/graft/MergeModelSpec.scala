package graft

import graft.ops.{LatestVersionDedup, MergeKey}
import graft.tables.SnapshotTable
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Model-based randomized test of the CDC MERGE semantics — the engine's
  * core operator. A seeded random sequence of change batches (upserts and
  * tombstones over a small id pool, so key collisions, replays, stale
  * tombstones and delete-then-reinsert all occur by construction) is
  * folded into a real bucketed [[SnapshotTable]] through the same
  * dedup-then-merge path the pipeline uses, while a trivially-correct
  * in-memory map applies the declared rules:
  *
  *   - within a batch, the highest versionnumber per key wins (dedup);
  *   - a staged winner beats the target row only with a STRICTLY higher
  *     version (equal version = replay = no-op);
  *   - a winning tombstone removes the key; a stale tombstone is a no-op;
  *   - a tombstone for an absent key inserts nothing.
  *
  * After every batch the full table contents must equal the model exactly.
  * The scenario-based ConformanceSpec pins the reference's fixture story;
  * this spec pins the semantics over 60 randomized batches.
  */
class MergeModelSpec extends SparkSpec {

  test("randomized change batches: table state equals the reference model after every merge") {
    runModel(format = None, batches = 60, seed = 20260812L)
  }

  test("merge semantics are format-independent: the same model holds on an ORC table") {
    runModel(format = Some("orc"), batches = 25, seed = 20260813L)
  }

  test("merge semantics are format-independent: the same model holds on an AVRO table") {
    // completes the reference's CREATE TABLE format matrix (PARQUET | ORC
    // | AVRO, CRD beta:294-318); Spark 4 bundles the Avro source in
    // spark-sql, so the full merge lifecycle runs on row-oriented files
    runModel(format = Some("avro"), batches = 25, seed = 20260816L)
  }

  test("merge-on-read on an AVRO table: format-independent equality deletes (always-parquet metadata)") {
    // crosses the format axis with the write-mode axis: data files are
    // avro, delete files stay parquet (table metadata) — the
    // delete-applying read must compose the two transparently
    runModel(format = Some("avro"), batches = 20, seed = 20260817L, mode = "mor")
  }

  test("merge-on-read (equality deletes) satisfies the same model, including across compaction") {
    runModel(format = None, batches = 40, seed = 20260814L, mode = "mor")
  }

  test("interleaved copy-on-write and merge-on-read commits satisfy the same model") {
    // alternating modes exercises CoW absorbing MoR deletes (a rewrite of
    // a bucket with outstanding delete files must fold them in) and MoR
    // stacking sequences on top of rewritten files
    runModel(format = None, batches = 40, seed = 20260815L, mode = "mixed")
  }

  private def runModel(format: Option[String], batches: Int, seed: Long,
      mode: String = "cow"): Unit = {
    val rnd = new scala.util.Random(seed)
    val dir = Files.createTempDirectory("graft-merge-model").toFile.getAbsolutePath
    val table = new SnapshotTable(spark, s"$dir/t")

    val ids = ('a' to 'j').map(_.toString) // small pool → heavy collision
    // model: id -> (version, payload)
    val model = scala.collection.mutable.Map.empty[String, (Long, String)]

    // empty initial table (schema fixed up front)
    val schemaDf = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("Id", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("versionnumber", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("IsDelete", org.apache.spark.sql.types.BooleanType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType))))
    table.createOrReplace(MergeKey(schemaDf), MergeKey.ColumnName, numBuckets = 4,
      extraProps = format.map(f => Map(SnapshotTable.PropFormat -> f)).getOrElse(Map.empty))

    var globalVersion = 0L
    (1 to batches).foreach { batchNo =>
      // a batch: 1-8 change rows; ~25% tombstones; versions drawn from a
      // window around the current max so stale, replayed AND fresh
      // versions all appear; within-batch per-id versions kept unique so
      // the model's dedup is unambiguous (the engine's struct tie-break
      // is deterministic but intentionally unspecified here)
      val nRows = 1 + rnd.nextInt(8)
      val seen = scala.collection.mutable.Set.empty[(String, Long)]
      val rows = (1 to nRows).flatMap { _ =>
        val id = ids(rnd.nextInt(ids.size))
        val v = math.max(1L, globalVersion - 3 + rnd.nextInt(8))
        if (seen.contains((id, v))) None
        else {
          seen += ((id, v))
          globalVersion = math.max(globalVersion, v)
          Some((id, v, rnd.nextInt(4) == 0, s"p$id-$v"))
        }
      }
      if (rows.nonEmpty) {
        import spark.implicits._
        val batch = MergeKey(rows.toDF("Id", "versionnumber", "IsDelete", "payload"))
        val staged = LatestVersionDedup(batch)
        val useMor = mode == "mor" || (mode == "mixed" && batchNo % 2 == 0)
        if (useMor) table.mergeOnRead(staged, MergeKey.ColumnName, "versionnumber", "IsDelete")
        else table.merge(staged, MergeKey.ColumnName, "versionnumber", "IsDelete")
        // periodic maintenance under merge-on-read: compaction must absorb
        // the accumulated delete files without changing any visible row
        if (useMor && batchNo % 10 == 0) {
          table.compact(fileSizeThresholdBytes = Long.MaxValue)
          assert(table.currentSnapshot.deletes.isEmpty,
            s"compaction left delete files behind after batch $batchNo")
        }

        // model: dedup (max version per id), then strict-version merge
        rows.groupBy(_._1).foreach { case (id, rs) =>
          val (_, v, del, payload) = rs.maxBy(_._2)
          val existing = model.get(id).map(_._1).getOrElse(Long.MinValue)
          if (v > existing) {
            if (del) model.remove(id) else model(id) = (v, payload)
          }
        }

        val actual = table.read().select("Id", "versionnumber", "payload")
          .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
        assert(actual === model.toMap, s"divergence after batch $batchNo")
      }
    }
    // end state sanity: something survived and something was deleted along the way
    assert(model.nonEmpty && model.size < ids.size)
  }
}
