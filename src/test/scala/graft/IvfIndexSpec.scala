package graft

import graft.ext.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

/** The persisted incremental IVF index ([[graft.ext.IvfIndex]]): append
  * without retrain, stored-file immutability, probe-time directory
  * pruning, and the recall-drift floor after appends.
  */
class IvfIndexSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  /** Same readable centroid construction as the q_ann_ivf gate family. */
  private lazy val cents: Array[Array[Double]] =
    emb.where(col("vec_id") < 8).orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>"))
      .collect().map(r => Similarity.unitVector(r.getSeq[Double](0).toArray))

  private def increment = emb.select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))

  private def dataFiles(dir: String, sub: String): Map[String, (Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/data/$sub")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val b = Map.newBuilder[String, (Long, Long)]
    while (it.hasNext) {
      val s = it.next()
      b += s.getPath.toString -> ((s.getLen, s.getModificationTime))
    }
    b.result()
  }

  test("append assigns against the frozen quantizer without touching the seed; indexed top-k equals from-scratch") {
    val idx = s"${tmpDir("ivf-idx")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    val seedBefore = dataFiles(idx, "seed")
    assert(seedBefore.nonEmpty)

    IvfIndex.append(spark, idx, increment, name = "inc1")
    assert(dataFiles(idx, "seed") === seedBefore,
      "append must not read-modify-write any stored seed file")

    // the stored-index answer must be BIT-IDENTICAL to a from-scratch
    // assignment of the merged corpus (same centroids, same op order)
    val union = emb.unionByName(increment)
    val direct = Similarity.ivfTopK(emb.where(col("vec_id") < 50), union, k = 10, cents)
      .select("query_id", "neighbor_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val indexed = IvfIndex.topK(spark, idx, emb.where(col("vec_id") < 50), k = 10)
      .select("query_id", "neighbor_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(indexed === direct)

    // idempotence: re-running the same increment under the same name
    // changes nothing downstream
    IvfIndex.append(spark, idx, increment, name = "inc1")
    val again = IvfIndex.topK(spark, idx, emb.where(col("vec_id") < 50), k = 10)
      .select("query_id", "neighbor_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(again === direct)
  }

  test("probe-time reads plan ONE scan over ONLY the probed list directories") {
    val idx = s"${tmpDir("ivf-prune")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    IvfIndex.append(spark, idx, increment, name = "inc1")
    IvfIndex.append(spark, idx,
      emb.select((col("vec_id") + 2000000L).as("vec_id"), col("embedding")), name = "inc2")
    val probe = 3
    val df = IvfIndex.readAssigned(spark, idx, Some(Seq(probe)))
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    // one scan TOTAL, not one per subdir — a year of daily appends must
    // not accrete 365 codegen'd scan nodes (the Iceberg-read lesson)
    assert(scans.size === 1, s"expected a single scan across 3 subdirs: $scans")
    val planned = scans.flatMap(_.selectedPartitions.toPartitionArray.map(_.filePath.toString))
    assert(planned.nonEmpty)
    assert(planned.forall(_.contains(s"list=$probe")),
      s"directory pruning must restrict the planned files to list=$probe:\n${planned.mkString("\n")}")
  }

  test("compact folds every subdir into one, preserves top-k bit-identically, sweeps orphans") {
    val idx = s"${tmpDir("ivf-compact")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    IvfIndex.append(spark, idx, increment, name = "inc1")
    val queries = emb.where(col("vec_id") < 50)
    def res(): Set[(Long, Long, Double)] =
      IvfIndex.topK(spark, idx, queries, k = 10)
        .select("query_id", "neighbor_id", "score")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = res()
    // plant an orphan (a crashed append: data written, manifest never
    // swung) — compact must sweep it without ever reading it
    spark.range(1).select(lit(999999L).as("id"),
        lit(Array.fill(64)(0.5f)).as("vec"), lit(0).as("list"))
      .write.partitionBy("list").parquet(s"$idx/data/orphan-crashed")
    assert(res() === before, "an unmanifested subdir must be invisible to readers")
    IvfIndex.compact(spark, idx, graceMs = 0L)
    val dataDirs = {
      val p = new org.apache.hadoop.fs.Path(s"$idx/data")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
    }
    assert(dataDirs.size === 1 && dataDirs.head.startsWith("compact-"), dataDirs)
    assert(res() === before, "compaction must not change a single top-k result")
  }

  test("PQ index: codes-only storage, appended top-k bit-equal to from-scratch, compact-stable") {
    val idx = s"${tmpDir("ivfpq-idx")}/index"
    val books = Similarity.pqCodebooksFromRows(emb, numSub = 8, codebookSize = 16)
    IvfIndex.createPq(spark, idx, cents, books, emb)
    IvfIndex.append(spark, idx, increment, name = "inc1")

    // the memory contract, checked at the FILE level (one concrete part
    // file — the `list` column is directory metadata, not stored data):
    // rows carry (id, codes), no raw vector column anywhere in the index
    val aPart = {
      val p = new org.apache.hadoop.fs.Path(s"$idx/data/seed")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var found: String = null
      while (it.hasNext && found == null) {
        val f = it.next()
        if (f.getPath.getName.startsWith("part-")) found = f.getPath.toString
      }
      found
    }
    val stored = spark.read.parquet(aPart)
    assert(stored.columns.toSet === Set("id", "codes"),
      s"PQ index files must store codes only, found ${stored.columns.mkString(",")}")

    val union = emb.unionByName(increment)
    val queries = emb.where(col("vec_id") < 50)
    def collect(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select("query_id", "neighbor_id", "score")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = collect(Similarity.ivfPqTopK(queries, union, k = 10, cents, books))
    val indexed = collect(IvfIndex.topKPq(spark, idx, queries, k = 10))
    assert(indexed === direct,
      "stored-code scoring must be bit-identical to on-the-fly encode + score")

    IvfIndex.compact(spark, idx, graceMs = 0L)
    assert(collect(IvfIndex.topKPq(spark, idx, queries, k = 10)) === direct)

    // kind guards: the wrong query path fails loudly, not wrongly
    assertThrows[IllegalArgumentException] { IvfIndex.topK(spark, idx, queries, k = 10) }
  }

  test("semDedupIncrement suppresses exactly the stored-dominated increment vectors") {
    val idx = s"${tmpDir("ivf-semdedup")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    val seedBefore = dataFiles(idx, "seed")
    // exact copies (always dominated: cosine 1) + reversed vectors
    // (dominated iff some same-cluster stored vector clears the threshold)
    val inc = emb.where(col("vec_id") < 30)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      .unionByName(emb.where(col("vec_id") >= 30 && col("vec_id") < 60)
        .select((col("vec_id") + 2000000L).as("vec_id"), reverse(col("embedding")).as("embedding")))
    val got = IvfIndex.semDedupIncrement(spark, idx, inc, threshold = 0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(dataFiles(idx, "seed") === seedBefore, "the increment filter must not touch the index")

    // brute-force replay: frozen-centroid assignment + exists-a-dominator
    def assign(v: Array[Double]): Int = {
      val n = math.sqrt(v.map(x => x * x).sum)
      cents.zipWithIndex.map { case (c, i) =>
        (v.zip(c).map { case (a, b) => a * b }.sum / n, i)
      }.maxBy { case (s, i) => (s, i) }._2
    }
    val corpus = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val byList = corpus.map { case (_, v) => (assign(v), v) }.groupBy(_._1)
    val incLocal = inc.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val expected = incLocal.filter { case (_, x) =>
      val nx = math.sqrt(x.map(a => a * a).sum)
      !byList.getOrElse(assign(x), Array.empty).exists { case (_, s) =>
        val ns = math.sqrt(s.map(a => a * a).sum)
        x.zip(s).map { case (a, b) => a * b }.sum / (nx * ns) >= 0.99
      }
    }.map(_._1).toSet
    assert(got === expected)
    assert(incLocal.map(_._1).toSet.diff(got).nonEmpty, "the plant must suppress something")
    assert(got.nonEmpty, "the plant must keep something")
  }

  test("past broadcastMaxRows the joins degrade to a SHUFFLED plan with identical results") {
    val idx = s"${tmpDir("ivf-degrade")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    IvfIndex.append(spark, idx, increment, name = "inc1")
    val queries = emb.where(col("vec_id") < 20)
    def s3(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select("query_id", "neighbor_id", "score")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def shuffled(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.sparkPlan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.nonEmpty

    val deg = IvfIndex.topK(spark, idx, queries, k = 10, broadcastMaxRows = 0)
    assert(shuffled(deg), "bound 0 must force the shuffled join plan")
    assert(s3(deg) === s3(IvfIndex.topK(spark, idx, queries, k = 10)),
      "the degraded plan must be exact — only the plan shape changes")

    val inc = emb.where(col("vec_id") < 30)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      .unionByName(emb.where(col("vec_id") >= 30 && col("vec_id") < 60)
        .select((col("vec_id") + 2000000L).as("vec_id"), reverse(col("embedding")).as("embedding")))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val sdDeg = IvfIndex.semDedupIncrement(spark, idx, inc, threshold = 0.99, broadcastMaxRows = 0)
    assert(shuffled(sdDeg), "bound 0 must force the shuffled suppression join")
    assert(ids(sdDeg) === ids(IvfIndex.semDedupIncrement(spark, idx, inc, threshold = 0.99)))

    val idxPq = s"${tmpDir("ivfpq-degrade")}/index"
    val books = Similarity.pqCodebooksFromRows(emb, numSub = 8, codebookSize = 16)
    IvfIndex.createPq(spark, idxPq, cents, books, emb)
    val pqDeg = IvfIndex.topKPq(spark, idxPq, queries, k = 10, broadcastMaxRows = 0)
    assert(shuffled(pqDeg), "bound 0 must force the shuffled PQ join plan")
    assert(s3(pqDeg) === s3(IvfIndex.topKPq(spark, idxPq, queries, k = 10)))
  }

  test("compact defers deleting absorbed subdirs; a reader planned on the prior manifest survives") {
    val idx = s"${tmpDir("ivf-grace")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    IvfIndex.append(spark, idx, increment, name = "inc1")
    val queries = emb.where(col("vec_id") < 20)
    def s2(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = s2(IvfIndex.topK(spark, idx, queries, k = 10))
    // a reader that PLANNED its file set from the pre-compact manifest
    // (its InMemoryFileIndex already lists seed/inc1 files) but has not
    // executed yet — the exact mid-scan window of the hazard
    val priorReader = IvfIndex.topK(spark, idx, queries, k = 10)
    // age the subdirs an hour BY MTIME: the grace clock must start at the
    // moment compact UNREFERENCES a dir, never at the dir's creation — an
    // old seed deserves the same grace as a fresh append. Surviving this
    // despite hour-old mtimes also proves the clock is the retired
    // LEDGER, not directory mtimes — i.e. the grace holds on object
    // stores whose directory prefixes have no mutable mtime at all
    val fsP = new org.apache.hadoop.fs.Path(s"$idx/data")
    val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(fsP).filter(_.isDirectory).foreach(s =>
      fs.setTimes(s.getPath, System.currentTimeMillis() - 3600 * 1000L, -1))
    IvfIndex.compact(spark, idx) // default grace: absorbed subdirs deferred
    val dirs = {
      val p = new org.apache.hadoop.fs.Path(s"$idx/data")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSet
    }
    assert(dirs.contains("seed") && dirs.contains("inc1") &&
      dirs.exists(_.startsWith("compact-")), s"absorbed subdirs must wait out the grace: $dirs")
    assert(s2(priorReader) === before,
      "a reader planned from the prior manifest must not lose files mid-scan")
    // new readers plan only the manifested blob — no double counting
    assert(s2(IvfIndex.topK(spark, idx, queries, k = 10)) === before)
    // the NEXT tick sweeps what this one deferred (grace elapsed)
    IvfIndex.compact(spark, idx, graceMs = 0L)
    val after = {
      val p = new org.apache.hadoop.fs.Path(s"$idx/data")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSet
    }
    assert(after.size === 1 && after.head.startsWith("compact-"), after)
    assert(s2(IvfIndex.topK(spark, idx, queries, k = 10)) === before)
  }

  test("a missing manifest fails with a NAMED error, not a bare FileNotFound") {
    val idx = s"${tmpDir("ivf-noman")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    val p = new org.apache.hadoop.fs.Path(s"$idx/_manifest.json")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
    val e = intercept[IllegalStateException] {
      IvfIndex.topK(spark, idx, emb.where(col("vec_id") < 5), k = 3)
    }
    assert(e.getMessage.contains("IvfIndexManifestMissing"), e.getMessage)
  }

  test("a null embedding fails create/append loudly and leaves the index readable") {
    val idx = s"${tmpDir("ivf-null")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    val queries = emb.where(col("vec_id") < 10)
    val before = IvfIndex.topK(spark, idx, queries, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val poisoned = emb.limit(3).unionByName(
      emb.limit(1).select((col("vec_id") + 500000L).as("vec_id"),
        lit(null).cast("array<float>").as("embedding")))
    val e = intercept[Exception] {
      IvfIndex.append(spark, idx, poisoned, name = "bad")
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("IvfIndexNullAssignment")), chain(e).mkString(" | "))
    // the failed append never swung the manifest — the index answers as before
    val after = IvfIndex.topK(spark, idx, queries, k = 5)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before)
  }

  test("EMPTY and ALL-ZERO embeddings fail as loudly as null ones (append and query)") {
    // norm 0 → every list score is 0/0 = NaN → NaN wins the argmax, so
    // without the norm guard the row gets a NON-null list, stores
    // silently, and its NaN cosine outranks every real neighbor
    val idx = s"${tmpDir("ivf-zero")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ chain(t.getCause)
    val emptyVec = emb.limit(1).select((col("vec_id") + 600000L).as("vec_id"),
      lit(Array.empty[Float]).as("embedding"))
    val zeroVec = emb.limit(1).select((col("vec_id") + 700000L).as("vec_id"),
      lit(Array.fill(64)(0.0f)).as("embedding"))
    // distinct names: a failed append can leave its target dir behind, and
    // reusing the name would trip the (separately-tested) grace guard
    // instead of re-exercising the embedding guard
    for ((bad, nm) <- Seq((emptyVec, "bad-empty"), (zeroVec, "bad-zero"))) {
      val e = intercept[Exception] { IvfIndex.append(spark, idx, bad, name = nm) }
      assert(chain(e).exists(_.contains("IvfIndexNullAssignment")), chain(e).mkString(" | "))
    }
    val eq = intercept[Exception] {
      IvfIndex.topK(spark, idx, zeroVec, k = 3).collect()
    }
    assert(chain(eq).exists(_.contains("IvfIndexNullAssignment")), chain(eq).mkString(" | "))
    val es = intercept[Exception] {
      IvfIndex.semDedupIncrement(spark, idx, emptyVec, threshold = 0.9).collect()
    }
    assert(chain(es).exists(_.contains("IvfIndexNullAssignment")), chain(es).mkString(" | "))
  }

  test("a NaN-component embedding fails as loudly as null/zero ones (append, query, increment)") {
    // a NaN component makes the NORM NaN — not null, not 0, so it slips a
    // null/zero-only guard — while the NaN still wins the assignment
    // argmax and its stored cosine still outranks every real neighbor:
    // the same silent poisoning through a different door
    val idx = s"${tmpDir("ivf-nan")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ chain(t.getCause)
    val nanVec = emb.limit(1).select((col("vec_id") + 800000L).as("vec_id"),
      lit((Array.fill(63)(0.5f) :+ Float.NaN)).as("embedding"))
    val ea = intercept[Exception] { IvfIndex.append(spark, idx, nanVec, name = "bad-nan") }
    assert(chain(ea).exists(_.contains("IvfIndexNullAssignment")), chain(ea).mkString(" | "))
    val eq = intercept[Exception] { IvfIndex.topK(spark, idx, nanVec, k = 3).collect() }
    assert(chain(eq).exists(_.contains("IvfIndexNullAssignment")), chain(eq).mkString(" | "))
    val es = intercept[Exception] {
      IvfIndex.semDedupIncrement(spark, idx, nanVec, threshold = 0.9).collect()
    }
    assert(chain(es).exists(_.contains("IvfIndexNullAssignment")), chain(es).mkString(" | "))
    // the failed append never swung the manifest — the index answers sanely
    assert(IvfIndex.topK(spark, idx, emb.where(col("vec_id") < 5), k = 3).count() > 0)
  }

  test("an INFINITE-component embedding fails the degenerate guard like NaN (the fifth door)") {
    // norm = +Inf passes a null/zero/NaN-only test, yet Inf/Inf and 0·Inf
    // both score NaN at query time — the same silent top-1 poisoning
    val idx = s"${tmpDir("ivf-inf")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    def chain(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ chain(t.getCause)
    val infVec = emb.limit(1).select((col("vec_id") + 900000L).as("vec_id"),
      lit((Array.fill(63)(0.5f) :+ Float.PositiveInfinity)).as("embedding"))
    val ea = intercept[Exception] { IvfIndex.append(spark, idx, infVec, name = "bad-inf") }
    assert(chain(ea).exists(_.contains("IvfIndexNullAssignment")), chain(ea).mkString(" | "))
    val eq = intercept[Exception] { IvfIndex.topK(spark, idx, infVec, k = 3).collect() }
    assert(chain(eq).exists(_.contains("IvfIndexNullAssignment")), chain(eq).mkString(" | "))
  }

  test("a CRASHED append's same-name retry overwrites freely; only compact-RETIRED names wait out THEIR grace") {
    val idx = s"${tmpDir("ivf-crashretry")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    // simulate a crashed append: data written under the name, manifest
    // never swung — no reader ever planned it, so the documented
    // idempotent retry must succeed immediately (refusing it for the
    // grace window would contradict the name-is-the-idempotence-key
    // contract for exactly the crash-recovery case it exists for)
    spark.range(1).select(lit(888888L).as("id"),
        lit(Array.fill(64)(0.25f)).as("vec"), lit(0).as("list"))
      .write.partitionBy("list").parquet(s"$idx/data/inc1")
    IvfIndex.append(spark, idx, increment, name = "inc1") // retry: no throw
    assert(IvfIndex.topK(spark, idx, emb.where(col("vec_id") < 5), k = 3).count() > 0)

    // a LONG-grace compact's promise is honored by an append using the
    // DEFAULT grace: the refusal ages against the grace the RETIRING
    // compact recorded in the ledger, not the append call's own default
    val idx2 = s"${tmpDir("ivf-longgrace")}/index"
    IvfIndex.create(spark, idx2, cents, emb)
    IvfIndex.append(spark, idx2, increment, name = "inc1")
    IvfIndex.compact(spark, idx2, graceMs = 3600 * 1000L) // 1 h promise
    val e = intercept[IllegalStateException] {
      IvfIndex.append(spark, idx2, increment, name = "inc1") // default grace (15 min)
    }
    assert(e.getMessage.contains("IvfIndexAppendNameInGrace") &&
      e.getMessage.contains("3600000ms"), e.getMessage)
  }

  test("re-appending a name a compact just absorbed is refused inside the grace window") {
    // the overwrite would delete the absorbed subdir's files through a
    // path compact's deferral cannot protect — a reader planned on the
    // prior manifest (which still references that name) loses its files
    val idx = s"${tmpDir("ivf-namegrace")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    IvfIndex.append(spark, idx, increment, name = "inc1")
    val queries = emb.where(col("vec_id") < 20)
    def s2(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = s2(IvfIndex.topK(spark, idx, queries, k = 10))
    val priorReader = IvfIndex.topK(spark, idx, queries, k = 10) // planned pre-compact
    IvfIndex.compact(spark, idx) // default grace: seed+inc1 deferred, unreferenced
    val e = intercept[IllegalStateException] {
      IvfIndex.append(spark, idx, increment, name = "inc1")
    }
    assert(e.getMessage.contains("IvfIndexAppendNameInGrace"), e.getMessage)
    assert(s2(priorReader) === before,
      "the refused re-append must leave the prior reader's files intact")
    // a FRESH name is the sanctioned path and answers identically
    IvfIndex.append(spark, idx,
      emb.select((col("vec_id") + 2000000L).as("vec_id"), col("embedding")), name = "inc2")
    assert(IvfIndex.topK(spark, idx, queries, k = 10).count() > 0)
    // graceMs = 0 is the explicit opt-out (spec/rebuild mode: caller
    // asserts no concurrent readers), mirroring compact's contract
    IvfIndex.compact(spark, idx, graceMs = 0L)
    IvfIndex.append(spark, idx, increment, name = "inc1", graceMs = 0L)
    assert(s2(IvfIndex.topK(spark, idx, queries, k = 10)).nonEmpty)
  }

  test("the broadcast bound is BYTE-aware: wide rows tighten the row bound; byte-degraded plans stay exact") {
    // 2M rows at dim 768 is ~12 GB of exploded query vectors — past
    // Spark's 8 GB broadcast cap, so a raw row bound does not bound the
    // BroadcastExchange it exists to prevent; the effective bound must
    // shrink with the dim known from the frozen centroids
    val wide = IvfIndex.broadcastRowBound(
      IvfIndex.DefaultBroadcastMaxRows, IvfIndex.DefaultBroadcastMaxBytes,
      dim = 768, carriesVector = true)
    assert(wide === IvfIndex.DefaultBroadcastMaxBytes / (8L * 768 + 64),
      s"dim-768 bound must be byte-derived, got $wide")
    assert(wide < 100000L, s"a dim-768 vector side must never broadcast 2M rows (bound $wide)")
    // narrow id-only sides (the work counters) are not width-penalized
    assert(IvfIndex.broadcastRowBound(
      IvfIndex.DefaultBroadcastMaxRows, IvfIndex.DefaultBroadcastMaxBytes,
      dim = 768, carriesVector = false) === IvfIndex.DefaultBroadcastMaxRows)
    // at the gate dim (64) the byte cap tightens 2M to ~930k — still far
    // above any gate's query side (≤ thousands of exploded rows), so gate
    // plans are unchanged while the bound is finally width-honest
    val gate = IvfIndex.broadcastRowBound(
      IvfIndex.DefaultBroadcastMaxRows, IvfIndex.DefaultBroadcastMaxBytes,
      dim = 64, carriesVector = true)
    assert(gate === IvfIndex.DefaultBroadcastMaxBytes / (8L * 64 + 64) && gate > 100000L, gate)

    // behavior: a 1-byte cap forces the shuffled plan with identical results
    val idx = s"${tmpDir("ivf-bytebound")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    val queries = emb.where(col("vec_id") < 20)
    def s3(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select("query_id", "neighbor_id", "score")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val deg = IvfIndex.topK(spark, idx, queries, k = 10, broadcastMaxBytes = 1L)
    assert(deg.queryExecution.sparkPlan.collectFirst {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.nonEmpty, "a 1-byte cap must force the shuffled join plan")
    assert(s3(deg) === s3(IvfIndex.topK(spark, idx, queries, k = 10)),
      "the byte-degraded plan must be exact — only the plan shape changes")
  }

  test("PQ construction guards: indivisible dim and empty codebooks fail loudly") {
    val idx = s"${tmpDir("ivfpq-guard")}/index"
    // 7 subspaces of 9 dims cover 63 ≠ 64 — the codebooks cannot tile the vector
    val badBooks = Array.fill(7)(Array.fill(16)(Array.fill(9)(0.1)))
    assertThrows[IllegalArgumentException] {
      IvfIndex.createPq(spark, idx, cents, badBooks, emb)
    }
    assertThrows[IllegalArgumentException] {
      IvfIndex.createPq(spark, idx, cents, Array.empty[Array[Array[Double]]], emb)
    }
    assert(!IvfIndex.exists(spark, idx), "a rejected createPq must not leave a live index")
  }

  test("edges: empty increment, all-suppressed increment, and an EMPTY index answer sanely") {
    val idx = s"${tmpDir("ivf-edges")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    // empty increment → nothing suppressed, nothing returned, no failure
    val none = emb.where(lit(false))
      .select(col("vec_id"), col("embedding"))
    assert(IvfIndex.semDedupIncrement(spark, idx, none, threshold = 0.99).count() === 0L)
    // all-suppressed increment: exact copies are all dominated at cosine 1
    val copies = emb.where(col("vec_id") < 25)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    assert(IvfIndex.semDedupIncrement(spark, idx, copies, threshold = 0.99).count() === 0L)
    // empty QUERY set: probeStats collects zero probe rows — the probed
    // directory cut is empty, the work counters read zeros, nothing throws
    assert(IvfIndex.topK(spark, idx, none, k = 3).count() === 0L)
    assert(IvfIndex.probeWorkCounts(spark, idx, none) === ((0L, 0L, 0L)))
    // empty index: created from an empty corpus — top-k is empty, an
    // increment is all-novel, appends then work
    val idxE = s"${tmpDir("ivf-empty")}/index"
    IvfIndex.create(spark, idxE, cents, emb.where(lit(false)))
    assert(IvfIndex.topK(spark, idxE, emb.where(col("vec_id") < 5), k = 3).count() === 0L)
    assert(IvfIndex.semDedupIncrement(spark, idxE, copies, threshold = 0.99).count() === copies.count())
    IvfIndex.append(spark, idxE, emb.where(col("vec_id") < 25), name = "first")
    assert(IvfIndex.semDedupIncrement(spark, idxE, copies, threshold = 0.99).count() === 0L)
  }

  test("PQ recall@10 holds after a 10x frozen-quantizer append (r18 stretch: pinned, not claimed)") {
    // ten perturbed blocks (the bench 10x construction: per-block epsilon,
    // NOT copies — copies would make every query's top hit its own clone
    // and measure nothing), appended under the FROZEN centroids and
    // codebooks; recall@10 vs brute force over the merged corpus must
    // clear the PQ floor minus drift slack — the tier's quality is an
    // invariant of appended mass, not a construction-time claim.
    val idx = s"${tmpDir("ivfpq-recall10x")}/index"
    val books = Similarity.pqCodebooksFromRows(emb, numSub = 8, codebookSize = 16)
    IvfIndex.createPq(spark, idx, cents, books, emb)
    val blocks = (1 until 10).map { k =>
      emb.select((col("vec_id") + k * 100000000L).as("vec_id"),
        transform(col("embedding"), x => x + lit((k * 0.003).toFloat)).as("embedding"))
    }
    blocks.zipWithIndex.foreach { case (b, i) => IvfIndex.append(spark, idx, b, s"inc$i") }
    val union = blocks.foldLeft(emb)(_ unionByName _)
    val queries = emb.where(col("vec_id") < 50)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, union, k = 10))
    val got = pairs(IvfIndex.topKPq(spark, idx, queries, k = 10))
    val recall = exact.count(got.contains).toDouble / exact.size
    info(s"IVF-PQ recall@10 after 10x append (nprobe=1): $recall")
    // measured 0.81 on the seeded corpus; floor at the family's usual
    // ~2x regeneration slack
    assert(recall >= 0.30, s"PQ recall@10 $recall collapsed under appended mass")
  }

  test("recall@10 through the appended index clears the IVF floor on the merged corpus") {
    val idx = s"${tmpDir("ivf-recall")}/index"
    IvfIndex.create(spark, idx, cents, emb)
    IvfIndex.append(spark, idx, increment, name = "inc1")
    val union = emb.unionByName(increment)
    val queries = emb.where(col("vec_id") < 50)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(queries, union, k = 10))
    val got = pairs(IvfIndex.topK(spark, idx, queries, k = 10))
    val recall = exact.count(got.contains).toDouble / exact.size
    info(s"incremental-IVF recall@10 vs brute force (merged corpus, nprobe=1): $recall")
    assert(recall >= 0.20, s"recall@10 $recall below the q_ann_ivf floor after append")
  }
}
