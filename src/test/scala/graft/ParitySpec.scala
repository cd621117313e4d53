package graft

import graft.pipeline.{Retry, RetryPolicy, StatsdEmitter}
import graft.sources.SynapseCdmMicroBatchStream
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.net.{DatagramPacket, DatagramSocket}
import java.time.OffsetDateTime
import scala.jdk.CollectionConverters._

/** Specs for the reference-parity wrappers: query retry (A27), StatsD
  * observability (A26), memory-bound admission control (A10).
  */
class ParitySpec extends SparkSpec {

  test("retry: backs off on matching messages, gives up at maxAttempts") {
    var calls = 0
    val policy = RetryPolicy(maxAttempts = 3, baseDelayMs = 1,
      retryOnMessageContains = Seq("No worker nodes available"))
    val out = Retry(policy) {
      calls += 1
      if (calls < 3) throw new RuntimeException("No worker nodes available right now")
      "ok"
    }
    assert(out == "ok" && calls == 3)

    var calls2 = 0
    intercept[RuntimeException] {
      Retry(policy) { calls2 += 1; throw new RuntimeException("syntax error") }
    }
    assert(calls2 == 1) // non-matching message → no retry

    var calls3 = 0
    intercept[RuntimeException] {
      Retry(policy) { calls3 += 1; throw new RuntimeException("No worker nodes available") }
    }
    assert(calls3 == 3) // exhausted attempts
  }

  test("retry: cancellations and fatal errors are never retried") {
    val always = RetryPolicy(maxAttempts = 5, baseDelayMs = 1) // empty needles = retry anything
    // graceful stop kills the in-flight job → the whole job must NOT be
    // resubmitted during teardown
    var cancels = 0
    intercept[java.util.concurrent.CancellationException] {
      Retry(always) { cancels += 1; throw new java.util.concurrent.CancellationException("job cancelled") }
    }
    assert(cancels == 1)
    // message-level cancellation (Spark wraps cancellations in generic
    // SparkException with a 'cancelled' message) — same contract
    var msgCancels = 0
    intercept[RuntimeException] {
      Retry(always) { msgCancels += 1; throw new RuntimeException("Job 7 cancelled because of stop()") }
    }
    assert(msgCancels == 1)
    // fatal JVM errors propagate immediately: retrying on a corrupted JVM
    // hides the real failure
    var ooms = 0
    intercept[OutOfMemoryError] {
      Retry(always) { ooms += 1; throw new OutOfMemoryError("synthetic") }
    }
    assert(ooms == 1)
    // sanity: the same policy still retries a plain transient failure
    var plain = 0
    val ok = Retry(always) { plain += 1; if (plain < 2) throw new RuntimeException("flaky io") else "ok" }
    assert(ok == "ok" && plain == 2)
  }

  test("spec knobs: retry delay cap, maxRowsPerFile, targetTableProperties") {
    val spec = graft.pipeline.StreamSpec.fromJson(
      """{"sourcePath":"/s","entityName":"e","targetLocation":"/t",
        |"httpMaxRetries":5,"httpRetryDelayMs":2,"httpMaxRetryDelayMs":4,
        |"maxRowsPerFile":12345,
        |"targetTableProperties":{"owner":"data-eng","write.sort.order":"ignored-loses"}}""".stripMargin)
    assert(spec.listingRetry.maxDelayMs == 4 && spec.listingRetry.baseDelayMs == 2)
    assert(spec.maxRowsPerFile.contains(12345L))
    assert(spec.targetTableProperties("owner") == "data-eng")
    // both export sinks parse from the JSON spec
    val specExp = graft.pipeline.StreamSpec.fromJson(
      """{"sourcePath":"/s","entityName":"e","targetLocation":"/t",
        |"exportDir":"/x/sym","icebergExportDir":"/x/ice"}""".stripMargin)
    assert(specExp.exportDir.contains("/x/sym") && specExp.icebergExportDir.contains("/x/ice"))
    // backoff sleeps are capped: 5 attempts with scale 2 must not exceed
    // maxAttempts * maxDelay wall time by much (coarse upper bound)
    val t0 = System.nanoTime()
    intercept[java.io.IOException] {
      Retry(spec.listingRetry) { throw new java.io.IOException("transient") }
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(elapsedMs < 500, s"capped backoff should stay small, took ${elapsedMs}ms")

    // maxRowsPerFile reaches the parquet writer: one 100-row bucket splits
    val t = graft.tables.SnapshotTable(spark, tmpDir("parity-maxrows"))
    import spark.implicits._
    val df = (1 to 100).map(i => (s"k$i", i.toLong)).toDF("arcane_merge_key", "versionnumber")
    val snap = t.createOrReplace(df, "arcane_merge_key", numBuckets = 1,
      extraProps = Map(graft.tables.SnapshotTable.PropMaxRowsPerFile -> "30"))
    assert(snap.files.size >= 4, s"100 rows / 30 per file -> >= 4 files, got ${snap.files.size}")
    assert(t.read().count() == 100)
  }

  test("retry modes: never disables everywhere, backfillOnly only for backfill") {
    val policy = RetryPolicy(maxAttempts = 3, baseDelayMs = 1, mode = "never")
    var n1 = 0
    intercept[RuntimeException] {
      Retry(policy.forContext(backfill = true)) { n1 += 1; throw new RuntimeException("boom") }
    }
    assert(n1 == 1, "mode=never must not retry even for backfill")

    val bf = RetryPolicy(maxAttempts = 3, baseDelayMs = 1, mode = "backfillOnly")
    var n2 = 0
    intercept[RuntimeException] {
      Retry(bf.forContext(backfill = false)) { n2 += 1; throw new RuntimeException("boom") }
    }
    assert(n2 == 1, "backfillOnly must not retry streaming merges")
    var n3 = 0
    val out = Retry(bf.forContext(backfill = true)) {
      n3 += 1; if (n3 < 3) throw new RuntimeException("boom"); "ok"
    }
    assert(out == "ok" && n3 == 3, "backfillOnly must retry backfill")
  }

  test("statsd emitter sends DogStatsD datagrams with tags") {
    val server = new DatagramSocket(0)
    server.setSoTimeout(5000)
    val emitter = new StatsdEmitter("127.0.0.1", server.getLocalPort, Map("env" -> "test"))
    emitter.count("graft.stream.rows", 42)
    emitter.gauge("graft.stream.batch_ms", 12.5)
    def recv(): String = {
      val buf = new Array[Byte](512)
      val p = new DatagramPacket(buf, buf.length)
      server.receive(p)
      new String(p.getData, 0, p.getLength)
    }
    assert(recv() == "graft.stream.rows:42|c|#env:test")
    assert(recv() == "graft.stream.batch_ms:12.5|g|#env:test")
    emitter.close(); server.close()
  }

  test("statsd emitter speaks DogStatsD over a unix-domain socket (UDS-stream framing)") {
    // the reference's containerized transport (main.scala:112-114):
    // unix:///path/dsd.socket — the agent's SOCK_STREAM mode (the JDK's
    // AF_UNIX support is stream-only): 4-byte LE length-prefixed frames
    val sockPath = java.nio.file.Files.createTempDirectory("graft-uds").resolve("dsd.socket")
    val server = java.nio.channels.ServerSocketChannel.open(java.net.StandardProtocolFamily.UNIX)
    server.bind(java.net.UnixDomainSocketAddress.of(sockPath))
    try {
      val emitter = new StatsdEmitter(s"unix://$sockPath", Map("env" -> "test"))
      emitter.count("graft.stream.rows", 7)
      emitter.gauge("graft.stream.batch_ms", 3.5)
      val conn = server.accept()
      def readFully(n: Int): java.nio.ByteBuffer = {
        val buf = java.nio.ByteBuffer.allocate(n)
        while (buf.hasRemaining) assert(conn.read(buf) >= 0, "peer closed early")
        buf.flip(); buf
      }
      def recv(): String = {
        val len = readFully(4).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        val payload = readFully(len)
        new String(payload.array(), 0, len)
      }
      assert(recv() == "graft.stream.rows:7|c|#env:test")
      assert(recv() == "graft.stream.batch_ms:3.5|g|#env:test")
      emitter.close(); conn.close()
    } finally {
      server.close()
      java.nio.file.Files.deleteIfExists(sockPath)
    }
  }

  test("listing page-size bound (maxResultsPerPage) pages the root scan without changing results") {
    import graft.sources.SynapseCdmLayout
    val root = java.nio.file.Files.createTempDirectory("graft-page").toString
    val folders = (1 to 5).map(d => f"2024-01-0${d}%dT00.00.00Z")
    folders.foreach(fo => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, fo)))
    java.nio.file.Files.createFile(java.nio.file.Paths.get(root, "model.json")) // non-dir entry filtered
    val conf = new org.apache.hadoop.conf.Configuration()
    // an unbounded start forces the full-root listing path (listAll)
    def listWith(page: Int): Seq[String] =
      SynapseCdmLayout(root, "e", "Changelog/changelog.info", maxResultsPerPage = page)
        .foldersInRange(conf, "", "￿")
    assert(listWith(1) === folders)
    assert(listWith(2) === folders)
    assert(listWith(5000) === folders)
  }

  test("structured JSON log lines carry global tags, fields and parse cleanly") {
    import graft.pipeline.JsonLog
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    JsonLog.install(Map("entity" -> "e1", "stream" -> "s1"), buf += _)
    try {
      JsonLog.info("batch_committed", "batch_id" -> 7L, "rows" -> 120L,
        "watermark" -> "2020-01-01T00.00.00Z", "merge_ms" -> 42L)
      JsonLog.error("stream_failed", "message" -> "boom \"quoted\"\nline2", "retryable" -> true)
      assert(buf.size == 2)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val n1 = mapper.readTree(buf(0)) // must be valid JSON (collector contract)
      assert(n1.get("level").asText() == "INFO" && n1.get("event").asText() == "batch_committed")
      assert(n1.get("tags").get("entity").asText() == "e1")
      assert(n1.get("rows").asLong() == 120L && n1.get("merge_ms").asLong() == 42L)
      assert(java.time.Instant.parse(n1.get("ts").asText()) != null)
      val n2 = mapper.readTree(buf(1)) // quotes/newlines must not break the line
      assert(n2.get("retryable").asBoolean() && n2.get("message").asText().contains("line2"))
      assert(!buf(1).contains("\n"), "one event = one line")
    } finally JsonLog.install(Map.empty)
  }

  test("DataDog log shipper envelopes JsonLog lines with the LogstashEncoder field shape") {
    import graft.pipeline.{DataDogLogShipper, JsonLog}
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    // capture a real JsonLog line
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    JsonLog.install(Map("entity" -> "e1", "stream" -> "s9"), buf += _)
    try JsonLog.warn("batch_committed", "batch_id" -> 3L, "rows" -> 12L)
    finally JsonLog.install(Map.empty)

    // field parity with the reference's logback.datadog.xml encoder output
    val shipper = new DataDogLogShipper("udp://127.0.0.1:1", "graft-stream-runner")
    val n = mapper.readTree(shipper.envelope(buf.head))
    assert(java.time.Instant.parse(n.get("@timestamp").asText()) != null)
    assert(n.get("@version").asText() == "1")
    assert(n.get("message").asText() == "batch_committed")
    assert(n.get("logger_name").asText() == "graft.pipeline")
    assert(n.get("thread_name").asText().nonEmpty)
    assert(n.get("level").asText() == "WARN" && n.get("level_value").asInt() == 30000)
    assert(n.get("service").asText() == "graft-stream-runner")
    assert(n.get("ddsource").asText() == "java")
    assert(n.get("host").asText().nonEmpty)
    // event fields and stream tags carried through verbatim
    assert(n.get("rows").asLong() == 12L && n.get("batch_id").asLong() == 3L)
    assert(n.get("tags").get("entity").asText() == "e1" && n.get("tags").get("stream").asText() == "s9")

    // UDP destination actually receives the envelope
    val server = new DatagramSocket(0)
    server.setSoTimeout(5000)
    val udp = new DataDogLogShipper(s"udp://127.0.0.1:${server.getLocalPort}")
    udp.ship(buf.head)
    val p = new DatagramPacket(new Array[Byte](4096), 4096)
    server.receive(p)
    val got = mapper.readTree(new String(p.getData, 0, p.getLength))
    assert(got.get("message").asText() == "batch_committed" && got.get("ddsource").asText() == "java")
    udp.close(); server.close()

    // file destination appends one envelope per line; failures only count
    val f = java.nio.file.Files.createTempFile("ddship", ".jsonl")
    val fileShipper = new DataDogLogShipper("file:" + f.toAbsolutePath)
    fileShipper.ship(buf.head)
    fileShipper.ship(buf.head)
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(f)).asScala
    assert(lines.size == 2 && lines.forall(l => mapper.readTree(l).has("@timestamp")))
    assert(fileShipper.dropped == 0)
    val broken = new DataDogLogShipper("file:/nonexistent-dir-xyz/out.jsonl")
    broken.ship(buf.head)
    assert(broken.dropped == 1, "shipping failure must count, not throw")
    // a malformed destination (URI syntax error) must not throw either —
    // not even at construction (stream start must survive a config typo)
    val malformed = new DataDogLogShipper("udp://bad host:8125")
    malformed.ship(buf.head)
    assert(malformed.dropped == 1, "malformed destination degrades to drop-and-count")
  }

  test("memory-bound shaper admits at least one but not unbounded folders") {
    val root = tmpDir("shaper-src")
    CdmFixture.initRoot(root)
    val t0 = OffsetDateTime.parse("2020-01-01T00:00:00Z")
    (0 until 5).foreach { i =>
      CdmFixture.uploadBatch(root, t0.plusHours(i), updateChangelog = i == 4)
    }
    // touch the session so SparkSession.active works inside the source
    spark.range(1).count()
    val opts = new CaseInsensitiveStringMap(Map(
      "path" -> root, "entity" -> CdmFixture.entityName,
      "shaper" -> "memoryBound",
      // budget ≈ free-heap × 1e-12 → below one folder's estimated bytes
      "memoryHeadroomFraction" -> "0.000000000001").asJava)
    val stream = new SynapseCdmMicroBatchStream(new StructType(), new StructType(), opts)
    val end = stream.latestOffset(stream.initialOffset(), ReadLimit.allAvailable())
    // tiny budget → exactly one folder admitted per trigger (no stall)
    assert(end.json() == CdmFixture.folderName(t0))

    val opts2 = new CaseInsensitiveStringMap(Map(
      "path" -> root, "entity" -> CdmFixture.entityName,
      "shaper" -> "memoryBound", "memoryHeadroomFraction" -> "0.9").asJava)
    val stream2 = new SynapseCdmMicroBatchStream(new StructType(), new StructType(), opts2)
    val end2 = stream2.latestOffset(stream2.initialOffset(), ReadLimit.allAvailable())
    // ample budget → everything closed is admitted
    assert(end2.json() == CdmFixture.folderName(t0.plusHours(4)))
  }
}
