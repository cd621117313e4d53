package graft

import graft.pipeline.RetryPolicy
import graft.sources.SynapseCdmLayout
import org.apache.hadoop.conf.Configuration

import java.time.{OffsetDateTime, ZoneOffset}

/** Fault-injection specs for the source listing retry policy (the
  * reference's blob `httpMaxRetries`/delay knobs): every metadata round
  * trip — changelog read, folder listing, chunk listing, model.json read —
  * must survive N transient store failures with N < maxAttempts, and the
  * final attempt's failure must propagate.
  */
class ListingRetrySpec extends SparkSpec {

  private val now = OffsetDateTime.of(2026, 1, 2, 12, 0, 0, 0, ZoneOffset.UTC)

  private def flakyConf(): Configuration = {
    val c = new Configuration(spark.sparkContext.hadoopConfiguration)
    c.set("fs.flaky.impl", classOf[FlakyFileSystem].getName)
    c
  }

  test("listing survives transient store failures under the retry budget") {
    val root = tmpDir("flaky-src")
    CdmFixture.initRoot(root)
    val folder = CdmFixture.uploadBatch(root, now.minusHours(1), updateChangelog = true)
    val conf = flakyConf()
    val layout = SynapseCdmLayout(s"flaky:$root", CdmFixture.entityName,
      "Changelog/changelog.info", RetryPolicy(maxAttempts = 3, baseDelayMs = 1))

    FlakyFileSystem.failures.set(2)
    assert(layout.changelogValue(conf).contains(folder))
    FlakyFileSystem.failures.set(2)
    assert(layout.foldersInRange(conf, "", "9999").contains(folder))
    FlakyFileSystem.failures.set(2)
    assert(layout.chunkFiles(conf, folder).nonEmpty)
    FlakyFileSystem.failures.set(2)
    assert(layout.entitySchema(conf, Some(folder)).fieldNames.contains("Id"))
    assert(FlakyFileSystem.failures.get() == 0, "all injected failures consumed by retries")
  }

  test("failures beyond maxAttempts propagate (and classify as retryable exit)") {
    val root = tmpDir("flaky-src-fatal")
    CdmFixture.initRoot(root)
    CdmFixture.uploadBatch(root, now.minusHours(1), updateChangelog = true)
    val conf = flakyConf()
    val layout = SynapseCdmLayout(s"flaky:$root", CdmFixture.entityName,
      "Changelog/changelog.info", RetryPolicy(maxAttempts = 3, baseDelayMs = 1))

    FlakyFileSystem.failures.set(100)
    val e = intercept[java.io.IOException] { layout.changelogValue(conf) }
    assert(e.getMessage.contains("injected transient listing failure"))
    // a poll that dies this way exits 2 (K8s restart), not 1
    assert(graft.app.Main.isRetryable(e, Seq.empty))
    FlakyFileSystem.failures.set(0)
  }

  test("non-IO failures propagate on the FIRST attempt (no backoff burn)") {
    // The listing retry is IO-only: a logic error (malformed changelog,
    // missing model.json) must not consume the retry budget.
    var attempts = 0
    val policy = RetryPolicy(maxAttempts = 5, baseDelayMs = 1, ioOnly = true)
    val e = intercept[IllegalStateException] {
      graft.pipeline.Retry(policy) { attempts += 1; throw new IllegalStateException("malformed") }
    }
    assert(e.getMessage == "malformed")
    assert(attempts == 1, s"non-IO failure must not retry, saw $attempts attempts")
    // while a wrapped IOException still retries
    attempts = 0
    intercept[RuntimeException] {
      graft.pipeline.Retry(policy.copy(maxAttempts = 3)) {
        attempts += 1; throw new RuntimeException(new java.io.IOException("conn reset"))
      }
    }
    assert(attempts == 3, s"IO failure must use the budget, saw $attempts attempts")
  }
}
