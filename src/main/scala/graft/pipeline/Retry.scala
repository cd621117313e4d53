package graft.pipeline

/** Query retry with exponential backoff — the reference retries merge SQL
  * whose failure message matches configured substrings (e.g. "No worker
  * nodes available"), modes never/always, with base duration × scale
  * factor, capped attempts (SURVEY.md §2.A27;
  * `/root/reference/dev.env.example:82-93`, CRD beta:265-293).
  *
  * In Spark most transient failures are absorbed by task retries and
  * streaming restart-from-checkpoint; this wrapper covers driver-side
  * actions (MERGE job submission, maintenance procedures) where a matching
  * transient error should be retried in place instead of failing the batch.
  */
final case class RetryPolicy(
    maxAttempts: Int = 3,
    baseDelayMs: Long = 100,
    scaleFactor: Double = 2.0,
    retryOnMessageContains: Seq[String] = Seq.empty, // empty = retry any exception
    mode: String = "always",                        // never | always | backfillOnly (CRD beta:265-293)
    ioOnly: Boolean = false,                        // retry only IOExceptions (listing paths)
    maxDelayMs: Long = Long.MaxValue                // backoff growth cap (httpMaxRetryDelay)
) {
  def shouldRetry(e: Throwable): Boolean =
    (!ioOnly || RetryPolicy.ioChain(e)) &&
      (retryOnMessageContains.isEmpty || RetryPolicy.messageMatches(e, retryOnMessageContains))

  /** The policy in effect for a given run mode: `never` disables in-place
    * retry everywhere, `backfillOnly` disables it for streaming merges
    * (where checkpoint restart-from-last-commit is the recovery story) but
    * keeps it for backfill (one long job, no checkpoint to resume).
    */
  def forContext(backfill: Boolean): RetryPolicy = mode.toLowerCase match {
    case "never"                        => copy(maxAttempts = 1)
    case "backfillonly" if !backfill    => copy(maxAttempts = 1)
    case _                              => this
  }
}

object RetryPolicy {
  /** True iff any message in the cause chain contains one of `needles`.
    * Shared by the in-place query retry above and by the process exit-code
    * classification (Main: matching stream failures → exit 2, the
    * reference's StreamFailException convention).
    */
  def messageMatches(e: Throwable, needles: Seq[String]): Boolean =
    needles.nonEmpty &&
      Iterator
        .iterate(e)(_.getCause)
        .takeWhile(_ != null)
        .exists(t => Option(t.getMessage).exists(m => needles.exists(m.contains)))

  /** True iff an IOException appears anywhere in the cause chain — the
    * transient-store signal. Listing retries (`ioOnly = true`) use this so
    * non-transient failures (malformed changelog, missing model.json, logic
    * errors) propagate on the first throw instead of burning the backoff
    * budget; the process exit classifier (Main.isRetryable) shares it.
    */
  def ioChain(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .exists(_.isInstanceOf[java.io.IOException])
}

/** Schema drift under `isUnifiedSchema: true`. An IOException subtype so
  * the process exit classifier (Main.isRetryable) routes it to exit code 2 —
  * the restart-and-re-read-config path, matching the reference's
  * StreamFailException convention for recoverable stream definition issues.
  */
class SchemaDriftException(msg: String) extends java.io.IOException(msg)

object Retry {
  /** True iff the failure is a cancellation/interruption anywhere in the
    * cause chain — an OPERATOR decision (graceful stop, job kill), never a
    * transient fault. Retrying one would resubmit whole jobs during
    * teardown; both the retry loop here and the process exit classifier
    * (Main) refuse to treat it as retryable.
    */
  def isCancellation(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).exists { t =>
      t.isInstanceOf[java.util.concurrent.CancellationException] ||
        t.isInstanceOf[InterruptedException] ||
        Option(t.getMessage).exists { m =>
          val l = m.toLowerCase
          l.contains("cancel") || l.contains("interrupt")
        }
    }

  def apply[T](policy: RetryPolicy)(body: => T): T = {
    var attempt = 1
    var delay = policy.baseDelayMs.toDouble
    while (true) {
      try return body
      catch {
        // NonFatal only: an OutOfMemoryError/LinkageError must propagate
        // (retrying on a corrupted JVM hides the real failure), and
        // NonFatal already treats InterruptedException as fatal so a stop
        // signal is never absorbed into a backoff sleep. Cancellations
        // (graceful stop kills the in-flight job) are operator decisions,
        // not transient faults — rethrown immediately.
        case scala.util.control.NonFatal(e)
            if attempt < policy.maxAttempts && policy.shouldRetry(e) && !isCancellation(e) =>
          Thread.sleep(math.min(delay.toLong, policy.maxDelayMs))
          delay *= policy.scaleFactor
          attempt += 1
      }
    }
    sys.error("unreachable")
  }
}
