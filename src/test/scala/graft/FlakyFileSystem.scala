package graft

import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, RawLocalFileSystem}

import java.io.IOException
import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

/** Fault-injecting local filesystem (`flaky:` scheme) for listing-retry
  * specs: every metadata entry point (status, list, open) throws a transient
  * IOException while the shared failure budget is positive, then behaves
  * like the local filesystem. Register with
  * `conf.set("fs.flaky.impl", classOf[FlakyFileSystem].getName)`.
  */
class FlakyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: URI = URI.create("flaky:///")

  override def getFileStatus(p: Path): FileStatus = {
    FlakyFileSystem.maybeThrow(); super.getFileStatus(p)
  }
  override def listStatus(p: Path): Array[FileStatus] = {
    FlakyFileSystem.maybeThrow(); super.listStatus(p)
  }
  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    FlakyFileSystem.maybeThrow(); super.open(p, bufferSize)
  }
}

object FlakyFileSystem {
  /** Remaining transient failures to inject across all instances. */
  val failures = new AtomicInteger(0)

  private[graft] def maybeThrow(): Unit =
    if (failures.getAndUpdate(n => if (n > 0) n - 1 else 0) > 0)
      throw new IOException("injected transient listing failure")
}
