package graft.tables

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileContext, FileSystem, Options, Path, UnsupportedFileSystemException}

/** The ONE tmp→target publish helper behind every pointer swap and log
  * commit in the repo (snapshot `_current`, Iceberg version-hint, Delta
  * commit JSON, IVF `_manifest.json`).
  *
  * Preferred path is FileContext, whose rename has the two semantics a
  * publish needs and `FileSystem.rename` lacks: `Rename.OVERWRITE` (no
  * delete-then-rename window for readers) and `Rename.NONE` (put-if-absent
  * — an existing target throws instead of silently clobbering or silently
  * returning false). But FileContext resolves an ABSTRACT-filesystem
  * binding (`fs.AbstractFileSystem.<scheme>.impl`), which many object-store
  * connectors never register — stock Hadoop ships none for `s3a` — so a
  * hard dependency on it means a stock-configured S3 deployment cannot
  * commit at all. Each entry point therefore catches
  * [[UnsupportedFileSystemException]] and degrades to the closest
  * FileSystem-only protocol, WARNING ONCE PER SCHEME what got weaker:
  *   - overwrite → rename-aside-then-rename (a reader can observe the
  *     target missing for an instant; a crash in the window leaves
  *     `<target>.prev` as a recoverable pointer rather than nothing);
  *   - put-if-absent → exists-check-then-rename (two concurrent writers
  *     can race the check; the single-writer contract becomes the
  *     deployment's job rather than the filesystem's).
  * Results stay correct under the single-writer/single-maintainer contract
  * every caller already documents; only the BELT against breaking that
  * contract degrades.
  */
object AtomicRename {

  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Schemes that fell back to FileSystem-only renames so far (spec
    * observability for the degrade warning).
    */
  private[graft] def warnedSchemes: Set[String] = {
    val it = warned.iterator()
    val b = Set.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def warnFallback(fs: FileSystem, consequence: String): Unit = {
    val scheme = fs.getUri.getScheme
    if (warned.add(scheme))
      System.err.println(
        s"ATOMIC RENAME: filesystem scheme '$scheme' has no AbstractFileSystem binding " +
          s"(fs.AbstractFileSystem.$scheme.impl) — publishes degrade to $consequence; " +
          "the single-writer/single-maintainer contract is now enforced by deployment, " +
          "not by the filesystem")
  }

  /** FileContext for `fs`'s scheme under the LIVE `conf`, or None when the
    * scheme has no AbstractFileSystem binding. `conf` must be the caller's
    * live Hadoop configuration, never `fs.getConf`: a cached FileSystem
    * freezes the conf it was created under, and a binding registered after
    * that point (the bench's counting scheme) is invisible in the frozen
    * copy — the exact interaction that silently emptied the r19
    * export_profile section.
    */
  private def fcOf(fs: FileSystem, conf: Configuration): Option[FileContext] =
    try Some(FileContext.getFileContext(fs.getUri, conf))
    catch { case _: UnsupportedFileSystemException => None }

  /** Publish `tmp` at `target`, REPLACING any existing target atomically
    * where the filesystem can express it.
    */
  def overwrite(fs: FileSystem, conf: Configuration, tmp: Path, target: Path): Unit =
    fcOf(fs, conf) match {
      case Some(fc) =>
        fc.rename(fc.makeQualified(tmp), fc.makeQualified(target), Options.Rename.OVERWRITE)
      case None =>
        warnFallback(fs,
          "rename-aside-then-rename (a concurrent reader can observe the target briefly missing)")
        // rename the old target ASIDE instead of deleting it: a crash
        // between the two renames then leaves `.<target>.prev` on disk —
        // a recoverable pointer — where delete-then-rename would leave
        // nothing at all (an unreadable table until manual repair).
        // Dot-prefixed so directory listings that enumerate siblings of
        // the target (the branch-pointer dir) never surface it as a
        // phantom entry.
        val prev = new Path(target.getParent, "." + target.getName + ".prev")
        if (fs.exists(target)) {
          // clear the way for the aside rename ONLY when there is a live
          // target to move: on a post-crash retry (target missing, .prev
          // holding the sole copy of the old pointer) an unconditional
          // delete here would destroy the very recovery state this
          // fallback exists to preserve
          fs.delete(prev, false)
          require(fs.rename(target, prev),
            s"failed to move $target aside (rename returned false)")
        }
        // a silent rename failure would leave the pointer stale forever —
        // fail loudly (the IcebergExport precedent)
        require(fs.rename(tmp, target),
          s"failed to publish $target (rename returned false)")
        // cleanup only after the new target is published; a leftover
        // .prev (crash before this line) is harmless and superseded
        fs.delete(prev, false)
    }

  /** Publish `tmp` at `target` ONLY if absent; throws
    * [[FileAlreadyExistsException]] when the target already exists (the
    * Delta-commit concurrent-writer detector). The fallback's exists-check
    * is racy — losing FileContext loses the atomicity of the check, not
    * the correctness of a contract-abiding single writer.
    */
  def putIfAbsent(fs: FileSystem, conf: Configuration, tmp: Path, target: Path): Unit =
    fcOf(fs, conf) match {
      case Some(fc) =>
        fc.rename(fc.makeQualified(tmp), fc.makeQualified(target), Options.Rename.NONE)
      case None =>
        warnFallback(fs,
          "exists-check-then-rename (concurrent-writer detection becomes racy)")
        if (fs.exists(target)) throw new FileAlreadyExistsException(target.toString)
        if (!fs.rename(tmp, target)) {
          // most FileSystems return false for an existing target — re-check
          // so a lost race still surfaces as the named collision
          if (fs.exists(target)) throw new FileAlreadyExistsException(target.toString)
          throw new IllegalStateException(
            s"failed to publish $target (rename returned false)")
        }
    }
}
