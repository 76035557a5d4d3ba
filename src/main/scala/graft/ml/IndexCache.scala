package graft.ml

/**
 * Shared build-once/read-many lifecycle for persisted ANN index artifacts
 * (IVF cell tables, PQ code tables): a registered query path must never
 * run an iterative fit — it loads the prebuilt index keyed on a content
 * fingerprint of the source files plus the quantizer params, building and
 * publishing it atomically on first use (the single-node analog of the
 * explicit index job that maintains these tables at 100 TB).
 *
 * Staleness: the key hashes file count + name + length + mtime + a CRC32
 * of the head bytes, so a regenerated corpus or changed index shape
 * rebuilds instead of serving stale data (the CRC catches a file
 * rewritten same-size within mtime granularity).
 *
 * Concurrency: the cache root is shared (tmpdir), so builds go to a
 * process-unique staging dir and are atomically renamed into place; a
 * concurrent builder that wins the rename is detected and its index
 * served. A reader never observes a half-written index.
 */
private[ml] object IndexCache {

  /** Resolve the published index dir for (source, params), building via
    * `buildInto(stagingDir)` if absent. `successRel` is a file that only
    * exists in a complete index (e.g. "assigned/_SUCCESS"). */
  def openOrBuild(sourcePath: String, paramsFingerprint: String,
      cacheRoot: String, successRel: String)(buildInto: String => Unit): String = {
    val dir = new java.io.File(sourcePath)
    val srcFiles = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq(dir))
      .filter(_.isFile).sortBy(_.getName)
    val files = srcFiles.map(f => s"${f.getName}:${f.length}:${f.lastModified}:${headCrc(f)}")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((s"$sourcePath|n=${srcFiles.size}" +: files).mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val path = s"$cacheRoot/$key-$paramsFingerprint"
    val target = new java.io.File(path)
    if (!new java.io.File(target, successRel).isFile) {
      val staging = new java.io.File(
        s"$path.build-${java.lang.ProcessHandle.current().pid()}-${System.nanoTime()}")
      // a build that dies mid-write must not leak its staging dir into the
      // shared cache root (nor can it ever be served — only a rename
      // publishes)
      try buildInto(staging.getPath)
      catch { case t: Throwable => deleteRecursively(staging); throw t }
      try {
        java.nio.file.Files.move(staging.toPath, target.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } catch {
        // rename refused because the target path exists: legitimate only
        // when a concurrent builder PUBLISHED a complete index (its
        // success marker is present — a rename is atomic, so a published
        // dir is complete). A stale partial dir at the key path (e.g. a
        // crashed pre-guard build) is removed and the move retried, so an
        // incomplete index is never served and our finished build is
        // never discarded in its favor.
        case e @ (_: java.nio.file.FileAlreadyExistsException
                | _: java.nio.file.FileSystemException) if target.isDirectory =>
          if (new java.io.File(target, successRel).isFile) deleteRecursively(staging)
          else {
            deleteRecursively(target)
            try {
              java.nio.file.Files.move(staging.toPath, target.toPath,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            } catch {
              // lost a second race — by the same argument the winner is
              // complete
              case _: java.nio.file.FileAlreadyExistsException
                 | _: java.nio.file.FileSystemException
                  if new java.io.File(target, successRel).isFile =>
                deleteRecursively(staging)
            }
          }
      }
    }
    path
  }

  /** CRC32 of the first 64 KiB — cheap content signal for the fingerprint. */
  private def headCrc(f: java.io.File): Long = {
    val crc = new java.util.zip.CRC32()
    val in = new java.io.FileInputStream(f)
    try {
      val buf = new Array[Byte](65536)
      val n = in.read(buf)
      if (n > 0) crc.update(buf, 0, n)
    } finally in.close()
    crc.getValue
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
