package graft.util

/**
 * JVM-exit cleanup registry for session-lifetime scratch directories.
 *
 * The per-session scratch dirs ([[graft.queries]]' `sessionScratch`)
 * are CACHED for the session so repeated invocations of a query reuse
 * one path, and each query eagerly deletes its data under the dir
 * (delete-after-pin) — but the empty parent has to outlive every
 * query and so can only be reclaimed when the process ends. Registering
 * it here bounds tmpdir litter at zero across repeated Verify/Bench
 * runs instead of one empty dir per (tag, process).
 *
 * The hook only ever deletes paths this process created via
 * [[register]]; deletion is best-effort (a shutdown race with another
 * hook loses nothing — the next run registers fresh dirs).
 */
object ExitScratch {
  private val paths = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    paths.forEach(p => deleteRecursively(new java.io.File(p)))))

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** Track `path` for deletion at JVM exit; returns it unchanged. */
  def register(path: String): String = {
    paths.add(path)
    path
  }
}
