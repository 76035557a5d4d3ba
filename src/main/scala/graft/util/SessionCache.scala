package graft.util

import org.apache.spark.sql.SparkSession

/**
 * Session-scoped memo for localCheckpoint-pinned oracle frames (the
 * `exactTopKCached` / `exactPairsCached` / shared-pair-table
 * discipline): one value per (live session, key), where entries for
 * STOPPED sessions are purged on every access.
 *
 * Why both mechanisms: the outer map weak-keys the SparkSession OBJECT
 * so a new session can never be served a dead session's checkpoint
 * (an identity hash could collide), but weak keying alone cannot
 * reclaim anything here — the cached DataFrames strongly reference
 * their session, so the value would pin the weak key forever. The
 * explicit purge breaks that cycle. `isStopped` is injectable so a
 * spec can prove the eviction without stopping the shared test
 * session's one-per-JVM SparkContext.
 */
class SessionCache[K, V](
    isStopped: SparkSession => Boolean = _.sparkContext.isStopped) {

  private val cache =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[K, V]]()

  def getOrElseUpdate(s: SparkSession, key: K)(build: => V): V =
    cache.synchronized {
      val it = cache.entrySet().iterator()
      while (it.hasNext) if (isStopped(it.next().getKey)) it.remove()
      var perSession = cache.get(s)
      if (perSession == null) {
        perSession = scala.collection.mutable.Map.empty
        cache.put(s, perSession)
      }
      perSession.getOrElseUpdate(key, build)
    }

  /** Live-session entry count — spec observability only. */
  def size: Int = cache.synchronized {
    val it = cache.entrySet().iterator()
    var n = 0
    while (it.hasNext) { n += it.next().getValue.size }
    n
  }

  /** Whether any entry is currently held for `s` — spec observability. */
  def contains(s: SparkSession): Boolean =
    cache.synchronized { cache.containsKey(s) }
}
