package graft.util

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The stopped-session eviction contract behind every shared oracle
  * frame (exactTopKCached / exactPairsCached / the near-dup pair table):
  * entries die with their session, and a new session can never be
  * served another session's value. `isStopped` is injected so the spec
  * proves eviction without killing the shared test SparkContext. */
class SessionCacheSpec extends AnyFunSuite with SparkTestBase {

  test("memoizes per session and key") {
    val cache = new SessionCache[String, Int]()
    var builds = 0
    def build: Int = { builds += 1; builds }
    assert(cache.getOrElseUpdate(spark, "k")(build) == 1)
    assert(cache.getOrElseUpdate(spark, "k")(build) == 1) // memoized
    assert(cache.getOrElseUpdate(spark, "k2")(build) == 2) // new key builds
    assert(builds == 2)
  }

  test("entries for stopped sessions are purged on access; live ones kept") {
    val stopped = scala.collection.mutable.Set.empty[org.apache.spark.sql.SparkSession]
    val cache = new SessionCache[String, Int](isStopped = stopped.contains)
    val other = spark.newSession()
    cache.getOrElseUpdate(spark, "a")(1)
    cache.getOrElseUpdate(other, "a")(10)
    assert(cache.size == 2)
    // sessions are isolated: same key, different value per session
    assert(cache.getOrElseUpdate(other, "a")(99) == 10)
    assert(cache.getOrElseUpdate(spark, "a")(99) == 1)
    // "stop" the second session: next access must evict its entries
    stopped += other
    assert(cache.getOrElseUpdate(spark, "a")(99) == 1)
    assert(!cache.contains(other))
    assert(cache.size == 1)
    // and a revived build for the stopped-then-live session is fresh,
    // never the dead value
    stopped -= other
    assert(cache.getOrElseUpdate(other, "a")(42) == 42)
  }
}
