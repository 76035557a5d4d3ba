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

  test("a running build never holds the cache-wide lock (VERDICT r11 #4)") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val cache = new SessionCache[String, Int]()
    val slowEntered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val fastDone = new CountDownLatch(1)
    val slow = new Thread(() => { cache.getOrElseUpdate(spark, "slow") {
      slowEntered.countDown()
      assert(release.await(10, TimeUnit.SECONDS)); 1
    }; () })
    slow.start()
    assert(slowEntered.await(10, TimeUnit.SECONDS))
    // while the slow build is mid-flight, an UNRELATED key must build
    // without waiting — a multi-second Spark job in one query cannot
    // serialize every other session-cache lookup in the JVM
    val fast = new Thread(() => {
      assert(cache.getOrElseUpdate(spark, "fast")(2) == 2)
      fastDone.countDown()
    })
    fast.start()
    assert(fastDone.await(10, TimeUnit.SECONDS),
      "unrelated key blocked behind a running build")
    release.countDown()
    slow.join(10000)
    assert(cache.getOrElseUpdate(spark, "slow")(99) == 1)
  }

  test("two racers on one key share exactly one build") {
    import java.util.concurrent.CountDownLatch
    val cache = new SessionCache[String, Int]()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val ts = (1 to 2).map { _ =>
      new Thread(() => {
        start.await()
        results.add(cache.getOrElseUpdate(spark, "k") {
          Thread.sleep(50); builds.incrementAndGet()
        })
      })
    }
    ts.foreach(_.start()); start.countDown(); ts.foreach(_.join(10000))
    assert(builds.get == 1, "same-key racers must share one build")
    import scala.jdk.CollectionConverters._
    assert(results.size == 2 && results.asScala.forall(_ == 1))
  }

  test("a build that throws is not cached; the next caller retries") {
    val cache = new SessionCache[String, Int]()
    intercept[RuntimeException](
      cache.getOrElseUpdate(spark, "k")(throw new RuntimeException("boom")))
    assert(cache.getOrElseUpdate(spark, "k")(7) == 7)
  }

  test("a failed build is invisible to size/contains (ADVICE r12)") {
    val cache = new SessionCache[String, Int]()
    intercept[RuntimeException](
      cache.getOrElseUpdate(spark, "k")(throw new RuntimeException("boom")))
    // the empty retry slot is bookkeeping, not a cache entry: observers
    // must see the same state as the pre-slot behavior (nothing cached)
    assert(cache.size == 0)
    assert(!cache.contains(spark))
    cache.getOrElseUpdate(spark, "k")(7)
    assert(cache.size == 1 && cache.contains(spark))
  }
}
