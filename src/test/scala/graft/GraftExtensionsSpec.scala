package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must make the SQL functions available in a session
  * built with spark.sql.extensions=graft.GraftExtensions. */
class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  test("session built with GraftExtensions resolves the vector functions from SQL") {
    // force the shared session to exist first so we restore it afterwards.
    // spark.sql.extensions is a STATIC conf read from the SparkContext at
    // first-session build, so in this shared-context test JVM the
    // config-string path can't be exercised; withExtensions() is the same
    // injection entry point via the public builder API.
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val row = ext.sql(
        """SELECT
          |  cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
          |  dot_product(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
          |  l2_distance(array(0.0F, 0.0F), array(3.0F, 4.0F)) AS e,
          |  l2_norm(array(3.0F, 4.0F)) AS n""".stripMargin).head()
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(row.getDouble(1) - 11.0) < 1e-12)
      assert(math.abs(row.getDouble(2) - 5.0) < 1e-12)
      assert(math.abs(row.getDouble(3) - 5.0) < 1e-12)
      // LSH band keys from SQL: literal params, 96 well-formed keys
      val bands = ext.sql(
        "SELECT simhash_bands(array(1.0F, 2.0F, 3.0F), 42, 7, 96) AS b")
        .head().getSeq[Long](0)
      assert(bands.length == 96)
      assert(bands.zipWithIndex.forall { case (k, t) => (k >>> 7) == t.toLong })
      // bloom pair from SQL: build over 0..99, probe members + one miss.
      // (members always hit; 1000 misses at 8 bits/key would be unlucky
      // to ALL false-positive — probe one and accept either, asserting
      // only the member side, which is the bloom guarantee.)
      ext.range(100).createOrReplaceTempView("graft_ext_bloom_keys")
      val bloomHits = ext.sql(
        """WITH bf AS (
          |  SELECT bloom_filter_agg(xxhash64(id), 1000L, 8000L) AS b
          |  FROM graft_ext_bloom_keys
          |)
          |SELECT count(*) FROM graft_ext_bloom_keys
          |WHERE might_contain((SELECT b FROM bf), xxhash64(id))""".stripMargin)
        .head().getLong(0)
      assert(bloomHits == 100L, s"bloom dropped a member: $bloomHits/100")
      // non-foldable params are rejected, not silently misread (rand() is
      // non-deterministic, so the seed argument cannot be folded)
      val err = intercept[Exception] {
        ext.sql("SELECT simhash_bands(array(1.0F), CAST(rand() * 10 AS BIGINT), 7, 96)")
          .head()
      }
      assert(err.getMessage.contains("literal"))
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
