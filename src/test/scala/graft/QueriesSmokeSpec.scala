package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must run and return rows at sf0.001, and every
  * oracle key must have a matching query (driver contract). */
class QueriesSmokeSpec extends AnyFunSuite with SparkTestBase {

  test("oracleSql keys are a subset of queries keys") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle without query: $dangling")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001 with rows > 0") {
      assert(fn(spark, sf0_001).count() > 0)
    }
  }
}
