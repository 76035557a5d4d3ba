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
    test(s"query $name runs at sf0.001 with rows > 0, no CartesianProduct") {
      val df = fn(spark, sf0_001)
      // scale guard: a non-broadcast cross join (CartesianProduct) in any
      // registered plan is an unbounded pairwise blowup waiting for real
      // data — the 1-row-dim cross joins used throughout plan as
      // BroadcastNestedLoopJoin and are fine. (The fenced _bruteforce
      // baseline is broadcast too at this scale; its guard is the fence.)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      assert(df.count() > 0)
    }
  }
}
