package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The HLL sketch has no cross-engine oracle; pin its error bound vs the
  * exact distinct query (which IS oracle-checked) instead. */
class ApproxDistinctSpec extends AnyFunSuite with SparkTestBase {
  test("approx_count_distinct within 5% of exact per group") {
    val exact = ScaleQueries.queries("events_distinct_users_exact")(spark, sf0_001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ScaleQueries.queries("events_distinct_users_approx")(spark, sf0_001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    exact.foreach { case (group, ex) =>
      assert(ex > 0)
      val ap = approx(group)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05,
        s"$group: approx=$ap exact=$ex")
    }
  }
}
