package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The HLL sketch has no cross-engine oracle; pin its error bound vs the
  * exact distinct count instead. */
class ApproxDistinctSpec extends AnyFunSuite with SparkTestBase {
  test("approx_count_distinct within 5% of exact per group") {
    val rows = ScaleQueries.queries("events_distinct_users_approx")(spark, sf0_001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(exact > 0)
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }
}
