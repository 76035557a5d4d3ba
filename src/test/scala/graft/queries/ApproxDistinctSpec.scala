package graft.queries

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The HLL and quantile sketches have no cross-engine oracle; pin their
  * error bounds vs the exact queries (which ARE oracle-checked) instead. */
class ApproxDistinctSpec extends AnyFunSuite with SparkTestBase {

  test("percentile_approx returns values at empirical rank within eps of q") {
    import org.apache.spark.sql.functions._
    val approx = ScaleQueries.quantilesApproxFull(spark, sf0_001)
      .collect().map(r => r.getString(0) ->
        Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2), 0.99 -> r.getDouble(3))).toMap
    assert(approx.nonEmpty)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val values = spark.read.parquet(s"$sf0_001/events.parquet")
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    // GK guarantee: the returned value's empirical rank is within the
    // sketch's rank error of q; with accuracy 10000 the dominant slack is
    // value discreteness (one order statistic = 1/n of rank)
    approx.foreach { case (g, qs) =>
      val vs = values(g); val n = vs.length.toDouble
      qs.foreach { case (q, a) =>
        val rankLe = vs.count(_ <= a) / n
        val rankLt = vs.count(_ < a) / n
        assert(rankLt - 2.0 / n <= q && q <= rankLe + 2.0 / n,
          s"$g p$q: approx=$a has rank [${rankLt}, ${rankLe}] (n=${vs.length})")
      }
    }
  }
  test("approx_count_distinct within 5% of exact per group") {
    val exact = ScaleQueries.queries("events_distinct_users_exact")(spark, sf0_001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ScaleQueries.distinctApproxFull(spark, sf0_001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty && exact.keySet == approx.keySet)
    exact.foreach { case (group, ex) =>
      assert(ex > 0)
      val ap = approx(group)
      assert(math.abs(ap - ex).toDouble / ex <= 0.05,
        s"$group: approx=$ap exact=$ex")
    }
  }

  test("driver-visible pass columns are all true on the sketch queries") {
    Seq("events_distinct_users_approx", "events_value_quantiles_approx",
        "events_heavy_hitters_cms").foreach { q =>
      val rows = ScaleQueries.queries(q)(spark, sf0_001)
        .select("pass").collect()
      assert(rows.nonEmpty && rows.forall(_.getBoolean(0)), s"$q pass=false row")
    }
  }
}
