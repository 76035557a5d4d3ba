package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * GlobalOrder must be bit-identical to the single-task window spelling
 * on BOTH branches — the distributed branch is what runs at scale, so
 * it is the one that must never drift from the window semantics the
 * DuckDB oracles spell.
 */
class GlobalOrderSpec extends AnyFunSuite with SparkTestBase {

  private def fixture = {
    import spark.implicits._
    // deterministic skewed counts with ties (many users share n) — ties
    // are exactly what the unique (n desc, id) tie-break must handle
    (1L to 5000L).map(i => (i, (i * i) % 97 + 1)).toDF("id", "n")
      .repartition(8)
  }

  private def windowTruth = {
    val w = Window.orderBy(col("n").desc, col("id"))
    fixture
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("decile", ntile(10).over(w))
  }

  test("distributed branch: rank, cumsum and ntile match the window exactly") {
    val truth = windowTruth.collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    // threshold 1 forces the range-partitioned two-pass branch
    val got = GlobalOrder.rankCumsum(fixture,
        Seq(col("n").desc, col("id")), valueCol = Some("n"),
        exactWindowMaxRows = 1L)
      .withColumn("decile",
        GlobalOrder.ntileFromRank(col("rk"), lit(5000L), 10))
      .collect()
    assert(got.length == truth.size)
    got.foreach { r =>
      assert(truth(r.getLong(0)) ==
        ((r.getLong(2), r.getLong(3), r.getInt(4))), r.toString)
    }
  }

  test("window branch: same result through the small-rollup path") {
    val truth = windowTruth.select("id", "rk", "cum").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = GlobalOrder.rankCumsum(fixture,
      Seq(col("n").desc, col("id")), valueCol = Some("n"),
      exactWindowMaxRows = 1000000L).collect()
    got.foreach(r => assert(truth(r.getLong(0)) == ((r.getLong(2), r.getLong(3)))))
  }

  test("ntileFromRank covers the n < buckets edge (one row per bucket)") {
    import spark.implicits._
    val df = (1L to 7L).toDF("rk")
      .withColumn("d", GlobalOrder.ntileFromRank(col("rk"), lit(7L), 10))
    assert(df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap ==
      (1L to 7L).map(i => i -> i.toInt).toMap)
  }
}
