package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Aggregate navigation: registered rollups serve matching GROUP BYs
  * exactly; everything outside the soundness gates keeps its fact scan. */
class RollupRewriteSpec extends AnyFunSuite with SparkTestBase {

  private val factPath = s"$sf0_001/orders.parquet"

  private def naive = spark.read.parquet(factPath)
    .filter(col("o_orderpriority") =!= "1-URGENT")
    .groupBy(col("o_orderstatus"))
    .agg(count(lit(1)).as("n"),
      sum(col("o_totalprice").cast(DecimalType(18, 3))).cast("double")
        .as("total"))

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("matching aggregate rides the rollup, exactly") {
    RollupRegistry.clear()
    val exact = naive.collect().map(_.toSeq).toSet // before registration
    RollupRegistry.register(spark, factPath,
      dims = Seq("o_orderstatus", "o_orderpriority"),
      measures = Seq("o_totalprice"))
    try {
      val p = planOf(naive)
      assert(p.contains("_cnt"), p) // the scan reads rollup columns
      assert(!p.contains("o_custkey"), p)
      assert(naive.collect().map(_.toSeq).toSet == exact)
    } finally RollupRegistry.clear()
  }

  test("kill switch and non-matching shapes keep the fact scan") {
    RollupRegistry.clear()
    RollupRegistry.register(spark, factPath,
      dims = Seq("o_orderstatus", "o_orderpriority"),
      measures = Seq("o_totalprice"))
    try {
      spark.conf.set(RollupRewriteRule.ConfKey, "false")
      assert(!planOf(naive).contains("_cnt"))
      spark.conf.set(RollupRewriteRule.ConfKey, "true")
      // raw double sum is not re-aggregable from partials: no match
      val rawSum = spark.read.parquet(factPath)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("o_totalprice")).as("t"))
      assert(!planOf(rawSum).contains("_cnt"))
      // grouping on a non-dim column: no match
      val badDim = spark.read.parquet(factPath)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      assert(!planOf(badDim).contains("_cnt"))
      // filter on a non-dim column: no match
      val badFilter = spark.read.parquet(factPath)
        .filter(col("o_custkey") < 100)
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      assert(!planOf(badFilter).contains("_cnt"))
      // distinct aggregate: no match
      val dist = spark.read.parquet(factPath)
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_orderpriority")).as("d"))
      assert(!planOf(dist).contains("_cnt"))
    } finally {
      spark.conf.set(RollupRewriteRule.ConfKey, "true")
      RollupRegistry.clear()
    }
  }
}
