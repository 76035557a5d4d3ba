package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-shape regressions for flagship queries: the properties that make
 * these plans survive a 100× scale-up, pinned in the EXECUTED plan
 * string so a refactor that silently re-introduces a full scan, drops a
 * broadcast, or breaks whole-stage codegen fails a named test instead
 * of a bench round.
 */
class PlanRegressionSpec extends AnyFunSuite with SparkTestBase {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0_001)
    df.collect() // materialize so AQE's FINAL plan (incl. codegen) is read
    df.queryExecution.executedPlan.toString
  }

  test("q6: filters reach the parquet scan and columns are pruned") {
    val p = plan("q6_forecast_revenue")
    // predicate pushdown: the shipdate/discount/quantity filters appear
    // as PushedFilters on the scan, not only as a post-scan Filter
    assert(p.contains("PushedFilters: ["), p)
    assert("l_shipdate|l_discount|l_quantity".r.findFirstIn(
      p.split("PushedFilters")(1).split("]")(0)).isDefined, p)
    // column pruning: a 4-column query must not read all 16 lineitem
    // columns — ReadSchema carries only what the query touches
    val readSchema = p.split("ReadSchema: ")(1).split("\n")(0)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"),
      readSchema)
  }

  test("q3: the customer dimension joins as a broadcast, not a shuffle") {
    val p = plan("q3_shipping_priority")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q1: the aggregate runs inside whole-stage codegen") {
    val p = plan("q1_pricing_summary")
    // executedPlan.toString spells a WholeStageCodegen span as a `*(n)`
    // prefix on its operators
    assert(p.contains("*(1)") || p.contains("*(2)"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("store_point_get: the key predicate is pushed to the scan") {
    val p = plan("store_point_get")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.split("PushedFilters")(1).split("]")(0).contains("EqualTo"), p)
  }

  test("knn_topk: top-k is TakeOrdered, never a global sort") {
    val df = SparkEntry.queries("knn_topk")(spark, sf0_001)
    df.collect()
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(exec.toString.contains("TakeOrderedAndProject"), exec.toString)
    // real node collect — the node prints as "Exchange", so a substring
    // test on "ShuffleExchange" would be vacuous
    val shuffles = exec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, shuffles.mkString("\n"))
  }
}
