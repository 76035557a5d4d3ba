package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, ResolvedHint}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Broadcast-boundedness discipline for the co-supply graph family: every
 * broadcast HINT in the logical plan must sit over a frame bounded by
 * construction (an ungrouped aggregate — one row), never over a frame
 * proportional to a table's cardinality. The r9 hazard was
 * `broadcast(rareParts)` — the below-mean-fan allow-list grows with
 * |parts|, so forcing it broadcast is a driver OOM at 100× part
 * cardinality. That hint is gone; this spec keeps it gone while leaving
 * AQE free to broadcast the semi-join side when runtime stats say it is
 * small (a size-based decision, which IS bounded).
 */
class GraphBroadcastSpec extends AnyFunSuite with SparkTestBase {

  private def unboundedBroadcastHints(name: String): Seq[LogicalPlan] = {
    val df = SparkEntry.queries(name)(spark, sf0_001)
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.nonEmpty => h.child
    }.filterNot(oneRowByConstruction)
  }

  /** Bounded by construction = an ungrouped aggregate (one row at any
    * scale) at the root, looking only through row-preserving-or-reducing
    * UNARY wrappers. Deliberately NOT "contains an ungrouped aggregate
    * anywhere": rareParts itself holds the meanFan scalar under a
    * crossJoin, so a contains-check would vacuously excuse the exact
    * hazard this spec exists to block. */
  private def oneRowByConstruction(p: LogicalPlan): Boolean = p match {
    case a: Aggregate => a.groupingExpressions.isEmpty
    case u: org.apache.spark.sql.catalyst.plans.logical.Project =>
      oneRowByConstruction(u.child)
    case u: org.apache.spark.sql.catalyst.plans.logical.Filter =>
      oneRowByConstruction(u.child)
    case u: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      oneRowByConstruction(u.child)
    case _ => false
  }

  test("graph_knn_triangles: no cardinality-proportional broadcast hint") {
    val bad = unboundedBroadcastHints("graph_knn_triangles")
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("graph_link_predict: no cardinality-proportional broadcast hint") {
    val bad = unboundedBroadcastHints("graph_link_predict")
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
