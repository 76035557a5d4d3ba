package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Skew stress for the iterative graph family: real graphs are power-law,
 * and the canonical worst case is one hub touching a large share of all
 * edges. The per-round shapes (equi-join + partial-agg min for CC,
 * equi-join + partial-agg sum for PageRank) must stay correct AND
 * complete promptly when one join/grouping key carries half the edge
 * table — the partial aggregation is what absorbs the skew (each task
 * reduces its hub rows locally; only partitions×1 rows per key cross the
 * shuffle), with AQE skew-join splitting as the backstop for the join
 * side (see SCALE.md "Skewed graphs").
 */
class SkewedGraphSpec extends AnyFunSuite with SparkTestBase {

  /** ~20k vertices: hub 0 joined to 1..10000 (half of all edges), and
    * disjoint 2-cliques 30000+ as background components. `withChain`
    * hangs a 1000-link chain off the hub component — depth that only the
    * star-contraction variant should face (min-label propagation is
    * diameter-bounded by design and documented for shallow dedup
    * graphs). */
  private def powerLawEdges(withChain: Boolean = false): DataFrame = {
    import spark.implicits._
    val hub = spark.range(1, 10001).select(lit(0L).as("src"), col("id").as("dst"))
    val pairs = spark.range(0, 4000).select(
      (col("id") * 2 + 30000L).as("src"), (col("id") * 2 + 30001L).as("dst"))
    val base = hub.unionByName(pairs)
    if (!withChain) base
    else base
      .unionByName(spark.range(0, 1000).select(
        (col("id") + 20000L).as("src"), (col("id") + 20001L).as("dst")))
      .unionByName(Seq((1L, 20000L)).toDF("src", "dst"))
  }

  test("min-label CC converges fast and correctly on a hub-skewed graph") {
    val t0 = System.nanoTime()
    val comp = ConnectedComponents.run(powerLawEdges(), "src", "dst")
      .localCheckpoint()
    val secs = (System.nanoTime() - t0) / 1e9
    // correctness: the hub component is exactly {0..10000}
    val hubComp = comp.filter(col("component_id") === 0)
    assert(hubComp.count() == 10001)
    // every 2-clique is its own component
    assert(comp.filter(col("id") >= 30000).filter(
      col("component_id") =!= (col("id") - pmod(col("id"), lit(2)))).isEmpty)
    // a hub fan-in of 10k edges must not stall the round loop (the
    // partial-agg min compresses hub rows map-side); generous wall
    // budget — the signal is "completes in round-count time, not in
    // per-edge time"
    assert(secs < 120.0, s"skewed CC took ${secs}s")
  }

  test("star-contraction CC handles the hub + a 1000-deep chain in O(log n) rounds") {
    val t0 = System.nanoTime()
    val comp = ConnectedComponents.runStar(powerLawEdges(withChain = true),
      "src", "dst").localCheckpoint()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(comp.filter(col("component_id") === 0).count() == 10001 + 1001)
    assert(secs < 180.0, s"skewed star CC took ${secs}s")
  }

  test("PageRank-shaped round joins survive the hub key") {
    // the graph_pagerank per-round shape on the skewed edges: out-degree,
    // contribution join on src, partial-agg sum on dst — hub 0 fans out
    // 10k contributions and fans in 10k sums
    val e0 = powerLawEdges()
    val edges = e0
      .unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src")).localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val n = edges.select(col("src")).distinct().count().toDouble
    var ranks = edges.select(col("src").as("node")).distinct()
      .withColumn("r", lit(1.0) / n).localCheckpoint()
    val t0 = System.nanoTime()
    (1 to 3).foreach { _ =>
      ranks = edges
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .join(deg, "src")
        .select(col("dst"), (col("r") / col("deg")).as("c"))
        .groupBy(col("dst")).agg((lit(0.15) / n + lit(0.85) * sum(col("c"))).as("r"))
        .select(col("dst").as("node"), col("r"))
        .localCheckpoint()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(ranks.count() > 0)
    // the hub accumulates the chain+leaf mass: strictly the max rank
    val top = ranks.orderBy(col("r").desc).select("node").head().getLong(0)
    assert(top == 0L, s"hub should dominate, got $top")
    assert(secs < 120.0, s"3 skewed PR rounds took ${secs}s")
  }
}
