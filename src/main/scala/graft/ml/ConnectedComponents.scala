package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components by min-label propagation — the
 * graph-closure step of a dedup pipeline (near-dup pairs are edges;
 * each component is one transitive duplicate family).
 *
 * Each round: every vertex takes the minimum label among itself and its
 * neighbors (one equi-join + one partial-agg min — no pairwise work, no
 * driver-side graph). Labels are monotonically non-increasing and
 * bounded below by the component minimum, so the loop converges to
 * exactly that minimum for every member, independent of partitioning —
 * the output is deterministic.
 *
 * Rounds needed = the graph diameter. Near-dup families are shallow
 * (a document and its variants, diameter 2-3), where this is optimal.
 * A graph with long chains would want the large-star/small-star
 * contraction (Kiveris et al., "Connected Components in MapReduce and
 * Beyond"), which converges in O(log n) rounds with the same per-round
 * join shape — the `maxIterations` guard is where that variant would
 * slot in rather than a correctness backstop.
 */
object ConnectedComponents {

  /**
   * @param edges two integral id columns (`srcCol`, `dstCol`), undirected
   *              (symmetrized internally; self-loops and duplicates are
   *              harmless).
   * @return (id, component_id) for every vertex with at least one edge —
   *         component_id = min vertex id in the component.
   */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 20): DataFrame = {
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      // co-partition ONCE on the per-round join key: the checkpointed
      // frame keeps its hash partitioning, so every round's join reuses
      // it and only the (smaller) label side shuffles — the edge table
      // is the big side at scale and would otherwise re-shuffle each
      // round. Also cuts lineage and keeps the edges hot.
      .repartition(col("dst"))
      .localCheckpoint()
    var comp = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val nbrMin = sym.join(comp.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id")).agg(min("label").as("nbr_label"))
      // carry the old label through the update so convergence is a
      // filter over the already-checkpointed frame — not a second join
      // against the previous round (one fewer shuffle per round)
      val next = comp.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old_label"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next.filter(col("label") =!= col("old_label")).isEmpty
      comp = next.select("id", "label")
      iter += 1
    }
    require(converged, s"connected components did not converge in $maxIterations rounds")
    comp.select(col("id"), col("label").as("component_id"))
  }
}
