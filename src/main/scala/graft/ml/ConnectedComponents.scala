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

  /**
   * Alternating large-star/small-star contraction (Kiveris et al.,
   * "Connected Components in MapReduce and Beyond") — the O(log n)-round
   * variant for graphs with LONG chains, where [[run]]'s min-label
   * propagation would need diameter-many rounds.
   *
   * Each round rewires every vertex's neighborhood toward its
   * neighborhood minimum m(u) = min(N(u) ∪ {u}):
   *  - large-star: neighbors ABOVE u re-point to m(u);
   *  - small-star: neighbors at-or-below u re-point to m(u);
   * alternated until the canonical (min, max) edge set reaches its
   * fixpoint — a union of stars centered at component minima. Both steps
   * preserve connectivity (every rewired vertex stays linked to a member
   * of its own component), and each is one equi-join + partial-agg min,
   * the same per-round shuffle shape as [[run]].
   *
   * Same output contract as [[run]]: (id, component_id = component min)
   * for every vertex with at least one edge.
   */
  def runStar(edges: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 30): DataFrame = {
    def canonical(df: DataFrame): DataFrame =
      df.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
    var e = canonical(edges.select(col(srcCol).as("a"), col(dstCol).as("b")))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val sym = e.select(col("u"), col("v"))
        .unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val minN = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // alternate: even rounds rewire the above-u half (large-star),
      // odd rounds the at-or-below half (small-star); (u, m) rides along
      // in both so no vertex ever drops out of the edge set
      val half = if (iter % 2 == 0) col("v") > col("u") else col("v") < col("u")
      val next = canonical(
        sym.filter(half).join(minN, "u")
          .select(col("v").as("a"), col("m").as("b"))
          .unionByName(minN.select(col("u").as("a"), col("m").as("b"))))
        .localCheckpoint()
      // fixpoint of the canonical edge set — compared only on the
      // already-checkpointed frames, one anti-join each way
      converged = next.join(e, Seq("u", "v"), "left_anti").isEmpty &&
        e.join(next, Seq("u", "v"), "left_anti").isEmpty
      e = next
      iter += 1
    }
    require(converged, s"star contraction did not converge in $maxIterations rounds")
    e.select(col("u"), col("v"))
      .unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .groupBy(col("u").as("id"))
      .agg(min(col("v")).as("nbr_min"))
      .select(col("id"), least(col("id"), col("nbr_min")).as("component_id"))
  }
}
