package graft.queries

import graft.QueryPack
import graft.ml.{CosineLsh, IvfIndex}
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor queries — the scale path for similarity
 * search and embedding dedup. These are deliberately NOT oracle-checked
 * (an approximate result has no SQL-exact oracle); the driver records a
 * rows-only check, and recall >= 0.9 against the exact brute-force
 * operators is pinned by CosineLshSpec / IvfIndexSpec. Results are
 * deterministic (fixed projection / KMeans seeds), so row counts are
 * stable across runs.
 */
object AnnQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // LSH-bucketed embedding near-dup pairs (approx analog of
    // dedup_embedding_pairs).
    "ann_cosine_pairs" -> ((s, dir) =>
      new CosineLsh().similarPairs(
          t(s, dir, "embeddings"), "vec_id", "embedding", minCos = 0.4)
        .select(col("a_id"), col("b_id"), round6(col("cos")).as("score"))
        .orderBy(col("a_id"), col("b_id"))),

    // LSH-bucketed batch kNN join (approx analog of knn_join).
    "ann_knn_join" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      new CosineLsh().knnJoin(
          corpus = emb, queries = emb.filter(col("vec_id") < 20),
          idCol = "vec_id", embCol = "embedding", k = 3)
        .select(col("q_id"), col("rank"), col("neighbor_id"),
          round6(col("cos")).as("score"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // IVF (KMeans coarse quantizer) batch kNN join. The synthetic corpus
    // is uniform random (worst case for IVF — no cluster structure), so a
    // high probe fraction is needed for recall 0.9; real embedding corpora
    // cluster and probe far fewer cells.
    "ann_ivf_knn" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val ivf = new IvfIndex(nCentroids = 8, nProbe = 5)
      val built = ivf.build(s, emb, "vec_id", "embedding")
      ivf.search(built, emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 3)
        .select(col("q_id"), col("rank"), col("neighbor_id"),
          round6(col("cos")).as("score"))
        .orderBy(col("q_id"), col("rank"))
    })
  )

  override def oracleSql: Map[String, String] = Map.empty
}
