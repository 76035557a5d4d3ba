package graft.ml

import graft.functions.VectorFunctions.{cosineSim, l2Norm}
import graft.functions.TopKByScore
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) approximate nearest-neighbor search: a KMeans coarse
 * quantizer partitions the corpus into `nCentroids` cells; a query probes
 * only its `nProbe` nearest cells and scores candidates exactly.
 *
 * Scale shape (the IVF contract at 100 TB):
 *  - index build = one KMeans fit + one map-side cluster assignment; the
 *    assigned corpus is then *partitioned by cell* — the expensive part
 *    happens once, not per query;
 *  - search = tiny centroid table (nCentroids × dim floats) broadcast to
 *    route each query to nProbe cells, then an equi-join on cell id pulls
 *    only ~nProbe/nCentroids of the corpus per query, scored exactly with
 *    the codegen'd cosine kernel and reduced by the bounded partial-agg
 *    top-k. Nothing ever materializes the all-pairs space.
 *
 * Determinism: fixed KMeans seed -> stable cells -> stable results.
 * Recall vs exact brute force is pinned in IvfIndexSpec.
 */
class IvfIndex(nCentroids: Int = 16, nProbe: Int = 4, seed: Long = 42L) {
  require(nProbe <= nCentroids)

  /** id + original embedding + unit `features` vector (zero vectors dropped). */
  private def prepare(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val norm = l2Norm(col(embCol))
    df.filter(norm > 0)
      .select(col(idCol).as("id"), col(embCol).as("emb"),
        array_to_vector(transform(col(embCol), x => x / norm)).as("features"))
  }

  /** Built index: the fitted quantizer + the cell-assigned corpus. */
  case class Built(model: KMeansModel, assigned: DataFrame, centroids: DataFrame)

  def build(spark: SparkSession, corpus: DataFrame, idCol: String, embCol: String): Built = {
    val prepared = prepare(corpus, idCol, embCol)
    val model = new KMeans()
      .setK(nCentroids).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(prepared)
    val assigned = model.transform(prepared)
      .select(col("id"), col("emb"), col("cell"))
      // the 100 TB analog: write the corpus partitioned/bucketed by cell so
      // the per-query candidate join is co-located
      .repartition(col("cell"))
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("cell", "centroid")
    Built(model, assigned, centroids)
  }

  /** Top-k corpus neighbors by exact cosine for every query row, probing
    * nProbe cells per query. */
  def search(built: Built, queries: DataFrame, idCol: String, embCol: String, k: Int): DataFrame = {
    val q = prepare(queries, idCol, embCol)
      .select(col("id").as("q_id"), col("emb").as("q_emb"))
    // route: query × broadcast(centroids) -> nProbe nearest cells per query
    val routed = q.crossJoin(broadcast(built.centroids))
      .select(col("q_id"), col("q_emb"), col("cell"),
        cosineSim(col("q_emb"), col("centroid")).as("cell_score"))
      .groupBy(col("q_id"), col("q_emb"))
      .agg(TopKByScore(nProbe)(col("cell_score"), col("cell").cast("long")).as("cells"))
      .select(col("q_id"), col("q_emb"), explode(col("cells.id")).as("cell"))
    // candidates: equi-join on cell, exact scoring, bounded top-k
    routed.join(built.assigned, routed("cell") === built.assigned("cell"))
      .select(col("q_id"), col("id").as("n_id"),
        cosineSim(col("q_emb"), col("emb")).as("cos"))
      .groupBy(col("q_id"))
      .agg(TopKByScore(k)(col("cos"), col("n_id")).as("hits"))
      .select(col("q_id"), posexplode(col("hits")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("cos"))
  }
}
