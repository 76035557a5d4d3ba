package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Deterministic CLUSTERED embedding corpus — the workload shape the IVF
 * scale story rests on (real embedding corpora cluster; the uniform-random
 * fixture is the worst case where a coarse quantizer has nothing to
 * exploit). Cluster centers are seeded random Gaussian directions
 * (near-orthogonal at 64-d), members are center + N(0, noise) jitter,
 * langs alternate inside each cluster so every cluster holds both sides
 * of the bitext mining join, label = cluster id.
 *
 * Shared by `BitextClusteredSpec` (pins the clustered-contract agreement
 * and probed fraction at fixture size), `IvfGeometrySpec` (pins that
 * calibration picks a SMALL probe fraction here), and `graft.ClusteredBench`
 * (the scaled wall-clock crossover measurement recorded in SCALE.md).
 */
object ClusteredCorpus {

  /** Write `embeddings.parquet` (vec_id, embedding, label) and
    * `documents.parquet` (doc_id, lang) under `dir`. */
  def write(spark: SparkSession, dir: String, nClusters: Int, perCluster: Int,
      dim: Int = 64, noise: Double = 0.05, seed: Long = 7L): Unit = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = for {
      c <- 0 until nClusters
      j <- 0 until perCluster
    } yield {
      val emb = centers(c).map(x => x + (rnd.nextGaussian() * noise).toFloat)
      val id = (c * perCluster + j).toLong
      val lang = if (j % 2 == 0) "en" else "fr"
      (id, emb, c, lang)
    }
    import spark.implicits._
    // a handful of real files (multi-split scans), pinned before writing
    // so both outputs derive from ONE materialization of the rows
    val df = rows.toDF("vec_id", "embedding", "label", "lang")
      .repartition(8, col("vec_id"))
      .localCheckpoint()
    df.select(col("vec_id"), col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    df.select(col("vec_id").as("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }
}
