package graft.ml

import graft.functions.VectorFunctions.l2Norm
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Approximate cosine similarity search via MLlib's random-projection LSH —
 * the scale path for kNN joins and embedding near-dup: bucket, then join
 * only within buckets, instead of the all-pairs O(N·M) the exact operators
 * pay.
 *
 * Cosine is reduced to Euclidean on L2-normalized vectors
 * (`cos(a,b) = 1 - d(â,b̂)²/2`), which is what
 * `BucketedRandomProjectionLSH` hashes. The reduction is exact, so the
 * only approximation is LSH recall itself (tunable via `numHashTables`);
 * `CosineLshSpec` pins recall >= 0.9 against the exact brute-force pairs.
 *
 * Determinism: fixed projection seed, so the bucket assignment — and
 * therefore the approximate result set — is stable run to run (the driver
 * re-runs registered ANN queries and row counts must not flap).
 */
class CosineLsh(
    numHashTables: Int = 5,
    bucketLength: Double = 1.0,
    seed: Long = 42L) {

  /** id + unit-normalized `features` vector (zero vectors dropped — they
    * have no direction, and the reference's cosine is NaN on them). */
  def prepare(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val norm = l2Norm(col(embCol))
    df.filter(norm > 0)
      .select(col(idCol).as("id"),
        array_to_vector(transform(col(embCol), x => x / norm)).as("features"))
  }

  def fit(prepared: DataFrame): BucketedRandomProjectionLSHModel =
    new BucketedRandomProjectionLSH()
      .setInputCol("features")
      .setOutputCol("hashes")
      .setNumHashTables(numHashTables)
      .setBucketLength(bucketLength)
      .setSeed(seed)
      .fit(prepared)

  /** Euclidean distance on unit vectors equivalent to `cosine >= minCos`. */
  def distFor(minCos: Double): Double = math.sqrt(math.max(0.0, 2.0 - 2.0 * minCos))

  private def distToCos(dist: Column): Column = lit(1.0) - dist * dist / 2.0

  /**
   * All pairs (a_id < b_id) with approximate cosine >= minCos.
   * Scale shape: explode hash tables -> shuffle on bucket -> join within
   * bucket only. No O(N^2) pair space.
   */
  def similarPairs(df: DataFrame, idCol: String, embCol: String, minCos: Double): DataFrame = {
    // materialize the normalized vectors once: the self-join consumes the
    // prepared table TWICE (probe + build), and without the checkpoint
    // each side re-normalizes and re-hashes the full corpus — at scale
    // the prepared+hashed table is a persisted index artifact, and
    // localCheckpoint is its single-job analog (same reasoning as the
    // MinHash signature table in DedupQueries)
    val prepared = prepare(df, idCol, embCol).localCheckpoint()
    val model = fit(prepared)
    model.approxSimilarityJoin(prepared, prepared, distFor(minCos), "dist")
      .select(col("datasetA.id").as("a_id"), col("datasetB.id").as("b_id"),
        distToCos(col("dist")).as("cos"))
      .filter(col("a_id") < col("b_id"))
      .filter(col("cos") >= minCos)
  }

  /**
   * Batch approximate kNN join: top-k corpus neighbors per query row by
   * cosine. Candidates come from the bucketed join at `minCandidateCos`;
   * per-query top-k via the bounded partial-aggregating TopKByScore.
   */
  def knnJoin(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String,
      k: Int, minCandidateCos: Double = 0.0): DataFrame = {
    val prepCorpus = prepare(corpus, idCol, embCol)
    val prepQueries = prepare(queries, idCol, embCol)
    val model = fit(prepCorpus)
    val hits = model
      .approxSimilarityJoin(prepQueries, prepCorpus, distFor(minCandidateCos), "dist")
      .select(col("datasetA.id").as("q_id"), col("datasetB.id").as("n_id"),
        distToCos(col("dist")).as("cos"))
    hits.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore(k)(col("cos"), col("n_id")).as("hits"))
      .select(col("q_id"), posexplode(col("hits")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("cos"))
  }
}
