package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The ONE definition of the DSIR (Xie et al. 2023) hashed-n-gram feature
 * formulas, shared by the batch weight query
 * (`QualityQueries.corpus_dsir_weights`) and the streaming admit gate
 * (`graft.streaming.CurationStreams.dsirGate`) — same rationale as
 * [[TextSignals]]: the batch side is oracle-checked, and a silently
 * drifted copy of the gram/bucket spelling would make the deployed gate
 * score differently from the audited weights.
 *
 * Deployment split (how importance filtering runs in production):
 *  - LEARNING is a bounded batch job — one corpus scan, one 256-row
 *    partial agg ([[learnLogRatios]]); the log-ratio table is the
 *    standing artifact, same lifecycle as the ANN index or the dedup
 *    reference fingerprints.
 *  - APPLICATION is stateless per-document math — [[weightFromGrams]]
 *    folds the frozen 256-entry map over the document's grams, so the
 *    streaming gate needs no shuffle, no aggregation state, and no
 *    watermark: each micro-batch is a pure map.
 */
object DsirSignals {

  /** Whitespace tokens of trimmed text (the corpus-wide tokenizer). */
  def toks(text: Column): Column = split(trim(text), "\\s+")

  /** Unigrams + space-joined bigrams — the DSIR feature set. Callers
    * must pass a MATERIALIZED toks column (HOF lambdas re-evaluate
    * nested subtrees per element). */
  def gramsFromToks(toksCol: Column): Column = {
    val bi = when(size(toksCol) >= 2,
      transform(sequence(lit(1), size(toksCol) - 1),
        i => concat_ws(" ", element_at(toksCol, i), element_at(toksCol, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(toksCol, bi)
  }

  /** Engine-portable 256-cell feature hash: first two md5 hex chars. */
  def bucketOf(gram: Column): Column =
    substring(md5(gram.cast("binary")), 1, 2)

  /**
   * Learn the bucket log-ratio table log(p_target/p_raw) with +1
   * smoothing from a bounded corpus: explode → one 256-row partial-agg
   * shuffle building BOTH LMs in a single conditional-count pass.
   * Returns (bucket, lr double) — 256 rows at any corpus size.
   */
  def learnLogRatios(corpus: DataFrame, isTarget: Column): DataFrame = {
    val grams = corpus
      .withColumn("_toks", toks(col("text")))
      .select(isTarget.as("_tgt"), explode(gramsFromToks(col("_toks"))).as("_gram"))
      .select(col("_tgt"), bucketOf(col("_gram")).as("bucket"))
    val bc = grams.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("_tgt"), 1L).otherwise(0L)).as("c_tgt"))
      .localCheckpoint()
    val tot = bc.agg(sum(col("c_raw")).as("t_raw"), sum(col("c_tgt")).as("t_tgt"))
    bc.crossJoin(broadcast(tot))
      .select(col("bucket"),
        (log((col("c_tgt") + 1).cast("double") / (col("t_tgt") + 256)) -
          log((col("c_raw") + 1).cast("double") / (col("t_raw") + 256)))
          .as("lr"))
  }

  /** Driver-side artifact for the stateless gate: 256 entries, the same
    * legitimately-driver-scale class as ANN centroid tables. */
  def logRatioMap(lrTable: DataFrame): Map[String, Double] =
    lrTable.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Per-document importance weight as a pure column: left-fold of the
    * frozen map over a MATERIALIZED grams column. Deterministic (array
    * order is the document's own gram order) and shuffle-free. */
  def weightFromGrams(gramsCol: Column, lrByBucket: Map[String, Double]): Column = {
    val m = typedlit(lrByBucket)
    aggregate(gramsCol, lit(0.0),
      (acc, g) => acc + coalesce(element_at(m, bucketOf(g)), lit(0.0)))
  }
}
