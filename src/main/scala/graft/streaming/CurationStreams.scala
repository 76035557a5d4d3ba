package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming form of the pretraining-data curation gate
 * (`pipeline_pretrain_prep`'s first two stages as a CONTINUOUS ingest):
 * quality-score filter → content-fingerprint exact dedup, with dedup
 * state bounded by the event-time watermark — the shape a crawl
 * pipeline runs: documents arrive forever, a duplicate arriving within
 * the watermark horizon is dropped, state never grows beyond the
 * horizon's distinct-fingerprint set.
 *
 * Unified API: the SAME call curates a bounded frame (global
 * `dropDuplicates` — no watermark state needed when the data ends);
 * parity across micro-batch splits is pinned by `CurationStreamsSpec`.
 *
 * Scale shape: scoring is map-only codegen'd column math; the dedup is
 * one hash shuffle on the 128-bit fingerprint (exactly `dedup_exact`'s
 * plan) with watermark-evicted state in the streaming case. Nothing
 * else is stateful.
 */
object CurationStreams {

  /** Map-only quality score (length, stopword density, token shape) —
    * the same signal family as `text_quality_score`, self-contained so
    * the streaming operator carries no QueryPack dependency. */
  private val stops = Seq("the", "a", "and", "of", "to", "in")

  private def quality: org.apache.spark.sql.Column = {
    val toks = split(trim(col("text")), "\\s+")
    val nTokens = size(toks).cast("double")
    val stopRatio = size(filter(toks, t => t.isInCollection(stops)))
      .cast("double") / nTokens
    val meanLen = length(array_join(toks, "")).cast("double") / nTokens
    least(nTokens / 200.0, lit(1.0)) * 0.5 +
      least(stopRatio * 5.0, lit(1.0)) * 0.3 +
      least(meanLen / 8.0, lit(1.0)) * 0.2
  }

  /**
   * @param docs      streaming (or batch) frame with `doc_id`, `text`,
   *                  and an event-time `ts`
   * @param minQuality documents scoring below are dropped before dedup
   * @param watermark event-time horizon bounding the dedup state
   * @return curated (doc_id, ts, quality, content_fp, text) — first
   *         arrival of each fingerprint wins, duplicates within the
   *         watermark horizon are dropped
   */
  def curatedDocs(docs: DataFrame, minQuality: Double = 0.5,
      watermark: String = "10 minutes"): DataFrame = {
    val scored = docs
      .withColumn("quality", quality)
      .filter(col("quality") >= minQuality)
      .withColumn("content_fp", md5(trim(col("text")).cast("binary")))
      .select("doc_id", "ts", "quality", "content_fp", "text")
    if (scored.isStreaming)
      scored.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("content_fp")
    else scored.dropDuplicates("content_fp")
  }
}
