package graft.streaming

import graft.functions.TextSignals
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Streaming form of the pretraining-data curation gate
 * (`pipeline_pretrain_prep`'s first two stages as a CONTINUOUS ingest):
 * quality-score filter → content-fingerprint exact dedup, with dedup
 * state bounded by the event-time watermark — the shape a crawl
 * pipeline runs: documents arrive forever, a duplicate arriving within
 * the watermark horizon is dropped, state never grows beyond the
 * horizon's distinct-fingerprint set. Both formulas are the SHARED
 * [[graft.functions.TextSignals]] definitions, so this gate admits and
 * dedups exactly what the batch pipelines do (case/whitespace variants
 * of the same content are duplicates).
 *
 * Unified API: the SAME call curates a bounded frame — there the
 * canonical survivor is the earliest (ts, doc_id) row per fingerprint
 * (a window keep-first; a bare `dropDuplicates` keeps an ARBITRARY row,
 * which would make batch output partitioning-dependent). In streaming,
 * first ARRIVAL wins, which for an in-order source is the same row;
 * parity across micro-batch splits is pinned by `CurationStreamsSpec`.
 *
 * Scale shape: scoring is map-only codegen'd column math; the dedup is
 * one hash shuffle on the 128-bit fingerprint (exactly `dedup_exact`'s
 * plan) with watermark-evicted state in the streaming case. Nothing
 * else is stateful.
 */
object CurationStreams {

  /**
   * @param docs      streaming (or batch) frame with `doc_id`, `text`,
   *                  and an event-time `ts`
   * @param minQuality documents scoring below are dropped before dedup
   * @param watermark event-time horizon bounding the dedup state
   * @return curated (doc_id, ts, quality, content_fp, text) — first
   *         arrival (streaming) / earliest (ts, doc_id) row (batch) of
   *         each fingerprint wins; duplicates within the watermark
   *         horizon are dropped
   */
  def curatedDocs(docs: DataFrame, minQuality: Double = 0.5,
      watermark: String = "10 minutes"): DataFrame = {
    val scored = docs
      .withColumn("quality",
        TextSignals.qualityFromToks(split(trim(col("text")), "\\s+")))
      .filter(col("quality") >= minQuality)
      .withColumn("content_fp", TextSignals.contentFingerprint(col("text")))
      .select("doc_id", "ts", "quality", "content_fp", "text")
    if (scored.isStreaming)
      scored.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("content_fp")
    else {
      val w = Window.partitionBy("content_fp").orderBy(col("ts"), col("doc_id"))
      scored.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }
  }
}
