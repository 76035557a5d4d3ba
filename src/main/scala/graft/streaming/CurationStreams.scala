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

  /**
   * Ingest-time EXACT dedup against a STANDING corpus —
   * `dedup_incremental` as a continuous gate: a document is admitted
   * only if its canonical content fingerprint is unseen in both the
   * static reference fingerprint table and the stream's own watermark
   * horizon.
   *
   * Scale shape: `referenceFps` is a corpus-sized static table keyed on
   * `content_fp` — per micro-batch Spark plans a stream-static
   * left_anti hash join (the SMALL batch shuffles against it; the
   * reference side is never broadcast and never rescanned pairwise),
   * then the within-stream dedup holds watermark-bounded state only.
   * Refreshing `referenceFps` across restarts is the standing-index
   * job's responsibility — the same snapshot contract as the ANN index.
   *
   * Unified API: on a bounded frame the same call anti-joins and keeps
   * the earliest (ts, doc_id) row per fingerprint, so streamed==batch
   * parity is testable (`CurationStreamsSpec`).
   *
   * @param referenceFps static frame with a `content_fp` column (build
   *                     with [[graft.functions.TextSignals.contentFingerprint]]
   *                     over the standing corpus)
   */
  def incrementalDedup(docs: DataFrame, referenceFps: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val fp = docs
      .withColumn("content_fp", TextSignals.contentFingerprint(col("text")))
      .select("doc_id", "ts", "content_fp", "text")
    val fresh = fp.join(referenceFps.select("content_fp"),
      Seq("content_fp"), "left_anti")
    if (docs.isStreaming)
      fresh.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("content_fp")
    else {
      val w = Window.partitionBy("content_fp").orderBy(col("ts"), col("doc_id"))
      fresh.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }
  }

  /**
   * NEAR-duplicate detection against the standing corpus —
   * `dedup_incremental_near` as a continuous screen. Emits one row
   * (doc_id, ts) per stream document whose MinHash band matches a
   * reference band AND whose exact shingle Jaccard verifies >=
   * `threshold` — the REJECT log a downstream compactor applies. The
   * admit stream is [[incrementalDedup]]'s output minus these ids;
   * that composition is two sink writes because a stream-stream anti
   * join is not expressible — the same side-output split a
   * log-structured ingest uses.
   *
   * Scale shape: both joins are stream-static equi-joins against the
   * standing-index artifacts ([[graft.functions.MinHashSignals.referenceIndex]]):
   * the band probe touches only band-key matches, the verify join
   * fetches shingle sets for CANDIDATES only — a micro-batch never
   * scans reference text. Detection state (one id per emitted doc) is
   * watermark-bounded.
   */
  /**
   * DSIR importance-weight admit gate — the deployed form of
   * `corpus_dsir_weights`: score each arriving document against a
   * FROZEN bucket log-ratio table (the standing-LM artifact learned by
   * [[graft.functions.DsirSignals.learnLogRatios]]) and admit documents
   * scoring at or above `minWeight`.
   *
   * Scale shape: the gate is STATELESS — the 256-entry map folds over
   * each document's grams as a pure column expression, so a micro-batch
   * needs no shuffle, no aggregation state, and no watermark; batch and
   * streaming frames take the identical plan (parity and agreement with
   * the oracle-checked batch weights are pinned by
   * `CurationStreamsSpec`). Refreshing the LM is the standing-index
   * job's responsibility, same snapshot contract as the ANN index.
   *
   * @param lrByBucket frozen bucket→log(p_target/p_raw) map (256
   *                   entries; build with
   *                   [[graft.functions.DsirSignals.logRatioMap]])
   * @param minWeight  admit threshold on the per-document weight
   */
  def dsirGate(docs: DataFrame, lrByBucket: Map[String, Double],
      minWeight: Double = 0.0): DataFrame = {
    import graft.functions.DsirSignals
    docs
      .withColumn("_toks", DsirSignals.toks(col("text")))
      .withColumn("_grams", DsirSignals.gramsFromToks(col("_toks")))
      .withColumn("dsir_weight",
        DsirSignals.weightFromGrams(col("_grams"), lrByBucket))
      .filter(col("dsir_weight") >= minWeight)
      .drop("_toks", "_grams")
  }

  /**
   * Token-budget admission with the LEARNED tokenizer — the deploy half
   * of `corpus_bpe_learn`: the batch job learns the merge rules; this
   * gate applies them FROZEN to every arriving document as a pure column
   * expression. Each word is pipe-encoded (`|c| |a| |t|`) and the rules
   * fold over it in learned order as literal replaces — the identical
   * merge mechanics as the batch learner — then the document's token
   * count is the per-word symbol counts summed. No shuffle, no state, no
   * vocab join: the batch encoder (`corpus_bpe_encode`) amortizes
   * through the word-TYPE table, but a stream has no type table, so
   * per-occurrence segmentation is the right shape — and the plan is
   * identical for batch and streaming frames (parity + agreement with
   * the oracle-checked batch encode pinned by `CurationStreamsSpec`).
   * Refreshing the rules is the standing tokenizer job's responsibility,
   * same snapshot contract as the DSIR LM and the ANN index.
   *
   * @param mergeRules merge pairs ("left right") in learned order, e.g.
   *                   collected from the `corpus_bpe_learn` output
   * @param maxTokens  admit ceiling on the document's BPE token count
   */
  def bpeTokenGate(docs: DataFrame, mergeRules: Seq[String],
      maxTokens: Long): DataFrame = {
    val mergedRep: org.apache.spark.sql.Column => org.apache.spark.sql.Column = w => {
      val rep0 = concat(lit("|"),
        array_join(transform(sequence(lit(1), length(w)),
          i => w.substr(i, lit(1))), "| |"), lit("|"))
      mergeRules.foldLeft(rep0) { (rep, rule) =>
        val Array(l, r) = rule.split(" ", 2)
        replace(rep, lit(s"|$l| |$r|"), lit(s"|$l$r|"))
      }
    }
    docs
      .withColumn("_w", split(trim(col("text")), "\\s+"))
      .withColumn("n_tokens", aggregate(
        transform(col("_w"), w => size(split(mergedRep(w), " ")).cast("long")),
        lit(0L), (acc, x) => acc + x))
      .filter(col("n_tokens") <= maxTokens)
      .drop("_w")
  }

  def nearDupRejects(docs: DataFrame, refBands: DataFrame,
      refShingles: DataFrame, threshold: Double = 0.5,
      watermark: String = "10 minutes"): DataFrame = {
    import graft.functions.MinHashSignals
    val sh = docs
      .withColumn("_toks", MinHashSignals.toks(col("text")))
      .select(col("doc_id"), col("ts"),
        MinHashSignals.shinglesFromToks(col("_toks")).as("shingles"))
    val melted = sh.select(col("doc_id"), col("ts"), col("shingles"),
      posexplode(MinHashSignals.bandKeys(col("shingles")))
        .as(Seq("band_id", "band_key")))
    val verified = melted
      .join(refBands, Seq("band_id", "band_key"))
      .join(refShingles, Seq("r_id"))
      .filter(MinHashSignals.jaccard(col("shingles"), col("sh_r")) >= threshold)
      .select("doc_id", "ts")
    if (docs.isStreaming)
      verified.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("doc_id")
    else verified.distinct()
  }
}
