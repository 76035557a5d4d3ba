package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The ONE definition of the text-curation signal formulas shared by the
 * batch pipelines (`CurationQueries`) and the streaming curation gate
 * (`graft.streaming.CurationStreams`). Centralized for the same reason
 * `QueryPack.round6` is: these formulas are oracle-checked, and a
 * silently drifted copy turns a formula edit into a correctness failure
 * in whichever path kept the stale version.
 */
object TextSignals {

  val stopWords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** Raw (unrounded) composite quality score over a whitespace token
    * array: length, stopword density, token shape — weights 0.5/0.3/0.2.
    * Callers round (the batch pipelines round6 at the row level so the
    * decimal-summed average stays order-independent). */
  def qualityFromToks(toks: Column): Column = {
    val nTokens = size(toks).cast("double")
    val stopRatio = size(filter(toks, t => t.isInCollection(stopWords)))
      .cast("double") / nTokens
    val meanLen = length(array_join(toks, "")).cast("double") / nTokens
    least(nTokens / 200.0, lit(1.0)) * 0.5 +
      least(stopRatio * 5.0, lit(1.0)) * 0.3 +
      least(meanLen / 8.0, lit(1.0)) * 0.2
  }

  /** Canonical exact-dedup content fingerprint: md5 of the lowercased,
    * whitespace-collapsed text — case and spacing variants of the same
    * content are duplicates (the `dedup_exact` / `pipeline_*` rule). */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))
}
