package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The SHARED MinHash/shingle formulas behind the near-dup family —
 * one definition so the batch queries (`dedup_near_minhash`,
 * `dedup_incremental_near`, `dedup_components`, …), the streaming
 * screen ([[graft.streaming.CurationStreams.nearDupRejects]]), and the
 * DuckDB oracles (which re-spell these in SQL) can never drift apart.
 *
 * Formula contract (mirrored verbatim in the oracle SQL):
 *  - shingles: distinct md5s of 3-token windows; docs under 3 tokens
 *    yield an EMPTY set (`sequence(1, size-2)` descends below 3 — the
 *    guard matches the oracle's `range(1, len-1)`).
 *  - signature j: min over shingles of md5 hex chars [4j, 4j+4) — the 8
 *    16-bit chunks of the one md5 already computed per shingle are 8
 *    independent uniform hashes (a seeded-md5-per-signature variant
 *    costs 8x the hashing and benched 50% slower).
 *  - bands: 4 bands x 2 signatures concatenated; an empty shingle set
 *    makes every band key NULL, which equi-joins drop — shingle-less
 *    docs pair with nothing by construction.
 *  - Jaccard: exact over shingle sets, two empty sets score 0.0.
 *
 * Perf invariant: pass REAL columns into these helpers (materialize
 * `split`/token arrays with `withColumn` first) — HOF lambdas are
 * interpreted and re-evaluate nested subtrees per element, so an
 * inlined `split()` re-splits the text once per shingle (measured 2-3x
 * slowdown on the bench corpus).
 */
object MinHashSignals {

  def toks(c: Column): Column = split(trim(c), "\\s+")

  def shinglesFromToks(tk: Column): Column =
    when(size(tk) >= 3,
      array_distinct(transform(
        sequence(lit(1), size(tk) - 2),
        i => md5(concat_ws(" ", slice(tk, i, lit(3))).cast("binary")))))
      .otherwise(array().cast("array<string>"))

  def minhash(shingles: Column, j: Int): Column =
    array_min(transform(shingles, s => substring(s, 4 * j + 1, 4)))

  /** The 4 LSH band keys of a shingle-set column, in band order. */
  def bandKeys(shingles: Column): Column =
    array((0 until 4).map(b =>
      concat(minhash(shingles, 2 * b), minhash(shingles, 2 * b + 1))): _*)

  def jaccard(a: Column, b: Column): Column = {
    val denom = size(array_distinct(concat(a, b)))
    when(denom === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / denom)
  }

  /**
   * The standing-index artifacts an incremental near-dup screen probes:
   * `(bands, shingles)` where bands = (band_id, band_key, r_id) and
   * shingles = (r_id, sh_r). At 100 TB both are persisted tables built
   * by the standing-index job (bucket them on band_key / r_id and the
   * probe joins are shuffle-free on the reference side); here they come
   * back as plain frames the caller checkpoints or writes out.
   */
  def referenceIndex(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val sh = docs
      .withColumn("_toks", toks(col(textCol)))
      .select(col(idCol).as("r_id"), shinglesFromToks(col("_toks")).as("sh_r"))
    val bands = sh.select(col("r_id"),
      posexplode(bandKeys(col("sh_r"))).as(Seq("band_id", "band_key")))
      .select(col("band_id"), col("band_key"), col("r_id"))
    (bands, sh)
  }
}
