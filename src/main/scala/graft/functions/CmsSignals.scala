package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The ONE count-min-sketch spelling (Cormode & Muthukrishnan 2005),
 * shared by the oracle-surface query (`events_heavy_hitters_cms`,
 * ScaleQueries) and the STREAMING form: `sketch` is a plain groupBy over
 * a (depth × width)-bounded key space, so on a streaming frame it is an
 * update-mode aggregation whose state is EXACTLY d×w counters no matter
 * how long the stream runs — the bounded-state sketch shape a 100 TB
 * ingest pipeline keeps per metric (an exact per-id count would grow
 * state with the id cardinality). Batch↔stream sketch identity and the
 * overestimate bound are pinned by `EventStreamsSpec`.
 *
 * Determinism: xxhash64 row spellings, integer counters — the sketch
 * table is bit-identical for the same input set however it is batched.
 */
object CmsSignals {

  /** Row i of the sketch: bucket = xxhash64(id, i) mod w. */
  def bucket(id: Column, depth: Column, w: Int): Column =
    pmod(xxhash64(id, depth), lit(w))

  /** The d×w counter table for `ids` (one row per non-empty cell).
    * Works identically on batch and streaming frames (streaming: use
    * update/complete output mode; state is bounded by d×w). */
  def sketch(ids: DataFrame, idCol: String, d: Int = 4, w: Int = 512): DataFrame = {
    val ds = array((0 until d).map(lit): _*)
    ids.select(col(idCol).as("_id"))
      .withColumn("d", explode(ds))
      .withColumn("bucket", bucket(col("_id"), col("d"), w))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Merge two sketch tables built with the same (d, w) geometry: CMS
    * counters are additive, so merge(sketch(A), sketch(B)) is EXACTLY
    * sketch(A ⊎ B) — cell-for-cell, not approximately. This is the
    * property a sharded 100 TB ingest pipeline rests on: each shard
    * sketches its own slice, the tiny d×w tables combine with one
    * (d,w)-keyed partial agg, and no shard is ever rescanned. Exact
    * equality pinned by CmsSketchSpec and driver-visible via
    * `events_cms_shard_merge`. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("d"), col("bucket"))
      .agg(sum(col("c")).as("c"))

  /** Point estimates from a materialized sketch table: min over the d
    * rows each id hashes to. Never undercounts; overcount bounded by
    * collisions (expected ≤ N/w per row, min over d rows). */
  def estimate(sk: DataFrame, ids: DataFrame, idCol: String,
      d: Int = 4, w: Int = 512): DataFrame = {
    val ds = array((0 until d).map(lit): _*)
    ids.select(col(idCol).as("_id")).distinct()
      .withColumn("d", explode(ds))
      .withColumn("bucket", bucket(col("_id"), col("d"), w))
      .join(sk, Seq("d", "bucket"), "left")
      .groupBy(col("_id"))
      .agg(min(coalesce(col("c"), lit(0L))).as("est_n"))
      .select(col("_id").as(idCol), col("est_n"))
  }
}
