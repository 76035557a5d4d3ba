package graft.queries

import graft.QueryPack
import org.apache.spark.sql.functions._

/**
 * Scale-pattern operators: the shapes that keep 100 TB jobs alive under
 * skew and cardinality pressure.
 *
 *  - `events_salted_user_counts`: the two-phase salted aggregation. A
 *    single hot key floods one reducer in a naive groupBy; salting
 *    splits each key into `Salt` sub-groups aggregated in parallel, then
 *    a cheap second aggregation over at most `Salt` rows per key merges
 *    them. Result is bit-identical to the naive plan (count/sum are
 *    reassociable), so the DuckDB oracle is the plain GROUP BY — the
 *    pattern is verified, not just demonstrated. The salt is
 *    deterministic (hash of event_id) so runs are reproducible.
 *  - `events_distinct_users_exact`: exact distinct counts, fully
 *    oracle-checked (one expand-free distinct aggregation);
 *  - `events_distinct_users_approx`: the HyperLogLog++ sketch variant
 *    (approx_count_distinct, the 100 TB path — fixed-size sketch state
 *    instead of a per-key distinct set). Sketch values are
 *    engine-specific so the driver check is rows-only; ApproxDistinctSpec
 *    pins relative error <= 5% (the configured rsd) against the exact
 *    query.
 */
object ScaleQueries extends QueryPack {

  private val Salt = 8

  override def queries: Map[String, Q] = Map(
    "events_salted_user_counts" -> ((s, dir) =>
      events(s, dir)
        .withColumn("salt", pmod(hash(col("event_id")), lit(Salt)))
        .groupBy(col("user_id"), col("salt"))
        .agg(count(lit(1)).as("partial_n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 3)))
            .as("partial_v"))
        .groupBy(col("user_id"))
        .agg(sum(col("partial_n")).as("n_events"),
          sum(col("partial_v")).cast("double").as("total_value"))
        .orderBy(col("user_id"))),

    "events_distinct_users_exact" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("exact_users"))
        .orderBy(col("event_type"))),

    "events_distinct_users_approx" -> ((s, dir) =>
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd = 0.05).as("approx_users"))
        .orderBy(col("event_type")))
  )

  override def oracleSql: Map[String, String] = Map(
    "events_salted_user_counts" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,3))) AS VARCHAR) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_distinct_users_exact" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    // events_distinct_users_approx: no oracle (HLL sketch values are
    // engine-specific); ApproxDistinctSpec pins the error bound.
  )
}
