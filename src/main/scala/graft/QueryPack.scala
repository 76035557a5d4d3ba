package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * A named family of driver-checkable queries. Each entry in [[queries]]
 * builds a DataFrame from the parquet tables under `dir` (one of the
 * `/root/testdata/sf*` dirs); each entry in [[oracleSql]] is equivalent
 * ANSI SQL the driver runs in DuckDB over the same tables. Keys of
 * `oracleSql` must be a subset of `queries` keys; queries without oracle
 * SQL get a weaker rows-only check.
 *
 * Determinism contract (see SURVEY.md §7.3): every query that emits
 * floating-point derived values rounds them identically on both sides, uses
 * exact decimal arithmetic for money aggregates, orders output by a unique
 * key, and breaks score ties by id.
 */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracleSql: Map[String, String]

  /** Load one test table from the scale-factor directory. */
  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /**
   * Schema-adaptive loader for the `events` table — the fixture's physical
   * `ts` encoding has changed across driver versions, so branch on what the
   * footer actually says instead of assuming one layout:
   *   - TIMESTAMP(NANOS): Spark refuses to map nanos to its microsecond
   *     TimestampType, so read the raw long (legacy.parquet.nanosAsLong)
   *     and truncate with integer division (`div`, not `/` — a double
   *     round-trip of ~1.7e18 nanos loses precision past 2^53).
   *   - timestamp[us] without tz: Spark infers TIMESTAMP_NTZ; cast to the
   *     session-TZ TimestampType (session TZ is pinned UTC everywhere, so
   *     the wall-clock IS the instant, matching DuckDB's naive TIMESTAMP).
   *   - timestamp[us] with tz: already TimestampType; pass through.
   * Either way both engines see the same instants.
   */
  protected def events(s: SparkSession, dir: String): DataFrame =
    QueryPack.loadEvents(s, s"$dir/events.parquet")

  /**
   * Spread a CPU-heavy derivation (regex split, per-token hashing) across
   * all cores — byte-small parquet starves the cluster without it.
   *
   * r17 rewrite: the old partition-COUNT guard (`getNumPartitions >=
   * slots` => no-op) was satisfied vacuously — Spark splits even a
   * byte-small single-row-group parquet into `minPartitionNum` splits,
   * of which all but one are EMPTY, so the guard read 32 planned
   * partitions while every row sat in one task. And the keyed
   * repartition it fell back to had no explicit count, so AQE's
   * coalescing (1 MB `minPartitionSize` floor) folded the ~100 KB
   * exchange straight back to one partition. Both halves measured on
   * the multimodal family (the identical shape): 25.5 s -> 15.2 s from
   * an unconditional keyed repartition with a PINNED count (AQE
   * respects user-specified counts). What crosses this shuffle is the
   * pre-derivation row (KBs), while the derivation it parallelizes is
   * the query's entire budget; at real scale the input arrives
   * well-partitioned AND the derivation feeds a keyed shuffle anyway,
   * so the spread stays proportionally negligible.
   */
  protected def spread(df: DataFrame, key: String): DataFrame =
    graft.util.Spread.byKey(df, key)

  /**
   * Engine-portable 6-dp rounding: floor(x*1e6 + 0.5)/1e6 in pure IEEE
   * double ops, bit-identical on any engine that evaluates the same
   * formula (DuckDB oracle uses the SQL spelling [[QueryPack.Round6Sql]]).
   * Spark's round() rounds the double's shortest decimal repr (BigDecimal
   * HALF_UP) while DuckDB rounds the binary value — they disagree near
   * .xxxxx5 boundaries, so round() is banned in oracle-checked queries.
   * Only valid for |x| < 2^53/1e6 (fine for similarity scores and ratios).
   */
  protected def round6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    QueryPack.round6(c)
}

object QueryPack {
  /** The ONE Column spelling of the engine-portable 6-dp rounding —
    * every oracle-parity producer (QueryPacks and streaming operators
    * alike) must use this definition, because the oracle hash compare
    * sees any formula drift as a correctness failure. */
  def round6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{floor, lit}
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
  }

  /** SQL spelling of [[QueryPack.round6]] for DuckDB oracle queries. */
  def round6Sql(expr: String): String =
    s"floor(($expr) * 1000000.0 + 0.5) / 1000000.0"

  /** The ONE schema-adaptive events loader (see [[QueryPack.events]] for
    * the encoding matrix). Shared by every query pack and the streaming
    * parity specs so a fixture-layout change is a one-line fix. */
  def loadEvents(s: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Must be set before the read: a TIMESTAMP(NANOS) footer otherwise
    // fails schema resolution outright. A no-op for micro-encoded files.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    adaptEventsTs(s.read.parquet(path))
  }

  /** Normalize an already-loaded events frame's `ts` to TimestampType
    * micros, whatever the fixture encoding was. Works on streaming frames
    * too (the branch is on the resolved schema, not the source). */
  def adaptEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other")
    }
  }

  /** ORACLE RULE for exact-decimal sums surfaced as DOUBLE: DuckDB's
    * direct DECIMAL->DOUBLE cast is NOT correctly rounded (observed 1-ulp
    * drift vs Spark's BigDecimal conversion on 2 of 6 TPC-H Q1 groups at
    * sf0.1), but its VARCHAR->DOUBLE parse IS. Oracle SQL must therefore
    * spell the conversion `CAST(CAST(sum(...) AS VARCHAR) AS DOUBLE)` —
    * every money-sum oracle in this repo does. */
}
