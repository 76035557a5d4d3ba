package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Exact global rank / running sum over a total order WITHOUT a
 * single-task global window — the documented 100 TB swap for the two
 * ordered-rollup cuts (`events_pareto_concentration`,
 * `q_customer_deciles`, VERDICT r9 "What's wrong" #2).
 *
 * Below `exactWindowMaxRows` the plain `Window.orderBy` runs (one task,
 * fine for a small rollup, no extra jobs). Above it, the classic
 * distributed spelling: range-partition on the sort key (Spark samples
 * the boundaries — the same construction as `layout_range_boundaries`),
 * sort within partitions, then ONE tiny per-partition (count, sum) pass
 * whose prefix sums become per-partition offsets, and a second pass
 * emits `rank = offset + local row number` and `cum = offset + local
 * running sum`. Both passes are exact whatever boundaries the sampler
 * picked, so the result is bit-identical to the window spelling — the
 * driver's oracle hash proves it at the SFs where each branch runs
 * (window at sf0.001/0.01, distributed at sf0.1 where the rollups
 * exceed the threshold).
 *
 * Driver state is one (count, sum) pair per partition — never row data.
 * RDD zipWithIndex-style imperative logic is exactly the per-partition
 * case DataFrame ops can't express, hence the mapPartitionsWithIndex.
 */
object GlobalOrder {

  /** Appends `rk` (1-based global row number, LongType) and — when
    * `valueCol` (a LongType column) is given — `cum` (inclusive running
    * sum) in the total order of `sortCols`. `sortCols` must be a UNIQUE
    * ordering (tie-broken), or ranks are nondeterministic. The input
    * should be a rollup that is either cheap or already checkpointed:
    * the distributed branch scans it twice plus the row count. */
  def rankCumsum(df: DataFrame, sortCols: Seq[Column],
      valueCol: Option[String] = None,
      exactWindowMaxRows: Long = 10000L): DataFrame = {
    val n = df.count()
    if (n <= exactWindowMaxRows) {
      val w = Window.orderBy(sortCols: _*)
      val ranked = df.withColumn("rk", row_number().over(w).cast(LongType))
      valueCol.fold(ranked) { v =>
        ranked.withColumn("cum", sum(col(v)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      }
    } else {
      val spark = df.sparkSession
      val parts = spark.sessionState.conf.numShufflePartitions
      val sorted = df.repartitionByRange(parts, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
      val schema = sorted.schema
      val vIdx = valueCol.map(schema.fieldIndex)
      // pass 1: one (rows, sum) pair per partition — driver-tiny
      val stats = sorted.rdd.mapPartitionsWithIndex { case (pid, it) =>
        var cnt = 0L
        var s = 0L
        it.foreach { r => cnt += 1L; vIdx.foreach(i => s += r.getLong(i)) }
        Iterator.single((pid, cnt, s))
      }.collect().sortBy(_._1)
      // Exactness depends on pass 1 and pass 2 observing IDENTICAL
      // partition contents (shared lazy `sorted.rdd` + shuffle-output
      // reuse). That is an assumption, so make its failure LOUD: the
      // pass-1 totals must reproduce the count job's n, otherwise a
      // nondeterministic input or a recomputed shuffle has shifted rows
      // between passes and every offset below would be silently wrong.
      val seen = stats.map(_._2).sum
      require(seen == n,
        s"GlobalOrder: pass-1 partition counts ($seen) != count() ($n); " +
          "input is nondeterministic or shuffle output was recomputed — " +
          "checkpoint the input before calling rankCumsum")
      require(stats.map(_._1).toSeq == (0 until stats.length),
        "GlobalOrder: missing/duplicate partition ids in pass-1 stats")
      val rankOff = stats.scanLeft(0L)((acc, st) => acc + st._2).init
      val sumOff = stats.scanLeft(0L)((acc, st) => acc + st._3).init
      val rankOffB = spark.sparkContext.broadcast(rankOff)
      val sumOffB = spark.sparkContext.broadcast(sumOff)
      // pass 2: local running rank/sum + partition offset = exact global
      val out = sorted.rdd.mapPartitionsWithIndex { case (pid, it) =>
        var rk = rankOffB.value(pid)
        var cum = sumOffB.value(pid)
        it.map { r =>
          rk += 1L
          vIdx.foreach(i => cum += r.getLong(i))
          Row.fromSeq(r.toSeq ++ (rk +: vIdx.map(_ => cum).toSeq))
        }
      }
      val outSchema = vIdx.fold(schema.add("rk", LongType))(_ =>
        schema.add("rk", LongType).add("cum", LongType))
      spark.createDataFrame(out, outSchema)
    }
  }

  /** SQL ntile(buckets) recomputed from an exact global rank `rk` and
    * the 1-row total `nRows` — the first `n mod B` buckets get
    * `n div B + 1` rows, the rest `n div B` — so the bucketing matches
    * the window ntile bit-for-bit without the single-task window. */
  def ntileFromRank(rk: Column, nRows: Column, buckets: Int): Column = {
    // Pure-long arithmetic throughout: Column `/` is a double Divide
    // whose floor is only exact below 2^53 — `div` (IntegralDivide)
    // keeps the any-scale bit-identical claim honest. All numerators
    // here are >= 0 and divisors > 0, so floor == integral division.
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    val qs = idiv(nRows, lit(buckets.toLong)) // n div B
    val r = nRows % buckets
    val bigSpan = r * (qs + 1L)
    when(rk <= bigSpan, idiv(rk - 1L, qs + 1L) + 1L)
      .otherwise(r + idiv(rk - bigSpan - 1L, greatest(qs, lit(1L))) + 1L)
      .cast("int")
  }
}
