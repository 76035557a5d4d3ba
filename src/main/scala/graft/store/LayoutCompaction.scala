package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The ONE integer bin-pack skeleton behind both compaction surfaces —
 * the oracle-proved `layout_compaction_apply` query
 * ([[graft.queries.ScaleQueries]]) and the store facade
 * [[MerkonStore.compactSaved]]: files ordered within a partition, bin =
 * exclusive running size `div` target, all in pure long arithmetic so
 * an external oracle can re-derive the assignment bit-for-bit.
 *
 * Cumulative `div` (not first-fit-decreasing) is deliberate: it is
 * oracle-able, respects a stable file order, and every bin except the
 * last per partition closes at >= target — the Delta/Iceberg OPTIMIZE
 * policy. The manifest is file-count-sized (one row per data file), so
 * the window is cheap at any data scale; partition columns bound it
 * when the layout has them.
 */
object LayoutCompaction {

  /** Append `bin` to a file manifest. `target` is a 1-row frame with a
    * long `target` column (broadcast — it may be derived from the
    * manifest itself, as layout_compaction_apply's equal-thirds policy
    * is). Empty `partCols` means one global packing order; the manifest
    * is then a single window partition, fine for per-file rows. */
  def assignBins(manifest: DataFrame, partCols: Seq[String],
      orderCols: Seq[String], sizeCol: String, target: DataFrame): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    manifest
      .withColumn("cum_excl", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .crossJoin(broadcast(target))
      .withColumn("bin", expr("cum_excl div target"))
      .drop("cum_excl", "target")
  }
}
