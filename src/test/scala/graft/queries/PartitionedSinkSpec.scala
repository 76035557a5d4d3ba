package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Partitioned-sink discipline: the 100 TB layout for a curated corpus is
 * parquet partitioned by a low-cardinality routing column (lang, source,
 * modality) so downstream readers prune whole directories. This spec
 * proves the full loop: partitionBy write -> partition-pruned read —
 * i.e. a lang-filtered scan TOUCHES only that lang's files, verified in
 * the physical plan, not assumed.
 */
class PartitionedSinkSpec extends AnyFunSuite with SparkTestBase {

  private lazy val outDir: String = {
    val dir = scratchDir("graft-part-sink")
    spark.read.parquet(s"$sf0_001/documents.parquet")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    dir
  }

  test("partitionBy write produces one directory per lang") {
    val dirs = new java.io.File(outDir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.length >= 2 && dirs.forall(_.matches("lang=\\w+")))
  }

  test("lang filter becomes a partition filter, pruning non-matching files") {
    val q = spark.read.parquet(outDir).filter(col("lang") === "en")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    // the predicate must land in partitionFilters (directory pruning),
    // not dataFilters (row-level, reads every file)
    assert(scan.partitionFilters.exists(_.toString.contains("lang")))
    assert(!scan.dataFilters.exists(_.toString.contains("lang")))
    // and the pruned listing must select strictly fewer files than exist
    val pruned = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).map(_.files.size).sum
    val all = scan.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
    assert(pruned < all, s"pruned=$pruned all=$all")
    assert(q.count() == spark.read.parquet(s"$sf0_001/documents.parquet")
      .filter(col("lang") === "en").count())
  }
}
