package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The compaction EXECUTOR's contract, independently of the driver's
 * oracle hash: after the rewrite, every planned bin is exactly one real
 * file on disk (one_file_out is counted off the filesystem, not assumed),
 * the whole fragmented input is covered by the plan, and the compacted
 * table reads back content-identical to the original (content_ok XORs
 * full-row hashes per partition).
 */
class CompactionApplySpec extends AnyFunSuite with SparkTestBase {

  test("every planned bin lands as exactly one file with identical content") {
    def scratchDirs = {
      val tmp = new java.io.File(sys.props("java.io.tmpdir"))
      Option(tmp.list()).toSeq.flatten.filter(_.startsWith("graft_compact")).toSet
    }
    val before = scratchDirs
    val rows = SparkEntry.queries("layout_compaction_apply")(spark, sf0_001)
      .collect()
    // the scratch warehouse is deleted once the verdict rows are pinned —
    // repeated Verify/Bench runs must not litter java.io.tmpdir
    assert(scratchDirs == before,
      s"leaked compaction scratch dirs: ${scratchDirs -- before}")
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("one_file_out")),
      rows.filterNot(_.getAs[Boolean]("one_file_out")).mkString("\n"))
    assert(rows.forall(_.getAs[Boolean]("content_ok")))
    // the plan covers every input file: sum of per-bin file counts ==
    // distinct (year, orderkey % 8) groups in the source
    val expectedFiles = spark.read.parquet(s"$sf0_001/orders.parquet")
      .select(year(col("o_orderdate")).as("p"), (col("o_orderkey") % 8).as("f"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_files")).sum == expectedFiles)
    // and every input row lands in exactly one bin
    val totalRows = spark.read.parquet(s"$sf0_001/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == totalRows)
  }
}
