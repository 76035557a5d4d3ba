package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The composite (IVF-PQ) artifact's ingest lifecycle, on a STRING-keyed
 * corpus — the second family must survive growth the way the IVF family
 * does (GeometryGrowthSpec), or the codes-table path the family-picking
 * rewrite serves at scale would degenerate into a rebuild per ingest
 * batch. Pure growth with unchanged params must ride `IndexCache`'s
 * manifest-subset append: BOTH quantizers frozen (centroid table and
 * per-subspace codebooks byte-identical — each would differ under a
 * re-fit over the grown corpus), only the new files encoded, and the
 * surrogate idMap following the append so every delta id stays
 * restorable. End-to-end, the family-served flagship must surface a
 * delta-row id through the surrogate restore join.
 */
class IvfPqGrowthSpec extends AnyFunSuite with SparkTestBase {

  private val dim = 16

  /** Deterministic hash-derived embeddings for STRING ids doc-<n> —
    * reproducible batches, no id collisions (same construction as
    * GeometryGrowthSpec, keyed like the reference's store). */
  private def batch(from: Long, until: Long) =
    spark.range(from, until)
      .select(
        concat(lit("doc-"), lpad(col("id").cast("string"), 6, "0"))
          .as("doc_id"),
        array((0 until dim).map(d =>
          ((pmod(xxhash64(col("id") * (d + 1) + d), lit(1000)) / 500.0) - 1.0)
            .cast("float")): _*).as("embedding"))

  test("within-band growth appends the composite (both quantizers frozen); idMap follows; served plan sees delta rows") {
    val dir = scratchDir("graft-pqgrowth-src")
    val root = scratchDir("graft-pqgrowth-idx")
    val src = s"$dir/docs.parquet"
    val q = new IvfPqIndex(nCentroids = 32, nProbe = 8, m = 8, kCentroids = 16)
    def tableOf(path: String, name: String) =
      spark.read.parquet(s"$path/$name").collect().map(_.toString).sorted.toSeq

    batch(0, 3000).repartition(4).write.mode("overwrite").parquet(src)
    val path1 = IvfPqIndex.openOrBuildPathAnyId(spark, q, src,
      "doc_id", "embedding", root)
    val centroids1 = tableOf(path1, "centroids")
    val codebooks1 = tableOf(path1, "codebooks")
    assert(spark.read.parquet(s"$path1/idMap").count() == 3000)

    // grow: 3000 -> 4500 rows, same params -> the manifest-subset append
    batch(3000, 4500).repartition(4).write.mode("append").parquet(src)
    val path2 = IvfPqIndex.openOrBuildPathAnyId(spark, q, src,
      "doc_id", "embedding", root)
    assert(path2 != path1)
    assert(tableOf(path2, "centroids") == centroids1,
      "coarse quantizer re-fit on within-band growth")
    assert(tableOf(path2, "codebooks") == codebooks1,
      "PQ codebooks re-fit on within-band growth")
    // r15: the grown artifact REUSES the published files (hardlink
    // append) — part names are job-unique, so name survival across the
    // grow proves every table was extended, not rewritten
    def dataFiles(path: String, table: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$path/$table"))
        .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        .map(f => f.getParentFile.getName + "/" + f.getName).toSet
    }
    Seq("codedCell", "embById", "idMap").foreach { t =>
      assert(dataFiles(path1, t).subsetOf(dataFiles(path2, t)),
        s"$t was rewritten on within-band growth (O(delta) append not taken)")
    }
    // the delta rows are coded, fetchable, and id-restorable
    assert(spark.read.parquet(s"$path2/codedCell").count() == 4500)
    assert(spark.read.parquet(s"$path2/embById").count() == 4500)
    val idMap2 = spark.read.parquet(s"$path2/idMap")
    assert(idMap2.count() == 4500)
    assert(idMap2.filter(col("id") === "doc-004000").count() == 1)

    // end-to-end: register both families over the grown corpus; the
    // codes-served flagship must surface a DELTA row's id through the
    // surrogate restore (its own embedding -> itself at the top, exact
    // score from the re-rank)
    try {
      graft.plans.AnnIndexRegistry.register(spark, new IvfIndex(32, 8), src,
        "doc_id", "embedding", nProbe = 8, ivfpq = Some(q))
      spark.conf.set(graft.plans.AnnIndexRule.PqMinBytesKey, "0")
      try {
        val corpus = spark.read.parquet(src)
        val qv = corpus.filter(col("doc_id") === "doc-004000")
          .select("embedding").head().getSeq[Float](0).toArray
        val served = corpus.select(col("doc_id"), col("embedding"))
          .withColumn("score",
            graft.functions.VectorFunctions.cosineSim(col("embedding"),
              lit(qv)))
          .filter(col("score") >= 0.0)
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(3)
        val plan = served.queryExecution.executedPlan.toString
        assert(plan.contains("codes:array"), plan.take(3000))
        val rows = served.collect()
        assert(rows.head.getString(0) == "doc-004000",
          s"delta row did not surface itself: ${rows.mkString(", ")}")
        assert(rows.head.getDouble(2) > 0.999999)
      } finally spark.conf.unset(graft.plans.AnnIndexRule.PqMinBytesKey)
    } finally graft.plans.AnnIndexRegistry.clear()
  }

  test("a delta carrying one NEW key twice appends ONE idMap row (ADVICE r15)") {
    val dir = scratchDir("graft-pqdupid-src")
    val root = scratchDir("graft-pqdupid-idx")
    val src = s"$dir/docs.parquet"
    val q = new IvfPqIndex(nCentroids = 8, nProbe = 4, m = 8, kCentroids = 16)
    batch(0, 1000).repartition(2).write.mode("overwrite").parquet(src)
    IvfPqIndex.openOrBuildPathAnyId(spark, q, src, "doc_id", "embedding", root)
    // one ingest batch upserting the SAME new document twice (two rows,
    // one key): the code tables dedup via dedupDeltaIds; the idMap delta
    // must too, or the restore join doubles this neighbor in every top-k
    val dup = batch(1000, 1001)
    dup.unionByName(dup).coalesce(1).write.mode("append").parquet(src)
    val path2 = IvfPqIndex.openOrBuildPathAnyId(spark, q, src,
      "doc_id", "embedding", root)
    val idMap = spark.read.parquet(s"$path2/idMap")
      .filter(col("id") === "doc-001000")
    assert(idMap.count() == 1,
      "duplicate (bucket, sid, id) idMap rows appended for one key")
    assert(spark.read.parquet(s"$path2/codedCell")
      .join(idMap.select(col("sid").as("id")), Seq("id"), "left_semi")
      .count() == 1)
  }
}
