package graft.ml

import graft.SparkTestBase
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall of the approximate paths against exact brute force — the
  * correctness contract for results with no SQL oracle. */
class AnnRecallSpec extends AnyFunSuite with SparkTestBase {

  private def emb: DataFrame = spark.read.parquet(s"$sf0_001/embeddings.parquet")

  private lazy val exactPairs: Set[(Long, Long)] = {
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("emb_b"))
    a.join(b, col("a_id") < col("b_id"))
      .filter(cosineSim(col("emb_a"), col("emb_b")) >= 0.4)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private lazy val exactTop3: Set[(Long, Long)] = {
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    emb.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"), cosineSim(col("embedding"), col("q_emb")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("LSH similarPairs recall >= 0.9 vs exact cosine pairs") {
    val approx = new CosineLsh().similarPairs(emb, "vec_id", "embedding", 0.4)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty)
    val recall = (approx & exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"LSH pair recall $recall over ${exactPairs.size} exact pairs")
    // no false positives: every reported pair truly clears the threshold
    // (LSH only prunes candidates; scoring is exact)
    assert((approx -- allPairsAtLeast(0.4 - 1e-9)).isEmpty)
  }

  private def allPairsAtLeast(t: Double): Set[(Long, Long)] = {
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("emb_b"))
    a.join(b, col("a_id") < col("b_id"))
      .filter(cosineSim(col("emb_a"), col("emb_b")) >= t)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("LSH bucket occupancy: largest band bucket holds < 10% of the corpus") {
    // the r4 failure mode was ONE bucket holding the whole corpus (MLlib
    // BRP-LSH bucketLength >> projection std), which silently degrades the
    // bucketed join to all-pairs — pin the fix structurally
    val lsh = new CosineLsh()
    val prepared = lsh.prepare(emb, "vec_id", "embedding")
    val n = prepared.count()
    val maxBucket = lsh.signatures(prepared)
      .groupBy("band").count()
      .agg(max("count")).head.getLong(0)
    assert(maxBucket.toDouble / n < 0.10,
      s"largest LSH bucket holds $maxBucket of $n vectors")
  }

  test("LSH knnJoin recall >= 0.9 vs exact top-3") {
    val approx = new CosineLsh()
      .knnJoin(emb, emb.filter(col("vec_id") < 20), "vec_id", "embedding", 3)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exactTop3).size.toDouble / exactTop3.size
    assert(recall >= 0.9, s"LSH knn recall $recall")
  }

  test("IVF search recall >= 0.9 vs exact top-3") {
    // the registered unfiltered geometry (derived, Knn3-calibrated)
    val ivf = IvfGeometry.calibratedIvf(spark, s"$sf0_001/embeddings.parquet",
      "vec_id", "embedding", graft.queries.AnnQueries.Knn3)
    info(s"calibrated geometry c=${ivf.nCentroids} p=${ivf.nProbe}")
    val built = ivf.build(spark, emb, "vec_id", "embedding")
    val approx = ivf.search(built, emb.filter(col("vec_id") < 20), "vec_id", "embedding", 3)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exactTop3).size.toDouble / exactTop3.size
    assert(recall >= 0.9, s"IVF recall $recall")
  }

  test("IVF searchFiltered: all results in-filter, recall >= 0.9 vs exact filtered top-3") {
    val pred = col("label") % 4 === 1
    val allowedIds = emb.filter(pred).select(col("vec_id").as("id"))
    val allowedSet = allowedIds.collect().map(_.getLong(0)).toSet
    // DERIVED geometry (VERDICT r12 ask #6): the same contract the
    // registered filtered query calibrates against — the over-probe dial
    // (contract k = k_query / selectivity) is validated at whatever cell
    // count the production rule derives (banded + rows-per-cell-clamped
    // since r14, so the 500-row fixture legitimately sizes to 8)
    val ivf = IvfGeometry.calibratedIvf(spark, s"$sf0_001/embeddings.parquet",
      "vec_id", "embedding", graft.queries.AnnQueries.Filtered3)
    info(s"calibrated geometry c=${ivf.nCentroids} p=${ivf.nProbe}")
    assert(ivf.nCentroids == IvfGeometry.centroidsFor(500),
      "geometry must follow the production sizing rule")
    val built = ivf.build(spark, emb, "vec_id", "embedding")
    val approx = ivf.searchFiltered(built, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", 3, allowedIds)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // pre-filter contract: every returned neighbor satisfies the predicate
    assert(approx.forall { case (_, n) => allowedSet.contains(n) })
    // exact filtered top-3
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    val exact = emb.filter(pred).crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        cosineSim(col("embedding"), col("q_emb")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"filtered IVF recall $recall")
    // a query with NO allowed neighbor in any probed cell returns nothing
    // rather than leaking out-of-filter rows — pin with an empty allow-list
    val none = ivf.searchFiltered(built, emb.filter(col("vec_id") < 3),
      "vec_id", "embedding", 3, allowedIds.limit(0))
    assert(none.count() == 0)
  }

  test("filtered search across LSH/PQ/IVF-PQ: all in-filter, recall >= 0.9 vs exact filtered top-3") {
    val pred = col("label") % 4 === 1
    val allowedIds = emb.filter(pred).select(col("vec_id").as("id"))
    val allowedSet = allowedIds.collect().map(_.getLong(0)).toSet
    val q = emb.filter(col("vec_id") < 20)
    // exact filtered top-3 ground truth
    val qd = q.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    val exact = emb.filter(pred).crossJoin(broadcast(qd))
      .select(col("q_id"), col("vec_id"),
        cosineSim(col("embedding"), col("q_emb")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def check(name: String, df: DataFrame): Unit = {
      val got = df.select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.forall { case (_, n) => allowedSet.contains(n) },
        s"$name surfaced an out-of-filter neighbor")
      val recall = (got & exact).size.toDouble / exact.size
      assert(recall >= 0.9, s"$name filtered recall $recall")
    }

    check("lsh", new CosineLsh().knnJoinFiltered(
      emb, q, "vec_id", "embedding", 3, allowedIds))
    val pqIdx = new PqIndex(m = 8, kCentroids = 16)
    check("pq", pqIdx.searchFiltered(
      pqIdx.build(spark, emb, "vec_id", "embedding"),
      q, "vec_id", "embedding", 3, allowedIds))
    // IVF-PQ rides the same derived filtered geometry as the registered
    // queries (VERDICT r12 ask #6)
    val g = IvfGeometry.calibratedIvf(spark, s"$sf0_001/embeddings.parquet",
      "vec_id", "embedding", graft.queries.AnnQueries.Filtered3)
    val ivfpqIdx = new IvfPqIndex(nCentroids = g.nCentroids, nProbe = g.nProbe,
      m = 8, kCentroids = 16)
    check("ivfpq", ivfpqIdx.searchFiltered(
      ivfpqIdx.build(spark, emb, "vec_id", "embedding"),
      q, "vec_id", "embedding", 3, allowedIds))
  }

  test("PQ search recall >= 0.9 vs exact top-3 (ADC shortlist + exact re-rank)") {
    val pq = new PqIndex(m = 8, kCentroids = 16)
    val built = pq.build(spark, emb, "vec_id", "embedding")
    val approx = pq.search(built, emb.filter(col("vec_id") < 20), "vec_id", "embedding", 3)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exactTop3).size.toDouble / exactTop3.size
    assert(recall >= 0.9, s"PQ recall $recall")
  }

  test("IVF-PQ search recall >= 0.9 vs exact top-3 (composite routing + ADC)") {
    val ivfpq = new IvfPqIndex(nCentroids = 8, nProbe = 5, m = 8, kCentroids = 16)
    val built = ivfpq.build(spark, emb, "vec_id", "embedding")
    val approx = ivfpq.search(built, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", 3)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx & exactTop3).size.toDouble / exactTop3.size
    assert(recall >= 0.9, s"IVF-PQ recall $recall")
  }

  test("IVF-PQ persisted index searches identically; append sees the delta without a fit") {
    val ivfpq = new IvfPqIndex(nCentroids = 8, nProbe = 5, m = 8, kCentroids = 16)
    val base = emb.filter(col("vec_id") < 400)
    val delta = emb.filter(col("vec_id") >= 400)
    val built = ivfpq.build(spark, base, "vec_id", "embedding")
    val dir = scratchDir("graft-ivfpq-rt")
    IvfPqIndex.save(built, dir)
    val loaded = IvfPqIndex.load(spark, dir)
    val q = emb.filter(col("vec_id") < 10)
    def res(b: IvfPqIndex.Built) =
      ivfpq.search(b, q, "vec_id", "embedding", 3)
        .select("q_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(res(loaded) == res(built) && res(built).nonEmpty)
    // append: a vector ingested after build is findable by self-query
    val appended = ivfpq.append(loaded, delta, "vec_id", "embedding")
    assert(appended.codedCell.count() == emb.count())
    val self = ivfpq.search(appended, emb.filter(col("vec_id") === 450),
        "vec_id", "embedding", 1)
      .select("neighbor_id").collect()
    assert(self.length == 1 && self.head.getLong(0) == 450L)
  }

  test("PQ self-query returns itself as rank 1 (sanity)") {
    val pq = new PqIndex(m = 8, kCentroids = 16)
    val built = pq.build(spark, emb, "vec_id", "embedding")
    val r1 = pq.search(built, emb.filter(col("vec_id") === 5), "vec_id", "embedding", 1)
      .select("q_id", "neighbor_id", "rank").collect()
    assert(r1.length == 1 && r1.head.getLong(0) == 5L &&
      r1.head.getLong(1) == 5L && r1.head.getInt(2) == 1)
  }

  test("IVF self-query returns itself as rank 1 (sanity)") {
    val ivf = new IvfIndex(nCentroids = 8, nProbe = 2)
    val built = ivf.build(spark, emb, "vec_id", "embedding")
    val r1 = ivf.search(built, emb.filter(col("vec_id") === 5), "vec_id", "embedding", 1)
      .select("q_id", "neighbor_id", "rank").collect()
    assert(r1.length == 1 && r1.head.getLong(1) == 5L)
  }

  test("IVF persisted index searches identically to the freshly built one") {
    val ivf = new IvfIndex(nCentroids = 8, nProbe = 5)
    val built = ivf.build(spark, emb, "vec_id", "embedding")
    val dir = scratchDir("graft-ivf-rt")
    IvfIndex.save(built, dir)
    val loaded = IvfIndex.load(spark, dir)
    val q = emb.filter(col("vec_id") < 10)
    def res(b: IvfIndex.Built) =
      ivf.search(b, q, "vec_id", "embedding", 3)
        .select("q_id", "rank", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(res(loaded) == res(built))
  }

  test("PQ openOrBuild builds once, then loads the cached code table") {
    val cacheRoot = scratchDir("graft-pq-cache")
    val pq = new PqIndex(m = 8, kCentroids = 16)
    val src = s"$sf0_001/embeddings.parquet"
    PqIndex.openOrBuild(spark, pq, src, "vec_id", "embedding", cacheRoot)
    val indexDirs = new java.io.File(cacheRoot).listFiles()
    assert(indexDirs.length == 1)
    val marker = new java.io.File(indexDirs.head, "coded/_SUCCESS")
    val stamp = marker.lastModified()
    val again = PqIndex.openOrBuild(spark, pq, src, "vec_id", "embedding", cacheRoot)
    assert(marker.lastModified() == stamp) // not rebuilt
    assert(again.coded.count() == emb.count())
    // the persisted index searches identically to a freshly built one
    val fresh = pq.build(spark, emb, "vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 5)
    val a = pq.search(again, q, "vec_id", "embedding", 3)
      .select("q_id", "rank", "neighbor_id").collect().map(_.toSeq).toSet
    val b = pq.search(fresh, q, "vec_id", "embedding", 3)
      .select("q_id", "rank", "neighbor_id").collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("IVF openOrBuild builds once, then loads the cached index") {
    val cacheRoot = scratchDir("graft-ivf-cache")
    val ivf = new IvfIndex(nCentroids = 8, nProbe = 5)
    val src = s"$sf0_001/embeddings.parquet"
    IvfIndex.openOrBuild(spark, ivf, src, "vec_id", "embedding", cacheRoot)
    val indexDirs = new java.io.File(cacheRoot).listFiles()
    assert(indexDirs.length == 1)
    val marker = new java.io.File(indexDirs.head, "assigned/_SUCCESS")
    val stamp = marker.lastModified()
    val again = IvfIndex.openOrBuild(spark, ivf, src, "vec_id", "embedding", cacheRoot)
    assert(marker.lastModified() == stamp) // not rebuilt
    assert(again.assigned.count() == emb.count())
  }
}
