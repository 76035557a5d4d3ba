package graft.plans

import graft.SparkTestBase
import graft.functions.VectorFunctions.cosineSim
import graft.ml.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * One full index lifecycle through the OPTIMIZER path (not just the
 * IvfIndex API): register → query → delete ids → append a batch →
 * query again. At every step the flagship literal-kNN plan must stay
 * cell-pruned (scan the index, not the corpus), tombstoned ids must
 * never surface, and recall vs the exact plan must hold ≥ 0.9 — the
 * store's RemoveAsync/UpsertBatchAsync steady state exercised end-to-end
 * against a published on-disk index.
 */
class AnnLifecycleSpec extends AnyFunSuite with SparkTestBase {

  private def emb: DataFrame = spark.read.parquet(s"$sf0_001/embeddings.parquet")

  test("register → query → delete → append → query stays pruned, tombstone-clean, recall ≥ 0.9") {
    import spark.implicits._
    val dir = scratchDir("ann-lifecycle")
    val corpusPath = s"$dir/corpus"
    val cacheRoot = s"$dir/ivf-cache"
    emb.filter(col("vec_id") < 300).write.parquet(corpusPath)

    def corpus = spark.read.parquet(corpusPath)
    def flagship(qv: Array[Float], k: Int): DataFrame =
      corpus.select(col("vec_id"), col("embedding"))
        .withColumn("score", cosineSim(col("embedding"), lit(qv)))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(k)
    def queryVec(id: Long): Array[Float] =
      emb.filter(col("vec_id") === id).select("embedding")
        .head().getSeq[Float](0).toArray
    val qids = (100L until 120L)

    /** top-k ids through the (possibly rewritten) flagship plan. */
    def approxTop(k: Int): Map[Long, Set[Long]] =
      qids.map(q => q -> flagship(queryVec(q), k).select("vec_id")
        .collect().map(_.getLong(0)).toSet).toMap

    /** exact ground truth with the kill-switch, minus `dead` ids (the
      * corpus files still hold deleted rows until compaction; the STORE
      * view — what the rewrite serves — must exclude them). */
    def exactTop(k: Int, dead: Set[Long]): Map[Long, Set[Long]] = {
      spark.conf.set(AnnIndexRule.ConfKey, "false")
      try qids.map { q =>
        val rows = flagship(queryVec(q), k + dead.size).collect()
          .map(r => r.getLong(0) -> r.getDouble(2))
          .filterNot { case (id, _) => dead.contains(id) }.take(k)
        q -> rows.map(_._1).toSet
      }.toMap
      finally spark.conf.unset(AnnIndexRule.ConfKey)
    }

    def recall(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double =
      qids.map(q => (approx(q) & exact(q)).size.toDouble / exact(q).size).sum / qids.size

    def assertPruned(): Unit = {
      // the rewrite lists ONLY the probed cell directories (r14: pruning
      // moved from a partition filter to the scan's root paths), so the
      // scan's roots are cell= dirs and the corpus dir never appears
      val df = flagship(queryVec(100L), 10)
      val roots = AnnRewriteSpec.fileScans(df.queryExecution.executedPlan)
        .flatMap(_.relation.location.rootPaths.map(_.toString))
      assert(roots.exists(_.contains("cell=")) &&
        roots.forall(r => r.contains("cell=") || r.contains("tombstones")) &&
        !roots.exists(_.contains("/corpus")),
        "flagship plan lost the index rewrite: " + roots.mkString(", "))
    }

    val ivf = new IvfIndex(nCentroids = 8, nProbe = 6)
    try {
      // ---- phase 1: register + first query ----
      val entry = AnnIndexRegistry.register(spark, ivf, corpusPath,
        "vec_id", "embedding", nProbe = 6, cacheRoot = cacheRoot)
      assertPruned()
      val r1 = recall(approxTop(10), exactTop(10, Set.empty))
      assert(r1 >= 0.9, s"post-register recall $r1")

      // ---- phase 2: delete a batch of ids (RemoveAsync path) ----
      val dead = (0L until 50L).toSet
      val built = IvfIndex.load(spark, entry.indexPath)
      val afterDelete = ivf.delete(built, dead.toSeq.toDF("id"), "id")
      afterDelete.tombstones.get.coalesce(1).write.mode("overwrite")
        .parquet(s"${entry.indexPath}/tombstones")
      assertPruned()
      val approx2 = approxTop(10)
      assert(approx2.values.forall(_.intersect(dead).isEmpty),
        "tombstoned id surfaced through the rewrite after delete")
      val r2 = recall(approx2, exactTop(10, dead))
      assert(r2 >= 0.9, s"post-delete recall $r2")

      // ---- phase 3: append a batch (UpsertBatchAsync path) ----
      // new source files → re-register rides the incremental branch:
      // encode-only against FROZEN centroids, tombstones carried over
      emb.filter(col("vec_id") >= 300).write.mode("append").parquet(corpusPath)
      val entry2 = AnnIndexRegistry.register(spark, ivf, corpusPath,
        "vec_id", "embedding", nProbe = 6, cacheRoot = cacheRoot)
      val c1 = spark.read.parquet(s"${entry.indexPath}/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).toSet
      val c2 = spark.read.parquet(s"${entry2.indexPath}/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).toSet
      assert(c1 == c2, "append re-fit the centroids — must encode against frozen ones")

      assertPruned()
      val approx3 = approxTop(10)
      assert(approx3.values.forall(_.intersect(dead).isEmpty),
        "tombstoned id resurfaced after append")
      // appended ids are reachable: some query's top-10 contains one
      // (uniform corpus; 200 of 500 fixture ids are new appends)
      assert(approx3.values.exists(_.exists(_ >= 300L)),
        "no appended id reachable through the rewritten plan")
      val r3 = recall(approx3, exactTop(10, dead))
      assert(r3 >= 0.9, s"post-append recall $r3")

      // ---- phase 4: compact the published index ----
      // folds tombstones into the cell table (affected cells only);
      // the rewrite must keep serving the same store view, now without
      // the anti-join
      IvfIndex.compactOnDisk(spark, entry2.indexPath)
      assert(!new java.io.File(s"${entry2.indexPath}/tombstones").exists(),
        "compaction left the tombstone sidecar behind")
      assertPruned()
      val approx4 = approxTop(10)
      assert(approx4.values.forall(_.intersect(dead).isEmpty),
        "deleted id resurfaced after compaction")
      val r4 = recall(approx4, exactTop(10, dead))
      assert(r4 >= 0.9, s"post-compaction recall $r4")
    } finally AnnIndexRegistry.clear()
  }

  test("registry caps driver state at MaxEntries with LRU eviction") {
    val e = AnnIndexRegistry.Entry("/nowhere", "id", "emb", 1,
      Array(0 -> Array(1.0)))
    try {
      AnnIndexRegistry.clear()
      val n = AnnIndexRegistry.MaxEntries
      (0 until n + 5).foreach(i => AnnIndexRegistry.put(s"/corpus-$i", e))
      assert(AnnIndexRegistry.size == n)
      // the 5 oldest were evicted; the newest survive
      assert(AnnIndexRegistry.lookup("/corpus-0").isEmpty)
      assert(AnnIndexRegistry.lookup(s"/corpus-${n + 4}").isDefined)
      // lookup refreshes recency: touching the eldest keeps it alive
      AnnIndexRegistry.lookup("/corpus-5")
      AnnIndexRegistry.put("/one-more", e)
      assert(AnnIndexRegistry.lookup("/corpus-5").isDefined)
      assert(AnnIndexRegistry.lookup("/corpus-6").isEmpty)
    } finally AnnIndexRegistry.clear()
  }
}
