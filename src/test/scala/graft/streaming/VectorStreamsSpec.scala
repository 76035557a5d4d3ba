package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** A CDC row for the streaming ingest specs: `op` = "u"/"d". */
case class CdcVec(op: String, vec_id: Long, embedding: Seq[Float])

/** The standing-search query must answer a streamed query vector exactly
  * like the batch kNN — across micro-batch boundaries. */
class VectorStreamsSpec extends AnyFunSuite with SparkTestBase {

  private def corpus = spark.read.parquet(s"$sf0_001/embeddings.parquet")

  private def queryVecs(ids: Long*): Seq[QueryVec] =
    corpus.filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => QueryVec(r.getLong(0), r.getSeq[Float](1)))

  test("continuousKnn: streamed queries get the exact batch top-3, per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[QueryVec]
    val q = VectorStreams
      .continuousKnn(input.toDF(), corpus, "vec_id", "embedding", k = 3)
      .writeStream.format("memory").queryName("cont_knn")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(queryVecs(0L, 7L): _*)
      q.processAllAvailable()
      input.addData(queryVecs(3L): _*) // later micro-batch, same standing query
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cont_knn")
      .select("q_id", "rank", "neighbor_id").collect().map(_.toSeq).toSet

    val batch = VectorStreams
      .continuousKnn(queryVecs(0L, 7L, 3L).toDF(), corpus, "vec_id", "embedding", k = 3)
      .select("q_id", "rank", "neighbor_id").collect().map(_.toSeq).toSet

    assert(batch.size == 9 && streamed == batch)
  }

  test("indexedKnn: streamed IVF-probing kNN matches exact standing search at recall >= 0.9") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ivf = new graft.ml.IvfIndex(nCentroids = 8, nProbe = 5)
    val built = ivf.build(spark, corpus, "vec_id", "embedding")
    val qs = queryVecs(0L until 20L: _*)

    val input = MemoryStream[QueryVec]
    val q = VectorStreams.indexedKnn(input.toDF(), built, nProbe = 5, k = 3)
      .writeStream.format("memory").queryName("idx_knn")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(qs.take(10): _*)
      q.processAllAvailable()
      input.addData(qs.drop(10): _*) // later micro-batch, same standing query
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("idx_knn")
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact standing search is the oracle; the index path is approximate
    // (probes 5 of 8 cells) with the AnnRecallSpec recall contract
    val exact = VectorStreams
      .continuousKnn(qs.toDF(), corpus, "vec_id", "embedding", k = 3)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (streamed & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"indexed streaming kNN recall $recall")
    // every query answered with a full top-3 (cells always hold >= k rows
    // at these sizes)
    assert(streamed.size == exact.size)

    // the plan must probe cells via an EQUI-join on cell — not rescan the
    // corpus per query (the unified API lets us assert on the batch plan)
    val plan = VectorStreams.indexedKnn(qs.toDF(), built, nProbe = 5, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("cell"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "indexedKnn must not plan a full-corpus non-equi join")
  }

  test("indexedKnnFiltered: streamed results all in-filter and identical to batch searchFiltered") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ivf = new graft.ml.IvfIndex(nCentroids = 8, nProbe = 6)
    val built = ivf.build(spark, corpus, "vec_id", "embedding")
    val allowed = corpus.filter(col("label") % 4 === 1)
      .select(col("vec_id").as("id"))
    val allowedSet = allowed.collect().map(_.getLong(0)).toSet
    val qs = queryVecs(0L until 10L: _*)

    val input = MemoryStream[QueryVec]
    val q = VectorStreams.indexedKnnFiltered(input.toDF(), built,
        nProbe = 6, k = 3, allowed)
      .writeStream.format("memory").queryName("idx_knn_filtered")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(qs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("idx_knn_filtered")
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed.nonEmpty)
    assert(streamed.forall { case (_, n) => allowedSet.contains(n) },
      "an out-of-filter neighbor surfaced through the streaming filtered path")
    // same routing, same candidates, same bounded top-k -> the streamed
    // answer IS the batch searchFiltered answer, not merely close to it
    val batch = ivf.searchFiltered(built,
        corpus.filter(col("vec_id") < 10), "vec_id", "embedding", 3, allowed)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("indexedIngest: streamed vectors become visible to indexedKnn, no re-fit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // index built over HALF the corpus; vectors >= 400 arrive on a stream
    val ivf = new graft.ml.IvfIndex(nCentroids = 8, nProbe = 8)
    val base = corpus.filter(col("vec_id") < 400)
    val built = ivf.build(spark, base, "vec_id", "embedding")
    val centroidsBefore = built.centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).toSet
    val indexRef = new java.util.concurrent.atomic.AtomicReference(built)

    // the streamed-but-not-yet-ingested vector is INVISIBLE to the probe
    val probe450 = () => VectorStreams.indexedKnn(
        queryVecs(450L).toDF(), indexRef.get(), nProbe = 8, k = 1)
      .select("neighbor_id").head().getLong(0)
    assert(probe450() != 450L)

    val input = MemoryStream[QueryVec]
    val ingest = VectorStreams.indexedIngest(
      input.toDF().select(col("q_id").as("vec_id"), col("q_emb").as("embedding")),
      ivf, indexRef, "vec_id", "embedding")
    try {
      input.addData(queryVecs(450L, 451L): _*)
      ingest.processAllAvailable()
      // after the batch commits, the SAME standing probe sees the vector
      assert(probe450() == 450L,
        "streamed vector invisible to indexedKnn after ingest")
      input.addData(queryVecs(452L): _*) // a later micro-batch too
      ingest.processAllAvailable()
      assert(VectorStreams.indexedKnn(
          queryVecs(452L).toDF(), indexRef.get(), nProbe = 8, k = 1)
        .select("neighbor_id").head().getLong(0) == 452L)
    } finally ingest.stop()

    // freshness came from append, not rebuild: frozen centroids prove no
    // KMeans ran in the ingest loop
    val centroidsAfter = indexRef.get().centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).toSet
    assert(centroidsAfter == centroidsBefore)
    assert(indexRef.get().assigned.count() == base.count() + 3)
  }

  test("indexedCdcIngest: streamed deletes stop serving at commit, full-k backfill; re-add restores") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ivf = new graft.ml.IvfIndex(nCentroids = 8, nProbe = 8)
    val built = ivf.build(spark, corpus, "vec_id", "embedding")
    val centroidsBefore = built.centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).toSet
    val indexRef = new java.util.concurrent.atomic.AtomicReference(built)
    def top5(): Array[Long] = VectorStreams.indexedKnn(
        queryVecs(7L).toDF(), indexRef.get(), nProbe = 8, k = 5)
      .orderBy(col("rank")).select("neighbor_id").collect().map(_.getLong(0))
    val before = top5()
    assert(before.head == 7L && before.length == 5)
    val victim = before(1) // the current 2nd-best of query 7

    val input = MemoryStream[CdcVec]
    val ingest = VectorStreams.indexedCdcIngest(input.toDF(),
      ivf, indexRef, "op", "vec_id", "embedding")
    try {
      // a streamed delete: the standing probe stops serving the id at
      // batch commit, at FULL k (the tombstone filters the candidate
      // set, so the next-best row backfills)
      input.addData(CdcVec("d", victim, Seq.empty))
      ingest.processAllAvailable()
      val afterDel = top5()
      assert(afterDel.length == 5, s"top-k truncated: ${afterDel.length}")
      assert(!afterDel.contains(victim), "deleted id still served")
      assert(afterDel.head == 7L)

      // a MIXED batch: an upsert (exact copy of 7's vector — must enter
      // the top-k) and a delete in one micro-batch
      val v7 = queryVecs(7L).head.q_emb
      val victim2 = afterDel(1)
      input.addData(CdcVec("u", 9000L, v7), CdcVec("delete", victim2, Seq.empty))
      ingest.processAllAvailable()
      val afterMixed = top5()
      assert(afterMixed.contains(9000L), "streamed upsert invisible")
      assert(!afterMixed.contains(victim2))
      assert(!afterMixed.contains(victim))

      // delete-wins within one batch for the SAME key (unordered CDC)
      input.addData(CdcVec("u", 9001L, v7), CdcVec("d", 9001L, Seq.empty))
      ingest.processAllAvailable()
      assert(!top5().contains(9001L), "same-batch delete must win")

      // a NULL op is an upsert ("every other row appends") — a raw
      // three-valued isin filter would silently drop it from BOTH splits
      input.addData(CdcVec(null, 9002L, v7))
      ingest.processAllAvailable()
      assert(top5().contains(9002L), "null-op row must be upserted")

      // a re-added id serves again (append takes it off the tombstones)
      val vVictim = queryVecs(victim).head.q_emb
      input.addData(CdcVec("u", victim, vVictim))
      ingest.processAllAvailable()
      assert(top5().contains(victim), "re-added id not served")
    } finally ingest.stop()

    // all freshness came from append/tombstone bookkeeping, never a
    // re-fit: the centroid table is frozen across every CDC batch
    val centroidsAfter = indexRef.get().centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).toSet
    assert(centroidsAfter == centroidsBefore)
  }

  test("semanticScreen: duplicates rejected, novel admitted; streamed == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ivf = new graft.ml.IvfIndex(nCentroids = 8, nProbe = 8)
    val built = ivf.build(spark, corpus, "vec_id", "embedding")
    // incoming: an exact copy of corpus vector 5 (a near-dup by
    // construction) and a vector with no semantic neighbor in the corpus
    val dup = queryVecs(5L).head.copy(q_id = 1005L)
    val novel = QueryVec(1006L, Seq.tabulate(64)(i => if (i == 0) 1f else 0f))
    val incoming = Seq(dup, novel)

    val input = MemoryStream[QueryVec]
    val q = VectorStreams.semanticScreen(input.toDF(), built, nProbe = 8, tau = 0.8)
      .writeStream.format("memory").queryName("sem_screen")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(dup)
      q.processAllAvailable()
      input.addData(novel) // later micro-batch, same standing screen
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sem_screen")
      .select("id", "nearest_id", "admit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

    assert(streamed.size == 2)
    val dupVerdict = streamed.find(_._1 == 1005L).get
    assert(dupVerdict._2 == 5L && !dupVerdict._3)
    assert(streamed.find(_._1 == 1006L).get._3)
    // the duplicate's nearest is its source at cosine ~1.0
    val dupRow = spark.table("sem_screen").filter(col("id") === 1005L).head
    assert(dupRow.getAs[Double]("nearest_cos") > 0.999)

    // unified API: the same call on a batch frame produces the same verdicts
    val batch = VectorStreams.semanticScreen(incoming.toDF(), built, 8, 0.8)
      .select("id", "nearest_id", "admit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(batch == streamed)
  }

  test("indexedIngest composes with an IvfGeometry-calibrated index: freshness holds, derived centroids stay frozen") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // geometry from the DERIVED path (what MerkonStore.buildIndex's 0/0
    // default resolves), not caller constants: calibrate over a 400-row
    // base corpus, then stream vectors 450/451 into the published index
    val dir = scratchDir("graft-stream-geo")
    val idxRoot = scratchDir("graft-stream-geo-idx")
    corpus.filter(col("vec_id") < 400).write.parquet(s"$dir/base.parquet")
    val contract = graft.ml.IvfGeometry.Contract(3, 0.95, nAnchors = 32)
    val cal = graft.ml.IvfGeometry.calibrated(spark, s"$dir/base.parquet",
      "vec_id", "embedding", contract, idxRoot)
    assert(cal.ivf.nCentroids == graft.ml.IvfGeometry.centroidsFor(400))
    assert(cal.measuredRecall >= contract.targetRecall)
    // warm-open the SAME published artifact the calibration built
    val built = graft.ml.IvfIndex.openOrBuild(spark, cal.ivf,
      s"$dir/base.parquet", "vec_id", "embedding", idxRoot)
    val centroidsBefore = built.centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).toSet
    assert(centroidsBefore.size == cal.ivf.nCentroids)

    val indexRef = new java.util.concurrent.atomic.AtomicReference(built)
    val input = MemoryStream[QueryVec]
    val ingest = VectorStreams.indexedIngest(
      input.toDF().select(col("q_id").as("vec_id"), col("q_emb").as("embedding")),
      cal.ivf, indexRef, "vec_id", "embedding")
    try {
      input.addData(queryVecs(450L, 451L): _*)
      ingest.processAllAvailable()
    } finally ingest.stop()

    // freshness: the streamed vectors are in the searchable cell table at
    // batch commit and a standing probe surfaces them (full-width probe —
    // visibility is the freshness contract; probe width stays the
    // calibrated recall dial for ordinary queries)
    assert(indexRef.get().assigned.filter(col("id") === 450L).count() == 1)
    assert(VectorStreams.indexedKnn(queryVecs(450L).toDF(), indexRef.get(),
        nProbe = cal.ivf.nCentroids, k = 1)
      .select("neighbor_id").head().getLong(0) == 450L)
    // composition contract: the micro-batch appended against the DERIVED
    // quantizer — centroid table byte-identical, so no KMeans ran in the
    // ingest loop even though the geometry came from IvfGeometry rather
    // than caller constants
    val centroidsAfter = indexRef.get().centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1))).toSet
    assert(centroidsAfter == centroidsBefore)
    assert(indexRef.get().assigned.count() == 402)
  }

  test("semanticScreen + indexedIngest: admitted vectors screen the next batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ivf = new graft.ml.IvfIndex(nCentroids = 8, nProbe = 8)
    val built = ivf.build(spark, corpus, "vec_id", "embedding")
    val indexRef = new java.util.concurrent.atomic.AtomicReference(built)

    val novel = QueryVec(2001L, Seq.tabulate(64)(i => if (i == 1) 1f else 0f))
    val dupOfNovel = novel.copy(q_id = 2002L)
    def screen(v: QueryVec): (Boolean, Option[Long]) = {
      val r = VectorStreams
        .semanticScreen(Seq(v).toDF(), indexRef.get(), nProbe = 8, tau = 0.8).head
      (r.getAs[Boolean]("admit"), Option(r.getAs[java.lang.Long]("nearest_id")).map(_.toLong))
    }
    // batch 1: the novel vector passes the screen against the standing corpus
    assert(screen(novel)._1)
    // ...and is ingested through the live-index append path
    val input = MemoryStream[QueryVec]
    val ingest = VectorStreams.indexedIngest(
      input.toDF().select(col("q_id").as("vec_id"), col("q_emb").as("embedding")),
      ivf, indexRef, "vec_id", "embedding")
    try {
      input.addData(novel)
      ingest.processAllAvailable()
    } finally ingest.stop()
    // batch 2: its duplicate is now caught by the SAME standing screen —
    // the screen is self-maintaining through the index, no rebuild
    val (admit2, nearest2) = screen(dupOfNovel)
    assert(!admit2 && nearest2.contains(2001L))
  }
}
