package graft.queries

import graft.SparkTestBase
import graft.functions.VectorFunctions.cosineSim
import graft.ml.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * The clustered-corpus contract behind the two r12 indexed audits'
 * 100 TB claims.
 *
 * On the uniform-random fixture corpus the indexed miner must probe 7
 * of 8 cells to hold agreement >= 0.9 (BitextPuritySpec) — the coarse
 * quantizer has no cluster structure to exploit, so the probes touch
 * most of the corpus and the indexed path cannot beat the bounded exact
 * stream (SCALE.md r12 measured exactly that). The scale story rests on
 * real embedding corpora CLUSTERING, where the probed fraction is
 * nProbe/nCentroids. This spec turns that sentence into a measurement:
 * a 32-cluster corpus (tight Gaussian clusters around near-orthogonal
 * 64-d centers, en/fr split and one label per cluster) is served by the
 * SAME `bitextAgreement` / `labelPurityCompare` code at nProbe 4 of 32
 * cells, and the spec pins
 *  - miner agreement with the exact margin argmax >= 0.9 (measured 1.0),
 *  - the probed candidate volume at a small fraction of the exact
 *    fr x en pair stream (expected ~ nProbe/nCentroids = 0.125), and
 *  - index-served label purity within PurityTol of exact (measured
 *    drift 0).
 */
class BitextClusteredSpec extends AnyFunSuite with SparkTestBase
    with BeforeAndAfterAll {

  private val NClusters = 32
  private val PerCluster = 60
  private val Dim = 64
  private val NProbe = 4

  // scratchDir (exit-registered) + eager afterAll deletion: the eager
  // path also reclaims the corpus's entry in the shared IVF cache root,
  // which the exit hook doesn't know about
  private lazy val dir = scratchDir("graft_bitext_clustered")
  private lazy val ivf = new IvfIndex(nCentroids = NClusters, nProbe = NProbe)
  // built once, deleted in afterAll. builtPath records whether the lazy
  // was ever forced: afterAll must not FORCE a fixture+index build just
  // to delete it (a filtered run of a future test that never touches
  // indexPath would otherwise pay the build in cleanup), and deleting
  // `indexPath` itself is only meaningful once it exists.
  @volatile private var builtPath: Option[String] = None
  private lazy val indexPath: String = {
    graft.ClusteredCorpus.write(spark, dir, NClusters, PerCluster, Dim)
    val p = IvfIndex.openOrBuildPath(spark, ivf,
      s"$dir/embeddings.parquet", "vec_id", "embedding")
    builtPath = Some(p)
    p
  }

  override def afterAll(): Unit = {
    deleteRecursively(new java.io.File(dir))
    builtPath.foreach(p => deleteRecursively(new java.io.File(p)))
    super.afterAll()
  }

  /** Candidate rows one indexed scoring pass touches: for each query,
    * the allow-listed rows of its NProbe nearest cells — an independent
    * window-function spelling of the searchCore routing, so it also
    * cross-checks the TopKByScore route. */
  private def probedCandidates(built: IvfIndex.Built, queries: DataFrame,
      allowIds: DataFrame): Long = {
    val cellSizes = built.live.join(allowIds, Seq("id"), "left_semi")
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("q_id").orderBy(col("s").desc, col("cell"))
    queries.crossJoin(broadcast(built.centroids))
      .select(col("q_id"), col("cell"),
        cosineSim(col("q_emb"), col("centroid")).as("s"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= NProbe)
      .join(cellSizes, "cell")
      .agg(coalesce(sum(col("n")), lit(0L))).head.getLong(0)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  test("indexed miner holds agreement >= 0.9 probing 4 of 32 cells on a clustered corpus") {
    indexPath // force fixture + index build
    val flagged = SimilarityQueries.bitextAgreement(spark, dir, ivf)
      .localCheckpoint()
    val n = flagged.count()
    val agreeing = flagged.filter(col("agree")).count()
    val agreement = agreeing.toDouble / n
    info(f"agreement $agreement%.4f ($agreeing/$n) at nProbe $NProbe/$NClusters")
    assert(n == (NClusters * PerCluster) / 2)
    assert(agreement >= 0.9,
      s"agreement $agreement ($agreeing/$n) below the 0.9 contract at " +
        s"nProbe $NProbe of $NClusters")
  }

  test("probed candidate volume is a small fraction of the exact pair stream") {
    val built = IvfIndex.load(spark, indexPath)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("vec_id"), col("lang")), "vec_id")
    val en = emb.filter(col("lang") === "en")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .localCheckpoint()
    val fr = emb.filter(col("lang") =!= "en")
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .localCheckpoint()
    val exactPerPass = fr.count() * en.count()
    val fwd = probedCandidates(built, fr, en.select(col("q_id").as("id")))
    val bwd = probedCandidates(built, en, fr.select(col("q_id").as("id")))
    val fraction = (fwd + bwd).toDouble / (2.0 * exactPerPass)
    info(f"probed $fwd + $bwd candidates vs 2 x $exactPerPass exact " +
      f"(fraction $fraction%.4f, ideal ${NProbe.toDouble / NClusters}%.4f)")
    assert(fwd > 0 && bwd > 0)
    assert(fraction <= 0.25,
      f"probed fraction $fraction%.4f not small vs the exact pair stream" +
        " — the clustered-corpus scale claim does not hold")
  }

  test("index-served label purity matches exact at 4 of 32 probes on a clustered corpus") {
    indexPath // force fixture + index build
    val cmp = SimilarityQueries.labelPurityCompare(spark, dir, ivf)
      .withColumn("drift", abs(col("p_idx") - col("p_exact")))
      .localCheckpoint()
    assert(cmp.count() > 0)
    val Array(maxDrift, minExact) = cmp
      .agg(max(col("drift")), min(col("p_exact"))).head
      .toSeq.map(_.asInstanceOf[Double]).toArray
    info(f"max per-label purity drift $maxDrift%.4f, min exact purity $minExact%.4f")
    // the clusters ARE the labels, so exact purity must be ~1 (the
    // fixture is meaningful) and the index must not lose any of it
    assert(minExact >= 0.95)
    assert(maxDrift <= SimilarityQueries.PurityTol,
      s"max per-label purity drift $maxDrift exceeds " +
        s"${SimilarityQueries.PurityTol} at nProbe $NProbe of $NClusters")
  }
}
