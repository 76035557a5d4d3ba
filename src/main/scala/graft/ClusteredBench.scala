package graft

import graft.ml.{IvfGeometry, IvfIndex}
import graft.queries.SimilarityQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * The scaled clustered-corpus crossover measurement (VERDICT r12 ask #2):
 * `BitextClusteredSpec` proves the clustered contract at ~2k rows and the
 * uniform 10x/20x curve proves scale where the index CANNOT win — this
 * main combines them. It generates a 10x-bench-sized CLUSTERED corpus
 * (the geometry real embedding corpora have), runs the registered indexed
 * miner (`SimilarityQueries.bitextMineIndexed` at derived calibrated
 * geometry — the exact code `ann_bitext_mine` executes) against the exact
 * margin miner, and prints one JSON line with both wall-clocks, the
 * agreement, and the calibrated geometry. The crossover row lands in
 * SCALE.md: the indexed spelling must be FASTER at agreement >= 0.9.
 *
 *   sbt "runMain graft.ClusteredBench /tmp/graft-clustered10 200 100"
 *
 * Timing attribution mirrors the bench sidecar's shared-build pricing:
 * geometry calibration and the one-time index build are reported as
 * their own entries (they are index-JOB costs, amortized over every
 * query at 100 TB), and the per-run mining passes are timed separately
 * for BOTH spellings.
 */
object ClusteredBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-clustered10")
    val nClusters = args.lift(1).map(_.toInt).getOrElse(200)
    val perCluster = args.lift(2).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // reuse is keyed on the GENERATION PARAMS, not bare existence — a
    // re-run with different nClusters/perCluster must regenerate, or the
    // published JSON row would report the new args over the old corpus
    val marker = new java.io.File(dir, "corpus-params.txt")
    val params = s"$nClusters $perCluster"
    val fresh = new java.io.File(s"$dir/embeddings.parquet/_SUCCESS").isFile &&
      marker.isFile &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim == params
    if (!fresh) {
      ClusteredCorpus.write(spark, dir, nClusters, perCluster)
      java.nio.file.Files.write(marker.toPath, params.getBytes("UTF-8"))
    }
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    // index-JOB costs, priced separately (amortized across queries)
    val (cal, tCalibrate) = timed(IvfGeometry.calibrated(spark,
      s"$dir/embeddings.parquet", "vec_id", "embedding",
      SimilarityQueries.BitextContract))
    // openOrBuild inside calibration already built + published the index,
    // so re-open to price a warm load the way a query session pays it
    val (_, tIndexOpen) = timed(IvfIndex.openOrBuild(spark, cal.ivf,
      s"$dir/embeddings.parquet", "vec_id", "embedding").assigned.count())

    // per-run mining passes — warm both once (codegen + scan caches),
    // then time the second run, matching Bench's warmup discipline. The
    // timed runs PIN their pick frames (localCheckpoint inside the timed
    // region — materialization is part of the measured cost, same as
    // toRdd.count would be) so the agreement join below reuses them
    // instead of paying a third full mining pass per spelling.
    force(SimilarityQueries.bitextMineIndexed(spark, dir, cal.ivf))
    force(SimilarityQueries.bitextMineExact(spark, dir))
    spark.catalog.clearCache(); System.gc()
    val (idx, tIndexed) = timed(
      SimilarityQueries.bitextMineIndexed(spark, dir, cal.ivf)
        .select(col("f_id"), col("idx_e")).localCheckpoint())
    spark.catalog.clearCache(); System.gc()
    val (exact, tExact) = timed(
      SimilarityQueries.bitextMineExact(spark, dir)
        .select(col("f_id"), col("e_id").as("exact_e")).localCheckpoint())
    val nIdx = idx.count()
    val nExact = exact.count()

    // agreement between the two miners' picks on THIS corpus
    val cmp = idx.join(exact, Seq("f_id"), "full").localCheckpoint()
    val total = cmp.count()
    val agreeing = cmp.filter(col("idx_e") === col("exact_e")).count()
    val agreement = agreeing.toDouble / total

    // second operating point: the standard over-probe dial (2x the
    // calibrated width, capped at all cells). The calibrated width is
    // the CHEAPEST point meeting the recall contract; an agreement-first
    // deployment doubles it — margin-score borderline picks flip when a
    // probed cell misses a runner-up neighborhood even at recall ~1, and
    // the extra cells close exactly that gap. Reuses the SAME exact
    // frame, so the row prices the dial, not a fresh oracle.
    val tight = new IvfIndex(cal.ivf.nCentroids,
      math.min(2 * cal.ivf.nProbe, cal.ivf.nCentroids))
    spark.catalog.clearCache(); System.gc()
    val (idxT, tTight) = timed(
      SimilarityQueries.bitextMineIndexed(spark, dir, tight)
        .select(col("f_id"), col("idx_e").as("tight_e")).localCheckpoint())
    val cmpT = idxT.join(exact, Seq("f_id"), "full").localCheckpoint()
    val totalT = cmpT.count()
    val agreementT =
      cmpT.filter(col("tight_e") === col("exact_e")).count().toDouble / totalT

    println(s"""{"metric":"clustered_bitext_crossover","n":$n""" +
      s""","n_clusters":$nClusters,"n_centroids":${cal.ivf.nCentroids}""" +
      s""","n_probe":${cal.ivf.nProbe}""" +
      f""","probe_fraction":${cal.probeFraction}%.4f""" +
      f""","calibrated_recall":${cal.measuredRecall}%.4f""" +
      f""","agreement":$agreement%.4f""" +
      f""","indexed_sec":$tIndexed%.2f,"exact_sec":$tExact%.2f""" +
      f""","speedup":${tExact / tIndexed}%.2f""" +
      s""","tight_probe":${tight.nProbe}""" +
      f""","tight_agreement":$agreementT%.4f""" +
      f""","tight_indexed_sec":$tTight%.2f""" +
      f""","tight_speedup":${tExact / tTight}%.2f""" +
      f""","calibrate_sec":$tCalibrate%.2f,"index_open_sec":$tIndexOpen%.2f""" +
      s""","rows_indexed":$nIdx,"rows_exact":$nExact}""")
    spark.stop()
  }
}
