package graft

import graft.functions.VectorFunctions.cosineSim
import graft.ml.{IvfGeometry, IvfPqIndex}
import graft.plans.{AnnIndexRegistry, AnnIndexRule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The index-FAMILY crossover measurement: one registered corpus carrying
 * both families, the SAME reference-shaped flagship query served three
 * ways — exact scan (rewrite off), IVF cell table, IVF-PQ codes table —
 * under the conf dial the rewrite reads. Prints one JSON line with the
 * three wall-clocks and each family's measured recall vs the exact scan,
 * so SCALE.md's advantage-point claim (`spark.graft.ann.family.
 * pqMinBytes`, default 1 GiB) carries a measured row instead of a
 * theoretical one: below the point the float scan is cache-resident and
 * the extra shortlist hop cannot win; the codes table's 32× IO advantage
 * is what pays at 100 TB, not at fixture scale — this main measures
 * exactly where the bench-scale boxes sit.
 *
 *   sbt "runMain graft.FamilyBench /tmp/graft-clustered10 20 10"
 *
 * Index-job costs (geometry calibration, both artifact builds) are
 * priced separately from the per-query serves, mirroring the bench
 * sidecar's shared-build discipline.
 */
object FamilyBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-clustered10")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(20)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = s"$dir/embeddings.parquet"
    val corpus = spark.read.parquet(src)
    val n = corpus.count()
    val dim = corpus.select(size(col("embedding"))).head().getInt(0)

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // index job: calibrated geometry + both artifacts (cached by corpus
    // fingerprint across runs — the first run pays the KMeans fits)
    val (cal, tCalibrate) = timed(IvfGeometry.calibrated(spark, src,
      "vec_id", "embedding", IvfGeometry.Contract(k, 0.95)))
    val ivfpq = new IvfPqIndex(cal.ivf.nCentroids, cal.ivf.nProbe,
      m = IvfGeometry.subspacesFor(dim),
      kCentroids = IvfGeometry.codebookFor(n))
    val (_, tRegister) = timed(AnnIndexRegistry.register(spark, cal.ivf,
      src, "vec_id", "embedding", cal.ivf.nProbe, ivfpq = Some(ivfpq)))

    // stride-sampled query vectors across the id range
    val stride = math.max(1L, n / nQueries)
    val qvs = corpus.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy(col("vec_id")).limit(nQueries)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)

    def flagship(qv: Array[Float]): DataFrame =
      corpus.select(col("vec_id"), col("embedding"))
        .withColumn("score", cosineSim(col("embedding"), lit(qv)))
        .filter(col("score") >= 0.0)
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(k)

    /** Warm once (codegen, page cache), then time the serve loop; each
      * query is its own plan+job, the reference's call-per-query shape. */
    def serveAll(): (Seq[Set[Long]], Double) = {
      qvs.foreach(qv => flagship(qv).collect())
      spark.catalog.clearCache(); System.gc()
      timed(qvs.toSeq.map(qv =>
        flagship(qv).collect().map(_.getLong(0)).toSet))
    }

    def withConf(key: String, v: String)(body: => (Seq[Set[Long]], Double)) = {
      spark.conf.set(key, v)
      try body finally spark.conf.unset(key)
    }

    val (exactSets, tExact) =
      withConf(AnnIndexRule.ConfKey, "false")(serveAll())
    val (ivfSets, tIvf) =
      withConf(AnnIndexRule.PqMinBytesKey, Long.MaxValue.toString)(serveAll())
    val (pqSets, tPq) =
      withConf(AnnIndexRule.PqMinBytesKey, "0")(serveAll())

    def recallOf(sets: Seq[Set[Long]]): Double =
      sets.zip(exactSets).map { case (a, e) =>
        (a & e).size.toDouble / e.size }.sum / exactSets.size

    println(f"""{"metric":"family_serve","dir":"$dir","n":$n,"dim":$dim""" +
      s""","n_centroids":${cal.ivf.nCentroids},"n_probe":${cal.ivf.nProbe}""" +
      s""","m":${ivfpq.m},"k_centroids":${ivfpq.kCentroids}""" +
      s""","queries":$nQueries,"k":$k""" +
      f""","exact_sec":$tExact%.2f,"ivf_sec":$tIvf%.2f,"pq_sec":$tPq%.2f""" +
      f""","ivf_recall":${recallOf(ivfSets)}%.4f""" +
      f""","pq_recall":${recallOf(pqSets)}%.4f""" +
      f""","calibrate_sec":$tCalibrate%.2f,"register_sec":$tRegister%.2f}""")
    spark.stop()
  }
}
