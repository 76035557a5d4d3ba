package graft

import graft.ml.{IvfGeometry, IvfIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * The ingest-refresh cost ladder (r15): how much does growing a
 * PUBLISHED IVF artifact by a delta cost under each refresh strategy?
 *
 *   1. `rebuild_sec`        — full KMeans re-fit + full write (what a
 *                             re-keyed geometry forced every cycle
 *                             before r14's banding);
 *   2. `rewrite_append_sec` — frozen centroids, but the grown cell
 *                             table is re-shuffled and re-written in
 *                             full (the r14 append path);
 *   3. `link_append_sec`    — frozen centroids AND file reuse: existing
 *                             cell files hardlink into the new
 *                             artifact, only the delta's rows are
 *                             encoded/written (`IvfIndex.appendOnDisk`,
 *                             the r15 path — the single-node spelling
 *                             of a manifest-commit refresh).
 *
 * The measured gap between 2 and 3 is the O(corpus)→O(delta) claim in
 * SCALE.md carrying a number; at 100 TB strategy 2 re-writes 100 TB
 * per refresh wave while 3 writes the wave.
 *
 *   sbt "runMain graft.RefreshBench 100000 32 1000"
 */
object RefreshBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val dim = args.lift(1).map(_.toInt).getOrElse(32)
    val deltaN = args.lift(2).map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = graft.util.ExitScratch.register(
      java.nio.file.Files.createTempDirectory("graft-refresh").toString)
    val src = s"$root/src"

    def batch(from: Long, until: Long) = spark.range(from, until).select(
      col("id").as("vec_id"),
      array((0 until dim).map(d =>
        ((pmod(xxhash64(col("id") * (d + 1) + d), lit(1000)) / 500.0) - 1.0)
          .cast("float")): _*).as("embedding"))

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    batch(0, n).repartition(cpus.toInt).write.mode("overwrite").parquet(src)
    val c = IvfGeometry.centroidsFor(n)
    val ivf = new IvfIndex(c, math.max(1, c / 8))

    /** Bytes of genuinely NEW data under `dir` — files whose inode has
      * link count 1 (hardlinked reuses of the published artifact are
      * not new bytes). The scale-honest metric: wall at fixture scale
      * is fixed-overhead-bound, bytes written is what a 100 TB refresh
      * pays. */
    def newBytes(dir: String): Long = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(dir))
        .filter(f => java.nio.file.Files.getAttribute(
          f.toPath, "unix:nlink").asInstanceOf[Number].intValue() == 1)
        .map(_.length()).sum
    }

    // base build (the one-time cost every strategy amortizes)
    val (published, tBuild) = timed(IvfIndex.openOrBuildPath(spark, ivf,
      src, "vec_id", "embedding", s"$root/cache"))

    val delta = batch(n, n + deltaN).localCheckpoint()

    // 3. hardlink append (the r15 refresh)
    val (ok, tLink) = timed(IvfIndex.appendOnDisk(spark, published, delta,
      "vec_id", "embedding", s"$root/link-staging"))
    require(ok, "link append unexpectedly fell back")
    require(spark.read.parquet(s"$root/link-staging/assigned").count()
      == n + deltaN)

    // 2. rewrite append (the r14 refresh): frozen centroids, full
    // cell-table shuffle + write
    val (_, tRewrite) = timed {
      IvfIndex.save(ivf.append(IvfIndex.load(spark, published), delta,
        "vec_id", "embedding"), s"$root/rewrite-staging")
    }
    require(spark.read.parquet(s"$root/rewrite-staging/assigned").count()
      == n + deltaN)

    // 1. full rebuild (what geometry re-keying forced per cycle pre-r14)
    val grown = spark.read.parquet(src).unionByName(delta)
    val (_, tRebuild) = timed {
      IvfIndex.save(ivf.build(spark, grown, "vec_id", "embedding"),
        s"$root/rebuild-staging")
    }

    println(f"""{"metric":"refresh_ladder","n":$n,"dim":$dim""" +
      s""","delta":$deltaN,"n_centroids":$c""" +
      f""","build_sec":$tBuild%.2f,"rebuild_sec":$tRebuild%.2f""" +
      f""","rewrite_append_sec":$tRewrite%.2f""" +
      f""","link_append_sec":$tLink%.2f""" +
      s""","rewrite_new_bytes":${newBytes(s"$root/rewrite-staging")}""" +
      s""","link_new_bytes":${newBytes(s"$root/link-staging")}}""")
    spark.stop()
  }
}
