package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * The rollup-refresh cost ladder (r17 — the [[RefreshBench]] methodology
 * applied to registered rollups, VERDICT r16 ask #1): what does keeping a
 * registered rollup current cost per insert-only mutation wave?
 *
 *   1. `full_rebuild_sec` — re-aggregate the WHOLE grown fact (what every
 *                           re-register paid before r17);
 *   2. `incr_sec`         — aggregate the DELTA FILES ALONE and merge into
 *                           the existing cells (the r17
 *                           `RollupRegistry.buildCells` delta path).
 *
 * The structural claim is the READ volume: strategy 1 reads the fact
 * (`fact_bytes`, grows with the corpus), strategy 2 reads
 * `delta_bytes + cells_bytes` (delta-sized + kilobyte cells). At a
 * daily-appending 100 TB fact that is the difference between a 100 TB
 * rescan per refresh and reading the day's files.
 *
 *   sbt "runMain graft.RollupRefreshBench 1000000 10000 100"
 */
object RollupRefreshBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val deltaN = args.lift(1).map(_.toInt).getOrElse(10000)
    val groups = args.lift(2).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = graft.util.ExitScratch.register(
      java.nio.file.Files.createTempDirectory("graft-rollup-refresh").toString)
    val fact = s"$root/fact"
    val cacheRoot = s"$root/rollups"

    // wide-ish fact rows (a few payload columns beyond the dim/measure,
    // as real facts carry) so the fact-scan bill is honest
    def batch(from: Long, until: Long) = spark.range(from, until).select(
      (col("id") % groups).cast("string").as("k"),
      ((pmod(xxhash64(col("id")), lit(100000)) / 100.0) - 500.0).as("m"),
      xxhash64(col("id"), lit(1)).as("p1"),
      xxhash64(col("id"), lit(2)).as("p2"),
      md5(col("id").cast("string")).as("p3"))

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def dirBytes(dir: String): Long = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(dir)).map(_.length()).sum
    }

    batch(0, n).repartition(cpus.toInt).write.mode("overwrite").parquet(fact)
    val baseBytes = dirBytes(fact)

    def register() = graft.plans.RollupRegistry.register(spark, fact,
      dims = Seq("k"), measures = Seq("m"), cacheRoot = cacheRoot)

    // base build (the one-time cost both strategies amortize)
    val (e0, tBuild) = timed(register())
    require(graft.plans.RollupRegistry.lastBuildKind == "full")
    val cellsBytes = dirBytes(e0.rollupPath)

    // insert-only wave: new files only
    batch(n, n + deltaN).coalesce(1).write.mode("append").parquet(fact)
    val grownBytes = dirBytes(fact)
    val deltaBytes = grownBytes - baseBytes

    // 2. O(delta) merge (the r17 path)
    val (e1, tIncr) = timed(register())
    require(graft.plans.RollupRegistry.lastBuildKind == "incremental",
      s"expected the delta-merge path, got ${graft.plans.RollupRegistry.lastBuildKind}")

    // 1. forced full rebuild over the grown fact (the pre-r17 bill):
    // wipe the cache root so no delta base exists
    graft.plans.RollupRegistry.clear()
    def del(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(del)); f.delete()
    }
    del(new java.io.File(cacheRoot))
    val (e2, tFull) = timed(register())
    require(graft.plans.RollupRegistry.lastBuildKind == "full")

    // value-equality backstop: the two strategies must produce the same
    // cells (the spec pins this; the bench re-checks on its own data)
    val a = spark.read.parquet(e1.rollupPath).collect().map(_.toSeq).toSet
    val b = spark.read.parquet(e2.rollupPath).collect().map(_.toSeq).toSet
    require(a == b, "delta-merged cells drifted off the full rebuild")

    println(f"""{"metric":"rollup_refresh","n":$n,"delta":$deltaN""" +
      s""","groups":$groups""" +
      f""","full_build_sec":$tBuild%.2f,"incr_sec":$tIncr%.2f""" +
      f""","full_rebuild_sec":$tFull%.2f""" +
      s""","fact_bytes":$grownBytes,"delta_bytes":$deltaBytes""" +
      s""","cells_bytes":$cellsBytes}""")
    graft.plans.RollupRegistry.clear()
    spark.stop()
  }
}
