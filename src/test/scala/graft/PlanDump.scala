package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to plans/<tag>/<name>_<suffix>.txt
  * — the optimization-round evidence files (judge checks plan claims
  * against these). Usage:
  *   Test/runMain graft.PlanDump <tag>/<suffix> <query> [query...]
  * Session mirrors graft.Verify (same master/conf envs) so the dumped
  * plan is the one the driver's run would execute.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tagSuffix = args.head
    val names = args.tail.toSeq
    val Array(tag, suffix) = tagSuffix.split('/')
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = new java.io.File(s"plans/$tag")
    outDir.mkdirs()
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        new java.io.File(outDir, s"${name}_$suffix.txt").toPath,
        txt.getBytes("UTF-8"))
      println(s"dumped $name -> plans/$tag/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
