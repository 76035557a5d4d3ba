package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM. */
trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.session
  def sf0_001 = "/root/testdata/sf0.001"
  def sf0_01 = "/root/testdata/sf0.01"

  /** A temp directory registered for deletion at JVM exit: every spec
    * scratch path goes through here so repeated `sbt test` runs do not
    * accumulate litter in the shared tmpdir (the same no-litter
    * discipline the query surface follows — delete-after-pin there,
    * delete-at-exit here, where results are asserted before the JVM
    * ends by construction). */
  def scratchDir(tag: String): String =
    SparkTestBase.registerScratch(
      java.nio.file.Files.createTempDirectory(tag).toString)
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val scratch = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    scratch.forEach(p => deleteRecursively(new java.io.File(p)))))

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  private[graft] def registerScratch(path: String): String = {
    scratch.add(path)
    path
  }
}
