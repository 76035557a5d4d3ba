package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"==== $name ====")
      println(SparkEntry.queries(name)(s, dir).queryExecution.executedPlan.toString.take(4000))
    }
    s.stop()
  }
}
