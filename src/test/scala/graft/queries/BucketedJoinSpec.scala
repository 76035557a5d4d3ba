package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bucketing discipline: two fact tables bucketed on the same join key
 * join WITHOUT any shuffle exchange — the co-located join that turns a
 * repeated 100 TB join from a cluster-wide shuffle into a local merge.
 * Verified in the executed physical plan, not assumed.
 */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  test("joining two tables bucketed on the key produces zero exchanges") {
    val emb = spark.read.parquet(s"$sf0_001/embeddings.parquet")
    emb.select(col("vec_id"), col("label")).write.mode("overwrite")
      .bucketBy(4, "vec_id").sortBy("vec_id").saveAsTable("graft_bucketed_a")
    emb.select(col("vec_id"), col("embedding")).write.mode("overwrite")
      .bucketBy(4, "vec_id").sortBy("vec_id").saveAsTable("graft_bucketed_b")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val j = spark.table("graft_bucketed_a")
        .join(spark.table("graft_bucketed_b"), "vec_id")
      // collect() executes THIS plan (count() would plan a different
      // query), so the adaptive plan below is the final executed one
      assert(j.collect().length == emb.count())
      val plan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffled:\n${exchanges.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_b")
    }
  }
}
