package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

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
}
