package graft.streaming

import graft.SparkTestBase
import graft.queries.SearchQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The streaming hybrid (BM25 ⊕ cosine RRF) must answer a streamed query
  * vector exactly like its batch form, across micro-batch boundaries,
  * and the batch form must agree with the registered batch hybrid. */
class SearchStreamsSpec extends AnyFunSuite with SparkTestBase {

  private def corpus = spark.read.parquet(s"$sf0_001/embeddings.parquet")

  private def queryVecs(ids: Long*): Seq[QueryVec] =
    corpus.filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => QueryVec(r.getLong(0), r.getSeq[Float](1)))

  test("hybridRrf: streamed == batch across micro-batches; q0 matches the batch hybrid") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val kw = SearchQueries.bm25TopList(spark, sf0_001, 50).localCheckpoint()
    val qs = queryVecs(0L, 5L, 9L)

    val input = MemoryStream[QueryVec]
    val q = SearchStreams.hybridRrf(input.toDF(), corpus, kw,
        "vec_id", "embedding", k = 50, topN = 20)
      .writeStream.format("memory").queryName("hyb_stream")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(qs.take(1): _*)
      q.processAllAvailable()
      input.addData(qs.drop(1): _*) // later micro-batch, same standing query
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hyb_stream")
      .select("q_id", "rank", "id", "rrf").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

    val batch = SearchStreams.hybridRrf(qs.toDF(), corpus, kw,
        "vec_id", "embedding", k = 50, topN = 20)
      .select("q_id", "rank", "id", "rrf").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

    assert(batch.size == 60 && streamed == batch)

    // q0's fused list equals the registered batch hybrid's (id, rrf) list
    val q0 = streamed.filter(_._1 == 0L).map(t => (t._3, t._4))
    val reference = SearchQueries.queries("search_hybrid_rrf")(spark, sf0_001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(q0 == reference)
  }
}
