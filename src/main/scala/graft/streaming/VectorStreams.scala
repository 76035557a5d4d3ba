package graft.streaming

import graft.functions.TopKByScore
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A query vector arriving on the search stream. */
case class QueryVec(q_id: Long, q_emb: Seq[Float])

/**
 * Streaming forms of the vector-search surface: the reference's flagship
 * `GetNearestMatchesAsync` (exact cosine top-k,
 * /root/reference/src/Connectors.Memory.Merkon/MerkonMemoryStore.cs:117-150)
 * as a STANDING query — every query vector arriving on a stream is
 * answered against the corpus continuously, the "semantic search as a
 * service" shape a vector store runs in production.
 */
object VectorStreams {

  /**
   * Continuous exact kNN: stream-static join of the query stream against
   * the (static) corpus, scored with the codegen'd cosine kernel and
   * reduced per query by the bounded partial-agg top-k — identical
   * semantics to the batch `knn_join`, and the SAME call works on a batch
   * frame (unified API; parity pinned by VectorStreamsSpec).
   *
   * Scale shape: the corpus side is the big one, but it is STATIC — each
   * micro-batch joins |batch queries| × corpus with the corpus scan
   * distributed as usual, and only partitions × |Q| × k candidate rows
   * cross the shuffle (TopKByScore partial aggregation). Aggregation
   * state is keyed by q_id: each query id occurs in one micro-batch, so
   * in update mode every query emits its final top-k as soon as its
   * batch completes; bound long-running state by expiring answered query
   * ids upstream (watermark on a query timestamp) — the corpus itself
   * contributes NO streaming state.
   */
  def continuousKnn(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val scored = queries
      .join(corpus.select(col(idCol).as("_n_id"), col(embCol).as("_n_emb")))
      .select(col("q_id"),
        cosineSim(col("q_emb"), col("_n_emb")).as("cos"), col("_n_id"))
    scored.groupBy(col("q_id"))
      .agg(TopKByScore(k)(col("cos"), col("_n_id")).as("hits"))
      .select(col("q_id"), posexplode(col("hits")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("neighbor_id"), col("col.score").as("cos"))
  }
}
