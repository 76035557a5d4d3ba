package graft.streaming

import graft.functions.TopKByScore
import graft.functions.VectorFunctions.{cosineSim, l2Norm}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Streaming hybrid retrieval: every query vector arriving on the stream
 * is answered with a reciprocal-rank fusion of
 *  - its semantic channel (exact cosine top-k against the static corpus
 *    — the standing-search shape of [[VectorStreams.continuousKnn]]), and
 *  - the lexical channel (the standing keyword query's BM25 top-k corpus
 *    ranking, a tiny static artifact —
 *    `graft.queries.SearchQueries.bm25TopList`).
 *
 * The structural constraint this is built around: a streaming plan
 * allows ONE stateful aggregation — no per-channel rank windows, no
 * join-after-aggregation. So both channels' candidates are produced
 * STATELESSLY (stream-static joins tagged with a channel column), the
 * single grouped aggregation reduces both lists at once via the
 * null-skipping conditional TopK (`when(channel === x, score)`), and the
 * RRF fusion itself runs as stateless array HOFs over the two k-row
 * lists after the aggregation. The SAME call works on a batch frame
 * (unified API) — which is how the driver oracle-checks it:
 * `search_hybrid_rrf_stream` reuses the `search_hybrid_rrf` oracle.
 *
 * Scale shape: the corpus side contributes no streaming state; per
 * micro-batch it is the standing exact-kNN scan plus a broadcast of the
 * k-row keyword list, and only partitions × |Q| × k candidates cross the
 * shuffle (TopKByScore partial aggregation).
 */
object SearchStreams {

  /** RRF of two per-query top-k hit lists held in array columns —
    * stateless HOF math over 2k-element arrays (safe after the one
    * streaming aggregation). A doc missing from one list contributes 0
    * from that list; the fused score is round6-ed BEFORE sorting (the
    * batch hybrid and its oracle order by the rounded value, so near-tie
    * ordering must see the same grain); ties break by id ascending. */
  private def fuse(vecHits: Column, kwHits: Column, rrfK: Int, topN: Int): Column = {
    val vecIds = transform(vecHits, h => h.getField("id"))
    val kwIds = transform(kwHits, h => h.getField("id"))
    def side(ids: Column, id: Column): Column = {
      val pos = array_position(ids, id)
      when(pos > 0, lit(1.0) / (lit(rrfK.toDouble) + pos.cast("double")))
        .otherwise(lit(0.0))
    }
    val scored = transform(array_union(vecIds, kwIds),
      id => struct(graft.QueryPack.round6(side(vecIds, id) + side(kwIds, id))
        .as("rrf"), id.as("id")))
    val sorted = array_sort(scored, (l, r) =>
      when(l.getField("rrf") > r.getField("rrf"), -1)
        .when(l.getField("rrf") < r.getField("rrf"), 1)
        .when(l.getField("id") < r.getField("id"), -1)
        .otherwise(1))
    slice(sorted, 1, topN)
  }

  /**
   * @param queries  streaming (or batch) frame with `q_id`, `q_emb`
   * @param corpus   static corpus with `idCol` + `embCol`
   * @param kwList   static keyword ranking (id, score), already top-k
   * @param k        per-channel list length fed into the fusion
   * @param topN     fused rows returned per query
   * @return (q_id, rank, id, rrf) — `rrf` rounded to 6 dp like the batch
   *         hybrid query
   */
  def hybridRrf(queries: DataFrame, corpus: DataFrame, kwList: DataFrame,
      idCol: String, embCol: String, k: Int, topN: Int = 20,
      rrfK: Int = 60): DataFrame = {
    val corp = corpus.filter(l2Norm(col(embCol)) > 0)
      .select(col(idCol).as("id"), col(embCol).as("emb"))
    val q = queries.select(col("q_id"), col("q_emb"))
    // semantic channel: stateless stream-static scoring (exact, same
    // candidate rule as the batch hybrid's cosine top-k — scored on the
    // ROUNDED cosine so near-tie selection matches the oracle exactly)
    val vecCand = q.join(corp)
      .select(col("q_id"), col("id"),
        graft.QueryPack.round6(cosineSim(col("q_emb"), col("emb")))
          .as("score"), lit("vec").as("ch"))
    // lexical channel: the static k-row keyword ranking replicated per
    // query (broadcast — it is k rows by construction)
    val kwCand = q.select(col("q_id")).withColumn("one", lit(1))
      .join(broadcast(kwList.select(col("id"), col("score")).withColumn("one", lit(1))), "one")
      .select(col("q_id"), col("id"), col("score"), lit("kw").as("ch"))
    val one = vecCand.unionByName(kwCand)
      .groupBy(col("q_id"))
      .agg(
        TopKByScore.nullSkipping(k)(
          when(col("ch") === "vec", col("score")), col("id")).as("vec_hits"),
        TopKByScore.nullSkipping(k)(
          when(col("ch") === "kw", col("score")), col("id")).as("kw_hits"))
    one
      .select(col("q_id"),
        posexplode(fuse(col("vec_hits"), col("kw_hits"), rrfK, topN)))
      .select(col("q_id"), (col("pos") + 1).as("rank"), col("col.id").as("id"),
        col("col.rrf").as("rrf"))
  }
}
