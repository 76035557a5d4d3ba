package graft.queries

import graft.QueryPack
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Full-text and hybrid retrieval — the keyword half of a vector store's
 * search surface (the reference only ships the embedding half,
 * /root/reference/src/Connectors.Memory.Merkon/MerkonMemoryStore.cs:117-150;
 * production deployments pair it with lexical BM25 and fuse the two rank
 * lists, which is exactly what `search_hybrid_rrf` does).
 *
 * Scale design:
 *  - `text_tfidf_topk` is the inverted-index build shape: explode →
 *    partial-agg (doc,term) counts → vocab-keyed equi-join for document
 *    frequencies (AQE broadcasts it when the vocab is small) → per-doc
 *    top-k window. No all-pairs work; both aggregations are map-side
 *    combinable.
 *  - `search_bm25_topk` keeps corpus statistics (N, avgdl, per-term df)
 *    as a ONE-ROW broadcast dimension — the scan side streams, scoring is
 *    codegen'd arithmetic, and the top-k is TakeOrderedAndProject
 *    (per-partition heads, never a global sort).
 *  - `search_hybrid_rrf` ranks ONLY the two already-limited top-k lists
 *    (k rows each), so the rank-assignment windows are driver-scale by
 *    construction; the expensive parts (BM25 scan, cosine scan) remain
 *    distributed top-k.
 *
 * Determinism: scores are IEEE doubles built with identical expression
 * shapes on both engines and rounded via round6; `ln` differs from
 * DuckDB's by at most 1 ulp (~1e-16 relative), far below the 1e-6
 * rounding grain — verified at all three SFs. All orderings tie-break on
 * the unique id.
 */
object SearchQueries extends QueryPack {

  /** The fixed keyword query used by the BM25/hybrid demos. */
  private val terms = Seq("join", "hash", "vector")

  /** The retrieval-eval query set: (query_id, terms), vocabulary drawn
    * from the corpus generator's own word list so every SF has hits. */
  private val evalQueries = Seq(
    (1, Seq("join", "hash", "vector")),
    (2, Seq("scan", "filter", "column")),
    (3, Seq("stream", "window", "merge")))

  private def toks: Column = col("toks")

  private def docs(s: SparkSession, dir: String): DataFrame =
    spread(t(s, dir, "documents"), "doc_id")
      .withColumn("toks", split(trim(col("text")), "\\s+"))

  /**
   * BM25 (k1=1.2, b=0.75) of the fixed query against every document.
   * Per-doc term frequencies are map-side HOF counts; corpus stats are a
   * single 1-row aggregate broadcast back in — the canonical "scan +
   * broadcast dim" shape that streams at any corpus size.
   */
  /** Per-doc tf columns + the 1-row corpus-stats dimension for an
    * arbitrary term set (the standing demo query or an eval query). */
  private def bm25Base(s: SparkSession, dir: String,
      qTerms: Seq[String]): (DataFrame, DataFrame) = {
    val base = docs(s, dir).select(
      col("doc_id") +: size(toks).as("dl") +:
        qTerms.map(tm => size(filter(toks, t => t === lit(tm))).as(s"tf_$tm")): _*)
    val statCols = count(lit(1)).as("n_docs") +: sum(col("dl").cast("long")).as("sum_dl") +:
      qTerms.map(tm => sum(when(col(s"tf_$tm") > 0, 1L).otherwise(0L)).as(s"df_$tm"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs").cast("double"))
    (base, stats)
  }

  /** BM25 (k1=1.2, b=0.75) term contribution over [[bm25Base]] columns. */
  private def termScore(tm: String): Column = {
    val tf = col(s"tf_$tm").cast("double")
    val df = col(s"df_$tm").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5)))
    idf * (tf * lit(2.2)) /
      (tf + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl").cast("double") / col("avgdl")))
  }

  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val (base, stats) = bm25Base(s, dir, terms)
    // Score only docs containing at least one query term — equivalent to
    // the bm25 > 0 cut (idf is strictly positive) but expressed on the
    // cheap integer tf columns, so Catalyst can't substitute the full
    // 3-ln score expression into a pushed-down filter and evaluate it
    // twice. The corpus-stats aggregate still sees every document.
    base.filter(terms.map(tm => col(s"tf_$tm") > 0).reduce(_ || _))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), round6(terms.map(termScore).reduce(_ + _)).as("bm25"))
      // post-rounding cut matching the oracle's `WHERE bm25 > 0.0`: at
      // very large corpora idf ≈ 0.5/N can round6 to exactly 0.0, and a
      // tf>0 doc with a zero ROUNDED score must drop on BOTH engines
      // (the filter is on the already-computed rounded column, not a
      // pushed-down re-evaluation of the 3-ln score)
      .filter(col("bm25") > 0.0)
  }

  /** The standing keyword query's corpus ranking — top-k (id, score) of
    * [[bm25Scored]]. Public: this is the static keyword channel
    * `graft.streaming.SearchStreams.hybridRrf` fuses per streamed query
    * (at scale it is a periodically refreshed artifact table, a few k
    * rows). */
  def bm25TopList(s: SparkSession, dir: String, k: Int): DataFrame =
    bm25Scored(s, dir)
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
      .select(col("doc_id").as("id"), col("bm25").as("score"))

  /** Top-k list → dense 1-based rank; the input is already `limit(k)`ed,
    * so the unpartitioned window runs over k rows, not the corpus. */
  private def ranked(topk: DataFrame, id: String, score: Column, rank: String): DataFrame =
    topk.withColumn(rank, row_number().over(Window.orderBy(score.desc, col(id))))
      .select(col(id).as("id"), col(rank))

  override def queries: Map[String, Q] = Map(
    // Inverted-index statistics: top-3 TF-IDF terms per document (the
    // keyword-extraction / index-weighting pass).
    "text_tfidf_topk" -> ((s, dir) => {
      val d = docs(s, dir)
      // The (doc, term) frequency table feeds BOTH the df aggregation and
      // the scoring join; materialize it once (at 100 TB this is the
      // persisted postings table an index job builds — localCheckpoint is
      // the single-job analog) instead of re-exploding the corpus twice.
      val tf = d.select(col("doc_id"), explode(toks).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = d.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dft, "term").crossJoin(broadcast(n))
        .withColumn("tfidf", round6(col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double"))))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // Lexical retrieval: BM25 top-20 for the fixed keyword query.
    "search_bm25_topk" -> ((s, dir) =>
      bm25Scored(s, dir)
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)),

    // Retrieval-quality evaluation — the regression harness a pipeline
    // runs on its retriever: nDCG@10 of the BM25 ranking per eval query,
    // against a DETERMINISTIC graded qrel derived from the data itself
    // (relevance = number of query terms with tf >= 2, "strong
    // presence"). Per query the candidate scan is the same scan +
    // 1-row-broadcast-stats shape as search_bm25_topk; DCG/IDCG reduce
    // the two 10-row top lists, so the eval adds only driver-scale work
    // on top of the rankings it grades. Gains 2^rel - 1, log2 discount.
    "search_eval_ndcg" -> ((s, dir) => {
      val perQuery = evalQueries.map { case (qid, qt) =>
        val (base, stats) = bm25Base(s, dir, qt)
        val rel = qt.map(tm =>
          when(col(s"tf_$tm") >= 2, 1).otherwise(0)).reduce(_ + _)
        val scored = base
          .filter(qt.map(tm => col(s"tf_$tm") > 0).reduce(_ || _))
          .crossJoin(broadcast(stats))
          .select(col("doc_id"), rel.as("rel"),
            round6(qt.map(termScore).reduce(_ + _)).as("bm25"))
          .filter(col("bm25") > 0.0)
        def dcgOf(top: DataFrame, ord: Column*): DataFrame = top
          .withColumn("pos", row_number().over(Window.orderBy(ord: _*)))
          .agg(sum((pow(lit(2.0), col("rel")) - 1.0) /
            log2(col("pos").cast("double") + 1.0)).as("g"))
        val dcg = dcgOf(scored.orderBy(col("bm25").desc, col("doc_id")).limit(10),
          col("bm25").desc, col("doc_id"))
        val idcg = dcgOf(scored.orderBy(col("rel").desc, col("doc_id")).limit(10),
          col("rel").desc, col("doc_id"))
        dcg.select(col("g").as("dcg10"))
          .crossJoin(idcg.select(col("g").as("idcg10")))
          .select(lit(qid).as("query_id"),
            round6(col("dcg10")).as("dcg10"),
            round6(col("idcg10")).as("idcg10"),
            round6(col("dcg10") / col("idcg10")).as("ndcg10"))
      }
      perQuery.reduce(_ unionByName _).orderBy(col("query_id"))
    }),

    // The rank-position half of retrieval eval, next to search_eval_ndcg's
    // graded-gain half: MRR (how fast does the FIRST relevant doc
    // appear), recall@10 (what fraction of all relevant docs the cutoff
    // keeps) and precision@10 — the triple an embedding/BM25 A/B gate
    // reports. Same per-query shape as nDCG: corpus stats are a 1-row
    // broadcast, the ranking window orders only bm25-positive docs, and
    // the three metrics are one aggregate over the ranked frame. All
    // ratios are exact-integer / round6, bit-identical cross-engine.
    "search_eval_mrr" -> ((s, dir) => {
      val perQuery = evalQueries.map { case (qid, qt) =>
        val (base, stats) = bm25Base(s, dir, qt)
        val rel = qt.map(tm =>
          when(col(s"tf_$tm") >= 2, 1).otherwise(0)).reduce(_ + _)
        val scored = base
          .filter(qt.map(tm => col(s"tf_$tm") > 0).reduce(_ || _))
          .crossJoin(broadcast(stats))
          .select(col("doc_id"), rel.as("rel"),
            round6(qt.map(termScore).reduce(_ + _)).as("bm25"))
          .filter(col("bm25") > 0.0)
        val ranked = scored.withColumn("pos", row_number()
          .over(Window.orderBy(col("bm25").desc, col("doc_id"))))
        ranked.agg(
            coalesce(min(when(col("rel") >= 1, col("pos"))), lit(0))
              .as("first_pos"),
            sum((col("rel") >= 1).cast("long")).as("n_rel"),
            sum((col("rel") >= 1 && col("pos") <= 10).cast("long"))
              .as("rel_top10"))
          .select(lit(qid).as("query_id"),
            round6(when(col("first_pos") === 0, lit(0.0))
              .otherwise(lit(1.0) / col("first_pos"))).as("rr"),
            round6(col("rel_top10") / col("n_rel")).as("recall10"),
            round6(col("rel_top10") / lit(10.0)).as("precision10"))
      }
      perQuery.reduce(_ unionByName _).orderBy(col("query_id"))
    }),

    // Hybrid retrieval: reciprocal-rank fusion (k=60) of the BM25 top-50
    // and the exact-cosine top-50 (query vector = vec_id 0, ids aligned
    // doc_id == vec_id). A hit missing from one list contributes 0 from
    // that list — standard RRF.
    "search_hybrid_rrf" -> ((s, dir) => {
      val kw = ranked(
        bm25Scored(s, dir)
          .orderBy(col("bm25").desc, col("doc_id")).limit(50),
        "doc_id", col("bm25"), "r_kw")
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val vec = ranked(
        emb.crossJoin(broadcast(q))
          .select(col("vec_id"), round6(cosineSim(col("embedding"), col("q_emb"))).as("cos"))
          .orderBy(col("cos").desc, col("vec_id")).limit(50),
        "vec_id", col("cos"), "r_vec")
      kw.join(vec, Seq("id"), "full_outer")
        .select(col("id"), round6(
          coalesce(lit(1.0) / (lit(60.0) + col("r_kw").cast("double")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60.0) + col("r_vec").cast("double")), lit(0.0))).as("rrf"))
        .orderBy(col("rrf").desc, col("id"))
        .limit(20)
    }),

    // The STREAMING hybrid operator run in its batch form (unified API):
    // graft.streaming.SearchStreams.hybridRrf answers each query on a
    // query stream with RRF of its exact-cosine top-50 and the standing
    // BM25 top-50 — one stateful aggregation carrying both channel lists
    // (null-skipping conditional TopK), fusion as stateless array HOFs.
    // Oracle-checked against the same fused ranking the batch hybrid
    // derives, which pins the streaming plan's semantics to SQL.
    "search_hybrid_rrf_stream" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      graft.streaming.SearchStreams.hybridRrf(
          q, emb, bm25TopList(s, dir, 50), "vec_id", "embedding",
          k = 50, topN = 20)
        .orderBy(col("rank"))
    }),

    // Phrase query via POSITIONAL postings — the operator that separates
    // a real inverted index from a bag-of-words one: one posexplode pass
    // builds (doc, term, pos) rows pre-filtered to the phrase's terms
    // (at 100 TB this is a pruned read of the persisted positional
    // postings table, keyed by term), and the phrase match is an
    // equi-join on (doc_id, pos+1) between the two terms' posting lists
    // — adjacency checked by arithmetic on posting keys, never by
    // rescanning text. Multi-word phrases chain one join per extra term.
    "search_phrase_match" -> ((s, dir) => {
      val phrase = Seq("stream", "data")
      val pos = docs(s, dir)
        .select(col("doc_id"), posexplode(toks).as(Seq("pos", "term")))
        .filter(col("term").isin(phrase: _*))
        .localCheckpoint() // feeds both sides of the adjacency self-join
      val p1 = pos.filter(col("term") === phrase(0))
        .select(col("doc_id"), col("pos"))
      val p2 = pos.filter(col("term") === phrase(1))
        .select(col("doc_id").as("d2"), (col("pos") - 1).as("pos2"))
      p1.join(p2, col("doc_id") === col("d2") && col("pos") === col("pos2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_occurrences"))
        .orderBy(col("doc_id"))
    })
  )

  // ---- oracle SQL ----------------------------------------------------

  private val round6 = graft.QueryPack.round6Sql _

  /** DuckDB replica of [[bm25Scored]] as CTEs ending in `bmscored`. */
  private val bm25Cte: String = {
    val tfCols = terms.map(tm =>
      s"len(list_filter(tk, t -> t = '$tm')) AS tf_$tm").mkString(",\n    ")
    val dfCols = terms.map(tm =>
      s"sum(CASE WHEN tf_$tm > 0 THEN 1 ELSE 0 END) AS df_$tm").mkString(",\n    ")
    val score = terms.map { tm =>
      val tf = s"CAST(tf_$tm AS DOUBLE)"
      val df = s"CAST(df_$tm AS DOUBLE)"
      val idf = s"ln(1.0 + (CAST(n_docs AS DOUBLE) - $df + 0.5) / ($df + 0.5))"
      s"$idf * ($tf * 2.2) / ($tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT doc_id, len(tk) AS dl,
       |    $tfCols
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents)
       |), stats0 AS (
       |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
       |    $dfCols
       |  FROM base
       |), stats AS (
       |  SELECT *, CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl FROM stats0
       |), bmscored AS (
       |  SELECT doc_id, ${round6(score)} AS bm25 FROM base, stats
       |)""".stripMargin
  }

  /** DuckDB replica of one `search_eval_ndcg` query's CTE chain (no
    * leading WITH; chains share the `tk_src` token CTE). */
  /** Shared eval prefix: per-doc tf/rel/bm25 CTEs down to `scpos_<qid>`
    * (scored docs with bm25 > 0), consumed by both the nDCG and the
    * MRR/recall oracle chains. */
  private def evalScoredCte(qid: Int, qt: Seq[String]): String = {
    val tfCols = qt.map(tm =>
      s"len(list_filter(tk, t -> t = '$tm')) AS tf_$tm").mkString(", ")
    val dfCols = qt.map(tm =>
      s"sum(CASE WHEN tf_$tm > 0 THEN 1 ELSE 0 END) AS df_$tm").mkString(", ")
    val score = qt.map { tm =>
      val tf = s"CAST(tf_$tm AS DOUBLE)"
      val df = s"CAST(df_$tm AS DOUBLE)"
      val idf = s"ln(1.0 + (CAST(n_docs AS DOUBLE) - $df + 0.5) / ($df + 0.5))"
      s"$idf * ($tf * 2.2) / ($tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))"
    }.mkString(" + ")
    val rel = qt.map(tm => s"CASE WHEN tf_$tm >= 2 THEN 1 ELSE 0 END").mkString(" + ")
    val anyTf = qt.map(tm => s"tf_$tm > 0").mkString(" OR ")
    s"""base_$qid AS (
       |  SELECT doc_id, len(tk) AS dl, $tfCols FROM tk_src
       |), stats0_$qid AS (
       |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl, $dfCols FROM base_$qid
       |), stats_$qid AS (
       |  SELECT *, CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
       |  FROM stats0_$qid
       |), sc_$qid AS (
       |  SELECT doc_id, $rel AS rel, ${round6(score)} AS bm25
       |  FROM base_$qid, stats_$qid WHERE $anyTf
       |), scpos_$qid AS (SELECT * FROM sc_$qid WHERE bm25 > 0.0)""".stripMargin
  }

  private def evalNdcgCte(qid: Int, qt: Seq[String]): String = {
    val gain = "sum((pow(2.0, rel) - 1.0) / log2(CAST(pos AS DOUBLE) + 1.0))"
    s"""${evalScoredCte(qid, qt)},
       |top_$qid AS (
       |  SELECT rel, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS pos
       |  FROM scpos_$qid ORDER BY bm25 DESC, doc_id LIMIT 10
       |), ideal_$qid AS (
       |  SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS pos
       |  FROM scpos_$qid ORDER BY rel DESC, doc_id LIMIT 10
       |), dcg_$qid AS (SELECT $gain AS dcg10 FROM top_$qid),
       |idcg_$qid AS (SELECT $gain AS idcg10 FROM ideal_$qid)""".stripMargin
  }

  private def evalMrrCte(qid: Int, qt: Seq[String]): String =
    s"""${evalScoredCte(qid, qt)},
       |ranked_$qid AS (
       |  SELECT rel, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS pos
       |  FROM scpos_$qid
       |), agg_$qid AS (
       |  SELECT
       |    coalesce(min(CASE WHEN rel >= 1 THEN pos END), 0) AS first_pos,
       |    sum(CASE WHEN rel >= 1 THEN 1 ELSE 0 END) AS n_rel,
       |    sum(CASE WHEN rel >= 1 AND pos <= 10 THEN 1 ELSE 0 END) AS rel_top10
       |  FROM ranked_$qid
       |)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "search_eval_ndcg" -> {
      val chains = evalQueries.map { case (qid, qt) => evalNdcgCte(qid, qt) }
      val selects = evalQueries.map { case (qid, _) =>
        s"""SELECT $qid AS query_id, ${round6("dcg10")} AS dcg10,
           |  ${round6("idcg10")} AS idcg10, ${round6("dcg10 / idcg10")} AS ndcg10
           |FROM dcg_$qid, idcg_$qid""".stripMargin
      }
      s"""WITH tk_src AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents
         |), ${chains.mkString(",\n")}
         |${selects.mkString("\nUNION ALL\n")}
         |ORDER BY query_id""".stripMargin
    },
    "search_eval_mrr" -> {
      val chains = evalQueries.map { case (qid, qt) => evalMrrCte(qid, qt) }
      val selects = evalQueries.map { case (qid, _) =>
        s"""SELECT $qid AS query_id,
           |  ${round6("CASE WHEN first_pos = 0 THEN 0.0 ELSE 1.0 / first_pos END")} AS rr,
           |  ${round6("rel_top10 / n_rel")} AS recall10,
           |  ${round6("rel_top10 / 10.0")} AS precision10
           |FROM agg_$qid""".stripMargin
      }
      s"""WITH tk_src AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents
         |), ${chains.mkString(",\n")}
         |${selects.mkString("\nUNION ALL\n")}
         |ORDER BY query_id""".stripMargin
    },
    "text_tfidf_topk" ->
      s"""WITH ex AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
         |  FROM documents
         |), tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM ex
         |  WHERE length(term) > 0 GROUP BY doc_id, term
         |), dft AS (
         |  SELECT term, count(*) AS df FROM tf GROUP BY term
         |), n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, term,
         |    ${round6("CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))")} AS tfidf
         |  FROM tf JOIN dft USING (term), n
         |), ranked AS (
         |  SELECT doc_id, term, tfidf,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
         |  FROM scored
         |)
         |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tfidf FROM ranked
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "search_bm25_topk" ->
      s"""$bm25Cte
         |SELECT doc_id, bm25 FROM bmscored WHERE bm25 > 0.0
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "search_hybrid_rrf" ->
      s"""$bm25Cte, kw AS (
         |  SELECT doc_id, bm25 FROM bmscored WHERE bm25 > 0.0
         |  ORDER BY bm25 DESC, doc_id LIMIT 50
         |), kwr AS (
         |  SELECT doc_id AS id,
         |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS r_kw
         |  FROM kw
         |), cosd AS (
         |  SELECT vec_id, ${round6("list_cosine_similarity(CAST(embedding AS DOUBLE[]), " +
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0))")} AS cos
         |  FROM embeddings
         |), vec AS (
         |  SELECT vec_id, cos FROM cosd ORDER BY cos DESC, vec_id LIMIT 50
         |), vecr AS (
         |  SELECT vec_id AS id,
         |    CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INTEGER) AS r_vec
         |  FROM vec
         |)
         |SELECT id, ${round6("coalesce(1.0 / (60.0 + CAST(r_kw AS DOUBLE)), 0.0) + " +
            "coalesce(1.0 / (60.0 + CAST(r_vec AS DOUBLE)), 0.0)")} AS rrf
         |FROM kwr FULL OUTER JOIN vecr USING (id)
         |ORDER BY rrf DESC, id LIMIT 20""".stripMargin,
    // identical fused ranking, surfaced per-query with an explicit rank —
    // the streaming operator's contract
    "search_hybrid_rrf_stream" ->
      s"""$bm25Cte, kw AS (
         |  SELECT doc_id, bm25 FROM bmscored WHERE bm25 > 0.0
         |  ORDER BY bm25 DESC, doc_id LIMIT 50
         |), kwr AS (
         |  SELECT doc_id AS id,
         |    CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS r_kw
         |  FROM kw
         |), cosd AS (
         |  SELECT vec_id, ${round6("list_cosine_similarity(CAST(embedding AS DOUBLE[]), " +
            "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0))")} AS cos
         |  FROM embeddings
         |), vec AS (
         |  SELECT vec_id, cos FROM cosd ORDER BY cos DESC, vec_id LIMIT 50
         |), vecr AS (
         |  SELECT vec_id AS id,
         |    CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS INTEGER) AS r_vec
         |  FROM vec
         |), fused AS (
         |  SELECT id, ${round6("coalesce(1.0 / (60.0 + CAST(r_kw AS DOUBLE)), 0.0) + " +
            "coalesce(1.0 / (60.0 + CAST(r_vec AS DOUBLE)), 0.0)")} AS rrf
         |  FROM kwr FULL OUTER JOIN vecr USING (id)
         |  ORDER BY rrf DESC, id LIMIT 20
         |)
         |SELECT CAST(0 AS BIGINT) AS q_id,
         |  CAST(row_number() OVER (ORDER BY rrf DESC, id) AS INTEGER) AS rank,
         |  id, rrf
         |FROM fused ORDER BY rank""".stripMargin,
    "search_phrase_match" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(list_filter(range(1, len(toks)),
        |    i -> toks[i] = 'stream' AND toks[i + 1] = 'data')) AS BIGINT)
        |    AS n_occurrences
        |FROM tok
        |WHERE len(list_filter(range(1, len(toks)),
        |    i -> toks[i] = 'stream' AND toks[i + 1] = 'data')) > 0
        |ORDER BY doc_id""".stripMargin
  )
}
