package graft.queries

import graft.QueryPack
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's flagship query surface: exact cosine kNN
 * (`GetNearestMatchesAsync`, /root/reference/src/Connectors.Memory.Merkon/
 * MerkonMemoryStore.cs:117-150) re-expressed as declarative DataFrame plans.
 *
 * Scale design: the query vector is a one-row dimension table joined in with
 * an explicit `broadcast()` (never `collect()`), so the scan side streams —
 * at 100 TB the plan is scan → codegen'd score → TakeOrderedAndProject
 * (per-partition top-k, only k rows per partition reach the driver). Catalyst
 * rewrites orderBy+limit to exactly that; no full sort, no full shuffle.
 *
 * Determinism: scores rounded to 6 dp on both engines, ties broken by vec_id
 * (the reference tie-breaks by insertion order, MerkonMemoryStore.cs:146 —
 * not reproducible across partitions, so we pin a total order; SURVEY §7.3).
 */
object VectorQueries extends QueryPack {

  /** Scan side joined with the single-row query-vector dim table. */
  private def scored(s: SparkSession, dir: String, queryId: Long): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === queryId).select(col("embedding").as("q_emb"))
    emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round6(cosineSim(col("embedding"), col("q_emb"))).as("score"))
  }

  private def oracleScored(queryId: Long): String = {
    val cos = "list_cosine_similarity(CAST(embedding AS DOUBLE[]), " +
      s"(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = $queryId))"
    s"""SELECT vec_id, ${graft.QueryPack.round6Sql(cos)} AS score
       |FROM embeddings""".stripMargin
  }

  override def queries: Map[String, Q] = Map(
    // B8: top-k by cosine with min-score filter (>= semantics per
    // MerkonMemoryStore.cs:138; default minRelevanceScore=0 per :121).
    "knn_topk" -> ((s, dir) =>
      scored(s, dir, 0)
        .filter(col("score") >= 0.0)
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5)),

    // B9: top-1 (GetNearestMatchAsync = B8 with limit 1).
    "knn_top1" -> ((s, dir) =>
      scored(s, dir, 7)
        .filter(col("score") >= 0.0)
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(1)),

    // B8 threshold-only variant: all rows above a relevance floor, no limit.
    "knn_threshold" -> ((s, dir) =>
      scored(s, dir, 3)
        .filter(col("score") >= 0.2)
        .orderBy(col("score").desc, col("vec_id").asc)),

    // Metadata-FILTERED kNN — the vector-store staple the reference's
    // flagship lacks (search within a tenant/category/date slice). Exact
    // form: the predicate is a plain pushed filter on the scan, applied
    // BEFORE scoring, so the plan is filtered-scan → codegen'd score →
    // TakeOrderedAndProject — at 100 TB the predicate prunes parquet row
    // groups before a single dot product runs. The approximate analog is
    // `ann_ivf_filtered_knn` (same pre-filter semantics on the IVF probe).
    "knn_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 5).select(col("embedding").as("q_emb"))
      emb.filter(col("label") % 4 === 1)
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("label"),
          round6(cosineSim(col("embedding"), col("q_emb"))).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5)
    }),

    // §2.C complete kernel surface: dot / l2_distance / l2_norm alongside
    // cosine, oracle-checked per row (these back the SQL functions
    // registered by GraftExtensions).
    "vector_kernels" -> ((s, dir) => {
      import graft.functions.VectorFunctions._
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 11).select(col("embedding").as("q_emb"))
      emb.crossJoin(broadcast(q))
        .select(col("vec_id"),
          round6(dotProduct(col("embedding"), col("q_emb"))).as("dot"),
          round6(l2Distance(col("embedding"), col("q_emb"))).as("l2_dist"),
          round6(l2Norm(col("embedding"))).as("norm"),
          round6(cosineSim(col("embedding"), col("q_emb"))).as("cos"))
        .filter(col("vec_id") < 100)
        .orderBy(col("vec_id"))
    }),

    // Scalar int8 quantization — the embedding-compression step a 100 TB
    // vector store runs before indexing (4x smaller, dot products in
    // int8). Per-vector symmetric scale (127/max|x|), round-half-up,
    // clamp; emits the quantized checksum and the max reconstruction
    // error. All codegen'd HOFs over materialized columns (each array is
    // computed once per row, not once per lambda element).
    "embedding_quantize_int8" -> ((s, dir) => {
      val prep = t(s, dir, "embeddings")
        .withColumn("emb_d", transform(col("embedding"), x => x.cast("double")))
        .withColumn("maxabs", array_max(transform(col("emb_d"), x => abs(x))))
        .filter(col("maxabs") > 0)
        .withColumn("scale", lit(127.0) / col("maxabs"))
        .withColumn("q", transform(col("emb_d"),
          x => greatest(lit(-127.0), least(lit(127.0), floor(x * col("scale") + 0.5)))))
      prep.select(col("vec_id"),
          round6(col("maxabs")).as("max_abs"),
          aggregate(col("q"), lit(0.0), (acc, x) => acc + x).cast("long").as("q_sum"),
          round6(array_max(zip_with(col("emb_d"), col("q"),
            (a, b) => abs(a - b / col("scale"))))).as("max_err"))
        .orderBy(col("vec_id"))
    }),

    // Binary-quantized Hamming shortlist + exact re-rank — the 1-bit
    // companion to `embedding_quantize_int8` and the fifth ANN family
    // (after LSH/IVF/PQ/IVF-PQ), with one property the other four lack:
    // the sign-bit sketch is DETERMINISTIC from the input floats, so the
    // whole shortlist→re-rank pipeline is exactly reproducible by the
    // DuckDB oracle (hash-checked, not merely recall-bounded).
    //
    // Scale shape (all in `ml/SignIndex`, persisted via the IndexCache
    // index-job discipline like the other four families): the shortlist
    // scan streams the PERSISTED 16-byte/row signature table (vec_id +
    // packed word — a 32× byte reduction vs the float32 embedding
    // column, which never appears in that scan's ReadSchema); distance
    // is codegen'd `bit_count(packed ^ q_packed)` against an 8-row
    // broadcast query dim; the per-query top-S survives as a bounded
    // TopKByScore partial agg, so only S × nPartitions candidate rows
    // per query ever cross the shuffle. Only the S×|Q| shortlist rows
    // (320 here) fetch their full embeddings for the exact re-rank,
    // through a (bucket, id) join against the bucket-PARTITIONED fetch
    // table that the broadcast shortlist dynamic-partition-prunes — no
    // full-corpus embedding scan rides the re-rank side (plan pinned by
    // SignRerankSpec). Final ranking rounds BEFORE ranking so near-tied
    // scores order identically to the DuckDB oracle.
    "knn_binary_rerank" -> ((s, dir) => {
      import graft.functions.VectorFunctions
      import org.apache.spark.sql.expressions.Window
      val (nq, shortK, k) = (8, 40, 10)
      val built = graft.ml.SignIndex.openOrBuild(s, s"$dir/embeddings.parquet",
        "vec_id", "embedding")
      val q = t(s, dir, "embeddings").filter(col("vec_id") < nq)
        .select(col("vec_id").as("q_id"),
          VectorFunctions.signPack(col("embedding")).as("q_packed"),
          col("embedding").as("q_emb"))
      val scored = graft.ml.SignIndex.scoredShortlist(built, q, shortK)
        .withColumn("score", round6(col("cos")))
      val byScore = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("id"))
      scored.withColumn("rk", row_number().over(byScore)).filter(col("rk") <= k)
        .select(col("q_id").as("qid"), col("id").as("vec_id"),
          col("hamming"), col("score"))
        .orderBy(col("qid"), col("score").desc, col("vec_id"))
    }),

    // The same flagship kNN expressed through the SQL surface (the
    // session extension / register() path) — proves the library is usable
    // from pure SQL, not just the Scala DSL.
    "knn_topk_sql" -> ((s, dir) => {
      graft.functions.VectorFunctions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("graft_embeddings")
      s.sql("""
        WITH q AS (SELECT embedding AS q_emb FROM graft_embeddings WHERE vec_id = 0),
        scored AS (
          SELECT vec_id,
            floor(cosine_similarity(embedding, q_emb) * 1e6 + 0.5) / 1e6 AS score
          FROM graft_embeddings CROSS JOIN q
        )
        SELECT vec_id, score FROM scored WHERE score >= 0.0
        ORDER BY score DESC, vec_id LIMIT 5""")
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "knn_topk" ->
      s"""WITH scored AS (${oracleScored(0)})
         |SELECT vec_id, score FROM scored WHERE score >= 0.0
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin,
    "knn_top1" ->
      s"""WITH scored AS (${oracleScored(7)})
         |SELECT vec_id, score FROM scored WHERE score >= 0.0
         |ORDER BY score DESC, vec_id LIMIT 1""".stripMargin,
    "knn_threshold" ->
      s"""WITH scored AS (${oracleScored(3)})
         |SELECT vec_id, score FROM scored WHERE score >= 0.2
         |ORDER BY score DESC, vec_id""".stripMargin,
    "knn_filtered" -> {
      val cos = "list_cosine_similarity(CAST(embedding AS DOUBLE[]), " +
        "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 5))"
      s"""SELECT vec_id, label, ${graft.QueryPack.round6Sql(cos)} AS score
         |FROM embeddings WHERE label % 4 = 1
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin
    },
    "vector_kernels" -> {
      val d = "CAST(embedding AS DOUBLE[])"
      val qd = "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 11)"
      s"""SELECT vec_id,
         |  ${graft.QueryPack.round6Sql(s"list_dot_product($d, $qd)")} AS dot,
         |  ${graft.QueryPack.round6Sql(s"list_distance($d, $qd)")} AS l2_dist,
         |  ${graft.QueryPack.round6Sql(s"sqrt(list_sum(list_transform($d, x -> x * x)))")} AS norm,
         |  ${graft.QueryPack.round6Sql(s"list_cosine_similarity($d, $qd)")} AS cos
         |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin
    },
    "knn_topk_sql" ->
      s"""WITH scored AS (${oracleScored(0)})
         |SELECT vec_id, score FROM scored WHERE score >= 0.0
         |ORDER BY score DESC, vec_id LIMIT 5""".stripMargin,
    // Exact replay of the binary-quantized pipeline: Hamming distance is
    // the sign-mismatch count (bit-for-bit what SignPack + bit_count(^)
    // computes), the top-40 shortlist repeats the (hamming, vec_id)
    // total order, and the re-rank repeats the round6'd cosine order.
    "knn_binary_rerank" -> {
      val cos = graft.QueryPack.round6Sql(
        "list_cosine_similarity(e.emb, q.qe)")
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
         |), q AS (
         |  SELECT vec_id AS qid, emb AS qe FROM e WHERE vec_id < 8
         |), ham AS (
         |  SELECT q.qid, e.vec_id,
         |    CAST(len(list_filter(range(64),
         |      i -> (e.emb[i + 1] > 0) <> (q.qe[i + 1] > 0))) AS INT)
         |      AS hamming,
         |    $cos AS score
         |  FROM e CROSS JOIN q
         |  WHERE e.vec_id <> q.qid
         |), short AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid
         |    ORDER BY hamming, vec_id) AS rh
         |  FROM ham
         |), rer AS (
         |  SELECT qid, vec_id, hamming, score,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY score DESC, vec_id) AS rk
         |  FROM short WHERE rh <= 40
         |)
         |SELECT qid, vec_id, hamming, score FROM rer WHERE rk <= 10
         |ORDER BY qid, score DESC, vec_id""".stripMargin
    },
    "embedding_quantize_int8" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH prep AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
         |), m AS (
         |  SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS maxabs
         |  FROM prep
         |), sc AS (
         |  SELECT vec_id, e, maxabs, 127.0 / maxabs AS scale FROM m WHERE maxabs > 0
         |), qq AS (
         |  SELECT vec_id, e, maxabs, scale,
         |    list_transform(e, x -> greatest(-127.0, least(127.0, floor(x * scale + 0.5)))) AS q
         |  FROM sc
         |)
         |SELECT vec_id,
         |  ${r6("maxabs")} AS max_abs,
         |  CAST(list_sum(q) AS BIGINT) AS q_sum,
         |  ${r6("list_max(list_transform(range(1, len(e) + 1), i -> abs(e[i] - q[i] / scale)))")} AS max_err
         |FROM qq ORDER BY vec_id""".stripMargin
    }
  )
}
