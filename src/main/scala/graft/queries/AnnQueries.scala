package graft.queries

import graft.QueryPack
import graft.ml.{CosineLsh, IvfIndex, IvfPqIndex, PqIndex}
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor queries — the scale path for similarity
 * search and embedding dedup. These are deliberately NOT oracle-checked
 * (an approximate result has no SQL-exact oracle); the driver records a
 * rows-only check, and recall >= 0.9 against the exact brute-force
 * operators is pinned by CosineLshSpec / IvfIndexSpec. Results are
 * deterministic (fixed projection / KMeans seeds), so row counts are
 * stable across runs.
 */
object AnnQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // LSH-bucketed embedding near-dup pairs (approx analog of
    // dedup_embedding_pairs_bruteforce).
    "ann_cosine_pairs" -> ((s, dir) =>
      new CosineLsh().similarPairs(
          t(s, dir, "embeddings"), "vec_id", "embedding", minCos = 0.4)
        .select(col("a_id"), col("b_id"), round6(col("cos")).as("score"))
        .orderBy(col("a_id"), col("b_id"))),

    // LSH-bucketed batch kNN join (approx analog of knn_join).
    "ann_knn_join" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      new CosineLsh().knnJoin(
          corpus = emb, queries = emb.filter(col("vec_id") < 20),
          idCol = "vec_id", embCol = "embedding", k = 3)
        .select(col("q_id"), col("rank"), col("neighbor_id"),
          round6(col("cos")).as("score"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // SemDeDup over the persisted IVF index's own cells — the production
    // path of the oracle-checked dedup_semantic (identical keep rule,
    // clusters = the index's KMeans cells instead of the oracle's seed
    // assignment). Approximate in the same sense as every ann_ entry
    // (cell boundaries decide which pairs are compared); the keep-rule
    // invariant and tombstone interaction are pinned by IndexAppendSpec.
    "ann_semantic_dedup" -> ((s, dir) => {
      val ivf = new IvfIndex(nCentroids = 8, nProbe = 5)
      val built = IvfIndex.openOrBuild(s, ivf, s"$dir/embeddings.parquet",
        "vec_id", "embedding")
      IvfIndex.semanticDedup(built, tau = 0.4)
        .orderBy(col("id"))
    }),

    // IVF (KMeans coarse quantizer) batch kNN join. The synthetic corpus
    // is uniform random (worst case for IVF — no cluster structure), so a
    // high probe fraction is needed for recall 0.9; real embedding corpora
    // cluster and probe far fewer cells.
    //
    // The KMeans fit NEVER runs in the query path: openOrBuild loads the
    // prebuilt cell-partitioned index for this corpus (building and
    // persisting it once on first use — the single-node analog of the
    // explicit index job that maintains the IVF table at 100 TB).
    "ann_ivf_knn" -> ((s, dir) => {
      val ivf = new IvfIndex(nCentroids = 8, nProbe = 5)
      val built = IvfIndex.openOrBuild(s, ivf, s"$dir/embeddings.parquet",
        "vec_id", "embedding")
      val queries = t(s, dir, "embeddings").filter(col("vec_id") < 20)
      ivf.search(built, queries, "vec_id", "embedding", k = 3)
        .select(col("q_id"), col("rank"), col("neighbor_id"),
          round6(col("cos")).as("score"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // FILTERED ANN — the approximate analog of the oracle-checked
    // knn_filtered: kNN restricted to a metadata slice (label % 4 = 1,
    // ~25% of the corpus). Pre-filter semantics (the allow-list semi-join
    // cuts the cell-pruned candidates BEFORE scoring, so all k results
    // satisfy the predicate by construction) with over-probing (nProbe 6
    // of 8 vs the unfiltered query's 5) compensating the thinner cells —
    // the published filtered-ANN recipe. Driver-visible invariants ride
    // every row: `in_filter` (predicate satisfaction, exact) and `pass`
    // (overall recall vs the exact filtered top-k >= 0.9 AND all results
    // in-filter).
    "ann_ivf_filtered_knn" -> ((s, dir) => {
      import graft.functions.{TopKByScore, VectorFunctions}
      val emb = t(s, dir, "embeddings")
      val allowed = emb.filter(col("label") % 4 === 1)
        .select(col("vec_id").as("id"))
      val ivf = new IvfIndex(nCentroids = 8, nProbe = 6)
      val built = IvfIndex.openOrBuild(s, ivf, s"$dir/embeddings.parquet",
        "vec_id", "embedding")
      val q = emb.filter(col("vec_id") < 20)
      val approx = ivf.searchFiltered(built, q, "vec_id", "embedding",
        k = 3, allowed)
      // exact filtered top-k (bounded partial-agg, as ann_recall_audit)
      val qd = q.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val exact = emb.filter(col("label") % 4 === 1)
        .crossJoin(broadcast(qd))
        .select(col("q_id"), col("vec_id"),
          VectorFunctions.cosineSim(col("embedding"), col("q_emb")).as("cos"))
        .groupBy(col("q_id"))
        .agg(TopKByScore(3)(col("cos"), col("vec_id")).as("hits"))
        .select(col("q_id"), explode(col("hits.id")).as("neighbor_id"),
          lit(1).as("hit_exact"))
      // |Q|×k rows; materialized once so the 1-row invariant aggregate
      // below doesn't recompute the probe
      val flagged = approx
        .join(allowed.select(col("id").as("neighbor_id"),
          lit(true).as("in_filter")), Seq("neighbor_id"), "left")
        .join(exact, Seq("q_id", "neighbor_id"), "left")
        .localCheckpoint()
      val stats = flagged.agg(
        (sum(coalesce(col("hit_exact"), lit(0))).cast("double") /
          count(lit(1))).as("recall_all"),
        (min(coalesce(col("in_filter"), lit(false)).cast("int")) === 1)
          .as("filter_ok"))
      flagged.crossJoin(broadcast(stats))
        .select(col("q_id"), col("rank"), col("neighbor_id"),
          round6(col("cos")).as("score"),
          coalesce(col("in_filter"), lit(false)).as("in_filter"),
          (col("recall_all") >= 0.9 - 1e-9 && col("filter_ok")).as("pass"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // Product-quantization batch kNN join — the compressed-index family
    // (codes are m bytes/vector, 32x smaller than float32): ADC lookup
    // shortlist over the code table, then exact re-rank of the shortlist
    // only. Like IVF, the build (m KMeans fits + encode) runs ONLY in
    // the index job; openOrBuild loads the persisted code table here.
    "ann_pq_knn" -> ((s, dir) => {
      val pq = new PqIndex(m = 8, kCentroids = 16)
      val built = PqIndex.openOrBuild(s, pq, s"$dir/embeddings.parquet",
        "vec_id", "embedding")
      val queries = t(s, dir, "embeddings").filter(col("vec_id") < 20)
      pq.search(built, queries, "vec_id", "embedding", k = 3)
        .select(col("q_id"), col("rank"), col("neighbor_id"),
          round6(col("cos")).as("score"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // IVF-PQ composite batch kNN join — the two prunings multiplied:
    // the coarse quantizer bounds WHICH rows are scanned (nProbe cells),
    // PQ bounds WHAT is scanned (m-byte codes); the shortlist re-ranks
    // exactly. Both fits live in the index job via openOrBuild.
    "ann_ivfpq_knn" -> ((s, dir) => {
      val ivfpq = new IvfPqIndex(nCentroids = 8, nProbe = 5,
        m = 8, kCentroids = 16)
      val built = IvfPqIndex.openOrBuild(s, ivfpq, s"$dir/embeddings.parquet",
        "vec_id", "embedding")
      val queries = t(s, dir, "embeddings").filter(col("vec_id") < 20)
      ivfpq.search(built, queries, "vec_id", "embedding", k = 3)
        .select(col("q_id"), col("rank"), col("neighbor_id"),
          round6(col("cos")).as("score"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // The ANN rewrite RULE in action (graft.plans.AnnIndexRule — SURVEY
    // §4's deferred custom-optimizer item): each branch below is the
    // NAIVE flagship plan — scan, literal-query cosine, descending
    // top-k — with no index call anywhere in the query code. The
    // registered rule rewrites every branch into the nProbe-cell-pruned
    // scan of the persisted IVF index at optimization time (asserted on
    // the physical plan by AnnRewriteSpec; recall >= 0.9 there too).
    // This is the "engine uses its own indexes" path: the same
    // declarative query an exact engine runs, served from the index.
    "ann_indexed_rewrite" -> ((s, dir) => {
      val ivf = new IvfIndex(nCentroids = 8, nProbe = 6)
      graft.plans.AnnIndexRegistry.register(s, ivf, s"$dir/embeddings.parquet",
        "vec_id", "embedding", nProbe = 6)
      val emb = t(s, dir, "embeddings")
      // 5 query vectors as literals (the reference-shaped call: the
      // query arrives as a parameter, not a table)
      val qvs = emb.filter(col("vec_id") < 5)
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      qvs.map { case (qid, qv) =>
        emb.select(col("vec_id"), col("embedding"))
          .withColumn("score",
            graft.functions.VectorFunctions.cosineSim(col("embedding"), lit(qv)))
          .filter(col("score") >= 0.0)
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(10)
          .select(lit(qid).as("q_id"), col("vec_id").as("neighbor_id"),
            round6(col("score")).as("score"))
      }.reduce(_ unionByName _)
        .orderBy(col("q_id"), col("score").desc, col("neighbor_id"))
    }),

    // The FILTERED flagship through the rewrite: the query code is the
    // naive filtered plan (scan → label predicate → literal-query cosine
    // → desc top-k — what a user writes), and registration carries the
    // predicate column into the index (`payloadCols = label`), so
    // AnnIndexRule serves it from the metadata-carrying `augmented`
    // table: cell-partition pruning FIRST, then the label predicate as a
    // pushed parquet filter on the probed cells. AnnRewriteSpec pins the
    // plan swap, the predicate-satisfaction invariant, the recall, and
    // the fall-back (an unregistered predicate column keeps the exact
    // scan).
    "ann_indexed_filtered_rewrite" -> ((s, dir) => {
      val ivf = new IvfIndex(nCentroids = 8, nProbe = 6)
      graft.plans.AnnIndexRegistry.register(s, ivf, s"$dir/embeddings.parquet",
        "vec_id", "embedding", nProbe = 6, payloadCols = Seq("label"))
      val emb = t(s, dir, "embeddings")
      val qvs = emb.filter(col("vec_id") < 5)
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      qvs.map { case (qid, qv) =>
        emb.select(col("vec_id"), col("label"), col("embedding"))
          .filter(col("label") % 4 === 1)
          .withColumn("score",
            graft.functions.VectorFunctions.cosineSim(col("embedding"), lit(qv)))
          .orderBy(col("score").desc, col("vec_id").asc)
          .limit(10)
          .select(lit(qid).as("q_id"), col("vec_id").as("neighbor_id"),
            col("label"), round6(col("score")).as("score"))
      }.reduce(_ unionByName _)
        .orderBy(col("q_id"), col("score").desc, col("neighbor_id"))
    }),

    // The same rewrite from PURE SQL: the query text below is exactly
    // what a SQL-surface user of the reference would write (registered
    // cosine function, view over the corpus, ORDER BY score DESC LIMIT
    // k with the query vector inlined as an array literal) — no Scala
    // DSL, no index API. AnnIndexRule rewrites the analyzed plan the
    // same way it rewrites the DataFrame form; AnnRewriteSpec pins the
    // plan shape for this path too.
    "ann_indexed_rewrite_sql" -> ((s, dir) => {
      val ivf = new IvfIndex(nCentroids = 8, nProbe = 6)
      graft.plans.AnnIndexRegistry.register(s, ivf, s"$dir/embeddings.parquet",
        "vec_id", "embedding", nProbe = 6)
      graft.functions.VectorFunctions.register(s)
      t(s, dir, "embeddings").createOrReplaceTempView("graft_ann_sql_corpus")
      val qvs = t(s, dir, "embeddings").filter(col("vec_id") < 3)
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1))
      qvs.map { case (qid, qv) =>
        val arr = qv.map(f => s"CAST($f AS FLOAT)").mkString("array(", ", ", ")")
        s.sql(
          s"""SELECT $qid AS q_id, vec_id AS neighbor_id,
             |  floor(score * 1e6 + 0.5) / 1e6 AS score
             |FROM (
             |  SELECT vec_id, cosine_similarity(embedding, $arr) AS score
             |  FROM graft_ann_sql_corpus
             |  WHERE cosine_similarity(embedding, $arr) >= 0.0
             |  ORDER BY score DESC, vec_id LIMIT 10
             |)""".stripMargin)
      }.reduce(_ unionByName _)
        .orderBy(col("q_id"), col("score").desc, col("neighbor_id"))
    }),

    // Driver-visible ANN correctness: per-(method, query) recall of ALL
    // approximate paths (LSH, IVF, PQ) against the exact in-Spark top-k
    // (same contract AnnRecallSpec pins in sbt). A recall regression in
    // either index flips `pass` to false in the dumped rows — reviewable
    // without a SQL-expressible ANN oracle.
    "ann_recall_audit" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 20)
      val k = 3
      val lsh = new CosineLsh()
        .knnJoin(corpus = emb, queries = q, idCol = "vec_id",
          embCol = "embedding", k = k)
        .select(lit("lsh").as("method"), col("q_id"), col("neighbor_id"),
          lit(1).as("hit"))
      val ivfIdx = new IvfIndex(nCentroids = 8, nProbe = 5)
      val ivf = ivfIdx
        .search(IvfIndex.openOrBuild(s, ivfIdx, s"$dir/embeddings.parquet",
          "vec_id", "embedding"), q, "vec_id", "embedding", k)
        .select(lit("ivf").as("method"), col("q_id"), col("neighbor_id"),
          lit(1).as("hit"))
      val pqIdx = new PqIndex(m = 8, kCentroids = 16)
      val pq = pqIdx
        .search(PqIndex.openOrBuild(s, pqIdx, s"$dir/embeddings.parquet",
          "vec_id", "embedding"), q, "vec_id", "embedding", k)
        .select(lit("pq").as("method"), col("q_id"), col("neighbor_id"),
          lit(1).as("hit"))
      val ivfpqIdx = new IvfPqIndex(nCentroids = 8, nProbe = 5,
        m = 8, kCentroids = 16)
      val ivfpq = ivfpqIdx
        .search(IvfPqIndex.openOrBuild(s, ivfpqIdx, s"$dir/embeddings.parquet",
          "vec_id", "embedding"), q, "vec_id", "embedding", k)
        .select(lit("ivfpq").as("method"), col("q_id"), col("neighbor_id"),
          lit(1).as("hit"))
      val approx = lsh.unionByName(ivf).unionByName(pq).unionByName(ivfpq)
      val qd = q.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      // exact side via the bounded partial-agg top-k (same tie-break as a
      // row_number window — score desc, id asc — but only partitions×k
      // candidate rows per query cross the shuffle, never corpus×|Q|)
      val exact = emb.crossJoin(broadcast(qd))
        .select(col("q_id"), col("vec_id"),
          graft.functions.VectorFunctions.cosineSim(col("embedding"), col("q_emb")).as("cos"))
        .groupBy(col("q_id"))
        .agg(graft.functions.TopKByScore(k)(col("cos"), col("vec_id")).as("hits"))
        .select(col("q_id"), explode(col("hits.id")).as("neighbor_id"))
      val methods =
        { import s.implicits._; Seq("lsh", "ivf", "pq", "ivfpq").toDF("method") }
      // `pass` pins the METHOD-aggregate recall >= 0.9 (the AnnRecallSpec
      // contract) on every row; per-query recall stays visible for
      // diagnosis (single queries legitimately dip on a uniform-random
      // corpus — the aggregate is the regression signal)
      val byQuery = exact.crossJoin(broadcast(methods))
        .join(approx, Seq("method", "q_id", "neighbor_id"), "left")
        .groupBy(col("method"), col("q_id"))
        .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)))
          .as("recall"))
      val wm = org.apache.spark.sql.expressions.Window.partitionBy("method")
      byQuery
        .withColumn("method_recall", avg(col("recall")).over(wm))
        .select(col("method"), col("q_id"), round6(col("recall")).as("recall"),
          (col("method_recall") >= 0.9 - 1e-9).as("pass"))
        .orderBy(col("method"), col("q_id"))
    })
  )

  override def oracleSql: Map[String, String] = Map.empty
}
