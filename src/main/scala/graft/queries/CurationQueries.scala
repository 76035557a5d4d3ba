package graft.queries

import graft.QueryPack
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Dataset-curation operators a training-data pipeline runs between dedup
 * and training: deterministic sampling, source-mixture rebalancing, and
 * train/eval contamination checks.
 *
 * All three use content/key HASH GATES (md5 prefix comparison) instead of
 * rand(): the decision for a row is a pure function of the row, so
 *  - results are reproducible across runs, engines, and cluster sizes
 *    (rand() is none of those — its value depends on partition layout),
 *  - the same row always lands on the same side of the gate when the
 *    pipeline re-runs on grown data (stable train/eval membership),
 *  - the oracle can replicate the sample EXACTLY, making sampling
 *    hash-checkable rather than statistically-checkable.
 *
 * Scale design: every operator here is map-side gating + one partial-agg
 * shuffle (or a broadcast/shuffle semi-join for the leakage check). No
 * collect, no rand, no skew surprises — hash gates distribute uniformly
 * by construction.
 */
object CurationQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // Deterministic 1/8 corpus sample: keep a doc iff the first hex char
    // of md5(doc_id) is in 0..1 (2/16 of the hash space). Per-language
    // sample stats prove the gate; the sampled-set hash proves exactness.
    "corpus_sample_hash" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1).isin("0", "1"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("n_chars").cast(DecimalType(18, 0))).cast("long").as("sampled_chars"),
          min(col("doc_id")).as("first_id"))
        .orderBy(col("lang"))),

    // Source-mixture rebalancing: downsample each source to a per-source
    // target rate (50% for src0..src9, 25% for the rest) with a seeded
    // hash gate — two hex chars of md5("mix" + doc_id) span 00..ff, so
    // rate r keeps rows whose prefix < the r*256 boundary.
    "corpus_mix_rebalance" -> ((s, dir) => {
      val gate = substring(md5(concat(lit("mix"), col("doc_id").cast("string")).cast("binary")), 1, 2)
      val keepBound = when(
        col("source").isin((0 to 9).map("src" + _): _*), lit("80")) // 128/256 = 50%
        .otherwise(lit("40")) // 64/256 = 25%
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(gate < keepBound, 1L).otherwise(0L)).as("n_kept"))
        .orderBy(col("source"))
    }),

    // Train/eval contamination: eval = every 10th doc by id; train = the
    // rest PLUS re-keyed copies of every 20th doc (synthesized leakage,
    // same construction as dedup_exact). A train doc leaks iff its
    // normalized content fingerprint appears in eval — a semi-join on the
    // 128-bit fingerprint, never a text-to-text comparison.
    "corpus_train_eval_overlap" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val norm = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary"))
      val eval_ = d.filter(col("doc_id") % 10 === 0)
        .select(norm.as("fp"))
      val train = d.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id").as("train_id"), col("lang"), norm.as("fp"))
        .unionByName(d.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 100000).as("train_id"), col("lang"), norm.as("fp")))
      train.join(eval_, Seq("fp"), "left_semi")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_leaked"), min(col("train_id")).as("first_leaked_id"))
        .orderBy(col("lang"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "corpus_sample_hash" ->
      """SELECT lang, count(*) AS n_sampled,
        |  CAST(sum(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS sampled_chars,
        |  min(doc_id) AS first_id
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "corpus_mix_rebalance" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 2) <
        |    (CASE WHEN source IN ('src0','src1','src2','src3','src4','src5','src6','src7','src8','src9')
        |          THEN '80' ELSE '40' END)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents
        |GROUP BY source ORDER BY source""".stripMargin,
    "corpus_train_eval_overlap" ->
      """WITH normed AS (
        |  SELECT doc_id, lang,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents
        |), eval_fp AS (
        |  SELECT fp FROM normed WHERE doc_id % 10 = 0
        |), train AS (
        |  SELECT doc_id AS train_id, lang, fp FROM normed WHERE doc_id % 10 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, lang, fp FROM normed WHERE doc_id % 20 = 0
        |)
        |SELECT lang, count(*) AS n_leaked, min(train_id) AS first_leaked_id
        |FROM train WHERE fp IN (SELECT fp FROM eval_fp)
        |GROUP BY lang ORDER BY lang""".stripMargin
  )
}
