package graft.queries

import graft.QueryPack
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Corpus-quality and corpus-comparison operators from the published
 * LLM-data-pipeline literature that sit between raw ingest and mixture
 * planning:
 *
 *  - `corpus_gopher_rules` — the named rule-based quality filter family of
 *    Gopher (Rae et al. 2021, appendix A1.1) / falling through to C4-style
 *    heuristics: per-document word-count, mean-word-length, alphabetic-
 *    word, stop-word and symbol-ratio rules with a per-language rollup of
 *    which rule kills how many documents.
 *  - `corpus_dsir_weights` — Data Selection with Importance Resampling
 *    (Xie et al. 2023): hashed-n-gram bucket LMs for a target slice vs the
 *    raw corpus, per-document importance weight = Σ log(p_target/p_raw)
 *    over the document's n-gram occurrences.
 *  - `corpus_overlap_kmv` — pairwise corpus-overlap estimation between
 *    sources via k-minimum-values sketches (Beyer et al. 2007): Jaccard
 *    between any two sources from k=64 fingerprints each, never comparing
 *    documents pairwise.
 *
 * Determinism/oracle notes: every threshold compare is integer cross-
 * multiplication (no ratio doubles near rule boundaries); DSIR log terms
 * go through the DECIMAL(27,9) summation rule so per-doc weights are
 * partition-order independent; KMV sketches order md5 hex strings
 * (identical collation both engines) and the estimator divides two exact
 * integers (one IEEE division, correctly rounded on both engines).
 */
object QualityQueries extends QueryPack {

  private val stops = graft.functions.TextSignals.stopWords

  private def toks: Column = col("toks")

  private def withToks(df: DataFrame): DataFrame =
    df.withColumn("toks", split(trim(col("text")), "\\s+"))

  // r17: NO spread here — these per-doc token statistics are light
  // (one split + integer arithmetic per row); the r17 unconditional
  // spread measured +0.6-1.4 s PER QUERY across the family (exchange +
  // 32-task scheduling overhead exceeding the map work it parallelized),
  // while the single-partition plan ran them in 0.3-0.6 s. The heavy
  // tokenize consumers (dedup shingling, curation n-grams) keep their
  // own spread at their own call sites.
  private def docs(s: SparkSession, dir: String): DataFrame =
    withToks(t(s, dir, "documents"))

  override def queries: Map[String, Q] = Map(
    // Gopher-style rule filter. Every rule is an integer predicate:
    //   r_word_count: 20 <= n_words <= 100000
    //   r_mean_len:   3 <= total_chars/n_words <= 10   (cross-multiplied)
    //   r_alpha:      >= 80% of words contain a letter  (5*a >= 4*n)
    //   r_stop:       >= 2 stop-word hits
    //   r_symbol:     '#'/ellipsis count <= 10% of words (10*s <= n)
    // Rollup = one partial-agg shuffle over ~|langs| groups; the rule
    // evaluation is map-only codegen'd string/array work, so at 100 TB
    // this is a single scan of the corpus. Thresholds are the published
    // Gopher shapes adapted to the fixture's word-count range (the
    // reference implements no quality layer at all — capability
    // extension per SURVEY §2.D).
    "corpus_gopher_rules" -> ((s, dir) => {
      val nW = size(toks)
      val totChars = length(array_join(toks, ""))
      val alphaW = size(filter(toks, w => w.rlike("[A-Za-z]")))
      val stopC = size(filter(toks, w => w.isInCollection(stops)))
      val hashC = length(col("text")) - length(regexp_replace(col("text"), "#", ""))
      val ellC = ((length(col("text")) -
        length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3).cast("int")
      val symC = hashC + ellC
      val rWc = nW.between(20, 100000)
      val rMwl = (nW * 3 <= totChars) && (totChars <= nW * 10)
      val rAlpha = alphaW * 5 >= nW * 4
      val rStop = stopC >= 2
      val rSym = symC * 10 <= nW
      val pass = rWc && rMwl && rAlpha && rStop && rSym
      def fails(c: Column, name: String): Column =
        sum(when(!c, 1L).otherwise(0L)).as(name)
      docs(s, dir)
        .select(col("lang"), rWc.as("r_wc"), rMwl.as("r_mwl"),
          rAlpha.as("r_alpha"), rStop.as("r_stop"), rSym.as("r_sym"),
          pass.as("pass"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
          fails(col("r_wc"), "f_word_count"),
          fails(col("r_mwl"), "f_mean_len"),
          fails(col("r_alpha"), "f_alpha"),
          fails(col("r_stop"), "f_stop"),
          fails(col("r_sym"), "f_symbol"))
        .orderBy(col("lang"))
    }),

    // DSIR importance weights, target slice = lang 'en'. Hashed n-gram
    // features: unigrams + bigrams bucketed into 256 cells by the first
    // two md5 hex chars (engine-portable hashing — same gate family as
    // corpus_sample_hash). Bucket LMs with +1 smoothing; per-document
    // weight = Σ_gram log(p_target(bucket)/p_raw(bucket)); top-20 by
    // weight (doc_id tie-break). Scale shape: explode → ONE 256-row
    // partial-agg shuffle for both LMs in a single pass (conditional
    // count), log-ratio table broadcast back onto the exploded grams,
    // one per-doc partial agg. Nothing is ever collected; the expensive
    // join side is a 256-row broadcast however large the corpus is.
    "corpus_dsir_weights" -> ((s, dir) => {
      // gram/bucket spellings live in DsirSignals, shared with the
      // streaming admit gate (CurationStreams.dsirGate); batch↔stream
      // weight parity is pinned by CurationStreamsSpec.
      import graft.functions.DsirSignals
      val grams = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(DsirSignals.gramsFromToks(toks)).as("gram"))
        .select(col("doc_id"), col("lang"),
          DsirSignals.bucketOf(col("gram")).as("bucket"))
        .localCheckpoint()
      // 256-row LM table, materialized so the totals row below derives
      // from it instead of re-running the corpus-sized bucket agg twice
      val bc = grams.groupBy(col("bucket"))
        .agg(count(lit(1)).as("c_raw"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("c_tgt"))
        .localCheckpoint()
      val tot = bc.agg(sum(col("c_raw")).as("t_raw"), sum(col("c_tgt")).as("t_tgt"))
      val lr = bc.crossJoin(broadcast(tot))
        .select(col("bucket"),
          (log((col("c_tgt") + 1).cast("double") / (col("t_tgt") + 256)) -
            log((col("c_raw") + 1).cast("double") / (col("t_raw") + 256)))
            .cast(DecimalType(27, 9)).as("lr"))
      grams.join(broadcast(lr), Seq("bucket"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_grams"), sum(col("lr")).as("w_dec"))
        .select(col("doc_id"), col("lang"), col("n_grams"),
          round6(col("w_dec").cast("double")).as("dsir_weight"))
        .orderBy(col("dsir_weight").desc, col("doc_id"))
        .limit(20)
    }),

    // Pairwise source-overlap estimation WITHOUT pairwise document
    // comparison: per source keep the k=64 lexicographically smallest
    // distinct content fingerprints (a KMV sketch — md5 is uniform, so
    // the k smallest hashes are a uniform content sample); for each
    // source pair, re-sketch the union of the two sketches and estimate
    // Jaccard as |both| / |union sketch|. Exact when a source has < k
    // distinct contents (the union sketch is then the true union). The
    // data-sized work is ONE distinct partial-agg + a per-source
    // bounded bottom-k partial agg (`BottomKMins`: each task reduces to
    // at most k entries per source locally, so only partitions×k rows
    // cross the shuffle — no corpus-sized window sort anywhere in the
    // plan, pinned by BottomKMinsSpec); everything pairwise happens on
    // 20×64 sketch rows. The pair-union re-sketch rides the SAME
    // aggregate (side flags OR-merge on duplicate fingerprints), which
    // also deletes the per-pair pre-group the window form needed.
    "corpus_overlap_kmv" -> ((s, dir) => {
      val k = 64
      val fp = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")
        .cast("binary"))
      // The synthetic sources share no content, which would make every
      // estimate trivially 0 — cross-post every third document to the
      // next source (src<i> → src<(i+1) mod 20>) so adjacent source
      // pairs have real ~⅓ overlap for the sketch to find.
      val d = t(s, dir, "documents")
      val crossPosted = d.filter(col("doc_id") % 3 === 0)
        .withColumn("source", concat(lit("src"),
          ((col("source").substr(lit(4), lit(10)).cast("int") + 1) % 20)
            .cast("string")))
      val bottomK = graft.functions.BottomKMins(k)
      val f = d.unionByName(crossPosted)
        .select(col("source"), fp.as("h")).distinct()
      val sk = f
        .groupBy(col("source"))
        .agg(bottomK(col("h"), lit(0), lit(0)).as("hits"))
        .select(col("source"), explode(col("hits.h")).as("h"))
        .localCheckpoint()
      val srcs = sk.select(col("source")).distinct()
      val pairs = srcs.select(col("source").as("source_a"))
        .crossJoin(srcs.select(col("source").as("source_b")))
        .filter(col("source_a") < col("source_b"))
      val aSide = pairs.join(sk, col("source") === col("source_a"))
        .select(col("source_a"), col("source_b"), col("h"),
          lit(1).as("ia"), lit(0).as("ib"))
      val bSide = pairs.join(sk, col("source") === col("source_b"))
        .select(col("source_a"), col("source_b"), col("h"),
          lit(0).as("ia"), lit(1).as("ib"))
      aSide.unionByName(bSide)
        .groupBy(col("source_a"), col("source_b"))
        .agg(bottomK(col("h"), col("ia"), col("ib")).as("hits"))
        .select(col("source_a"), col("source_b"),
          size(col("hits")).cast("long").as("n_union"),
          aggregate(col("hits"), lit(0L),
            (acc, e) => acc +
              (e.getField("ia") * e.getField("ib")).cast("long")).as("n_both"))
        .select(col("source_a"), col("source_b"), col("n_union"), col("n_both"),
          round6(col("n_both").cast("double") / col("n_union")).as("jaccard_est"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // Distributed BPE merge learning (Sennrich et al. 2016): learn the
    // first 8 merge rules from the corpus word-frequency table. Each
    // round = one pair-count partial agg over the vocab + a 1-row
    // broadcast argmax (count desc, pair lexicographic tie-break) + a
    // map-side merge applied via literal string replace. Symbols are
    // pipe-delimited ("|c| |a| |t|") so a pair pattern can never match
    // inside a longer symbol, and left-to-right non-overlapping replace
    // IS the BPE greedy merge semantics. Scale shape: the corpus is
    // read ONCE to build the vocab (word→count partial agg); every
    // round after that is vocab-sized work — exactly how BPE training
    // distributes (the vocab table is millions of types at 100 TB,
    // never corpus-sized), with per-round localCheckpoint to keep the
    // lineage flat. No end-of-word marker (documented simplification;
    // the merge mechanics are what's pinned).
    "corpus_bpe_learn" -> ((s, dir) => {
      val vocab = t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .withColumn("rep", pipeRep(col("w")))
        .select(col("cnt"), col("rep"))
      val (merges, _) = bpeRounds(vocab, BpeRounds)
      merges.reduce(_ unionByName _).orderBy(col("round_idx"))
    }),

    // BPE APPLY — the other half of the tokenizer loop: encode every
    // document with the merges `corpus_bpe_learn` discovers and roll up
    // per-language token counts + fertility (tokens per word — the
    // standard tokenizer-efficiency metric). Scale shape: the merge
    // loop is vocab-sized exactly as in learn; ENCODING is a vocab-sized
    // map (each word TYPE is segmented once) plus one word→vocab
    // equi-join — the corpus is never re-segmented row by row, which is
    // how a 100 TB tokenization job amortizes (segment the type table,
    // join the token counts back onto occurrences). The per-lang rollup
    // is a 4-group partial agg.
    // Population-stability-index drift monitor — the standard feature-
    // level drift metric an ML data pipeline runs between ingest
    // snapshots (PSI = Σ_bins (p_now - p_ref) · ln(p_now/p_ref); the
    // conventional alert thresholds are 0.1 warn / 0.25 act).
    // Snapshots are deterministic halves of the corpus (doc_id parity —
    // the fixture has no ingest-date column); the monitored feature is
    // document length binned into 8 fixed-width buckets, rolled up per
    // source. Scale shape: one map-side bucket assignment + ONE
    // (source × snapshot × bucket)-sized partial agg — a 100 TB drift
    // check is a single scan however many features ride the same
    // grouping. Smoothed (+1) counts keep empty bins finite; the log-sum
    // goes through the DECIMAL(27,9) rule so per-source PSI is
    // partition-order independent.
    // Zipf's-law fit — the classic corpus-health check (natural language
    // follows freq ∝ rank^s with s ≈ −1; generated/templated text bends
    // the curve): least-squares slope of ln(freq) on ln(rank) over each
    // language's top-200 word types. Scale shape: ONE (lang, word)
    // partial-agg shuffle builds the vocab; the rank window runs over
    // vocab-sized rows per language (an audit job — at extreme vocab
    // sizes the top-200 cut becomes a bounded partial-agg top-k first);
    // the regression reduces 200 rows/lang through exact DECIMAL sums so
    // the slope is partition-order independent.
    "corpus_zipf_fit" -> ((s, dir) => {
      val topN = 200
      val vocab = docs(s, dir)
        .select(col("lang"), explode(toks).as("w"))
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("w"))
      val ranked = vocab
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= topN)
        .select(col("lang"),
          log(col("rk").cast("double")).as("x"),
          log(col("cnt").cast("double")).as("y"))
      val dec = (c: Column) => c.cast(DecimalType(27, 9))
      val sums = ranked.groupBy(col("lang"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(dec(col("x"))).cast("double").as("sx"),
          sum(dec(col("y"))).cast("double").as("sy"),
          sum(dec(col("x") * col("x"))).cast("double").as("sxx"),
          sum(dec(col("x") * col("y"))).cast("double").as("sxy"))
      sums.select(col("lang"), col("n").cast("long").as("n_types"),
          round6((col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("sxx") - col("sx") * col("sx") / col("n"))).as("zipf_slope"),
          round6(col("sy") / col("n") -
            ((col("sxy") - col("sx") * col("sy") / col("n")) /
              (col("sxx") - col("sx") * col("sx") / col("n"))) *
              col("sx") / col("n")).as("intercept"))
        .orderBy(col("lang"))
    }),

    "corpus_psi_drift" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("bin", least(lit(7), floor(col("n_chars") / 120)).cast("int"))
        .withColumn("snap", (col("doc_id") % 2 === 0).cast("int"))
      val counts = d.groupBy(col("source"), col("bin"))
        .agg(sum(when(col("snap") === 1, 1L).otherwise(0L)).as("c_ref"),
          sum(when(col("snap") === 0, 1L).otherwise(0L)).as("c_now"))
      val tot = counts.groupBy(col("source"))
        .agg(sum(col("c_ref")).as("t_ref"), sum(col("c_now")).as("t_now"))
      counts.join(tot, Seq("source"))
        .select(col("source"),
          (((col("c_now") + 1).cast("double") / (col("t_now") + 8)) -
            ((col("c_ref") + 1).cast("double") / (col("t_ref") + 8))).as("dp"),
          log(((col("c_now") + 1).cast("double") / (col("t_now") + 8)) /
            ((col("c_ref") + 1).cast("double") / (col("t_ref") + 8))).as("lr"))
        .select(col("source"), (col("dp") * col("lr"))
          .cast(DecimalType(27, 9)).as("term"))
        .groupBy(col("source"))
        .agg(sum(col("term")).as("psi_dec"))
        .select(col("source"), round6(col("psi_dec").cast("double")).as("psi"),
          // decimal-vs-decimal compare (a double 0.1 literal would force
          // a decimal->double cast and can flip a boundary-value verdict
          // vs the oracle's exact decimal compare)
          (col("psi_dec") < lit(new java.math.BigDecimal("0.1"))).as("stable"))
        .orderBy(col("source"))
    }),

    "corpus_bpe_encode" -> ((s, dir) => {
      val words = t(s, dir, "documents")
        .select(col("lang"), explode(split(trim(col("text")), "\\s+")).as("w"))
      val vocab = words.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .withColumn("rep", pipeRep(col("w")))
      val (_, encoded) = bpeRounds(vocab, BpeRounds)
      val tokCount = encoded
        .select(col("w"), size(split(col("rep"), " ")).as("n_tok"))
      words.join(tokCount, Seq("w"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_tok")).as("n_tokens"))
        .select(col("lang"), col("n_words"), col("n_tokens"),
          round6(col("n_tokens").cast("double") / col("n_words"))
            .as("fertility"))
        .orderBy(col("lang"))
    })
  )

  private val BpeRounds = 8

  /** Pipe-delimited per-character symbol encoding ("cat" → "|c| |a| |t|")
    * — a pair pattern can never match inside a longer symbol, so literal
    * replace IS the greedy BPE merge. */
  private def pipeRep(w: Column): Column =
    concat(lit("|"),
      array_join(transform(sequence(lit(1), length(w)),
        i => w.substr(i, lit(1))), "| |"),
      lit("|"))

  /**
   * The shared BPE merge loop (Sennrich et al. 2016) over a vocab table
   * carrying a `cnt` count and a [[pipeRep]] `rep` column (any other
   * columns ride along untouched — `corpus_bpe_encode` keeps the word).
   * Each round: one vocab-sized pair-count partial agg, a 1-row broadcast
   * argmax (count desc, pair lexicographic tie-break), a map-side literal
   * replace; per-round localCheckpoint keeps the lineage flat. Returns the
   * per-round merge-rule rows and the fully merged vocab.
   */
  private def bpeRounds(vocabRep: DataFrame, rounds: Int)
      : (Seq[DataFrame], DataFrame) = {
    var rep = vocabRep.localCheckpoint()
    var merges: Seq[DataFrame] = Seq.empty
    for (r <- 1 to rounds) {
      val best = rep
        .withColumn("syms", split(col("rep"), " "))
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => concat(element_at(col("syms"), i), lit(" "),
            element_at(col("syms"), i + 1)))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("pair")).limit(1)
        .localCheckpoint() // 1 row; evaluated once, reused twice
      merges = merges :+ best.select(lit(r).as("round_idx"),
        translate(col("pair"), "|", "").as("merge_pair"),
        col("pc").as("pair_count"))
      rep = rep.crossJoin(broadcast(best.select(col("pair").as("bp"))))
        .withColumn("rep",
          replace(col("rep"), col("bp"),
            replace(col("bp"), lit("| |"), lit(""))))
        .drop("bp")
        .localCheckpoint()
    }
    (merges, rep)
  }

  private val toksSql = "string_split_regex(trim(text), '\\s+')"

  override def oracleSql: Map[String, String] = Map(
    "corpus_gopher_rules" ->
      s"""WITH m AS (
         |  SELECT lang, text, $toksSql AS toks FROM documents
         |), r AS (
         |  SELECT lang,
         |    len(toks) AS nw,
         |    length(array_to_string(toks, '')) AS tc,
         |    len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS aw,
         |    len(list_filter(toks, w -> w IN ('the','a','and','of','to','in'))) AS sc,
         |    (length(text) - length(regexp_replace(text, '#', '', 'g')))
         |      + CAST((length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3 AS INTEGER)
         |      AS syc
         |  FROM m
         |), p AS (
         |  SELECT lang,
         |    (nw BETWEEN 20 AND 100000) AS r_wc,
         |    (nw * 3 <= tc AND tc <= nw * 10) AS r_mwl,
         |    (aw * 5 >= nw * 4) AS r_alpha,
         |    (sc >= 2) AS r_stop,
         |    (syc * 10 <= nw) AS r_sym
         |  FROM r
         |)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN r_wc AND r_mwl AND r_alpha AND r_stop AND r_sym
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  CAST(sum(CASE WHEN NOT r_wc THEN 1 ELSE 0 END) AS BIGINT) AS f_word_count,
         |  CAST(sum(CASE WHEN NOT r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS f_mean_len,
         |  CAST(sum(CASE WHEN NOT r_alpha THEN 1 ELSE 0 END) AS BIGINT) AS f_alpha,
         |  CAST(sum(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT) AS f_stop,
         |  CAST(sum(CASE WHEN NOT r_sym THEN 1 ELSE 0 END) AS BIGINT) AS f_symbol
         |FROM p GROUP BY lang ORDER BY lang""".stripMargin,
    "corpus_dsir_weights" -> {
      val wMean = "CAST(CAST(sum(lr) AS VARCHAR) AS DOUBLE)"
      s"""WITH tok AS (
         |  SELECT doc_id, lang, $toksSql AS toks FROM documents
         |), g AS (
         |  SELECT doc_id, lang, unnest(toks) AS gram FROM tok
         |  UNION ALL
         |  SELECT doc_id, lang,
         |    unnest(list_transform(range(1, len(toks)),
         |      i -> toks[i] || ' ' || toks[i+1])) AS gram
         |  FROM tok
         |), e AS (
         |  SELECT doc_id, lang, substr(md5(gram), 1, 2) AS bucket FROM g
         |), bc AS (
         |  SELECT bucket, count(*) AS c_raw,
         |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
         |  FROM e GROUP BY bucket
         |), tot AS (SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt FROM bc),
         |lr AS (
         |  SELECT bucket,
         |    CAST(ln(CAST(c_tgt + 1 AS DOUBLE) / CAST(t_tgt + 256 AS DOUBLE))
         |       - ln(CAST(c_raw + 1 AS DOUBLE) / CAST(t_raw + 256 AS DOUBLE))
         |      AS DECIMAL(27,9)) AS lr
         |  FROM bc, tot
         |)
         |SELECT doc_id, lang, count(*) AS n_grams,
         |  ${graft.QueryPack.round6Sql(wMean)} AS dsir_weight
         |FROM e JOIN lr USING (bucket)
         |GROUP BY doc_id, lang
         |ORDER BY dsir_weight DESC, doc_id LIMIT 20""".stripMargin
    },
    "corpus_overlap_kmv" ->
      s"""WITH corpus AS (
         |  SELECT source, text FROM documents
         |  UNION ALL
         |  SELECT 'src' || CAST((CAST(substr(source, 4) AS INTEGER) + 1) % 20 AS VARCHAR),
         |    text
         |  FROM documents WHERE doc_id % 3 = 0
         |), f AS (
         |  SELECT DISTINCT source,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
         |  FROM corpus
         |), sk AS (
         |  SELECT source, h FROM (
         |    SELECT source, h,
         |      row_number() OVER (PARTITION BY source ORDER BY h) AS rk
         |    FROM f)
         |  WHERE rk <= 64
         |), srcs AS (SELECT DISTINCT source FROM sk),
         |pairs AS (
         |  SELECT a.source AS source_a, b.source AS source_b
         |  FROM srcs a, srcs b WHERE a.source < b.source
         |), u AS (
         |  SELECT source_a, source_b, h, max(ia) AS ia, max(ib) AS ib
         |  FROM (
         |    SELECT p.source_a, p.source_b, s.h, 1 AS ia, 0 AS ib
         |    FROM pairs p JOIN sk s ON s.source = p.source_a
         |    UNION ALL
         |    SELECT p.source_a, p.source_b, s.h, 0 AS ia, 1 AS ib
         |    FROM pairs p JOIN sk s ON s.source = p.source_b
         |  ) GROUP BY source_a, source_b, h
         |), r AS (
         |  SELECT source_a, source_b, ia, ib FROM (
         |    SELECT source_a, source_b, ia, ib,
         |      row_number() OVER (PARTITION BY source_a, source_b ORDER BY h) AS rk
         |    FROM u)
         |  WHERE rk <= 64
         |)
         |SELECT source_a, source_b,
         |  count(*) AS n_union,
         |  CAST(sum(ia * ib) AS BIGINT) AS n_both,
         |  ${graft.QueryPack.round6Sql(
              "CAST(sum(ia * ib) AS DOUBLE) / count(*)")} AS jaccard_est
         |FROM r GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin,
    // 8 unrolled BPE rounds: p<r> = pair counts, b<r> = argmax (count
    // desc, pair lexicographic), r<r> = merged representation. Identical
    // pipe-delimited symbol encoding and literal-replace merge as the
    // Spark side.
    "corpus_bpe_learn" -> {
      val tail = (1 to BpeRounds).map(r =>
        s"SELECT $r AS round_idx, translate(pair, '|', '') AS merge_pair, " +
          s"pc AS pair_count FROM b$r")
        .mkString("\n", "\nUNION ALL\n", "\nORDER BY round_idx")
      bpeCte + tail
    },
    "corpus_zipf_fit" -> {
      def d(e: String) = s"CAST(CAST(sum(CAST($e AS DECIMAL(27,9))) AS VARCHAR) AS DOUBLE)"
      val slope = "(sxy - sx * sy / n) / (sxx - sx * sx / n)"
      s"""WITH v AS (
         |  SELECT lang, w, count(*) AS cnt FROM (
         |    SELECT lang, unnest($toksSql) AS w FROM documents)
         |  GROUP BY lang, w
         |), r AS (
         |  SELECT lang, ln(CAST(rk AS DOUBLE)) AS x,
         |    ln(CAST(cnt AS DOUBLE)) AS y
         |  FROM (
         |    SELECT lang, cnt,
         |      row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, w) AS rk
         |    FROM v)
         |  WHERE rk <= 200
         |), s AS (
         |  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
         |    ${d("x")} AS sx, ${d("y")} AS sy,
         |    ${d("x * x")} AS sxx, ${d("x * y")} AS sxy
         |  FROM r GROUP BY lang
         |)
         |SELECT lang, CAST(n AS BIGINT) AS n_types,
         |  ${graft.QueryPack.round6Sql(slope)} AS zipf_slope,
         |  ${graft.QueryPack.round6Sql(s"sy / n - ($slope) * sx / n")} AS intercept
         |FROM s ORDER BY lang""".stripMargin
    },
    "corpus_psi_drift" -> {
      val psiDouble = "CAST(CAST(sum(term) AS VARCHAR) AS DOUBLE)"
      s"""WITH d AS (
         |  SELECT source,
         |    least(7, CAST(floor(n_chars / 120.0) AS BIGINT)) AS bin,
         |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS snap
         |  FROM documents
         |), c AS (
         |  SELECT source, bin,
         |    CAST(sum(snap) AS BIGINT) AS c_ref,
         |    CAST(sum(1 - snap) AS BIGINT) AS c_now
         |  FROM d GROUP BY source, bin
         |), t AS (
         |  SELECT source, CAST(sum(c_ref) AS BIGINT) AS t_ref,
         |    CAST(sum(c_now) AS BIGINT) AS t_now
         |  FROM c GROUP BY source
         |), r AS (
         |  SELECT c.source,
         |    ((CAST(c_now + 1 AS DOUBLE) / CAST(t_now + 8 AS DOUBLE))
         |      - (CAST(c_ref + 1 AS DOUBLE) / CAST(t_ref + 8 AS DOUBLE))) AS dp,
         |    ln((CAST(c_now + 1 AS DOUBLE) / CAST(t_now + 8 AS DOUBLE))
         |      / (CAST(c_ref + 1 AS DOUBLE) / CAST(t_ref + 8 AS DOUBLE))) AS lr
         |  FROM c JOIN t ON c.source = t.source
         |), s AS (
         |  SELECT source, CAST(dp * lr AS DECIMAL(27,9)) AS term FROM r
         |)
         |SELECT source,
         |  ${graft.QueryPack.round6Sql(psiDouble)} AS psi,
         |  (sum(term) < 0.1) AS stable
         |FROM s GROUP BY source ORDER BY source""".stripMargin
    },
    // The same unrolled merge chain, then: token count per word TYPE from
    // the final representation, joined back onto word occurrences, per-
    // language rollup — the exact two-step (segment types, join counts)
    // the Spark side runs.
    "corpus_bpe_encode" -> {
      val tail =
        s""", tok AS (
           |  SELECT w, len(string_split(rep, ' ')) AS n_tok FROM r$BpeRounds
           |), wd AS (
           |  SELECT lang, unnest($toksSql) AS w FROM documents
           |)
           |SELECT lang, count(*) AS n_words,
           |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           |  ${graft.QueryPack.round6Sql(
                "CAST(sum(n_tok) AS DOUBLE) / count(*)")} AS fertility
           |FROM wd JOIN tok USING (w)
           |GROUP BY lang ORDER BY lang""".stripMargin
      bpeCte + tail
    }
  )

  /** The unrolled-CTE BPE merge chain shared by the learn and encode
    * oracles; every r<r> carries the word alongside its representation. */
  private def bpeCte: String = {
    val head =
      s"""WITH v0 AS (
         |  SELECT w, count(*) AS cnt
         |  FROM (SELECT unnest($toksSql) AS w FROM documents) GROUP BY w
         |), r0 AS (
         |  SELECT w, cnt,
         |    '|' || array_to_string(list_transform(range(1, length(w) + 1),
         |      i -> substr(w, i, 1)), '| |') || '|' AS rep
         |  FROM v0
         |)""".stripMargin
    val body = (1 to BpeRounds).map { r =>
      s""", p$r AS (
         |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS pc FROM (
         |    SELECT cnt,
         |      unnest(list_transform(range(1, len(string_split(rep, ' '))),
         |        i -> string_split(rep, ' ')[i] || ' ' || string_split(rep, ' ')[i+1])) AS pair
         |    FROM r${r - 1} WHERE len(string_split(rep, ' ')) >= 2)
         |  GROUP BY pair
         |), b$r AS (SELECT pair, pc FROM p$r ORDER BY pc DESC, pair LIMIT 1),
         |r$r AS (
         |  SELECT w, cnt, replace(rep, b.pair, replace(b.pair, '| |', '')) AS rep
         |  FROM r${r - 1}, b$r b)""".stripMargin
    }.mkString
    head + body
  }
}
