package graft.queries

import graft.QueryPack
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Text-analysis operators a training-data pipeline runs over raw documents:
 * tokenization stats, composite quality scoring, n-gram language-ID
 * scoring, and content fingerprinting (exact hash + min-shingle rolling
 * fingerprint, the 1-permutation core of MinHash).
 *
 * All expressions are built-in codegen'd functions (split / filter /
 * transform / md5 — no UDFs), so they stay inside WholeStageCodegen and
 * scale as pure map-side work: no shuffle at all for the per-document
 * queries, one partial-agg shuffle for the corpus rollup.
 *
 * Note: the synthetic corpus draws the same vocabulary for every `lang`
 * label, so the language-ID heuristic cannot actually discriminate here —
 * the query pins the *mechanism* (per-language marker-token profiles,
 * ratio scoring, deterministic argmax) against the oracle.
 *
 * Determinism: token splitting is a fixed regex on trimmed text; ratios
 * are IEEE double ops in identical shapes on both engines, rounded via
 * round6; md5 is byte-identical everywhere.
 */
object TextQueries extends QueryPack {

  // Token array is materialized as a real column ("toks") before any
  // higher-order function touches it: HOF lambdas are interpreted and
  // re-evaluate nested subtrees per element, so a split() inlined inside
  // transform/filter would re-split the text once per token. As a column
  // it is computed once per row (CollapseProject never inlines a
  // non-cheap alias with multiple uses), and lambdas see an attribute.
  private def toks: Column = col("toks")

  private def withToks(df: DataFrame): DataFrame =
    df.withColumn("toks", split(trim(col("text")), "\\s+"))

  private val enStops = Seq("the", "a", "and", "of", "to", "in")
  private val deStops = Seq("der", "die", "das", "und", "ist")
  private val frStops = Seq("le", "la", "et", "les", "des")
  private val esStops = Seq("el", "lo", "y", "una", "los")

  private def hits(words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  // The raw documents file is small in bytes but the derived work (regex
  // split + per-token hashing) is CPU-bound, so a byte-sized scan
  // partitioning (1-2 tasks) starves the cluster; spread() repartitions
  // BEFORE the heavy projections only when the scan is under-parallel.
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
    // Per-document token statistics.
    "text_token_stats" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          size(toks).as("n_tokens"),
          length(col("text")).as("n_chars"),
          round6(length(array_join(toks, "")).cast("double") / size(toks))
            .as("avg_token_len"))
        .orderBy(col("doc_id"))),

    // Lexical diversity — type-token ratio plus Guiraud's length-
    // corrected index (types/√tokens; raw TTR shrinks with length, so a
    // long clean doc reads "repetitive" under a flat TTR cut). The
    // repetitive flag is the cross-multiplied TTR < 0.2 band. Map-only:
    // array_distinct + size on the already-materialized token column.
    "text_ttr" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("n_types", size(array_distinct(toks)))
        .withColumn("n_tokens", size(toks))
        .select(col("doc_id"), col("n_types"), col("n_tokens"),
          round6(col("n_types") / col("n_tokens")).as("ttr"),
          round6(col("n_types") / sqrt(col("n_tokens"))).as("guiraud"),
          (col("n_types") * 5 < col("n_tokens")).as("repetitive"))
        .orderBy(col("doc_id"))),

    // Composite quality score: length, stopword density, token shape.
    // Character-level Shannon entropy per doc — the gibberish/garbage
    // detector orthogonal to the token-ratio quality score (mojibake and
    // base64 blobs read HIGH, stuck-key repetition reads LOW; natural
    // text sits in a band, and the band check is the filter). Exactness:
    // each character's term -p·log2(p) is round6'd (p is an exact
    // integer ratio; log2 is the one libm call) and the per-doc sum runs
    // as DECIMAL — order-free, so partitioning can't change the hash.
    // Shape: one explode to (doc, char) + two partial aggs; at 100 TB
    // the explode is map-side and the grain is bounded by |alphabet| per
    // doc.
    "text_entropy_score" -> ((s, dir) => {
      // split on the empty pattern = ONE linear pass per doc; the
      // transform(sequence, i -> substring(t, i, 1)) spelling is O(n²)
      // per doc (UTF8 substring re-scans bytes up to i every call) and
      // benched 5.8s vs sub-second for this
      val chars = spread(t(s, dir, "documents"), "doc_id")
        .select(col("doc_id"),
          explode(split(trim(col("text")), "")).as("ch"))
        .filter(length(col("ch")) > 0)
      val freq = chars.groupBy(col("doc_id"), col("ch"))
        .agg(count(lit(1)).as("cnt"))
      val total = freq.groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("tot"))
      freq.join(total, "doc_id")
        .withColumn("p", col("cnt").cast("double") / col("tot"))
        .withColumn("term",
          round6(-col("p") * log2(col("p"))).cast(DecimalType(27, 6)))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_distinct_chars"),
          sum(col("term")).cast("double").as("entropy_bits"))
        .select(col("doc_id"), col("n_distinct_chars"),
          round6(col("entropy_bits")).as("entropy_bits"),
          (col("entropy_bits") >= 2.0 && col("entropy_bits") <= 5.5)
            .as("in_natural_band"))
        .orderBy(col("doc_id"))
    }),

    "text_quality_score" -> ((s, dir) => {
      val nTokens = size(toks).cast("double")
      val stopRatio = hits(enStops).cast("double") / nTokens
      val meanLen = length(array_join(toks, "")).cast("double") / nTokens
      val score = least(nTokens / 200.0, lit(1.0)) * 0.5 +
        least(stopRatio * 5.0, lit(1.0)) * 0.3 +
        least(meanLen / 8.0, lit(1.0)) * 0.2
      docs(s, dir)
        .select(col("doc_id"),
          round6(stopRatio).as("stop_ratio"),
          round6(score).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // Language-ID: marker-token profile scoring, deterministic argmax
    // (tie preference en > de > fr > es, 'und' = undetermined when all 0).
    "text_langid" -> ((s, dir) => {
      val n = size(toks).cast("double")
      val (en, de, fr, es) = (hits(enStops).cast("double") / n,
        hits(deStops).cast("double") / n,
        hits(frStops).cast("double") / n,
        hits(esStops).cast("double") / n)
      val best = greatest(en, de, fr, es)
      val guess = when(best === 0.0, lit("und"))
        .when(en === best, lit("en"))
        .when(de === best, lit("de"))
        .when(fr === best, lit("fr"))
        .otherwise(lit("es"))
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          round6(en).as("score_en"), guess.as("lang_guess"))
        .orderBy(col("doc_id"))
    }),

    // Language-ID confusion matrix: labeled lang × guessed lang counts —
    // the model-eval rollup run after any classifier pass (here the
    // marker-token heuristic above). One partial-agg shuffle.
    "text_langid_confusion" -> ((s, dir) => {
      val n = size(toks).cast("double")
      val (en, de, fr, es) = (hits(enStops).cast("double") / n,
        hits(deStops).cast("double") / n,
        hits(frStops).cast("double") / n,
        hits(esStops).cast("double") / n)
      val best = greatest(en, de, fr, es)
      val guess = when(best === 0.0, lit("und"))
        .when(en === best, lit("en"))
        .when(de === best, lit("de"))
        .when(fr === best, lit("fr"))
        .otherwise(lit("es"))
      docs(s, dir)
        .select(col("lang"), guess.as("lang_guess"))
        .groupBy(col("lang"), col("lang_guess"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_guess"))
    }),

    // Fingerprints: exact-content md5 + min 5-token-shingle hash (the
    // single-permutation core of MinHash; full MinHash/LSH in DedupQueries).
    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          md5(trim(col("text")).cast("binary")).as("content_fp"),
          when(size(toks) >= 5,
            array_min(transform(
              sequence(lit(1), size(toks) - 4),
              i => md5(concat_ws(" ", slice(toks, i, lit(5))).cast("binary")))))
            .as("min_shingle_fp"))
        .orderBy(col("doc_id"))),

    // PII scrubbing: redact emails and phone-shaped digit runs, count
    // redactions, fingerprint the scrubbed text. The corpus is synthetic
    // (no real PII), so each doc is deterministically augmented with one
    // email and one phone BEFORE scrubbing — the operator then provably
    // finds and removes them. Map-only regex work, no UDFs; patterns stay
    // in the Java/RE2 common subset (no lookahead/backrefs) so the oracle
    // evaluates them identically.
    "text_pii_scrub" -> ((s, dir) => {
      val aug = concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or 555-123-"), col("doc_id"))
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "[0-9]{3}-[0-9]{3}-[0-9]+"
      t(s, dir, "documents")
        .withColumn("aug", aug)
        .select(col("doc_id"),
          size(regexp_extract_all(col("aug"), lit(email), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("aug"), lit(phone), lit(0))).as("n_phones"),
          md5(regexp_replace(regexp_replace(col("aug"), email, "<EMAIL>"),
            phone, "<PHONE>").cast("binary")).as("scrubbed_fp"))
        .orderBy(col("doc_id"))
    }),

    // BPE-ish subword counting: a GPT-2-style pre-tokenizer regex
    // (letter runs | single digits | punctuation runs), restricted to the
    // Java/RE2 common subset. chars-per-token is the compression-ratio
    // proxy quality filters threshold on.
    "text_bpe_token_count" -> ((s, dir) => {
      val bpe = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"
      val n = size(regexp_extract_all(trim(col("text")), lit(bpe), lit(0)))
      t(s, dir, "documents")
        .select(col("doc_id"),
          n.as("n_bpe_tokens"),
          round6(when(n === 0, 0.0)
            .otherwise(length(col("text")).cast("double") / n)).as("chars_per_token"))
        .orderBy(col("doc_id"))
    }),

    // Overlapping-window chunking: split each document into 50-token
    // chunks with 10-token overlap (stride 40) — the embedding/RAG prep
    // step. Pure map-side: chunk indices come from sequence(), chunks
    // from slice(); one output row per chunk, no shuffle at all.
    "text_chunk" -> ((s, dir) => {
      val chunk = lit(50)
      val stride = lit(40)
      val n = size(toks)
      val nChunks = when(n <= chunk, lit(1L))
        .otherwise(ceil((n - chunk).cast("double") / stride) + 1)
      docs(s, dir)
        .withColumn("ci", explode(sequence(lit(0L), nChunks - 1)))
        .withColumn("chunk", slice(toks, (col("ci") * stride + 1).cast("int"), chunk))
        .select(col("doc_id"), col("ci").cast("int").as("chunk_idx"),
          size(col("chunk")).as("n_chunk_tokens"),
          md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Repetition metrics (the Gopher-rule family): duplicate-trigram
    // fraction (map-only HOF arithmetic) and the fraction of bigram slots
    // taken by the single most frequent bigram (explode → partial-agg
    // count → per-doc max/sum — one shuffle keyed by doc, no pairwise
    // work). High values flag the boilerplate/spam documents a training
    // pipeline drops.
    // Corpus-LM quality scoring: per-document mean unigram surprisal
    // (-ln p(token), MLE over the corpus itself) and its exp (a
    // unigram perplexity) — the classic "how unusual is this document's
    // vocabulary" filter a pretraining pipeline runs before the expensive
    // model-based scorers. Scale shape: the token-occurrence table feeds
    // BOTH the LM aggregation and the scoring join (checkpointed once,
    // like the tfidf postings); term frequencies join back on the term
    // key (AQE broadcasts when the vocab is small), the corpus total is
    // a 1-row broadcast, and the per-doc mean is one partial-agg shuffle.
    "text_unigram_surprisal" -> ((s, dir) => {
      val tok = docs(s, dir)
        .select(col("doc_id"), explode(toks).as("term"))
        .filter(length(col("term")) > 0)
        .localCheckpoint()
      val lm = tok.groupBy(col("term")).agg(count(lit(1)).as("tf"))
      val total = tok.agg(count(lit(1)).as("n_total"))
      tok.join(lm, "term").crossJoin(broadcast(total))
        .select(col("doc_id"),
          (-log(col("tf").cast("double") / col("n_total").cast("double")))
            .as("surprisal"))
        .groupBy(col("doc_id"))
        // exact DECIMAL sum, not avg(): the term-hash shuffle scatters a
        // doc's tokens across partitions, so a double sum's order is
        // task-completion-dependent — the label_centroid rule applies
        .agg(count(lit(1)).as("n_tokens"),
          (sum(col("surprisal").cast(DecimalType(27, 9))).cast("double") /
            count(lit(1))).as("mean_raw"))
        .select(col("doc_id"), col("n_tokens"),
          round6(col("mean_raw")).as("avg_surprisal"),
          round6(exp(col("mean_raw"))).as("unigram_ppl"))
        .orderBy(col("doc_id"))
    }),

    "text_repetition" -> ((s, dir) => {
      val tri = when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i, lit(3)))))
        .otherwise(array().cast("array<string>"))
      val bi = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>"))
      // Materialization barrier: without it the explode side's implicit
      // size(bi) > 0 filter is pushed into the scan with the bigram
      // transform INLINED — and inside an interpreted HOF lambda the
      // un-materialized split(trim(text)) re-splits the text once per
      // element (measured 5x slowdown on the bench corpus). The n-gram
      // arrays are consumed twice anyway (ratio side + explode side).
      val base = docs(s, dir)
        .select(col("doc_id"), tri.as("tri"), bi.as("bi"))
        .withColumn("n_tri", size(col("tri")))
        .localCheckpoint()
        .withColumn("dup_trigram_ratio",
          when(col("n_tri") > 0, round6(lit(1.0) -
            size(array_distinct(col("tri"))).cast("double") / col("n_tri")))
            .otherwise(lit(0.0)))
      val biCounts = base.select(col("doc_id"), explode(col("bi")).as("bg"))
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_bi"))
      base.select(col("doc_id"), col("dup_trigram_ratio"))
        .join(biCounts, Seq("doc_id"), "left")
        .select(col("doc_id"), col("dup_trigram_ratio"),
          round6(coalesce(col("top_c").cast("double") / col("n_bi").cast("double"),
            lit(0.0))).as("top_bigram_ratio"))
        .orderBy(col("doc_id"))
    }),

    // Per-document surprisal under a corpus BIGRAM LM — the sequel to
    // text_unigram_surprisal that scores word ORDER, not just vocabulary
    // (a shuffled document keeps its unigram ppl but its bigram ppl
    // explodes — the signal quality filters use against scrambled/
    // boilerplate text). Conditional MLE p(w2|w1) = c(w1,w2) / c(w1,·)
    // needs no smoothing when the corpus scores itself (every observed
    // bigram has c >= 1). Scale shape mirrors the unigram query: the
    // bigram-occurrence table is checkpointed ONCE and feeds both LM
    // aggregations and the scoring join; joins are on (w1,w2)/(w1) keys
    // (AQE broadcasts the vocab-sized sides when small), and the per-doc
    // mean goes through the exact-DECIMAL sum so shuffle order cannot
    // perturb the double.
    "text_bigram_surprisal" -> ((s, dir) => {
      val bi = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => struct(element_at(toks, i).as("w1"),
            element_at(toks, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
      val pairs = docs(s, dir)
        .select(col("doc_id"), explode(bi).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .localCheckpoint()
      val lm2 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val lm1 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      pairs.join(lm2, Seq("w1", "w2")).join(lm1, Seq("w1"))
        .select(col("doc_id"),
          (-log(col("c2").cast("double") / col("c1").cast("double")))
            .as("surprisal"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          (sum(col("surprisal").cast(DecimalType(27, 9))).cast("double") /
            count(lit(1))).as("mean_raw"))
        .select(col("doc_id"), col("n_bigrams"),
          round6(col("mean_raw")).as("avg_surprisal"),
          round6(exp(col("mean_raw"))).as("bigram_ppl"))
        .orderBy(col("doc_id"))
    }),

    // Corpus rollup per (lang, source): partial-agg friendly single shuffle.
    "text_corpus_stats" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang"), col("source"), size(toks).as("n_tokens"),
          col("n_chars"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          (sum(col("n_chars").cast(DecimalType(18, 0))).cast("double") /
            count(lit(1))).as("avg_chars_raw"))
        .select(col("lang"), col("source"), col("n_docs"), col("total_tokens"),
          round6(col("avg_chars_raw")).as("avg_chars"))
        .orderBy(col("lang"), col("source"))),

    // Unicode NFC canonicalization audit — the ingest-pipeline step that
    // makes exact dedup see through composed-vs-decomposed encodings of
    // the same visible text ("é" as U+00E9 vs U+0065+U+0301). The fixture
    // text is ASCII, so a decomposed variant is constructed determin-
    // istically (every 'e' gains a combining acute, U+0301) and the graft
    // `nfc_normalize` expression (codegen'd Catalyst, registered as SQL
    // by GraftExtensions) must re-compose it exactly as DuckDB's built-in
    // nfc_normalize does: per-language char counts before/after plus a
    // content-hash rider prove byte-identical normalization. Map-only +
    // one partial agg; the NFC helper short-circuits on already-
    // normalized input, so at 100 TB the common case is one scan, not a
    // per-row rewrite.
    "text_normalize_nfc" -> ((s, dir) => {
      import org.apache.spark.sql.graftbridge.Bridge
      val denorm = regexp_replace(substring(col("text"), 1, 80), "e", "e\u0301")
      t(s, dir, "documents")
        .select(col("lang"), denorm.as("denorm"))
        .withColumn("nfc",
          Bridge.column(graft.functions.NfcNormalize(
            Bridge.expression(col("denorm")))))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("denorm"))).as("sum_len_raw"),
          sum(length(col("nfc"))).as("sum_len_nfc"),
          sum(when(col("nfc") =!= col("denorm"), 1L).otherwise(0L))
            .as("n_changed"),
          sum(conv(substring(md5(col("nfc").cast("binary")), 1, 8), 16, 10)
            .cast("long")).as("content_hash"))
        .orderBy(col("lang"))
    })
  )

  private val toksSql = "string_split_regex(trim(text), '\\s+')"
  private def hitsSql(words: Seq[String]): String =
    s"len(list_filter($toksSql, t -> t IN (${words.map(w => s"'$w'").mkString(",")})))"

  override def oracleSql: Map[String, String] = Map(
    "text_ttr" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CAST(len(list_distinct($toksSql)) AS INTEGER) AS n_types,
         |    CAST(len($toksSql) AS INTEGER) AS n_tokens
         |  FROM documents
         |)
         |SELECT doc_id, n_types, n_tokens,
         |  ${r6("n_types / CAST(n_tokens AS DOUBLE)")} AS ttr,
         |  ${r6("n_types / sqrt(CAST(n_tokens AS DOUBLE))")} AS guiraud,
         |  n_types * 5 < n_tokens AS repetitive
         |FROM d ORDER BY doc_id""".stripMargin
    },
    "text_entropy_score" -> {
      val r6 = graft.QueryPack.round6Sql _
      val p = "(CAST(cnt AS DOUBLE) / tot)"
      s"""WITH tx AS (
         |  SELECT doc_id, trim(text) AS t FROM documents
         |), ch AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, length(t) + 1), i -> t[i:i])) AS ch
         |  FROM tx
         |), freq AS (
         |  SELECT doc_id, ch, count(*) AS cnt FROM ch GROUP BY doc_id, ch
         |), tot AS (
         |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS tot
         |  FROM freq GROUP BY doc_id
         |), terms AS (
         |  SELECT f.doc_id,
         |    CAST(${r6(s"-$p * log2($p)")} AS DECIMAL(27,6)) AS term
         |  FROM freq f JOIN tot USING (doc_id)
         |), e AS (
         |  SELECT doc_id, count(*) AS n_distinct_chars,
         |    CAST(CAST(sum(term) AS VARCHAR) AS DOUBLE) AS entropy_bits
         |  FROM terms GROUP BY doc_id
         |)
         |SELECT doc_id, n_distinct_chars,
         |  ${r6("entropy_bits")} AS entropy_bits,
         |  entropy_bits >= 2.0 AND entropy_bits <= 5.5 AS in_natural_band
         |FROM e ORDER BY doc_id""".stripMargin
    },
    "text_token_stats" ->
      s"""SELECT doc_id, lang,
         |  len($toksSql) AS n_tokens,
         |  length(text) AS n_chars,
         |  ${graft.QueryPack.round6Sql(
            s"CAST(length(array_to_string($toksSql, '')) AS DOUBLE) / len($toksSql)")} AS avg_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality_score" -> {
      val n = s"CAST(len($toksSql) AS DOUBLE)"
      val stopRatio = s"(CAST(${hitsSql(enStops)} AS DOUBLE) / $n)"
      val meanLen = s"(CAST(length(array_to_string($toksSql, '')) AS DOUBLE) / $n)"
      val score = s"least($n / 200.0, 1.0) * 0.5 + least($stopRatio * 5.0, 1.0) * 0.3 + " +
        s"least($meanLen / 8.0, 1.0) * 0.2"
      s"""SELECT doc_id,
         |  ${graft.QueryPack.round6Sql(stopRatio)} AS stop_ratio,
         |  ${graft.QueryPack.round6Sql(score)} AS quality
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "text_langid" -> {
      val n = s"CAST(len($toksSql) AS DOUBLE)"
      def r(ws: Seq[String]) = s"(CAST(${hitsSql(ws)} AS DOUBLE) / $n)"
      val (en, de, fr, es) = (r(enStops), r(deStops), r(frStops), r(esStops))
      val best = s"greatest($en, $de, $fr, $es)"
      s"""SELECT doc_id, lang,
         |  ${graft.QueryPack.round6Sql(en)} AS score_en,
         |  CASE WHEN $best = 0.0 THEN 'und'
         |       WHEN $en = $best THEN 'en'
         |       WHEN $de = $best THEN 'de'
         |       WHEN $fr = $best THEN 'fr'
         |       ELSE 'es' END AS lang_guess
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "text_langid_confusion" -> {
      val n = s"CAST(len($toksSql) AS DOUBLE)"
      def r(ws: Seq[String]) = s"(CAST(${hitsSql(ws)} AS DOUBLE) / $n)"
      val (en, de, fr, es) = (r(enStops), r(deStops), r(frStops), r(esStops))
      val best = s"greatest($en, $de, $fr, $es)"
      s"""WITH g AS (
         |  SELECT lang,
         |    CASE WHEN $best = 0.0 THEN 'und'
         |         WHEN $en = $best THEN 'en'
         |         WHEN $de = $best THEN 'de'
         |         WHEN $fr = $best THEN 'fr'
         |         ELSE 'es' END AS lang_guess
         |  FROM documents
         |)
         |SELECT lang, lang_guess, count(*) AS n FROM g
         |GROUP BY lang, lang_guess ORDER BY lang, lang_guess""".stripMargin
    },
    "text_fingerprint" ->
      s"""WITH tok AS (SELECT doc_id, trim(text) AS txt, $toksSql AS toks FROM documents)
         |SELECT doc_id, md5(txt) AS content_fp,
         |  CASE WHEN len(toks) >= 5 THEN
         |    list_min(list_transform(range(1, len(toks) - 3),
         |      i -> md5(array_to_string(toks[i:i+4], ' '))))
         |  ELSE NULL END AS min_shingle_fp
         |FROM tok ORDER BY doc_id""".stripMargin,
    "text_pii_scrub" -> {
      val aug = "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
        "'@example.com or 555-123-' || CAST(doc_id AS VARCHAR)"
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "[0-9]{3}-[0-9]{3}-[0-9]+"
      s"""WITH a AS (SELECT doc_id, $aug AS aug FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(aug, '$email')) AS n_emails,
         |  len(regexp_extract_all(aug, '$phone')) AS n_phones,
         |  md5(regexp_replace(regexp_replace(aug, '$email', '<EMAIL>', 'g'),
         |    '$phone', '<PHONE>', 'g')) AS scrubbed_fp
         |FROM a ORDER BY doc_id""".stripMargin
    },
    "text_bpe_token_count" -> {
      val n = "len(regexp_extract_all(trim(text), '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+'))"
      s"""SELECT doc_id,
         |  $n AS n_bpe_tokens,
         |  ${graft.QueryPack.round6Sql(
          s"CASE WHEN $n = 0 THEN 0.0 ELSE CAST(length(text) AS DOUBLE) / $n END")} AS chars_per_token
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "text_chunk" ->
      s"""WITH tok AS (
         |  SELECT doc_id, $toksSql AS toks, len($toksSql) AS n FROM documents
         |), c AS (
         |  SELECT doc_id, toks,
         |    unnest(range(CASE WHEN n <= 50 THEN 1
         |      ELSE CAST(ceil((n - 50) / 40.0) AS BIGINT) + 1 END)) AS ci
         |  FROM tok
         |)
         |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_idx,
         |  CAST(len(toks[ci*40+1 : ci*40+50]) AS INTEGER) AS n_chunk_tokens,
         |  md5(array_to_string(toks[ci*40+1 : ci*40+50], ' ')) AS chunk_fp
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "text_bigram_surprisal" -> {
      // same exact-DECIMAL mean + VARCHAR-cast conversion as the unigram
      // oracle, over conditional bigram probabilities
      val mean = "CAST(CAST(sum(CAST(-ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))" +
        " AS DECIMAL(27,9))) AS VARCHAR) AS DOUBLE) / count(*)"
      s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |idx AS (
         |  SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM tok),
         |pairs AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM idx),
         |lm2 AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY 1, 2),
         |lm1 AS (SELECT w1, count(*) AS c1 FROM pairs GROUP BY 1)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  ${graft.QueryPack.round6Sql(mean)} AS avg_surprisal,
         |  ${graft.QueryPack.round6Sql(s"exp($mean)")} AS bigram_ppl
         |FROM pairs JOIN lm2 USING (w1, w2) JOIN lm1 USING (w1)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "text_unigram_surprisal" -> {
      // exact DECIMAL sum / count with the VARCHAR-cast conversion rule,
      // spelled identically to the Spark side (mean of doubles is
      // summation-order-dependent; the DECIMAL path is not)
      val mean = "CAST(CAST(sum(CAST(-ln(CAST(tf AS DOUBLE) / CAST(n_total AS DOUBLE))" +
        " AS DECIMAL(27,9))) AS VARCHAR) AS DOUBLE) / count(*)"
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_filter($toksSql, t -> len(t) > 0)) AS term
         |  FROM documents
         |), lm AS (SELECT term, count(*) AS tf FROM tok GROUP BY term),
         |tot AS (SELECT count(*) AS n_total FROM tok)
         |SELECT doc_id, count(*) AS n_tokens,
         |  ${graft.QueryPack.round6Sql(mean)} AS avg_surprisal,
         |  ${graft.QueryPack.round6Sql(s"exp($mean)")} AS unigram_ppl
         |FROM tok JOIN lm USING (term), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "text_repetition" -> {
      val tri = s"list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))"
      val bi = s"list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])"
      s"""WITH tok AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |base AS (
         |  SELECT doc_id, $tri AS tri, $bi AS bi, len($tri) AS n_tri FROM tok
         |), dup AS (
         |  SELECT doc_id,
         |    CASE WHEN n_tri > 0 THEN ${graft.QueryPack.round6Sql(
            "1.0 - CAST(len(list_distinct(tri)) AS DOUBLE) / n_tri")}
         |    ELSE 0.0 END AS dup_trigram_ratio,
         |    bi
         |  FROM base
         |), bic AS (
         |  SELECT doc_id, bg, count(*) AS c
         |  FROM (SELECT doc_id, unnest(bi) AS bg FROM dup) GROUP BY doc_id, bg
         |), topbi AS (
         |  SELECT doc_id, max(c) AS top_c, sum(c) AS n_bi FROM bic GROUP BY doc_id
         |)
         |SELECT d.doc_id, d.dup_trigram_ratio,
         |  ${graft.QueryPack.round6Sql(
            "coalesce(CAST(t.top_c AS DOUBLE) / CAST(t.n_bi AS DOUBLE), 0.0)")} AS top_bigram_ratio
         |FROM dup d LEFT JOIN topbi t ON d.doc_id = t.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    "text_corpus_stats" ->
      s"""SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens,
         |  ${graft.QueryPack.round6Sql(
            "CAST(CAST(sum(CAST(n_chars AS DECIMAL(18,0))) AS VARCHAR) AS DOUBLE) / count(*)")} AS avg_chars
         |FROM documents
         |GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "text_normalize_nfc" ->
      // chr(769) = U+0301 combining acute; DuckDB regexp_replace needs
      // the 'g' flag to match Spark's replace-all default. DuckDB's
      // nfc_normalize is the reference semantics for the graft expression.
      s"""WITH d AS (
         |  SELECT lang,
         |    regexp_replace(substr(text, 1, 80), 'e', 'e' || chr(769), 'g') AS denorm
         |  FROM documents
         |), n AS (SELECT lang, denorm, nfc_normalize(denorm) AS nfc FROM d)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(length(denorm)) AS BIGINT) AS sum_len_raw,
         |  CAST(sum(length(nfc)) AS BIGINT) AS sum_len_nfc,
         |  CAST(sum(CASE WHEN nfc <> denorm THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
         |  CAST(sum(CAST(('0x' || substr(md5(nfc), 1, 8)) AS BIGINT)) AS BIGINT) AS content_hash
         |FROM n GROUP BY lang ORDER BY lang""".stripMargin
  )
}
