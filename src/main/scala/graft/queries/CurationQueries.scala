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

  /** 16-dim signed hashed term-frequency vector per doc as (doc_id, dim,
    * weight) rows: dim and sign both come from md5(token), weights are
    * exact signed-count integers. Shared by `corpus_feature_hashing` and
    * `search_hashed_cosine`. */
  private def hashedFeatures(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    spread(t(s, dir, "documents"), "doc_id")
      .select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("h", md5(col("token").cast("binary")))
      .select(col("doc_id"),
        (conv(substring(col("h"), 1, 8), 16, 10).cast("long") % 16).as("dim"),
        when(conv(substring(col("h"), 9, 1), 16, 10).cast("long") % 2 === 0,
          1L).otherwise(-1L).as("sign"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("sign")).as("weight"))

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

    // Temperature-scaled language mixture — the multilingual sampling
    // weights an LM pretraining run uses: the raw share p_l = n_l/N is
    // flattened to w_l ∝ p_l^α so low-resource languages sample up
    // (α here 0.5 = sqrt, which is IEEE-exact on both engines — pow()
    // with a fractional exponent is NOT correctly rounded and would be
    // a latent cross-engine hash split; α is the caller's dial). The
    // normalizer Z is a 5-row sum but still rides exact DECIMAL —
    // double summation order is partition-dependent at ANY size. One
    // aggregation + two 1-row broadcasts; the corpus is scanned once.
    "corpus_temperature_mix" -> ((s, dir) => {
      val budget = 200.0 // docs per epoch drawn from the mixture
      val counts = t(s, dir, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
      val tot = counts.agg(sum(col("n_docs")).as("n_total"))
      val pw = counts.crossJoin(broadcast(tot))
        .withColumn("p_raw", col("n_docs").cast("double") / col("n_total"))
        .withColumn("pa", round6(sqrt(col("p_raw"))))
      val z = pw.agg(sum(col("pa").cast(DecimalType(27, 9)))
        .cast("double").as("z"))
      pw.crossJoin(broadcast(z))
        .withColumn("weight", round6(col("pa") / col("z")))
        .select(col("lang"), col("n_docs"),
          round6(col("p_raw")).as("p_raw"), col("weight"),
          round6(least(lit(1.0), lit(budget) * col("weight") / col("n_docs")))
            .as("sample_rate"))
        .orderBy(col("lang"))
    }),

    // Epoch/repeat planning for a token-budgeted training mixture — the
    // data-recipe step AFTER corpus_temperature_mix: the smoothed weight
    // says how many of the budget's tokens each language SHOULD
    // contribute, dividing by what it HAS gives the repeat factor
    // (epochs), and the cap flags languages the schedule would
    // over-recycle (the ~4-epoch diminishing-returns rule from public
    // data-constrained scaling studies). One groupBy over the corpus;
    // everything after is lang-cardinality arithmetic on 1-row
    // broadcast totals.
    "corpus_epoch_plan" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .withColumn("n_toks", size(split(trim(col("text")), "\\s+")))
        .groupBy(col("lang"))
        .agg(sum(col("n_toks").cast("long")).as("toks_available"))
      val tot = counts.agg(sum(col("toks_available")).as("toks_total"))
      val pw = counts.crossJoin(broadcast(tot))
        .withColumn("p_raw", col("toks_available").cast("double") / col("toks_total"))
        .withColumn("pa", round6(sqrt(col("p_raw"))))
      val z = pw.agg(sum(col("pa").cast(DecimalType(27, 9)))
        .cast("double").as("z"))
      pw.crossJoin(broadcast(z))
        .withColumn("weight", round6(col("pa") / col("z")))
        .withColumn("target_toks", round6(lit(1e6) * col("weight")))
        .withColumn("epochs", round6(col("target_toks") / col("toks_available")))
        .select(col("lang"), col("toks_available"), col("weight"),
          col("target_toks"), col("epochs"),
          round6(least(col("epochs"), lit(4.0))).as("epochs_capped"),
          (col("epochs") > 4.0).as("over_budget"))
        .orderBy(col("lang"))
    }),

    // Deterministic training-shard plan: shard = first md5 hex char of a
    // seeded doc-id hash (16 shards) — the reproducible epoch sharding a
    // data loader needs (same doc -> same shard, any run, any engine, no
    // rand(), no corpus shuffle: assignment is map-side; the only
    // shuffle is the 16-row balance audit). Emits per-shard doc/token
    // counts and the balance ratio vs the uniform share — the skew
    // check run before writers are sized.
    "corpus_shard_plan" -> ((s, dir) => {
      val nShards = 16
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
        .withColumn("shard", conv(substring(
            md5(concat(lit("shard42:"), col("doc_id").cast("string")).cast("binary")),
            1, 1), 16, 10).cast("int"))
      val shards = docs.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast(DecimalType(18, 0))).cast("long").as("n_tokens"))
      val tot = shards.agg(sum(col("n_docs")).as("total"))
      shards.crossJoin(broadcast(tot))
        .select(col("shard"), col("n_docs"), col("n_tokens"),
          round6(col("n_docs") * lit(nShards.toDouble) / col("total"))
            .as("balance_ratio"))
        .orderBy(col("shard"))
    }),

    // Curriculum quality bins: each language's documents quartiled by
    // the shared quality score (ntile over a TOTAL order — quality then
    // doc_id, so bin edges are deterministic on any engine/partitioning)
    // with per-bin count and quality stats — the plan a curriculum
    // schedule (easy→hard ordering, per-stage mixing) is built from.
    // One scan + one per-lang window + one partial agg.
    "corpus_curriculum_bins" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val q = round6(graft.functions.TextSignals.qualityFromToks(
        split(trim(col("text")), "\\s+")))
      val scored = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), q.as("quality"))
      val w = Window.partitionBy("lang").orderBy(col("quality"), col("doc_id"))
      scored.withColumn("bin", ntile(4).over(w))
        .groupBy(col("lang"), col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          round6(sum(col("quality").cast(DecimalType(27, 9))).cast("double") /
            count(lit(1))).as("mean_quality"),
          min(col("quality")).as("min_quality"),
          max(col("quality")).as("max_quality"))
        .orderBy(col("lang"), col("bin"))
    }),

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

    // Exact-quota stratified sampling: exactly N docs per language,
    // chosen by hash rank (md5 order is a deterministic uniform shuffle;
    // doc_id tie-break). One shuffle on the stratum key; the quota is a
    // per-partition row_number cutoff, not a global sort.
    "corpus_sample_quota" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val rank = md5(concat(lit("quota"), col("doc_id").cast("string")).cast("binary"))
      val w = Window.partitionBy("lang").orderBy(rank, col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 25)
        .select(col("lang"), col("rk"), col("doc_id"))
        .orderBy(col("lang"), col("rk"))
    }),

    // Vocabulary building: global token frequencies, top 50. The classic
    // first step of tokenizer training — explode is map-side, the count
    // is partial-agg (each partition pre-counts its tokens), and the
    // top-k is TakeOrdered, never a full sort.
    "corpus_vocab_topk" -> ((s, dir) =>
      spread(t(s, dir, "documents"), "doc_id")
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)),

    // Skip-gram (center, context) pair extraction — the data-prep pass a
    // word2vec/SGNS embedding run makes over the corpus (Mikolov 2013):
    // every token paired with its neighbors within a ±2 window,
    // DIRECTIONAL (both orders count, as SGNS training does). Entirely
    // map-side: the window pairs come from nested array transforms over
    // the token array (no self-join on position — a join would shuffle
    // every token row to pair it with neighbors already sitting next to
    // it in the same array), then one partial-agg count and a
    // TakeOrdered top-50, the corpus_vocab_topk shape.
    "corpus_skipgram_pairs" -> ((s, dir) => {
      val tk = col("toks")
      val pairs = flatten(transform(sequence(lit(1), size(tk)), i =>
        filter(
          transform(sequence(i - 2, i + 2), j =>
            when(j >= 1 && j <= size(tk) && j =!= i,
              concat_ws(" ", element_at(tk, i), element_at(tk, j)))),
          x => x.isNotNull)))
      spread(t(s, dir, "documents"), "doc_id")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .filter(size(col("toks")) >= 2)
        .select(explode(pairs).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(50)
    }),

    // The SGNS negative-sampling (noise) distribution that pairs with
    // corpus_skipgram_pairs: unigram counts raised to 3/4 (Mikolov
    // 2013's smoothing — flattens the head so frequent words aren't
    // oversampled as negatives), normalized over the top-50 vocabulary.
    // Determinism: each pow term is round6'd (the only libm call), the
    // normalizer is an exact DECIMAL sum of those 6-dp terms
    // (order-free), and the final probability divides exact decimals —
    // the pagerank discipline applied to a sampling table.
    "corpus_negative_sampling" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val top = spread(t(s, dir, "documents"), "doc_id")
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)
        .withColumn("w",
          round6(pow(col("n").cast("double"), 0.75))
            .cast(DecimalType(27, 6)))
        .localCheckpoint()
      val tot = top.agg(sum(col("w")).as("tw"))
      top.crossJoin(broadcast(tot))
        .select(col("token"), col("n"),
          round6(col("w").cast("double") / col("tw").cast("double"))
            .as("prob"))
        .orderBy(col("n").desc, col("token"))
    }),

    // Feature hashing (the hashing trick, Weinberger et al. 2009): each
    // token folds into one of 16 signed buckets via a hash of the token
    // itself, so the featurizer needs NO vocabulary table — the property
    // that makes it the 100 TB featurizer (a vocab join at that scale is
    // a billion-row dimension; the hash is map-side arithmetic). Signed
    // buckets make collisions cancel in expectation instead of biasing
    // upward. Weights stay exact integers (signed term frequencies), so
    // the oracle reproduces the vectors bit-for-bit from md5.
    "corpus_feature_hashing" -> ((s, dir) =>
      hashedFeatures(s, dir).orderBy(col("doc_id"), col("dim"))),

    // Retrieval in the hashed space — cosine top-10 against doc 0's
    // hashed vector, proving the 16-dim signed-bucket geometry is
    // queryable end to end. Dot products and squared norms are exact
    // integer sums (order-free), sqrt/divide are correctly-rounded IEEE,
    // so scores and ranking are bit-identical cross-engine with no
    // verdict skeleton needed. The query vector joins as a 16-row
    // broadcast; only the 10-row answer sorts.
    "search_hashed_cosine" -> ((s, dir) => {
      val fv = hashedFeatures(s, dir).localCheckpoint()
      val q = fv.filter(col("doc_id") === 0)
        .select(col("dim"), col("weight").as("qw"))
      val dots = fv.join(broadcast(q), "dim")
        .groupBy(col("doc_id")).agg(sum(col("weight") * col("qw")).as("dot"))
      val norms = fv.groupBy(col("doc_id"))
        .agg(sum(col("weight") * col("weight")).as("nsq"))
      dots.join(norms, "doc_id")
        .crossJoin(broadcast(norms.filter(col("doc_id") === 0)
          .select(col("nsq").as("qnsq"))))
        .filter(col("doc_id") =!= 0)
        .select(col("doc_id"),
          round6(col("dot") / (sqrt(col("nsq")) * sqrt(col("qnsq"))))
            .as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    }),

    // Bigram collocations: global adjacent-pair frequencies, top 50 —
    // the counting pass behind BPE merge selection and collocation
    // scoring. Same shape as vocab: map-side pair explode, partial-agg
    // count, TakeOrdered. Guarded like shingles: a 1-token doc yields no
    // pairs (sequence(1, 0) would DESCEND, not return empty).
    "corpus_bigrams_topk" -> ((s, dir) => {
      val tk = col("toks")
      val pairs = when(size(tk) >= 2,
        transform(sequence(lit(1), size(tk) - 1),
          i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))))
        .otherwise(array().cast("array<string>"))
      spread(t(s, dir, "documents"), "doc_id")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .select(explode(pairs).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(50)
    }),

    // RAKE-style keyphrase extraction: candidate phrases are maximal
    // runs of non-boundary tokens (split at a fixed stop/boundary list;
    // runs LONGER than 6 tokens are dropped as degenerate — a >6-token
    // stopword-free run in this corpus is noise, not a phrase; classic
    // RAKE instead truncates, a deliberate deviation), a word scores
    // deg(w)/freq(w) over the candidate set (deg = sum of lengths of
    // phrases containing it), and a phrase scores the sum of its words'
    // scores. The synthetic corpus draws one vocabulary, so — like
    // text_langid — the query pins the MECHANISM (island segmentation,
    // degree/frequency stats, deterministic ranking) against the oracle.
    // Scale shape: phrase building is one (doc_id, island) partial agg
    // off a posexplode; the phrase table is checkpointed once and feeds
    // the word-stat agg, the spelling counts, and the scoring join; word
    // scores ride the join as exact DECIMAL so the per-phrase sum is
    // shuffle-order-independent.
    "corpus_keyphrases" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val stops = Seq("the", "a", "fast", "slow", "small", "big")
      val tokd = spread(t(s, dir, "documents"), "doc_id")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "term")))
        .filter(length(col("term")) > 0)
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val phrases = tokd
        .filter(!col("term").isin(stops: _*))
        .withColumn("isl", col("pos") - row_number().over(w))
        .groupBy(col("doc_id"), col("isl"))
        .agg(sort_array(collect_list(struct(col("pos"), col("term")))).as("ps"))
        .select(concat_ws(" ",
          transform(col("ps"), p => p("term"))).as("phrase"),
          size(col("ps")).as("plen"))
        .filter(col("plen") <= 6)
        .localCheckpoint()
      val wordScore = phrases
        .select(explode(split(col("phrase"), " ")).as("term"), col("plen"))
        .groupBy(col("term"))
        .agg((sum(col("plen")).cast("double") / count(lit(1))).as("wscore"))
      val spellings = phrases.groupBy(col("phrase")).agg(count(lit(1)).as("n"))
      spellings
        .select(col("phrase"), explode(split(col("phrase"), " ")).as("term"))
        .join(wordScore, "term")
        .groupBy(col("phrase"))
        .agg(sum(col("wscore").cast(DecimalType(27, 9))).cast("double")
          .as("score_raw"))
        .join(spellings, "phrase")
        .select(col("phrase"), col("n"), round6(col("score_raw")).as("score"))
        .orderBy(col("score").desc, col("n").desc, col("phrase"))
        .limit(25)
    }),

    // Pointwise-mutual-information collocations: which adjacent pairs
    // co-occur far above what their unigram frequencies predict —
    // raw-count top-k (corpus_bigrams_topk) surfaces common pairs of
    // common words; PMI surfaces genuinely associated ones. ONE
    // tokenize pass (checkpointed) feeds the unigram agg, the bigram
    // agg, and the two 1-row broadcast totals; the vocab-sized unigram
    // table joins back on each side of the bigram (AQE broadcasts it).
    // ln runs in the identical IEEE expression shape on both engines
    // (1 ulp << the 6dp rounding grain — the bm25/surprisal argument).
    "corpus_pmi_bigrams" -> ((s, dir) => {
      val tk = col("toks")
      val pairs = when(size(tk) >= 2,
        transform(sequence(lit(1), size(tk) - 1),
          i => struct(element_at(tk, i).as("w1"), element_at(tk, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
      val toksDf = spread(t(s, dir, "documents"), "doc_id")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"), col("toks"))
        .localCheckpoint() // unigram AND bigram sides read it
      val uni = toksDf.select(explode(tk).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("nw"))
      val t1 = broadcast(uni.agg(sum(col("nw")).as("t1")))
      val bi = toksDf.select(explode(pairs).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("nab"))
      val t2 = broadcast(bi.agg(sum(col("nab")).as("t2")))
      bi.filter(col("nab") >= 5)
        .join(uni.select(col("w").as("w1"), col("nw").as("na")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("nw").as("nb")), Seq("w2"))
        .crossJoin(t1).crossJoin(t2)
        .select(col("w1"), col("w2"), col("nab"),
          round6(log(col("nab").cast("double") * col("t1").cast("double") *
            col("t1").cast("double") /
            (col("t2").cast("double") * col("na").cast("double") *
              col("nb").cast("double")))).as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(50)
    }),

    // Per-language ADAPTIVE quality gate: a fixed global cutoff
    // (pipeline_curate's 0.35) over- or under-prunes languages whose
    // score distributions differ; the adaptive form keeps each
    // language's top quartile instead. percent_rank runs in ONE
    // lang-keyed shuffle, and the (quality, doc_id) order makes every
    // rank unique, so the cut is deterministic on both engines. At
    // 100 TB the window is bounded by the largest language shard —
    // the same partitioning every per-source curation pass uses.
    "corpus_quality_adaptive" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val quality = round6(
        graft.functions.TextSignals.qualityFromToks(col("toks")))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("quality"), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"), col("lang"), quality.as("quality"))
        .withColumn("pr", round6(percent_rank().over(w)))
        .filter(col("pr") >= 0.75)
        .select(col("doc_id"), col("lang"), col("quality"), col("pr"))
        .orderBy(col("doc_id"))
    }),

    // The composed curation pipeline — the end-to-end shape this library
    // exists for, as ONE declarative plan Catalyst optimizes whole:
    //   quality filter -> exact dedup (keep canonical) -> hash-gate
    //   sample -> per-lang corpus stats.
    // Everything is map-side until the dedup window's single shuffle on
    // the content fingerprint, then one partial-agg shuffle for the
    // rollup. No intermediate materialization: at 100 TB the stages fuse
    // into two exchanges total.
    "pipeline_curate" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // rounded to 6dp at the row level so the decimal-summed average is
      // exact and order-independent (avg over raw doubles is neither);
      // formula shared with the streaming gate via TextSignals
      val quality = round6(
        graft.functions.TextSignals.qualityFromToks(col("toks")))
      val w = Window.partitionBy("fp").orderBy(col("doc_id"))
      t(s, dir, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .withColumn("quality", quality)
        .filter(col("quality") >= 0.35)
        .withColumn("fp",
          graft.functions.TextSignals.contentFingerprint(col("text")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1) // canonical copy only
        .filter(substring(md5(concat(lit("cur"), col("doc_id").cast("string"))
          .cast("binary")), 1, 1) < "8") // deterministic 50% gate
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("toks")).cast("long")).as("total_tokens"),
          round6(sum(col("quality").cast(DecimalType(9, 6))).cast("double") /
            count(lit(1))).as("avg_quality"))
        .orderBy(col("lang"))
    }),

    // The capstone composition — the pretraining-data prep pipeline as
    // ONE declarative plan Catalyst optimizes whole:
    //   quality gate -> exact-dedup canonical -> 5-gram decontamination
    //   vs the eval split -> per-source token/sequence budget rollup.
    // One tokenize+hash pass over the corpus feeds every stage (the
    // checkpointed base is the per-snapshot feature table a real
    // pipeline persists); then one fp-window shuffle, one gram-keyed
    // semi-join, one doc-keyed join, one rollup. Nothing is pairwise,
    // nothing collects, and every stage reuses the exact operator
    // semantics verified individually above.
    // The STREAMING curation gate (graft.streaming.CurationStreams) in
    // its batch form (unified API), oracle-checked: quality gate on the
    // raw score, then canonical-survivor dedup on the normalized content
    // fingerprint with earliest (ts, doc_id) winning. Event time is
    // synthesized deterministically from doc_id so both engines rank
    // identically.
    "pipeline_curate_stream" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("ts", expr("timestamp_micros(doc_id * 1000000)"))
      graft.streaming.CurationStreams.curatedDocs(docs, minQuality = 0.35)
        .select(col("doc_id"), col("content_fp"),
          round6(col("quality")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "pipeline_pretrain_prep" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tk = col("toks")
      val quality = round6(graft.functions.TextSignals.qualityFromToks(tk))
      val g5 = when(size(tk) >= 5,
        array_distinct(transform(sequence(lit(1), size(tk) - 4),
          i => md5(concat_ws(" ", slice(tk, i, lit(5))).cast("binary")))))
        .otherwise(array().cast("array<string>"))
      val base = t(s, dir, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"), col("source"),
          size(col("toks")).as("n_tokens"),
          quality.as("quality"),
          graft.functions.TextSignals.contentFingerprint(col("text")).as("fp"),
          g5.as("g5"))
        .localCheckpoint()
      val evalGrams = base.filter(col("doc_id") % 10 === 0)
        .select(explode(col("g5")).as("g")).distinct()
      val w = Window.partitionBy("fp").orderBy(col("doc_id"))
      val train = base.filter(col("doc_id") % 10 =!= 0)
        .filter(col("quality") >= 0.35)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      val hits = train.select(col("doc_id"), explode(col("g5")).as("g"))
        .join(evalGrams, Seq("g"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      val contam = when(size(col("g5")) > 0,
        coalesce(col("n_hit"), lit(0L)).cast("double") / size(col("g5")))
        .otherwise(lit(0.0))
      train.join(hits, Seq("doc_id"), "left")
        .filter(contam < 0.5)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("total_tokens"),
          round6(sum(col("quality").cast(DecimalType(9, 6))).cast("double") /
            count(lit(1))).as("avg_quality"))
        .withColumn("n_seqs",
          (floor((col("total_tokens") - 1).cast("double") / 2048.0) + 1).cast("long"))
        .orderBy(col("source"))
    }),

    // Train/eval contamination: eval = every 10th doc by id; train = the
    // rest PLUS re-keyed copies of every 20th doc (synthesized leakage,
    // same construction as dedup_exact). A train doc leaks iff its
    // normalized content fingerprint appears in eval — a semi-join on the
    // 128-bit fingerprint, never a text-to-text comparison.
    // N-gram benchmark contamination (the 13-gram check scaled to the
    // short synthetic docs): eval = every 10th doc; train = the rest PLUS
    // re-keyed copies of every 20th doc (synthesized leakage, same
    // construction as corpus_train_eval_overlap — so eval docs divisible
    // by 20 are fully contaminated and the rest measure background
    // vocabulary overlap). Per eval doc: fraction of its distinct 5-gram
    // hashes that appear anywhere in train. The join is an equi-join on
    // the 128-bit gram hash (shuffle-partitioned by gram, map-side
    // distinct on the train side) — never text-to-text, never pairwise
    // doc-to-doc; exactly the shape that survives a 100 TB train corpus.
    "corpus_ngram_contamination" -> ((s, dir) => {
      val tk = col("toks")
      val g5 = when(size(tk) >= 5,
        array_distinct(transform(sequence(lit(1), size(tk) - 4),
          i => md5(concat_ws(" ", slice(tk, i, lit(5))).cast("binary")))))
        .otherwise(array().cast("array<string>"))
      // ONE md5-shingling pass over the corpus, materialized: both the
      // eval and train sides read the checkpointed gram table instead of
      // recomputing it — and, critically, the explode side's implicit
      // size/isnotnull filter can no longer be pushed into the scan with
      // the md5 transform (and its per-element re-split) inlined, which
      // measured ~2x the whole query's cost. At 100 TB this is the
      // persisted gram table a contamination job builds once per corpus
      // snapshot.
      val withG5 = t(s, dir, "documents")
        .withColumn("toks", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"), g5.as("g5"))
        .localCheckpoint()
      val evalDocs = withG5.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("eval_id"), col("g5"), size(col("g5")).as("n_grams"))
      val trainGrams = withG5
        .filter(col("doc_id") % 10 =!= 0 || col("doc_id") % 20 === 0)
        .select(explode(col("g5")).as("g")).distinct()
      val hits = evalDocs.select(col("eval_id"), explode(col("g5")).as("g"))
        .join(trainGrams, Seq("g"), "left_semi")
        .groupBy(col("eval_id")).agg(count(lit(1)).as("n_hit"))
      val contamination = when(col("n_grams") > 0,
        round6(coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_grams")))
        .otherwise(lit(0.0))
      evalDocs.select(col("eval_id"), col("n_grams"))
        .join(hits, Seq("eval_id"), "left")
        .select(col("eval_id"), col("n_grams"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          contamination.as("contamination"),
          (contamination >= 0.5).as("flagged"))
        .orderBy(col("eval_id"))
    }),

    // Weighted sampling without replacement (Efraimidis–Spirakis): each
    // doc gets key ln(u)/w with u a DETERMINISTIC hash-uniform in (0,1]
    // (52 bits of md5 — no rand(), same reproducibility argument as the
    // hash gates above) and weight w = n_chars; the top-k by key IS a
    // weighted sample without replacement. Distributed shape: map-side
    // key computation + TakeOrderedAndProject — the driver sees k rows,
    // never the corpus, at any scale.
    "corpus_weighted_sample" -> ((s, dir) => {
      val hex = substring(
        md5(concat(lit("wsample"), col("doc_id").cast("string")).cast("binary")), 1, 13)
      val u = (conv(hex, 16, 10).cast("long") + lit(1L)).cast("double") /
        lit(4503599627370496.0) // 2^52
      val key = log(u) / col("n_chars").cast("double")
      t(s, dir, "documents")
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("n_chars"), round6(key).as("es_key"))
        .orderBy(col("es_key").desc, col("doc_id"))
        .limit(20)
    }),

    // Token-budget sequence packing: the concat-and-chunk step that turns
    // curated documents into fixed-length (2048-token) training
    // sequences. Packing is per-source (each source shard packs
    // independently — exactly how a sharded pretraining tokenizer run
    // works), so the running token offset is a window cumsum PARTITIONED
    // by source: parallel across shards, never a global single-partition
    // sort. Emits, per doc, its start offset in the shard stream and the
    // first/last 2048-token sequence it lands in (docs straddle sequence
    // boundaries by design — that is what concat-and-chunk means).
    // All-integer arithmetic: bit-deterministic on any engine.
    "corpus_pack_sequences" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val seqOf = (tokenOffset: org.apache.spark.sql.Column) =>
        floor(tokenOffset.cast("double") / lit(2048.0)).cast("long")
      t(s, dir, "documents")
        .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
        .withColumn("cum", sum(col("n_tokens").cast("long")).over(w))
        .select(col("source"), col("doc_id"), col("n_tokens"),
          (col("cum") - col("n_tokens")).as("start_offset"),
          seqOf(col("cum") - col("n_tokens")).as("seq_first"),
          seqOf(col("cum") - 1).as("seq_last"))
        .withColumn("n_seqs", col("seq_last") - col("seq_first") + 1)
        .orderBy(col("source"), col("doc_id"))
    }),

    "corpus_train_eval_overlap" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val norm = graft.functions.TextSignals.contentFingerprint(col("text"))
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
    }),

    // Privacy audit: k-anonymity over quasi-identifiers. A released
    // training corpus leaks identity when a combination of innocuous
    // attributes (language, source, size band) isolates fewer than K
    // documents — the classic re-identification surface (Sweeney 2002).
    // Emits each equivalence class with its size, the k-anonymity flag,
    // and the class's share of total records-at-risk, so a curation run
    // can suppress or generalize exactly the failing classes.
    // Scale shape: one partial-agg groupBy over the QI tuple; the 1-row
    // global total rides a broadcast cross join, never a second scan —
    // the same plan at 100 TB, with the class table orders smaller than
    // the corpus.
    "corpus_k_anonymity" -> ((s, dir) => {
      val K = 5
      val classes = t(s, dir, "documents")
        .select(col("lang"), col("source"),
          (col("n_chars") - col("n_chars") % 100).as("size_band"))
        .groupBy(col("lang"), col("source"), col("size_band"))
        .agg(count(lit(1)).as("class_size"))
      val total = classes.agg(sum(col("class_size")).as("n_total"))
      classes.crossJoin(broadcast(total))
        .select(col("lang"), col("source"), col("size_band"),
          col("class_size"),
          (col("class_size") >= K).as("k_anonymous"),
          round6(when(col("class_size") < K,
            col("class_size").cast("double") / col("n_total"))
            .otherwise(lit(0.0))).as("risk_share"))
        .orderBy(col("lang"), col("source"), col("size_band"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "corpus_curriculum_bins" -> {
      val r6 = graft.QueryPack.round6Sql _
      val toksSql = "string_split_regex(trim(text), '\\s+')"
      val n = s"CAST(len(toks) AS DOUBLE)"
      val stopRatio = "(CAST(len(list_filter(toks, t -> t IN " +
        "('the','a','and','of','to','in'))) AS DOUBLE) / " + n + ")"
      val meanLen = s"(CAST(length(array_to_string(toks, '')) AS DOUBLE) / $n)"
      val qRaw =
        s"least($n / 200.0, 1.0) * 0.5 + least($stopRatio * 5.0, 1.0) * 0.3 + " +
          s"least($meanLen / 8.0, 1.0) * 0.2"
      s"""WITH scored AS (
         |  SELECT doc_id, lang, ${r6(qRaw)} AS quality
         |  FROM (SELECT doc_id, lang, $toksSql AS toks, text FROM documents)
         |), binned AS (
         |  SELECT lang, quality, ntile(4) OVER (
         |    PARTITION BY lang ORDER BY quality, doc_id) AS bin
         |  FROM scored
         |)
         |SELECT lang, bin, count(*) AS n_docs,
         |  ${r6("CAST(CAST(sum(CAST(quality AS DECIMAL(27,9))) AS VARCHAR) AS DOUBLE) / count(*)")}
         |    AS mean_quality,
         |  min(quality) AS min_quality, max(quality) AS max_quality
         |FROM binned GROUP BY lang, bin
         |ORDER BY lang, bin""".stripMargin
    },
    "corpus_temperature_mix" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH counts AS (
         |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
         |), tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM counts),
         |pw AS (
         |  SELECT lang, n_docs,
         |    CAST(n_docs AS DOUBLE) / n_total AS p_raw,
         |    ${r6("sqrt(CAST(n_docs AS DOUBLE) / n_total)")} AS pa
         |  FROM counts CROSS JOIN tot
         |), z AS (
         |  SELECT CAST(CAST(sum(CAST(pa AS DECIMAL(27,9))) AS VARCHAR) AS DOUBLE) AS z
         |  FROM pw
         |)
         |SELECT lang, n_docs, ${r6("p_raw")} AS p_raw,
         |  ${r6("pa / z")} AS weight,
         |  ${r6(s"least(1.0, 200.0 * (${r6("pa / z")}) / n_docs)")} AS sample_rate
         |FROM pw CROSS JOIN z
         |ORDER BY lang""".stripMargin
    },
    "corpus_epoch_plan" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH counts AS (
         |  SELECT lang,
         |    CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
         |      AS toks_available
         |  FROM documents GROUP BY lang
         |), tot AS (SELECT CAST(sum(toks_available) AS BIGINT) AS toks_total FROM counts),
         |pw AS (
         |  SELECT lang, toks_available,
         |    ${r6("sqrt(CAST(toks_available AS DOUBLE) / toks_total)")} AS pa
         |  FROM counts CROSS JOIN tot
         |), z AS (
         |  SELECT CAST(CAST(sum(CAST(pa AS DECIMAL(27,9))) AS VARCHAR) AS DOUBLE) AS z
         |  FROM pw
         |), planned AS (
         |  SELECT lang, toks_available, ${r6("pa / z")} AS weight,
         |    ${r6(s"1e6 * (${r6("pa / z")})")} AS target_toks
         |  FROM pw CROSS JOIN z
         |)
         |SELECT lang, toks_available, weight, target_toks,
         |  ${r6("target_toks / toks_available")} AS epochs,
         |  ${r6(s"least(${r6("target_toks / toks_available")}, 4.0)")} AS epochs_capped,
         |  (${r6("target_toks / toks_available")}) > 4.0 AS over_budget
         |FROM planned ORDER BY lang""".stripMargin
    },
    "corpus_shard_plan" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH docs AS (
         |  SELECT
         |    strpos('0123456789abcdef',
         |      substr(md5('shard42:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS shard,
         |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens
         |  FROM documents
         |), shards AS (
         |  SELECT CAST(shard AS INTEGER) AS shard, count(*) AS n_docs,
         |    CAST(sum(CAST(n_tokens AS DECIMAL(18,0))) AS BIGINT) AS n_tokens
         |  FROM docs GROUP BY shard
         |), tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM shards)
         |SELECT shard, n_docs, n_tokens,
         |  ${r6("n_docs * 16.0 / total")} AS balance_ratio
         |FROM shards CROSS JOIN tot
         |ORDER BY shard""".stripMargin
    },
    "pipeline_pretrain_prep" -> {
      val toksSql = "string_split_regex(trim(text), '\\s+')"
      val n = s"CAST(len(toks) AS DOUBLE)"
      val stopRatio = "(CAST(len(list_filter(toks, t -> t IN " +
        "('the','a','and','of','to','in'))) AS DOUBLE) / " + n + ")"
      val meanLen = s"(CAST(length(array_to_string(toks, '')) AS DOUBLE) / $n)"
      val q = graft.QueryPack.round6Sql(
        s"least($n / 200.0, 1.0) * 0.5 + least($stopRatio * 5.0, 1.0) * 0.3 + " +
          s"least($meanLen / 8.0, 1.0) * 0.2")
      val contam = "CASE WHEN len(tr.g5) > 0 THEN " +
        "CAST(coalesce(h.n_hit, 0) AS DOUBLE) / len(tr.g5) ELSE 0.0 END"
      s"""WITH scored AS (
         |  SELECT doc_id, source, $toksSql AS toks,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents
         |), base AS (
         |  SELECT doc_id, source, len(toks) AS n_tokens, $q AS quality, fp,
         |    list_distinct(list_transform(range(1, len(toks) - 3),
         |      i -> md5(array_to_string(toks[i:i+4], ' ')))) AS g5
         |  FROM scored
         |), evalg AS (
         |  SELECT DISTINCT unnest(g5) AS g FROM base WHERE doc_id % 10 = 0
         |), train AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |    FROM base WHERE doc_id % 10 <> 0 AND quality >= 0.35
         |  ) WHERE rn = 1
         |), hits AS (
         |  SELECT doc_id, count(*) AS n_hit
         |  FROM (SELECT doc_id, unnest(g5) AS g FROM train) t
         |  WHERE g IN (SELECT g FROM evalg) GROUP BY doc_id
         |), clean AS (
         |  SELECT tr.source, tr.n_tokens, tr.quality
         |  FROM train tr LEFT JOIN hits h ON tr.doc_id = h.doc_id
         |  WHERE ($contam) < 0.5
         |)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |  ${graft.QueryPack.round6Sql(
            "CAST(CAST(sum(CAST(quality AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE) / count(*)")} AS avg_quality,
         |  CAST(floor(CAST(CAST(sum(n_tokens) AS BIGINT) - 1 AS DOUBLE) / 2048.0) + 1 AS BIGINT) AS n_seqs
         |FROM clean GROUP BY source ORDER BY source""".stripMargin
    },
    "corpus_ngram_contamination" -> {
      val contamination = "CASE WHEN n_grams > 0 THEN " +
        graft.QueryPack.round6Sql("CAST(coalesce(n_hit, 0) AS DOUBLE) / n_grams") +
        " ELSE 0.0 END"
      s"""WITH tok AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
         |), g AS (
         |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 3),
         |    i -> md5(array_to_string(toks[i:i+4], ' ')))) AS g5
         |  FROM tok
         |), evald AS (
         |  SELECT doc_id AS eval_id, g5, len(g5) AS n_grams FROM g WHERE doc_id % 10 = 0
         |), traing AS (
         |  SELECT DISTINCT unnest(g5) AS gr FROM g
         |  WHERE doc_id % 10 <> 0 OR doc_id % 20 = 0
         |), hits AS (
         |  SELECT eval_id, count(*) AS n_hit
         |  FROM (SELECT eval_id, unnest(g5) AS gr FROM evald) e
         |  WHERE gr IN (SELECT gr FROM traing)
         |  GROUP BY eval_id
         |), joined AS (
         |  SELECT e.eval_id, CAST(e.n_grams AS INTEGER) AS n_grams,
         |    CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit
         |  FROM evald e LEFT JOIN hits h ON e.eval_id = h.eval_id
         |)
         |SELECT eval_id, n_grams, n_hit,
         |  $contamination AS contamination,
         |  ($contamination) >= 0.5 AS flagged
         |FROM joined ORDER BY eval_id""".stripMargin
    },
    "corpus_weighted_sample" -> {
      val u = "(CAST(CAST('0x' || substr(md5('wsample' || CAST(doc_id AS VARCHAR)), 1, 13) " +
        "AS BIGINT) + 1 AS DOUBLE)) / 4503599627370496.0"
      s"""SELECT doc_id, n_chars,
         |  ${graft.QueryPack.round6Sql(s"ln($u) / CAST(n_chars AS DOUBLE)")} AS es_key
         |FROM documents WHERE n_chars > 0
         |ORDER BY es_key DESC, doc_id LIMIT 20""".stripMargin
    },
    "corpus_pack_sequences" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d
        |)
        |SELECT source, doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
        |  CAST(cum - n_tokens AS BIGINT) AS start_offset,
        |  CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048.0) AS BIGINT) AS seq_first,
        |  CAST(floor(CAST(cum - 1 AS DOUBLE) / 2048.0) AS BIGINT) AS seq_last,
        |  CAST(floor(CAST(cum - 1 AS DOUBLE) / 2048.0) AS BIGINT)
        |    - CAST(floor(CAST(cum - n_tokens AS DOUBLE) / 2048.0) AS BIGINT) + 1 AS n_seqs
        |FROM c ORDER BY source, doc_id""".stripMargin,
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
    "corpus_sample_quota" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('quota' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents
        |)
        |SELECT lang, CAST(rk AS INTEGER) AS rk, doc_id FROM ranked
        |WHERE rk <= 25 ORDER BY lang, rk""".stripMargin,
    "corpus_negative_sampling" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH top AS (
         |  SELECT token, count(*) AS n
         |  FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token
         |        FROM documents)
         |  WHERE length(token) > 0
         |  GROUP BY token ORDER BY n DESC, token LIMIT 50
         |), wt AS (
         |  SELECT token, n,
         |    CAST(${r6("pow(CAST(n AS DOUBLE), 0.75)")} AS DECIMAL(27,6)) AS w
         |  FROM top
         |), tot AS (SELECT sum(w) AS tw FROM wt)
         |SELECT token, n,
         |  ${r6("CAST(CAST(w AS VARCHAR) AS DOUBLE) / CAST(CAST(tw AS VARCHAR) AS DOUBLE)")} AS prob
         |FROM wt, tot ORDER BY n DESC, token""".stripMargin
    },
    "corpus_skipgram_pairs" ->
      """WITH tok AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), pr AS (
        |  SELECT unnest(flatten(list_transform(range(1, len(toks) + 1), i ->
        |    list_transform(
        |      list_filter(range(i - 2, i + 3),
        |        j -> j >= 1 AND j <= len(toks) AND j <> i),
        |      j -> toks[i] || ' ' || toks[j])))) AS pair
        |  FROM tok WHERE len(toks) >= 2
        |)
        |SELECT pair, count(*) AS n FROM pr
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin,
    "corpus_feature_hashing" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents
        |), f AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 16 AS dim,
        |    CASE WHEN CAST(('0x' || substr(md5(token), 9, 1)) AS BIGINT) % 2 = 0
        |      THEN 1 ELSE -1 END AS sign
        |  FROM tok WHERE length(token) > 0
        |)
        |SELECT doc_id, dim, CAST(sum(sign) AS BIGINT) AS weight
        |FROM f GROUP BY doc_id, dim ORDER BY doc_id, dim""".stripMargin,
    "search_hashed_cosine" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
         |  FROM documents
         |), f AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 16 AS dim,
         |    CASE WHEN CAST(('0x' || substr(md5(token), 9, 1)) AS BIGINT) % 2 = 0
         |      THEN 1 ELSE -1 END AS sign
         |  FROM tok WHERE length(token) > 0
         |), fv AS (
         |  SELECT doc_id, dim, CAST(sum(sign) AS BIGINT) AS weight
         |  FROM f GROUP BY doc_id, dim
         |), q AS (SELECT dim, weight AS qw FROM fv WHERE doc_id = 0),
         |dots AS (
         |  SELECT fv.doc_id, CAST(sum(fv.weight * q.qw) AS BIGINT) AS dot
         |  FROM fv JOIN q USING (dim) GROUP BY fv.doc_id
         |), norms AS (
         |  SELECT doc_id, CAST(sum(weight * weight) AS BIGINT) AS nsq
         |  FROM fv GROUP BY doc_id
         |)
         |SELECT d.doc_id,
         |  ${r6("d.dot / (sqrt(n.nsq) * sqrt((SELECT nsq FROM norms WHERE doc_id = 0)))")} AS score
         |FROM dots d JOIN norms n USING (doc_id)
         |WHERE d.doc_id <> 0
         |ORDER BY score DESC, d.doc_id LIMIT 10""".stripMargin
    },
    "corpus_vocab_topk" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents
        |)
        |SELECT token, count(*) AS n FROM toks
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,
    "corpus_bigrams_topk" ->
      """WITH tok AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), pairs AS (
        |  SELECT unnest(list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS bigram
        |  FROM tok
        |)
        |SELECT bigram, count(*) AS n FROM pairs
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50""".stripMargin,
    "corpus_keyphrases" ->
      s"""WITH tok AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
         |  FROM documents),
         |idx AS (
         |  SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, toks
         |  FROM tok),
         |tokd AS (
         |  SELECT doc_id, pos, toks[pos] AS term FROM idx
         |  WHERE len(toks[pos]) > 0),
         |ns AS (
         |  SELECT doc_id, pos, term,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS isl
         |  FROM tokd
         |  WHERE term NOT IN ('the', 'a', 'fast', 'slow', 'small', 'big')),
         |ph AS (
         |  SELECT array_to_string(list(term ORDER BY pos), ' ') AS phrase,
         |    count(*) AS plen
         |  FROM ns GROUP BY doc_id, isl),
         |phr AS (SELECT phrase, plen FROM ph WHERE plen <= 6),
         |wstat AS (
         |  SELECT term, CAST(sum(plen) AS DOUBLE) / count(*) AS wscore
         |  FROM (SELECT unnest(string_split(phrase, ' ')) AS term, plen FROM phr)
         |  GROUP BY term),
         |pc AS (SELECT phrase, count(*) AS n FROM phr GROUP BY phrase),
         |pw AS (
         |  SELECT phrase, unnest(string_split(phrase, ' ')) AS term FROM pc),
         |scored AS (
         |  SELECT phrase,
         |    CAST(CAST(sum(CAST(wscore AS DECIMAL(27,9))) AS VARCHAR) AS DOUBLE)
         |      AS score_raw
         |  FROM pw JOIN wstat USING (term) GROUP BY phrase)
         |SELECT p.phrase, p.n,
         |  ${graft.QueryPack.round6Sql("s.score_raw")} AS score
         |FROM pc p JOIN scored s USING (phrase)
         |ORDER BY score DESC, n DESC, phrase LIMIT 25""".stripMargin,
    "corpus_pmi_bigrams" ->
      """WITH tok AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents
        |), uni AS (
        |  SELECT w, count(*) AS nw FROM (
        |    SELECT unnest(toks) AS w FROM tok)
        |  GROUP BY w
        |), pairs AS (
        |  SELECT unnest(list_transform(range(1, len(toks)),
        |    i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS p
        |  FROM tok
        |), bi AS (
        |  SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS nab
        |  FROM pairs GROUP BY 1, 2
        |), t1s AS (
        |  SELECT CAST(sum(nw) AS BIGINT) AS t1 FROM uni
        |), t2s AS (
        |  SELECT CAST(sum(nab) AS BIGINT) AS t2 FROM bi
        |)
        |SELECT b.w1, b.w2, b.nab,
        |  floor(ln(CAST(b.nab AS DOUBLE) * CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE) /
        |    (CAST(t2 AS DOUBLE) * CAST(u1.nw AS DOUBLE) * CAST(u2.nw AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS pmi
        |FROM bi b
        |JOIN uni u1 ON b.w1 = u1.w
        |JOIN uni u2 ON b.w2 = u2.w
        |CROSS JOIN t1s CROSS JOIN t2s
        |WHERE b.nab >= 5
        |ORDER BY pmi DESC, b.w1, b.w2
        |LIMIT 50""".stripMargin,
    "corpus_quality_adaptive" -> {
      val toksSql = "string_split_regex(trim(text), '\\s+')"
      val n = s"CAST(len(toks) AS DOUBLE)"
      val stopRatio = "(CAST(len(list_filter(toks, t -> t IN " +
        "('the','a','and','of','to','in'))) AS DOUBLE) / " + n + ")"
      val meanLen = s"(CAST(length(array_to_string(toks, '')) AS DOUBLE) / $n)"
      val q = graft.QueryPack.round6Sql(
        s"least($n / 200.0, 1.0) * 0.5 + least($stopRatio * 5.0, 1.0) * 0.3 + " +
          s"least($meanLen / 8.0, 1.0) * 0.2")
      s"""WITH scored AS (
         |  SELECT doc_id, lang, $toksSql AS toks FROM documents
         |), quality AS (
         |  SELECT doc_id, lang, $q AS quality FROM scored
         |), ranked AS (
         |  SELECT doc_id, lang, quality,
         |    ${graft.QueryPack.round6Sql(
               "percent_rank() OVER (PARTITION BY lang ORDER BY quality, doc_id)")} AS pr
         |  FROM quality
         |)
         |SELECT doc_id, lang, quality, pr FROM ranked
         |WHERE pr >= 0.75 ORDER BY doc_id""".stripMargin
    },
    "pipeline_curate_stream" -> {
      val toksSql = "string_split_regex(trim(text), '\\s+')"
      val n = s"CAST(len(toks) AS DOUBLE)"
      val stopRatio = "(CAST(len(list_filter(toks, t -> t IN " +
        "('the','a','and','of','to','in'))) AS DOUBLE) / " + n + ")"
      val meanLen = s"(CAST(length(array_to_string(toks, '')) AS DOUBLE) / $n)"
      // RAW score (the streaming gate filters before rounding); the
      // formula is pure IEEE arithmetic with identical shape on both
      // engines, so the >= cut is bit-identical
      val qRaw =
        s"least($n / 200.0, 1.0) * 0.5 + least($stopRatio * 5.0, 1.0) * 0.3 + " +
          s"least($meanLen / 8.0, 1.0) * 0.2"
      s"""WITH scored AS (
         |  SELECT doc_id, $toksSql AS toks,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_fp
         |  FROM documents
         |), quality AS (
         |  SELECT doc_id, content_fp, $qRaw AS q FROM scored
         |), kept AS (
         |  SELECT * FROM quality WHERE q >= 0.35
         |), canon AS (
         |  SELECT *, row_number() OVER (PARTITION BY content_fp ORDER BY doc_id) AS rn
         |  FROM kept
         |)
         |SELECT doc_id, content_fp, ${graft.QueryPack.round6Sql("q")} AS quality
         |FROM canon WHERE rn = 1 ORDER BY doc_id""".stripMargin
    },
    "pipeline_curate" -> {
      val toksSql = "string_split_regex(trim(text), '\\s+')"
      val n = s"CAST(len(toks) AS DOUBLE)"
      val stopRatio = "(CAST(len(list_filter(toks, t -> t IN " +
        "('the','a','and','of','to','in'))) AS DOUBLE) / " + n + ")"
      val meanLen = s"(CAST(length(array_to_string(toks, '')) AS DOUBLE) / $n)"
      val q = graft.QueryPack.round6Sql(
        s"least($n / 200.0, 1.0) * 0.5 + least($stopRatio * 5.0, 1.0) * 0.3 + " +
          s"least($meanLen / 8.0, 1.0) * 0.2")
      s"""WITH scored AS (
         |  SELECT doc_id, lang, $toksSql AS toks,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |    text
         |  FROM documents
         |), quality AS (
         |  SELECT doc_id, lang, toks, fp, $q AS quality FROM scored
         |), kept AS (
         |  SELECT * FROM quality WHERE quality >= 0.35
         |), canon AS (
         |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |  FROM kept
         |), sampled AS (
         |  SELECT * FROM canon WHERE rn = 1
         |    AND substr(md5('cur' || CAST(doc_id AS VARCHAR)), 1, 1) < '8'
         |)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
         |  ${graft.QueryPack.round6Sql(
            "CAST(CAST(sum(CAST(quality AS DECIMAL(9,6))) AS VARCHAR) AS DOUBLE) / count(*)")} AS avg_quality
         |FROM sampled
         |GROUP BY lang ORDER BY lang""".stripMargin
    },
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
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "corpus_k_anonymity" -> {
      val r6 = graft.QueryPack.round6Sql _
      s"""WITH classes AS (
         |  SELECT lang, source, n_chars - n_chars % 100 AS size_band,
         |    count(*) AS class_size
         |  FROM documents GROUP BY 1, 2, 3
         |), tot AS (SELECT sum(class_size) AS n_total FROM classes)
         |SELECT lang, source, size_band, class_size,
         |  class_size >= 5 AS k_anonymous,
         |  ${r6("CASE WHEN class_size < 5 THEN CAST(class_size AS DOUBLE) / n_total ELSE 0.0 END")} AS risk_share
         |FROM classes CROSS JOIN tot
         |ORDER BY lang, source, size_band""".stripMargin
    }
  )
}
