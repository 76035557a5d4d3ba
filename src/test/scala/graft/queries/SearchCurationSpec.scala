package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the search/curation round-4 operators that the
  * row-hash oracle can't express (it proves equality, not meaning). */
class SearchCurationSpec extends AnyFunSuite with SparkTestBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0_001)

  test("search_bm25_topk only returns docs containing a query term, scored > 0") {
    val hits = run("search_bm25_topk")
    assert(hits.count() == 20)
    assert(hits.filter(col("bm25") <= 0.0).isEmpty)
    val withText = hits.join(
      spark.read.parquet(s"$sf0_001/documents.parquet"), "doc_id")
    assert(withText.filter(!col("text").rlike("\\b(join|hash|vector)\\b")).isEmpty)
  }

  test("search_hybrid_rrf scores are bounded by the two-list RRF maximum") {
    val fused = run("search_hybrid_rrf")
    assert(fused.count() == 20)
    val maxRrf = fused.agg(max("rrf")).head.getDouble(0)
    // best possible: rank 1 in both lists = 2/61
    assert(maxRrf <= 2.0 / 61.0 + 1e-9)
    assert(fused.filter(col("rrf") <= 0.0).isEmpty)
  }

  test("text_tfidf_topk emits at most 3 ranked terms per doc, ranks dense from 1") {
    val tk = run("text_tfidf_topk")
    val perDoc = tk.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
    assert(perDoc.filter(col("n") > 3 || col("lo") =!= 1 || col("hi") =!= col("n")).isEmpty)
  }

  test("corpus_ngram_contamination: synthesized-leak eval docs are fully contaminated") {
    val c = run("corpus_ngram_contamination")
    assert(c.filter(col("eval_id") % 10 =!= 0).isEmpty)
    val leaked = c.filter(col("eval_id") % 20 === 0 && col("n_grams") > 0)
    assert(leaked.count() > 0)
    assert(leaked.filter(col("contamination") =!= 1.0 || !col("flagged")).isEmpty)
  }

  test("corpus_pack_sequences: per-source offsets are contiguous and seq spans consistent") {
    val p = run("corpus_pack_sequences")
    assert(p.filter(col("n_seqs") =!= col("seq_last") - col("seq_first") + 1).isEmpty)
    assert(p.filter(col("n_seqs") < 1).isEmpty)
    // the shard stream is gap-free: total tokens == final end offset per source
    val bad = p.groupBy("source")
      .agg(sum(col("n_tokens").cast("long")).as("total"),
        max(col("start_offset") + col("n_tokens")).as("end"))
      .filter(col("total") =!= col("end"))
    assert(bad.isEmpty)
  }

  test("events_anomaly_zscore: moments valid, anomalies a small minority") {
    val z = run("events_anomaly_zscore")
    assert(z.filter(col("std_value") < 0.0).isEmpty)
    assert(z.filter(col("n_anomalies") > col("n_events")).isEmpty)
    // 3-sigma outliers are at most ~11% by Chebyshev; give slack for tiny users
    val worst = z.select(max(col("n_anomalies").cast("double") / col("n_events")))
      .head.getDouble(0)
    assert(worst <= 0.12, s"anomaly fraction $worst implausibly high")
  }

  test("corpus_weighted_sample: keys are negative log-uniforms, heavier docs favored") {
    val ws = run("corpus_weighted_sample")
    assert(ws.count() == 20)
    assert(ws.filter(col("es_key") > 0.0).isEmpty)
    // expectation check: the sampled docs' mean weight exceeds the corpus mean
    val corpusMean = spark.read.parquet(s"$sf0_001/documents.parquet")
      .agg(avg("n_chars")).head.getDouble(0)
    val sampleMean = ws.agg(avg("n_chars")).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean not above corpus mean $corpusMean")
  }

  test("text_repetition ratios are valid fractions") {
    val r = run("text_repetition")
    assert(r.filter(col("dup_trigram_ratio") < 0.0 || col("dup_trigram_ratio") > 1.0 ||
      col("top_bigram_ratio") < 0.0 || col("top_bigram_ratio") > 1.0).isEmpty)
  }

  test("dedup_components: every member reaches its component minimum; survivors unique") {
    val c = SparkEntry.queries("dedup_components")(spark, sf0_001)
    // component_id is the minimum doc_id of the component
    val bad = c.groupBy("component_id")
      .agg(min("doc_id").as("lo"), sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
      .filter(col("lo") =!= col("component_id") || col("n_keep") =!= 1L)
    assert(bad.isEmpty)
  }
}
