package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

case class StreamDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)

/** The continuous curation gate must quality-filter and exact-dedup a
  * document stream exactly like the batch call — including a duplicate
  * arriving in a LATER micro-batch within the watermark horizon. */
class CurationStreamsSpec extends AnyFunSuite with SparkTestBase {

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private val good =
    "the quick brown fox jumps over a lazy dog and runs off to the woods in style " * 4
  private val short = "tiny"

  test("curatedDocs: streamed == batch; cross-batch duplicate dropped; low quality dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch1 = Seq(
      StreamDoc(1L, good, t("2026-01-01 10:00:00")),
      StreamDoc(2L, short, t("2026-01-01 10:00:01")), // fails quality
      StreamDoc(3L, good + "unique tail one", t("2026-01-01 10:00:02")))
    val batch2 = Seq(
      // dup of 1 across batches — differing ONLY in case and internal
      // whitespace, which the canonical fingerprint normalizes away
      StreamDoc(4L, good.replace("fox", "FOX").replace(" ", "  "),
        t("2026-01-01 10:01:00")),
      StreamDoc(5L, good + "unique tail two", t("2026-01-01 10:01:01")))

    val input = MemoryStream[StreamDoc]
    val q = CurationStreams.curatedDocs(input.toDF())
      .writeStream.format("memory").queryName("curated_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("curated_stream")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // 1 survives, 2 fails quality, 3 and 5 unique, 4 is a dup of 1
    assert(streamed == Set(1L, 3L, 5L))

    // unified API: the batch call computes the same curated set
    val batch = CurationStreams.curatedDocs((batch1 ++ batch2).toDS().toDF())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch == streamed)
  }

  test("incrementalDedup: standing-corpus dup, cross-batch dup, and fresh doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextSignals

    // standing corpus knows `good`'s fingerprint
    val refFps = Seq(good).toDF("text")
      .select(TextSignals.contentFingerprint(org.apache.spark.sql.functions.col("text"))
        .as("content_fp"))
    val batch1 = Seq(
      StreamDoc(1L, good + " ", t("2026-01-01 10:00:00")), // dup of REFERENCE
      StreamDoc(2L, good + "fresh tail", t("2026-01-01 10:00:01")))
    val batch2 = Seq(
      StreamDoc(3L, good + "  fresh   tail", t("2026-01-01 10:01:00")), // dup of 2
      StreamDoc(4L, good + "another tail", t("2026-01-01 10:01:01")))

    val input = MemoryStream[StreamDoc]
    val q = CurationStreams.incrementalDedup(input.toDF(), refFps)
      .writeStream.format("memory").queryName("incr_dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("incr_dedup_stream")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == Set(2L, 4L))

    val batch = CurationStreams.incrementalDedup(
      (batch1 ++ batch2).toDS().toDF(), refFps)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch == streamed)
  }

  test("nearDupRejects: near-variant detected once, unrelated doc passes; batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.MinHashSignals

    val refDocs = Seq(
      (100L, good),
      (200L, "completely different reference content that shares no shingles " * 5))
      .toDF("doc_id", "text")
    val (bands, shingles) = MinHashSignals.referenceIndex(refDocs, "doc_id", "text")
    val (bandsCk, shinglesCk) = (bands.localCheckpoint(), shingles.localCheckpoint())

    // near-variant of ref 100: drop the first token
    val variant = good.trim.split("\\s+").drop(1).mkString(" ")
    val unrelated = "entirely novel text with nothing in common at any shingle " * 6
    val batch1 = Seq(StreamDoc(11L, variant, t("2026-01-01 10:00:00")),
      StreamDoc(12L, unrelated, t("2026-01-01 10:00:01")))
    val batch2 = Seq(StreamDoc(13L, variant, t("2026-01-01 10:01:00")))

    val input = MemoryStream[StreamDoc]
    val q = CurationStreams.nearDupRejects(input.toDF(), bandsCk, shinglesCk)
      .writeStream.format("memory").queryName("near_rejects_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("near_rejects_stream")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 11 and 13 both near-match ref 100 (distinct ids -> both emitted,
    // each exactly once despite matching multiple bands); 12 passes
    assert(streamed == Set(11L, 13L))

    val batch = CurationStreams.nearDupRejects(
      (batch1 ++ batch2).toDS().toDF(), bandsCk, shinglesCk)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch == streamed)
  }

  test("dsirGate: stateless admit gate, streamed == batch, signs follow the LM") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.DsirSignals
    import org.apache.spark.sql.functions.col

    // disjoint vocabularies so the learned log-ratios separate cleanly:
    // target = fox prose, background = database prose
    val target = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a fox runs through the woods to hunt at dusk",
      "fox cubs play near the den under tall trees")
    val background = Seq(
      "hash join sort merge table scan filter pushdown",
      "query plan optimizer column row group codec",
      "shuffle partition executor task stage broadcast")
    val corpus = (target.map((_, true)) ++ background.map((_, false)))
      .toDF("text", "is_tgt")
    val lr = DsirSignals.logRatioMap(
      DsirSignals.learnLogRatios(corpus, col("is_tgt")))
    assert(lr.nonEmpty && lr.size <= 256)

    val batch1 = Seq(
      StreamDoc(1L, "the fox jumps through the woods", t("2026-01-01 10:00:00")),
      StreamDoc(2L, "hash join table scan filter plan", t("2026-01-01 10:00:01")))
    val batch2 = Seq(
      StreamDoc(3L, "a fox runs through the woods", t("2026-01-01 10:01:00")))

    val input = MemoryStream[StreamDoc]
    val q = CurationStreams.dsirGate(input.toDF(), lr, minWeight = 0.0)
      .writeStream.format("memory").queryName("dsir_gate_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dsir_gate_stream")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == Set(1L, 3L), "target-like docs admitted, background rejected")

    // unified API: identical plan on the bounded frame
    val gated = CurationStreams.dsirGate(
      (batch1 ++ batch2).toDS().toDF(), lr, minWeight = 0.0)
    val batch = gated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch == streamed)

    // weights carry the LM's sign: every admitted doc positive, and the
    // rejected background doc strictly negative
    val all = CurationStreams.dsirGate(
      (batch1 ++ batch2).toDS().toDF(), lr, minWeight = Double.NegativeInfinity)
      .select("doc_id", "dsir_weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(all(1L) > 0 && all(3L) > 0 && all(2L) < 0)
  }

  test("bpeTokenGate: streamed == batch == greedy-merge reimplementation; budget admits/rejects") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col

    // learn real rules from the fixture corpus (the oracle-checked job)
    val merges = graft.queries.QualityQueries
      .queries("corpus_bpe_learn")(spark, sf0_001)
      .orderBy(col("round_idx")).collect().map(_.getString(1)).toSeq
    assert(merges.size == 8)

    val docs = spark.read.parquet(s"$sf0_001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(30)
      .collect().map(r => StreamDoc(r.getLong(0), r.getString(1),
        t("2026-01-01 10:00:00")))

    // independent Scala reimplementation of the greedy merge: pipe-encode
    // each word, apply the rules in order via String.replace (all
    // non-overlapping occurrences, left-to-right — the same semantics as
    // the engine's literal replace), count symbols
    def countTokens(text: String): Long =
      text.trim.split("\\s+").map { w =>
        var rep = w.map(c => s"|$c|").mkString(" ")
        merges.foreach { rule =>
          val Array(l, r) = rule.split(" ", 2)
          rep = rep.replace(s"|$l| |$r|", s"|$l$r|")
        }
        rep.split(" ").length.toLong
      }.sum

    val expected = docs.map(d => d.doc_id -> countTokens(d.text)).toMap

    val input = MemoryStream[StreamDoc]
    val q = CurationStreams.bpeTokenGate(input.toDF(), merges,
        maxTokens = Long.MaxValue)
      .writeStream.format("memory").queryName("bpe_gate_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(docs.take(15): _*)
      q.processAllAvailable()
      input.addData(docs.drop(15): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("bpe_gate_stream")
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == expected,
      "streamed token counts diverge from the greedy-merge reimplementation")

    // unified API parity on the bounded frame
    val batch = CurationStreams.bpeTokenGate(docs.toSeq.toDS().toDF(),
        merges, maxTokens = Long.MaxValue)
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batch == expected)

    // the budget really gates: a ceiling at the median excludes exactly
    // the above-median docs
    val median = expected.values.toSeq.sorted.apply(expected.size / 2)
    val admitted = CurationStreams.bpeTokenGate(docs.toSeq.toDS().toDF(),
        merges, maxTokens = median)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == expected.filter(_._2 <= median).keySet)
    assert(admitted.nonEmpty && admitted.size < expected.size)
  }
}
