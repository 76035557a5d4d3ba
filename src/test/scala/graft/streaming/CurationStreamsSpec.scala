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
}
