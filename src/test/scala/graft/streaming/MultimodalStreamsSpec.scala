package graft.streaming

import graft.SparkTestBase
import graft.multimodal.{MediaCodecs, MediaRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** The media ingest gate must admit exactly what the real codecs decode
  * and quarantine the rest — identically in a micro-batch stream and in
  * a batch backfill (the gate is stateless, so parity is structural). */
class MultimodalStreamsSpec extends AnyFunSuite with SparkTestBase {

  private def row(id: Long, modality: String, content: Array[Byte]) =
    MediaRow(id, modality, content, modality match {
      case "image" => "png"; case "audio" => "wav"; case _ => "gif"
    }, 20, 12, 3)

  private val rows = Seq(
    row(1L, "image", MediaCodecs.encodePng(1L, 20, 12)),
    row(2L, "audio", MediaCodecs.encodeWav(2L, 300)),
    row(3L, "video", MediaCodecs.encodeGif(3L, 20, 12, 3)),
    // truncated uploads: valid magic, unreadable body
    row(4L, "image", MediaCodecs.encodePng(4L, 20, 12).take(20)),
    row(5L, "audio", MediaCodecs.encodeWav(5L, 300).take(20)),
    row(6L, "video", MediaCodecs.encodeGif(6L, 20, 12, 3).take(20)),
    // cross-container bytes: a WAV presented as an image
    row(7L, "image", MediaCodecs.encodeWav(7L, 100)))

  private val expected = Map(
    1L -> (true, 20L * 12), 2L -> (true, 300L), 3L -> (true, 3L * 20 * 12),
    4L -> (false, 0L), 5L -> (false, 0L), 6L -> (false, 0L),
    7L -> (false, 0L))

  test("mediaIngestGate: streamed == batch == real-codec verdicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[MediaRow]
    val q = MultimodalStreams.mediaIngestGate(input.toDF())
      .writeStream.format("memory").queryName("media_gate_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(3): _*)
      q.processAllAvailable()
      input.addData(rows.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()

    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.select("media_id", "ok", "n_units").collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap

    val streamed = toMap(spark.table("media_gate_stream"))
    assert(streamed == expected)
    val batch = toMap(MultimodalStreams.mediaIngestGate(rows.toDS().toDF()))
    assert(batch == streamed)
  }
}
