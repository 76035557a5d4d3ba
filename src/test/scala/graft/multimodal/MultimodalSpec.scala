package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private def docs = spark.read.parquet(s"$sf0_001/documents.parquet")

  test("decodeFeaturesStub: deterministic 16-bin normalized histogram") {
    val bytes = "abcabc   ".getBytes("UTF-8")
    val f = MediaCodecs.decodeFeaturesStub(bytes)
    assert(f.length == 16)
    assert(math.abs(f.sum - 1.0f) < 1e-6) // histogram normalizes to 1
    // 'a'..'c' are 0x61-0x63 -> bin 6; ' ' is 0x20 -> bin 2
    assert(f(6) == 6f / 9f && f(2) == 3f / 9f)
    assert(f.sameElements(MediaCodecs.decodeFeaturesStub(bytes)))
  }

  test("sampleFramesStub: evenly spaced, bounded, slice-exact") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val frames = MediaCodecs.sampleFramesStub(bytes, frameSize = 10, n = 3)
    assert(frames.size == 3)
    assert(frames.forall(_.length == 10))
    assert(frames.head.sameElements(bytes.slice(0, 10)))
    // asking for more frames than exist caps at available
    assert(MediaCodecs.sampleFramesStub(bytes, 10, 50).size == 10)
  }

  test("fromDocuments: typed metadata + opaque binary schema") {
    val media = MultimodalOps.fromDocuments(docs)
    val sch = media.schema.map(f => f.name -> f.dataType.typeName).toMap
    assert(sch("content") == "binary")
    assert(sch("modality") == "string" && sch("width") == "integer")
    assert(media.count() == docs.count())
    assert(media.select("modality").distinct().count() == 3)
  }

  test("extractFeatures: one fixed-size vector per media row") {
    val media = MultimodalOps.fromDocuments(docs.filter(col("doc_id") < 30))
    val feats = MultimodalOps.extractFeatures(media).collect()
    assert(feats.length == 30)
    assert(feats.forall(_.features.length == 16))
    // n_bytes matches the payload (text length in bytes)
    val lens = docs.filter(col("doc_id") < 30)
      .select(col("doc_id"), length(col("text")).cast("long").as("len")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(feats.forall(f => f.n_bytes == lens(f.media_id)))
  }

  test("sampleFrames: only video rows, frame_idx dense from 0") {
    val media = MultimodalOps.fromDocuments(docs.filter(col("doc_id") < 30))
    val frames = MultimodalOps.sampleFrames(media, frameSize = 32, n = 4).collect()
    val videoIds = media.filter(col("modality") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(frames.map(_.media_id).toSet == videoIds)
    frames.groupBy(_.media_id).foreach { case (_, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq == fs.indices.toSeq)
      assert(fs.forall(_.frame.length <= 32))
    }
  }
}
