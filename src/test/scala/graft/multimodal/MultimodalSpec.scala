package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestBase {

  private def docs = spark.read.parquet(s"$sf0_001/documents.parquet")

  /** 16-bin histogram of RAW payload bytes — what a codec-less feature
    * path would see; used below to prove real features come from decoded
    * pixels, not file bytes. */
  private def byteHistogram(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    bytes.foreach(b => hist((b & 0xff) >> 4) += 1f)
    hist.map(_ / math.max(bytes.length, 1).toFloat)
  }

  test("encodeFramePng round-trips a decoded GIF frame pixel-exact") {
    val gif = MediaCodecs.encodeGif(7L, 20, 12, 3)
    val frame = MediaCodecs.decodeGifFrames(gif).head
    val png = MediaCodecs.encodeFramePng(frame)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(back.getWidth == 20 && back.getHeight == 12)
    for (x <- 0 until 20; y <- 0 until 12)
      assert((back.getRGB(x, y) & 0xffffff) == (frame.getRGB(x, y) & 0xffffff))
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
    // all three payloads are real encoded containers (PNG/WAV/GIF), so
    // n_bytes is the encoded size; features are valid distributions
    assert(feats.forall(_.n_bytes > 0))
    feats.foreach { f =>
      val s = f.features.sum
      assert(s > 0.99f && s < 1.01f, s"${f.modality} features don't sum to ~1: $s")
    }
    // decoder-read n_units must equal the generator's unit count: pixels
    // (w*h), samples (256 + id%512), or frame-pixels (w*h*min(nf,6)) —
    // a decode that dropped any pixel/sample would miscount
    val meta = media.select("media_id", "modality", "width", "height", "n_frames")
      .collect().map(r => r.getLong(0) -> r).toMap
    feats.foreach { f =>
      val m = meta(f.media_id)
      val expected = f.modality match {
        case "image" => m.getInt(2).toLong * m.getInt(3)
        case "audio" => 256L + f.media_id % 512
        case _       => m.getInt(2).toLong * m.getInt(3) * math.min(m.getInt(4), 6)
      }
      assert(f.n_units == expected,
        s"media ${f.media_id} (${f.modality}): n_units ${f.n_units} != $expected")
    }
  }

  test("encodeWav produces a real WAV the JDK decoder round-trips") {
    val bytes = MediaCodecs.encodeWav(id = 7, nSamples = 100)
    assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    assert(in.getFrameLength == 100)
    assert(in.getFormat.getSampleSizeInBits == 16 && in.getFormat.getChannels == 1)
    assert(bytes.sameElements(MediaCodecs.encodeWav(7, 100)))
  }

  test("dHash64 encodes the horizontal gradient sign per 8x9 block") {
    // 9x8 gray image, one pixel per block, brightness DECREASING left to
    // right -> every left block outshines its right neighbor -> all 64
    // bits set. Increasing -> no bits. A global brightness shift (+50)
    // changes neither (the aHash failure mode dHash is robust to).
    def gray(v: Int): Int = (v << 16) | (v << 8) | v
    def img(f: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) im.setRGB(x, y, gray(f(x, y)))
      im
    }
    assert(MediaCodecs.dHash64(img((x, _) => 200 - x * 10)) ==
      ((0xffffffffL, 0xffffffffL)))
    assert(MediaCodecs.dHash64(img((x, _) => 100 + x * 10)) == ((0L, 0L)))
    val base = MediaCodecs.dHash64(img((x, y) => 60 + ((x * 13 + y * 7) % 100)))
    val shifted = MediaCodecs.dHash64(img((x, y) => 110 + ((x * 13 + y * 7) % 100)))
    assert(base == shifted)
  }

  test("audioVad segments frames by integer cross-multiplied activity") {
    // Hand-built 8-sample clip, frameLen=2 -> 4 frames with mean |amp|
    // 100, 500, 100, 500 vs clip mean 300: active pattern 0,1,0,1 ->
    // 2 active frames in 2 spans, longest run 1.
    val amps = Array(100, 100, 500, 500, 100, 100, 500, 500)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](amps.length * 2)
    amps.zipWithIndex.foreach { case (a, i) =>
      pcm(2 * i) = (a & 0xff).toByte; pcm(2 * i + 1) = ((a >> 8) & 0xff).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, amps.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    assert(MediaCodecs.audioVad(out.toByteArray, frameLen = 2) == ((4, 2, 2, 1)))
    // One contiguous active block: 100,100,500,500 -> frames 0,1 inactive?
    // means 100, 500 vs clip mean 300 -> pattern 0,1 -> 1 span of length 1;
    // flip to 500,500,100,100 -> pattern 1,0 -> still 1 span, starts at 0.
    val amps2 = Array(500, 500, 100, 100)
    val pcm2 = new Array[Byte](amps2.length * 2)
    amps2.zipWithIndex.foreach { case (a, i) =>
      pcm2(2 * i) = (a & 0xff).toByte; pcm2(2 * i + 1) = ((a >> 8) & 0xff).toByte
    }
    val out2 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm2), fmt, amps2.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out2)
    assert(MediaCodecs.audioVad(out2.toByteArray, frameLen = 2) == ((2, 1, 1, 1)))
  }

  test("audioVad on an encodeWav clip matches a scalar re-derivation") {
    val id = 13L; val n = 256 + (id % 512).toInt
    val amps = (0 until n).map(i => math.abs(((id * 131 + i.toLong * 7919) % 65536) - 32768))
    val frames = amps.grouped(160).toArray
    val total = amps.sum; val nTot = amps.length.toLong
    val active = frames.map(f => f.sum * nTot > total * f.length)
    val runs = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Int]
      var cur = 0
      active.foreach { a => if (a) cur += 1 else { if (cur > 0) b += cur; cur = 0 } }
      if (cur > 0) b += cur
      b.toSeq
    }
    val expected = (frames.length, active.count(identity), runs.length,
      if (runs.isEmpty) 0 else runs.max)
    assert(MediaCodecs.audioVad(MediaCodecs.encodeWav(id, n)) == expected)
  }

  test("decodeAudioFeatures computes the histogram of the DECODED samples") {
    // 2 samples: min (-32768 -> bin 0) and max (32767 -> bin 15)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = Array[Byte](0x00, 0x80.toByte, 0xff.toByte, 0x7f) // -32768, 32767 LE
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 2L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val f = MediaCodecs.decodeAudioFeatures(out.toByteArray)
    assert(f(0) == 0.5f && f(15) == 0.5f && f.sum == 1.0f)
  }

  test("encodePng produces a real PNG the JDK decoder round-trips") {
    val bytes = MediaCodecs.encodePng(id = 7, width = 20, height = 12)
    // PNG magic
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 20 && img.getHeight == 12)
    // deterministic: same args -> same bytes
    assert(bytes.sameElements(MediaCodecs.encodePng(7, 20, 12)))
  }

  test("decodeImageFeatures computes the histogram of the DECODED pixels") {
    // 2x1 image: one black pixel (lum 0 -> bin 0), one white (lum 255 -> bin 15)
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000)
    img.setRGB(1, 0, 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val f = MediaCodecs.decodeImageFeatures(out.toByteArray)
    assert(f(0) == 0.5f && f(15) == 0.5f)
    assert(f.sum == 1.0f)
    // the BYTE histogram of the encoded file would look nothing like this —
    // proves features come from decoded pixels, not payload bytes
    assert(!f.sameElements(byteHistogram(out.toByteArray)))
  }

  test("decodeImageFeatures rejects undecodable payloads") {
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeImageFeatures("not an image".getBytes("UTF-8"))
    }
  }

  test("image rows flow real pixel features through the query path") {
    val media = MultimodalOps.fromDocuments(docs.filter(col("doc_id") < 9))
    val imgFeats = MultimodalOps.extractFeatures(media)
      .filter(_.modality == "image").collect()
    assert(imgFeats.nonEmpty)
    val contents = media.filter(col("modality") === "image")
      .select("media_id", "content").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    imgFeats.foreach { f =>
      assert(f.features.sameElements(MediaCodecs.decodeImageFeatures(contents(f.media_id))))
    }
  }

  test("GIF video round-trip is lossless: every decoded sample equals the generator") {
    val bytes = MediaCodecs.encodeGif(id = 5L, width = 20, height = 18, nFrames = 4)
    val frames = MediaCodecs.decodeGifFrames(bytes)
    assert(frames.size == 4)
    frames.zipWithIndex.foreach { case (img, f) =>
      assert(img.getWidth == 20 && img.getHeight == 18)
      for (y <- 0 until 18; x <- 0 until 20) {
        val v = img.getRGB(x, y) & 0xff // gray: B channel == sample
        assert(v == MediaCodecs.grayPixel(5L, f, x, y),
          s"frame $f pixel ($x,$y): got $v")
      }
    }
  }

  test("decodeVideoFeatures averages the decoded frames' luminance histograms") {
    val bytes = MediaCodecs.encodeGif(9L, 12, 10, 3)
    val got = MediaCodecs.decodeVideoFeatures(bytes)
    val hist = new Array[Float](16)
    for (f <- 0 until 3; y <- 0 until 10; x <- 0 until 12)
      hist(MediaCodecs.grayPixel(9L, f, x, y) >> 4) += 1f
    val expected = hist.map(_ / (3 * 12 * 10).toFloat)
    assert(got.sameElements(expected))
  }

  test("videoFrameCatalog: decoder geometry matches the metadata formula") {
    val cat = MultimodalOps.videoFrameCatalog(docs.filter(col("doc_id") < 30)).collect()
    assert(cat.nonEmpty)
    val meta = MultimodalOps.mediaMeta(docs.filter(col("doc_id") < 30))
      .filter(col("modality") === "video")
      .select("media_id", "width", "height", "n_frames").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    cat.groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val (w, h, nf) = meta(id)
      assert(rows.length == math.min(nf, 6))
      assert(rows.forall(r => r.getInt(2) == w && r.getInt(3) == h))
    }
  }

  test("sampleVideoFrames: only video rows, dense sample_idx, decoded " +
      "even-spaced frames with decodable PNG payloads") {
    val sub = docs.filter(col("doc_id") < 30)
    val frames = MultimodalOps.sampleVideoFrames(sub, n = 4).collect()
    val media = MultimodalOps.fromDocuments(sub)
    val videoIds = media.filter(col("modality") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(frames.map(_.media_id).toSet == videoIds)
    val meta = media.filter(col("modality") === "video")
      .select("media_id", "width", "height", "n_frames").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    frames.groupBy(_.media_id).foreach { case (id, fs) =>
      val (w, h, nf) = meta(id)
      val take = math.min(4, math.min(nf, 6))
      // dense output positions; source frame = even spacing over DECODED count
      assert(fs.map(_.sample_idx).sorted.toSeq == (0 until take))
      fs.foreach { f =>
        assert(f.frame_idx == (f.sample_idx.toLong * math.min(nf, 6) / take).toInt)
        assert(f.frame_w == w && f.frame_h == h)
        // each sampled frame is a standalone decodable PNG of that geometry
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(f.frame))
        assert(img != null && img.getWidth == w && img.getHeight == h)
      }
    }
  }

  test("sampleVideoFrameGeometry matches the payload-bearing variant " +
      "row-for-row (minus the payload)") {
    val sub = docs.filter(col("doc_id") < 30)
    val full = MultimodalOps.sampleVideoFrames(sub, n = 4).collect()
      .map(f => (f.media_id, f.sample_idx, f.frame_idx, f.frame_w, f.frame_h))
      .toSet
    val geom = MultimodalOps.sampleVideoFrameGeometry(sub, n = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4)))
      .toSet
    assert(geom == full)
  }
}
