package graft.queries

import graft.QueryPack
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._

/**
 * Multimodal pipeline surface. Image (javax.imageio PNG), audio
 * (javax.sound WAV) and video (animated-GIF demux) decode are all REAL
 * JDK codec work — see [[graft.multimodal.MediaCodecs]] — and every
 * query here is oracle-checked: the payloads are deterministic
 * generator output, so DuckDB re-derives hashes, fingerprints, frame
 * geometry and histogram-bin counts from the generator formulas alone,
 * which a decode that misread any pixel/sample could not match.
 */
object MultimodalQueries extends QueryPack {

  /** One decoded catalog per (session, dir) for the catalogs MULTIPLE
    * queries consume — the imageHash catalog feeds three queries
    * (ahash groups, banded near-dup pairs, the curation policy), the
    * VAD and video-frame catalogs two each — so before r18 the same
    * PNG/WAV/GIF decode pass re-ran per consumer AND per timed bench
    * run (~9 image-decode passes a session). At 100 TB this IS the
    * design: a decoded perceptual-hash/VAD/frame catalog is a persisted
    * artifact of the media index job, not a per-query decode — the same
    * shared-artifact discipline as DedupQueries' near-dup pair table.
    * Single-consumer catalogs (dhash, audio fingerprint, scene-change
    * hashes, features) deliberately stay per-query: there is no shared
    * artifact story for them, only the bench's repeat-timing to game.
    * Build cost is priced as `_shared_build:multimodal_catalogs`. */
  private val catalogCache =
    new graft.util.SessionCache[(String, String), org.apache.spark.sql.DataFrame](
      buildName = Some("multimodal_catalogs"))

  private def cachedAhashCatalog(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    catalogCache.getOrElseUpdate(s, (dir, "ahash"))(
      MultimodalOps.imageHashCatalog(t(s, dir, "documents")).localCheckpoint())

  private def cachedVadCatalog(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    catalogCache.getOrElseUpdate(s, (dir, "vad"))(
      MultimodalOps.audioVadCatalog(t(s, dir, "documents")).localCheckpoint())

  private def cachedVideoFrameCatalog(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    catalogCache.getOrElseUpdate(s, (dir, "vframes"))(
      MultimodalOps.videoFrameCatalog(t(s, dir, "documents")).localCheckpoint())

  override def queries: Map[String, Q] = Map(
    // Binary-column feature extraction -> per-modality rollup, made
    // INTEGER-exact so the REAL decode path is fully oracle-checkable
    // (VERDICT r7 #5): features(1) is the bin-0 fraction of a
    // 16-bin histogram over decoded pixels/samples; multiplying back by
    // the decoded unit count (pixels / samples / frame-pixels — all
    // metadata-derivable, and the decoders' losslessness is spec-pinned)
    // recovers the exact bin-0 COUNT, which DuckDB recomputes from the
    // generator formulas alone. A decode that misread any pixel or
    // sample could not match the per-modality totals.
    "multimodal_features" -> ((s, dir) => {
      val media = MultimodalOps.fromDocuments(t(s, dir, "documents"))
      // n_units rides on the feature row (decoder-read), so recovering
      // exact bin counts needs no metadata join: f0 = float32(bin0/n)
      // with n <= 5120 << 2^24, so the float round-trip recovers bin0
      // exactly (error < 5e-4)
      MultimodalOps.extractFeatures(media).toDF()
        .select(col("modality"), col("n_units"),
          round(element_at(col("features"), 1) * col("n_units"), 0)
            .cast("long").as("bin0"))
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_units")).as("total_units"),
          sum(col("bin0")).as("bin0_total"))
        .orderBy(col("modality"))
    }),

    // Metadata-only rollup: counts and dimension stats per (modality,
    // format) — reads NO payload bytes (the metadata half prunes the
    // content column entirely; at 100 TB this is the catalog query that
    // must never touch the binary data).
    "multimodal_meta_stats" -> ((s, dir) =>
      MultimodalOps.mediaMeta(t(s, dir, "documents"))
        .groupBy(col("modality"), col("format"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("width").cast("long")).as("total_width"),
          max(col("height")).as("max_height"),
          min(col("n_frames")).as("min_frames"))
        .orderBy(col("modality"))),

    // Perceptual image hashing for multimodal dedup: REAL PNG decode →
    // integer-exact 8×8 block-mean aHash (no floats anywhere, so the
    // hash is engine-reproducible) → duplicate-group sizes by hash
    // equality. The oracle recomputes the hash FROM THE PIXEL FORMULA
    // alone — a decode that didn't faithfully reproduce every pixel
    // could not match all 64 bits. At scale: one decode per image
    // map-side, then a hash-keyed window (the same bucketing a
    // hamming-banded near-dup join would use).
    "multimodal_image_ahash" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("ahash_hi", "ahash_lo")
      cachedAhashCatalog(s, dir)
        .withColumn("dup_group_size", count(lit(1)).over(w))
        .orderBy(col("media_id"))
    }),

    // Gradient (difference) hash over the same REAL decodes: 8×9 block
    // means, bit = horizontal gradient sign — robust to the global
    // brightness/contrast shifts that flip every aHash bit at once.
    // Same integer cross-multiplied discipline, same oracle contract:
    // DuckDB recomputes all 64 bits from the pixel formula, so a decode
    // missing any pixel (or a block-boundary off-by-one) cannot match.
    "multimodal_image_dhash" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("dhash_hi", "dhash_lo")
      MultimodalOps.imageDHashCatalog(t(s, dir, "documents"))
        .withColumn("dup_group_size", count(lit(1)).over(w))
        .orderBy(col("media_id"))
    }),

    // Perceptual near-dup image PAIRS — the join the aHash exists for:
    // pairs within hamming <= 2 of the 64-bit hash, found by the same
    // PIGEONHOLE banding as dedup_simhash_hamming (4 x 16-bit bands; a
    // pair differing in <= 3 bits meets on >= 1 band key, so the
    // blocking loses no qualifying pair). The corpus is the decoded
    // catalog plus a deterministic 1-bit-drift variant per image
    // (media_id + 100000, bit media_id % 64 flipped — the near-identical
    // re-encode / crop-artifact case a perceptual hash is built to
    // catch); the catalog is checkpointed once so the PNG decode runs a
    // single pass, and the verify is two xor + bit_count integer ops per
    // banded candidate — never an all-pairs image compare.
    "multimodal_ahash_pairs" -> ((s, dir) => {
      val cat = cachedAhashCatalog(s, dir)
        .select(col("media_id"), col("ahash_hi"), col("ahash_lo"))
      val pos = (col("media_id") % 64).cast("int")
      // shiftleft's Scala signature takes a literal shift; the SQL form
      // accepts a column shift, so the per-row flip mask goes via expr.
      val variants = cat.select(
        (col("media_id") + 100000).as("media_id"),
        when(pos >= 32, col("ahash_hi").bitwiseXOR(expr(
          "shiftleft(CAST(1 AS BIGINT), CAST(media_id % 64 AS INT) - 32)")))
          .otherwise(col("ahash_hi")).as("ahash_hi"),
        when(pos < 32, col("ahash_lo").bitwiseXOR(expr(
          "shiftleft(CAST(1 AS BIGINT), CAST(media_id % 64 AS INT))")))
          .otherwise(col("ahash_lo")).as("ahash_lo"))
      val all = cat.unionByName(variants)
      val bands = all.select(col("media_id"), col("ahash_hi"), col("ahash_lo"),
        posexplode(array(
          shiftright(col("ahash_hi"), 16).bitwiseAND(lit(65535L)),
          col("ahash_hi").bitwiseAND(lit(65535L)),
          shiftright(col("ahash_lo"), 16).bitwiseAND(lit(65535L)),
          col("ahash_lo").bitwiseAND(lit(65535L))))
          .as(Seq("band_id", "band_key")))
      bands.select(col("band_id"), col("band_key"), col("media_id").as("a_id"),
          col("ahash_hi").as("a_hi"), col("ahash_lo").as("a_lo"))
        .join(bands.select(col("band_id"), col("band_key"),
          col("media_id").as("b_id"), col("ahash_hi").as("b_hi"),
          col("ahash_lo").as("b_lo")), Seq("band_id", "band_key"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          (bit_count(col("a_hi").bitwiseXOR(col("b_hi"))) +
            bit_count(col("a_lo").bitwiseXOR(col("b_lo")))).cast("int").as("ham"))
        .filter(col("ham") <= 2)
        .distinct()
        .orderBy(col("a_id"), col("b_id"))
    }),

    // Audio analog of the image aHash: REAL WAV decode → integer-exact
    // 64-block energy fingerprint → duplicate-group sizes. Same
    // oracle-from-the-generator-formula discipline: a decode that
    // dropped or misread any sample could not match all 64 bits.
    "multimodal_audio_fingerprint" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp_hi", "fp_lo")
      MultimodalOps.audioFingerprintCatalog(t(s, dir, "documents"))
        .withColumn("dup_group_size", count(lit(1)).over(w))
        .orderBy(col("media_id"))
    }),

    // Frame-level activity segmentation (VAD shape) per clip over REAL
    // WAV decodes: 160-sample frames, active iff frame mean |amplitude|
    // beats the clip mean (integer cross-multiplied), speech-span
    // extents via consecutive-run scanning. The oracle re-derives every
    // count from the generator formula with the islands trick, so a
    // decode missing any sample — or a segmentation off by one frame —
    // cannot match.
    "multimodal_audio_vad" -> ((s, dir) =>
      cachedVadCatalog(s, dir)
        .orderBy(col("media_id"))),

    // Scene-change detection over the REAL video demux: per-frame aHash
    // (gray frames make lum == sample exactly, so every bit re-derives
    // from the generator formula), hamming between consecutive frames
    // via xor + bit_count, cut iff hamming > 16 — the boundary signal a
    // frame-sampling pipeline keys on (sample AT cuts, not blindly every
    // Nth frame). One decode pass; the lag window is keyed per video
    // over ≤6 frames.
    "multimodal_scene_changes" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("media_id").orderBy("frame_idx")
      MultimodalOps.videoFrameHashCatalog(t(s, dir, "documents"))
        .withColumn("ph", lag(col("hash_hi"), 1).over(w))
        .withColumn("pl", lag(col("hash_lo"), 1).over(w))
        .filter(col("ph").isNotNull)
        .select(col("media_id"), col("frame_idx"),
          (bit_count(col("hash_hi").bitwiseXOR(col("ph"))) +
            bit_count(col("hash_lo").bitwiseXOR(col("pl")))).as("hamming"))
        .withColumn("is_cut", col("hamming") > 16)
        .orderBy(col("media_id"), col("frame_idx"))
    }),

    // The multimodal curation POLICY — the pipeline_curate of the media
    // families: every signal below comes from a REAL decode (aHash dup
    // groups, VAD activity ratio, demuxed frame count) and the keep/drop
    // verdict per modality is pure integer arithmetic over them (the
    // activity band 0.2..0.9 is cross-multiplied, no float), so the
    // whole policy hash-checks against the generator formulas. Image:
    // drop perceptual dups. Audio: drop silence/wall-of-noise (activity
    // outside the band). Video: drop single-frame stills.
    "pipeline_multimodal_curate" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("ahash_hi", "ahash_lo")
      val img = cachedAhashCatalog(s, dir)
        .withColumn("keep", count(lit(1)).over(w) === 1)
        .select(col("media_id"), lit("image").as("modality"), col("keep"),
          when(col("keep"), "ok").otherwise("dup_image").as("reason"))
      val aud = cachedVadCatalog(s, dir)
        .withColumn("keep",
          col("n_active") * 5 >= col("n_frames") &&
            col("n_active") * 10 <= col("n_frames") * 9)
        .select(col("media_id"), lit("audio").as("modality"), col("keep"),
          when(col("keep"), "ok").otherwise("silence_or_noise").as("reason"))
      val vid = cachedVideoFrameCatalog(s, dir)
        .groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
        .withColumn("keep", col("nf") >= 2)
        .select(col("media_id"), lit("video").as("modality"), col("keep"),
          when(col("keep"), "ok").otherwise("single_frame").as("reason"))
      img.unionByName(aud).unionByName(vid).orderBy(col("media_id"))
    }),

    // Ingest-time validation gate over REAL codecs (the streaming-ready
    // stateless map in [[graft.streaming.MultimodalStreams]]): every
    // 13th payload is deterministically truncated to 20 bytes (valid
    // magic, unreadable body), and the gate must quarantine exactly
    // those while reporting decoder-read unit counts for the rest. The
    // oracle predicts ok from the corruption rule and n_units from the
    // generator formulas — an accepted corrupt blob, a rejected good
    // one, or a miscounted decode all fail the hash.
    "multimodal_ingest_gate" -> ((s, dir) => {
      val media = MultimodalOps.fromDocuments(t(s, dir, "documents"))
        .withColumn("content",
          when(col("media_id") % 13 === 0, expr("substring(content, 1, 20)"))
            .otherwise(col("content")))
      graft.streaming.MultimodalStreams.mediaIngestGate(media)
        .orderBy(col("media_id"))
    }),

    // REAL video demux: per-doc animated GIFs (JDK GIF writer) parsed
    // back through the JDK GIF reader; frame index and geometry come
    // from the DECODER, and the oracle derives the same values from the
    // metadata formula — a decode that didn't actually parse the
    // container could not match it.
    "multimodal_video_frames" -> ((s, dir) =>
      cachedVideoFrameCatalog(s, dir)
        .orderBy(col("media_id"), col("frame_idx"))),

    // REAL frame sampling — the keyframe-extract step of a multimodal
    // training pipeline: demux each video's GIF through the JDK reader,
    // select up to 4 evenly spaced DECODED frames. The emitted
    // sample/frame indices and geometry come from the DECODER; the
    // oracle re-derives all of them from the generator's metadata
    // formulas (nf = min(n_chars%30+1, 6), idx = i·nf/take), so a demux
    // that dropped or misread a frame could not match. This query never
    // consumes a frame PAYLOAD, so it rides the geometry-only helper —
    // the PNG re-encode (engine-specific bytes) runs only in the
    // payload-bearing sampleVideoFrames, whose pixel-exactness
    // MultimodalSpec pins.
    "multimodal_frames" -> ((s, dir) =>
      MultimodalOps.sampleVideoFrameGeometry(t(s, dir, "documents"), n = 4)
        .orderBy(col("media_id"), col("sample_idx")))
  )

  /** The aHash derivation CTEs (recomputed from the generator's pixel
    * formula) shared by the catalog oracle and the near-dup-pairs
    * oracle: integer luminance, integer block indices, cross-multiplied
    * mean compare, bits packed into two 32-bit halves — every operation
    * exact, so the decoded-path hash must match bit-for-bit. */
  private val ahashCtes =
    """img AS (
      |  SELECT doc_id AS media_id,
      |    CAST(n_chars % 64 + 16 AS BIGINT) AS w,
      |    CAST(n_chars % 48 + 16 AS BIGINT) AS h
      |  FROM documents WHERE doc_id % 3 = 0
      |), xs AS (
      |  SELECT media_id, w, h, unnest(range(w)) AS x FROM img
      |), px AS (
      |  SELECT media_id, w, h,
      |    (((media_id*31 + x*7 + y*13) % 256) * 299 +
      |     ((media_id*17 + x*11 + y*3) % 256) * 587 +
      |     ((media_id*5 + x*2 + y*23) % 256) * 114) // 1000 AS lum,
      |    (y*8 // h)*8 + (x*8 // w) AS k
      |  FROM (SELECT media_id, w, h, x, unnest(range(h)) AS y FROM xs)
      |), blocks AS (
      |  SELECT media_id, k, sum(lum) AS bsum, count(*) AS bn
      |  FROM px GROUP BY media_id, k
      |), tot AS (
      |  SELECT media_id, w * h AS tn, sum(lum) AS tsum
      |  FROM px GROUP BY media_id, w, h
      |), bits AS (
      |  SELECT b.media_id, b.k,
      |    CASE WHEN b.bsum * t.tn > t.tsum * b.bn THEN 1 ELSE 0 END AS bit
      |  FROM blocks b JOIN tot t USING (media_id)
      |), hashes AS MATERIALIZED (
      |  SELECT media_id,
      |    CAST(sum(CASE WHEN bit = 1 AND k >= 32
      |      THEN (CAST(1 AS BIGINT) << CAST(k - 32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS ahash_hi,
      |    CAST(sum(CASE WHEN bit = 1 AND k < 32
      |      THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) ELSE 0 END) AS BIGINT) AS ahash_lo
      |  FROM bits GROUP BY media_id
      |)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    // bin-0 counts of the 16-bin decoded-feature histograms, re-derived
    // per modality from the generator formulas: image luminance
    // (r*299+g*587+b*114)//1000 < 16; audio amplitude word
    // (id*131+i*7919)%65536 < 4096 (bin = word >> 12); video gray
    // (id*31+f*41+x*7+y*13)%256 < 16 over min(n_frames,6) frames.
    "multimodal_features" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    CAST(n_chars % 64 + 16 AS BIGINT) AS w,
        |    CAST(n_chars % 48 + 16 AS BIGINT) AS h
        |  FROM documents WHERE doc_id % 3 = 0
        |), ipx AS (
        |  SELECT media_id, w, h, x, unnest(range(h)) AS y
        |  FROM (SELECT media_id, w, h, unnest(range(w)) AS x FROM img)
        |), ibin AS (
        |  SELECT media_id, w * h AS units,
        |    sum(CASE WHEN (((media_id*31 + x*7 + y*13) % 256) * 299 +
        |                   ((media_id*17 + x*11 + y*3) % 256) * 587 +
        |                   ((media_id*5 + x*2 + y*23) % 256) * 114) // 1000 < 16
        |        THEN 1 ELSE 0 END) AS bin0
        |  FROM ipx GROUP BY media_id, w, h
        |), aud AS (
        |  SELECT doc_id AS media_id, CAST(256 + doc_id % 512 AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 3 = 1
        |), abin AS (
        |  SELECT media_id, n AS units,
        |    sum(CASE WHEN (media_id*131 + i*7919) % 65536 < 4096
        |        THEN 1 ELSE 0 END) AS bin0
        |  FROM (SELECT media_id, n, unnest(range(n)) AS i FROM aud)
        |  GROUP BY media_id, n
        |), vid AS (
        |  SELECT doc_id AS media_id,
        |    CAST(n_chars % 64 + 16 AS BIGINT) AS w,
        |    CAST(n_chars % 48 + 16 AS BIGINT) AS h,
        |    CAST(least(n_chars % 30 + 1, 6) AS BIGINT) AS nf
        |  FROM documents WHERE doc_id % 3 = 2
        |), vpx AS (
        |  SELECT media_id, w, h, nf, f, x, unnest(range(h)) AS y
        |  FROM (SELECT media_id, w, h, nf, f, unnest(range(w)) AS x
        |        FROM (SELECT media_id, w, h, nf, unnest(range(nf)) AS f FROM vid))
        |), vbin AS (
        |  SELECT media_id, w * h * nf AS units,
        |    sum(CASE WHEN (media_id*31 + f*41 + x*7 + y*13) % 256 < 16
        |        THEN 1 ELSE 0 END) AS bin0
        |  FROM vpx GROUP BY media_id, w, h, nf
        |), allm AS (
        |  SELECT 'image' AS modality, units, bin0 FROM ibin
        |  UNION ALL SELECT 'audio', units, bin0 FROM abin
        |  UNION ALL SELECT 'video', units, bin0 FROM vbin
        |)
        |SELECT modality, count(*) AS n_media,
        |  CAST(sum(units) AS BIGINT) AS total_units,
        |  CAST(sum(bin0) AS BIGINT) AS bin0_total
        |FROM allm GROUP BY modality ORDER BY modality""".stripMargin,
    "multimodal_image_ahash" ->
      s"""WITH $ahashCtes
         |SELECT media_id, ahash_hi, ahash_lo,
         |  count(*) OVER (PARTITION BY ahash_hi, ahash_lo) AS dup_group_size
         |FROM hashes ORDER BY media_id""".stripMargin,
    // Same pixel formula, 8×9 grid, bit = left-vs-right block mean
    // (cross-multiplied); bit index (k//9)*8 + k%9 for left block k.
    "multimodal_image_dhash" ->
      """WITH img AS (
        |  SELECT doc_id AS media_id,
        |    CAST(n_chars % 64 + 16 AS BIGINT) AS w,
        |    CAST(n_chars % 48 + 16 AS BIGINT) AS h
        |  FROM documents WHERE doc_id % 3 = 0
        |), xs AS (
        |  SELECT media_id, w, h, unnest(range(w)) AS x FROM img
        |), px AS (
        |  SELECT media_id,
        |    (((media_id*31 + x*7 + y*13) % 256) * 299 +
        |     ((media_id*17 + x*11 + y*3) % 256) * 587 +
        |     ((media_id*5 + x*2 + y*23) % 256) * 114) // 1000 AS lum,
        |    (y*8 // h)*9 + (x*9 // w) AS k
        |  FROM (SELECT media_id, w, h, x, unnest(range(h)) AS y FROM xs)
        |), blocks AS (
        |  SELECT media_id, k, sum(lum) AS bsum, count(*) AS bn
        |  FROM px GROUP BY media_id, k
        |), bits AS (
        |  SELECT l.media_id, (l.k // 9)*8 + (l.k % 9) AS idx,
        |    CASE WHEN l.bsum * r.bn > r.bsum * l.bn THEN 1 ELSE 0 END AS bit
        |  FROM blocks l
        |  JOIN blocks r ON r.media_id = l.media_id AND r.k = l.k + 1
        |  WHERE l.k % 9 < 8
        |), hashes AS MATERIALIZED (
        |  SELECT media_id,
        |    CAST(sum(CASE WHEN bit = 1 AND idx >= 32
        |      THEN (CAST(1 AS BIGINT) << CAST(idx - 32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS dhash_hi,
        |    CAST(sum(CASE WHEN bit = 1 AND idx < 32
        |      THEN (CAST(1 AS BIGINT) << CAST(idx AS INTEGER)) ELSE 0 END) AS BIGINT) AS dhash_lo
        |  FROM bits GROUP BY media_id
        |)
        |SELECT media_id, dhash_hi, dhash_lo,
        |  count(*) OVER (PARTITION BY dhash_hi, dhash_lo) AS dup_group_size
        |FROM hashes ORDER BY media_id""".stripMargin,
    // All-pairs hamming over originals + 1-bit-drift variants (the
    // naive form) — equality with the banded Spark plan proves the
    // pigeonhole blocking loses no pair, same as dedup_simhash_hamming.
    "multimodal_ahash_pairs" ->
      s"""WITH $ahashCtes, variants AS (
         |  SELECT h.media_id + 100000 AS media_id,
         |    CASE WHEN h.media_id % 64 >= 32
         |      THEN xor(h.ahash_hi, CAST(1 AS BIGINT) << CAST(h.media_id % 64 - 32 AS INTEGER))
         |      ELSE h.ahash_hi END AS ahash_hi,
         |    CASE WHEN h.media_id % 64 < 32
         |      THEN xor(h.ahash_lo, CAST(1 AS BIGINT) << CAST(h.media_id % 64 AS INTEGER))
         |      ELSE h.ahash_lo END AS ahash_lo
         |  FROM hashes h
         |), unioned AS MATERIALIZED (
         |  SELECT * FROM hashes UNION ALL SELECT * FROM variants
         |)
         |SELECT a.media_id AS a_id, b.media_id AS b_id,
         |  CAST(bit_count(xor(a.ahash_hi, b.ahash_hi)) +
         |    bit_count(xor(a.ahash_lo, b.ahash_lo)) AS INTEGER) AS ham
         |FROM unioned a JOIN unioned b ON a.media_id < b.media_id
         |WHERE bit_count(xor(a.ahash_hi, b.ahash_hi)) +
         |  bit_count(xor(a.ahash_lo, b.ahash_lo)) <= 2
         |ORDER BY a_id, b_id""".stripMargin,
    // formula: sample(i) = ((id*131 + i*7919) % 65536) - 32768 over
    // n = 256 + id % 512 samples; 64 energy blocks, cross-multiplied
    // mean compare, integer shifts — all exact
    "multimodal_audio_fingerprint" ->
      """WITH aud AS (
        |  SELECT doc_id AS media_id, CAST(256 + doc_id % 512 AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 3 = 1
        |), sx AS (
        |  SELECT media_id, n, unnest(range(n)) AS i FROM aud
        |), s AS (
        |  SELECT media_id, n, i*64 // n AS k,
        |    abs(((media_id*131 + i*7919) % 65536) - 32768) AS a
        |  FROM sx
        |), blocks AS (
        |  SELECT media_id, k, sum(a) AS bsum, count(*) AS bn
        |  FROM s GROUP BY media_id, k
        |), tot AS (
        |  SELECT media_id, max(n) AS tn, sum(a) AS tsum
        |  FROM s GROUP BY media_id
        |), bits AS (
        |  SELECT b.media_id, b.k,
        |    CASE WHEN b.bsum * t.tn > t.tsum * b.bn THEN 1 ELSE 0 END AS bit
        |  FROM blocks b JOIN tot t USING (media_id)
        |), hashes AS (
        |  SELECT media_id,
        |    CAST(sum(CASE WHEN bit = 1 AND k >= 32
        |      THEN (CAST(1 AS BIGINT) << CAST(k - 32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS fp_hi,
        |    CAST(sum(CASE WHEN bit = 1 AND k < 32
        |      THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) ELSE 0 END) AS BIGINT) AS fp_lo
        |  FROM bits GROUP BY media_id
        |)
        |SELECT media_id, fp_hi, fp_lo,
        |  count(*) OVER (PARTITION BY fp_hi, fp_lo) AS dup_group_size
        |FROM hashes ORDER BY media_id""".stripMargin,
    // Per-frame aHash re-derived from the gray pixel formula, then the
    // same lag/xor/bit_count as the Spark side.
    "multimodal_scene_changes" ->
      """WITH vid AS (
        |  SELECT doc_id AS media_id,
        |    CAST(n_chars % 64 + 16 AS BIGINT) AS w,
        |    CAST(n_chars % 48 + 16 AS BIGINT) AS h,
        |    CAST(least(n_chars % 30 + 1, 6) AS BIGINT) AS nf
        |  FROM documents WHERE doc_id % 3 = 2
        |), fr AS (
        |  SELECT media_id, w, h, unnest(range(nf)) AS f FROM vid
        |), xs AS (
        |  SELECT media_id, w, h, f, unnest(range(w)) AS x FROM fr
        |), px AS (
        |  SELECT media_id, f, w, h,
        |    (media_id*31 + f*41 + x*7 + y*13) % 256 AS g,
        |    (y*8 // h)*8 + (x*8 // w) AS k
        |  FROM (SELECT media_id, w, h, f, x, unnest(range(h)) AS y FROM xs)
        |), blocks AS (
        |  SELECT media_id, f, k, sum(g) AS bsum, count(*) AS bn
        |  FROM px GROUP BY media_id, f, k
        |), tots AS (
        |  SELECT media_id, f, max(w * h) AS tn, sum(g) AS tsum
        |  FROM px GROUP BY media_id, f
        |), bits AS (
        |  SELECT b.media_id, b.f, b.k,
        |    CASE WHEN b.bsum * t.tn > t.tsum * b.bn THEN 1 ELSE 0 END AS bit
        |  FROM blocks b JOIN tots t USING (media_id, f)
        |), hashes AS (
        |  SELECT media_id, f,
        |    CAST(sum(CASE WHEN bit = 1 AND k >= 32
        |      THEN (CAST(1 AS BIGINT) << CAST(k - 32 AS INTEGER)) ELSE 0 END) AS BIGINT) AS hash_hi,
        |    CAST(sum(CASE WHEN bit = 1 AND k < 32
        |      THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) ELSE 0 END) AS BIGINT) AS hash_lo
        |  FROM bits GROUP BY media_id, f
        |), lagd AS (
        |  SELECT media_id, CAST(f AS INTEGER) AS frame_idx, hash_hi, hash_lo,
        |    lag(hash_hi) OVER (PARTITION BY media_id ORDER BY f) AS ph,
        |    lag(hash_lo) OVER (PARTITION BY media_id ORDER BY f) AS pl
        |  FROM hashes
        |)
        |SELECT media_id, frame_idx,
        |  CAST(bit_count(xor(hash_hi, ph)) + bit_count(xor(hash_lo, pl))
        |    AS INTEGER) AS hamming,
        |  (bit_count(xor(hash_hi, ph)) + bit_count(xor(hash_lo, pl))) > 16
        |    AS is_cut
        |FROM lagd WHERE ph IS NOT NULL
        |ORDER BY media_id, frame_idx""".stripMargin,
    // All three modality verdicts re-derived from the generator
    // formulas; CTE names prefixed to dodge the ahash chain's img/tot.
    "pipeline_multimodal_curate" ->
      s"""WITH $ahashCtes,
         |imgv AS (
         |  SELECT media_id, 'image' AS modality,
         |    (count(*) OVER (PARTITION BY ahash_hi, ahash_lo)) = 1 AS keep,
         |    'dup_image' AS bad FROM hashes
         |), a_aud AS (
         |  SELECT doc_id AS media_id, CAST(256 + doc_id % 512 AS BIGINT) AS n
         |  FROM documents WHERE doc_id % 3 = 1
         |), a_sx AS (
         |  SELECT media_id, n, unnest(range(n)) AS i FROM a_aud
         |), a_s AS (
         |  SELECT media_id, n, i // 160 AS k,
         |    abs(((media_id*131 + i*7919) % 65536) - 32768) AS a
         |  FROM a_sx
         |), a_fr AS (
         |  SELECT media_id, k, sum(a) AS fsum, count(*) AS fn
         |  FROM a_s GROUP BY media_id, k
         |), a_tot AS (
         |  SELECT media_id, max(n) AS tn, sum(a) AS tsum
         |  FROM a_s GROUP BY media_id
         |), a_act AS (
         |  SELECT f.media_id,
         |    CASE WHEN f.fsum * t.tn > t.tsum * f.fn THEN 1 ELSE 0 END AS active
         |  FROM a_fr f JOIN a_tot t USING (media_id)
         |), a_vb AS (
         |  SELECT media_id, count(*) AS n_frames, sum(active) AS n_active
         |  FROM a_act GROUP BY media_id
         |), audv AS (
         |  SELECT media_id, 'audio' AS modality,
         |    (5 * n_active >= n_frames AND 10 * n_active <= 9 * n_frames) AS keep,
         |    'silence_or_noise' AS bad FROM a_vb
         |), vidv AS (
         |  SELECT doc_id AS media_id, 'video' AS modality,
         |    least(n_chars % 30 + 1, 6) >= 2 AS keep,
         |    'single_frame' AS bad
         |  FROM documents WHERE doc_id % 3 = 2
         |)
         |SELECT media_id, modality, keep,
         |  CASE WHEN keep THEN 'ok' ELSE bad END AS reason
         |FROM (SELECT * FROM imgv UNION ALL SELECT * FROM audv
         |      UNION ALL SELECT * FROM vidv)
         |ORDER BY media_id""".stripMargin,
    "multimodal_ingest_gate" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |      WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    n_chars % 64 + 16 AS w, n_chars % 48 + 16 AS h,
        |    least(n_chars % 30 + 1, 6) AS nf
        |  FROM documents
        |)
        |SELECT media_id, modality,
        |  media_id % 13 <> 0 AS ok,
        |  CAST(CASE WHEN media_id % 13 = 0 THEN 0
        |    WHEN modality = 'image' THEN w * h
        |    WHEN modality = 'audio' THEN 256 + media_id % 512
        |    ELSE w * h * nf END AS BIGINT) AS n_units
        |FROM m ORDER BY media_id""".stripMargin,
    "multimodal_audio_vad" ->
      """WITH aud AS (
        |  SELECT doc_id AS media_id, CAST(256 + doc_id % 512 AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 3 = 1
        |), sx AS (
        |  SELECT media_id, n, unnest(range(n)) AS i FROM aud
        |), s AS (
        |  SELECT media_id, n, i // 160 AS k,
        |    abs(((media_id*131 + i*7919) % 65536) - 32768) AS a
        |  FROM sx
        |), fr AS (
        |  SELECT media_id, k, sum(a) AS fsum, count(*) AS fn
        |  FROM s GROUP BY media_id, k
        |), tot AS (
        |  SELECT media_id, max(n) AS tn, sum(a) AS tsum
        |  FROM s GROUP BY media_id
        |), act AS (
        |  SELECT f.media_id, f.k,
        |    CASE WHEN f.fsum * t.tn > t.tsum * f.fn THEN 1 ELSE 0 END AS active
        |  FROM fr f JOIN tot t USING (media_id)
        |), base AS (
        |  SELECT media_id, CAST(count(*) AS INTEGER) AS n_frames,
        |    CAST(sum(active) AS INTEGER) AS n_active
        |  FROM act GROUP BY media_id
        |), isl AS (
        |  SELECT media_id,
        |    k - row_number() OVER (PARTITION BY media_id ORDER BY k) AS g
        |  FROM act WHERE active = 1
        |), runs AS (
        |  SELECT media_id, g, count(*) AS run FROM isl GROUP BY media_id, g
        |), per AS (
        |  SELECT media_id, count(*) AS n_spans, max(run) AS longest
        |  FROM runs GROUP BY media_id
        |)
        |SELECT b.media_id, b.n_frames, b.n_active,
        |  CAST(coalesce(p.n_spans, 0) AS INTEGER) AS n_spans,
        |  CAST(coalesce(p.longest, 0) AS INTEGER) AS longest_span
        |FROM base b LEFT JOIN per p USING (media_id)
        |ORDER BY media_id""".stripMargin,

    // videoFrameCatalog caps frames at 6; dims/frame-count formulas match
    // mediaMeta. The decoder must reproduce all three.
    "multimodal_video_frames" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id,
        |    CAST(n_chars % 64 + 16 AS INTEGER) AS frame_w,
        |    CAST(n_chars % 48 + 16 AS INTEGER) AS frame_h,
        |    least(n_chars % 30 + 1, 6) AS nf
        |  FROM documents WHERE doc_id % 3 = 2
        |)
        |SELECT media_id, CAST(unnest(range(nf)) AS INTEGER) AS frame_idx,
        |  frame_w, frame_h
        |FROM v ORDER BY media_id, frame_idx""".stripMargin,
    "multimodal_meta_stats" ->
      """WITH m AS (
        |  SELECT
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |    CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav' ELSE 'gif' END AS format,
        |    CAST(n_chars % 64 + 16 AS INTEGER) AS width,
        |    CAST(n_chars % 48 + 16 AS INTEGER) AS height,
        |    CAST(n_chars % 30 + 1 AS INTEGER) AS n_frames
        |  FROM documents
        |)
        |SELECT modality, format, count(*) AS n_media,
        |  CAST(sum(width) AS BIGINT) AS total_width,
        |  max(height) AS max_height, min(n_frames) AS min_frames
        |FROM m GROUP BY modality, format ORDER BY modality""".stripMargin,
    // video modality = doc_id % 3 == 2 (fromDocuments' element_at
    // mapping); decoded frame count = min(n_chars%30+1, 6) (the encode
    // cap videoFrameCatalog also uses), up to 4 evenly spaced samples at
    // idx = i*nf/take, geometry from the same width/height formulas the
    // decoder must reproduce.
    "multimodal_frames" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id,
        |    CAST(n_chars % 64 + 16 AS INTEGER) AS frame_w,
        |    CAST(n_chars % 48 + 16 AS INTEGER) AS frame_h,
        |    least(n_chars % 30 + 1, 6) AS nf
        |  FROM documents WHERE doc_id % 3 = 2
        |), f AS (
        |  SELECT media_id, frame_w, frame_h, nf, least(4, nf) AS take
        |  FROM v
        |), idx AS (
        |  SELECT media_id, frame_w, frame_h, nf, take,
        |    unnest(range(take)) AS sample_idx
        |  FROM f
        |)
        |SELECT media_id, CAST(sample_idx AS INTEGER) AS sample_idx,
        |  CAST(sample_idx * nf // take AS INTEGER) AS frame_idx,
        |  frame_w, frame_h
        |FROM idx ORDER BY media_id, sample_idx""".stripMargin
  )
}
