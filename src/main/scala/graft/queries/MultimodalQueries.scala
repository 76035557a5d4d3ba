package graft.queries

import graft.QueryPack
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Multimodal pipeline surface (rows-only driver check — image decode is
 * real javax.imageio pixel work with no SQL-expressible oracle, and the
 * audio/video decode is a documented stub, see
 * [[graft.multimodal.MediaCodecs]]; component correctness is pinned by
 * MultimodalSpec).
 */
object MultimodalQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // Binary-column feature extraction -> per-modality rollup.
    "multimodal_features" -> ((s, dir) => {
      val media = MultimodalOps.fromDocuments(t(s, dir, "documents"))
      MultimodalOps.extractFeatures(media).toDF()
        .select(col("media_id"), col("modality"), col("n_bytes"),
          // order-independent: decimal sum of the first histogram bin
          element_at(col("features"), 1).cast(DecimalType(18, 9)).as("f0"))
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("total_bytes"),
          round6(sum(col("f0")).cast("double")).as("f0_sum"))
        .orderBy(col("modality"))
    }),

    // Frame sampling: one row per sampled frame with its byte length.
    "multimodal_frames" -> ((s, dir) => {
      val media = MultimodalOps.fromDocuments(t(s, dir, "documents"))
      MultimodalOps.sampleFrames(media, frameSize = 32, n = 4).toDF()
        .select(col("media_id"), col("frame_idx"), length(col("frame")).as("frame_bytes"))
        .orderBy(col("media_id"), col("frame_idx"))
    })
  )

  override def oracleSql: Map[String, String] = Map.empty
}
