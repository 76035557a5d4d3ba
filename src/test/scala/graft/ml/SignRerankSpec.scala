package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Scale contract of the binary-sign search plan (VERDICT r8 ask #4):
 * the Hamming shortlist must stream only the persisted 16-byte/row
 * signature table (never a float embedding column), and the exact
 * re-rank's embedding fetch must be dynamic-partition-pruned by the
 * broadcast shortlist instead of re-scanning the full corpus embedding
 * column — the same discipline PqRerankSpec pins for the PQ family.
 */
class SignRerankSpec extends AnyFunSuite with SparkTestBase {

  test("sign search: shortlist scans signatures only; re-rank fetch is pruned") {
    val cacheRoot = scratchDir("graft-sign-rerank")
    val built = SignIndex.openOrBuild(spark, s"$sf0_001/embeddings.parquet",
      "vec_id", "embedding", cacheRoot)

    val q = spark.read.parquet(s"$sf0_001/embeddings.parquet")
      .filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"),
        graft.functions.VectorFunctions.signPack(col("embedding")).as("q_packed"),
        col("embedding").as("q_emb"))
    val res = SignIndex.scoredShortlist(built, q, 40)
    assert(res.count() == 120, "3 queries x 40 shortlist rows")
    val plan = res.queryExecution.executedPlan.toString
    val lines = plan.split("\n")

    // the fetch scan is the only one with a `bucket` partition column
    val embScan = lines.filter(l => l.contains("FileScan") && l.contains("bucket#"))
    assert(embScan.nonEmpty, "expected a FileScan over the embById table")
    assert(plan.contains("dynamicpruning"),
      "re-rank fetch must be dynamic-partition-pruned by the shortlist")
    assert(plan.contains("SubqueryAdaptiveBroadcast") || plan.contains("SubqueryBroadcast"),
      "pruning subquery must reuse the shortlist broadcast")

    // the shortlist side streams the signature table only — its scan must
    // not read any float embedding column
    val signScan = lines.filter(l => l.contains("FileScan") && l.contains("packed#"))
    assert(signScan.nonEmpty, "expected a FileScan over the signs table")
    assert(!signScan.exists(l => l.contains("emb#") || l.contains("embedding#")),
      s"shortlist scan must not read embeddings: ${signScan.mkString}")
  }

  test("append extends both tables with LWW and no re-encode of the base") {
    val spark2 = spark
    import spark2.implicits._
    val base = Seq(
      (0L, Seq(1.0f, -1.0f)), (1L, Seq(-1.0f, 1.0f)), (2L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val built = SignIndex.build(base, "vec_id", "embedding")
    val delta = Seq(
      (2L, Seq(-1.0f, -1.0f)), (3L, Seq(1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val grown = SignIndex.append(built, delta, "vec_id", "embedding")
    assert(grown.signs.count() == 4)
    assert(grown.embById.count() == 4)
    // LWW: id 2's embedding is the delta's, and its signature re-derived
    val e2 = grown.embById.filter(col("id") === 2)
      .select(col("emb")).head.getSeq[Float](0)
    assert(e2 == Seq(-1.0f, -1.0f))
    val s2 = grown.signs.filter(col("id") === 2).head.getLong(1)
    val expect = SignIndex.build(delta, "vec_id", "embedding")
      .signs.filter(col("id") === 2).head.getLong(1)
    assert(s2 == expect)
  }
}
