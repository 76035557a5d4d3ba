package graft.queries

import graft.{SparkEntry, SparkTestBase}
import graft.functions.VectorFunctions.cosineSim
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the data-selection / privacy operators added in
  * round 6 — the properties the row-hash oracle proves equal but not
  * meaningful: SemDeDup's keep rule, MMR's diversity gain, and the
  * k-anonymity accounting identity. */
class SelectionPrivacySpec extends AnyFunSuite with SparkTestBase {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0_001)

  test("dedup_semantic: removal is exactly 'an earlier in-cluster neighbor within tau'") {
    val res = run("dedup_semantic").localCheckpoint()
    val emb = spark.read.parquet(s"$sf0_001/embeddings.parquet")
    val m = res.join(emb, "vec_id")
    val a = m.select(col("cluster"), col("vec_id").as("a_id"),
      col("embedding").as("emb_a"))
    val b = m.select(col("cluster"), col("vec_id").as("b_id"),
      col("embedding").as("emb_b"), col("kept").as("b_kept"))
    val dominated = a.join(b, Seq("cluster"))
      .filter(col("a_id") < col("b_id") &&
        cosineSim(col("emb_a"), col("emb_b")) >= 0.4)
      .select(col("b_id").as("vec_id"), col("b_kept")).distinct()
    // every dominated vector was removed...
    assert(dominated.filter(col("b_kept")).isEmpty)
    // ...and every removed vector is dominated (no spurious drops)
    val removed = res.filter(!col("kept")).select("vec_id")
    assert(removed.join(dominated, "vec_id", "left_anti").isEmpty)
    // the prune actually fires on this corpus (threshold is live)
    assert(removed.count() > 0)
  }

  test("dedup_semantic: cluster ids are valid seed ids and every vector is assigned") {
    val res = run("dedup_semantic")
    assert(res.filter(col("cluster") < 0 || col("cluster") >= 8).isEmpty)
    val n = spark.read.parquet(s"$sf0_001/embeddings.parquet").count()
    assert(res.count() == n)
  }

  test("corpus_select_mmr: 5 distinct picks, rank 1 is argmax relevance, diversity beats top-k") {
    val sel = run("corpus_select_mmr").localCheckpoint()
    assert(sel.count() == 5)
    assert(sel.select("vec_id").distinct().count() == 5)
    val emb = spark.read.parquet(s"$sf0_001/embeddings.parquet")
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val rel = emb.crossJoin(broadcast(qv))
      .select(col("vec_id"), cosineSim(col("embedding"), col("q")).as("rel"))
    // rank 1 = the most relevant vector (the query itself lives in-corpus)
    val top1 = rel.orderBy(desc("rel"), col("vec_id")).limit(1)
      .head.getLong(0)
    assert(sel.filter(col("sel_rank") === 1).head.getLong(1) == top1)
    // MMR's selected set is strictly more diverse (lower mean pairwise
    // cosine) than the plain top-5-by-relevance set
    def meanPairSim(ids: Seq[Long]): Double = {
      val sub = emb.filter(col("vec_id").isin(ids: _*))
      val x = sub.select(col("vec_id").as("i"), col("embedding").as("ei"))
      val y = sub.select(col("vec_id").as("j"), col("embedding").as("ej"))
      x.join(y, col("i") < col("j"))
        .agg(avg(cosineSim(col("ei"), col("ej")))).head.getDouble(0)
    }
    val mmrIds = sel.select("vec_id").collect().map(_.getLong(0)).toSeq
    val topIds = rel.orderBy(desc("rel"), col("vec_id")).limit(5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(meanPairSim(mmrIds) < meanPairSim(topIds))
  }

  test("corpus_k_anonymity: class sizes sum to the corpus and flags match K=5") {
    val k = run("corpus_k_anonymity").localCheckpoint()
    val n = spark.read.parquet(s"$sf0_001/documents.parquet").count()
    assert(k.agg(sum("class_size")).head.getLong(0) == n)
    assert(k.filter(col("k_anonymous") =!= (col("class_size") >= 5)).isEmpty)
    // risk_share is zero exactly on anonymous classes, positive otherwise
    assert(k.filter(col("k_anonymous") && col("risk_share") =!= 0.0).isEmpty)
    assert(k.filter(!col("k_anonymous") && col("risk_share") <= 0.0).isEmpty)
  }
}
