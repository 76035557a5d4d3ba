package graft.queries

import org.apache.spark.sql.functions._

/** Timing probe for the bitext_exact shared build — env-configurable like
  * PlanDump (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS; r18, ADVICE). */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang")
    val byLang = emb.join(docs, "doc_id").localCheckpoint()
    val en = byLang.filter(col("lang") === "en")
      .select(col("doc_id").as("e_id"), col("embedding").as("e_emb"))
    val fr = byLang.filter(col("lang") =!= "en")
      .select(col("doc_id").as("f_id"), col("lang").as("f_lang"),
        col("embedding").as("f_emb"))
    println("en=" + en.count() + " fr=" + fr.count())
    def scored = fr.crossJoin(broadcast(en))
      .select(col("f_id"), col("f_lang"), col("e_id"),
        graft.QueryPack.round6(graft.functions.VectorFunctions.cosineSim(
          col("f_emb"), col("e_emb"))).as("cos"))
    time("scored-noop")(noop(scored))
    time("scored-noop2")(noop(scored))
    time("cand-top16")(noop(scored.groupBy(col("f_id"), col("f_lang"))
      .agg(graft.functions.TopKByScore(16)(col("cos"), col("e_id")).as("h"))))
    time("me-top4")(noop(scored.groupBy(col("e_id"))
      .agg(graft.functions.TopKByScore(4)(col("cos"), col("f_id")).as("h"))))
    time("full-build")(noop(SimilarityQueries.bitextMineExact(s, dir)))
    time("full-build2")(noop(SimilarityQueries.bitextMineExact(s, dir)))
    s.stop()
  }
}
