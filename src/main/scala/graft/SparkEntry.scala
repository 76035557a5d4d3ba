package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  private def packs: Seq[QueryPack] = Seq(
    VectorQueries,
    RelationalQueries,
    StoreQueries,
    SimilarityQueries,
    EventQueries,
    TextQueries,
    DedupQueries,
    AnnQueries,
    MultimodalQueries,
    ScaleQueries,
    CurationQueries,
    SearchQueries,
    GraphQueries,
    QualityQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Direct analog of the reference's GetNearestMatchesAsync
    * (MerkonMemoryStore.cs:117-150): exact cosine top-k. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = packs.flatMap(_.queries).toMap
    // A name collision across packs would silently shadow a query AND its
    // oracle; fail fast instead.
    require(merged.size == packs.map(_.queries.size).sum,
      "duplicate query name across QueryPacks")
    merged
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = packs.flatMap(_.oracleSql).toMap
}
