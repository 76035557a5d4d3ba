package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the semantics of the round-5 snapshot/curation additions:
  *
  *  - `store_snapshot_diff` emits EXACTLY the edit script between the two
  *    snapshot versions: applying its insert/update/delete ops to the old
  *    snapshot must reproduce the new one, row for row.
  *  - `corpus_quality_adaptive` keeps precisely each language's top
  *    quartile by percent_rank (count formula + cut monotonicity).
  */
class SnapshotDiffSpec extends AnyFunSuite with SparkTestBase {

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf0_001)

  test("snapshot diff applied to the old snapshot reproduces the new one") {
    val old = spark.read.parquet(s"$sf0_001/embeddings.parquet")
      .select(col("vec_id").cast("string").as("key"), col("label"))
    val diff = q("store_snapshot_diff").cache()

    val applied = old
      .join(diff.filter(col("op") === "delete").select(col("key")),
        Seq("key"), "left_anti")
      .join(diff.filter(col("op") === "update")
        .select(col("key"), col("new_label")), Seq("key"), "left")
      .select(col("key"), coalesce(col("new_label"), col("label")).as("label"))
      .unionByName(diff.filter(col("op") === "insert")
        .select(col("key"), col("new_label").as("label")))

    // the expected new snapshot, derived independently from the same
    // %7 CDC rules the query documents
    val base = spark.read.parquet(s"$sf0_001/embeddings.parquet")
    val expected = base.filter(col("vec_id") % 7 =!= 0)
      .select(col("vec_id").cast("string").as("key"),
        when(col("vec_id") % 7 === 1, col("label") + 1000)
          .otherwise(col("label")).as("label"))
      .unionByName(base.filter(col("vec_id") % 7 === 2)
        .select((col("vec_id") + 100000).cast("string").as("key"),
          (col("label") + 2000).as("label")))

    assert(applied.exceptAll(expected).isEmpty && expected.exceptAll(applied).isEmpty)
    diff.unpersist()
  }

  test("diff op classes partition the changed keyspace") {
    val byOp = q("store_snapshot_diff").groupBy("op").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = spark.read.parquet(s"$sf0_001/embeddings.parquet")
    val n = (m: Int) => base.filter(col("vec_id") % 7 === m).count()
    assert(byOp("delete") == n(0))
    assert(byOp("update") == n(1))
    assert(byOp("insert") == n(2))
  }

  test("adaptive quality gate keeps exactly each language's top quartile") {
    val kept = q("corpus_quality_adaptive")
    val keptPerLang = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLang = spark.read.parquet(s"$sf0_001/documents.parquet")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      // percent_rank >= 0.75 over n unique ranks keeps
      // floor(0.25*(n-1)) + 1 rows
      val expected = if (n == 1) 1L else (n - 1) / 4 + 1
      assert(keptPerLang.getOrElse(lang, 0L) == expected,
        s"lang=$lang n=$n kept=${keptPerLang.getOrElse(lang, 0L)} expected=$expected")
    }
    // cut monotonicity: no kept row scores below a dropped row of the
    // same language (percent_rank orders by quality first)
    val minKept = kept.groupBy("lang").agg(min("quality").as("min_kept"))
    val dropped = spark.read.parquet(s"$sf0_001/documents.parquet")
      .select(col("doc_id"), col("lang"))
      .join(kept.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // a dropped doc's quality never exceeds the language's min kept score
    val q6 = graft.QueryPack.round6(
      graft.functions.TextSignals.qualityFromToks(split(trim(col("text")), "\\s+")))
    val droppedScored = spark.read.parquet(s"$sf0_001/documents.parquet")
      .join(dropped.select("doc_id"), Seq("doc_id"), "left_semi")
      .select(col("lang"), q6.as("quality"))
      .groupBy("lang").agg(max("quality").as("max_dropped"))
    val bad = minKept.join(droppedScored, "lang")
      .filter(col("max_dropped") > col("min_kept")).count()
    assert(bad == 0)
  }
}
