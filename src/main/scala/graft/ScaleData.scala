package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Derived weak-scaling corpus builder (VERDICT r10 ask #1): writes an
 * N× blow-up of a testdata SF directory so the scaling curve of the
 * heaviest queries can be MEASURED, not argued. The testdata dirs are
 * read-only, so the result lands in a scratch directory the caller owns.
 *
 *   sbt "runMain graft.ScaleData /root/testdata/sf0.1 /tmp/graft-scale10 10"
 *
 * Construction — N key-offset shards, content-disjoint by design:
 *  - `region`/`nation` stay 1× (fixed-cardinality dimensions, as in
 *    TPC-H: SF scales facts, not the 25-nation map);
 *  - every other table is the union of N copies with all entity keys
 *    offset by `copy * 100_000_000` — referential integrity holds
 *    within each copy, so joins fan out linearly, never across copies;
 *  - `documents.text` gets a per-copy Caesar rotation of the letter
 *    alphabet (`translate`, bijective per copy). This keeps every
 *    within-copy relationship EXACTLY intact — token boundaries,
 *    lengths, shingle-set equalities, dup/near-dup structure — while
 *    making shingles pairwise-disjoint ACROSS copies. Without it, N
 *    verbatim copies turn every doc into an N-way exact-dup clique and
 *    near-dup candidate volume scales as N² — a 10× corpus would
 *    genuinely contain 100× the dup pairs, measuring the data blow-up
 *    instead of the plan. With it, the corpus is the textbook
 *    weak-scaling workload: N independent shards of the sf0.1 problem,
 *    expected cost ratio ≈ N for a linear plan;
 *  - `embeddings` vectors get +copy·1e-4 on element 0: identical
 *    vectors across copies would make exact-kNN ties arbitrary between
 *    copies (recall audits would measure tie-breaking, not indexing);
 *    the perturbation breaks ties while leaving geometry intact.
 */
object ScaleData {

  private val KeyOffset = 100000000L

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase

  private def rot(alpha: String, i: Int): String =
    alpha.drop(i % alpha.length) + alpha.take(i % alpha.length)

  /** The per-copy Caesar rotation wraps at 26, so copy 26 would carry
    * VERBATIM copy-0 text — reintroducing the exact cross-copy dup
    * cliques the construction exists to prevent, and silently
    * contaminating every weak-scaling ratio measured on the corpus.
    * Enforce the invariant instead of assuming it. */
  def requireFactor(factor: Int): Unit =
    require(factor >= 1 && factor <= 26,
      s"weak-scaling factor must be in [1, 26] (the text rotation is " +
        s"bijective per copy only below the 26-letter wrap); got $factor")

  /** Offset every listed key column by copy*KeyOffset. */
  private def offsetKeys(df: DataFrame, copy: Int, keys: Seq[String]): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(copy * KeyOffset)))

  def scaleTable(name: String, df: DataFrame, copy: Int): DataFrame = name match {
    case "customer" => offsetKeys(df, copy, Seq("c_custkey"))
    case "supplier" => offsetKeys(df, copy, Seq("s_suppkey"))
    case "part"     => offsetKeys(df, copy, Seq("p_partkey"))
    case "orders"   => offsetKeys(df, copy, Seq("o_orderkey", "o_custkey"))
    case "lineitem" => offsetKeys(df, copy, Seq("l_orderkey", "l_partkey", "l_suppkey"))
    case "events"   => offsetKeys(df, copy, Seq("event_id", "user_id"))
    case "documents" =>
      val rotated =
        if (copy == 0) col("text")
        else translate(col("text"), Lower + Upper, rot(Lower, copy) + rot(Upper, copy))
      offsetKeys(df, copy, Seq("doc_id")).withColumn("text", rotated)
    case "embeddings" =>
      val perturbed =
        if (copy == 0) col("embedding")
        else expr(s"transform(embedding, (x, j) -> " +
          s"IF(j = 0, CAST(x + ${copy}e-4 AS FLOAT), x))")
      offsetKeys(df, copy, Seq("vec_id")).withColumn("embedding", perturbed)
    case _ => df // region, nation: fixed dimensions
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleData <srcDir> <destDir> <factor>")
    val Array(src, dest, factorStr) = args
    val factor = factorStr.toInt
    requireFactor(factor)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaled = Seq("customer", "supplier", "part", "orders", "lineitem",
      "events", "documents", "embeddings")
    val fixed = Seq("region", "nation")

    fixed.foreach { name =>
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$dest/$name.parquet")
    }
    scaled.foreach { name =>
      val base =
        if (name == "events") QueryPack.loadEvents(spark, s"$src/events.parquet")
        else spark.read.parquet(s"$src/$name.parquet")
      val union = (0 until factor)
        .map(i => scaleTable(name, base, i))
        .reduce(_ unionByName _)
        // realistic multi-file layout: a 1000-executor table is split
        // files, not one blob — and the copy-union's natural partitioning
        // (one input split per copy) is exactly N files anyway
        .repartition(math.max(factor, 8))
      union.write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"[scale] $name x$factor written")
    }
    spark.stop()
  }
}
