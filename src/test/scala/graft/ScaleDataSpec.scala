package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The weak-scaling corpus builder behind SCALE.md's measured curve:
  * N key-offset shards with intact within-shard structure, disjoint
  * across shards. If this construction drifts, the scaling ratios stop
  * meaning anything, so pin its invariants. */
class ScaleDataSpec extends AnyFunSuite with SparkTestBase {

  private lazy val dest = {
    val d = scratchDir("graft_scale_spec")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { name =>
      val base =
        if (name == "events") QueryPack.loadEvents(spark, s"$sf0_001/events.parquet")
        else spark.read.parquet(s"$sf0_001/$name.parquet")
      val copies = if (Set("region", "nation")(name)) 1 else 2
      (0 until copies).map(i => ScaleData.scaleTable(name, base, i))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$d/$name.parquet")
    }
    d
  }

  private def n(dir: String, t: String): Long =
    spark.read.parquet(s"$dir/$t.parquet").count()

  test("facts scale by the factor; fixed dims stay 1x") {
    for (t <- Seq("customer", "orders", "lineitem", "events", "documents", "embeddings"))
      assert(n(dest, t) == 2 * n(sf0_001, t), t)
    for (t <- Seq("region", "nation"))
      assert(n(dest, t) == n(sf0_001, t), t)
  }

  test("referential integrity holds within shards (no cross-shard fan-out)") {
    val orders = spark.read.parquet(s"$dest/orders.parquet")
    val cust = spark.read.parquet(s"$dest/customer.parquet")
    assert(orders.join(cust, col("o_custkey") === col("c_custkey"), "left_anti")
      .count() == 0)
    val li = spark.read.parquet(s"$dest/lineitem.parquet")
    assert(li.join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count() == 0)
    // keys are globally unique after offsetting
    assert(cust.select("c_custkey").distinct().count() == cust.count())
  }

  test("document rotation preserves within-shard structure, breaks cross-shard dups") {
    val docs = spark.read.parquet(s"$dest/documents.parquet")
    val a = docs.filter(col("doc_id") < 100000000L)
      .select(col("doc_id").as("id0"), col("text").as("t0"),
        col("n_chars").as("nc0"))
    val b = docs.filter(col("doc_id") >= 100000000L)
      .select((col("doc_id") - 100000000L).as("id0"), col("text").as("t1"),
        col("n_chars").as("nc1"))
    val paired = a.join(b, "id0").localCheckpoint()
    // rotation is length-preserving (token boundaries, length bands intact)
    assert(paired.filter(length(col("t0")) =!= length(col("t1"))).count() == 0)
    assert(paired.filter(col("nc0") =!= col("nc1")).count() == 0)
    // and content-changing wherever there are letters to rotate: a
    // verbatim copy would be an exact dup
    assert(paired.filter(col("t0") === col("t1") &&
      col("t0").rlike("[A-Za-z]")).count() == 0)
    // bijectivity: rotating back by one step recovers the original
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val rot1 = lower.drop(1) + lower.take(1) + upper.drop(1) + upper.take(1)
    assert(paired.filter(
      translate(col("t0"), lower + upper, rot1) =!= col("t1")).count() == 0)
  }

  test("embedding perturbation breaks cross-shard score ties only") {
    val emb = spark.read.parquet(s"$dest/embeddings.parquet")
    val a = emb.filter(col("vec_id") < 100000000L)
      .select(col("vec_id").as("id0"), col("embedding").as("e0"))
    val b = emb.filter(col("vec_id") >= 100000000L)
      .select((col("vec_id") - 100000000L).as("id0"), col("embedding").as("e1"))
    val paired = a.join(b, "id0").localCheckpoint()
    // element 0 differs, the rest is bit-identical
    assert(paired.filter(element_at(col("e0"), 1) === element_at(col("e1"), 1))
      .count() == 0)
    assert(paired.filter(
      slice(col("e0"), 2, 100000) =!= slice(col("e1"), 2, 100000)).count() == 0)
  }

  test("factor beyond the 26-letter rotation wrap is rejected") {
    // copy 26's rotation would be the identity — verbatim copy-0 text,
    // N-way exact-dup cliques, contaminated weak-scaling ratios
    ScaleData.requireFactor(26) // boundary: still bijective
    intercept[IllegalArgumentException](ScaleData.requireFactor(27))
    intercept[IllegalArgumentException](ScaleData.requireFactor(0))
  }
}
