package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BottomKMinsSpec extends AnyFunSuite with SparkTestBase {

  private val agg = new BottomKMins(3)

  test("keeps the k smallest distinct values in order") {
    val in = Seq("f", "c", "a", "e", "b", "d").map((_, 0, 0))
    val out = in.foldLeft(agg.zero)(agg.reduce)
    assert(out.map(_.h) == Seq("a", "b", "c"))
  }

  test("duplicate fingerprints OR-merge their side flags, never double-count") {
    val in = Seq(("a", 1, 0), ("b", 1, 0), ("a", 0, 1), ("c", 0, 1))
    val out = in.foldLeft(agg.zero)(agg.reduce)
    assert(out == Seq(KmvEntry("a", 1, 1), KmvEntry("b", 1, 0), KmvEntry("c", 0, 1)))
  }

  test("merge is partition-independent: any split reduces to the same sketch") {
    val in = Seq(("d", 1, 0), ("a", 0, 1), ("c", 1, 0), ("a", 1, 0),
      ("b", 0, 1), ("e", 1, 1), ("b", 1, 0))
    val whole = in.foldLeft(agg.zero)(agg.reduce)
    for (cut <- 0 to in.size) {
      val (l, r) = in.splitAt(cut)
      val split = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(split == whole, s"cut=$cut")
    }
    assert(whole.map(_.h) == Seq("a", "b", "c"))
    assert(whole.head == KmvEntry("a", 1, 1))
  }

  test("flags lost to local eviction only belong to globally-evicted values") {
    // partition 1 sees "z" (with a flag) plus 3 smaller values → z evicted
    // locally; partition 2 has z in its sketch. Merged bottom-3 excludes z
    // entirely, so the lost flag is irrelevant — the invariant the scale
    // argument rests on.
    val p1 = Seq(("a", 0, 0), ("b", 0, 0), ("c", 0, 0), ("z", 1, 1))
      .foldLeft(agg.zero)(agg.reduce)
    val p2 = Seq(("z", 0, 0)).foldLeft(agg.zero)(agg.reduce)
    assert(!agg.merge(p1, p2).exists(_.h == "z"))
  }

  test("corpus_overlap_kmv plan has no window sort and its hash-set is stable") {
    val df = graft.queries.QualityQueries.queries("corpus_overlap_kmv")(spark, sf0_001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window survived in plan:\n${plan.take(2000)}")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // sanity: estimates in [0,1], union bounded by k, adjacent cross-posted
    // pairs see real overlap
    rows.foreach { r =>
      assert(r.getLong(2) <= 64)
      val j = r.getDouble(4)
      assert(j >= 0.0 && j <= 1.0)
    }
    val adjacent = rows.filter { r =>
      val a = r.getString(0).drop(3).toInt
      val b = r.getString(1).drop(3).toInt
      (a + 1) % 20 == b || (b + 1) % 20 == a
    }
    assert(adjacent.exists(_.getDouble(4) > 0.0),
      "cross-posted adjacent sources show no overlap")
  }
}
