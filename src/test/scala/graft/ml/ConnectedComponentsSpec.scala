package graft.ml

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain propagates the minimum across multiple hops") {
    // 1-2-3-4-5 has diameter 4: exercises several propagation rounds
    val got = components(Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep distinct labels") {
    val got = components(Seq((10L, 11L), (20L, 21L), (21L, 22L), (30L, 30L)))
    assert(got == Map(10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L))
  }

  test("cycles and duplicate/reversed edges converge") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("isolated vertices (no edges) are absent from the output") {
    val got = components(Seq((7L, 8L)))
    assert(got.keySet == Set(7L, 8L))
  }

  private def starComponents(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.runStar(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction resolves a 400-node chain within its O(log n) budget") {
    // diameter 399: min-label propagation would need ~400 rounds and
    // trip its maxIterations guard; the alternating star contraction
    // must converge inside its default 30-round budget
    val chain = (1L until 400L).map(i => (i, i + 1))
    val got = starComponents(chain)
    assert(got.size == 400 && got.values.forall(_ == 1L))
  }

  test("star contraction matches min-label propagation on a mixed graph") {
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (20L, 21L), (21L, 22L), (30L, 30L),
      (1L, 2L), (3L, 1L), (40L, 41L), (41L, 42L), (42L, 40L))
    assert(starComponents(edges) - 30L == components(edges) - 30L)
    // self-loop-only vertices differ by contract: runStar's canonical
    // edge filter drops (30,30) entirely, run() keeps the vertex
  }
}
