package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the algebra `events_changepoint_cusum` rests on: Page's recursive
 * CUSUM statistic S_k = max(0, S_{k-1} + dev_k), S_0 = 0, equals the
 * drawdown of the plain cumulative sum, C_k - min_{0<=j<=k} C_j with
 * C_0 = 0 — which is what lets a recursively-defined statistic run as
 * two stock running-window aggregates instead of a UDAF. The empty
 * prefix (C_0 = 0) must participate in the minimum: on a series whose
 * cumsum never dips below zero, min over j>=1 alone under-subtracts and
 * the identity breaks (the least(·, 0) in the query).
 *
 * Pure-Scala exact-decimal check — same 6-dp BigDecimal arithmetic the
 * query routes through DECIMAL(27,6), no Spark session needed.
 */
class CusumIdentitySpec extends AnyFunSuite {

  private def recursive(devs: Seq[BigDecimal]): Seq[BigDecimal] =
    devs.scanLeft(BigDecimal(0))((s, d) => (s + d).max(0)).tail

  private def drawdown(devs: Seq[BigDecimal]): Seq[BigDecimal] = {
    val cums = devs.scanLeft(BigDecimal(0))(_ + _).tail
    val runmin = cums.scanLeft(BigDecimal(0))(_ min _).tail // includes C_0=0
    cums.zip(runmin).map { case (c, m) => c - m }
  }

  test("drawdown form equals Page's recursive CUSUM on pseudo-random series") {
    val rnd = new scala.util.Random(20260814L)
    for (_ <- 1 to 50) {
      val devs = Vector.fill(300)(BigDecimal(rnd.nextInt(2000001) - 1000000, 6))
      assert(drawdown(devs) == recursive(devs))
    }
  }

  test("identity needs the empty prefix: all-positive deviations") {
    val devs = Vector.fill(10)(BigDecimal("1.000000"))
    assert(drawdown(devs) == recursive(devs))
    assert(recursive(devs).last == BigDecimal(10)) // barrier never binds
    // the min over j>=1 only (what the query would compute WITHOUT
    // least(·,0)) under-subtracts here:
    val cums = devs.scanLeft(BigDecimal(0))(_ + _).tail
    val wrong = cums.map(c => c - cums.take(cums.indexOf(c) + 1).min)
    assert(wrong.last != recursive(devs).last)
  }

  test("level shift is localized at the peak") {
    // flat at -1 for 100 points, then +1 for 100: the statistic peaks at
    // the end, and the recursive form resets to zero through the first
    // half (the barrier binds), matching drawdown exactly.
    val devs = Vector.fill(100)(BigDecimal(-1)) ++ Vector.fill(100)(BigDecimal(1))
    val dd = drawdown(devs)
    assert(dd == recursive(devs))
    assert(dd.take(100).forall(_ == 0))
    assert(dd.last == BigDecimal(100))
    assert(dd.zipWithIndex.maxBy(p => (p._1, p._2))._2 == 199)
  }
}
