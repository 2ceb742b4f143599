package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the LSH band planner (MMDS §3.4 S-curve rule): thresholds of the
  * known 16-signature factorizations, the closest-below selection, its
  * monotonicity in the target, the never-above-target guarantee, and the
  * FP/FN profile asymmetry that justifies the rule.
  */
class LshPlannerSpec extends AnyFunSuite {
  import MinHashParams._

  test("banding thresholds of the 16-signature factorizations are the textbook values") {
    assert(math.abs(bandingThreshold(16, 1) - 0.0625) < 1e-12)
    assert(math.abs(bandingThreshold(8, 2) - math.sqrt(1.0 / 8)) < 1e-12)
    assert(math.abs(bandingThreshold(4, 4) - math.pow(0.25, 0.25)) < 1e-12)
    assert(math.abs(bandingThreshold(2, 8) - math.pow(0.5, 0.125)) < 1e-12)
    assert(bandingThreshold(1, 16) === 1.0)
  }

  test("planBands picks the factorization closest below the target") {
    // the q37 production setting: theta 0.4 over 16 sigs -> 8 bands x 2 rows
    assert(planBands(16, 0.4) === ((8, 2)))
    assert(planBands(16, 0.2) === ((16, 1)))  // only b16r1 (0.0625) sits below
    assert(planBands(16, 0.8) === ((4, 4)))   // 0.707 closest below 0.8
    assert(planBands(16, 0.95) === ((2, 8)))  // 0.917
    // a non-power-of-two length factorizes too
    assert(planBands(12, 0.5) === ((6, 2)))   // thresholds: 6x2 -> 0.408
  }

  test("selected threshold never exceeds the target when any factorization sits below it") {
    for (n <- Seq(8, 12, 16, 24, 32, 64); ti <- 2 to 19; t = ti * 0.05) {
      val (b, r) = planBands(n, t)
      assert(b * r === n)
      val th = bandingThreshold(b, r)
      val anyBelow = (1 to n).filter(n % _ == 0)
        .exists(bb => bandingThreshold(bb, n / bb) <= t)
      if (anyBelow) assert(th <= t + 1e-12,
        s"planBands($n, $t) chose ($b, $r) with threshold $th above the target")
    }
  }

  test("rows per band grow with the target (stricter targets need steeper curves)") {
    val rows = Seq(0.1, 0.3, 0.5, 0.7, 0.9).map(t => planBands(16, t)._2)
    assert(rows === rows.sorted)
  }

  test("the S-curve and its profile behave: candidates likelier with similarity, FN shrinks as bands grow") {
    val ps = Seq(0.1, 0.3, 0.5, 0.7, 0.9).map(candidateProb(_, 8, 2))
    assert(ps === ps.sorted && ps.head > 0.0 && ps.last < 1.0)
    // at the threshold itself the candidate probability is substantial
    assert(candidateProb(bandingThreshold(8, 2), 8, 2) > 0.5)
    // more bands at the same rows: higher recall (lower FN), more FP
    val (fpA, fnA) = bandingProfile(4, 2, 0.4)
    val (fpB, fnB) = bandingProfile(8, 2, 0.4)
    assert(fnB < fnA && fpB > fpA)
  }

  test("degenerate inputs are refused") {
    intercept[IllegalArgumentException](planBands(0, 0.5))
    intercept[IllegalArgumentException](planBands(16, 0.0))
    intercept[IllegalArgumentException](planBands(16, 1.0))
  }
}
