package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

class IsotonicSpec extends AnyFunSuite {

  test("already-monotone rates pass through untouched") {
    assert(Isotonic.pava(Seq((1L, 0L), (1L, 1L))) == Seq(0.0, 1.0))
    assert(Isotonic.pava(Seq((4L, 1L), (4L, 2L), (4L, 3L))) ==
      Seq(0.25, 0.5, 0.75))
  }

  test("a single violator pools with its neighbor") {
    assert(Isotonic.pava(Seq((1L, 1L), (1L, 0L))) == Seq(0.5, 0.5))
  }

  test("cascading merge: hand-run weighted example") {
    // rates (0.5, 1, 0) with weights (2, 1, 1): the trailing zero
    // pools right-to-left into one flat 0.5 block — hand-run of the
    // exact cross-multiplied merges.
    assert(Isotonic.pava(Seq((2L, 1L), (1L, 1L), (1L, 0L))) ==
      Seq(0.5, 0.5, 0.5))
  }

  test("output is always non-decreasing and mass-preserving") {
    val groups = Seq((3L, 2L), (5L, 1L), (2L, 2L), (4L, 1L), (6L, 5L))
    val f = Isotonic.pava(groups)
    assert(f.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // pooled means preserve total positives: sum(n_i * f_i) = sum(sy)
    val mass = groups.map(_._1.toDouble).zip(f).map(p => p._1 * p._2).sum
    assert(math.abs(mass - groups.map(_._2).sum.toDouble) < 1e-9)
  }

  test("empty and singleton inputs") {
    assert(Isotonic.pava(Nil) == Nil)
    assert(Isotonic.pava(Seq((7L, 3L))) == Seq(3.0 / 7.0))
  }
}
