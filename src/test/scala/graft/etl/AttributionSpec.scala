package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class AttributionSpec extends AnyFunSuite {

  test("single mandatory channel takes the whole credit") {
    // start→a→conv: killing a kills every conversion path.
    val r = Attribution.removalEffects(
      Seq(("start", "a", 1L), ("a", "conv", 1L)))
    assert(r == Seq(("a", 1000000L, 0L, 1000000L, 1000000L)))
  }

  test("a channel that only leads to null earns zero credit") {
    // Two equally likely first touches: a converts, b dead-ends.
    // Base = 1/2; removing a → 0 (full effect), removing b → 1/2
    // unchanged (zero effect, zero share).
    val r = Attribution.removalEffects(Seq(
      ("start", "a", 1L), ("start", "b", 1L),
      ("a", "conv", 1L), ("b", "null", 1L)))
    assert(r == Seq(
      ("a", 500000L, 0L, 1000000L, 1000000L),
      ("b", 500000L, 500000L, 0L, 0L)))
  }

  test("symmetric two-step funnel splits credit evenly") {
    // start→a→conv and start→b→conv, same counts: equal removal
    // effects, 50/50 share.
    val r = Attribution.removalEffects(Seq(
      ("start", "a", 2L), ("start", "b", 2L),
      ("a", "conv", 2L), ("b", "conv", 2L)))
    assert(r.map(x => (x._1, x._5)) ==
      Seq(("a", 500000L), ("b", 500000L)))
    assert(r.forall(_._2 == 1000000L))
    assert(r.forall(_._3 == 500000L))
  }

  test("self-loops converge within the fixed budget") {
    // a loops on itself 3:1 against converting: v(a) after T rounds
    // approaches 1 from below; with integer floor-div the 12-round
    // value is deterministic and strictly positive.
    val r = Attribution.removalEffects(Seq(
      ("start", "a", 1L), ("a", "a", 3L), ("a", "conv", 1L)))
    val (_, base, removed, re, share) = r.head
    assert(base > 900000L && base < 1000000L)
    assert(removed == 0L && re == 1000000L && share == 1000000L)
  }

  test("zero-iteration budget returns the init value") {
    val r = Attribution.removalEffects(
      Seq(("start", "a", 1L), ("a", "conv", 1L)), iterations = 0)
    assert(r == Seq(("a", 0L, 0L, 0L, 0L)))
  }
}
