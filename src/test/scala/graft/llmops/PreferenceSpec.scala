package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PreferenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fit(outcomes: Seq[(String, String)], iters: Int = 4)
      : Map[String, (Long, Long, Long)] =
    Preference.bradleyTerry(outcomes.toDF("winner", "loser"), iters)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("two players at 2:1 land on the analytic 2:1 strength ratio") {
    // MM fixed point for two players is π ∝ wins; integer floor-div
    // puts the trailer one micro under the exact 500_000. Hand-run:
    // round 1 → (1_000_000, 499_999), stable thereafter.
    val r = fit(Seq(("a", "b"), ("a", "b"), ("b", "a")))
    assert(r("a") == ((2L, 3L, 1000000L)))
    assert(r("b") == ((1L, 3L, 499999L)))
  }

  test("a zero-win player lands on the 1000-micro floor, not zero") {
    val r = fit(Seq(("a", "b"), ("a", "b"), ("a", "b")))
    assert(r("a") == ((3L, 3L, 1000000L)))
    assert(r("b") == ((0L, 3L, 1000L)))
  }

  test("symmetric round-robin is a uniform fixed point") {
    // a beats b, b beats c, c beats a: perfect symmetry, everyone at
    // the leader gauge.
    val r = fit(Seq(("a", "b"), ("b", "c"), ("c", "a")))
    assert(r.values.map(_._3).toSet == Set(1000000L))
    assert(r.values.map(_._1).toSet == Set(1L))
    assert(r.values.map(_._2).toSet == Set(2L))
  }

  test("zero iterations returns the uniform init gauge") {
    val r = fit(Seq(("a", "b")), iters = 0)
    assert(r("a") == ((1L, 1L, 1000000L)))
    assert(r("b") == ((0L, 1L, 1000000L)))
  }

  test("no decided comparisons yields an empty fit, not a crash") {
    assert(fit(Nil).isEmpty)
  }

  test("transitive dominance orders strengths monotonically") {
    // a > b > c by wins; fitted skills must order the same way.
    val r = fit(Seq(
      ("a", "b"), ("a", "b"), ("a", "c"), ("a", "c"),
      ("b", "c"), ("b", "c"), ("b", "a"), ("c", "b")))
    assert(r("a")._3 > r("b")._3 && r("b")._3 > r("c")._3)
  }

  test("densifyIds: ids land dense in [0, n), columns preserved") {
    // duplicated + sparse source ids — the merged-shard / replicated-
    // rehearsal shape the dense-id draw contract breaks on
    val df = Seq((900L, "a"), (900L, "b"), (7L, "c"), (7L, "d"), (42L, "e"))
      .toDF("doc_id", "payload")
    val dense = Preference.densifyIds(df, "did")
    assert(dense.columns.toSeq == Seq("doc_id", "payload", "did"))
    val dids = dense.select("did").collect().map(_.getLong(0)).sorted
    assert(dids.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // every original row survives with its payload intact
    assert(dense.select("payload").collect().map(_.getString(0)).sorted
      .toSeq == Seq("a", "b", "c", "d", "e"))
  }
}
