package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pin of the rendezvous-sharding invariants behind
  * `shard_rendezvous_gate` — the fixture row proves 8→9 once; these
  * properties prove the CONTRACT for every fleet size 2..11 over a
  * generated id population: (1) growth N→N+1 moves docs ONLY to the
  * new shard (the surviving shards' weights are untouched, so an
  * argmax can only flip to the newcomer); (2) every shard in [0, N)
  * is reachable (no dead shard from the 1-based `array_position`
  * offset); (3) assignment is a pure function of (id, N). Batched:
  * one generated population rides one DataFrame per fleet size, so
  * the sweep costs 2 scans per N, not a job per case. */
class HrwShardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic scalacheck draw (the scalatestplus bridge is not on
  // the offline classpath — the HashExprsPropSpec discipline)
  private val ids: Seq[Long] = {
    val gen = Gen.listOfN(400, Gen.choose(0L, 4000000000L))
    gen(Gen.Parameters.default, Seed(12L)).get.distinct
  }

  private def assign(n: Int): Map[Long, Long] =
    ids.toDF("doc_id")
      .select(col("doc_id"), QueriesText.hrwShard(n).as("s"))
      .as[(Long, Long)].collect().toMap

  test("growth N -> N+1 moves docs only to the new shard, N in 2..11") {
    var prev = assign(2)
    (3 to 12).foreach { n =>
      val cur = assign(n)
      ids.foreach { id =>
        assert(cur(id) == prev(id) || cur(id) == n - 1,
          s"id $id moved ${prev(id)} -> ${cur(id)} growing to $n " +
            "shards: movement to anything but the NEW shard breaks HRW")
      }
      prev = cur
    }
  }

  test("assignment is total, in-range, every shard reachable, stable") {
    val m = assign(8)
    assert(m.size == ids.size)
    assert(m.values.forall(s => s >= 0 && s < 8))
    assert(m.values.toSet.size == 8, "a dead shard means the argmax " +
      "or the 1-based array_position offset is wrong")
    assert(assign(8) == m, "assignment must be a pure function of " +
      "(id, N)")
  }
}
