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

  private def assignIds(pop: Seq[Long], n: Int): Map[Long, Long] =
    pop.toDF("doc_id")
      .select(col("doc_id"), QueriesText.hrwShard(n).as("s"))
      .as[(Long, Long)].collect().toMap

  private def assign(n: Int): Map[Long, Long] = assignIds(ids, n)

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

  test("large fleets: 64 and 256 shards keep the HRW contract; the " +
    "weight computation stays scan-side (no exchange)") {
    // a larger population so reachability at 64 shards is a property,
    // not a coin flip (4000 ids / 64 shards: P(dead shard) ~ 1e-25)
    val bigIds: Seq[Long] = {
      val gen = Gen.listOfN(4000, Gen.choose(0L, 4000000000L))
      gen(Gen.Parameters.default, Seed(99L)).get.distinct
    }
    Seq(64, 256).foreach { n =>
      val cur = assignIds(bigIds, n)
      assert(cur.size == bigIds.size)
      assert(cur.values.forall(s => s >= 0 && s < n),
        s"out-of-range shard at fleet $n")
      if (n == 64)
        assert(cur.values.toSet.size == n,
          s"dead shard at fleet $n over ${bigIds.size} ids")
      // growth n -> n+1 still moves docs ONLY to the newcomer — the
      // minimal-movement property must not decay at production fleet
      // sizes, where mod-hash would reshuffle (n-1)/n of the corpus
      val next = assignIds(bigIds, n + 1)
      val moved = bigIds.filter(id => cur(id) != next(id))
      assert(moved.forall(id => next(id) == n),
        s"fleet $n -> ${n + 1}: movement to a surviving shard")
      // volume ~ pop/(n+1): generous 3x band, zero would mean the
      // newcomer's hash domain never wins
      assert(moved.size > 0 && moved.size < 3 * bigIds.size / n,
        s"fleet $n -> ${n + 1} moved ${moved.size} of ${bigIds.size}")
    }
    // the 256-wide weight argmax is a SCAN-SIDE projection: no
    // exchange, no generator — per-row cost grows only with fleet
    // size, which is what lets the shard column ride the corpus scan
    val plan = spark.range(100)
      .select(col("id").as("doc_id"))
      .select(QueriesText.hrwShard(256).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"hrwShard(256) plan shuffles:\n$plan")
    assert(!plan.contains("Generate"),
      s"hrwShard(256) plan explodes:\n$plan")
  }
}
