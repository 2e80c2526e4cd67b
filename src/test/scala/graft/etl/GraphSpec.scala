package graft.etl

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)],
                    nodes: Seq[Long], iters: Int): Map[Long, Long] =
    Graph.weightedPageRank(
        edges.toDF("src", "dst", "w"), nodes.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-cycle holds full rank; isolated node sits on the teleport floor") {
    // 1↔2 pass their whole rank back and forth: 150k + 85% of 1M = 1M
    // exactly, a fixed point of the integer recurrence; 3 gets nothing.
    val r = ranks(Seq((1L, 2L, 1L), (2L, 1L, 1L)), Seq(1L, 2L, 3L), 5)
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 150000L))
  }

  test("weighted split matches the hand-run integer recurrence") {
    // 1 → 2 (w=3), 1 → 3 (w=1); node 1 has no inflow so it decays to
    // the floor after one round, and from round 2 on the flow is the
    // floor rank split 3:1 — hand-computed fixed point:
    //   node1 = 150_000
    //   node2 = 150_000 + (85 * ((150_000*3) div 4)) div 100 = 245_625
    //   node3 = 150_000 + (85 * ((150_000*1) div 4)) div 100 = 181_875
    val r = ranks(Seq((1L, 2L, 3L), (1L, 3L, 1L)), Seq(1L, 2L, 3L), 5)
    assert(r == Map(1L -> 150000L, 2L -> 245625L, 3L -> 181875L))
  }

  test("zero iterations returns the uniform init vector") {
    val r = ranks(Seq((1L, 2L, 1L)), Seq(1L, 2L), 0)
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  private def ppr(edges: Seq[(Long, Long, Long)], nodes: Seq[Long],
                  seeds: Seq[Long], iters: Int): Map[Long, Long] =
    Graph.personalizedPageRank(edges.toDF("src", "dst", "w"),
        nodes.toDF("node"), seeds.toDF("node"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ppr: mass flows only from the seed; unreachable nodes stay at exact 0") {
    // seed 1 → 2; node 3 unreachable from the seed (3 → 1 edge points
    // the wrong way). rank(1) holds the teleport floor (no inflow),
    // rank(2) = 85% of it, rank(3) = 0 exactly.
    val r = ppr(Seq((1L, 2L, 1L), (3L, 1L, 1L)), Seq(1L, 2L, 3L),
      Seq(1L), 5)
    assert(r(1L) == 150000L)
    assert(r(2L) == 127500L)
    assert(r(3L) == 0L)
  }

  test("ppr: two seeds accumulate along the chain") {
    // seeds 1 and 2, chain 1→2→3. rank(1)=150000;
    // rank(2)=150000+127500=277500 at the fixed point;
    // rank(3)=85%·277500 = 235875.
    val r = ppr(Seq((1L, 2L, 1L), (2L, 3L, 1L)), Seq(1L, 2L, 3L),
      Seq(1L, 2L), 6)
    assert(r == Map(1L -> 150000L, 2L -> 277500L, 3L -> 235875L))
  }

  private def hits(edges: Seq[(Long, Long, Long)], nodes: Seq[Long],
                   iters: Int): Map[Long, (Long, Long)] =
    Graph.hits(edges.toDF("src", "dst", "w"), nodes.toDF("node"), iters)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("hits: star graph reaches its fixed point; isolated node scores zero") {
    // 1,2,3 → 4: the sources are the only hubs (max-normalized to 1e6
    // each by symmetry), 4 the only authority; the isolated node 5
    // receives and emits nothing. Round 2 reproduces round 1's vector
    // exactly, so 4 iterations land on the same integers as 1.
    val r = hits(Seq((1L, 4L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)),
      Seq(1L, 2L, 3L, 4L, 5L), 4)
    assert(r(1L) == ((1000000L, 0L)) && r(2L) == ((1000000L, 0L)) &&
      r(3L) == ((1000000L, 0L)))
    assert(r(4L) == ((0L, 1000000L)))
    assert(r(5L) == ((0L, 0L)))
  }

  test("hits: one round matches the hand-run integer recurrence") {
    // 1→3 (w=3), 2→3 (w=1), 1→4 (w=1); outw(1)=4, inw(3)=4.
    //   araw(3) = (1e6*3) div 4 + (1e6*1) div 1 = 1_750_000 (max)
    //   araw(4) = (1e6*1) div 4 = 250_000
    //   auth(4) = 250_000 * 1e6 div 1_750_000 = 142_857
    //   hraw(1) = (1e6*3) div 4 + (142_857*1) div 1 = 892_857 (max)
    //   hraw(2) = (1e6*1) div 4 = 250_000
    //   hub(2)  = 250_000 * 1e6 div 892_857 = 280_000
    val r = hits(Seq((1L, 3L, 3L), (2L, 3L, 1L), (1L, 4L, 1L)),
      Seq(1L, 2L, 3L, 4L), 1)
    assert(r(1L) == ((1000000L, 0L)))
    assert(r(2L) == ((280000L, 0L)))
    assert(r(3L) == ((0L, 1000000L)))
    assert(r(4L) == ((0L, 142857L)))
  }

  test("hits: zero iterations returns the init vector") {
    val r = hits(Seq((1L, 2L, 1L)), Seq(1L, 2L), 0)
    assert(r == Map(1L -> ((1000000L, 0L)), 2L -> ((1000000L, 0L))))
  }

  private def cores(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.coreness(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("coreness: triangle hanging off a path splits 2-core from 1-core") {
    // Path 1–2–3–4 into triangle 4–5–6: the triangle is the 2-core,
    // every path node peels at k=1. Hand-run of the h-index rounds:
    // degrees (1,2,2,3,2,2) → round 1 (1,1,2,2,2,2) → round 2
    // (1,1,1,2,2,2) → stable.
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 4L))
    assert(cores(es, 3) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 2L))
  }

  test("coreness: a star is all 1-core however high the hub degree") {
    val es = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(cores(es, 2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("coreness: self-loops and parallel/reverse duplicates are collapsed") {
    // (1,2) three ways plus a self-loop must count ONE distinct
    // neighbor each side: both nodes are degree-1, coreness 1.
    val es = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L))
    assert(cores(es, 2) == Map(1L -> 1L, 2L -> 1L))
  }

  test("coreness: zero iterations returns distinct-neighbor degrees") {
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    assert(cores(es, 0) == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
  }

  test("labelPropagation separates two cliques joined by a bridge") {
    import spark.implicits._
    // K4 on {1,2,3,4} + K4 on {11,12,13,14} + bridge 4—11: each clique
    // floods to its min label; the bridge nodes see 3 in-clique votes
    // vs 1 cross-clique vote, so the communities stay separate
    def k4(base: Long) = for {
      a <- base to base + 3; b <- base to base + 3 if a < b
    } yield (a, b)
    val edges = (k4(1) ++ k4(11) :+ (4L, 11L)).toDF("id_a", "id_b")
    val labels = graft.etl.Graph.labelPropagation(edges, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).map(labels).toSet == Set(1L))
    assert((11L to 14L).map(labels).toSet == Set(11L))
  }

  test("labelPropagation tie-break adopts the smallest neighbor label") {
    import spark.implicits._
    // path 1—2—3: node 2's neighbors {1,3} tie at one vote each → 1
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val labels = graft.etl.Graph.labelPropagation(edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(2L) == 1L)
    assert(labels(1L) == 2L && labels(3L) == 2L) // their only neighbor
  }

  // --- incrementalCoreness ---------------------------------------------

  /** Incremental coreness over (base ∪ batch) seeded from the base's
    * converged scores, compared against a from-scratch recompute of
    * the union — the equality the registry row pins at corpus scale. */
  private def incrVsFull(base: Seq[(Long, Long)],
                         batch: Seq[(Long, Long)]): Unit = {
    val baseUnd = Graph.symmetrize(base.toDF("src", "dst"))
    val old = Graph.corenessOfUndirected(baseUnd, iterations = 8)
    val allUnd = Graph.symmetrize((base ++ batch).toDF("src", "dst"))
    // B from the actually-new undirected edges, as the registry row
    // sizes it from the artifact's change feed
    val b = (allUnd.count() - baseUnd.count()) / 2
    val incr = Graph.incrementalCoreness(allUnd, old, batchEdges = b)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Graph.coreness((base ++ batch).toDF("src", "dst"),
        iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr == full, s"incremental $incr != full recompute $full")
  }

  test("incrementalCoreness: batch completing a clique equals the " +
    "full recompute (path -> K4)") {
    incrVsFull(
      base = Seq((1L, 2L), (2L, 3L), (3L, 4L)),
      batch = Seq((1L, 3L), (1L, 4L), (2L, 4L)))
  }

  test("incrementalCoreness: a rise with ZERO new edges at the rising " +
    "node (star center lifted by a leaf clique) — the case that " +
    "falsifies any per-node incident-edge bound") {
    // star 0—{1..5}: all cores 1. Batch = K5 among the leaves; the
    // CENTER's core rises 1 -> 5 though no new edge touches it — only
    // the global +B seed covers this, which is why incrementalCoreness
    // uses min(deg, old + B) rather than old + incident-delta.
    incrVsFull(
      base = (1L to 5L).map(l => (0L, l)),
      batch = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b))
  }

  test("incrementalCoreness: growth far from a stable dense region " +
    "leaves the region's scores intact") {
    // K4 on {1..4} plus a remote path 10—11; batch extends the path
    // into a triangle {10,11,12}: K4 cores stay 3, triangle becomes 2
    incrVsFull(
      base = (for { a <- 1L to 4L; b <- 1L to 4L if a < b }
        yield (a, b)) ++ Seq((10L, 11L)),
      batch = Seq((11L, 12L), (12L, 10L)))
  }

  test("incrementalCoreness: empty batch converges in one confirming " +
    "round to the old scores") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val und = Graph.symmetrize(base.toDF("src", "dst"))
    val old = Graph.corenessOfUndirected(und, iterations = 8)
    val incr = Graph.incrementalCoreness(und, old, batchEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oldMap = old.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr == oldMap)
  }

  test("incrementalCoreness: batch introducing entirely NEW nodes " +
    "(old scores absent) equals the full recompute") {
    incrVsFull(
      base = Seq((1L, 2L), (2L, 3L)),
      batch = Seq((3L, 20L), (20L, 21L), (21L, 3L)))
  }

  test("incrementalCoreness throws rather than return an unconverged " +
    "upper bound when maxRounds is exhausted") {
    val und = Graph.symmetrize(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val old = Graph.corenessOfUndirected(und, iterations = 8)
    intercept[IllegalArgumentException] {
      Graph.incrementalCoreness(und, old, batchEdges = 0L, maxRounds = 0)
    }
  }

  // --- incrementalCoreness under DELETIONS / mixed batches -------------

  /** Incremental coreness over ((base ∪ inserts) \ deletes) seeded
    * from the base's converged scores, B = INSERTED undirected edges
    * only (deletions need no seed allowance — they never raise
    * coreness), compared against a from-scratch recompute — the
    * equality the graph_kcore_incremental_del registry row pins at
    * corpus scale. */
  private def incrVsFullMixed(base: Seq[(Long, Long)],
                              inserts: Seq[(Long, Long)],
                              deletes: Seq[(Long, Long)]): Unit = {
    val baseUnd = Graph.symmetrize(base.toDF("src", "dst"))
    val old = Graph.corenessOfUndirected(baseUnd, iterations = 8)
    val withIns = Graph.symmetrize((base ++ inserts).toDF("src", "dst"))
    val allUnd = withIns.join(Graph.symmetrize(deletes.toDF("src", "dst")),
      Seq("src", "dst"), "left_anti")
    val b = (withIns.count() - baseUnd.count()) / 2
    val incr = Graph.incrementalCoreness(allUnd, old, batchEdges = b,
        maxRounds = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Graph.corenessOfUndirected(allUnd, iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr == full, s"incremental $incr != full recompute $full")
  }

  test("incrementalCoreness: pure deletion with a full-ring cascade " +
    "(cycle -> path drops every core 2 -> 1, one frontier hop per " +
    "round)") {
    incrVsFullMixed(
      base = (1L to 5L).map(i => (i, i + 1)) :+ (6L, 1L),
      inserts = Nil,
      deletes = Seq((6L, 1L)))
  }

  test("incrementalCoreness: a FALL with zero deleted edges at the " +
    "falling node (star center dropped by deleting the leaf clique) " +
    "— the deletion mirror of the star-center rise") {
    // base = star 0—{1..5} + K5 among the leaves: center core 5.
    // Deleting the K5 (no deleted edge touches 0) drops the center
    // 5 -> 1: only re-descent covers this, not incident-edge deltas.
    incrVsFullMixed(
      base = (1L to 5L).map(l => (0L, l)) ++
        (for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)),
      inserts = Nil,
      deletes = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b))
  }

  test("incrementalCoreness: deleting a node's last edge removes it " +
    "from the result domain (matches the full recompute's node set)") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val baseUnd = Graph.symmetrize(base.toDF("src", "dst"))
    val old = Graph.corenessOfUndirected(baseUnd, iterations = 8)
    val allUnd = baseUnd.join(
      Graph.symmetrize(Seq((3L, 4L)).toDF("src", "dst")),
      Seq("src", "dst"), "left_anti")
    val incr = Graph.incrementalCoreness(allUnd, old, batchEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!incr.contains(4L), s"isolated node survived: $incr")
    assert(incr == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("incrementalCoreness: MIXED batch (insert a triangle while " +
    "deleting a clique edge) equals the full recompute") {
    incrVsFullMixed(
      base = (for { a <- 1L to 4L; b <- 1L to 4L if a < b }
        yield (a, b)) ++ Seq((10L, 11L)),
      inserts = Seq((11L, 12L), (12L, 10L)),
      deletes = Seq((1L, 2L)))
  }

  test("incrementalCoreness: deletion of a NON-EXISTENT edge is " +
    "absorbed (idempotent retraction — the at-least-once CDC twin)") {
    // "deleting" (7,8), absent from the graph, must change nothing
    incrVsFullMixed(
      base = Seq((1L, 2L), (2L, 3L), (3L, 1L)),
      inserts = Nil,
      deletes = Seq((7L, 8L)))
  }
}
