package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog " +
    "while the cat sleeps on the warm mat near the door"
  // near-dup: one word changed; unrelated: disjoint vocabulary
  private lazy val docs = Seq(
    (1L, base),
    (2L, base.replace("warm", "cold")),
    (3L, "completely different content about spark catalyst optimizer " +
      "rules and physical execution strategies for distributed joins"),
    (4L, base), // exact duplicate of 1
    (5L, ""), (6L, null.asInstanceOf[String])
  ).toDF("doc_id", "text")

  test("exactDedup groups identical normalized text, keeps min id") {
    val out = Dedup.exactDedup(docs, "text", "doc_id")
    val dups = out.filter(col("n_copies") > 1).collect()
    assert(dups.length == 1)
    assert(dups.head.getAs[Long]("keep_id") == 1L)
    assert(dups.head.getAs[Long]("n_copies") == 2L)
  }

  test("shingles: k-grams, deduplicated, short-text degenerates to " +
    "whole text") {
    val sh = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[String](r.fieldIndex("sh"))).toMap
    assert(sh(1L).contains("the quick brown"))
    assert(sh(5L).toSeq == Seq("")) // degenerate
  }

  test("minhash signatures of near-identical docs share most components") {
    val sigs = docs.filter(col("doc_id") <= 3)
      .select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 64)
          .as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Long](r.fieldIndex("sig"))).toMap
    def agree(a: scala.collection.Seq[Long], b: scala.collection.Seq[Long]) = a.zip(b).count(p => p._1 == p._2)
    assert(agree(sigs(1L), sigs(2L)) > 32) // high jaccard → many equal mins
    assert(agree(sigs(1L), sigs(3L)) < 8)  // unrelated → few
  }

  test("minhashDedup finds the near-dup pair and the exact pair, " +
    "not the unrelated doc") {
    val pairs = Dedup.minhashDedup(docs, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccardVerify computes exact set jaccard") {
    val cand = Seq((1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.jaccardVerify(docs, cand, "text", "doc_id",
      threshold = 0.0).collect()
    assert(out.head.getAs[Double]("jaccard") == 1.0)
  }

  test("simhash: identical text → distance 0; near-dup close; " +
    "unrelated far") {
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("s"))
      .toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(4L)) == 0)
    assert(ham(sh(1L), sh(2L)) < 16)
    assert(ham(sh(1L), sh(3L)) > 10)
  }

  test("dedupClusters: chains collapse to min-id components") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("keep_id"), r.getAs[Boolean]("is_kept"))).toMap
    assert(out(1L) == (1L, true))
    assert(out(2L) == (1L, false))
    assert(out(3L) == (1L, false)) // reached via the 2-3 chain
    assert(out(10L) == (10L, true))
    assert(out(11L) == (10L, false))
  }

  test("connectedComponents equals a reference union-find on random " +
    "graphs (chains, stars, cliques, forests)") {
    // pins the round-10 rewrite (1-hop-min init, lazy-checkpoint
    // rounds, comp-sum convergence) to exact CC semantics: every
    // node labeled with its true component minimum, no component
    // merged or split, across 15 seeded random graphs including long
    // chains (worst case for min-label propagation's round count)
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 15) {
      val n = 5 + rnd.nextInt(36)
      val ids = (0 until n).map(_ => rnd.nextInt(1000).toLong).distinct
      val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      // random edges + one deliberate chain so diameters get long
      ids.sliding(2).foreach {
        case Seq(a, b) if trial % 3 == 0 => edges += ((a, b))
        case _ => ()
      }
      (0 until n).foreach { _ =>
        val a = ids(rnd.nextInt(ids.size)); val b = ids(rnd.nextInt(ids.size))
        if (a != b) edges += ((math.min(a, b), math.max(a, b)))
      }
      if (edges.nonEmpty) {
        // driver-side union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(id => id -> {
            val root = find(id)
            // component min = min over members sharing the root
            edges.flatMap(e => Seq(e._1, e._2)).distinct
              .filter(find(_) == root).min
          }).toMap
        val got = Dedup.connectedComponents(
            edges.toSeq.toDF("id_a", "id_b"), iterations = 50)
          .collect()
          .map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
        assert(got == expected, s"trial $trial: $edges")
      }
    }
  }

  test("connectedComponents is invariant under duplicated and " +
    "reversed-duplicate input pairs (multigraph guard)") {
    // pins the round-10 input distinct: labels must not depend on
    // pair multiplicity or orientation, so a multigraph caller gets
    // the same answer as a deduped one (and the per-round join never
    // fans out per duplicate)
    val clean = Seq((1L, 2L), (2L, 3L), (7L, 8L), (10L, 11L))
    val multi = clean ++ clean ++ clean.map(_.swap) ++ Seq((2L, 1L))
    def labels(ps: Seq[(Long, Long)]): Map[Long, Long] =
      Dedup.connectedComponents(ps.toDF("id_a", "id_b"), iterations = 50)
        .collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert(labels(multi) == labels(clean))
    assert(labels(clean) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L,
        10L -> 10L, 11L -> 10L))
  }

  test("simhashPairs returns near pairs under the hamming cap") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
      .toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("simhashPairs is COMPLETE at every radius: equals brute force") {
    // 40 short docs with overlapping vocab → a spread of distances
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val corpus = (0 until 40).map { i =>
      (i.toLong, (0 until 6).map(j => words((i + j * (i % 3 + 1)) % 10))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val hashes = corpus
      .select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (radius <- Seq(0, 3, 7, 16)) {
      val expected = (for {
        a <- hashes.keys; b <- hashes.keys if a < b
        if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= radius
      } yield (a, b)).toSet
      val got = Dedup.simhashPairs(corpus, "text", "doc_id", radius)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"radius=$radius: pigeonhole candidates missed true pairs")
    }
  }

  test("simhashPairs rejects radii the 64-bit split cannot cover") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 64)
    }
  }

  test("incrementalDedupBloom matches the plain anti-join exactly: " +
    "dups dropped, new kept, min-id within batch") {
    import org.apache.spark.sql.functions._
    val fp = TextAnalysis.fingerprintMd5(col("text"))
    // corpus = docs 1-3; batch = 4 (dup of 1), 5/6 (empty and null
    // text), plus a genuinely new doc 7 and its batch-dup 8
    val batch = docs.filter(col("doc_id") >= 4)
      .unionByName(Seq((7L, "fresh never-seen content"),
        (8L, "fresh never-seen content")).toDF("doc_id", "text"))
    val corpus = docs.filter(col("doc_id") <= 3)
      .select(fp.as("fingerprint")).distinct()
    val out = Dedup.incrementalDedupBloom(corpus, "fingerprint",
      batch, "doc_id", fp, "fingerprint", expectedItems = 10L)
      .collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    // 4 is a corpus dup; 5 (md5 of empty) and 6 (null text → null
    // fingerprint, which neither the bloom nor an anti-join can match)
    // are unseen; 7 survives as min-id of the 7/8 batch pair
    assert(out == Seq(5L, 6L, 7L))
  }
  test("incrementalNearDup flags only batch-vs-CORPUS pairs: a batch-" +
    "internal near-dup pair is admitted, disjoint content never flagged") {
    import org.apache.spark.sql.functions._
    // corpus = 1..3; batch: 10 near-dups corpus 1, 11/12 are near-dups
    // of EACH OTHER but of nothing in the corpus, 13 is disjoint
    val corpus = docs.filter(col("doc_id") <= 3)
    val other = "entirely novel passage describing streaming watermark " +
      "semantics and state store eviction policies in exhaustive detail"
    val batch = Seq(
      (10L, base.replace("dog", "hound")),
      (11L, other),
      (12L, other.replace("exhaustive", "meticulous")),
      (13L, "unrelated tiny text")).toDF("doc_id", "text")
    val pairs = Dedup.incrementalNearDup(corpus, batch, "text",
      "doc_id", threshold = 0.5)
    val flagged = pairs.select("batch_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(10L),
      s"expected only the corpus near-dup flagged, got $flagged")
    // every emitted pair references a real corpus doc
    val corpusIds = pairs.select("corpus_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(corpusIds.subsetOf(Set(1L, 2L, 3L)))
  }

  test("incrementalNearDup with an empty batch returns no pairs") {
    import org.apache.spark.sql.functions._
    val corpus = docs.filter(col("doc_id") <= 3)
    val empty = docs.filter(col("doc_id") < 0)
    assert(Dedup.incrementalNearDup(corpus, empty, "text", "doc_id")
      .count() == 0L)
  }

  // --- bandsFor: the scale-parameterized band geometry ----------------

  test("bandsFor pins its deployment fixed points: reproduces the " +
    "hand-frozen 16x4 at sf0.1's corpus, derives 8x3 at sf0.01's") {
    // these exact values are what dedup_minhash_lsh_scaled's oracle
    // pins at sf0.01 and what the frozen dedup_minhash_lsh geometry
    // has always been — the rule DERIVES the historical hand choice
    assert(Dedup.bandsFor(500L, 0.5) == (8, 3))
    assert(Dedup.bandsFor(5000L, 0.5) == (16, 4))
    // the fourth-decade tier hits the band cap: r keeps climbing, b
    // saturates at maxBands and the midpoint drifts above target (the
    // documented recall-for-tractability trade)
    assert(Dedup.bandsFor(5000000L, 0.5) == (64, 7))
  }

  test("bandsFor scale law: rowsPerBand is nondecreasing in n, and " +
    "expected background collisions stay within budget") {
    val ns = Seq(100L, 1000L, 10000L, 100000L, 1000000L, 10000000L)
    val geos = ns.map(n => Dedup.bandsFor(n, 0.5))
    val rs = geos.map(_._2)
    assert(rs == rs.sorted, s"rowsPerBand not monotone: $geos")
    // the rule's own contract: n·b·s0^r / 2 <= budget (1 candidate
    // per doc) at every tier — the bound that keeps verification O(n)
    ns.zip(geos).foreach { case (n, (b, r)) =>
      val fpPerDoc = n.toDouble * b * math.pow(0.05, r) / 2.0
      assert(fpPerDoc <= 1.0 + 1e-9,
        s"n=$n geometry ($b,$r) expects $fpPerDoc false cands/doc")
    }
  }

  test("bandsFor recall contract: below the band cap the S-curve " +
    "midpoint (1/b)^(1/r) never exceeds the target threshold") {
    for (n <- Seq(100L, 5000L, 50000L); t <- Seq(0.4, 0.5, 0.7, 0.9)) {
      val (b, r) = Dedup.bandsFor(n, t)
      if (b < 64) {
        val midpoint = math.pow(1.0 / b, 1.0 / r)
        // b = ceil(t^-r) guarantees b >= t^-r, hence midpoint <= t —
        // pairs AT the target threshold collide with prob >= 50%
        assert(midpoint <= t + 1e-12,
          s"n=$n t=$t ($b,$r) midpoint $midpoint")
      }
    }
  }

  test("bandsFor rejects out-of-range thresholds and backgrounds") {
    intercept[IllegalArgumentException](Dedup.bandsFor(100L, 0.0))
    intercept[IllegalArgumentException](Dedup.bandsFor(100L, 1.0))
    intercept[IllegalArgumentException](
      Dedup.bandsFor(100L, 0.5, s0 = 0.6))
  }

  test("minhashDedup at the bandsFor(n=500) geometry recalls exactly " +
    "the frozen default geometry's pair set on a doc corpus") {
    import org.apache.spark.sql.functions._
    // 6 docs: 2 near-dup pairs + 2 singletons; both geometries must
    // find the same verified pairs (the sf0.01 registry row pins the
    // full-corpus equality; this is the unit-sized witness)
    val d = Seq(
      (1L, base), (2L, base.replace("dog", "hound")),
      (3L, "completely different short text"),
      (4L, base.replace("quick", "swift").replace("dog", "hound")),
      (5L, "another unrelated fragment of prose"),
      (6L, base + " with a small appended tail")
    ).toDF("doc_id", "text")
    def pairs(numPerm: Int, bands: Int) =
      Dedup.minhashDedup(d, "text", "doc_id", threshold = 0.5,
        numPerm = numPerm, bands = bands)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (b, r) = Dedup.bandsFor(500L, 0.5)
    assert(pairs(b * r, b) == pairs(64, 16))
  }
}
