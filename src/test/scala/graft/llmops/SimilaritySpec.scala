package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)), // close to 0
    (2L, Array(0f, 1f, 0f, 0f)),     // orthogonal to 0
    (3L, Array(-1f, 0f, 0f, 0f)),    // opposite of 0
    (4L, Array(0.5f, 0.5f, 0.5f, 0.5f))
  ).toDF("vec_id", "embedding")

  test("cosine expression matches hand-computed values") {
    val c = vecs.filter(col("vec_id") === 0L).as("a")
      .crossJoin(vecs.filter(col("vec_id") === 2L).as("b"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding"))
        .as("c")).collect().head.getDouble(0)
    assert(math.abs(c) < 1e-12) // orthogonal
    val self = vecs.select(Similarity.cosine(col("embedding"),
      col("embedding")).as("c")).collect().map(_.getDouble(0))
    assert(self.forall(v => math.abs(v - 1.0) < 1e-12))
  }

  test("bruteForceTopK ranks by cosine, excludes self, deterministic") {
    val top = Similarity.bruteForceTopK(vecs,
      vecs.filter(col("vec_id") === 0L), "vec_id", "embedding", k = 4)
      .collect()
    assert(top.map(_.getAs[Long]("neighbor_id")).toSeq ==
      Seq(1L, 4L, 2L, 3L)) // by descending cosine: .994, .5, 0, -1
    assert(top.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4))
  }

  test("lshTopK returns a subset ranked identically to brute force " +
    "on its candidates") {
    val out = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", dim = 4, k = 3)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("neighbor_id") != 0L))
    // ranks are contiguous from 1
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq ==
      (1 to rows.length).toSeq)
  }

  test("ivfTopK probes cells and never returns self") {
    val out = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 3, numCells = 2, nProbe = 2).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("neighbor_id") != 0L))
  }

  test("trainCodebook retains an empty cell's centroid, typed through " +
    "Float and Double element types") {
    // init centroids = the 3 lowest-id vectors; vec 3 duplicates vec 1,
    // so every point's nearest-centroid tie breaks to cell 1 (lowest
    // cell_id at equal cosine) and cell 3 is EMPTY in every iteration.
    // Iteration 1's retention path reads the corpus's Float elements,
    // iteration 2's reads the Doubles the loop itself wrote — both
    // legs of the typed extraction that replaced toString.toDouble.
    val corpus = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f)),
      (3L, Array(1f, 0f)), // duplicate of 1 → its cell never wins a tie
      (4L, Array(0.9f, 0.1f)),
      (5L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.trainCodebook(corpus, "vec_id", "embedding",
      numCells = 3, iterations = 2)
    val m = cents.collect().map(r =>
      r.getAs[Long]("cell_id") -> r.getSeq[Double](1).toList).toMap
    assert(m.keySet == Set(1L, 2L, 3L),
      "an empty cell was dropped from the codebook")
    assert(m(3L) == List(1.0, 0.0),
      s"empty cell 3 must keep its init centroid, got ${m(3L)}")
    // the non-empty cells moved (means of their members) — retention
    // is not the whole codebook standing still
    assert(m(1L) != List(1.0, 0.0))
  }

  test("int8Quantize: levels within [-127,127], tight round-trip, " +
    "zero vector unindexable") {
    val d = Seq((0L, Array(0.3f, -1.2f, 0.007f, 0.9f)),
      (1L, Array(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
      .withColumn("qs", Similarity.int8Quantize(col("embedding")))
      .withColumn("deq", Similarity.int8Dequantize(col("qs")))
    val r0 = d.filter(col("vec_id") === 0)
      .select(col("qs.scale"), col("qs.q"), col("deq")).collect().head
    assert(r0.getDouble(0) === 1.2f.toDouble / 127.0)
    val levels = r0.getSeq[Long](1) // Spark floor(double) → long
    assert(levels.forall(l => l >= -127 && l <= 127))
    val deq = r0.getSeq[Double](2)
    val orig = Seq(0.3, -1.2, 0.007, 0.9)
    orig.zip(deq).foreach { case (o, q) =>
      assert(math.abs(o - q) <= r0.getDouble(0) + 1e-6) } // one level
    // zero vector: no scale → null levels (cosine undefined anyway)
    val r1 = d.filter(col("vec_id") === 1).select(col("qs.q")).collect()
    assert(r1.head.isNullAt(0))
  }

  test("int8Quantize clamps the max-magnitude negative level to -127") {
    // for this component, |x|/scale rounds a hair past 127 in float64,
    // so a bare floor yields -128 — the clamp must hold the line
    val d = Seq((0L, Array(-1.0000015f, 0.5f)))
      .toDF("vec_id", "embedding")
      .withColumn("qs", Similarity.int8Quantize(col("embedding")))
      .select(col("qs.q")).collect().head.getSeq[Long](0)
    assert(d.head == -127L, s"expected -127, got ${d.head}")
    assert(d.forall(l => l >= -127 && l <= 127))
  }

  test("embeddingNearDupPairs honors the threshold") {
    val pairs = Similarity.embeddingNearDupPairs(vecs, "vec_id",
      "embedding", threshold = 0.9).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((0L, 1L))) // only the .994 pair
  }

  test("lshNearDupPairs: a subset of brute force, no false positives, " +
    "ordered ids") {
    val brute = Similarity.embeddingNearDupPairs(vecs, "vec_id",
      "embedding", threshold = 0.4).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val lsh = Similarity.lshNearDupPairs(vecs, "vec_id", "embedding",
      threshold = 0.4, numPlanes = 2, numTables = 8).collect()
    val lshPairs = lsh
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(lshPairs.subsetOf(brute),
      s"false positives: ${lshPairs.diff(brute)}")
    assert(lsh.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
    assert(lsh.forall(_.getAs[Double]("cos_sim") >= 0.4))
    // 8 tables of 2 planes on near-identical vectors: the .994 pair
    // shares a bucket with overwhelming probability under the fixed
    // seeded hyperplanes — deterministic here, so assert it was found
    assert(lshPairs.contains((0L, 1L)))
  }

  test("lshNearDupPairs: bucket-loop path is BIT-identical to the " +
    "join shape (pairs and cosines), int ids keep their type") {
    // a denser deterministic corpus than `vecs` so buckets hold real
    // populations and several pairs clear the threshold
    val dense = spark.range(400).selectExpr("id as vec_id",
      "transform(sequence(0, 7), d -> " +
        "cast((id % 7) * 0.13 + d * 0.05 + (id * 37 % 11) * 0.02 " +
        "as float)) as embedding")
    val loop = Similarity.lshNearDupPairs(dense, "vec_id", "embedding",
      threshold = 0.9, numPlanes = 4, numTables = 6).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos_sim"))).toSet
    val join = Similarity.lshNearDupPairsJoin(dense, "vec_id",
      "embedding", threshold = 0.9, numPlanes = 4, numTables = 6)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos_sim"))).toSet
    assert(loop.nonEmpty, "fixture found no pairs — weaken it")
    assert(loop == join) // exact doubles: same accumulation order
    // integer ids dispatch through the loop path and cast back
    val intIds = dense.selectExpr("cast(vec_id as int) as vec_id",
      "embedding")
    val outInt = Similarity.lshNearDupPairs(intIds, "vec_id",
      "embedding", threshold = 0.9, numPlanes = 4, numTables = 6)
    assert(outInt.schema("id_a").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(outInt.collect().map(r => (r.getAs[Int]("id_a").toLong,
      r.getAs[Int]("id_b").toLong, r.getAs[Double]("cos_sim"))).toSet
      == loop)
  }

  test("lshNearDupPairs: MEGA-BUCKET TILING is bit-identical to the " +
    "untiled loop and the join shape (every unordered pair in " +
    "exactly one tile)") {
    // same dense fixture as the parity test above: at numPlanes = 4
    // its buckets hold up to ~hundreds of rows, so a cap of 7 forces
    // K >= 2 tiling on every real bucket while a cap of 10^6 keeps
    // everything on the untiled pass — both must agree with the join
    val dense = spark.range(400).selectExpr("id as vec_id",
      "transform(sequence(0, 7), d -> " +
        "cast((id % 7) * 0.13 + d * 0.05 + (id * 37 % 11) * 0.02 " +
        "as float)) as embedding")
    def run(cap: Int) = Similarity.lshNearDupPairsBucketLoop(dense,
      "vec_id", "embedding", threshold = 0.9, numPlanes = 4,
      numTables = 6, castIdsBackTo = None, megaBucketCap = cap)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos_sim"))).toSet
    val untiled = run(1000000)
    val tiled = run(7)
    val tiledTiny = run(2) // K large: off-diagonal tiles dominate
    val join = Similarity.lshNearDupPairsJoin(dense, "vec_id",
      "embedding", threshold = 0.9, numPlanes = 4, numTables = 6)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("cos_sim"))).toSet
    assert(untiled.nonEmpty, "fixture found no pairs — weaken it")
    assert(tiled == untiled)
    assert(tiledTiny == untiled)
    assert(untiled == join)
  }

  test("lshNearDupPairs: null ids are dropped (not a crash), NaN and " +
    "zero-norm vectors never emit — both execution paths agree") {
    // ids 0 and 1 are near-identical (the emitted pair); id 2 carries
    // a NaN element (cosine NaN against everything); id 3 is all-zero
    // (cosine undefined); one row has a null id but a valid vector
    // identical to id 0's (would pair with 0/1 if not dropped)
    val dirty = spark.sql(
      """SELECT * FROM VALUES
        (0L, array(cast(1.0 as float), cast(2.0 as float), cast(3.0 as float), cast(4.0 as float))),
        (1L, array(cast(1.0 as float), cast(2.0 as float), cast(3.0 as float), cast(4.05 as float))),
        (2L, array(cast('NaN' as float), cast(2.0 as float), cast(3.0 as float), cast(4.0 as float))),
        (3L, array(cast(0.0 as float), cast(0.0 as float), cast(0.0 as float), cast(0.0 as float))),
        (CAST(NULL AS BIGINT), array(cast(1.0 as float), cast(2.0 as float), cast(3.0 as float), cast(4.0 as float)))
        AS t(vec_id, embedding)""")
    def pairsOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // threshold -1 would admit ANY defined cosine: only NaN/zero-norm
    // exclusion keeps ids 2 and 3 out of the answer
    val loop = pairsOf(Similarity.lshNearDupPairs(dirty, "vec_id",
      "embedding", threshold = -1.0, numPlanes = 1, numTables = 2))
    val join = pairsOf(Similarity.lshNearDupPairsJoin(dirty, "vec_id",
      "embedding", threshold = -1.0, numPlanes = 1, numTables = 2))
    assert(loop == join)
    assert(loop.contains((0L, 1L)))
    assert(!loop.exists(p => p._1 == 2L || p._2 == 2L),
      s"NaN-element vector emitted: $loop")
    assert(!loop.exists(p => p._1 == 3L || p._2 == 3L),
      s"zero-norm vector emitted: $loop")
  }

  test("semanticDedup: greedy min-id survivor within cells, full " +
    "partition of the corpus") {
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding",
      threshold = 0.9, numCells = 1).collect()
    // every input id appears exactly once
    assert(out.map(_.getAs[Long]("id")).sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L))
    val dropped = out.filter(!_.isNullAt(out.head.fieldIndex("dup_of")))
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("dup_of")).toMap
    // one cell: only the .994 pair clears 0.9 → id 1 dominated by 0
    assert(dropped == Map(1L -> 0L))
    // survivors are pairwise below the threshold (completeness of the
    // dominance scan): recheck by brute force
    val survivors = out.filter(_.isNullAt(out.head.fieldIndex("dup_of")))
      .map(_.getAs[Long]("id")).toSet
    val over = Similarity.embeddingNearDupPairs(
      vecs.filter(col("vec_id").isin(survivors.toSeq: _*)),
      "vec_id", "embedding", threshold = 0.9).count()
    assert(over == 0L)
  }
  test("trainPqCodebooks: m x k codebook, subvector dims, codes in " +
    "range, full coverage") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .dropDuplicates("vec_id")
    val m = 4; val k = 8
    val cents = Similarity.trainPqCodebooks(e, "vec_id", "embedding",
      m, k, iterations = 1)
    assert(cents.count() == m.toLong * k)
    val dims = cents.select(size(col("centroid"))).distinct()
      .collect().map(_.getInt(0)).toSeq
    assert(dims == Seq(16), s"subvector dim drifted: $dims") // 64 / 4
    val ranges = cents.agg(min(col("s")), max(col("s")),
      min(col("code_id")), max(col("code_id"))).head()
    assert((ranges.getInt(0), ranges.getInt(1)) == (0, m - 1))
    assert((ranges.getInt(2), ranges.getInt(3)) == (0, k - 1))
  }

  test("ivfPqTopK: k rows per query, self excluded, descending exact " +
    "scores, and candidates restricted to probed cells") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .dropDuplicates("vec_id")
    val qs = e.filter(col("vec_id") < 3)
    val out = Similarity.ivfPqTopK(e, qs, "vec_id", "embedding",
      k = 4, numCells = 4, nProbe = 2, rerankFactor = 10).collect()
    assert(out.length == 12) // 3 queries x k=4
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4))
      val scores = byRank.map(_.getAs[Double]("cos_sim")).toSeq
      assert(scores == scores.sorted.reverse, s"q=$q not descending")
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q))
    }
    // every returned neighbor must live in one of its query's nProbe
    // probed cells — the probe really restricts the candidate space
    val cents = Similarity.trainCodebook(e, "vec_id", "embedding", 4, 1)
    def cellsOf(df: org.apache.spark.sql.DataFrame, n: Int) = {
      val scored = df.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(cents))
        .withColumn("cdist",
          Similarity.cosine(col("embedding"), col("centroid")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id"))
        .orderBy(col("cdist").desc, col("cell_id"))
      scored.withColumn("r", row_number().over(w)).filter(col("r") <= n)
        .select("vec_id", "cell_id").collect()
        .groupBy(_.getAs[Long]("vec_id"))
        .map { case (k2, v) => k2 -> v.map(_.getAs[Long]("cell_id")).toSet }
    }
    val qCells = cellsOf(qs, 2)
    val cCells = cellsOf(e, 1)
    out.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val nb = r.getAs[Long]("neighbor_id")
      assert(qCells(q).intersect(cCells(nb)).nonEmpty,
        s"neighbor $nb of query $q came from an unprobed cell")
    }
  }

  test("versioned PQ index: rebuild-then-swap never perturbs a pinned " +
    "reader; vacuum retires it loudly") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .dropDuplicates("vec_id")
    val qs = e.filter(col("vec_id") < 3)
    val tbl = java.nio.file.Files.createTempDirectory("graft_pqv")
      .toString + "/idx"
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim")))
        .sortBy(x => (x._1, x._2)).toSeq
    val v1 = Similarity.commitPqIndex(e, "vec_id", "embedding", tbl)
    assert(v1 == 1L)
    // serve-from-commit is byte-identical to the inline path
    val inline = canon(Similarity.pqTopK(e, qs, "vec_id", "embedding",
      k = 4).collect())
    assert(canon(Similarity.pqTopKFromManifest(tbl, e, qs, "vec_id",
      "embedding", k = 4, version = Some(v1)).collect()) == inline)
    // a rebuild over a different corpus cut lands as v2 while the v1
    // pin is live — the pinned reader must not move
    val cut = e.filter(col("vec_id") >= 100)
    val v2 = Similarity.commitPqIndex(cut, "vec_id", "embedding", tbl)
    assert(v2 == v1 + 1)
    assert(canon(Similarity.pqTopKFromManifest(tbl, e, qs, "vec_id",
      "embedding", k = 4, version = Some(v1)).collect()) == inline)
    // the LATEST pin serves the new index: neighbors only from the cut
    val latest = Similarity.pqTopKFromManifest(tbl, cut, qs, "vec_id",
      "embedding", k = 4).collect()
    assert(latest.length == 12)
    assert(latest.forall(_.getAs[Long]("neighbor_id") >= 100))
    // vacuum retiring v1 under a still-held pin fails the reader with
    // a loud missing-file error (never silently serves mixed files);
    // the survivor version keeps serving
    graft.sources.ManifestTable.vacuum(spark, tbl, keepVersions = 1,
      minFileAgeMs = 0L)
    intercept[Exception] {
      Similarity.pqTopKFromManifest(tbl, e, qs, "vec_id", "embedding",
        k = 4, version = Some(v1)).collect()
    }
    assert(canon(Similarity.pqTopKFromManifest(tbl, cut, qs, "vec_id",
      "embedding", k = 4).collect()) == canon(latest))
  }

  test("versioned PQ index preserves non-numeric id types (string " +
    "doc ids serve identically to the inline path)") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .dropDuplicates("vec_id")
      .select(concat(lit("doc_"), lpad(col("vec_id").cast("string"),
        4, "0")).as("vec_id"), col("embedding"))
    val qs = e.filter(col("vec_id") < "doc_0003")
    val tbl = java.nio.file.Files.createTempDirectory("graft_pqs")
      .toString + "/idx"
    val v = Similarity.commitPqIndex(e, "vec_id", "embedding", tbl)
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[String]("query_id"), r.getAs[Int]("rank"),
        r.getAs[String]("neighbor_id"), r.getAs[Double]("cos_sim")))
        .sortBy(x => (x._1, x._2)).toSeq
    val served = canon(Similarity.pqTopKFromManifest(tbl, e, qs,
      "vec_id", "embedding", k = 3, version = Some(v)).collect())
    // a silent long-cast would null every vid and return ZERO rows
    assert(served.length == qs.count() * 3)
    assert(served.forall(_._3.startsWith("doc_")))
    assert(served == canon(Similarity.pqTopK(e, qs, "vec_id",
      "embedding", k = 3).collect()))
  }

  test("pqTopK: k rows per query, self excluded, exact re-ranked " +
    "scores descend per query") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .dropDuplicates("vec_id")
    val out = Similarity.pqTopK(e, e.filter(col("vec_id") < 3),
      "vec_id", "embedding", k = 4).collect()
    assert(out.length == 12) // 3 queries x k=4
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4))
      val scores = byRank.map(_.getAs[Double]("cos_sim")).toSeq
      assert(scores == scores.sorted.reverse, s"q=$q not descending")
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q))
    }
  }
}
