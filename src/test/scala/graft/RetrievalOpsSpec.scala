package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-11 retrieval operators on CONTROLLED
  * corpora (independent of the sf0.01 oracles): RRF must fuse two
  * known rankings into the exact closed-form 1/(60+r) sums — including
  * the commutative-addition tie two mirror-ranked items produce and
  * the null rank of a modality-missing item — and the D4 cluster
  * sample must partition the corpus, keep small cells whole, and
  * down-sample dense cells deterministically. */
class RetrievalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))
  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  private def stage(docs: Seq[(Long, String)],
                    embs: Seq[(Long, Seq[Float])]): String = {
    val dir = Files.createTempDirectory("graft_retrieval").toString
    val docRows = docs.map { case (id, text) =>
      Row(id, text, "en", "s0", text.length.toLong)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(docRows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val embRows = embs.map { case (id, v) =>
      Row(id, v, (id % 3).toInt)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(embRows, 2), embSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def run(name: String, dir: String) =
    Queries.all.find(_.name == name).get.run(spark, dir)

  test("retrieval_rrf fuses known dense+sparse rankings in closed form") {
    // query 0 sees four corpus items with FULLY KNOWN per-ranker
    // ranks: dense (cosine to [1,0,0,0]) = 10,11,12,13 (12/13 tie at
    // cos 0 breaks by id); sparse (token Jaccard to "a..h") =
    // 12,11,10,13. So 10 carries (1,3) and 12 the mirror (3,1) —
    // IEEE addition is commutative, their rrf sums are EXACTLY equal,
    // and the tie must break on neighbor_id.
    val dir = stage(
      docs = Seq(
        (0L, "a b c d e f g h"),
        (10L, "a x1 x2 x3"), //            ∩=1 ∪=11 → 1/11
        (11L, "a b y1 y2 y3 y4"), //       ∩=2 ∪=12 → 1/6
        (12L, "a b c d e f g z"), //       ∩=7 ∪=9  → 7/9
        (13L, "p q r s")), //              ∩=0      → 0
      embs = Seq(
        (0L, Seq(1f, 0f, 0f, 0f)),
        (10L, Seq(1f, 0.1f, 0f, 0f)), //   cos ≈ .995 → dense 1
        (11L, Seq(0.5f, 0.86f, 0f, 0f)), //cos ≈ .503 → dense 2
        (12L, Seq(0f, 1f, 0f, 0f)), //     cos 0, id tie → dense 3
        (13L, Seq(0f, 0f, 1f, 0f)))) //    cos 0        → dense 4
    val out = run("retrieval_rrf", dir).collect()
    assert(out.length == 4, "4 candidates, all fused")
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq ==
      Seq(10L, 12L, 11L, 13L))
    val byId = out.map(r => r.getAs[Long]("neighbor_id") -> r).toMap
    def rrf(rd: Int, rs: Int) = 1.0 / (60.0 + rd) + 1.0 / (60.0 + rs)
    assert(byId(10L).getAs[Double]("rrf_score") == rrf(1, 3))
    assert(byId(12L).getAs[Double]("rrf_score") == rrf(3, 1))
    assert(byId(11L).getAs[Double]("rrf_score") == rrf(2, 2))
    assert(byId(13L).getAs[Double]("rrf_score") == rrf(4, 4))
    assert(byId(10L).getAs[Long]("rank_dense") == 1L &&
      byId(10L).getAs[Long]("rank_sparse") == 3L)
    assert(byId(12L).getAs[Long]("rank_dense") == 3L &&
      byId(12L).getAs[Long]("rank_sparse") == 1L)
  }

  test("retrieval_rrf carries modality-missing items with a null rank") {
    // 20 exists only as a vector, 21 only as a document: each tops its
    // own ranker, contributes 0 from the other, and the exact 1/61 tie
    // breaks on id
    val dir = stage(
      docs = Seq((0L, "a b c d"), (21L, "a b c d")),
      embs = Seq((0L, Seq(1f, 0f, 0f, 0f)), (20L, Seq(2f, 0f, 0f, 0f))))
    val out = run("retrieval_rrf", dir).collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(20L, 21L))
    val byId = out.map(r => r.getAs[Long]("neighbor_id") -> r).toMap
    assert(byId(20L).isNullAt(byId(20L).fieldIndex("rank_sparse")))
    assert(byId(21L).isNullAt(byId(21L).fieldIndex("rank_dense")))
    assert(byId(20L).getAs[Double]("rrf_score") == 1.0 / 61.0)
    assert(byId(21L).getAs[Double]("rrf_score") == 1.0 / 61.0)
  }

  test("corpus_cluster_sample partitions, keeps small cells whole, downsamples dense ones") {
    // 800 seeded random vectors — every vector lands in exactly one of
    // the 16 cells (avg 50/cell), so some cell must exceed the cap
    val rnd = new scala.util.Random(7)
    val embs = (0L until 800L).map { i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2f - 1f))
    }
    val dir = stage(docs = Seq((0L, "x")), embs = embs)
    val out = run("corpus_cluster_sample", dir).collect()
    assert(out.map(_.getAs[Long]("n_in_cell")).sum == 800L,
      "single-assignment: cells partition the corpus")
    out.foreach { r =>
      val n = r.getAs[Long]("n_in_cell")
      val k = r.getAs[Long]("n_kept")
      assert(k <= n)
      if (n <= 20L) assert(k == n,
        s"cell ${r.getLong(0)}: n=$n <= cap must keep everything")
    }
    assert(out.exists(r => r.getAs[Long]("n_kept") <
      r.getAs[Long]("n_in_cell")), "dense cells must downsample")
    // the draw is a pure function of (id, cell occupancy) — re-run is
    // byte-identical
    val again = run("corpus_cluster_sample", dir).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
