package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the round-11 corpus-curation operators, on
  * CONTROLLED synthetic corpora (independent of the frozen sf0.01
  * oracles): the KS statistic must be exactly 0 for identical
  * length distributions, exactly 1 for disjoint supports, and always
  * in [0, 1]; DSIR importance weights must rank target-language text
  * above off-target text. */
class CorpusCurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Writes docs as documents.parquet under a fresh dir, returns it. */
  private def corpus(docs: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft_curation").toString
    val rows = docs.map { case (id, text, lang, src) =>
      Row(id, text, lang, src, text.length.toLong)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), docSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String, dir: String) =
    Queries.all.find(_.name == name).get.run(spark, dir)

  test("corpus_ks_drift is 0 when every source has the same length distribution") {
    // two sources, identical token-length multisets {2, 3, 4}
    val dir = corpus(Seq(
      (1L, "a b", "en", "sa"), (2L, "a b c", "en", "sa"),
      (3L, "a b c d", "en", "sa"),
      (4L, "x y", "de", "sb"), (5L, "x y z", "de", "sb"),
      (6L, "x y z w", "de", "sb")))
    val out = run("corpus_ks_drift", dir).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_src") == 3L)
      assert(r.getAs[Double]("ks_d") == 0.0,
        s"source ${r.getString(0)} expected D=0")
    }
  }

  test("corpus_ks_drift is 1 for disjoint length supports") {
    // sa docs: 2 tokens; sb docs: 6 tokens — sup |ECDF gap| = 1
    val dir = corpus(Seq(
      (1L, "a b", "en", "sa"), (2L, "c d", "en", "sa"),
      (3L, "p q r s t u", "de", "sb"), (4L, "v w x y z q", "de", "sb")))
    val out = run("corpus_ks_drift", dir).collect()
    assert(out.length == 2)
    out.foreach(r => assert(r.getAs[Double]("ks_d") == 1.0))
  }

  test("corpus_ks_drift stays in [0, 1] on a mixed corpus") {
    val dir = corpus(Seq(
      (1L, "a", "en", "sa"), (2L, "a b", "en", "sa"),
      (3L, "a b c", "en", "sb"), (4L, "a b", "de", "sb"),
      (5L, "a b c d e", "de", "sc"), (6L, "a", "de", "sc")))
    run("corpus_ks_drift", dir).collect().foreach { r =>
      val d = r.getAs[Double]("ks_d")
      assert(d >= 0.0 && d <= 1.0)
    }
  }

  test("corpus_dsir_select ranks target-language text first") {
    // target (en) text is all "alpha"; off-target is all "beta" —
    // alpha buckets carry positive log-ratio, beta negative
    val dir = corpus(Seq(
      (1L, "alpha alpha alpha alpha", "en", "sa"),
      (2L, "beta beta beta beta", "de", "sb"),
      (3L, "alpha alpha beta beta", "de", "sc")))
    val out = run("corpus_dsir_select", dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 2L),
      "pure-target doc first, mixed second, off-target last")
    // note absolute sign is NOT asserted: with a 12-token corpus the
    // add-1 mass (256 buckets) dominates both LMs, so even on-target
    // tokens score slightly negative — only the ORDER is scale-free
    val ws = out.map(_.getAs[Double]("w"))
    assert(ws(0) > ws(1) && ws(1) > ws(2))
  }

  test("corpus_dsir_select keeps at most 50 docs") {
    val docs = (1L to 60L).map(i =>
      (i, "tok tok tok", if (i % 2 == 0) "en" else "de", s"s${i % 3}"))
    val dir = corpus(docs)
    assert(run("corpus_dsir_select", dir).count() == 50L)
  }
}
