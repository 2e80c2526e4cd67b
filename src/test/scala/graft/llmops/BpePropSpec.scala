package graft.llmops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property check for BPE encoding: for GENERATED tokens (multi-byte
  * unicode, astral-plane emoji, repeated runs, singletons) under
  * merges trained on a generated corpus, encoding must be LOSSLESS —
  * concatenating the output symbols reproduces the token exactly.
  * Batched: all generated tokens ride one DataFrame, so the property
  * costs one train + one scan. */
class BpePropSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("encode roundtrip is lossless on generated unicode tokens") {
    val wordGen = Gen.listOfN(60,
      Gen.listOfN(6, Gen.oneOf("a", "b", "c", "ab", "é", "日", "ß"))
        .map(_.mkString))
    val corpus = wordGen.pureApply(Gen.Parameters.default, Seed(11L))
      .mkString(" ")
    val (merges, _) = Bpe.train(Seq(corpus).toDF("text"), "text", 6)
    assert(merges.nonEmpty)

    val tokGen = Gen.listOfN(200, Gen.oneOf(
      Gen.listOfN(8, Gen.oneOf("a", "b", "c", "é", "日", "🦙", "x"))
        .map(_.mkString),
      Gen.const("aaaaaa"), // self-pair runs
      Gen.alphaNumStr.suchThat(_.nonEmpty)))
    val toks = tokGen.pureApply(Gen.Parameters.default, Seed(13L))
      .distinct
    val bad = toks.toDF("tok")
      .select(col("tok"),
        concat_ws("", Bpe.encodeColumn(Bpe.charSplit(col("tok")), merges))
          .as("round"))
      .filter(col("round") =!= col("tok"))
      .collect()
    assert(bad.isEmpty,
      s"lossy encode for: ${bad.take(5).mkString(", ")}")
  }
}
