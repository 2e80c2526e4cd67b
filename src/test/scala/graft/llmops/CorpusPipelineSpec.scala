package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curate: gates junk, dedups to min id, scrubs PII, splits all") {
    val good = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, good),
      (2L, good),                       // exact dup of 1 → dropped
      (3L, "Reach me at bob@example.com for the offer details and more"),
      (4L, "xx"),                       // too few tokens → gated out
      (5L, null.asInstanceOf[String]))  // null text → gated out
      .toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[String]("split"))).toMap
    assert(out.keySet == Set(1L, 3L)) // 2 deduped, 4/5 gated
    assert(out(3L)._1.contains("<EMAIL>") &&
      !out(3L)._1.contains("bob@example.com"))
    assert(Set("train", "test").contains(out(1L)._2))
  }

  test("curate: NFD and NFC spellings of one doc dedup together") {
    val nfd = "the Café on the corner is a nice spot to sit and read"
    val nfc = "the Café on the corner is a nice spot to sit and read"
    val out = CorpusPipeline.curate(
      Seq((10L, nfd), (11L, nfc)).toDF("doc_id", "text")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("doc_id") == 10L) // min id survives
  }
}
