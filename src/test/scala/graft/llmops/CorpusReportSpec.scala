package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The corpus data card: exact counts on a hand-checkable corpus, the
  * dup-rate definition (extra copies / docs), null-safety, and a real
  * file write. */
class CorpusReportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("data card values on a hand-checkable corpus") {
    val docs = Seq(
      ("one two three", "web", "en"),   // 3 tokens, 13 chars
      ("one two three", "web", "en"),   // exact dup of the first
      ("quatre cinq", "books", "fr"),   // 2 tokens
      (null, "web", "de")               // null text: 0 tokens, 0 chars
    ).toDF("text", "source", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_card")
    val json = CorpusReport.write(spark, docs, s"$dir/card.json")
    val onDisk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/card.json")), "UTF-8")
    assert(onDisk == json)
    assert(json.contains("\"n_docs\": 4"))
    assert(json.contains("\"n_tokens\": 8"))
    // one duplicated digest pair → 1 extra copy over 4 docs = 0.25;
    // the two null/empty-text docs do NOT pair up (only the real dup
    // counts — null and "" share a digest bucket ONLY with themselves)
    assert(json.contains("\"exact_dup_rate\": 0.250000"), json)
    assert(json.contains("\"web\": 3") && json.contains("\"books\": 1"))
    assert(json.contains("\"en\": 2") && json.contains("\"fr\": 1") &&
      json.contains("\"de\": 1"))
    // nothing in the 200..5000-char quality band in this toy corpus
    assert(json.contains("\"quality_band_share\": 0.000000"), json)
  }

  test("empty corpus writes a zeroed card, no division blowup") {
    val empty = Seq.empty[(String, String, String)]
      .toDF("text", "source", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_card0")
    val json = CorpusReport.write(spark, empty, s"$dir/card.json")
    assert(json.contains("\"n_docs\": 0"))
    assert(json.contains("\"exact_dup_rate\": 0.000000"))
  }
}
