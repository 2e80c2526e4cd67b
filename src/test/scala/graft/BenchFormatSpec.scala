package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The bench-artifact format contract: both lines are valid JSON, the
  * headline fits a bounded 2000-char log tail at full-registry size,
  * spreads are [min, max], formatting is locale-independent, and —
  * since round 12 — failed attempts are SCHEMA, not silence: a thrown
  * attempt's wall-clock never reaches min/max/total, its count lands
  * in `errs`, and a fully-failed query is excluded and named. */
class BenchFormatSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  // realistic registry-shaped names (long snake_case) at current size;
  // each row has 3 clean attempts (min = i*0.017, max = min + 1.5)
  private val results: Seq[BenchFormat.Row] =
    (1 to 258).map(i => BenchFormat.Row(
      s"dedup_minhash_corpus_variant_$i",
      Seq(i * 0.017, i * 0.017 + 0.4, i * 0.017 + 1.5), errs = 0))

  private val fullSha = BenchFormat.sha256Hex(
    BenchFormat.fullLine("/root/testdata/sf0.1", results) + "\n")

  test("headline: valid JSON, fits 2000 chars at full-registry size") {
    val line = BenchFormat.headline("/root/testdata/sf0.1", results,
      fullSha)
    assert(line.length <= 2000, s"headline is ${line.length} chars")
    val node = mapper.readTree(line) // throws on invalid JSON
    assert(node.get("metric").asText == "total")
    assert(node.get("unit").asText == "sec")
    assert(node.get("n_queries").asInt == 258)
    assert(node.get("queries").size == 25)    // slowest 25 mins
    assert(node.get("spread").size == 12)     // slowest 12 spreads
    assert(node.get("queries_omitted").asInt == 233)
    assert(node.get("err_attempts").asInt == 0)
    assert(node.get("failed_queries").asInt == 0)
    assert(node.get("full").asText == "BENCH_full.json")
    // the checksum lets a judge verify the committed full artifact
    // byte-for-byte against the run's stdout
    assert(node.get("full_sha256").asText == fullSha)
    assert(fullSha.matches("[0-9a-f]{64}"))
    // total = sum of MINS, 3dp
    val expected = results.map(_.min).sum
    assert(math.abs(node.get("value").asDouble - expected) < 0.001)
    // the headline's queries are genuinely the slowest ones
    val slowest = results.sortBy(-_.min).take(25).map(_.name).toSet
    val it = node.get("queries").fieldNames()
    while (it.hasNext) assert(slowest.contains(it.next()))
  }

  test("fullLine: every query present, spread arrays are [min, max]") {
    val line = BenchFormat.fullLine("/x", results)
    val node = mapper.readTree(line)
    assert(node.get("queries").size == 258)
    assert(node.get("spread").size == 258)
    assert(node.get("errs").size == 0)           // clean run: explicit {}
    assert(node.get("failed_queries").size == 0) // and explicit []
    val s = node.get("spread").get("dedup_minhash_corpus_variant_10")
    assert(s.isArray && s.size == 2)
    assert(math.abs(s.get(0).asDouble - 0.170) < 1e-9)
    assert(math.abs(s.get(1).asDouble - 1.670) < 1e-9)
    assert(s.get(0).asDouble <= s.get(1).asDouble)
  }

  test("a thrown attempt is excluded from min/max and counted in errs") {
    // q_bad: one 9.9 s attempt succeeded, two threw. The failed
    // attempts must not narrow or widen the spread, and the row must
    // surface errs=2 in the full artifact + the headline total count.
    val rows = Seq(
      BenchFormat.Row("q_ok", Seq(1.0, 1.2, 1.4), errs = 0),
      BenchFormat.Row("q_bad", Seq(9.9), errs = 2))
    val full = mapper.readTree(BenchFormat.fullLine("/x", rows))
    assert(full.get("queries").get("q_bad").asDouble == 9.9)
    val s = full.get("spread").get("q_bad")
    assert(s.get(0).asDouble == 9.9 && s.get(1).asDouble == 9.9)
    assert(full.get("errs").size == 1)
    assert(full.get("errs").get("q_bad").asInt == 2)
    val head = mapper.readTree(BenchFormat.headline("/x", rows, fullSha))
    assert(head.get("err_attempts").asInt == 2)
    assert(head.get("failed_queries").asInt == 0) // q_bad still has a time
  }

  test("a fully-failed query is excluded from maps and total, and named") {
    val rows = Seq(
      BenchFormat.Row("q_ok", Seq(2.0, 2.5), errs = 0),
      BenchFormat.Row("q_dead", Nil, errs = 3))
    val full = mapper.readTree(BenchFormat.fullLine("/x", rows))
    assert(full.get("n_queries").asInt == 1)
    assert(full.get("queries").size == 1)
    assert(full.get("queries").get("q_dead") == null)
    assert(full.get("spread").get("q_dead") == null)
    assert(math.abs(full.get("value").asDouble - 2.0) < 0.001)
    assert(full.get("errs").get("q_dead").asInt == 3)
    assert(full.get("failed_queries").size == 1)
    assert(full.get("failed_queries").get(0).asText == "q_dead")
    val head = mapper.readTree(BenchFormat.headline("/x", rows, fullSha))
    assert(head.get("n_queries").asInt == 1)
    assert(head.get("failed_queries").asInt == 1)
    assert(head.get("err_attempts").asInt == 3)
    assert(math.abs(head.get("value").asDouble - 2.0) < 0.001)
  }

  test("calibration rows (_-prefixed) stay in queries/spread but are " +
    "excluded from value and n_queries in BOTH artifacts") {
    val rows = Seq(
      BenchFormat.Row("_canary_host", Seq(0.5, 0.6), errs = 0),
      BenchFormat.Row("_canary_io", Seq(0.8, 0.9), errs = 0),
      BenchFormat.Row("q_ok", Seq(2.0, 2.5), errs = 0))
    val full = mapper.readTree(BenchFormat.fullLine("/x", rows))
    // total compares across rounds/core counts: host-measurement cost
    // must not be folded in
    assert(full.get("n_queries").asInt == 1)
    assert(math.abs(full.get("value").asDouble - 2.0) < 0.001)
    // but bench_compare.py reads the canaries from the queries map
    assert(full.get("queries").get("_canary_host").asDouble == 0.5)
    assert(full.get("queries").get("_canary_io").asDouble == 0.8)
    assert(full.get("spread").get("_canary_io").size == 2)
    val head = mapper.readTree(BenchFormat.headline("/x", rows, fullSha))
    assert(head.get("n_queries").asInt == 1)
    assert(math.abs(head.get("value").asDouble - 2.0) < 0.001)
    assert(head.get("queries").get("_canary_host") != null)
  }

  test("data fingerprint: tables map lands in the full artifact, its " +
    "checksum in the headline, and both stay parseable when absent") {
    val rows = Seq(BenchFormat.Row("q_ok", Seq(1.0), errs = 0))
    val fps = Seq(
      BenchFormat.TableFp("lineitem", 600572L, "00ff00ff00ff00ff",
        "123456789abcdef0"),
      BenchFormat.TableFp("nation", 25L, "a1b2c3d4e5f60718",
        "0000000000000019"))
    val tj = BenchFormat.tablesMap(fps)
    val full = mapper.readTree(BenchFormat.fullLine("/x", rows, tj))
    assert(full.get("tables").get("lineitem").get(0).asLong == 600572L)
    assert(full.get("tables").get("lineitem").get(1).asText
      == "00ff00ff00ff00ff")
    // the sum-mod-2^64 leg (round-16: xor alone is multiplicity-blind)
    assert(full.get("tables").get("lineitem").get(2).asText
      == "123456789abcdef0")
    assert(full.get("tables").size == 2)
    val head = mapper.readTree(
      BenchFormat.headline("/x", rows, fullSha, tj))
    // headline carries only the checksum — two stdout lines suffice to
    // see whether two runs read the same data
    assert(head.get("data_sha256").asText == BenchFormat.sha256Hex(tj))
    // targeted runs skip the fingerprint: empty map, stable schema
    val bare = mapper.readTree(BenchFormat.fullLine("/x", rows))
    assert(bare.get("tables").size == 0)
  }

  test("formatting is locale-independent (comma-decimal default)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(BenchFormat.d3(1234.5678) == "1234.568")
      // whole lines still parse as JSON under the comma-decimal locale
      mapper.readTree(BenchFormat.fullLine("/x", results.take(5)))
      mapper.readTree(BenchFormat.headline("/x", results.take(5), fullSha))
    } finally java.util.Locale.setDefault(prev)
  }

  test("sf dir with quotes/backslashes still yields valid JSON") {
    val evil = """C:\data\sf"0.1""""
    val h = mapper.readTree(BenchFormat.headline(evil, results.take(2), fullSha))
    assert(h.get("sf").asText == evil)
    val f = mapper.readTree(BenchFormat.fullLine(evil, results.take(2)))
    assert(f.get("sf").asText == evil)
  }

  test("small runs: headline carries everything, omitted count is 0") {
    val line = BenchFormat.headline("/x", results.take(3), fullSha)
    val node = mapper.readTree(line)
    assert(node.get("queries").size == 3)
    assert(node.get("spread").size == 3)
    assert(node.get("queries_omitted").asInt == 0)
  }
}
