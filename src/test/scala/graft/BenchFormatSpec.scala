package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The bench-artifact format contract: both lines are valid JSON, the
  * headline fits a bounded 2000-char log tail at full-registry size,
  * spreads are [min, max], and formatting is locale-independent. */
class BenchFormatSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  // realistic registry-shaped names (long snake_case) at current size
  private val results: Seq[(String, Double, Double)] =
    (1 to 258).map(i =>
      (s"dedup_minhash_corpus_variant_$i", i * 0.017, i * 0.017 + 1.5))

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
    assert(node.get("full").asText == "BENCH_full.json")
    // the checksum lets a judge verify the committed full artifact
    // byte-for-byte against the run's stdout
    assert(node.get("full_sha256").asText == fullSha)
    assert(fullSha.matches("[0-9a-f]{64}"))
    // total = sum of MINS, 3dp
    val expected = results.map(_._2).sum
    assert(math.abs(node.get("value").asDouble - expected) < 0.001)
    // the headline's queries are genuinely the slowest ones
    val slowest = results.sortBy(-_._2).take(25).map(_._1).toSet
    val it = node.get("queries").fieldNames()
    while (it.hasNext) assert(slowest.contains(it.next()))
  }

  test("fullLine: every query present, spread arrays are [min, max]") {
    val line = BenchFormat.fullLine("/x", results)
    val node = mapper.readTree(line)
    assert(node.get("queries").size == 258)
    assert(node.get("spread").size == 258)
    val s = node.get("spread").get("dedup_minhash_corpus_variant_10")
    assert(s.isArray && s.size == 2)
    assert(math.abs(s.get(0).asDouble - 0.170) < 1e-9)
    assert(math.abs(s.get(1).asDouble - 1.670) < 1e-9)
    assert(s.get(0).asDouble <= s.get(1).asDouble)
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
