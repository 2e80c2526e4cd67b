package graft

/** Pure formatting for [[Bench]]'s two artifacts, factored out so the
  * format CONTRACT is unit-testable without a Spark run: the stdout
  * headline must stay parseable inside a bounded (2000-char) log
  * tail at full-registry size, and both lines must be
  * locale-independent JSON (a comma-decimal default locale must not
  * produce `0,123`). Input everywhere: (query, min, max) of the
  * per-attempt seconds.
  *
  * Why min AND max: min is the comparable number (the GC/scheduler-
  * undisturbed attempt — see BASELINE.md's adjudication protocol);
  * max bounds the ambient swing, so a plan regression (min moved) is
  * distinguishable from scheduler noise (min stable, max wide)
  * straight from the artifact. */
private[graft] object BenchFormat {

  /** 3-decimal ROOT-locale seconds: millisecond resolution is all the
    * artifact needs, and short numbers keep the headline small. */
  def d3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** JSON string escape — the sf dir is environment-controlled (a
    * Windows path or a quote in it must not corrupt the artifact). */
  def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def minMap(rs: Seq[(String, Double, Double)]): String =
    rs.map { case (k, mn, _) => jstr(k) + ":" + d3(mn) }
      .mkString("{", ",", "}")

  def spreadMap(rs: Seq[(String, Double, Double)]): String =
    rs.map { case (k, mn, mx) =>
      jstr(k) + ":[" + d3(mn) + "," + d3(mx) + "]" }
      .mkString("{", ",", "}")

  /** SHA-256 of the EXACT BYTES written to BENCH_full.json (UTF-8,
    * trailing newline included) — carried in the headline so a log
    * tail alone proves which full artifact the run produced: a judge
    * can hash the committed file and match it against the driver's
    * stdout, closing the "was this file re-generated after the run?"
    * gap. */
  def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString

  /** ONE compact JSON line that FITS a bounded 2000-char log tail even
    * on full-registry runs (a full per-query dict is ~8 KB and gets
    * truncated into unparseable half-JSON). Carries total + the
    * slowest 25 mins + the slowest 12 spreads — what a
    * round-over-round read actually uses; the full maps live in
    * BENCH_full.json, checksummed here via `full_sha256`. The 25/12
    * budget holds 2000 chars even with every name at the registry's
    * worst-case length (BenchFormatSpec pins it). */
  def headline(sfDir: String, results: Seq[(String, Double, Double)],
               fullSha256: String): String = {
    val bySlow = results.sortBy(-_._2)
    s"""{"metric":"total","unit":"sec","sf":${jstr(sfDir)},""" +
      s""""n_queries":${results.size},"value":${d3(results.map(_._2).sum)},""" +
      s""""queries":${minMap(bySlow.take(25))},""" +
      s""""spread":${spreadMap(bySlow.take(12))},""" +
      s""""queries_omitted":${math.max(0, results.size - 25)},""" +
      s""""full":"BENCH_full.json","full_sha256":"$fullSha256"}"""
  }

  /** The complete artifact line: every query's min plus every query's
    * [min, max] spread. */
  def fullLine(sfDir: String, results: Seq[(String, Double, Double)])
  : String =
    s"""{"metric":"total","unit":"sec","sf":${jstr(sfDir)},""" +
      s""""n_queries":${results.size},"value":${d3(results.map(_._2).sum)},""" +
      s""""queries":${minMap(results)},""" +
      s""""spread":${spreadMap(results)}}"""
}
