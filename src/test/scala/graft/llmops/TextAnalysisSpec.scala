package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick brown fox, and the lazy dog!"),
    (2L, "  spaced   out   tokens  "),
    (3L, ""), (4L, null.asInstanceOf[String]),
    (5L, "der hund und die katze ist nicht hier mit der maus"),
    (6L, "le chat est dans la maison et le chien pour toujours")
  ).toDF("doc_id", "text")

  private def one(c: org.apache.spark.sql.Column, id: Long): Any =
    docs.filter(col("doc_id") === id).select(c.as("x")).collect().head.get(0)

  test("tokenCount: whitespace runs, trims, blank/null → 0") {
    assert(one(TextAnalysis.tokenCount(col("text")), 1L) == 8)
    assert(one(TextAnalysis.tokenCount(col("text")), 2L) == 3)
    assert(one(TextAnalysis.tokenCount(col("text")), 3L) == 0)
    assert(one(TextAnalysis.tokenCount(col("text")), 4L) == 0)
  }

  test("bpeish token count splits letter runs / digits / symbols") {
    val n = one(TextAnalysis.bpeishTokenCount(lit("ab1!cd")), 1L)
    assert(n == 4) // "ab","1","!","cd"
  }

  test("punct and stopword counting") {
    assert(one(TextAnalysis.punctCount(col("text")), 1L) == 2) // , !
    assert(one(TextAnalysis.stopwordCount(col("text")), 1L) == 3) // the,and,the
  }

  test("qualityProfile ratios are null-safe") {
    val p = TextAnalysis.qualityProfile(docs, "text", "doc_id")
      .filter(col("doc_id") === 3L).collect().head
    assert(p.getAs[Long]("n_tokens") == 0L)
    assert(p.isNullAt(p.fieldIndex("stopword_ratio")))
  }

  test("qualityGate keeps normal prose, drops blank docs") {
    val keep = TextAnalysis.qualityGate(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("keep")).toMap
    assert(keep(1L)); assert(!keep(3L)); assert(!keep(4L))
  }

  test("repetitionRatio: looping text high, prose low, short text 0") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam"),      // one distinct 3-gram
      (2L, "the quick brown fox jumps over dogs"), // all grams distinct
      (3L, "one two"), (4L, ""), (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = d.select(col("doc_id"),
      TextAnalysis.repetitionRatio(col("text")).as("r"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) == 1.0 - 1.0 / 4.0) // 4 grams, 1 distinct
    assert(r(2L) == 0.0)             // 5 grams, all distinct
    assert(r(3L) == 0.0 && r(4L) == 0.0 && r(5L) == 0.0)
  }

  test("langId picks the dominant stopword profile") {
    assert(one(TextAnalysis.langId(col("text")), 1L) == "en")
    assert(one(TextAnalysis.langId(col("text")), 5L) == "de")
    assert(one(TextAnalysis.langId(col("text")), 6L) == "fr")
    assert(one(TextAnalysis.langId(col("text")), 3L) == "unknown")
  }

  test("fingerprintMd5 is whitespace/case-insensitive") {
    val a = one(TextAnalysis.fingerprintMd5(lit("Hello  World")), 1L)
    val b = one(TextAnalysis.fingerprintMd5(lit("hello world")), 1L)
    assert(a == b)
  }

  test("nfcNormalize: composes NFD, identity on NFC, null-safe") {
    import spark.implicits._
    val nfd = "Café"        // e + combining acute (NFD)
    val nfc = "Café"         // é precomposed (NFC)
    val rows = Seq(Some(nfd), Some(nfc), None).toDF("t")
      .select(graft.functions.TextExprs.nfcNormalize(col("t")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(rows(0).contains(nfc)) // NFD composed
    assert(rows(1).contains(nfc)) // already-NFC untouched
    assert(rows(2).isEmpty)       // null in, null out
    // the dedup motivation: the two spellings fingerprint identically
    // only AFTER normalization
    val fps = Seq(nfd, nfc).toDF("t").select(
      TextAnalysis.fingerprintMd5(
        graft.functions.TextExprs.nfcNormalize(col("t"))).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("canonicalizeUrl: each normalization, pinned") {
    def canon(u: String): String =
      one(TextAnalysis.canonicalizeUrl(lit(u)), 1L).asInstanceOf[String]
    // fragment, default port, trailing slash, host case
    assert(canon("https://WWW.Example.com:443/A/b/#sec2")
      == "https://www.example.com/a/b")
    // tracking-only query vanishes entirely (no dangling '?')
    assert(canon("https://h.io/p?utm_source=x&utm_campaign=y")
      == "https://h.io/p")
    // tracking dropped wherever it sits; content params survive
    assert(canon("https://h.io/p?a=1&utm_source=x&b=2")
      == "https://h.io/p?a=1&b=2")
    // tracking FIRST then content — the param-split design handles
    // the case a pure-regex strip leaves malformed ("p&b=2")
    assert(canon("https://h.io/p?utm_source=x&b=2")
      == "https://h.io/p?b=2")
    // param ORDER never splits a group: sorted canonical form
    assert(canon("https://h.io/p?z=9&a=1") == canon("https://h.io/p?a=1&z=9"))
    assert(canon("https://h.io/p?z=9&a=1") == "https://h.io/p?a=1&z=9")
    // a content param whose VALUE mentions utm_ is NOT tracking
    assert(canon("https://h.io/p?q=utm_source") == "https://h.io/p?q=utm_source")
    // slash-before-query normalizes like trailing slash
    assert(canon("https://h.io/p/?a=1") == canon("https://h.io/p?a=1"))
    // :443 at end-of-URL (no path) also stripped
    assert(canon("https://h.io:443") == "https://h.io")
    // fbclid/gclid click ids are tracking too
    assert(canon("https://h.io/p?fbclid=abc&gclid=def&a=1")
      == "https://h.io/p?a=1")
    // '?' is legal INSIDE a query string: the query is everything
    // after the FIRST '?', so interior params survive intact
    assert(canon("https://h.io/p?redirect=/x?y=1")
      == "https://h.io/p?redirect=/x?y=1")
    // :443 is NOT http's default port — a different endpoint, kept
    assert(canon("http://h.io:443/x") == "http://h.io:443/x")
    // ':443/' inside a PATH segment is content, not a port
    assert(canon("https://h.io/a:443/b") == "https://h.io/a:443/b")
  }

  test("rollingFingerprint: deterministic, order-sensitive, 32-bit") {
    val a = one(TextAnalysis.rollingFingerprint(lit("a b c")), 1L)
    val b = one(TextAnalysis.rollingFingerprint(lit("c b a")), 1L)
    val a2 = one(TextAnalysis.rollingFingerprint(lit("a b c")), 1L)
    assert(a == a2 && a != b)
    assert(a.asInstanceOf[Long] >= 0 &&
      a.asInstanceOf[Long] <= 0xFFFFFFFFL)
  }
}
