package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything here is built from codegen'd `functions._` expressions
  * (no UDFs) so the whole stage stays inside WholeStageCodegen and the
  * operators are embarrassingly parallel — no shuffle at all; at 100 TB
  * these run at scan speed with full column pruning.
  */
object TextAnalysis {

  /** Whitespace token count. 0 for null/blank. */
  def tokenCount(text: Column): Column =
    when(text.isNull || trim(text) === "", 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword proxy: runs of letters, single digits, and single
    * non-alnum symbols — a cheap deterministic stand-in for a real BPE
    * vocab (which would be a broadcast lookup at scale). */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"
  def bpeishTokenCount(text: Column): Column =
    coalesce(regexp_count(text, lit(BpeishPattern)), lit(0))

  /** Punctuation count over a fixed ASCII class (engine-portable). */
  def punctCount(text: Column): Column =
    coalesce(regexp_count(text, lit("[.,!?;:]")), lit(0))

  val StopwordPattern = "\\b(the|a|an|and|or|of|to|in|is|it)\\b"
  def stopwordCount(text: Column): Column =
    coalesce(regexp_count(lower(text), lit(StopwordPattern)), lit(0))

  /** Quality heuristics: length, token count, punct ratio, stopword
    * ratio, mean word length. Ratios are raw doubles (identical
    * arithmetic in any engine — deliberately NOT rounded: rounding a
    * ratio whose denominator is a power of two hits exact decimal ties
    * where round-half-up and round-half-even engines disagree). */
  def qualityProfile(df: DataFrame, textCol: String,
                     idCol: String): DataFrame = {
    val t = col(textCol)
    val chars = length(coalesce(t, lit(""))).cast("long")
    val toks = tokenCount(t).cast("long")
    df.select(
      col(idCol),
      chars.as("n_chars"),
      toks.as("n_tokens"),
      punctCount(t).cast("long").as("n_punct"),
      stopwordCount(t).cast("long").as("n_stopwords"),
      (punctCount(t) / nullif(chars.cast("double"), lit(0.0)))
        .as("punct_ratio"),
      (stopwordCount(t) / nullif(toks.cast("double"), lit(0.0)))
        .as("stopword_ratio"),
      (chars.cast("double") / nullif(toks.cast("double"), lit(0.0)))
        .as("mean_token_len"))
  }

  /** Boolean keep/drop quality gate in the Gopher/C4 style:
    * enough tokens, sane mean word length, some stopwords. */
  def qualityGate(df: DataFrame, textCol: String, idCol: String,
                  minTokens: Int = 5, minMeanLen: Double = 2.0,
                  maxMeanLen: Double = 12.0): DataFrame = {
    val p = qualityProfile(df, textCol, idCol)
    p.select(col(idCol), col("n_tokens"),
      (col("n_tokens") >= minTokens &&
        col("mean_token_len") >= minMeanLen &&
        col("mean_token_len") <= maxMeanLen &&
        col("n_stopwords") > 0).as("keep"))
  }

  /** Within-document n-gram repetition ratio — the Gopher-family
    * "repetitious text" quality signal (machine-generated or looping
    * documents repeat the same n-grams; high-quality prose rarely
    * does): `1 - distinct_kgrams / total_kgrams`, 0.0 for texts
    * shorter than k tokens. Pure per-row expression — scan-speed, no
    * shuffle; compose with [[keepPredicate]] in a curation gate. */
  def repetitionRatio(text: Column, k: Int = 3): Column = {
    // distinct k-grams via the codegen-path ShingleSet expression (tight
    // JVM loop) — the HOF formulation (transform+slice+array_join+
    // array_distinct) is interpreted per-element and measured 35 s for
    // the sf0.1 corpus vs sub-second here; total k-gram count comes from
    // the (codegen'd) regex token count
    val t = coalesce(text, lit(""))
    val nGrams = tokenCount(t).cast("long") - (k - 1)
    when(nGrams <= 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(graft.functions.HashExprs.shingleSet(t, k)).cast("double") /
          nGrams.cast("double"))
  }

  /** The [[qualityGate]] decision as a single COLUMN over the text —
    * for pipelines that gate inline ([[CorpusPipeline.curate]]) instead
    * of joining a gate frame back by id: a filter is a scan-time
    * predicate; the join formulation shuffles the corpus by id (and
    * squares under duplicate ids). NULL (empty text → null mean length)
    * means drop, matching `filter(col("keep"))` on the frame form. */
  def keepPredicate(t: Column, minTokens: Int = 5,
                    minMeanLen: Double = 2.0,
                    maxMeanLen: Double = 12.0): Column = {
    val chars = length(coalesce(t, lit(""))).cast("long")
    val toks = tokenCount(t).cast("long")
    val meanLen = chars.cast("double") / nullif(toks.cast("double"),
      lit(0.0))
    toks >= minTokens && meanLen >= minMeanLen &&
      meanLen <= maxMeanLen && stopwordCount(t) > 0
  }

  /** Stopword-profile language ID. Scores a handful of high-frequency
    * function words per language and picks the max with a fixed
    * priority tie-break (en > de > fr > es). A real system would use
    * char-n-gram profiles; the operator shape (pure per-row expression,
    * no shuffle) is identical.
    */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is|was|that|with)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|mit)\\b",
    "fr" -> "\\b(le|la|les|et|est|une|dans|pour)\\b",
    "es" -> "\\b(el|los|las|y|es|una|con|para)\\b")

  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (lang, pat) =>
      lang -> coalesce(regexp_count(lower(text), lit(pat)), lit(0))
    }
    // strict-greater chain == max with first-listed priority on ties
    val Seq(en, de, fr, es) = scores.map(_._2)
    when(en === 0 && de === 0 && fr === 0 && es === 0, "unknown")
      .when(de > en && de >= fr && de >= es, "de")
      .when(fr > en && fr > de && fr >= es, "fr")
      .when(es > en && es > de && es > fr, "es")
      .otherwise("en")
  }

  // --- PII scrubbing ---------------------------------------------------

  /** Redaction patterns for the standard pre-training scrub: emails,
    * IPv4 addresses, long digit runs (phone-ish). Kept to constructs
    * with identical semantics in Java regex and RE2 (no backrefs, no
    * lookaround) so the scrub is engine-portable and oracle-checkable.
    * Order matters: emails first (an email can contain digits), then
    * IPs (dotted digits would partially match the phone run), then
    * phones. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"

  /** Scrubbed text: PII spans replaced by typed placeholder tokens —
    * pure per-row regexp_replace chain, runs at scan speed. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Count of PII spans found (pre-scrub), for the DQ report. */
  def piiCount(text: Column): Column =
    coalesce(regexp_count(text, lit(EmailPattern)), lit(0)) +
      coalesce(regexp_count(text, lit(Ipv4Pattern)), lit(0)) +
      coalesce(regexp_count(text, lit(PhonePattern)), lit(0))

  /** Content fingerprint: md5 of whitespace-normalized lowercase text.
    * The canonical near-dup pre-key (exact dedup groups on this). */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Query-string parameters a URL canonicalizer must drop: tracking
    * decorations that vary per click but never change the fetched
    * resource (the CCNet/RefinedWeb crawl-curation rule — one page,
    * many tracked links). Anchored at the param start so a genuine
    * content param whose VALUE contains "utm_" survives. */
  val TrackingParamPattern = "^(utm_[a-z_]+|fbclid|gclid)="

  /** Canonical form of a crawl URL, the key for URL-level dedup
    * (CCNet / RefinedWeb keep one document per canonical URL before
    * any content hashing — it is the cheapest dedup pass because it
    * never touches page bytes). Normalizations applied:
    *   - fragment stripped (`#…` is client-side only);
    *   - query split on `&`, tracking params ([[TrackingParamPattern]])
    *     and empty segments dropped, survivors SORTED and rejoined —
    *     param order never changes the resource, so `?a=1&z=2` and
    *     `?z=2&a=1` must collide;
    *   - default-port `:443` dropped (before a path or at end);
    *   - trailing path slash dropped;
    *   - lowercased. (Production splits host-only lowercasing from
    *     the path; this corpus constructs paths/params lowercase, so
    *     whole-string lower() is exact here and keeps the expression
    *     a one-pass narrow map in both engines.)
    * Pure built-in expression — higher-order `filter`/`array_sort` on
    * the split query — so at 100 TB canonicalization rides the scan:
    * no shuffle, no UDF, codegen-friendly. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val base0  = substring_index(noFrag, "?", 1)
    // the query is everything after the FIRST '?': '?' is legal inside
    // a query string (?redirect=/x?y=1), so a last-'?' split would
    // silently drop interior params
    val query  = when(instr(noFrag, "?") > 0,
      noFrag.substr(instr(noFrag, "?") + 1, length(noFrag)))
      .otherwise(lit(""))
    val kept = filter(split(query, "&"),
      p => !p.rlike(TrackingParamPattern) && p =!= "")
    val sortedQ = array_join(array_sort(kept), "&")
    // :443 is only a DEFAULT (strippable) port for https, and only in
    // the authority — http://h:443 is a genuinely different endpoint
    // and a path segment ':443/' is content, so both are preserved
    val after = base0.substr(lit(9), length(base0)) // past "https://"
    val slash = instr(after, "/")
    val auth  = when(slash > 0, after.substr(lit(1), slash - 1))
      .otherwise(after)
    val path  = when(slash > 0, after.substr(slash, length(after)))
      .otherwise(lit(""))
    val base1 = when(base0.startsWith("https://"),
      concat(lit("https://"), regexp_replace(auth, ":443$", ""), path))
      .otherwise(base0)
    val base = regexp_replace(base1, "/$", "")
    lower(concat(base,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit(""))))
  }

  /** 32-bit rolling (polynomial) fingerprint over whitespace tokens —
    * Karp-Rabin style, base 1000003 over the token hash stream, reduced
    * mod 2^32 each step so the arithmetic never overflows a long (ANSI
    * mode makes silent overflow an error): acc < 2^32, so
    * acc·1000003 + h < 2^52 + 2^32. The per-token hash is the first 32
    * bits of md5 — fully engine-portable (the previous xxhash64 seed-42
    * variant was Spark-specific, leaving this the only fingerprint
    * without a DuckDB oracle; md5 exists everywhere and the recurrence
    * maps to DuckDB's `list_reduce`). Pure expression via the
    * `aggregate` higher-order function: order-dependent by construction
    * (it is a *rolling* hash) but deterministic — no shuffle, no UDF. */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      transform(split(trim(coalesce(text, lit(""))), "\\s+"),
        t => conv(substring(md5(t), 1, 8), 16, 10).cast("long")),
      lit(0L),
      (acc, h) => (acc * lit(1000003L) + h) % lit(4294967296L))
}
