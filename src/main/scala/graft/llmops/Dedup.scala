package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design: every variant reduces the O(n²) pair space to
  * hash-bucket joins — the only shuffles are on short digest/band keys,
  * never on document text. Signatures are computed row-local with
  * codegen'd higher-order functions (no UDF, no explode of shingles), so
  * signature generation runs at scan speed; candidate generation is a
  * self-equi-join on band keys, which Spark executes as a shuffled hash
  * join keyed on ~16-byte keys. Common-shingle skew concentrates in few
  * buckets → AQE skew-join handles it (enabled in the session).
  */
object Dedup {

  // --- Exact -----------------------------------------------------------

  /** Exact dedup via content digest: one row per distinct normalized
    * text, keeping the smallest id (deterministic survivor). Shuffle
    * carries (digest, id) only — never the text. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // --- Shingling -------------------------------------------------------

  /** Word k-shingles as a deduplicated array column; the whole pipeline
    * below stays array-valued per row (no explode). */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(trim(lower(coalesce(text, lit("")))), "\\s+")
    val grams = when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
    array_distinct(grams)
  }

  // --- MinHash + LSH ---------------------------------------------------

  /** Permutation hash h_j(x) = (a_j*(x & MASK31) + b_j) mod P31 over the
    * 31-bit Mersenne field: operands stay < 2^31 so the product fits a
    * long WITHOUT wraparound — required under ANSI mode (Spark 4
    * default), where silent long overflow is an error. a/b are fixed
    * pseudo-random constants derived from the permutation index —
    * deterministic across runs and partitions. */
  private val P31 = 2147483647L // 2^31 - 1, Mersenne prime
  private val Mask31 = 0x7FFFFFFFL
  private def mix(z0: Long): Long = { // SplitMix64 finalizer
    var z = z0 * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def permA(j: Int): Long = (mix(2L * j + 1) & Mask31) | 1L
  private def permB(j: Int): Long = mix(j + 7L) & Mask31

  /** MinHash signature (array<long> of length numPerm) from a shingle
    * array — one pass per permutation over the row-local hash array. */
  def minhashSignature(shingleCol: Column, numPerm: Int = 64): Column = {
    val hashes = transform(shingleCol, s => xxhash64(s).bitwiseAND(lit(Mask31)))
    val sig = (0 until numPerm).map { j =>
      array_min(transform(hashes,
        h => pmod(h * lit(permA(j)) + lit(permB(j)), lit(P31))))
    }
    array(sig: _*)
  }

  /** LSH banding: rows (id, band_id, band_key) — one row per band, key =
    * hash of the signature slice. Docs sharing any band collide. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String,
               bands: Int, rowsPerBand: Int): DataFrame = {
    val bandRows = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        hash(lit(b), slice(col(sigCol), b * rowsPerBand + 1, rowsPerBand))
          .as("band_key"))
    }
    df.select(col(idCol), explode(array(bandRows: _*)).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_key"))
  }

  /** Candidate pairs (id_a < id_b) from MinHash LSH. Default 64 perms as
    * 16 bands × 4 rows ⇒ collision prob ≈ 1-(1-s⁴)¹⁶ (s = Jaccard):
    * ~50% at s≈0.45, ~99.9% at s≈0.8. */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        shingleK: Int = 3, numPerm: Int = 64,
                        bands: Int = 16): DataFrame = {
    val rowsPerBand = numPerm / bands
    val sigs = df.select(col(idCol),
      minhashSignature(shingles(col(textCol), shingleK), numPerm)
        .as("sig"))
    val banded = lshBands(sigs, idCol, "sig", bands, rowsPerBand)
    val a = banded.select(col(idCol).as("id_a"), col("band_id"),
      col("band_key"))
    val b = banded.select(col(idCol).as("id_b"), col("band_id"),
      col("band_key"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard verification of candidate pairs: join shingle
    * sets back onto the (small) candidate set and compute
    * |∩| / |∪| with row-local array ops. */
  def jaccardVerify(df: DataFrame, candidates: DataFrame, textCol: String,
                    idCol: String, shingleK: Int = 3,
                    threshold: Double = 0.7): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      shingles(col(textCol), shingleK).as("sh"))
    candidates
      .join(sh.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Full MinHash near-dup pipeline: LSH candidates → exact Jaccard. */
  def minhashDedup(df: DataFrame, textCol: String, idCol: String,
                   threshold: Double = 0.7): DataFrame =
    jaccardVerify(df, minhashCandidates(df, textCol, idCol), textCol,
      idCol, threshold = threshold)

  // --- SimHash ---------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens, computed entirely row-local:
    * bit b of the output is set iff more than half the token hashes have
    * bit b set. Power-of-two addends are bitwise disjoint, so summing
    * them assembles the word without carries (incl. the sign bit). */
  def simhash(text: Column): Column = {
    val hashes = transform(split(trim(lower(coalesce(text, lit("")))),
      "\\s+"), t => xxhash64(t))
    val n = size(hashes)
    val word = (0 until 64).map { b =>
      val setCnt = size(filter(hashes,
        h => shiftright(h, b).bitwiseAND(lit(1L)) === lit(1L)))
      when(setCnt * 2 > n, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    word
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    * Candidate generation: split the 64-bit hash into 4 16-bit chunks —
    * any pair within Hamming 3 must agree on >= 1 chunk (pigeonhole) —
    * and equi-join per chunk. Verification: bit_count(a XOR b). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val chunked = sh.select(col("id"), col("sh"), explode(array(
      (0 until 4).map(c => struct(lit(c).as("chunk_id"),
        shiftright(col("sh"), c * 16).bitwiseAND(lit(0xFFFFL))
          .as("chunk_key"))): _*)).as("ck"))
      .select(col("id"), col("sh"), col("ck.chunk_id"), col("ck.chunk_key"))
    val a = chunked.select(col("id").as("id_a"), col("sh").as("sh_a"),
      col("chunk_id"), col("chunk_key"))
    val b = chunked.select(col("id").as("id_b"), col("sh").as("sh_b"),
      col("chunk_id"), col("chunk_key"))
    a.join(b, Seq("chunk_id", "chunk_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
