package graft.llmops

import graft.Scratch.ScratchOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016) as a
  * driver-sequenced Spark loop — the full version of the single
  * merge-round statistic `bpe_pair_counts` registers.
  *
  * Scale shape — the part worth copying: training never iterates over
  * the corpus. The corpus collapses ONCE to a (token, freq) vocabulary
  * table (one shuffle, output bounded by vocabulary size — Heaps-law
  * sublinear in corpus bytes), and every merge round runs on that
  * table: pair counts are freq-weighted aggregates over vocab rows
  * (shuffle carries pair keys), the argmax is a 1-row collect, and the
  * merge application is a scan-side higher-order fold over each
  * token's symbol array. 10 rounds = 10 vocab-sized shuffles +
  * 10 one-row collects, regardless of corpus size — the same
  * driver-sequenced-iteration posture as `graph_pagerank`, with
  * `localCheckpoint` barriers so round R's plan doesn't re-derive
  * rounds 1..R-1.
  *
  * Determinism: counts are exact longs; the argmax breaks ties by
  * (weight DESC, left ASC, right ASC) — a total order, so the merge
  * sequence is reproducible anywhere. The greedy fold merges leftmost
  * non-overlapping occurrences (the reference BPE behavior): on
  * "aaa" with rule (a,a) the fold yields [aa, a], because the freshly
  * merged symbol, not the raw one, is what the next comparison sees.
  */
object Bpe {

  /** One learned merge: `left`+`right` → `left ++ right`, with the
    * freq-weighted occurrence count that won the round, and the
    * total-symbol audit pair. Conservation law: when left ≠ right the
    * occurrences cannot overlap, so applying the merge shrinks
    * Σ freq·|syms| by EXACTLY `weight`; for self-pairs adjacent
    * counting sees overlaps inside runs ("aaa" counts 2, the greedy
    * fold consumes 1), so the applied count is 0 < applied ≤ weight. */
  case class Merge(round: Int, left: String, right: String,
                   weight: Long, symsBefore: Long, symsAfter: Long)

  /** Corpus → (token, freq, syms) vocabulary: the ONE corpus-sized
    * aggregation of the whole train. Tokens are whitespace words,
    * lowercased; symbols start as single characters. */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        expr("transform(sequence(1, length(tok)), i -> substr(tok, i, 1))"))

  /** Freq-weighted adjacent-pair counts over the vocab's symbol
    * arrays. Guarded on |syms| ≥ 2 (`sequence(a,b)` DESCENDS when
    * b < a — the 1-symbol-token trap). */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, size(syms) - 1),
             i -> struct(element_at(syms, i) AS l,
                         element_at(syms, i + 1) AS r))""")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("weight"))

  /** Greedy leftmost fold applying merge (a, b) → a++b to a symbol
    * array — built with the Column API (no SQL-string interpolation,
    * so symbols containing quotes can't break the expression). */
  private def applyMerge(syms: Column, a: String, b: String): Column = {
    val merged = lit(a + b)
    aggregate(syms, typedLit(Array.empty[String]), (acc, x) =>
      when(size(acc) > 0 &&
        element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
        .otherwise(concat(acc, array(x))))
  }

  /** A word as its initial single-character symbol array — the encode
    * path's starting state (identical to [[vocabulary]]'s `syms`
    * initialization, exposed for encoding tokens that never appeared
    * in training). */
  def charSplit(tok: Column): Column =
    transform(sequence(lit(1), length(tok)), i => tok.substr(i, lit(1)))

  /** ENCODE: apply a trained merge list to a symbol-array column in
    * rank order — merge 1 folds to fixpoint over the array before
    * merge 2 is considered, which is exactly the state sequence
    * training itself produced, so encoding a trained token reproduces
    * the final vocabulary's symbols verbatim (the `bpe_encode`
    * invariant). Scan-side only: the merges are driver-held (bounded
    * by vocab_size, here 10) and each application is a higher-order
    * fold per row — encoding shuffles nothing at any corpus size. */
  def encodeColumn(syms: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(syms)((c, m) => applyMerge(c, m.left, m.right))

  /** Persist a trained merge table as a parquet artifact — the
    * tokenizer file that ships to serving (the [[graft.llmops
    * .Similarity]] PQ-index precedent: train once per corpus version,
    * serve everywhere; version the artifact dir with ManifestTable).
    * Rank order is preserved via the `round` column. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    merges.map(m => (m.round, m.left, m.right, m.weight))
      .toDF("round", "left", "right", "weight")
      .write.mode("overwrite").parquet(path)
  }

  /** Load a merge artifact in rank order; [[encodeColumn]] over the
    * loaded merges must reproduce the training-time encoding exactly
    * (spec-pinned). */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[Merge] =
    spark.read.parquet(path)
      .orderBy("round").collect().toSeq
      .map(r => Merge(r.getAs[Int]("round"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("weight"), -1L, -1L))

  /** Run `rounds` merge rounds; returns the learned merges and the
    * final vocabulary (tok, freq, syms). When `audit` is set, each
    * round also measures Σ freq·|syms| before/after so the caller can
    * gate the conservation law symsBefore − symsAfter == weight (the
    * merge consumed exactly the occurrences it counted — a
    * wrong-greedy fold or a double-merge both break it). */
  def train(docs: DataFrame, textCol: String, rounds: Int,
            audit: Boolean = false): (Seq[Merge], DataFrame) = {
    // Job-count disciplines (same as the iterative graph kernels /
    // connectedComponents): each round's vocab checkpoint is LAZY —
    // the next round's top-pair job is its materializing action (one
    // job per round, not an eager-checkpoint job plus the top-pair
    // job) — and the superseded round's blocks release one round
    // BEHIND (the lazy child computes FROM the parent's blocks, so
    // releasing before the child materializes would sever truncated
    // lineage; TakeOrderedAndProject scans every partition, so the
    // top-pair job does materialize the full checkpoint).
    import org.apache.spark.sql.graft.CheckpointBridge
    var vocab = vocabulary(docs, textCol).scratchCheckpoint(false)
    var superseded: DataFrame = null
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("weight").desc, col("l"), col("r"))
        .limit(1).collect() // materializes vocab's lazy checkpoint
      if (superseded != null) { CheckpointBridge.release(superseded)
        superseded = null }
      if (top.isEmpty) { exhausted = true }
      else {
        val (a, b, w) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        def totalSyms(v: DataFrame): Long =
          v.agg(sum(col("freq") * size(col("syms")))).head().getLong(0)
        val before = if (audit) totalSyms(vocab) else -1L
        superseded = vocab
        vocab = vocab
          .withColumn("syms", applyMerge(col("syms"), a, b))
          .scratchCheckpoint(false) // barrier: next round plans from here
        val after = if (audit) totalSyms(vocab) else -1L
        merges += Merge(r, a, b, w, before, after)
      }
      r += 1
    }
    if (superseded != null) {
      // the returned vocab may still be un-materialized; compute it
      // before releasing the parent its truncated lineage hangs off
      vocab.count()
      CheckpointBridge.release(superseded)
    }
    (merges.result(), vocab)
  }
}
