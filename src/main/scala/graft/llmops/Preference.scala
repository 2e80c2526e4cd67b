package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-data operators for RLHF-style pipelines: fitting a
  * strength model to pairwise comparison outcomes (which response did
  * the rater prefer / which variant won the match).
  *
  * Scale design: the data-sized work is aggregating billions of raw
  * comparisons down to the per-ordered-pair win-count matrix — one
  * map-side-combined groupBy keyed by (winner, loser). The model fit
  * itself runs on the driver over that aggregate, which is bounded by
  * entities² (models, policies, content sources — hundreds, not
  * rows), the same bounded-model-state contract as the k-means /
  * PQ-codebook training in [[Similarity]]: what crosses to the driver
  * is the sufficient statistic, never the data.
  */
object Preference {

  /** One-off DENSE-ID materialization for operators whose draw
    * arithmetic needs ids in [0, n) — the documented pre-step for
    * [[graft.QueriesText]]'s `contrastive_negatives` on corpora whose
    * ids are sparse or duplicated (merged shards, replicated
    * rehearsal layouts, UUID-keyed corpora). RDD `zipWithIndex`, the
    * scale-correct construction: one bounded extra job collecting
    * per-partition COUNTS (longs, not rows) to offset each partition's
    * local indexes — never a global window (a single-partition
    * row_number is the classic driver-shaped scale-killer the
    * CartesianGuard family rejects). Deterministic for a fixed file
    * layout; the mapping is data-sized but write-once per corpus
    * version (the [[graft.sources.ManifestTable]] pattern — commit it
    * next to the corpus and every draw reuses it). */
  def densifyIds(df: DataFrame, denseCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        denseCol, org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Bradley–Terry strength fit (Hunter 2004's MM iteration) over
    * decided pairwise outcomes, INTEGER-QUANTIZED so a fixed-round
    * run is bit-identical across engines and hash-matches a
    * recursive-CTE oracle — float MM drifts per summation order.
    *
    * Recurrence (skills π in micro-units, π_0 = 1_000_000):
    *   denom(a) = Σ_b (n_ab · 10¹²) div (π_a + π_b)
    *   raw(a)   = (w_a · 10¹²) div max(denom(a), 1)
    *   π'(a)    = max(raw(a) · 10⁶ div max(max_raw, 1), 1000)
    * The max-normalization each round pins the leader at 1e6 (BT is
    * scale-invariant, so this is a free choice of gauge) and the 1000
    * floor (0.1% of the leader) keeps every π strictly positive so
    * the next round's (π_a + π_b) divisors stay ≥ 2000 — which bounds
    * denom ≤ N_a · 5·10⁸ and raw ≤ 2·10⁶, keeping the whole
    * recurrence inside BIGINT for up to ~9·10⁶ comparisons per
    * entity (beyond that, pre-scale w and n by a common factor: the
    * MM step depends on them only through w/n ratios).
    *
    * Zero-win entities land on the floor; entities appearing in no
    * comparison are absent (the universe is the match participants).
    *
    * @param outcomes one row per decided comparison, columns
    *                 (winner, loser) — ties resolved by the caller
    * @param iterations fixed MM round budget (the
    *                 [[graft.etl.Graph.coreness]] contract: pick ≥
    *                 the convergence round; equality with the oracle
    *                 holds at any budget)
    * @return (entity, wins, matches, skill_micro) one row per entity
    */
  def bradleyTerry(outcomes: DataFrame, iterations: Int = 4): DataFrame = {
    val spark = outcomes.sparkSession
    import spark.implicits._
    // The ONLY data-sized job: raw comparisons → ordered-pair counts.
    val pairCounts: Array[(String, String, Long)] = outcomes
      .groupBy(col("winner").cast("string").as("w"),
        col("loser").cast("string").as("l"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)]
      .collect() // bounded: ≤ entities² rows (the sufficient statistic)
    val wins: Map[String, Long] = pairCounts
      .groupBy(_._1).map { case (e, xs) => e -> xs.map(_._3).sum }
      .withDefaultValue(0L)
    // symmetric per-pair totals, emitted per orientation
    val nPair: Map[(String, String), Long] = pairCounts
      .flatMap { case (w, l, n) => Seq((w, l) -> n, (l, w) -> n) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val entities: Seq[String] =
      pairCounts.flatMap(p => Seq(p._1, p._2)).distinct.sorted.toSeq
    if (entities.isEmpty) // no decided comparisons: empty fit, not a crash
      return Seq.empty[(String, Long, Long, Long)]
        .toDF("entity", "wins", "matches", "skill_micro")
    val opponents: Map[String, Seq[String]] = nPair.keys.toSeq
      .groupBy(_._1).map { case (a, ks) => a -> ks.map(_._2).sorted }
    var pi: Map[String, Long] = entities.map(_ -> 1000000L).toMap
    for (_ <- 1 to iterations) {
      val raw: Map[String, Long] = entities.map { a =>
        val denom = opponents(a).map { b =>
          (nPair((a, b)) * 1000000000000L) / math.max(pi(a) + pi(b), 1L)
        }.sum
        a -> (wins(a) * 1000000000000L) / math.max(denom, 1L)
      }.toMap
      val mx = math.max(raw.values.max, 1L)
      pi = raw.map { case (a, r) =>
        a -> math.max(r * 1000000L / mx, 1000L)
      }
    }
    val matches: Map[String, Long] = entities.map { a =>
      a -> opponents(a).map(b => nPair((a, b))).sum
    }.toMap
    entities.map(a => (a, wins(a), matches(a), pi(a)))
      .toDF("entity", "wins", "matches", "skill_micro")
  }
}
