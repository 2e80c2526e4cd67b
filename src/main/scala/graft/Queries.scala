package graft

/** The engine's query surface over the driver testdata
  * (`/root/testdata/sf*`), one named query per operator of SURVEY.md §2
  * plus the KPI layer (§2.7) and the LLM-data-pipeline extensions.
  *
  * Determinism contract (every oracled query hash-matches DuckDB):
  *  - double measures are summed as DECIMAL(18,2) — exact and
  *    shuffle-order-independent — then cast back to double;
  *  - averages are exact-decimal-sum / count so the float division is a
  *    single identical operation in both engines;
  *  - embedding math is quantized to BIGINT (floor(x*1000)) so dot
  *    products are exact integers in both engines;
  *  - every query ends in a total-order ORDER BY on non-null columns
  *    (Spark sorts nulls first, DuckDB last — so order keys must not be
  *    nullable);
  *  - no `round()` on raw doubles whose scale could produce decimal
  *    ties (Spark rounds half-up, DuckDB half-even);
  *  - engine-specific APPROXIMATE operators (xxhash64 LSH buckets,
  *    simhash chunks, IVF cells, HLL sketches) register their
  *    INVARIANTS as constant-0 oracle rows instead: zero false
  *    positives after independent recompute, pigeonhole completeness
  *    vs brute force, exact score fidelity, bounded estimate error —
  *    the properties a user of an approximate operator relies on,
  *    hash-gated like any exact query.
  */
object Queries {

  type Q = Qdsl.Q

  val all: Seq[Q] = Seq(
    QueriesCore.factEngagement, QueriesCore.dimMedia, QueriesCore.dimVisitor, QueriesCore.goldCast, QueriesCore.safeCast,
    QueriesCore.variantJson, QueriesCore.regexpExtract, QueriesCore.filterValid, QueriesCore.windowDedup, QueriesCore.dupGroups,
    QueriesCore.qualityReport,
    QueriesCore.validateNulls, QueriesCore.dqExpectations, QueriesCore.quarantineDeadletter, QueriesCore.limitSample, QueriesCore.unionIds,
    QueriesCore.csvRoundtrip, QueriesCore.orcRoundtrip, QueriesCore.manifestSnapshot, QueriesCore.manifestChanges, QueriesCore.manifestCountPushdown, QueriesCore.manifestDeleteRows, QueriesCore.manifestMergeRows,
    QueriesCore.manifestSync, QueriesCore.bucketedJoin, QueriesCore.manifestMetaQ,
    QueriesCore.manifestEvolutionQ,
    QueriesCore.deleteKeysQ, QueriesCore.schemaMerge, QueriesCore.upsertPartition,
    QueriesCore.mvIncrementalDaily, QueriesCore.mvIncrementalStats,
    QueriesCore.manifestCompact, QueriesCore.manifestPrune,
    QueriesCore.manifestCompactSorted, QueriesCore.retentionExpire,
    QueriesKpi.kpiTotalPlays, QueriesKpi.kpiAvgCompletion, QueriesKpi.kpiWatchHours, QueriesKpi.kpiEngagementRate,
    QueriesKpi.kpiByChannel, QueriesKpi.kpiDailyTrend, QueriesKpi.kpiVideoPerformance, QueriesKpi.kpiTopVideos,
    QueriesKpi.kpiByCountry, QueriesKpi.kpiNewVsReturning, QueriesKpi.kpiUniqueVisitors, QueriesKpi.kpiWowGrowth,
    QueriesKpi.kpiRetentionCurve, QueriesKpi.sketchDistinctUnion, QueriesKpi.sketchDistinctByGroup, QueriesKpi.sketchCmsCheck, QueriesKpi.sketchHeavyHitters,
    QueriesDedupSim.dedupExact, QueriesDedupSim.dedupMinhash, QueriesDedupSim.dedupSimhash, QueriesDedupSim.dedupMinhashPrecision,
    QueriesDedupSim.dedupSimhashInvariants, QueriesDedupSim.dedupMinhashFloor, QueriesDedupSim.dedupSimhashFloor,
    QueriesDedupSim.dedupMinhashCorpus,
    QueriesDedupSim.dedupNgramJaccard,
    QueriesDedupSim.dedupCorpus, QueriesDedupSim.dedupSurvivorQuality,
    QueriesDedupSim.dedupIncremental,
    QueriesDedupSim.dedupIncrementalBloom, QueriesDedupSim.dedupEmbedding,
    QueriesDedupSim.decontaminateSemantic,
    QueriesDedupSim.dedupEmbeddingLsh, QueriesDedupSim.dedupEmbeddingLshGate,
    QueriesDedupSim.dedupEmbeddingLshScaled,
    QueriesDedupSim.dedupMinhashScaled,
    QueriesDedupSim.dedupSemantic, QueriesDedupSim.dedupSemanticGate,
    QueriesDedupSim.simTopkBrute, QueriesDedupSim.simTopkAgg, QueriesDedupSim.simRangeSearch, QueriesDedupSim.simTopkInt8, QueriesDedupSim.simTopkLsh, QueriesDedupSim.simTopkIvf, QueriesDedupSim.simLshRecall,
    QueriesDedupSim.simScoreCheck, QueriesDedupSim.simLshRecallGate,
    QueriesDedupSim.simTopkLshHi, QueriesDedupSim.simTopkLshHiGate,
    QueriesDedupSim.simTopkIvfPq, QueriesDedupSim.simTopkIvfPqGate,
    QueriesDedupSim.embeddingInt8Check, QueriesDedupSim.embeddingCentroids, QueriesDedupSim.simKnnVote,
    QueriesDedupSim.embeddingPca, QueriesDedupSim.embeddingPcaGate,
    QueriesDedupSim.simEvalNdcg, QueriesDedupSim.mlLdaClassify,
    QueriesDedupSim.simMatryoshkaEval,
    QueriesDedupSim.fuzzyMatchBlocked,
    QueriesText.textTokenCount, QueriesText.textQualityProfile, QueriesText.textQualityGate,
    QueriesText.textRepetitionFilter, QueriesText.textLangId,
    QueriesText.textFingerprint, QueriesText.textRollingFp, QueriesText.textUnigramLogprob,
    QueriesText.textBigramLogprob,
    QueriesText.textLangConfusion, QueriesText.textNfcNormalize, QueriesText.textPiiScrub, QueriesText.sampleHashSplit,
    QueriesText.mixSources, QueriesText.docPack, QueriesText.corpusEpochShard, QueriesText.corpusCurate, QueriesText.textDecontaminate,
    QueriesText.shardRendezvous, QueriesText.shardRendezvousGate, QueriesText.corpusOverlapMatrix,
    QueriesText.corpusDomainCap, QueriesText.corpusUrlCanonical, QueriesText.prefBradleyTerry, QueriesText.dedupRepeatedSpans, QueriesText.kanonAudit, QueriesText.curriculumMix,
    QueriesText.chunkDocuments, QueriesText.stratifiedSample,
    QueriesText.sampleWeighted, QueriesText.bpePairCounts,
    QueriesText.bpeTrainMerges, QueriesText.bpeTrainGate, QueriesText.bpeEncode,
    QueriesText.featureHashing, QueriesText.bpeFertility,
    QueriesText.mixTemperature, QueriesText.mixTokenBudget,
    QueriesText.contrastiveNegatives,
    QueriesText.textPmiCollocations, QueriesText.vocabOovRate,
    QueriesText.qualityClassifier, QueriesText.qualityClassifierGate, QueriesDedupSim.dedupNeardupIncremental, QueriesDedupSim.embeddingDrift, QueriesDedupSim.simTopkPq, QueriesDedupSim.simTopkPqGate, QueriesDedupSim.simTopkPqServed, QueriesDedupSim.simTopkPqVersioned, QueriesDedupSim.retrievalPipeline, QueriesDedupSim.retrievalRrf, QueriesDedupSim.simIndexIncremental, QueriesDedupSim.corpusClusterSample, QueriesDedupSim.dedupContainment,
    QueriesText.textBm25, QueriesText.corpusDrift, QueriesText.corpusKsDrift, QueriesText.corpusDsirSelect, QueriesText.textVocabulary,
    QueriesText.multimodalMeta, QueriesText.multimodalDecode, QueriesText.multimodalFrames, QueriesText.multimodalPhashDedup, QueriesText.multimodalQualityGate,
    QueriesRelational.sessionBatch, QueriesRelational.sessionWindowBatch, QueriesRelational.kpiAbandonment, QueriesRelational.sessionPaths, QueriesRelational.funnelLatency, QueriesRelational.timeseriesInterpolate, QueriesRelational.funnel, QueriesRelational.funnel3, QueriesRelational.funnelWindowed, QueriesRelational.retention, QueriesRelational.textTfidf,
    QueriesRelational.skewSaltedJoin, QueriesRelational.skewReport, QueriesRelational.zorderKeyCheck, QueriesRelational.valueHistogram,
    QueriesRelational.setOps, QueriesRelational.semiAnti, QueriesRelational.fullOuterJoin, QueriesRelational.pivotFlagStatus, QueriesRelational.unpivotMeasures,
    QueriesRelational.rollupRegionNation, QueriesRelational.groupingSets, QueriesRelational.limitOffset, QueriesRelational.rangeWindowSum,
    QueriesRelational.cubeFlagStatus, QueriesRelational.statsExact,
    QueriesRelational.outlierIqr, QueriesRelational.statsQuantiles, QueriesRelational.statsQuantilesByGroup, QueriesRelational.statsMode, QueriesRelational.statsApproxCheck,
    QueriesRelational.asofJoin, QueriesRelational.intervalAttribution, QueriesRelational.movingAvg7d,
    QueriesRelational.customerDeciles, QueriesRelational.decilesApproxCheck, QueriesRelational.scd2Customer, QueriesRelational.windowRanks,
    QueriesRelational.dailySpine, QueriesRelational.corrScalarSubquery, QueriesRelational.lateralTopn,
    QueriesRelational.recursiveCteSpine, QueriesRelational.graphPagerank,
    QueriesRelational.graphHits, QueriesRelational.graphKcore,
    QueriesRelational.graphEdgesArtifact, QueriesRelational.graphKcoreServe, QueriesRelational.graphKcoreGate,
    QueriesRelational.graphHitsServe, QueriesRelational.graphPprServe, QueriesRelational.graphEdgesIncremental,
    QueriesRelational.graphKcoreIncremental,
    QueriesRelational.graphKcoreIncrementalDel,
    QueriesRelational.graphPpr, QueriesRelational.graphAssortativity, QueriesRelational.statsWeightedMedian,
    QueriesRelational.anomalyZscore, QueriesRelational.winsorizeClip,
    QueriesRelational.anomalyMad, QueriesRelational.statsLinfit,
    QueriesRelational.eventTransitions, QueriesRelational.eventCooccurrence,
    QueriesRelational.tableDiff, QueriesRelational.graphTriangles,
    QueriesRelational.ewmaValue, QueriesRelational.changepointCusum,
    QueriesRelational.journeyClassify, QueriesDedupSim.simTopkHamming,
    QueriesRelational.graphComponents, QueriesRelational.statsTtest,
    QueriesRelational.statsMannWhitney, QueriesRelational.statsKappa,
    QueriesKpi.sketchHllIntersect,
    QueriesRelational.statsChi2, QueriesRelational.graphBfsDepth,
    QueriesRelational.attributionPosition, QueriesRelational.attributionMarkov, QueriesDedupSim.simMmrRerank,
    QueriesRelational.priorityRevenue,
    QueriesRelational.regionalSupplierVolume,
    QueriesRelational.statsSpearman, QueriesRelational.graphLinkPredict,
    QueriesRelational.graphLabelProp, QueriesRelational.graphSssp,
    QueriesRelational.mapEventProfile,
    QueriesStreaming.streamDaily, QueriesStreaming.streamAnomaly, QueriesStreaming.streamSlidingCounts, QueriesStreaming.streamTopk, QueriesStreaming.streamSessions, QueriesStreaming.streamSessionsTws, QueriesStreaming.streamAttribution,
    QueriesStreaming.streamAttributionOuter, QueriesStreaming.streamAttributionFull,
    QueriesStreaming.streamAttributionDaily,
    QueriesStreaming.streamStaticEnrich, QueriesStreaming.streamDedup,
    QueriesStreaming.streamMvRefresh, QueriesStreaming.streamDedupCorpus,
    QueriesStreaming.streamManifestCdc,
    QueriesStreaming.graphCdcIncremental,
    QueriesStreaming.streamStateInspect,
    QueriesAnalytics.rollingActiveUsers, QueriesAnalytics.dqReferential,
    QueriesAnalytics.audienceOverlap, QueriesAnalytics.featureLags,
    QueriesAnalytics.rfmSegments, QueriesAnalytics.revenueLorenz,
    QueriesAnalytics.revenueGini, QueriesAnalytics.statsAcf,
    QueriesAnalytics.statsEntropy, QueriesAnalytics.basketLift,
    QueriesAnalytics.statsBenford, QueriesAnalytics.survivalKm,
    QueriesAnalytics.windowPercentiles, QueriesAnalytics.intervalConcurrency,
    QueriesAnalytics.dowSeasonality, QueriesAnalytics.seasonalAnomaly,
    QueriesAnalytics.statsBootstrapCi,
    QueriesAnalytics.recoItemItem, QueriesAnalytics.kpiCohortLtv,
    QueriesAnalytics.forecastHolt, QueriesAnalytics.recoUserTopn,
    QueriesAnalytics.forecastBacktest, QueriesAnalytics.mlAuc,
    QueriesAnalytics.mlCalibration, QueriesAnalytics.mlIsotonicCalibration,
    QueriesAnalytics.mlConformalQuantile,
    QueriesAnalytics.featureTargetEncoding,
    QueriesAnalytics.funnelSignificance, QueriesAnalytics.statsTheilsen,
    QueriesAnalytics.forecastHw, QueriesAnalytics.dpReleaseLaplace,
    QueriesAnalytics.anomalyForecastResidual,
    QueriesAnalytics.kpiStickiness, QueriesAnalytics.abCuped, QueriesAnalytics.abDid,
    QueriesAnalytics.sloBurnRate, QueriesAnalytics.kpiRepeatPurchase,
    QueriesAnalytics.recoEvalHitrate)
}

