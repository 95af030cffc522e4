package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Dedup, Graph, Multimodal, Similarity}
import graft.queries.{Analytics, IOQueries, Relational, TextQueries, TimeSeries}
import graft.streaming.Events

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every `queries` key pairs a Spark plan with (where deterministic) a
  * DuckDB `oracleSql` whose column names/order semantics match exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Query layer (Q1–Q15)
    "q_count" -> (Relational.qCount _),
    "q_limit" -> (Relational.qLimit _),
    "q_filter" -> (Relational.qFilter _),
    "q1_agg" -> (Relational.q1Agg _),
    "q_join" -> (Relational.qJoin _),
    "q_topk" -> (Relational.qTopK _),
    "q_daily" -> (Relational.qDaily _),
    "q_window" -> (Relational.qWindow _),
    "q_distinct" -> (Relational.qDistinct _),
    "q_having" -> (Relational.qHaving _),
    "q_case" -> (Relational.qCase _),
    "q_antijoin" -> (Relational.qAntiJoin _),
    "q_subquery" -> (Relational.qSubquery _),
    "q_setops" -> (Relational.qSetOps _),
    "q_sql" -> (Relational.qSql _),
    "q_sql_script" -> (Relational.qSqlScript _),
    "q_recursive" -> (Relational.qRecursive _),
    "q_lateral" -> (Relational.qLateral _),
    "q_rollup" -> (Relational.qRollup _),
    "q_cube" -> (Relational.qCube _),
    "q_quantiles" -> (Relational.qQuantiles _),
    "q_range_join" -> (Relational.qRangeJoin _),
    "q_grouping_sets" -> (Relational.qGroupingSets _),
    "q_stats" -> (Relational.qStats _),
    "q_lag" -> (Relational.qLag _),
    "q_exists" -> (Relational.qExists _),
    "t_pivot" -> (Relational.tPivot _),
    "t_sample_hash" -> ((s, d) => Relational.tSampleHash(s, d)),
    "t_stratified_sample" -> (Relational.tStratifiedSample _),
    "t_zorder" -> ((s, d) => Relational.tZorder(s, d)),
    "t_scd2" -> (Relational.tScd2 _),
    "q_ntile" -> (Relational.qNtile _),
    "q_outer_join" -> (Analytics.qOuterJoin _),
    "q_mode" -> (Analytics.qMode _),
    "q_native_sql" -> (Analytics.qNativeSql _),
    "t_unpivot" -> (Analytics.tUnpivot _),
    "dq_rules" -> (Analytics.dqRules _),
    "q_histogram" -> ((s, d) => Analytics.qHistogram(s, d)),
    "q_heavy_hitters" -> ((s, d) => Analytics.qHeavyHitters(s, d)),
    "q_mom" -> (Analytics.qMoM _),
    "q_ab_test" -> (Analytics.qAbTest _),
    "q_moments" -> (Analytics.qMoments _),
    "e_attribution" -> (Analytics.eAttribution _),
    "t_group_split" -> (TextQueries.tGroupSplit _),
    "t_target_encode" -> (Analytics.tTargetEncode _),
    "t_quantile_bin" -> ((s, d) => Analytics.tQuantileBin(s, d)),
    "q_aqe_skew" -> (Analytics.qAqeSkew _),
    "q_interval_join" -> (Analytics.qIntervalJoin _),
    "t_reconcile" -> (Analytics.tReconcile _),
    "e_time_to_convert" -> (Analytics.eTimeToConvert _),
    "t_profile" -> (Analytics.tProfile _),
    "e_transitions" -> (Analytics.eTransitions _),
    "e_gap_fill" -> (Analytics.eGapFill _),
    "q_bloom_semi" -> (Analytics.qBloomSemi _),
    // Q50: the same bloom pushdown applied AUTOMATICALLY by the
    // BloomJoinRewrite optimizer rule over a plain inner join
    "q_bloom_join_rule" -> (Analytics.qBloomJoinRule _),
    "q_heavy_hitters_sketch" -> ((s, d) => Analytics.qHeavyHittersSketch(s, d)),
    "q_rolling_distinct" -> ((s, d) => Analytics.qRollingDistinct(s, d)),
    // DataSketches HLL estimates are engine-specific → rows-only;
    // error vs the exact rolling distinct bounded in Round7Spec
    "q_rolling_distinct_hll" -> ((s, d) => Analytics.qRollingDistinctHll(s, d)),
    "q_rolling_7d" -> (Analytics.qRolling7d _),
    "q_rolling_median" -> (Analytics.qRollingMedian _),
    "q_skyline" -> (Relational.qSkyline _),
    "q_pit_join" -> (Relational.qPitJoin _),
    // HLL inclusion-exclusion overlap: sketch estimates are
    // engine-specific -> rows-only; error vs exact in Round9Spec/RECALL
    "q_overlap_sketch" -> (Analytics.qOverlapSketch _),
    "t_fuzzy_join" -> (Analytics.tFuzzyJoin _),
    "dedup_incremental" -> ((s, d) => Dedup.incrementalDedup(s, d)),
    "dedup_bloom_gate" -> ((s, d) => Dedup.bloomGate(s, d)),
    "t_global_ids" -> (Analytics.tGlobalIds _),
    "t_global_ids_native" -> (Analytics.tGlobalIdsNative _),
    "t_shuffle_hash" -> ((s, d) => Analytics.tShuffleHash(s, d)),
    "t_table_diff" -> (Analytics.tTableDiff _),
    "t_salted_join" -> ((s, d) => Analytics.tSaltedJoin(s, d)),
    "t_kanon" -> ((s, d) => Analytics.tKanon(s, d)),
    "t_pseudonym" -> ((s, d) => Analytics.tPseudonym(s, d)),
    // Transforms (T1–T4)
    "t_project_const" -> (Relational.tProjectConst _),
    "t_cast_rename" -> (Relational.tCastRename _),
    "t_nulls" -> (Relational.tNulls _),
    "t_dedup_key" -> (Relational.tDedupKey _),
    "t_dedup_key_rule" -> (Relational.tDedupKeyRule _),
    "t_salted_agg" -> ((s, d) => Relational.tSaltedAgg(s, d)),
    // HLL sketch variant of Q9 — fixed-size mergeable state, the
    // count-distinct to run at 100 TB. No SQL oracle (sketch estimates
    // are engine-specific) → rows-only check; exactness bound in spec.
    "q_distinct_approx" -> (Relational.approxDistinct _),
    // KLL/GK-sketch variant of Q18, same rationale → rows-only check
    "q_quantiles_approx" -> ((s, d) => Relational.qQuantilesApprox(s, d)),
    // Sources (S1–S4)
    "src_parquet" -> (IOQueries.srcParquet _),
    "src_csv" -> (IOQueries.srcCsv _),
    "src_json" -> (IOQueries.srcJson _),
    "src_autodetect" -> (IOQueries.srcAutodetect _),
    "src_schema_evolution" -> (IOQueries.srcSchemaEvolution _),
    "src_incremental" -> (IOQueries.srcIncremental _),
    // Sinks (K1–K5)
    "sink_modes" -> (IOQueries.sinkModes _),
    "sink_compress" -> (IOQueries.sinkCompress _),
    "sink_csv" -> (IOQueries.sinkCsv _),
    "sink_partitioned" -> (IOQueries.sinkPartitioned _),
    "sink_warehouse" -> (IOQueries.sinkWarehouse _),
    "sink_merge" -> (IOQueries.sinkMerge _),
    "sink_delete" -> (IOQueries.sinkDelete(_, _)),
    "sink_bloom_index" -> (IOQueries.sinkBloomIndex _),
    "sink_bucketed" -> (IOQueries.sinkBucketed _),
    "sink_orc" -> (IOQueries.sinkOrc _),
    "sink_compact" -> (IOQueries.sinkCompact _),
    "sink_versioned" -> (IOQueries.sinkVersioned _),
    "sink_sorted" -> (IOQueries.sinkSorted _),
    "sink_jdbc" -> (IOQueries.sinkJdbc _),
    "t_incr_rollup" -> ((s, d) => IOQueries.tIncrRollup(s, d)),
    "dq_schema_contract" -> (IOQueries.dqSchemaContract _),
    "sink_manifest" -> ((s, d) => IOQueries.sinkManifest(s, d)),
    "src_jsonl_corrupt" -> (IOQueries.srcJsonlCorrupt _),
    "src_csv_quoted" -> (IOQueries.srcCsvQuoted _),
    "src_fixed_width" -> (IOQueries.srcFixedWidth _),
    "src_jsonl_gz" -> (IOQueries.srcJsonlGz _),
    "g_clustering" -> ((s, d) => Graph.clusteringCoeff(s, d)),
    "sink_ttl" -> ((s, d) => IOQueries.sinkTtl(s, d)),
    "sink_vacuum" -> ((s, d) => IOQueries.sinkVacuum(s, d)),
    // K19: write-side schema evolution through the manifest commit;
    // no-rewrite + pinned-old-version + type-conflict-rejection are
    // spec-pinned in Round15Spec where the oracle can't reach
    "sink_schema_evolve" -> ((s, d) => IOQueries.sinkSchemaEvolve(s, d)),
    // K20: dynamic partition overwrite — no-rewrite of untouched
    // partitions is spec-pinned in Round15Spec
    "sink_dyn_overwrite" -> ((s, d) => IOQueries.sinkDynamicOverwrite(s, d)),
    // K21: manifest-planned OPTIMIZE; mechanics spec-pinned in Round15Spec
    "sink_optimize" -> ((s, d) => IOQueries.sinkOptimize(s, d)),
    // K22: zero-copy shallow clone; zero-data-write + source-isolation
    // spec-pinned in Round15Spec
    "sink_clone" -> ((s, d) => IOQueries.sinkClone(s, d)),
    "sink_cdf" -> ((s, d) => IOQueries.sinkCdf(s, d)),
    "sink_restore" -> ((s, d) => IOQueries.sinkRestore(s, d)),
    "sink_drop_column" -> ((s, d) => IOQueries.sinkDropColumn(s, d)),
    "sink_part_evolve" -> ((s, d) => IOQueries.sinkPartitionEvolve(s, d)),
    // K24: SQL time travel — graft_table('<base>', version) TVF over
    // the manifest lake (injectTableFunction extension rung)
    "sink_time_travel" -> ((s, d) => IOQueries.sinkTimeTravelSql(s, d)),
    // K29: DSv2 TableCatalog — CREATE/INSERT/SELECT/VERSION AS OF as
    // plain SQL over the manifest lake, one atomic version per INSERT
    // (commit/isolation/race semantics spec-pinned in Round20Spec)
    "sink_catalog_sql" -> ((s, d) => IOQueries.sinkCatalogSql(s, d)),
    // K30: SQL DELETE FROM through the catalog (K14's erasure,
    // one survivor-rewrite commit; pre-delete snapshot pinned)
    "sink_catalog_delete" -> ((s, d) => IOQueries.sinkCatalogDelete(s, d)),
    // K31: SQL ALTER TABLE ADD COLUMN through the catalog (K19's
    // evolution; old files null-fill, nothing rewritten)
    "sink_catalog_evolve" -> ((s, d) => IOQueries.sinkCatalogEvolve(s, d)),
    // E34: streaming ingest into the versioned lake, exactly-once via
    // txn-tagged manifest commits; every batch deliberately applied
    // twice — a failed guard doubles rows and breaks the oracle hash
    "e_stream_lake" -> ((s, d) => streaming.Events.streamLakeIngest(s, d)),
    // E30: streaming append whose mid-feed schema drift evolves the
    // lake through K19's commit across a checkpointed query restart
    "e_stream_evolve" -> ((s, d) => streaming.Events.streamEvolve(s, d)),
    // E31: event-time timers on the transformWithState surface;
    // result == batch gap sessionization (the oracle below)
    "e_stream_timer_sessions" -> ((s, d) => streaming.Events.streamTimerSessions(s, d)),
    // probabilistic LSH content → rows-only; monotone recall + floor
    // pinned in Round14Spec, every point recorded in RECALL
    "ann_lsh_sweep" -> ((s, d) => Similarity.lshSweep(s, d)),
    // A26: IVF nprobe sweep — probabilistic → rows-only; monotone
    // curve + top-point floor pinned in Round15Spec
    "ann_ivf_sweep" -> ((s, d) => Similarity.ivfSweep(s, d)),
    "src_logs" -> (IOQueries.srcLogs _),
    "src_json_multiline" -> (IOQueries.srcJsonMultiline _),
    "src_xml" -> (IOQueries.srcXml _),
    "t_incr_join" -> (IOQueries.tIncrJoin _),
    "q_dpp" -> (IOQueries.qDpp _),
    "p_dirty_partitions" -> ((s, d) => IOQueries.pDirtyPartitions(s, d)),
    "sink_wap" -> ((s, d) => IOQueries.sinkWap(s, d)),
    "sink_txn" -> ((s, d) => IOQueries.sinkTxn(s, d)),
    "dq_fk" -> (IOQueries.dqFk _),
    "src_fvecs" -> (IOQueries.srcFvecs _),
    "src_url" -> (IOQueries.srcUrl _),
    // Text analysis (X1–X4)
    "text_langid" -> (TextQueries.textLangid _),
    "text_quality" -> (TextQueries.textQuality _),
    "text_tokens" -> (TextQueries.textTokens _),
    "text_fingerprint" -> (TextQueries.textFingerprint _),
    "text_pii_redact" -> (TextQueries.textPiiRedact _),
    "text_encoding" -> (TextQueries.textEncoding _),
    "text_repetition" -> (TextQueries.textRepetition _),
    "text_tfidf" -> ((s, d) => TextQueries.textTfidf(s, d)),
    "text_bm25" -> ((s, d) => TextQueries.textBm25(s, d)),
    "text_pmi" -> ((s, d) => TextQueries.textPmi(s, d)),
    "text_entropy" -> ((s, d) => TextQueries.textEntropy(s, d)),
    "text_chunk" -> ((s, d) => TextQueries.textChunk(s, d)),
    "text_pack" -> ((s, d) => TextQueries.textPack(s, d)),
    "text_decontaminate" -> ((s, d) => TextQueries.textDecontaminate(s, d)),
    "text_mixture" -> (TextQueries.textMixture _),
    "text_topgrams" -> ((s, d) => TextQueries.textTopgrams(s, d)),
    "text_vocab" -> ((s, d) => TextQueries.textVocab(s, d)),
    "text_gopher_rules" -> (TextQueries.textGopherRules _),
    "text_surprisal" -> (TextQueries.textSurprisal _),
    "text_dsir" -> (TextQueries.textDsir _),
    "text_drift" -> ((s, d) => TextQueries.textDrift(s, d)),
    "text_bigram_surprisal" -> (TextQueries.textBigramSurprisal _),
    "text_heldout" -> (TextQueries.textHeldout _),
    // trained rule-distillation classifier: sigmoid doubles + xxhash64
    // buckets are unreplayable in SQL → rows-only; weight determinism
    // across partitionings + accuracy >= 0.9 pinned in Round8Spec
    "text_quality_model" -> ((s, d) => TextQueries.textQualityModel(s, d)),
    // BPE merge learning is iterative (driver-looped argmax rounds) —
    // not SQL-expressible → rows-only check; exactness pinned on a
    // hand-computed corpus in Round6Spec
    "text_bpe" -> ((s, d) => TextQueries.textBpe(s, d)),
    "text_bpe_apply" -> ((s, d) => TextQueries.textBpeApply(s, d)),
    // Deduplication (D1–D5)
    "dedup_exact" -> (Dedup.exact _),
    "dedup_delete_vectors" -> ((s, d) => Dedup.deleteVectors(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "dedup_minhash" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhashNearDup(s, d)),
    // LSH band candidates + exact cosine verify: probabilistic recall
    // → rows-only check; recall ≥ 0.95 vs the exact all-pairs form and
    // a no-cartesian plan assertion are pinned in Round8Spec
    "dedup_embedding" -> ((s, d) => Dedup.embeddingCosine(s, d)),
    "dedup_keep_best" -> ((s, d) => Dedup.keepBest(s, d)),
    "dedup_paragraph" -> (Dedup.paragraphDedup _),
    "dedup_substring" -> ((s, d) => Dedup.substringDedup(s, d)),
    "dedup_substring_remove" -> ((s, d) => Dedup.substringRemove(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.dedupClusters(s, d)),
    "dedup_quarantine" -> ((s, d) => Dedup.clusterQuarantine(s, d)),
    "dedup_cdc" -> ((s, d) => Dedup.cdcDedup(s, d)),
    "dedup_snm" -> ((s, d) => Dedup.snmDedup(s, d)),
    "dedup_cross_source" -> ((s, d) => Dedup.crossSourceMatrix(s, d)),
    "dedup_containment" -> ((s, d) => Dedup.containment(s, d)),
    "dedup_band_plan" -> ((s, d) => Dedup.bandPlan(s, d)),
    "text_rake" -> ((s, d) => TextQueries.textRake(s, d)),
    "text_langid_eval" -> (TextQueries.textLangidEval _),
    "e_funnel_window" -> ((s, d) => Analytics.funnelWindow(s, d)),
    "q_streaks" -> ((s, d) => Analytics.qStreaks(s, d)),
    "text_gram_decay" -> ((s, d) => TextQueries.textGramDecay(s, d)),
    "text_zipf" -> ((s, d) => TextQueries.textZipf(s, d)),
    "t_feature_asof" -> (Analytics.tFeatureAsof _),
    "t_neg_sample" -> ((s, d) => Analytics.negSample(s, d)),
    "t_purged_folds" -> ((s, d) => Analytics.tPurgedFolds(s, d)),
    "t_skew_advisor" -> ((s, d) => Analytics.tSkewAdvisor(s, d)),
    "emb_drift" -> (Similarity.embDrift _),
    "ann_knn_eval" -> ((s, d) => Similarity.knnLabelEval(s, d)),
    "t_fpe" -> (Analytics.tFpe _),
    "dq_observe" -> (Analytics.dqObserve _),
    "text_summary" -> (TextQueries.textSummary _),
    "g_kcore" -> ((s, d) => Graph.kcore(s, d)),
    "p_dag" -> (IOQueries.pDag _),
    "dedup_semantic" -> ((s, d) => Dedup.semanticDedup(s, d)),
    "dedup_semantic_sweep" -> ((s, d) => Dedup.semanticSweep(s, d)),
    // Graph analytics (G1–G2)
    "g_pagerank" -> ((s, d) => Graph.pageRank(s, d)),
    "g_triangles" -> ((s, d) => Graph.triangles(s, d)),
    "g_communities" -> ((s, d) => Graph.labelProp(s, d)),
    "g_ppr" -> ((s, d) => Graph.personalizedPageRank(s, d)),
    "g_jaccard" -> ((s, d) => Graph.jaccardPairs(s, d)),
    "g_adamic_adar" -> ((s, d) => Graph.adamicAdar(s, d)),
    "g_sssp" -> ((s, d) => Graph.sssp(s, d)),
    // G11: landmark harmonic centrality — one multi-source BFS with
    // (node, landmark) state; integer micro contract, CTE-replayed
    "g_closeness" -> ((s, d) => Graph.closeness(s, d)),
    "g_components" -> ((s, d) => Graph.components(s, d)),
    "ts_acf" -> ((s, d) => TimeSeries.acf(s, d)),
    "ts_mann_kendall" -> ((s, d) => TimeSeries.mannKendall(s, d)),
    "text_transfer" -> (TextQueries.textTransfer _),
    "ann_sq" -> ((s, d) => Similarity.sqAnn(s, d)),
    "ann_hamming" -> ((s, d) => Similarity.hammingAnn(s, d)),
    // A25: IVF+PQ composite (trained coarse + fine quantizers) →
    // rows-only; recall floor pinned in SimilaritySpec
    "ann_ivfpq" -> ((s, d) => Similarity.ivfpqAnn(s, d)),
    // binary-prefilter cascade: approximation by design → rows-only;
    // end-to-end recall floor pinned in Round14Spec
    "ann_cascade" -> ((s, d) => Similarity.cascadeAnn(s, d)),
    "q_mad_outliers" -> (Analytics.qMadOutliers _),
    "emb_matryoshka" -> ((s, d) => Similarity.embMatryoshka(s, d)),
    "ts_snaive" -> (TimeSeries.snaive _),
    "ts_decompose" -> (TimeSeries.decompose _),
    "ts_strength" -> (TimeSeries.seasonalStrength _),
    "ts_cusum" -> (TimeSeries.cusum _),
    "text_domain_cap" -> ((s, d) => TextQueries.textDomainCap(s, d)),
    "text_novelty" -> ((s, d) => TextQueries.textNovelty(s, d)),
    "text_phrase" -> ((s, d) => TextQueries.textPhrase(s, d)),
    "text_boilerplate" -> ((s, d) => TextQueries.textBoilerplate(s, d)),
    "t_feature_hash" -> ((s, d) => TextQueries.featureHash(s, d)),
    "t_weighted_sample" -> ((s, d) => Relational.tWeightedSample(s, d)),
    "ts_ewma" -> (TimeSeries.ewma _),
    // F13: Croston intermittent demand — size/interval smoothings over
    // demand events per part, truncated-weight exact per F4's contract
    "ts_croston" -> ((s, d) => TimeSeries.croston(s, d)),
    "ts_holt" -> (TimeSeries.holt _),
    "ts_periodogram" -> (TimeSeries.periodogram _),
    "ts_ols" -> (TimeSeries.ols _),
    "ts_residual_anomaly" -> (TimeSeries.residualAnomaly _),
    "ts_theil_sen" -> (TimeSeries.theilSen _),
    "q_winsorize" -> (Analytics.qWinsorize _),
    "t_impute" -> (Analytics.tImpute _),
    "t_scale" -> (Analytics.tScale _),
    "dq_completeness" -> ((s, d) => IOQueries.dqCompleteness(s, d)),
    "dq_ks_drift" -> (Analytics.dqKsDrift _),
    "q_mv_rewrite" -> (Analytics.qMvRewrite _),
    "q_assoc_rules" -> ((s, d) => Analytics.qAssocRules(s, d)),
    // Similarity search (A1–A3)
    "ann_bruteforce" -> ((s, d) => Similarity.bruteForceTopK(s, d)),
    "ann_range" -> ((s, d) => Similarity.rangeSearch(s, d)),
    "ann_mips" -> ((s, d) => Similarity.mipsTopK(s, d)),
    "ann_lsh" -> ((s, d) => Similarity.lshAnn(s, d)),
    "ann_ivf" -> ((s, d) => Similarity.ivfAnn(s, d)),
    "ann_knn_join" -> ((s, d) => Similarity.knnJoin(s, d)),
    "emb_rproj" -> ((s, d) => Similarity.embRproj(s, d)),
    // PQ codes + ADC are approximations by design → rows-only check;
    // recall vs the exact brute force is bounded in Round5Spec
    "ann_pq" -> ((s, d) => Similarity.pqAnn(s, d)),
    "ann_knn_lsh" -> ((s, d) => Similarity.knnJoinLsh(s, d)),
    // PCA's eigensolve depends on double summation order → rows-only
    // check; orthonormality/variance invariants pinned in Round6Spec
    "emb_pca" -> ((s, d) => Similarity.embPca(s, d)),
    "emb_whiten" -> ((s, d) => Similarity.embWhiten(s, d)),
    "emb_norm" -> (Similarity.embNorm _),
    "emb_decontaminate" -> ((s, d) => Similarity.embDecontaminate(s, d)),
    // k driver-looped argmax rounds → not SQL-expressible → rows-only;
    // exactness vs a driver-side greedy replay pinned in Round8Spec
    "emb_coreset" -> ((s, d) => Similarity.embCoreset(s, d)),
    // MMR re-rank: k data-dependent greedy rounds → rows-only;
    // driver-replay exactness pinned in Round13Spec
    "emb_mmr" -> ((s, d) => Similarity.embMmr(s, d)),
    // spherical k-means: iterative (driver-looped Lloyd rounds) with
    // float-cosine assignment — not SQL-expressible → rows-only;
    // driver-replay exactness + partitioning-invariance in Round9Spec
    "emb_kmeans" -> ((s, d) => Similarity.embKmeans(s, d)),
    "emb_quantize" -> (Similarity.embQuantize _),
    "emb_centroid" -> (Similarity.embCentroid _),
    // Multimodal (M1–M3)
    "mm_schema" -> (Multimodal.mmSchema _),
    "mm_dedup" -> (Multimodal.mmDedup _),
    "mm_block_dedup" -> (Multimodal.mmBlockDedup _),
    "mm_integrity" -> ((s, d) => Multimodal.mmIntegrity(s, d)),
    "mm_probe" -> (Multimodal.mmProbe _),
    "mm_entropy" -> (Multimodal.mmEntropy _),
    "mm_neardup" -> (Multimodal.mmNearDup _),
    "mm_features" -> (Multimodal.mmFeatures _),
    "mm_sample" -> ((s, d) => Multimodal.mmSample(s, d)),
    "mm_binary_files" -> ((s, d) => Multimodal.mmBinaryFiles(s, d)),
    "mm_shards" -> ((s, d) => Multimodal.mmShards(s, d)),
    // Events & streaming (E1–E4)
    "e_window_agg" -> (Events.windowAgg _),
    "e_sessionize" -> ((s, d) => Events.sessionize(s, d)),
    "e_session_window" -> ((s, d) => Events.sessionWindow(s, d)),
    "e_stream_parity" -> (Events.streamParity _),
    "e_stream_union" -> (Events.streamUnion _),
    "e_stream_dedup" -> (Events.streamDedup _),
    "e_stream_sessionize" -> ((s, d) => Events.streamSessionize(s, d)),
    "e_stream_sliding" -> (Events.streamSliding _),
    "e_asof_join" -> (Events.asofJoin _),
    "e_sliding_window" -> (Events.slidingWindow _),
    "e_json_extract" -> (Events.jsonExtract _),
    "e_json_variant" -> (Events.jsonVariant _),
    "e_stream_join" -> (Events.streamStreamJoin _),
    "e_stream_enrich" -> (Events.streamStaticEnrich _),
    "e_stream_asof" -> (Events.streamAsof _),
    "e_funnel" -> (Analytics.funnel _),
    "e_seq_pattern" -> (Analytics.eSeqPattern _),
    "e_retention" -> (Analytics.retention _),
    "e_anomaly" -> (Analytics.eAnomaly _),
    "e_stream_upsert" -> (Events.streamUpsert _),
    "e_stream_cdc" -> (Events.streamCdc _),
    "e_stream_outer_join" -> (Events.streamStreamOuterJoin _),
    "e_stream_resume" -> ((s, d) => Events.streamResume(s, d)),
    "e_stream_incr_rollup" -> (Events.streamIncrRollup _),
    // watermark-drop metrics come from StreamingQueryProgress, not SQL
    // → rows-only (fixed 4-row shape); exact drops pinned in Round7Spec
    "e_stream_late" -> (Events.streamLateData _),
    "e_stream_tws" -> (Events.streamTransformWithState _),
    "e_stream_quota" -> ((s, d) => Events.streamQuota(s, d)),
    // Pipeline orchestration (P1–P2)
    "p_flow_e2e" -> (IOQueries.flowE2E _),
    "p_corpus_e2e" -> ((s, d) => graft.pipeline.CorpusPipeline.corpusE2E(s, d)),
    "p_backfill" -> (IOQueries.pBackfill _),
    "p_flow_cache" -> (IOQueries.pFlowCache _),
    "p_parallel" -> (IOQueries.pParallel _)
  )

  /** DuckDB-dialect oracle SQL, same column names as the Spark plans. */
  def oracleSql: Map[String, String] = Map(
    "q_count" -> "SELECT count(*) AS cnt FROM lineitem",
    "q_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag
        |LIMIT 100""".stripMargin,
    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join" ->
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_topk" ->
      """SELECT c_custkey, c_name, round(sum(o_totalprice), 2) AS spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY spend DESC, c_custkey LIMIT 10""".stripMargin,
    "q_daily" ->
      """SELECT cast(ts AS date) AS d, event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_window" ->
      """SELECT o_custkey, o_orderkey, rnk, running_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER w AS rnk,
        |    round(sum(o_totalprice) OVER w, 2) AS running_spend
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps FROM lineitem""".stripMargin,
    "q_having" ->
      """SELECT l_partkey, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY l_partkey HAVING count(*) > 35
        |ORDER BY l_partkey""".stripMargin,
    "q_case" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS bigint) AS n_f,
        |  cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS bigint) AS n_o,
        |  cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS bigint) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_antijoin" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        |ORDER BY o_orderkey""".stripMargin,
    "q_subquery" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders o
        |JOIN (SELECT o_custkey AS k, avg(o_totalprice) AS cust_avg
        |      FROM orders GROUP BY 1) m ON o.o_custkey = m.k
        |WHERE o.o_totalprice > m.cust_avg
        |ORDER BY o_orderkey""".stripMargin,
    "q_setops" ->
      """SELECT tag, nk FROM (
        |  SELECT 'both' AS tag, nk FROM
        |    (SELECT c_nationkey AS nk FROM customer
        |     INTERSECT SELECT s_nationkey FROM supplier)
        |  UNION ALL
        |  SELECT 'cust_only' AS tag, nk FROM
        |    (SELECT c_nationkey AS nk FROM customer
        |     EXCEPT SELECT s_nationkey FROM supplier)
        |) ORDER BY tag, nk""".stripMargin,
    "q_sql" ->
      """SELECT r_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q_quantiles" ->
      """SELECT l_returnflag,
        |  round(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p25,
        |  round(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p50,
        |  round(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p75,
        |  round(percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice), 2) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  (0, 0, 100000), (1, 100000, 200000), (2, 200000, 300000),
        |  (3, 300000, 400000), (4, 400000, 500000), (5, 500000, 1e18))
        |SELECT band, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY rf, ls""".stripMargin,
    "q_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        |  round(stddev_samp(l_extendedprice), 2) AS price_stddev,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_lag" ->
      """SELECT o_custkey, o_orderkey, days_since_prev FROM (
        |  SELECT o_custkey, o_orderkey,
        |    date_diff('day',
        |      CAST(lag(o_orderdate) OVER w AS DATE),
        |      CAST(o_orderdate AS DATE)) AS days_since_prev
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |) WHERE days_since_prev IS NOT NULL
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_exists" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "t_sample_hash" ->
      """SELECT l_returnflag, count(*) AS n_sampled, round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |WHERE (CAST(l_orderkey AS BIGINT) * 2654435761
        |     + CAST(l_linenumber AS BIGINT) * 40503) % 4294967296 % 20 = 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "t_zorder" -> {
      val terms = (0 until 10).map(b =>
        s"(((x >> $b) & 1) << ${2 * b}) + (((y >> $b) & 1) << ${2 * b + 1})")
        .mkString(" + ")
      s"""WITH d AS (
         |  SELECT (CAST(o_custkey AS BIGINT) % 1024) AS x,
         |    (CAST(floor(o_totalprice / 1000) AS BIGINT) % 1024) AS y
         |  FROM orders
         |), z AS (
         |  SELECT x, y, ($terms) AS zkey FROM d
         |)
         |SELECT (zkey >> 12) AS bucket, count(*) AS n,
         |  min(x) AS min_cust, max(x) AS max_cust,
         |  min(y) AS min_band, max(y) AS max_band
         |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin
    },
    "t_scd2" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderstatus AS status, o_orderdate, o_orderkey,
        |    lag(o_orderstatus) OVER w AS prev
        |  FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |), chg AS (
        |  SELECT o_custkey, status, o_orderdate, o_orderkey
        |  FROM o WHERE prev IS NULL OR prev <> status
        |)
        |SELECT o_custkey,
        |  CAST(row_number() OVER w2 AS INT) AS version,
        |  status,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w2 AS valid_to,
        |  (lead(o_orderdate) OVER w2 IS NULL) AS is_current
        |FROM chg WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,
    "t_stratified_sample" ->
      """SELECT o_orderstatus, count(*) AS n_sampled,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE (CAST(o_orderkey AS BIGINT) * 2654435761) % 4294967296
        |  % (CASE WHEN o_orderstatus = 'F' THEN 10
        |          WHEN o_orderstatus = 'O' THEN 20 ELSE 2 END) = 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_ntile" ->
      """WITH spend AS (
        |  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
        |  FROM orders GROUP BY 1
        |), ranked AS (
        |  SELECT spend, ntile(10) OVER (ORDER BY spend, o_custkey) AS decile
        |  FROM spend
        |)
        |SELECT decile, count(*) AS n_customers,
        |  round(min(spend), 2) AS min_spend, round(max(spend), 2) AS max_spend
        |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin,
    "src_schema_evolution" ->
      """SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderstatus
        |            ELSE 'PRE_EVOLUTION' END AS status,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,
    "src_incremental" ->
      """SELECT year(o_orderdate) AS yr, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, toks,
        |    unnest(range(0, CAST(floor((len(toks) - 1) / 48) AS BIGINT) + 1)) AS chunk_idx
        |  FROM t
        |)
        |SELECT doc_id, chunk_idx,
        |  CAST(len(toks[chunk_idx * 48 + 1 : chunk_idx * 48 + 64]) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(toks[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_outer_join" ->
      """WITH cust AS (
        |  SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer GROUP BY 1
        |), supp AS (
        |  SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier
        |  WHERE s_acctbal < 0 GROUP BY 1
        |)
        |SELECT coalesce(nk_c, nk_s) AS nationkey,
        |  cast(coalesce(n_cust, 0) AS bigint) AS n_cust,
        |  cast(coalesce(n_supp, 0) AS bigint) AS n_supp
        |FROM cust FULL JOIN supp ON nk_c = nk_s
        |ORDER BY nationkey""".stripMargin,
    "q_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |  FROM orders GROUP BY 1, 2
        |), r AS (
        |  SELECT o_orderstatus, o_orderpriority,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY n DESC, o_orderpriority) AS rk
        |  FROM c
        |)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority
        |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,
    "q_native_sql" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(
        |    list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |    list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 20 AND b.vec_id < 20
        |ORDER BY id_a, id_b""".stripMargin,
    "t_unpivot" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "dq_rules" ->
      """WITH rules AS (
        |  SELECT 'null_quantity' AS rule,
        |    cast(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'range_quantity',
        |    cast(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS bigint)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'dup_pk', cast(coalesce(sum(n - 1), 0) AS bigint)
        |  FROM (SELECT count(*) AS n FROM lineitem
        |        GROUP BY l_orderkey, l_linenumber) WHERE n > 1
        |  UNION ALL
        |  SELECT 'orphan_lineitem', cast(count(*) AS bigint)
        |  FROM lineitem WHERE NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |)
        |SELECT rule, n_violations, n_violations = 0 AS pass
        |FROM rules ORDER BY rule""".stripMargin,
    "e_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), v AS (
        |  SELECT user_id, min(us) AS v_us FROM e
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(us) AS c_us FROM e
        |  JOIN v ON e.user_id = v.user_id AND us > v_us
        |  WHERE event_type = 'click' GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(us) AS p_us FROM e
        |  JOIN c ON e.user_id = c.user_id AND us > c_us
        |  WHERE event_type = 'purchase' GROUP BY 1
        |)
        |SELECT '1_view' AS stage, cast(count(*) AS bigint) AS n_users FROM v
        |UNION ALL
        |SELECT '2_click_after_view', cast(count(*) AS bigint) FROM c
        |UNION ALL
        |SELECT '3_purchase_after_click', cast(count(*) AS bigint) FROM p
        |ORDER BY stage""".stripMargin,
    "e_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
        |), coh AS (
        |  SELECT user_id, min(d) AS cohort_d FROM act GROUP BY 1
        |)
        |SELECT cohort_d,
        |  cast(count(DISTINCT a.user_id) AS bigint) AS n_users,
        |  cast(count(DISTINCT CASE WHEN d = cohort_d + 1 THEN a.user_id END) AS bigint) AS d1_retained,
        |  cast(count(DISTINCT CASE WHEN d = cohort_d + 7 THEN a.user_id END) AS bigint) AS d7_retained
        |FROM act a JOIN coh ON a.user_id = coh.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 60000.0) AS BIGINT) AS bucket,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_heavy_hitters" ->
      """WITH t AS (SELECT count(*) AS total FROM lineitem)
        |SELECT l_partkey, count(*) AS n, (SELECT total FROM t) AS total
        |FROM lineitem GROUP BY l_partkey
        |HAVING count(*) * 1500 > (SELECT total FROM t)
        |ORDER BY l_partkey""".stripMargin,
    // CMS prefilter + exact verify ≡ the exact heavy-hitters query —
    // the sketch only changes the plan, never the result
    "q_heavy_hitters_sketch" ->
      """WITH t AS (SELECT count(*) AS total FROM lineitem)
        |SELECT l_partkey, count(*) AS n, (SELECT total FROM t) AS total
        |FROM lineitem GROUP BY l_partkey
        |HAVING count(*) * 1500 > (SELECT total FROM t)
        |ORDER BY l_partkey""".stripMargin,
    "q_mom" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    round(sum(o_totalprice), 2) AS total
        |  FROM orders GROUP BY 1
        |), l AS (
        |  SELECT month, total, lag(total) OVER (ORDER BY month) AS prev_total FROM m
        |)
        |SELECT month, total, prev_total,
        |  CASE WHEN prev_total IS NOT NULL
        |    THEN CAST(round((total - prev_total) / prev_total * 1e6) AS BIGINT)
        |  END AS delta_micro
        |FROM l ORDER BY month""".stripMargin,
    // Welch's t between the two user-parity cohorts, formula replayed
    // verbatim (var_samp in both engines)
    "q_ab_test" ->
      """WITH p AS (
        |  SELECT user_id % 2 AS variant, value FROM events
        |  WHERE event_type = 'purchase'
        |), s AS (
        |  SELECT variant, cast(count(*) AS bigint) AS n, avg(value) AS m,
        |    var_samp(value) AS v
        |  FROM p GROUP BY 1
        |)
        |SELECT a.n AS n_a, b.n AS n_b,
        |  round(a.m - b.m, 4) AS mean_diff,
        |  round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat,
        |  abs((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n)) > 1.96 AS significant
        |FROM s a, s b WHERE a.variant = 0 AND b.variant = 1""".stripMargin,
    // leave-one-out encode (sum-x)/(n-1) replayed per row, then the
    // same per-category summary
    "t_target_encode" ->
      """WITH stats AS (
        |  SELECT o_orderpriority, sum(o_totalprice) AS cat_sum,
        |    cast(count(*) AS bigint) AS cat_n
        |  FROM orders GROUP BY 1
        |), enc AS (
        |  SELECT o.o_orderpriority,
        |    (s.cat_sum - o.o_totalprice) / (s.cat_n - 1) AS loo_enc
        |  FROM orders o JOIN stats s USING (o_orderpriority)
        |)
        |SELECT o_orderpriority, cast(count(*) AS bigint) AS n,
        |  round(avg(loo_enc), 2) AS enc_avg,
        |  round(min(loo_enc), 2) AS enc_min,
        |  round(max(loo_enc), 2) AS enc_max
        |FROM enc GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    // same window (total order on ts_ns, event_id), same 7-day nanos
    // expiry, IGNORE NULLS carrying the latest prior touch
    "e_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, value, epoch_ns(ts) AS tns,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |                    THEN epoch_ns(ts) END IGNORE NULLS)
        |      OVER w AS touch_ts,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |                    THEN event_type END IGNORE NULLS)
        |      OVER w AS touch_type
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |)
        |SELECT CASE WHEN touch_type IS NULL
        |            OR tns - touch_ts > 604800000000000 THEN 'none'
        |            ELSE touch_type END AS channel,
        |  cast(count(*) AS bigint) AS n_purchases,
        |  round(sum(value), 2) AS revenue
        |FROM e WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,
    // identical md5-prefix bucket arithmetic: split is a pure function
    // of source, so cross-split leakage is structurally impossible
    "t_group_split" ->
      """WITH d AS (
        |  SELECT *, substr(md5('split2:' || source), 1, 2) AS b FROM documents
        |)
        |SELECT CASE WHEN b < 'cc' THEN 'train'
        |            WHEN b < 'e6' THEN 'val' ELSE 'test' END AS split,
        |  cast(count(*) AS bigint) AS n_docs,
        |  cast(count(DISTINCT source) AS bigint) AS n_sources,
        |  cast(sum(n_chars) AS bigint) AS total_chars
        |FROM d GROUP BY 1 ORDER BY split""".stripMargin,
    // identical window frame, identical double-assembly order over
    // exact HUGEINT window sums
    "ts_ols" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), idx AS (
        |  SELECT d, y, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
        |  FROM daily
        |), s AS (
        |  SELECT d, y, t,
        |    count(*) OVER w AS n,
        |    sum(CAST(y AS HUGEINT)) OVER w AS sy,
        |    sum(CAST(t * y AS HUGEINT)) OVER w AS sty,
        |    sum(CAST(t AS HUGEINT)) OVER w AS st,
        |    sum(CAST(t * t AS HUGEINT)) OVER w AS st2
        |  FROM idx
        |  WINDOW w AS (ORDER BY t ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING)
        |), f AS (
        |  SELECT d, y, t, n,
        |    (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
        |       - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(st2 AS DOUBLE)
        |       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS slope,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
        |    CAST(t AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS tdev
        |  FROM s WHERE n >= 8
        |)
        |SELECT d, y AS y_micro,
        |  CAST(round(slope) AS BIGINT) AS slope_micro_per_day,
        |  CAST(round(ybar + slope * tdev) AS BIGINT) AS forecast_micro,
        |  abs(y - CAST(round(ybar + slope * tdev) AS BIGINT)) AS abs_err_micro
        |FROM f ORDER BY d""".stripMargin,
    // same two-pass shape, exact integer-second latencies, discrete
    // percentiles (actual elements — engine-identical)
    "e_time_to_convert" ->
      """WITH fv AS (
        |  SELECT user_id, min(epoch_ns(ts)) AS tv
        |  FROM events WHERE event_type = 'view' GROUP BY 1
        |), conv AS (
        |  SELECT e.user_id, min(fv.tv) AS tv, min(epoch_ns(e.ts)) AS tp
        |  FROM events e JOIN fv ON e.user_id = fv.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= fv.tv
        |  GROUP BY 1
        |), d AS (
        |  SELECT strftime(make_timestamp(tv // 1000), '%Y-%m') AS cohort,
        |    (tp - tv) // 1000000000 AS delta_s
        |  FROM conv
        |)
        |SELECT cohort, cast(count(*) AS bigint) AS n_converted,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY delta_s) AS BIGINT) AS median_s,
        |  CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY delta_s) AS BIGINT) AS p90_s
        |FROM d GROUP BY 1 ORDER BY cohort""".stripMargin,
    // identical per-line micro-rounding + integer bucket arithmetic
    "t_reconcile" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
        |      * (1.0 + l_tax) * 1e6) AS BIGINT)) AS BIGINT) AS li_micro
        |  FROM lineitem GROUP BY 1
        |), o AS (
        |  SELECT o_orderkey, CAST(round(o_totalprice * 1e6) AS BIGINT) AS o_micro
        |  FROM orders
        |), j AS (
        |  SELECT o_micro, li_micro, o_micro - li_micro AS drift,
        |    CASE WHEN li_micro IS NULL THEN '1_header_without_lines'
        |         WHEN o_micro IS NULL THEN '2_lines_without_header'
        |         WHEN abs(o_micro - li_micro) * 100 <= o_micro THEN '3_drift_within_1pct'
        |         ELSE '4_drift_over_1pct' END AS bucket
        |  FROM o FULL OUTER JOIN li ON o_orderkey = l_orderkey
        |)
        |SELECT bucket, cast(count(*) AS bigint) AS n,
        |  cast(sum(coalesce(drift, 0)) AS bigint) AS drift_micro_total
        |FROM j GROUP BY 1 ORDER BY bucket""".stripMargin,
    // the oracle joins the RAW theta form — the banded equi-join plan
    // must lose and double nothing
    "q_interval_join" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS tns, CAST(ts AS DATE) AS d FROM events
        |), a AS (
        |  SELECT user_id, d, min(tns) AS a_lo, max(tns) AS a_hi
        |  FROM e GROUP BY 1, 2
        |), b AS (
        |  SELECT d AS wd,
        |    epoch_ns(CAST(d AS TIMESTAMP)) + 18::BIGINT * 3600 * 1000000000 AS b_lo,
        |    epoch_ns(CAST(d AS TIMESTAMP)) + 30::BIGINT * 3600 * 1000000000 AS b_hi
        |  FROM (SELECT DISTINCT d FROM e)
        |  WHERE datediff('day', DATE '1970-01-01', d) % 3 = 0
        |)
        |SELECT wd, cast(count(*) AS bigint) AS n_user_days,
        |  cast(sum(least(a_hi, b_hi) - greatest(a_lo, b_lo)) AS bigint)
        |    AS overlap_total_ns
        |FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi
        |GROUP BY 1 ORDER BY wd""".stripMargin,
    // skew_handled pinned TRUE: the correctness gate fails if AQE's
    // OptimizeSkewedJoin ever stops firing on the hot key
    "q_aqe_skew" ->
      """WITH f AS (
        |  SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 0
        |              ELSE 1 + l_orderkey % 19 END AS k, l_quantity
        |  FROM lineitem
        |), d AS (
        |  SELECT o_orderkey % 20 AS k2, round(sum(o_totalprice), 2) AS k_total
        |  FROM orders GROUP BY 1
        |)
        |SELECT k, cast(count(*) AS bigint) AS n,
        |  round(sum(l_quantity), 2) AS qty, max(k_total) AS k_total,
        |  true AS skew_handled
        |FROM f JOIN d ON k = k2 GROUP BY k ORDER BY k""".stripMargin,
    // same percentile_disc cuts, same right-closed bin arithmetic
    "t_quantile_bin" -> {
      val qs = (1 until 10).map(i => i / 10.0)
      s"""WITH p AS (
         |  SELECT CAST(round(o_totalprice * 1e6) AS BIGINT) AS v FROM orders
         |), a AS (
         |  SELECT quantile_cont(v, [${qs.mkString(", ")}]) AS cuts FROM p
         |)
         |SELECT CAST(len(list_filter(cuts, x -> v >= x)) AS INTEGER) AS bin,
         |  CAST(count(*) AS BIGINT) AS n,
         |  min(v) AS min_micro, max(v) AS max_micro,
         |  CAST(round(CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) / count(*)) AS BIGINT)
         |    AS mean_micro
         |FROM p, a GROUP BY 1 ORDER BY bin""".stripMargin
    },
    // the closing double formula is THE SAME generated text as the
    // Spark side (Analytics.momentExprs) over the same exact integer
    // power sums — IEEE-correctly-rounded ops only, so bit-identical
    "q_moments" -> {
      val sums = Seq("q", "p", "d").flatMap(c => Seq(
        s"sum($c) AS ${c}1", s"sum($c*$c) AS ${c}2",
        s"sum($c*$c*$c) AS ${c}3", s"sum($c*$c*$c*$c) AS ${c}4"))
        .mkString(", ")
      def sel(name: String, c: String) =
        s"SELECT '$name' AS col_name, n, " +
          Analytics.momentExprs(c).mkString(", ") + " FROM s"
      s"""WITH c AS (
         |  SELECT CAST(round(l_quantity*100, 0) AS HUGEINT) AS q,
         |    CAST(round(l_extendedprice*100, 0) AS HUGEINT) AS p,
         |    CAST(round(l_discount*100, 0) AS HUGEINT) AS d
         |  FROM lineitem
         |), s AS (
         |  SELECT $sums, CAST(count(*) AS BIGINT) AS n FROM c
         |)
         |${sel("l_quantity", "q")}
         |UNION ALL ${sel("l_extendedprice", "p")}
         |UNION ALL ${sel("l_discount", "d")}
         |ORDER BY col_name""".stripMargin
    },
    "t_profile" ->
      """WITH s AS (
        |  SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |    cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_nulls,
        |    count(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(min(o_orderkey) AS VARCHAR) AS min_s,
        |    CAST(max(o_orderkey) AS VARCHAR) AS max_s
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', count(*),
        |    cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS bigint),
        |    count(DISTINCT o_custkey),
        |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*),
        |    cast(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS bigint),
        |    count(DISTINCT o_orderstatus),
        |    CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*),
        |    cast(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS bigint),
        |    count(DISTINCT o_totalprice),
        |    CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', count(*),
        |    cast(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS bigint),
        |    count(DISTINCT o_orderdate),
        |    CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
        |  FROM orders
        |)
        |SELECT * FROM s ORDER BY col_name""".stripMargin,
    "e_transitions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tns, event_type FROM events
        |), x AS (
        |  SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS from_type
        |  FROM e
        |)
        |SELECT from_type, to_type, count(*) AS n FROM x
        |WHERE from_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,
    "q_rolling_7d" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, round(sum(o_totalprice), 2) AS day_total
        |  FROM orders GROUP BY 1
        |)
        |SELECT d, day_total,
        |  round(sum(day_total) OVER (ORDER BY d
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2) AS rolling_7d
        |FROM daily ORDER BY d""".stripMargin,
    "q_rolling_median" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS day_micro
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, d, day_micro,
        |  median(day_micro) OVER (PARTITION BY event_type ORDER BY d
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS med7_micro
        |FROM daily ORDER BY event_type, d""".stripMargin,
    "q_skyline" ->
      """SELECT p_partkey, p_size, p_retailprice FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_size <= a.p_size AND b.p_retailprice <= a.p_retailprice
        |    AND (b.p_size < a.p_size OR b.p_retailprice < a.p_retailprice))
        |ORDER BY p_size, p_partkey""".stripMargin,
    // Q52: the SCD2 build is replayed inline (lag-filter-lead, T17's
    // exact window order), then facts resolve by key-equi + range
    "q_pit_join" ->
      """WITH ch AS (
        |  SELECT o_custkey, o_orderstatus AS status, o_orderdate, o_orderkey,
        |    lag(o_orderstatus) OVER
        |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders
        |), v AS (
        |  SELECT o_custkey, status, o_orderdate AS valid_from,
        |    lead(o_orderdate) OVER
        |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM ch WHERE prev IS NULL OR prev <> status
        |)
        |SELECT v.status, CAST(count(*) AS BIGINT) AS n,
        |  round(sum(l.l_extendedprice), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN v ON o.o_custkey = v.o_custkey
        |  AND l.l_shipdate >= v.valid_from
        |  AND (v.valid_to IS NULL OR l.l_shipdate < v.valid_to)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t_fuzzy_join" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |typos AS (
        |  SELECT concat(
        |    substr(name, 1, CAST(floor((length(name) + 1) / 2) AS INT) - 1),
        |    substr(name, CAST(floor((length(name) + 1) / 2) AS INT) + 1)) AS name
        |  FROM names WHERE length(name) % 3 = 0
        |), vocab AS (SELECT name FROM names UNION SELECT name FROM typos)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM vocab a JOIN vocab b
        |  ON a.name < b.name AND levenshtein(a.name, b.name) <= 1
        |ORDER BY name_a, name_b""".stripMargin,
    "q_bloom_semi" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // Q50: the bloom is a pre-filter only — the exact inner join
    // defines the result, so the oracle is the plain join
    "q_bloom_join_rule" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal > 9000
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "dedup_incremental" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), d AS (SELECT doc_id, md5(norm) AS h, toks FROM t),
        |base AS (SELECT * FROM d WHERE doc_id < 400),
        |delta AS (SELECT * FROM d WHERE doc_id >= 400),
        |exact AS (
        |  SELECT delta.doc_id, min(base.doc_id) AS match_id
        |  FROM delta JOIN base ON delta.h = base.h GROUP BY 1
        |),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM d WHERE len(toks) >= 3
        |),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |restsh AS (SELECT * FROM sh WHERE doc_id >= 400
        |           AND doc_id NOT IN (SELECT doc_id FROM exact)),
        |basesh AS (SELECT * FROM sh WHERE doc_id < 400),
        |inter AS (
        |  SELECT r.doc_id AS d_id, b.doc_id AS b_id, count(*) AS i
        |  FROM restsh r JOIN basesh b ON r.shingle = b.shingle
        |  GROUP BY 1, 2
        |),
        |near AS (
        |  SELECT d_id AS doc_id, min(b_id) AS match_id
        |  FROM inter
        |  JOIN sizes sd ON d_id = sd.doc_id
        |  JOIN sizes sb ON b_id = sb.doc_id
        |  WHERE round(i / (sd.sz + sb.sz - i), 4) >= 0.5
        |  GROUP BY 1
        |),
        |dup AS (
        |  SELECT doc_id, 'exact_dup' AS verdict, match_id FROM exact
        |  UNION ALL SELECT doc_id, 'near_dup', match_id FROM near
        |)
        |SELECT delta.doc_id, coalesce(verdict, 'new') AS verdict, match_id
        |FROM delta LEFT JOIN dup ON delta.doc_id = dup.doc_id
        |ORDER BY delta.doc_id""".stripMargin,
    // the bloom is a prefilter only — exact verify makes the output
    // identical to plain hash membership, which is what the oracle runs
    "dedup_bloom_gate" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS h
        |  FROM documents
        |), base AS (SELECT * FROM d WHERE doc_id < 400),
        |delta AS (SELECT * FROM d WHERE doc_id >= 400
        |          UNION ALL
        |          SELECT -doc_id - 1, h FROM base WHERE doc_id % 50 = 0),
        |verified AS (
        |  SELECT delta.doc_id, min(base.doc_id) AS match_id
        |  FROM delta JOIN base ON delta.h = base.h GROUP BY 1
        |)
        |SELECT delta.doc_id,
        |  CASE WHEN match_id IS NOT NULL THEN 'dup' ELSE 'new' END AS verdict,
        |  match_id
        |FROM delta LEFT JOIN verified ON delta.doc_id = verified.doc_id
        |ORDER BY delta.doc_id""".stripMargin,
    "e_gap_fill" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), b AS (
        |  SELECT min(date_trunc('hour', ts)) AS mn, max(date_trunc('hour', ts)) AS mx
        |  FROM events
        |), cal AS (
        |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b
        |), t AS (SELECT DISTINCT event_type AS et FROM events)
        |SELECT t.et AS event_type, epoch_us(cal.h) AS hour_us,
        |  cast(coalesce(n, 0) AS bigint) AS n
        |FROM t CROSS JOIN cal
        |LEFT JOIN hourly ON t.et = hourly.event_type AND cal.h = hourly.h
        |ORDER BY event_type, hour_us""".stripMargin,
    "text_topgrams" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks), 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1])))) AS gram
        |  FROM t WHERE len(toks) >= 2
        |)
        |SELECT gram, count(*) AS n_docs FROM g GROUP BY 1
        |ORDER BY n_docs DESC, gram LIMIT 20""".stripMargin,
    "dedup_semantic" ->
      """WITH seeds AS (
        |  SELECT vec_id AS seed_id, embedding AS seed_emb FROM embeddings WHERE vec_id < 8
        |), sims AS (
        |  SELECT e.vec_id, s.seed_id,
        |    round(list_cosine_similarity(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(s.seed_emb, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings e CROSS JOIN seeds s
        |), a AS (
        |  SELECT vec_id, seed_id AS cluster_id, sim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, seed_id) AS rk
        |  FROM sims
        |), asg AS (
        |  SELECT vec_id, cluster_id, sim FROM a WHERE rk = 1
        |), k AS (
        |  SELECT vec_id, cluster_id, sim,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY sim DESC, vec_id) AS krk
        |  FROM asg
        |)
        |SELECT cluster_id, cast(count(*) AS bigint) AS n_members,
        |  min(CASE WHEN krk = 1 THEN vec_id END) AS keep_id,
        |  min(CASE WHEN krk = 1 THEN sim END) AS keep_sim
        |FROM k GROUP BY 1 ORDER BY cluster_id""".stripMargin,
    // SemDeDup ε sweep: D9's assignment + keeper rehydration, micro
    // thresholds compared through bit-equal 4-dp doubles
    "dedup_semantic_sweep" ->
      """WITH seeds AS (
        |  SELECT vec_id AS seed_id, embedding AS seed_emb FROM embeddings WHERE vec_id < 8
        |), sims AS (
        |  SELECT e.vec_id, s.seed_id,
        |    round(list_cosine_similarity(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(s.seed_emb, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings e CROSS JOIN seeds s
        |), a AS (
        |  SELECT vec_id, seed_id AS cluster_id, sim,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, seed_id) AS rk
        |  FROM sims
        |), k2 AS (
        |  SELECT vec_id, cluster_id, sim,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY sim DESC, vec_id) AS krk
        |  FROM a WHERE rk = 1
        |), keep AS (
        |  SELECT cluster_id, vec_id AS keep_id FROM k2 WHERE krk = 1
        |), simk AS (
        |  SELECT m.vec_id, kp.keep_id,
        |    round(list_cosine_similarity(
        |      list_transform(em.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(ek.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim_keep
        |  FROM k2 m JOIN keep kp USING (cluster_id)
        |  JOIN embeddings em ON em.vec_id = m.vec_id
        |  JOIN embeddings ek ON ek.vec_id = kp.keep_id
        |), sweep AS (
        |  SELECT eps, count(*) AS n_total,
        |    CAST(sum(CASE WHEN vec_id <> keep_id AND sim_keep * 1e6 >= 1000000 - eps
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |  FROM simk CROSS JOIN (SELECT unnest([600000, 750000, 900000]) AS eps)
        |  GROUP BY eps
        |)
        |SELECT CAST(eps AS INT) AS eps_micro, n_total, n_dropped,
        |  n_total - n_dropped AS n_kept,
        |  (1000000 * n_dropped) // n_total AS drop_rate_micro
        |FROM sweep ORDER BY eps_micro""".stripMargin,
    "emb_centroid" ->
      """WITH dims AS (
        |  SELECT unnest(range(0, (SELECT len(embedding) FROM embeddings
        |                          ORDER BY vec_id LIMIT 1))) AS dim
        |)
        |SELECT label, CAST(dim AS INT) AS dim, cast(count(*) AS bigint) AS n_vecs,
        |  CAST(round(sum(CAST(embedding[CAST(dim AS INT) + 1] AS DOUBLE))
        |             / count(*) * 1e6) AS BIGINT) AS mean_micro
        |FROM embeddings, dims
        |GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,
    "sink_sorted" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 5000""".stripMargin,
    "src_fvecs" ->
      """SELECT vec_id, len(embedding) AS dim,
        |  round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 4) AS vsum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "t_global_ids" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY doc_id) - 1 AS global_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_global_ids_native" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY doc_id) - 1 AS global_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_shuffle_hash" ->
      """WITH s AS (
        |  SELECT doc_id, md5(concat('shuf:', CAST(doc_id AS VARCHAR))) AS shuffle_key
        |  FROM documents ORDER BY shuffle_key LIMIT 100
        |)
        |SELECT doc_id, shuffle_key,
        |  CAST(row_number() OVER (ORDER BY shuffle_key) AS INT) AS position
        |FROM s ORDER BY position""".stripMargin,
    "t_table_diff" ->
      """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
        |v1 AS (
        |  SELECT k, md5(concat(CAST(k AS VARCHAR), '|',
        |    CAST(CAST(round(p * 100) AS BIGINT) AS VARCHAR))) AS h1
        |  FROM o WHERE k % 11 <> 0
        |), v2 AS (
        |  SELECT k, md5(concat(CAST(k AS VARCHAR), '|',
        |    CAST(CAST(round(CASE WHEN k % 7 = 0 THEN p + 50 ELSE p END * 100) AS BIGINT) AS VARCHAR))) AS h2
        |  FROM o WHERE k % 13 <> 0
        |)
        |SELECT CASE WHEN v1.k IS NULL THEN 'added'
        |            WHEN v2.k IS NULL THEN 'removed'
        |            WHEN h1 = h2 THEN 'unchanged'
        |            ELSE 'changed' END AS status,
        |  count(*) AS n
        |FROM v1 FULL JOIN v2 ON v1.k = v2.k
        |GROUP BY 1 ORDER BY status""".stripMargin,
    "t_salted_join" ->
      """WITH li AS (
        |  SELECT l_partkey % 20 AS k, l_quantity FROM lineitem
        |), ord AS (
        |  SELECT o_orderkey % 20 AS k2, round(sum(o_totalprice), 2) AS k_total
        |  FROM orders GROUP BY 1
        |)
        |SELECT k, count(*) AS n, round(sum(l_quantity), 2) AS qty, max(k_total) AS k_total
        |FROM li JOIN ord ON k = k2
        |GROUP BY k ORDER BY k""".stripMargin,
    "src_xml" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderkey % 10 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_streaks" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), g AS (
        |  SELECT user_id, day,
        |    datediff('day', DATE '1970-01-01', day)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM act
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS streak_days,
        |  min(day) AS start_day, max(day) AS end_day
        |FROM g GROUP BY user_id, grp
        |ORDER BY streak_days DESC, user_id, start_day LIMIT 25""".stripMargin,
    "src_json_multiline" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderkey % 20 = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t_skew_advisor" ->
      """WITH a AS (
        |  SELECT 'l_orderkey' AS key, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY l_orderkey
        |  UNION ALL
        |  SELECT 'hot_bucket' AS key, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem
        |  GROUP BY (CASE WHEN l_orderkey % 10 <> 0 THEN 0 ELSE 1 + l_orderkey % 19 END)
        |), g AS (
        |  SELECT key, CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(max(c) AS BIGINT) AS max_key_rows,
        |    CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY c) AS BIGINT) AS p99_key_rows
        |  FROM a GROUP BY key
        |)
        |SELECT key, n_rows, n_keys,
        |  (1000000 * n_rows) // n_keys AS mean_rows_micro,
        |  p99_key_rows, max_key_rows,
        |  (1000000 * max_key_rows * n_keys) // n_rows AS skew_factor_micro,
        |  greatest(1, (max_key_rows * 32 + n_rows - 1) // n_rows) AS recommended_salts,
        |  greatest(1, (max_key_rows * 32 + n_rows - 1) // n_rows) > 1 AS needs_salting
        |FROM g ORDER BY key""".stripMargin,
    "t_purged_folds" ->
      """WITH b AS (
        |  SELECT min(CAST(o_orderdate AS DATE)) AS dmin,
        |    max(CAST(o_orderdate AS DATE)) AS dmax,
        |    datediff('day', min(CAST(o_orderdate AS DATE)), max(CAST(o_orderdate AS DATE))) + 1 AS span
        |  FROM orders
        |), folds AS (
        |  SELECT CAST(i AS INT) AS fold, dmin,
        |    (i * span) // 5 AS ts, ((i + 1) * span) // 5 AS te
        |  FROM unnest(generate_series(0, 4)) AS u(i), b
        |), r AS (
        |  SELECT fold, CAST(o_orderdate AS DATE) AS d, o_totalprice,
        |    CASE
        |      WHEN datediff('day', dmin, CAST(o_orderdate AS DATE)) >= ts
        |        AND datediff('day', dmin, CAST(o_orderdate AS DATE)) < te THEN '3_test'
        |      WHEN datediff('day', dmin, CAST(o_orderdate AS DATE)) >= ts - 7
        |        AND datediff('day', dmin, CAST(o_orderdate AS DATE)) < ts THEN '2_purged'
        |      WHEN datediff('day', dmin, CAST(o_orderdate AS DATE)) >= te
        |        AND datediff('day', dmin, CAST(o_orderdate AS DATE)) < te + 7 THEN '4_embargo'
        |      ELSE '1_train' END AS split
        |  FROM orders, folds
        |)
        |SELECT fold, split, count(*) AS n, min(d) AS min_d, max(d) AS max_d,
        |  round(sum(o_totalprice), 2) AS total
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_zipf" ->
      """WITH terms AS (
        |  SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
        |  FROM documents
        |), f AS (
        |  SELECT term, count(*) AS freq FROM terms WHERE term <> '' GROUP BY 1
        |  ORDER BY freq DESC, term LIMIT 1000
        |), xy AS (
        |  SELECT
        |    CAST(floor(ln(CAST(row_number() OVER (ORDER BY freq DESC, term) AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
        |  FROM f
        |), g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx,
        |    sum(CAST(y AS HUGEINT) * y) AS syy
        |  FROM xy
        |)
        |SELECT n AS n_types,
        |  CAST(floor(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
        |    AS slope_micro,
        |  CAST(floor(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
        |    * (CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |    AS r2_micro
        |FROM g""".stripMargin,
    "text_vocab" ->
      """WITH terms AS (
        |  SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
        |  FROM documents
        |), f AS (
        |  SELECT term, count(*) AS freq FROM terms WHERE term <> '' GROUP BY 1
        |  ORDER BY freq DESC, term LIMIT 100
        |)
        |SELECT term, freq,
        |  CAST(row_number() OVER (ORDER BY freq DESC, term) - 1 AS INT) AS token_id
        |FROM f ORDER BY token_id""".stripMargin,
    "src_jsonl_corrupt" ->
      """SELECT cast(sum(CASE WHEN o_orderkey % 7 <> 0 THEN 1 ELSE 0 END) AS bigint) AS n_good,
        |  cast(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS bigint) AS n_corrupt,
        |  round(sum(CASE WHEN o_orderkey % 7 <> 0 THEN o_totalprice END), 2) AS total_good
        |FROM orders""".stripMargin,
    // each FK replayed with the same negated-key injection; LEFT JOIN +
    // one aggregate mirrors the Spark side exactly
    "dq_fk" -> {
      def one(fk: String, childSel: String, inject: String,
              parent: String, pkey: String) =
        s"""SELECT '$fk' AS fk, cast(count(*) AS bigint) AS n_child,
           |  cast(sum(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS bigint) AS n_orphan,
           |  (SELECT cast(count(*) AS bigint) FROM $parent) AS n_parent,
           |  cast(count(DISTINCT pk) AS bigint) AS n_ref_parent
           |FROM (SELECT k, $pkey AS pk FROM ($childSel
           |      UNION ALL $inject) c
           |      LEFT JOIN $parent ON c.k = $pkey) j""".stripMargin
      Seq(
        one("orders.o_custkey->customer",
          "SELECT o_custkey AS k FROM orders",
          "SELECT -(o_custkey+1) FROM orders WHERE o_orderkey % 1000 = 1",
          "customer", "c_custkey"),
        one("lineitem.l_orderkey->orders",
          "SELECT l_orderkey AS k FROM lineitem",
          "SELECT -(l_orderkey+1) FROM lineitem WHERE l_orderkey % 1000 = 1",
          "orders", "o_orderkey"),
        one("lineitem.l_partkey->part",
          "SELECT l_partkey AS k FROM lineitem",
          "SELECT -(l_partkey+1) FROM lineitem WHERE l_orderkey % 1000 = 1",
          "part", "p_partkey"),
        one("lineitem.l_suppkey->supplier",
          "SELECT l_suppkey AS k FROM lineitem",
          "SELECT -(l_suppkey+1) FROM lineitem WHERE l_orderkey % 1000 = 1",
          "supplier", "s_suppkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fk")
    },
    // the oracle replays what SHOULD have happened at every stage of
    // the write-audit-publish protocol — publishing a failing batch or
    // drifting the visible version breaks the hash
    // K25: the oracle recomputes the expected FINAL state of both
    // tables from raw facts — a leaked half-transaction (the crashed
    // writer's full-data monthly files alongside v1's half-data
    // priority files) would break grand_n/grand_total on table A
    "sink_txn" ->
      """WITH t AS (
        |  SELECT CAST(round(o_totalprice * 1e6) AS BIGINT) AS micro,
        |    strftime(o_orderdate, '%Y-%m') AS m, o_orderpriority AS p
        |  FROM orders
        |), s AS (
        |  SELECT 'orders_by_priority' AS tbl,
        |    CAST(count(DISTINCT p) AS BIGINT) AS n_groups,
        |    CAST(count(*) AS BIGINT) AS grand_n,
        |    CAST(sum(micro) AS BIGINT) AS grand_total_micro
        |  FROM t
        |  UNION ALL
        |  SELECT 'orders_monthly',
        |    CAST(count(DISTINCT m) AS BIGINT),
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(micro) AS BIGINT)
        |  FROM t
        |)
        |SELECT tbl, n_groups, grand_n, grand_total_micro,
        |  CAST(2 AS BIGINT) AS catalog_version, true AS consistent
        |FROM s ORDER BY tbl""".stripMargin,
    "sink_wap" ->
      """WITH n AS (SELECT cast(count(*) AS bigint) AS total FROM orders),
        |bad AS (SELECT cast(count(*) AS bigint) AS nb FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT '1_publish_clean' AS stage, total AS n_rows,
        |  cast(0 AS bigint) AS n_violations, true AS published,
        |  cast(1 AS bigint) AS current_version,
        |  total - nb AS live_rows FROM n, bad
        |UNION ALL
        |SELECT '2_reject_corrupt', total, nb, false, 1, total - nb FROM n, bad
        |UNION ALL
        |SELECT '3_publish_fixed', total - nb, 0, true, 2, total - nb FROM n, bad
        |ORDER BY stage""".stripMargin,
    // the incrementally-rebuilt table must equal a from-scratch build
    // of the MODIFIED source (stale or doubled partitions break this)
    "p_dirty_partitions" ->
      """WITH b AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    CASE WHEN strftime(o_orderdate, '%Y-%m') = '1996-03'
        |         THEN o_totalprice + 100 ELSE o_totalprice END AS p
        |  FROM orders
        |)
        |SELECT month, cast(count(*) AS bigint) AS n, round(sum(p), 2) AS total
        |FROM b GROUP BY 1 ORDER BY month""".stripMargin,
    // the runtime-pruned partitioned join must equal the raw-table join
    "q_dpp" ->
      """WITH dim AS (
        |  SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS ship_month
        |  FROM orders
        |  WHERE substr(strftime(o_orderdate, '%Y-%m'), 1, 4) = '1996'
        |    AND substr(strftime(o_orderdate, '%Y-%m'), 6, 2) IN ('01', '02', '03')
        |)
        |SELECT f.ship_month, cast(count(*) AS bigint) AS n,
        |  round(sum(l_quantity), 2) AS qty,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |        l_quantity, l_extendedprice FROM lineitem) f
        |JOIN dim USING (ship_month)
        |GROUP BY 1 ORDER BY ship_month""".stripMargin,
    // the incremental four-term union must equal the from-scratch join
    "t_incr_join" ->
      """SELECT c_nationkey, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
    // the log lines are rendered from events with this exact
    // arithmetic; a hash match proves the text round-trip parsed every
    // field exactly
    "src_logs" ->
      """SELECT '/t/' || event_type AS path,
        |  cast(200 + CASE WHEN event_id % 20 = 0 THEN 204 ELSE 0 END AS int) AS status,
        |  cast(count(*) AS bigint) AS n,
        |  cast(sum(event_id % 997) AS bigint) AS total_bytes,
        |  cast(min(epoch_us(ts) // 1000000) AS bigint) AS min_ts_s,
        |  cast(max(epoch_us(ts) // 1000000) AS bigint) AS max_ts_s
        |FROM events GROUP BY 1, 2 ORDER BY path, status""".stripMargin,
    // the streamed CDC feed replays sink_merge's arithmetic, so the
    // converged table must match the same final-state oracle
    "e_stream_cdc" ->
      """WITH fin AS (
        |  SELECT o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 4 = 0
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice + 1000
        |  FROM orders WHERE o_orderkey % 4 = 1
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice + 500
        |  FROM orders WHERE o_orderkey % 4 = 3
        |)
        |SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM fin GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "sink_versioned" ->
      """SELECT 'v1_pinned' AS snapshot, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderdate < '1998-01-01'
        |UNION ALL
        |SELECT 'v2_latest', cast(count(*) AS bigint), round(sum(o_totalprice), 2)
        |FROM orders
        |ORDER BY snapshot""".stripMargin,
    // K24: the pinned v1 TVF read must equal pre-1998 history; the
    // un-pinned read must equal the full table (v2 = v1 + appends)
    "sink_time_travel" ->
      """SELECT 'v1_pinned' AS snapshot, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderdate < '1998-01-01'
        |UNION ALL
        |SELECT 'v2_latest', cast(count(*) AS bigint), round(sum(o_totalprice), 2)
        |FROM orders
        |ORDER BY snapshot""".stripMargin,
    // K29: the pinned v1 catalog read must equal the first INSERT's
    // batch exactly; the latest read must equal both batches
    "sink_catalog_sql" ->
      """SELECT 'v1_pinned' AS snapshot, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderdate < '1997-07-01'
        |UNION ALL
        |SELECT 'v2_latest', cast(count(*) AS bigint), round(sum(o_totalprice), 2)
        |FROM orders
        |ORDER BY snapshot""".stripMargin,
    // E34: the lake after the drain (with every batch REDELIVERED
    // once) must equal a direct aggregate of the raw feed — a failed
    // idempotence guard doubles every count/sum
    "e_stream_lake" ->
      """SELECT event_type, cast(count(*) AS bigint) AS n,
        |  cast(count(DISTINCT event_id) AS bigint) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    // K30: v1 must equal the full load; v2 must equal the survivors of
    // the exact DELETE predicate (null semantics included)
    "sink_catalog_delete" ->
      """SELECT 'v1_pre_delete' AS snapshot, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders
        |UNION ALL
        |SELECT 'v2_post_delete', cast(count(*) AS bigint), round(sum(o_totalprice), 2)
        |FROM orders WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 150000.0)
        |ORDER BY snapshot""".stripMargin,
    // K31: pre-evolution rows must bucket under the null fill, and
    // post-evolution rows must carry their real status
    "sink_catalog_evolve" ->
      """SELECT CASE WHEN o_orderdate < '1997-01-01' THEN '_legacy'
        |  ELSE o_orderstatus END AS status_bucket,
        |  cast(count(*) AS bigint) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY 1 ORDER BY status_bucket""".stripMargin,
    "text_pack" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS BIGINT) AS n_toks
        |  FROM documents
        |), c AS (
        |  SELECT source, doc_id, n_toks,
        |    coalesce(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
        |  FROM t
        |)
        |SELECT source, CAST(floor(cum_excl / 256) AS BIGINT) AS seq_id,
        |  cast(count(*) AS bigint) AS n_docs, cast(sum(n_toks) AS bigint) AS n_tokens
        |FROM c GROUP BY 1, 2 ORDER BY source, seq_id""".stripMargin,
    "e_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
        |  FROM events GROUP BY 1, 2
        |), stats AS (
        |  SELECT event_type, h, n,
        |    CAST(round(avg(n) OVER (PARTITION BY event_type) * 1e6) AS BIGINT) AS mean_micro,
        |    CAST(round(stddev_samp(n) OVER (PARTITION BY event_type) * 1e6) AS BIGINT) AS sd_micro
        |  FROM hourly
        |)
        |SELECT event_type, epoch_us(h) AS hour_us, n, mean_micro, sd_micro
        |FROM stats
        |WHERE abs(n * 1000000 - mean_micro) > 2 * sd_micro
        |ORDER BY event_type, hour_us""".stripMargin,
    "e_stream_tws" ->
      """SELECT user_id, cast(count(*) AS bigint) AS n_purchases,
        |  round(sum(value), 2) AS total_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY user_id""".stripMargin,
    // E32: the quota stream's admit set replays as a batch row_number
    // over the same (ts, event_id) per-user order (the engine orders
    // by the exact nanos long; epoch order ≡ timestamp order here)
    "e_stream_quota" ->
      """WITH r AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_seen,
        |  CAST(sum(CASE WHEN rn <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
        |  CAST(sum(CASE WHEN rn <= 20 THEN event_id ELSE 0 END) AS BIGINT)
        |    AS admitted_id_sum
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "e_stream_upsert" ->
      """WITH p AS (
        |  SELECT DISTINCT event_id, user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT cast(count(*) AS bigint) AS n_rows,
        |  cast(count(DISTINCT event_id) AS bigint) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM p""".stripMargin,
    "text_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 6, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
        |                        toks[i+4], toks[i+5], toks[i+6], toks[i+7])))) AS gram
        |  FROM t WHERE len(toks) >= 8
        |), bench AS (
        |  SELECT DISTINCT gram, doc_id AS bench_id FROM g WHERE doc_id < 20
        |)
        |SELECT c.doc_id,
        |  cast(count(DISTINCT c.gram) AS bigint) AS n_shared_grams,
        |  cast(count(DISTINCT bench_id) AS bigint) AS n_bench_docs
        |FROM g c JOIN bench b ON c.gram = b.gram
        |WHERE c.doc_id >= 20
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_mixture" ->
      """WITH s AS (
        |  SELECT source, cast(count(*) AS bigint) AS n_docs,
        |    cast(sum(len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '))) AS bigint) AS n_tokens
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT *, sum(n_tokens) OVER () AS total, count(*) OVER () AS n_src FROM s
        |)
        |SELECT source, n_docs, n_tokens,
        |  CAST(round(n_tokens * 1000000 / total) AS BIGINT) AS share_micro,
        |  least(1000000, CAST(round(total * 1000000.0 / (n_src * n_tokens)) AS BIGINT)) AS keep_rate_micro
        |FROM w ORDER BY source""".stripMargin,
    "ann_knn_join" ->
      """WITH p AS (
        |  SELECT a.vec_id AS src, b.vec_id AS nbr,
        |    round(list_cosine_similarity(
        |      list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        |), r AS (
        |  SELECT src, nbr, sim,
        |    row_number() OVER (PARTITION BY src ORDER BY sim DESC, nbr) AS rk
        |  FROM p
        |)
        |SELECT src, rk, nbr, sim FROM r WHERE rk <= 3
        |ORDER BY src, rk""".stripMargin,
    "e_stream_enrich" ->
      """WITH dim AS (
        |  SELECT user_id, cast(count(*) AS bigint) AS user_events,
        |    round(avg(value), 2) AS user_avg_value
        |  FROM events GROUP BY 1
        |)
        |SELECT e.user_id, event_id, epoch_us(ts) AS ts_us,
        |  user_events, user_avg_value
        |FROM events e JOIN dim USING (user_id)
        |WHERE event_type = 'purchase'
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "t_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS F,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS O,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS P
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "t_project_const" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        |  'this is an artificial transformation just to practice prefect' AS transformation
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "t_cast_rename" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
        |  cast(floor(l_quantity) AS int) AS qty,
        |  cast(cast(l_extendedprice AS decimal(18,2)) AS double) AS price_dec,
        |  cast(l_shipdate AS date) AS ship_date
        |FROM lineitem ORDER BY order_id, line_no""".stripMargin,
    "t_nulls" ->
      """SELECT o_orderkey, coalesce(nullif(o_orderstatus, 'P'), 'UNKNOWN') AS status_maybe
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "t_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "t_dedup_key" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
        |  FROM lineitem
        |) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    // concurrent branches must produce exactly the sequential results
    "p_parallel" ->
      """SELECT 'events' AS branch,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_groups,
        |  CAST(count(*) AS BIGINT) AS n_rows FROM events
        |UNION ALL SELECT 'lineitem',
        |  CAST(count(DISTINCT l_returnflag) AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM lineitem
        |UNION ALL SELECT 'orders',
        |  CAST(count(DISTINCT strftime(o_orderdate, '%Y-%m')) AS BIGINT),
        |  CAST(count(*) AS BIGINT) FROM orders
        |ORDER BY branch""".stripMargin,
    // same contract diff replayed over DuckDB's DESCRIBE of the feed
    "dq_schema_contract" ->
      """WITH actual AS (
        |  SELECT column_name AS col,
        |    CASE column_type
        |      WHEN 'BIGINT' THEN 'bigint' WHEN 'VARCHAR' THEN 'string'
        |      WHEN 'DOUBLE' THEN 'double' WHEN 'TIMESTAMP' THEN 'timestamp'
        |      ELSE lower(column_type) END AS actual
        |  FROM (DESCRIBE SELECT * FROM orders)
        |), contract(col, expected) AS (
        |  VALUES ('o_orderkey', 'bigint'), ('o_custkey', 'bigint'),
        |         ('o_orderstatus', 'string'), ('o_totalprice', 'decimal(12,2)'),
        |         ('o_orderdate', 'timestamp'), ('o_channel', 'string')
        |)
        |SELECT coalesce(c.col, a.col) AS "column", expected, actual,
        |  CASE WHEN expected IS NULL THEN 'unexpected'
        |       WHEN actual IS NULL THEN 'missing'
        |       WHEN expected = actual THEN 'ok'
        |       ELSE 'type_mismatch' END AS verdict
        |FROM contract c FULL OUTER JOIN actual a ON c.col = a.col
        |ORDER BY "column"""".stripMargin,
    // the manifest-pruned read must return exactly the raw-table range
    // query; `pruned` asserts files were actually skipped
    "sink_manifest" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total,
        |  true AS pruned
        |FROM orders WHERE o_orderkey BETWEEN 1000 AND 5000""".stripMargin,
    // incremental maintenance must be indistinguishable from a full
    // rebuild — the oracle recomputes the rollup from all of orders
    "t_incr_rollup" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    // same oracle as t_dedup_key: the optimizer rule must not change
    // results, only the plan
    "t_dedup_key_rule" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
        |  FROM lineitem
        |) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    // Sources: the oracle aggregates the ORIGINAL parquet — a match
    // proves the write→read round-trip through the format was lossless.
    "src_parquet" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_returnflag <> 'N'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "src_url" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "src_csv" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "src_json" ->
      // CAST to DATE on the oracle side too: o_orderdate has shipped as
      // both DATE and TIMESTAMP(MICROS) parquet across testdata
      // generations, and the Spark side normalizes to DATE after the
      // JSON round-trip — both casts truncate, so they agree under
      // either encoding
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  max(CAST(o_orderdate AS DATE)) AS last_date
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "src_autodetect" ->
      """SELECT * FROM (
        |  SELECT 'parquet' AS fmt, count(*) AS n, cast(sum(n_nationkey) AS bigint) AS key_sum FROM nation
        |  UNION ALL
        |  SELECT 'csv', count(*), cast(sum(n_nationkey) AS bigint) FROM nation
        |  UNION ALL
        |  SELECT 'json', count(*), cast(sum(n_nationkey) AS bigint) FROM nation
        |) ORDER BY fmt""".stripMargin,
    "sink_modes" ->
      """SELECT * FROM (
        |  SELECT '1_replace' AS step, count(*) AS n_rows, true AS ok FROM orders
        |  UNION ALL SELECT '2_append', 2 * count(*), true FROM orders
        |  UNION ALL SELECT '3_fail', 2 * count(*), true FROM orders
        |) ORDER BY step""".stripMargin,
    "sink_jdbc" ->
      """SELECT * FROM (
        |  SELECT '1_replace' AS step, count(*) AS n_rows, true AS ok FROM nation
        |  UNION ALL SELECT '2_append', 2 * count(*), true FROM nation
        |  UNION ALL SELECT '3_fail', 2 * count(*), true FROM nation
        |  UNION ALL SELECT '4_replace_again', count(*), true FROM nation
        |) ORDER BY step""".stripMargin,
    "sink_compress" ->
      """SELECT * FROM (
        |  SELECT 'gzip' AS codec, count(*) AS n, round(sum(l_extendedprice), 2) AS total FROM lineitem
        |  UNION ALL SELECT 'snappy', count(*), round(sum(l_extendedprice), 2) FROM lineitem
        |  UNION ALL SELECT 'zstd', count(*), round(sum(l_extendedprice), 2) FROM lineitem
        |) ORDER BY codec""".stripMargin,
    "sink_bucketed" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "sink_csv" ->
      """SELECT cast(ts AS date) AS d, event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sink_partitioned" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // CDC apply replayed as arithmetic: 0 mod 4 untouched, 1 mod 4
    // updated (+1000), 2 mod 4 deleted (update@seq1 superseded by
    // delete@seq3), 3 mod 4 inserted (+500)
    "sink_merge" ->
      """WITH fin AS (
        |  SELECT o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 4 = 0
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice + 1000
        |  FROM orders WHERE o_orderkey % 4 = 1
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice + 500
        |  FROM orders WHERE o_orderkey % 4 = 3
        |)
        |SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM fin GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "sink_warehouse" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice
        |                 ELSE o_totalprice + 1000 END), 2) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // targeted erasure: the surviving table is everything outside the
    // doomed custkey range; `pruned` asserts files were carried forward
    "sink_delete" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  true AS pruned
        |FROM orders WHERE o_custkey < 100 OR o_custkey > 120""".stripMargin,
    // bloom point lookup: min/max orderkey probes against the raw
    // table; `pruned` asserts the bloom manifest skipped files
    "sink_bloom_index" ->
      """WITH p AS (
        |  SELECT min(o_orderkey) AS k FROM orders
        |  UNION SELECT max(o_orderkey) FROM orders
        |)
        |SELECT o_orderkey, cast(count(*) AS bigint) AS n,
        |  round(sum(o_totalprice), 2) AS total, true AS pruned
        |FROM orders WHERE o_orderkey IN (SELECT k FROM p)
        |GROUP BY 1 ORDER BY o_orderkey""".stripMargin,
    // Text analysis — the oracle replays the identical scoring in SQL
    // (same normalization regex, same marker lists, same tie-break order).
    "text_langid" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit'))) AS s_de,
        |    len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','it'))) AS s_en,
        |    len(list_filter(toks, x -> x IN ('el','la','los','las','que','y','por','como'))) AS s_es,
        |    len(list_filter(toks, x -> x IN ('le','les','des','et','une','est','dans','pour'))) AS s_fr,
        |    len(list_filter(toks, x -> x IN ('的','是','不','我','了','在'))) AS s_zh
        |  FROM scored
        |)
        |SELECT doc_id, lang,
        |  CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |       WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |       WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |       WHEN s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_surprisal" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
        |  FROM documents
        |), tt AS (
        |  SELECT doc_id, tok FROM t WHERE length(tok) > 0
        |), c AS (
        |  SELECT tok, count(*) AS cnt FROM tt GROUP BY tok
        |), n AS (
        |  SELECT count(*) AS total FROM tt
        |), s AS (
        |  SELECT doc_id,
        |    CAST(round(ln(CAST(total AS DOUBLE) / cnt) * 1000000) AS BIGINT) AS m
        |  FROM tt JOIN c USING (tok) CROSS JOIN n
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(m) AS BIGINT) AS sum_surprisal_micro,
        |  CAST(sum(m) // count(*) AS BIGINT) AS mean_surprisal_micro
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_dsir" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
        |  FROM documents
        |), tt AS (
        |  SELECT doc_id, lang, substr(md5(tok), 1, 2) AS bucket
        |  FROM t WHERE length(tok) > 0
        |), raw AS (
        |  SELECT bucket, count(*) AS r_cnt FROM tt GROUP BY bucket
        |), tgt AS (
        |  SELECT bucket, count(*) AS t_cnt FROM tt WHERE lang = 'en' GROUP BY bucket
        |), dists AS (
        |  SELECT raw.bucket, r_cnt, coalesce(t_cnt, 0) AS t_cnt
        |  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket
        |), totals AS (
        |  SELECT sum(r_cnt) AS r_total, sum(t_cnt) AS t_total FROM dists
        |), scored AS (
        |  SELECT bucket,
        |    CAST(round((ln(CAST(t_cnt + 1 AS DOUBLE) / (t_total + 256))
        |              - ln(CAST(r_cnt + 1 AS DOUBLE) / (r_total + 256))) * 1000000) AS BIGINT) AS m
        |  FROM dists CROSS JOIN totals
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(m) AS BIGINT) AS sum_logratio_micro,
        |  CAST(sum(m) // count(*) AS BIGINT) AS mean_logratio_micro
        |FROM tt JOIN scored USING (bucket)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_drift" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
        |  FROM documents
        |), tt AS (
        |  SELECT doc_id >= 400 AS is_delta, substr(md5(tok), 1, 2) AS bucket
        |  FROM t WHERE length(tok) > 0
        |), observed AS (
        |  SELECT bucket,
        |    cast(sum(CASE WHEN is_delta THEN 1 ELSE 0 END) AS bigint) AS d_cnt,
        |    cast(sum(CASE WHEN is_delta THEN 0 ELSE 1 END) AS bigint) AS b_cnt
        |  FROM tt GROUP BY bucket
        |), spine AS (
        |  SELECT printf('%02x', range) AS bucket FROM range(256)
        |), counts AS (
        |  SELECT s.bucket, coalesce(o.d_cnt, 0) AS d_cnt, coalesce(o.b_cnt, 0) AS b_cnt
        |  FROM spine s LEFT JOIN observed o USING (bucket)
        |), totals AS (
        |  SELECT sum(d_cnt) AS d_total, sum(b_cnt) AS b_total FROM counts
        |)
        |SELECT bucket, b_cnt, d_cnt,
        |  CAST(round((ln(CAST(d_cnt + 1 AS DOUBLE) / (d_total + 256))
        |            - ln(CAST(b_cnt + 1 AS DOUBLE) / (b_total + 256))) * 1000000) AS BIGINT)
        |    AS logratio_micro,
        |  CAST(round((CAST(d_cnt + 1 AS DOUBLE) / (d_total + 256)) *
        |             (ln(CAST(d_cnt + 1 AS DOUBLE) / (d_total + 256))
        |            - ln(CAST(b_cnt + 1 AS DOUBLE) / (b_total + 256))) * 1000000000) AS BIGINT)
        |    AS kl_term_nano
        |FROM counts CROSS JOIN totals
        |ORDER BY bucket""".stripMargin,
    "text_bigram_surprisal" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), dd AS (
        |  SELECT doc_id, toks FROM d WHERE len(toks) >= 2
        |), bg AS (
        |  SELECT doc_id, toks[i] AS l, toks[i+1] AS r
        |  FROM dd, unnest(range(1, len(toks))) AS u(i)
        |), pc AS (
        |  SELECT l, r, count(*) AS c_lr FROM bg GROUP BY l, r
        |), cc AS (
        |  SELECT l, count(*) AS c_l FROM bg GROUP BY l
        |), vv AS (
        |  SELECT count(DISTINCT tok) AS v FROM (
        |    SELECT unnest(toks) AS tok FROM d
        |  ) WHERE length(tok) > 0
        |), s AS (
        |  SELECT doc_id,
        |    CAST(round(ln(CAST(c_l + v AS DOUBLE) / (c_lr + 1)) * 1000000) AS BIGINT) AS m
        |  FROM bg JOIN pc USING (l, r) JOIN cc USING (l) CROSS JOIN vv
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(m) AS BIGINT) AS sum_surprisal_micro,
        |  CAST(sum(m) // count(*) AS BIGINT) AS mean_surprisal_micro
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, text,
        |    len(toks) AS n_words,
        |    CAST(floor(length(array_to_string(toks, '')) * 1000000
        |         / greatest(len(toks), 1)) AS BIGINT) AS mean_wlen_micro,
        |    length(text) - length(regexp_replace(text, '[^a-z0-9\s]', '', 'g')) AS n_symbol,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
        |    len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','it'))) AS n_stop
        |  FROM t
        |)
        |SELECT doc_id, n_words, mean_wlen_micro, n_stop,
        |  (n_words BETWEEN 50 AND 100000) AS r_nwords,
        |  (mean_wlen_micro BETWEEN 3000000 AND 10000000) AS r_wlen,
        |  (n_symbol * 10 <= length(text)) AS r_symbol,
        |  (n_digit * 5 <= length(text)) AS r_digit,
        |  (n_stop >= 2) AS r_stop,
        |  ((n_words BETWEEN 50 AND 100000)
        |   AND (mean_wlen_micro BETWEEN 3000000 AND 10000000)
        |   AND n_symbol * 10 <= length(text)
        |   AND n_digit * 5 <= length(text)
        |   AND n_stop >= 2) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |)
        |SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(toks) AS n_tokens,
        |  round(len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','it')))
        |        / greatest(len(toks), 1), 4) AS stopword_ratio,
        |  round((length(text) - length(regexp_replace(text, '[^a-z0-9\s]', '', 'g')))
        |        / greatest(length(text), 1), 4) AS punct_ratio,
        |  round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
        |        / greatest(length(text), 1), 4) AS digit_ratio,
        |  (len(toks) BETWEEN 20 AND 1000) AS keep
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS ws_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]')) AS bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    // X37: the bigram LM is fitted on the train split only; unseen
    // test bigrams coalesce to the smoothing floor
    "text_heldout" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), dd AS (
        |  SELECT doc_id, source, toks FROM d WHERE len(toks) >= 2
        |), tr AS (
        |  SELECT * FROM dd WHERE doc_id % 5 <> 0
        |), trb AS (
        |  SELECT toks[i] AS l, toks[i+1] AS r
        |  FROM tr, unnest(range(1, len(toks))) AS u(i)
        |), pc AS (
        |  SELECT l, r, count(*) AS c_lr FROM trb GROUP BY l, r
        |), cc AS (
        |  SELECT l, count(*) AS c_l FROM trb GROUP BY l
        |), vv AS (
        |  SELECT count(DISTINCT tok) AS v FROM (
        |    SELECT unnest(toks) AS tok FROM tr
        |  ) WHERE length(tok) > 0
        |), teb AS (
        |  SELECT doc_id, source, toks[i] AS l, toks[i+1] AS r
        |  FROM dd, unnest(range(1, len(toks))) AS u(i)
        |  WHERE doc_id % 5 = 0
        |), s AS (
        |  SELECT source, doc_id,
        |    CAST(round(ln(CAST(coalesce(c_l, 0) + v AS DOUBLE) /
        |      (coalesce(c_lr, 0) + 1)) * 1000000) AS BIGINT) AS m
        |  FROM teb LEFT JOIN pc USING (l, r) LEFT JOIN cc USING (l) CROSS JOIN vv
        |)
        |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(m) // count(*) AS BIGINT) AS mean_surprisal_micro
        |FROM s GROUP BY source ORDER BY source""".stripMargin,
    // T37: z-scores from train-only moments; both splits scored on
    // the train scale (the leakage-safe scaler contract)
    "t_scale" ->
      """WITH r AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice * 1e6) AS BIGINT) AS v,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'test' ELSE 'train' END AS split
        |  FROM orders
        |), st AS (
        |  SELECT grp, count(*) AS n_tr,
        |    sum(CAST(v AS HUGEINT)) AS sv,
        |    sum(CAST(v AS HUGEINT) * v) AS svv
        |  FROM r WHERE split = 'train' GROUP BY grp
        |), mu AS (
        |  SELECT grp, CAST(sv AS DOUBLE) / n_tr AS mu,
        |    sqrt(CAST(n_tr * svv - sv * sv AS DOUBLE)) / n_tr AS sd
        |  FROM st
        |), z AS (
        |  SELECT r.grp, r.split,
        |    CASE WHEN sd = 0 THEN 0 ELSE
        |      CAST(round((CAST(v AS DOUBLE) - mu) / sd * 1e6) AS BIGINT)
        |    END AS zm
        |  FROM r JOIN mu ON r.grp = mu.grp
        |)
        |SELECT grp, split, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(zm) AS BIGINT) AS sum_z_micro,
        |  CAST(max(abs(zm)) AS BIGINT) AS max_abs_z_micro
        |FROM z GROUP BY 1, 2 ORDER BY grp, split""".stripMargin,
    // T35: bucket and sign fold the md5 hex via ascii arithmetic —
    // identical md5/ascii/substr on both engines, so the sparse
    // vectors replay bit-equal (the mm_integrity idiom)
    "t_feature_hash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(
        |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, md5(tok) AS m FROM toks WHERE tok <> ''
        |), b AS (
        |  SELECT doc_id,
        |    ((ascii(substr(m, 1, 1)) * 131 + ascii(substr(m, 2, 1))) * 131
        |      + ascii(substr(m, 3, 1))) * 131 + ascii(substr(m, 4, 1)) AS f,
        |    CASE WHEN ascii(substr(m, 5, 1)) % 2 = 0 THEN 1 ELSE -1 END AS sgn
        |  FROM h
        |)
        |SELECT doc_id, CAST(f % 64 AS BIGINT) AS bucket,
        |  CAST(sum(sgn) AS BIGINT) AS v
        |FROM b GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin,
    // T36: probe sequence, anti-join and first-k selection replayed
    // with the same multiplicative-hash arithmetic (all terms
    // positive, so plain % ≡ pmod on both engines)
    "t_neg_sample" ->
      """WITH np AS (SELECT count(*) AS n FROM part),
        |pos AS (
        |  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |), cust AS (SELECT DISTINCT custkey FROM pos),
        |probes AS (
        |  SELECT c.custkey, t.j,
        |    ((c.custkey * 2654435761 + t.j * 40503) % 4294967296) % np.n + 1
        |      AS partkey
        |  FROM cust c, range(0, 12) t(j), np
        |), neg AS (
        |  SELECT p.custkey, p.partkey, min(p.j) AS jmin
        |  FROM probes p
        |  WHERE NOT EXISTS (SELECT 1 FROM pos
        |    WHERE pos.custkey = p.custkey AND pos.partkey = p.partkey)
        |  GROUP BY 1, 2
        |), r AS (
        |  SELECT custkey, partkey,
        |    row_number() OVER (PARTITION BY custkey ORDER BY jmin, partkey) AS rnk
        |  FROM neg
        |)
        |SELECT custkey, CAST(rnk AS BIGINT) AS rnk, partkey
        |FROM r WHERE rnk <= 4 ORDER BY custkey, rnk""".stripMargin,
    "text_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, norm, string_split(norm, ' ') AS toks FROM t
        |)
        |SELECT doc_id,
        |  substring(md5(norm), 1, 16) AS content_id,
        |  list_aggregate(
        |    list_transform(
        |      list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |        i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))),
        |      s -> substring(md5(s), 1, 16)), 'min') AS min_shingle_hash
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_pii_redact" ->
      """WITH s AS (
        |  SELECT doc_id, text,
        |    regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g') AS no_url
        |  FROM documents
        |), s2 AS (
        |  SELECT doc_id, text, no_url,
        |    regexp_replace(no_url, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g') AS no_email
        |  FROM s
        |)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_urls,
        |  len(regexp_extract_all(no_url, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(no_email, '[0-9]{4,}')) AS n_nums,
        |  md5(regexp_replace(no_email, '[0-9]{4,}', '<NUM>', 'g')) AS redacted_md5
        |FROM s2 ORDER BY doc_id""".stripMargin,
    // X36: byte-identical artifact planting via chr(); detection by
    // replace-length-diff (fixed sequences) + one C0 regex class.
    // All planted chars are BMP so both engines' length() agree.
    "text_encoding" ->
      """WITH p AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 11 = 0 THEN ' caf' || chr(233) || ' isn' ||
        |      chr(226) || chr(8364) || chr(8482) || 't' ELSE '' END ||
        |    CASE WHEN doc_id % 13 = 0 THEN chr(65533) ELSE '' END ||
        |    CASE WHEN doc_id % 17 = 0 THEN chr(7) ELSE '' END AS t
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(length(t) - length(replace(t, chr(65533), '')) AS BIGINT) AS n_repl,
        |  CAST(length(t) - length(regexp_replace(t,
        |    '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS BIGINT) AS n_ctrl,
        |  CAST((length(t) - length(replace(t, chr(226) || chr(8364), ''))) // 2
        |    AS BIGINT) AS n_moji,
        |  1000000 * CAST(length(regexp_replace(t, '[\x00-\x7f]', '', 'g')) AS BIGINT)
        |    // length(t) AS nonascii_micro,
        |  (length(t) - length(replace(t, chr(65533), '')) > 0
        |   OR length(t) - length(regexp_replace(t,
        |        '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) > 0
        |   OR length(t) - length(replace(t, chr(226) || chr(8364), '')) > 0)
        |    AS is_suspect
        |FROM p ORDER BY doc_id""".stripMargin,
    // same tokenizer + 5-gram construction; df computed on the raw
    // gram (md5 on the Spark side only dedups bytes on the wire)
    "text_novelty" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), gd AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, greatest(len(toks) - 3, 1)),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))) AS grams
        |  FROM t
        |), e AS (
        |  SELECT doc_id, unnest(grams) AS g FROM gd
        |), df AS (
        |  SELECT g, count(*) AS df FROM e GROUP BY g
        |)
        |SELECT doc_id, cast(count(*) AS bigint) AS n_grams,
        |  cast(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS bigint) AS n_unique,
        |  CAST(round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    * 1e6 / count(*)) AS BIGINT) AS novelty_micro
        |FROM e JOIN df USING (g)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(len(toks), 1)),
        |      i -> concat_ws(' ', toks[i], toks[i+1])) AS g2,
        |    list_transform(range(1, greatest(len(toks) - 1, 1)),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])) AS g3
        |  FROM t
        |)
        |SELECT doc_id, len(g2) AS n_2grams,
        |  round((len(g2) - len(list_distinct(g2))) / greatest(len(g2), 1), 4) AS dup_2gram_frac,
        |  round((len(g3) - len(list_distinct(g3))) / greatest(len(g3), 1), 4) AS dup_3gram_frac
        |FROM g ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM terms WHERE term <> '' GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |    tf * CAST(round(ln((n_docs + 1) / (df + 1)) * 1e6) AS BIGINT) AS score_micro
        |  FROM tf JOIN dfreq USING (term), n
        |)
        |SELECT doc_id, rnk, term, tf, df, score_micro FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score_micro DESC, term) AS rnk
        |  FROM scored
        |) WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "text_bm25" ->
      """WITH q(q_id, term) AS (VALUES
        |  (0,'spark'),(0,'query'),(0,'join'),
        |  (1,'stream'),(1,'window'),(1,'batch'),
        |  (2,'hash'),(2,'merge'),(2,'sort'),
        |  (3,'customer'),(3,'data'),(3,'table')),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |    t -> t <> '') AS toks
        |  FROM documents
        |), dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM toks),
        |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
        |terms AS (SELECT doc_id, unnest(toks) AS term FROM toks),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM terms
        |  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2
        |), dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |contrib AS (
        |  SELECT q.q_id, tf.doc_id,
        |    CAST(round(
        |      ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
        |      ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) * n_docs / sum_dl)))) *
        |      1e6) AS BIGINT) AS c_micro
        |  FROM tf JOIN q USING (term) JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
        |), score AS (SELECT q_id, doc_id, CAST(sum(c_micro) AS BIGINT) AS score_micro FROM contrib GROUP BY 1, 2)
        |SELECT CAST(q_id AS BIGINT) AS q_id, rnk, doc_id, score_micro FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score_micro DESC, doc_id) AS rnk
        |  FROM score
        |) WHERE rnk <= 10 ORDER BY q_id, rnk""".stripMargin,
    "text_pmi" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), dd AS (SELECT doc_id, toks FROM d WHERE len(toks) >= 2),
        |bg AS (
        |  SELECT toks[i] AS w1, toks[i+1] AS w2
        |  FROM dd, unnest(range(1, len(toks))) AS u(i)
        |), uni AS (SELECT unnest(toks) AS w FROM dd),
        |uc AS (SELECT w, count(*) AS c_w FROM uni GROUP BY 1),
        |tot AS (SELECT (SELECT count(*) FROM bg) AS n_bi,
        |               (SELECT count(*) FROM uni) AS n_uni),
        |bc AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
        |  CAST(round(ln((CAST(c_ab AS DOUBLE) * n_uni * n_uni) /
        |    (CAST(n_bi AS DOUBLE) * c_a * c_b)) * 1e6) AS BIGINT) AS pmi_micro
        |FROM bc
        |JOIN (SELECT w AS w1, c_w AS c_a FROM uc) USING (w1)
        |JOIN (SELECT w AS w2, c_w AS c_b FROM uc) USING (w2), tot
        |ORDER BY pmi_micro DESC, w1, w2 LIMIT 20""".stripMargin,
    // payload entropy: hex pairs ARE byte identities — no numeric
    // decode; X24's micro-rounded entropy terms over payload bytes
    "mm_entropy" ->
      """WITH m AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, CAST(nb AS BIGINT) AS n_bytes,
        |    list_transform(generate_series(1, nb), i -> substr(hx, i*2 - 1, 2)) AS bp
        |  FROM m
        |), u AS (SELECT doc_id, unnest(bp) AS b FROM p),
        |c AS (SELECT doc_id, b, count(*) AS cnt FROM u GROUP BY 1, 2),
        |e AS (
        |  SELECT c.doc_id,
        |    CAST(count(*) AS INT) AS n_distinct_bytes,
        |    CAST(sum(CAST(round(-(CAST(cnt AS DOUBLE) / n_bytes) *
        |      ln(CAST(cnt AS DOUBLE) / n_bytes) * 1e6) AS BIGINT)) AS BIGINT) AS entropy_micro
        |  FROM c JOIN p ON c.doc_id = p.doc_id GROUP BY 1
        |)
        |SELECT p.doc_id, p.n_bytes,
        |  coalesce(e.n_distinct_bytes, 0) AS n_distinct_bytes,
        |  coalesce(e.entropy_micro, 0) AS entropy_micro
        |FROM p LEFT JOIN e USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_entropy" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ''), x -> x != '') AS chars
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, CAST(len(chars) AS BIGINT) AS n_chars,
        |    len(list_distinct(chars)) AS n_distinct
        |  FROM t
        |), u AS (SELECT doc_id, unnest(chars) AS ch FROM t),
        |c AS (SELECT doc_id, ch, count(*) AS cnt FROM u GROUP BY 1, 2),
        |e AS (
        |  SELECT c.doc_id,
        |    CAST(sum(CAST(round(-(CAST(cnt AS DOUBLE) / n_chars) *
        |      ln(CAST(cnt AS DOUBLE) / n_chars) * 1e6) AS BIGINT)) AS BIGINT) AS entropy_micro
        |  FROM c JOIN s ON c.doc_id = s.doc_id GROUP BY 1
        |)
        |SELECT s.doc_id, s.n_chars, s.n_distinct,
        |  coalesce(e.entropy_micro, 0) AS entropy_micro
        |FROM s LEFT JOIN e USING (doc_id) ORDER BY doc_id""".stripMargin,
    "dedup_paragraph" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || '. Subscribe to our newsletter for the latest updates. All rights reserved'
        |      ELSE text END AS text
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, md5(trim(lower(sent))) AS sent_hash
        |  FROM (SELECT doc_id, unnest(string_split_regex(text, '\.\s+')) AS sent
        |        FROM docs)
        |  WHERE length(trim(sent)) > 0
        |)
        |SELECT sent_hash, count(*) AS n_occ,
        |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keep_doc
        |FROM s GROUP BY sent_hash HAVING count(*) > 1
        |ORDER BY sent_hash""".stripMargin,
    // G1: 5 PageRank iterations unrolled as CTE stages — every double
    // of the textbook formulation replaced by exact integer micro ops
    // (r' = 150000 + (85·Σ(r div deg)) div 100), so the replay is
    // bit-exact. DuckDB `//` and Spark `div` agree on positive longs.
    // G1's unrolled-CTE replay with the teleport confined to the seed
    // cohort (nation-0 customers); integer arithmetic → hash-exact
    "g_ppr" -> {
      val base =
        """WITH b AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |), edges AS (
          |  SELECT src, dst FROM b UNION ALL SELECT dst AS src, src AS dst FROM b
          |), deg AS (
          |  SELECT src, count(*) AS d FROM edges GROUP BY src
          |), ed AS (
          |  SELECT e.src, e.dst, d.d FROM edges e JOIN deg d USING (src)
          |), seeds AS (
          |  SELECT c_custkey * 2 AS node FROM customer WHERE c_nationkey = 0
          |), r0 AS (
          |  SELECT src AS node,
          |    CAST(CASE WHEN src IN (SELECT node FROM seeds)
          |         THEN 1000000 ELSE 0 END AS BIGINT) AS r
          |  FROM deg
          |)""".stripMargin
      val iters = (1 to 5).map { i =>
        s""", r$i AS (
           |  SELECT ed.dst AS node,
           |    CAST(CASE WHEN ed.dst IN (SELECT node FROM seeds)
           |           THEN 150000 ELSE 0 END
           |      + (85 * sum(r.r // ed.d)) // 100 AS BIGINT) AS r
           |  FROM ed JOIN r${i - 1} r ON r.node = ed.src GROUP BY ed.dst
           |)""".stripMargin
      }.mkString
      base + iters +
        """
          |SELECT node, r AS rank_micro,
          |  node IN (SELECT node FROM seeds) AS is_seed
          |FROM r5 ORDER BY r DESC, node LIMIT 20""".stripMargin
    },
    "g_pagerank" -> {
      val base =
        """WITH b AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |), edges AS (
          |  SELECT src, dst FROM b UNION ALL SELECT dst AS src, src AS dst FROM b
          |), deg AS (
          |  SELECT src, count(*) AS d FROM edges GROUP BY src
          |), ed AS (
          |  SELECT e.src, e.dst, d.d FROM edges e JOIN deg d USING (src)
          |), r0 AS (
          |  SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg
          |)""".stripMargin
      val iters = (1 to 5).map { i =>
        s""", r$i AS (
           |  SELECT ed.dst AS node,
           |    CAST(150000 + (85 * sum(r.r // ed.d)) // 100 AS BIGINT) AS r
           |  FROM ed JOIN r${i - 1} r ON r.node = ed.src GROUP BY ed.dst
           |)""".stripMargin
      }.mkString
      base + iters +
        "\nSELECT node, r AS rank_micro FROM r5 ORDER BY r DESC, node LIMIT 20"
    },
    "emb_matryoshka" ->
      """WITH p(dp) AS (VALUES (8), (16), (32), (64)),
        |sims AS (
        |  SELECT p.dp, q.vec_id AS q_id, c.vec_id AS vec_id,
        |    round(list_cosine_similarity(
        |      list_transform(q.embedding[1:p.dp], x -> CAST(x AS DOUBLE)),
        |      list_transform(c.embedding[1:p.dp], x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id, p
        |), top AS (
        |  SELECT dp, q_id, vec_id FROM (
        |    SELECT dp, q_id, vec_id,
        |      row_number() OVER (PARTITION BY dp, q_id ORDER BY sim DESC, vec_id) AS rnk
        |    FROM sims
        |  ) WHERE rnk <= 5
        |), fullset AS (
        |  SELECT q_id, vec_id FROM top WHERE dp = 64
        |)
        |SELECT t.dp AS dim_prefix,
        |  CAST(sum(CASE WHEN f.q_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_matched,
        |  CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(round(CAST(sum(CASE WHEN f.q_id IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
        |    * 1e6 / count(*)) AS BIGINT) AS recall_micro
        |FROM top t LEFT JOIN fullset f ON f.q_id = t.q_id AND f.vec_id = t.vec_id
        |GROUP BY t.dp ORDER BY dim_prefix""".stripMargin,
    "q_mad_outliers" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), med AS (
        |  SELECT event_type,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS med
        |  FROM daily GROUP BY event_type
        |), wm AS (
        |  SELECT daily.event_type, d, n, med, abs(n - med) AS ad
        |  FROM daily JOIN med USING (event_type)
        |), mad AS (
        |  SELECT event_type,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) AS mad
        |  FROM wm GROUP BY event_type
        |)
        |SELECT wm.event_type, d, n, med, mad,
        |  CASE WHEN mad > 0 THEN CAST(round(CAST(ad AS DOUBLE) * 1e6 /
        |    (1.4826 * CAST(mad AS DOUBLE))) AS BIGINT) END AS robust_z_micro,
        |  (mad > 0 AND CAST(ad AS DOUBLE) > 3.0 * 1.4826 * CAST(mad AS DOUBLE))
        |    AS is_outlier
        |FROM wm JOIN mad USING (event_type)
        |ORDER BY event_type, d""".stripMargin,
    "ts_snaive" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |)
        |SELECT a.d, a.y AS actual_micro, b.y AS forecast_micro,
        |  abs(a.y - b.y) AS abs_err_micro
        |FROM daily a JOIN daily b ON a.d = b.d + 7
        |ORDER BY a.d""".stripMargin,
    "ts_decompose" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), dd AS (
        |  SELECT datediff('day', DATE '1995-01-01', d) AS x, y FROM daily
        |), g AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM dd
        |)
        |SELECT CAST(((x % 7) + 7) % 7 AS INT) AS dow,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(round(CAST(sum(y) AS DOUBLE) / count(*)) AS BIGINT) AS dow_mean_micro,
        |  CAST(round(CAST(sum(y) AS DOUBLE) * CAST(g.n AS DOUBLE) * 1e6 /
        |    (CAST(count(*) AS DOUBLE) * CAST(g.sy AS DOUBLE))) AS BIGINT)
        |    AS seasonal_ratio_micro,
        |  CAST(round(CAST(g.n * g.sxy - g.sx * g.sy AS DOUBLE) /
        |    CAST(g.n * g.sxx - g.sx * g.sx AS DOUBLE)) AS BIGINT)
        |    AS slope_micro_per_day
        |FROM dd, g
        |GROUP BY ((x % 7) + 7) % 7, g.n, g.sy, g.sxy, g.sx, g.sxx
        |ORDER BY dow""".stripMargin,
    // F10: same F2 slope CTE; floor-means on the min-shifted detrended
    // series (div vs // agree on nonnegatives); HUGEINT variance
    // numerators; one double division per score at the end
    "ts_strength" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), dd AS (
        |  SELECT datediff('day', DATE '1995-01-01', d) AS x, y FROM daily
        |), g AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM dd
        |), sl AS (
        |  SELECT CAST(round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) AS slope
        |  FROM g
        |), z0 AS (
        |  SELECT x, y, y - sl.slope * x AS z,
        |    CAST(((x % 7) + 7) % 7 AS INT) AS dow
        |  FROM dd, sl
        |), zm AS (SELECT min(z) AS zmin FROM z0),
        |z AS (SELECT z0.*, z0.z - zm.zmin AS zp FROM z0, zm),
        |sd AS (SELECT dow, sum(zp) // count(*) AS mp FROM z GROUP BY 1),
        |r AS (
        |  SELECT z.z, z.zp - sd.mp AS r, z.y - (sd.mp + zm.zmin) AS des
        |  FROM z JOIN sd USING (dow), zm
        |), v AS (
        |  SELECT count(*) AS n,
        |    count(*) * sum(CAST(z AS HUGEINT) * z) -
        |      sum(CAST(z AS HUGEINT)) * sum(CAST(z AS HUGEINT)) AS dz,
        |    count(*) * sum(CAST(r AS HUGEINT) * r) -
        |      sum(CAST(r AS HUGEINT)) * sum(CAST(r AS HUGEINT)) AS dr,
        |    count(*) * sum(CAST(des AS HUGEINT) * des) -
        |      sum(CAST(des AS HUGEINT)) * sum(CAST(des AS HUGEINT)) AS dd2
        |  FROM r
        |)
        |SELECT CAST(v.n AS BIGINT) AS n_days, sl.slope AS slope_micro_per_day,
        |  CASE WHEN dz > 0 THEN CAST(round(1e6 * greatest(0.0,
        |    1.0 - CAST(dr AS DOUBLE) / CAST(dz AS DOUBLE))) AS BIGINT) END
        |    AS seasonal_strength_micro,
        |  CASE WHEN dd2 > 0 THEN CAST(round(1e6 * greatest(0.0,
        |    1.0 - CAST(dr AS DOUBLE) / CAST(dd2 AS DOUBLE))) AS BIGINT) END
        |    AS trend_strength_micro
        |FROM v, sl""".stripMargin,
    // sequence patterns: same symbol encoding, same (ts, event_id)
    // order, RE2-safe regexes evaluate identically in both engines
    "e_seq_pattern" ->
      """WITH seq AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
        |  FROM events GROUP BY user_id
        |), pats AS (
        |  SELECT * FROM (VALUES
        |    ('browse_to_buy', 'v[cv]*p'),
        |    ('error_then_churn', 'e[^p]*$'),
        |    ('retry_loop', 'ee')) AS t(pattern, re)
        |)
        |SELECT pattern,
        |  CAST(sum(CASE WHEN regexp_matches(s, re) THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |  count(*) AS n_users,
        |  (1000000 * CAST(sum(CASE WHEN regexp_matches(s, re) THEN 1 ELSE 0 END) AS BIGINT)) // count(*)
        |    AS match_rate_micro
        |FROM seq, pats GROUP BY pattern ORDER BY pattern""".stripMargin,
    // Theil-Sen: floor(x+0.5) slopes on bit-equal integer divisions,
    // percentile_disc median — order statistics only
    "ts_mann_kendall" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), dd AS (
        |  SELECT d, y, CAST(((datediff('day', DATE '1995-01-01', d) % 7) + 7) % 7 AS BIGINT) AS dow
        |  FROM daily
        |), sgn AS (
        |  SELECT a.dow AS dow,
        |    CAST(sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM dd a JOIN dd b ON a.dow = b.dow AND a.d < b.d GROUP BY 1
        |), cnt AS (
        |  SELECT dow, CAST(count(*) AS BIGINT) AS n FROM dd GROUP BY 1
        |), ties AS (
        |  SELECT dow, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
        |  FROM (SELECT dow, y, CAST(count(*) AS BIGINT) AS t FROM dd GROUP BY 1, 2)
        |  WHERE t > 1 GROUP BY dow
        |), base AS (
        |  SELECT cnt.dow, cnt.n, coalesce(sgn.s, 0) AS s,
        |    cnt.n * (cnt.n - 1) * (2 * cnt.n + 5) - coalesce(ties.tie_term, 0) AS var18
        |  FROM cnt LEFT JOIN sgn ON cnt.dow = sgn.dow
        |  LEFT JOIN ties ON cnt.dow = ties.dow
        |), z AS (
        |  SELECT dow, n, s, var18,
        |    CASE WHEN var18 <= 0 THEN 0
        |    ELSE CAST(floor((CAST(CASE WHEN s > 0 THEN s - 1 WHEN s < 0 THEN s + 1 ELSE 0 END AS DOUBLE)
        |      / sqrt(CAST(var18 AS DOUBLE) / 18.0)) * 1e6 + 0.5) AS BIGINT) END AS z_micro
        |  FROM base
        |)
        |SELECT dow, n, s, var18, z_micro,
        |  CASE WHEN z_micro >= 1959964 THEN 'increasing'
        |    WHEN z_micro <= -1959964 THEN 'decreasing'
        |    ELSE 'no_trend' END AS trend
        |FROM z ORDER BY dow""".stripMargin,
    "ts_theil_sen" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), d0 AS (
        |  SELECT CAST(datediff('day', DATE '1995-01-01', d) AS BIGINT) AS x, y
        |  FROM daily
        |), p AS (
        |  SELECT CAST(floor(CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) + 0.5) AS BIGINT) AS s
        |  FROM d0 a JOIN d0 b ON a.x < b.x
        |)
        |SELECT (SELECT count(*) FROM daily) AS n_days,
        |  count(*) AS n_pairs,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY s) AS BIGINT)
        |    AS slope_micro_per_day
        |FROM p""".stripMargin,
    // seasonal-residual anomaly: per-DOW median level removed first,
    // then the 3·1.4826·MAD gate — order statistics only, no big sums
    "ts_residual_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), d0 AS (
        |  SELECT d, y, CAST(((datediff('day', DATE '1995-01-01', d) % 7) + 7) % 7 AS INT) AS dow
        |  FROM daily
        |), dm AS (
        |  SELECT dow,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY y) AS BIGINT) AS dow_med
        |  FROM d0 GROUP BY dow
        |), r AS (
        |  SELECT d, y, d0.dow, dow_med,
        |    y - dow_med AS resid_micro, abs(y - dow_med) AS ad
        |  FROM d0 JOIN dm ON d0.dow = dm.dow
        |), m AS (
        |  SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) AS BIGINT) AS mad
        |  FROM r
        |)
        |SELECT d, y AS y_micro, dow, dow_med, resid_micro, mad AS mad_micro,
        |  (mad > 0 AND ad > 3.0 * 1.4826 * mad) AS is_anomaly
        |FROM r, m ORDER BY d""".stripMargin,
    "ts_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), t AS (
        |  SELECT sum(y) AS total, count(*) AS n FROM daily
        |), c AS (
        |  SELECT d, y,
        |    sum(y) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cs,
        |    row_number() OVER (ORDER BY d) AS i
        |  FROM daily
        |), s AS (
        |  SELECT c.d, c.y,
        |    CAST(c.cs - c.i * (t.total // t.n) AS BIGINT) AS cusum_micro
        |  FROM c, t
        |)
        |SELECT d, y AS y_micro, cusum_micro,
        |  (row_number() OVER (ORDER BY abs(cusum_micro) DESC, d) = 1) AS is_changepoint
        |FROM s ORDER BY d""".stripMargin,
    // The window form is the SEMANTIC spec of the domain cap; the Spark
    // plan computes the same keeper set with a bounded mergeable top-k
    // aggregate (skew-immune map-side capping, see textDomainCap).
    "text_domain_cap" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    (CAST(doc_id AS BIGINT) * 2654435761) % 4294967296 AS h
        |  FROM documents
        |), r AS (
        |  SELECT source, doc_id, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
        |      AS keep_rank,
        |    count(*) OVER (PARTITION BY source) AS n_source
        |  FROM h
        |)
        |SELECT source, doc_id, CAST(keep_rank AS BIGINT) AS keep_rank,
        |  CAST(n_source AS BIGINT) AS n_source
        |FROM r WHERE keep_rank <= 15
        |ORDER BY source, keep_rank""".stripMargin,
    // Same anchor-vote formulation as the Spark plan: a slot matches a
    // given (doc, anchor) at most once, so count(*) = plen ⇔ full match.
    "text_phrase" ->
      """WITH p AS (
        |  SELECT * FROM (VALUES (0, 'window batch'), (1, 'batch batch batch'),
        |    (2, 'spark table small'), (3, 'data row column')) AS t(phrase_id, phrase)
        |), ps AS (
        |  SELECT phrase_id, phrase, string_split(phrase, ' ') AS pt FROM p
        |), slots AS (
        |  SELECT phrase_id, phrase, pt[i] AS term, i - 1 AS slot, len(pt) AS plen
        |  FROM ps, unnest(range(1, len(pt) + 1)) AS u(i)
        |), d AS (
        |  SELECT doc_id, list_filter(
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
        |    x -> x != '') AS toks
        |  FROM documents
        |), post AS (
        |  SELECT doc_id, toks[i] AS term, i - 1 AS pos
        |  FROM d, unnest(range(1, len(toks) + 1)) AS u(i)
        |), m AS (
        |  SELECT s.phrase_id, s.phrase, s.plen, post.doc_id,
        |    post.pos - s.slot AS anchor
        |  FROM post JOIN slots s USING (term)
        |  WHERE post.pos - s.slot >= 0
        |), full_match AS (
        |  SELECT phrase_id, phrase, doc_id, anchor
        |  FROM m GROUP BY phrase_id, phrase, plen, doc_id, anchor
        |  HAVING count(*) = plen
        |)
        |SELECT CAST(phrase_id AS BIGINT) AS phrase_id, phrase, doc_id,
        |  CAST(count(*) AS BIGINT) AS n_occ
        |FROM full_match GROUP BY phrase_id, phrase, doc_id
        |ORDER BY phrase_id, doc_id""".stripMargin,
    // ln is libm on both engines (may differ in the last ulp) but keys
    // are pico-rounded: a flip needs a value within ~1e-10 of a .5
    // boundary — not observed at these SFs, same convention as text_pmi.
    "t_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars AS w,
        |    ((CAST(doc_id AS BIGINT) * 2654435761) % 4294967296 + 0.5)
        |      / 4294967296.0 AS u
        |  FROM documents WHERE n_chars > 0
        |)
        |SELECT doc_id, w,
        |  CAST(round(-ln(u) / w * 1e12) AS BIGINT) AS key_pico
        |FROM h
        |ORDER BY key_pico, doc_id LIMIT 100""".stripMargin,
    // weights interpolated from the same ewmaWeights the Spark plan
    // compiles in — exact integers, HUGEINT ↔ decimal(38,0) numerator
    "ts_ewma" -> {
      val vals = graft.queries.TimeSeries.ewmaWeights(14).zipWithIndex
        .map { case (w, j) => s"($j, $w)" }.mkString(", ")
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
         |  FROM orders GROUP BY 1
         |), i AS (
         |  SELECT d, y, row_number() OVER (ORDER BY d) AS i FROM daily
         |), wts AS (
         |  SELECT * FROM (VALUES $vals) AS t(j, wt)
         |), a AS (
         |  SELECT i.i + w.j AS ti,
         |    sum(CAST(i.y AS HUGEINT) * w.wt) AS num, sum(w.wt) AS den
         |  FROM i, wts w GROUP BY 1
         |)
         |SELECT i.d, i.y AS y_micro,
         |  CAST(round(CAST(a.num AS DOUBLE) / CAST(a.den AS DOUBLE)) AS BIGINT)
         |    AS ewma_micro,
         |  i.y - CAST(round(CAST(a.num AS DOUBLE) / CAST(a.den AS DOUBLE)) AS BIGINT)
         |    AS dev_micro
         |FROM i JOIN a ON a.ti = i.i ORDER BY d""".stripMargin
    },
    // F11: F4's exact truncated-EWMA pass applied twice (s2 smooths
    // the ROUNDED s1 longs, so both passes replay bit-equal), then
    // Brown's level/trend with the one α/(1−α)=1/3 division on
    // bit-equal integers — an integer/3.0 can never land on a .5
    // rounding boundary, so round() agrees across engines
    "ts_holt" -> {
      val vals = graft.queries.TimeSeries.ewmaWeights(14).zipWithIndex
        .map { case (w, j) => s"($j, $w)" }.mkString(", ")
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
         |  FROM orders GROUP BY 1
         |), i1 AS (
         |  SELECT d, y, row_number() OVER (ORDER BY d) AS i FROM daily
         |), wts AS (
         |  SELECT * FROM (VALUES $vals) AS t(j, wt)
         |), a1 AS (
         |  SELECT i1.i + w.j AS ti,
         |    sum(CAST(i1.y AS HUGEINT) * w.wt) AS num, sum(w.wt) AS den
         |  FROM i1, wts w GROUP BY 1
         |), p1 AS (
         |  SELECT i1.d, i1.y, i1.i,
         |    CAST(round(CAST(a1.num AS DOUBLE) / CAST(a1.den AS DOUBLE)) AS BIGINT) AS s1
         |  FROM i1 JOIN a1 ON a1.ti = i1.i
         |), a2 AS (
         |  SELECT p.i + w.j AS ti,
         |    sum(CAST(p.s1 AS HUGEINT) * w.wt) AS num, sum(w.wt) AS den
         |  FROM p1 p, wts w GROUP BY 1
         |), p2 AS (
         |  SELECT p1.d, p1.y, p1.s1,
         |    CAST(round(CAST(a2.num AS DOUBLE) / CAST(a2.den AS DOUBLE)) AS BIGINT) AS s2
         |  FROM p1 JOIN a2 ON a2.ti = p1.i
         |), f AS (
         |  SELECT d, y, 2 * s1 - s2 AS lvl,
         |    CAST(round(CAST(s1 - s2 AS DOUBLE) / 3.0) AS BIGINT) AS trend
         |  FROM p2
         |), b AS (
         |  SELECT d, y AS y_micro,
         |    lag(lvl) OVER (ORDER BY d) + lag(trend) OVER (ORDER BY d)
         |      AS forecast_micro
         |  FROM f
         |)
         |SELECT d, y_micro, forecast_micro,
         |  abs(y_micro - forecast_micro) AS abs_err_micro
         |FROM b WHERE forecast_micro IS NOT NULL ORDER BY d""".stripMargin
    },
    // F12: per-term micro-rounded cos/sin (the adamic-adar ln
    // convention) then exact HUGEINT sums; the normalization is the
    // same IEEE op sequence on bit-equal integers in both engines
    "ts_periodogram" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), i AS (
        |  SELECT d, y, row_number() OVER (ORDER BY d) - 1 AS t FROM daily
        |), st AS (
        |  SELECT CAST(sum(y) AS BIGINT) AS sy, count(*) AS n FROM i
        |), c AS (
        |  SELECT i.t, i.y - (st.sy // st.n) AS yc, st.n, p.p
        |  FROM i, st, (SELECT unnest(range(2, 15)) AS p) p
        |), tm AS (
        |  SELECT p, n, yc,
        |    CAST(round(cos((t % p) * 6.283185307179586 / p) * 1e6) AS BIGINT) AS cv,
        |    CAST(round(sin((t % p) * 6.283185307179586 / p) * 1e6) AS BIGINT) AS sv
        |  FROM c
        |), pr AS (
        |  SELECT p,
        |    sum(CAST(yc AS HUGEINT) * cv) AS cc,
        |    sum(CAST(yc AS HUGEINT) * sv) AS ss,
        |    max(n) AS n
        |  FROM tm GROUP BY p
        |), nd AS (
        |  SELECT CAST(p AS BIGINT) AS period,
        |    CAST(cc AS DOUBLE) / n / 1e12 AS cd,
        |    CAST(ss AS DOUBLE) / n / 1e12 AS sd
        |  FROM pr
        |), pw AS (
        |  SELECT period, cd * cd + sd * sd AS spec_power FROM nd
        |)
        |SELECT period, spec_power,
        |  (row_number() OVER (ORDER BY spec_power DESC, period) = 1
        |    AND spec_power > 0) AS dominant
        |FROM pw ORDER BY period""".stripMargin,
    "q_winsorize" ->
      """WITH p AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice * 1e6) AS BIGINT) AS v
        |  FROM orders
        |), cuts AS (
        |  SELECT grp,
        |    CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p_lo,
        |    CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY v) AS BIGINT) AS p_hi
        |  FROM p GROUP BY 1
        |)
        |SELECT p.grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN v < p_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
        |  CAST(sum(CASE WHEN v > p_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
        |  min(p_lo) AS p_lo_micro, min(p_hi) AS p_hi_micro,
        |  CAST(round(CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) / count(*)) AS BIGINT)
        |    AS mean_micro,
        |  CAST(round(CAST(sum(CAST(least(greatest(v, p_lo), p_hi) AS HUGEINT)) AS DOUBLE)
        |    / count(*)) AS BIGINT) AS wmean_micro
        |FROM p JOIN cuts USING (grp)
        |GROUP BY p.grp ORDER BY p.grp""".stripMargin,
    // Q51: the oracle checks the SERVED RESULT equals the direct
    // aggregate — the substitution itself (MV files scanned, orders
    // untouched) is plan-asserted in Round17Spec
    "q_mv_rewrite" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "t_impute" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice * 1e6) AS BIGINT) AS raw,
        |    (o_orderkey % 7 = 0) AS miss
        |  FROM orders
        |), obs AS (SELECT grp, raw FROM base WHERE NOT miss),
        |gmed AS (
        |  SELECT grp,
        |    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY raw) AS BIGINT) AS gmed
        |  FROM obs GROUP BY 1
        |), gl AS (
        |  SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY raw) AS BIGINT) AS gl
        |  FROM obs
        |)
        |SELECT b.grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN b.miss THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed,
        |  min(g.gmed) AS impute_micro,
        |  CAST(round(CAST(sum(CAST(CASE WHEN b.miss THEN coalesce(g.gmed, gl.gl)
        |    ELSE b.raw END AS HUGEINT)) AS DOUBLE) / count(*)) AS BIGINT) AS mean_micro
        |FROM base b LEFT JOIN gmed g USING (grp), gl
        |GROUP BY b.grp ORDER BY b.grp""".stripMargin,
    "q_assoc_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem
        |), n AS (SELECT count(DISTINCT o) AS n_orders FROM items),
        |ic AS (SELECT i, count(*) AS c_i FROM items GROUP BY 1),
        |pairs AS (
        |  SELECT x.i AS a, y.i AS b, count(*) AS c_ab
        |  FROM items x JOIN items y ON x.o = y.o AND x.i < y.i
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |), rules AS (
        |  SELECT a AS ante, b AS cons, c_ab FROM pairs
        |  UNION ALL
        |  SELECT b AS ante, a AS cons, c_ab FROM pairs
        |)
        |SELECT r.ante, r.cons, CAST(r.c_ab AS BIGINT) AS c_ab,
        |  CAST(ia.c_i AS BIGINT) AS c_ante, CAST(ic2.c_i AS BIGINT) AS c_cons,
        |  CAST(round(CAST(r.c_ab AS DOUBLE) * 1e6 / n.n_orders) AS BIGINT)
        |    AS support_micro,
        |  CAST(round(CAST(r.c_ab AS DOUBLE) * 1e6 / ia.c_i) AS BIGINT)
        |    AS conf_micro,
        |  CAST(round(CAST(r.c_ab AS DOUBLE) * n.n_orders * 1e6 /
        |    (CAST(ia.c_i AS DOUBLE) * ic2.c_i)) AS BIGINT) AS lift_micro
        |FROM rules r
        |JOIN ic ia ON ia.i = r.ante
        |JOIN ic ic2 ON ic2.i = r.cons, n
        |ORDER BY lift_micro DESC, ante, cons LIMIT 20""".stripMargin,
    "g_communities" -> {
      val base =
        """WITH b AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |), edges AS (
          |  SELECT src, dst FROM b UNION ALL SELECT dst AS src, src AS dst FROM b
          |), l0 AS (
          |  SELECT DISTINCT src AS node, src AS label FROM edges
          |)""".stripMargin
      val iters = (1 to 4).map { i =>
        s""", l$i AS (
           |  SELECT node, label FROM (
           |    SELECT e.dst AS node, l.label, count(*) AS c,
           |      row_number() OVER (PARTITION BY e.dst
           |        ORDER BY count(*) DESC, l.label ASC) AS rn
           |    FROM edges e JOIN l${i - 1} l ON l.node = e.src
           |    GROUP BY e.dst, l.label
           |  ) WHERE rn = 1
           |)""".stripMargin
      }.mkString
      base + iters +
        "\nSELECT node, label AS community FROM l4 ORDER BY node"
    },
    // G10: the oracle reaches the same component labels by transitive
    // closure (recursive CTE) + min-reachable-id — a different route
    // than the engine's pointer jumping, valid because converged
    // min-label CC is schedule-independent (label = component min)
    "g_components" ->
      """WITH RECURSIVE b AS (
        |  SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT o_orderkey) >= 2
        |), edges AS (
        |  SELECT a AS src, b AS dst FROM b UNION SELECT b, a FROM b
        |), walk(src, reach) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, w.reach FROM edges e JOIN walk w ON e.dst = w.src
        |), lbl AS (
        |  SELECT src AS node, min(reach) AS component FROM walk GROUP BY 1
        |), sz AS (
        |  SELECT component, CAST(count(*) AS BIGINT) AS comp_size
        |  FROM lbl GROUP BY 1
        |)
        |SELECT l.node, l.component, s.comp_size
        |FROM lbl l JOIN sz s USING (component) ORDER BY node""".stripMargin,
    "g_triangles" ->
      """WITH pp AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |), deg AS (
        |  SELECT n, count(*) AS d FROM (
        |    SELECT a AS n FROM pp UNION ALL SELECT b AS n FROM pp
        |  ) GROUP BY n
        |), o AS (
        |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND pp.a < pp.b)
        |           THEN pp.a ELSE pp.b END AS src,
        |         CASE WHEN da.d < db.d OR (da.d = db.d AND pp.a < pp.b)
        |           THEN pp.b ELSE pp.a END AS dst
        |  FROM pp JOIN deg da ON da.n = pp.a JOIN deg db ON db.n = pp.b
        |)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
        |       (SELECT CAST(count(*) AS BIGINT) FROM pp) AS n_edges,
        |       (SELECT CAST(count(*) AS BIGINT)
        |        FROM o e1 JOIN o e2 ON e1.dst = e2.src
        |          JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst) AS n_triangles""".stripMargin,
    // quoted CSV: the oracle rebuilds the identical note (chr(10)
    // newline, literal quotes) straight from parquet — a hash match
    // proves the CSV round-trip was byte-exact on every row
    "src_csv_quoted" ->
      """SELECT o_orderkey, o_custkey,
        |  round(o_totalprice, 2) AS o_totalprice,
        |  md5('order "' || CAST(o_orderkey AS VARCHAR) ||
        |      '", priority, line1' || chr(10) ||
        |      'line2 for cust ' || CAST(o_custkey AS VARCHAR)) AS note_md5,
        |  CAST(length('order "' || CAST(o_orderkey AS VARCHAR) ||
        |      '", priority, line1' || chr(10) ||
        |      'line2 for cust ' || CAST(o_custkey AS VARCHAR)) AS BIGINT) AS note_len
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // Hamming retrieval: identical sign-bit fold (acc·2+b over 32-bit
    // words) and XOR+popcount on both engines — integer-exact
    "ann_hamming" ->
      """WITH enc AS (
        |  SELECT vec_id,
        |    list_transform(generate_series(0, CAST(ceil(len(embedding) / 32.0) AS INT) - 1),
        |      w -> list_reduce(
        |        list_prepend(CAST(0 AS BIGINT),
        |          list_transform(embedding[w*32+1 : w*32+32],
        |            x -> CAST(CASE WHEN x > 0 THEN 1 ELSE 0 END AS BIGINT))),
        |        (acc, b) -> acc * 2 + b)) AS code
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id AS q_id, code AS qcode FROM enc WHERE vec_id < 10
        |), c AS (
        |  SELECT q_id, e.vec_id,
        |    list_sum(list_transform(generate_series(1, len(e.code)),
        |      i -> bit_count(xor(e.code[i], q.qcode[i])))) AS hamming
        |  FROM enc e CROSS JOIN q
        |  WHERE e.vec_id <> q.q_id
        |), r AS (
        |  SELECT q_id, vec_id, CAST(hamming AS BIGINT) AS hamming,
        |    row_number() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS rnk
        |  FROM c
        |)
        |SELECT q_id, CAST(rnk AS INT) AS rnk, vec_id, hamming
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // Bellman-Ford SSSP: 6 unrolled min-plus stages replay the Spark
    // loop exactly (integer weights, INF sentinel, floor division)
    "g_sssp" -> {
      val inf = "1000000000000000"
      val base =
        """WITH w0 AS (
          |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst, count(*) AS n
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |  GROUP BY 1, 2
          |), e AS (
          |  SELECT src, dst, greatest(1, 1000000 // n) AS w FROM w0
          |  UNION ALL
          |  SELECT dst, src, greatest(1, 1000000 // n) FROM w0
          |), sse AS (SELECT min(src) AS sid FROM e),
          |d0 AS (
          |  SELECT n.node, CASE WHEN n.node = sse.sid THEN 0 ELSE %INF% END AS dist
          |  FROM (SELECT DISTINCT src AS node FROM e) n, sse
          |)""".stripMargin.replace("%INF%", inf)
      val stages = (1 to 6).map { i =>
        s""",
           |d$i AS (
           |  SELECT d.node, least(d.dist, coalesce(r.cand, $inf)) AS dist
           |  FROM d${i - 1} d LEFT JOIN (
           |    SELECT e.dst AS node, min(p.dist + e.w) AS cand
           |    FROM e JOIN d${i - 1} p ON p.node = e.src
           |    WHERE p.dist < $inf
           |    GROUP BY e.dst
           |  ) r ON r.node = d.node
           |)""".stripMargin
      }.mkString
      base + stages +
        s"\nSELECT node, CAST(dist AS BIGINT) AS dist_micro FROM d6" +
        s"\nWHERE dist < $inf ORDER BY dist, node LIMIT 20"
    },
    // G11: unrolled multi-source BFS replay — (node, landmark) state,
    // min-combine per hop, integer micro harmonic sum, total-order tie
    "g_closeness" -> {
      val base =
        """WITH p AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |), e AS (
          |  SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p
          |), lms AS (
          |  SELECT node FROM (SELECT DISTINCT src AS node FROM e) ORDER BY node LIMIT 8
          |), d0 AS (
          |  SELECT node, node AS lm, 0 AS dist FROM lms
          |)""".stripMargin
      val stages = (1 to 4).map { i =>
        s""",
           |d$i AS (
           |  SELECT node, lm, min(dist) AS dist FROM (
           |    SELECT node, lm, dist FROM d${i - 1}
           |    UNION ALL
           |    SELECT e.dst AS node, pd.lm, pd.dist + 1 AS dist
           |    FROM e JOIN d${i - 1} pd ON pd.node = e.src
           |  ) u GROUP BY 1, 2
           |)""".stripMargin
      }.mkString
      base + stages +
        """
          |SELECT node, cast(count(*) AS bigint) AS n_landmarks,
          |  cast(sum(1000000 // dist) AS bigint) AS harmonic_micro
          |FROM d4 WHERE dist > 0
          |GROUP BY node ORDER BY harmonic_micro DESC, node LIMIT 20""".stripMargin
    },
    // F13: per-part demand-event weight expansion; z/p/rate each one
    // rounded double division over bit-equal integers
    "ts_croston" -> {
      val vals = graft.queries.TimeSeries.ewmaWeights(14).zipWithIndex
        .map { case (wt, j) => s"($j, $wt)" }.mkString(", ")
      s"""WITH demand AS (
         |  SELECT l_partkey AS part, CAST(o_orderdate AS DATE) AS d,
         |    CAST(round(sum(l_quantity) * 1e6) AS BIGINT) AS q
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2
         |), i AS (
         |  SELECT part, d, q,
         |    row_number() OVER (PARTITION BY part ORDER BY d) AS i,
         |    coalesce(date_diff('day',
         |      lag(d) OVER (PARTITION BY part ORDER BY d), d), 1) * 1000000
         |      AS gap_micro
         |  FROM demand
         |), nn AS (SELECT part, max(i) AS n FROM i GROUP BY 1),
         |wts AS (SELECT * FROM (VALUES $vals) AS t(j, wt)),
         |sm AS (
         |  SELECT i.part, nn.n,
         |    sum(CAST(i.q AS HUGEINT) * w.wt) AS znum,
         |    sum(CAST(i.gap_micro AS HUGEINT) * w.wt) AS pnum,
         |    sum(w.wt) AS den
         |  FROM i JOIN nn ON nn.part = i.part
         |  JOIN wts w ON w.j = nn.n - i.i
         |  WHERE nn.n - i.i < 14
         |  GROUP BY 1, 2
         |), fin AS (
         |  SELECT part, CAST(n AS BIGINT) AS n_demands,
         |    CAST(round(CAST(znum AS DOUBLE) / CAST(den AS DOUBLE)) AS BIGINT) AS z_micro,
         |    CAST(round(CAST(pnum AS DOUBLE) / CAST(den AS DOUBLE)) AS BIGINT) AS p_micro
         |  FROM sm WHERE n >= 5
         |)
         |SELECT part, n_demands, z_micro, p_micro,
         |  CAST(round(1e6 * CAST(z_micro AS DOUBLE) / CAST(p_micro AS DOUBLE)) AS BIGINT)
         |    AS rate_micro
         |FROM fin ORDER BY rate_micro DESC, part LIMIT 20""".stripMargin
    },
    // ACF: floor-mean deviations, HUGEINT term products, one double
    // division per lag on bit-equal 128-bit integers
    "ts_acf" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 1e6) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1
        |), g AS (
        |  SELECT sum(y) AS total, count(*) AS n FROM daily
        |), dev AS (
        |  SELECT d, CAST(y - (g.total // g.n) AS BIGINT) AS dev,
        |    row_number() OVER (ORDER BY d) AS rn
        |  FROM daily, g
        |), den AS (
        |  SELECT sum(CAST(dev AS HUGEINT) * dev) AS den FROM dev
        |), p AS (
        |  SELECT u.k AS k, count(*) AS n_pairs,
        |    sum(CAST(a.dev AS HUGEINT) * b.dev) AS num
        |  FROM dev a CROSS JOIN unnest(generate_series(1, 14)) AS u(k)
        |  JOIN dev b ON b.rn = a.rn - u.k
        |  GROUP BY u.k
        |)
        |SELECT CAST(k AS INT) AS lag, n_pairs,
        |  CAST(round(CAST(num AS DOUBLE) * 1e6 / CAST(den AS DOUBLE)) AS BIGINT) AS acf_micro
        |FROM p, den ORDER BY lag""".stripMargin,
    // transfer matrix: X15's per-token micro-rounding with add-one
    // smoothing over the global vocab; identical tokenizer both sides
    "text_transfer" ->
      """WITH tt AS (
        |  SELECT source, tok FROM (
        |    SELECT source,
        |      unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
        |    FROM documents) WHERE length(tok) > 0
        |), c AS (
        |  SELECT source AS m_source, tok, count(*) AS cnt FROM tt GROUP BY 1, 2
        |), t AS (
        |  SELECT m_source, CAST(sum(cnt) AS BIGINT) AS total FROM c GROUP BY 1
        |), v AS (
        |  SELECT count(DISTINCT tok) AS v FROM tt
        |), srcs AS (
        |  SELECT DISTINCT source AS m_source FROM tt
        |), s AS (
        |  SELECT srcs.m_source, tt.source AS target_source,
        |    CAST(round(ln(CAST(t.total + v.v AS DOUBLE) / (coalesce(c.cnt, 0) + 1)) * 1000000) AS BIGINT) AS m
        |  FROM tt CROSS JOIN srcs
        |  LEFT JOIN c ON c.m_source = srcs.m_source AND c.tok = tt.tok
        |  JOIN t ON t.m_source = srcs.m_source
        |  CROSS JOIN v
        |)
        |SELECT m_source, target_source, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(m) // count(*) AS BIGINT) AS mean_surprisal_micro
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // item-item Jaccard: candidates from the per-part self-join over
    // the degree-capped bipartite graph; similarity is exact over the
    // capped feature universe on both engines
        "g_adamic_adar" ->
      """WITH cs AS (
        |  SELECT DISTINCT o_custkey AS c, l_partkey AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), sdeg AS (
        |  SELECT s, CAST(floor(1000000.0 / ln(d) + 0.5) AS BIGINT) AS w_micro
        |  FROM (SELECT s, count(*) AS d FROM cs GROUP BY s)
        |  WHERE d >= 2 AND d <= 50
        |), w AS (
        |  SELECT x.c AS a, y.c AS b, sdeg.w_micro
        |  FROM cs x JOIN cs y ON x.s = y.s AND x.c < y.c
        |  JOIN sdeg ON sdeg.s = x.s
        |)
        |SELECT a, b, count(*) AS n_common, CAST(sum(w_micro) AS BIGINT) AS aa_micro
        |FROM w GROUP BY a, b
        |ORDER BY aa_micro DESC, a, b LIMIT 25""".stripMargin,
"g_jaccard" ->
      """WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
        |pdeg AS (SELECT p, count(*) AS pd FROM sp GROUP BY p),
        |capped AS (SELECT s, sp.p AS p FROM sp JOIN pdeg USING (p) WHERE pd <= 50),
        |sz AS (SELECT s, count(*) AS sz FROM capped GROUP BY s),
        |i AS (SELECT x.s AS a, y.s AS b, count(*) AS n_shared
        |      FROM capped x JOIN capped y ON x.p = y.p AND x.s < y.s
        |      GROUP BY 1, 2)
        |SELECT a, b, n_shared, sa.sz + sb.sz - n_shared AS n_union,
        |  (1000000 * n_shared) // (sa.sz + sb.sz - n_shared) AS jaccard_micro
        |FROM i JOIN sz sa ON sa.s = i.a JOIN sz sb ON sb.s = i.b
        |ORDER BY jaccard_micro DESC, a, b LIMIT 25""".stripMargin,
    // boilerplate removal: same injection + sentence split as D7, the
    // per-source 10% document-frequency threshold, and the cleaned
    // text fingerprinted after order-preserving reassembly
    "text_boilerplate" ->
      """WITH docs AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || '. Subscribe to our newsletter for the latest updates. All rights reserved'
        |      ELSE text END AS text
        |  FROM documents
        |), arr AS (
        |  SELECT doc_id, source, string_split_regex(text, '\.\s+') AS a FROM docs
        |), s AS (
        |  SELECT doc_id, source, i AS pos, trim(a[i]) AS sent, md5(trim(lower(a[i]))) AS h
        |  FROM arr, unnest(generate_series(1, len(a))) AS u(i)
        |  WHERE length(trim(a[i])) > 0
        |), nd AS (
        |  SELECT source, count(DISTINCT doc_id) AS n_src_docs FROM docs GROUP BY source
        |), bp AS (
        |  SELECT f.source, f.h
        |  FROM (SELECT source, h, count(DISTINCT doc_id) AS df FROM s GROUP BY 1, 2) f
        |  JOIN nd USING (source)
        |  WHERE df * 100 >= 10 * n_src_docs
        |)
        |SELECT doc_id, count(*) AS n_sents,
        |  CAST(count(*) FILTER (WHERE bp.h IS NOT NULL) AS BIGINT) AS n_dropped,
        |  md5(coalesce(string_agg(sent, '. ' ORDER BY pos) FILTER (WHERE bp.h IS NULL), '')) AS clean_md5
        |FROM s LEFT JOIN bp ON s.source = bp.source AND s.h = bp.h
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_substring" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || '. Subscribe to our newsletter for the latest updates. All rights reserved'
        |      ELSE text END AS text
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM docs
        |), spans AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, greatest(len(t) - 7, 0)),
        |      i -> md5(array_to_string(t[i:i+7], ' ')))) AS h
        |  FROM toks
        |), dup AS (
        |  SELECT h, count(DISTINCT doc_id) AS n_docs
        |  FROM spans GROUP BY h HAVING count(*) >= 2
        |)
        |SELECT s.doc_id,
        |  CAST(count(DISTINCT s.h) AS BIGINT) AS n_dup_spans,
        |  CAST(max(d.n_docs) AS BIGINT) AS max_span_docs
        |FROM spans s JOIN dup d USING (h)
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,
    "dedup_substring_remove" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || '. Subscribe to our newsletter for the latest updates. All rights reserved'
        |      ELSE text END AS text
        |  FROM documents
        |), toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM docs
        |), spans AS (
        |  SELECT doc_id, i, md5(array_to_string(t[i:i+7], ' ')) AS h
        |  FROM toks, unnest(generate_series(1, greatest(len(t) - 7, 0))) AS u(i)
        |), flagged AS (
        |  SELECT h FROM spans GROUP BY h HAVING count(*) >= 2
        |), occ AS (
        |  SELECT s.doc_id, s.i,
        |    row_number() OVER (PARTITION BY s.h ORDER BY s.doc_id, s.i) AS rn
        |  FROM spans s JOIN flagged USING (h)
        |), covered AS (
        |  SELECT DISTINCT doc_id, i + d AS pos
        |  FROM occ, unnest(generate_series(0, 7)) AS g(d)
        |  WHERE rn > 1
        |), agg AS (
        |  SELECT doc_id, count(*) AS n_removed, list(pos) AS rm
        |  FROM covered GROUP BY doc_id
        |)
        |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed,
        |  md5(coalesce(array_to_string(list_filter(t.t, (x, i) ->
        |    NOT coalesce(list_contains(a.rm, i), false)), ' '), '')) AS cleaned_md5
        |FROM toks t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""".stripMargin,
    "emb_norm" ->
      """SELECT vec_id, label, len(embedding) AS dim,
        |  round(sqrt(list_aggregate(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')), 4) AS l2_norm
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "emb_rproj" ->
      """WITH p AS (
        |  SELECT vec_id,
        |    list_transform(range(0, 16), j ->
        |      list_sum(list_transform(range(0, CAST(len(embedding) AS BIGINT)), i ->
        |        (1 - 2 * ((((j * len(embedding) + i) * 2654435761) >> 13) & 1))
        |          * CAST(embedding[i + 1] AS DOUBLE))) / sqrt(16.0)) AS y
        |  FROM embeddings
        |)
        |SELECT vec_id, 16 AS out_dim,
        |  CAST(round(y[1] * 1000000) AS BIGINT) AS y1_micro,
        |  CAST(round(sqrt(list_sum(list_transform(y, v -> v * v))) * 1000000) AS BIGINT) AS norm_micro
        |FROM p ORDER BY vec_id""".stripMargin,
    "e_asof_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |c AS (SELECT user_id, ts_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id, ts_us FROM e WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id, p.ts_us AS purchase_us, c.ts_us AS click_us,
        |  p.ts_us - c.ts_us AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
        |ORDER BY p.user_id, purchase_us, p.event_id""".stripMargin,
    "e_stream_asof" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |c AS (SELECT user_id, ts_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id, ts_us FROM e WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id, p.ts_us AS purchase_us, c.ts_us AS click_us,
        |  p.ts_us - c.ts_us AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
        |ORDER BY p.user_id, purchase_us, p.event_id""".stripMargin,
    "e_sliding_window" ->
      """WITH e AS (SELECT epoch_us(ts) AS tus, event_type, value FROM events),
        |w AS (
        |  SELECT unnest([tus // 1800000000 * 1800000000,
        |                 tus // 1800000000 * 1800000000 - 1800000000]) AS window_start_us,
        |    event_type, value
        |  FROM e
        |)
        |SELECT window_start_us, event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e_stream_sliding" ->
      """WITH e AS (SELECT epoch_us(ts) AS tus, event_type, value FROM events),
        |w AS (
        |  SELECT unnest([tus // 1800000000 * 1800000000,
        |                 tus // 1800000000 * 1800000000 - 1800000000]) AS window_start_us,
        |    event_type, value
        |  FROM e
        |)
        |SELECT window_start_us, event_type, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e_stream_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |c AS (SELECT user_id AS cu, ts_us AS click_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id, ts_us AS purchase_us FROM e WHERE event_type = 'purchase')
        |SELECT user_id, event_id, purchase_us, click_us
        |FROM p JOIN c ON user_id = cu
        |  AND click_us <= purchase_us
        |  AND click_us >= purchase_us - 1800000000
        |ORDER BY user_id, purchase_us, event_id, click_us""".stripMargin,
    // end-to-end conservation across two query instances: one duplicated
    // or dropped row anywhere breaks n/n_distinct/total
    "e_stream_resume" ->
      """SELECT event_type, cast(count(*) AS bigint) AS n,
        |  cast(count(DISTINCT event_id) AS bigint) AS n_distinct,
        |  round(sum(value), 2) AS total
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    // LEFT OUTER with the identical interval — null-extended purchases
    // prove the watermark actually flushed the unmatched tail
    "e_stream_outer_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |c AS (SELECT user_id AS cu, ts_us AS click_us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id, ts_us AS purchase_us FROM e WHERE event_type = 'purchase')
        |SELECT user_id, event_id, purchase_us, click_us
        |FROM p LEFT JOIN c ON user_id = cu
        |  AND click_us <= purchase_us
        |  AND click_us >= purchase_us - 1800000000
        |ORDER BY user_id, purchase_us, event_id, click_us""".stripMargin,
    "e_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  cast(sum(CAST(props->>'$.k' AS BIGINT)) AS bigint) AS sum_k,
        |  min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e_json_variant" ->
      """SELECT event_type, count(*) AS n,
        |  cast(sum(CAST(props->>'$.k' AS BIGINT)) AS bigint) AS sum_k,
        |  min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "sink_orc" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sink_compact" ->
      """SELECT '1_fragmented' AS step, CAST(64 AS BIGINT) AS n, true AS ok
        |UNION ALL
        |SELECT '2_compacted', 4, true
        |UNION ALL
        |SELECT '3_rows_kept', (SELECT count(*) FROM events), true
        |ORDER BY step""".stripMargin,
    "emb_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), s AS (
        |  SELECT vec_id, v,
        |    127.0 / list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
        |  FROM e
        |)
        |SELECT vec_id, len(v) AS dim, round(scale, 4) AS scale_r,
        |  CAST(list_aggregate(list_transform(v, x -> round(x * scale)), 'sum') AS BIGINT) AS q_sum,
        |  round(list_aggregate(list_transform(v, x -> abs(x - round(x * scale) / scale)), 'max'), 6) AS max_err
        |FROM s ORDER BY vec_id""".stripMargin,
    // Dedup — D1/D2/D5 deterministic with SQL oracles; D3/D4 are
    // sketch-based (xxhash64 seeds not replayable in DuckDB) → rows-only
    // driver check + exactness specs in ScalaTest.
    "dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS content_hash,
        |  count(*) AS n_docs, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,
    // a vector that deletes a keeper or misses a duplicate breaks this
    "dedup_delete_vectors" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 0 THEN 'DUP_' || CAST((doc_id // 9) % 3 AS VARCHAR)
        |         ELSE text END AS text
        |  FROM documents
        |), k AS (
        |  SELECT md5(text) AS h, min(doc_id) AS keep FROM p GROUP BY 1
        |), s AS (
        |  SELECT p.text, md5(p.text) AS h FROM p
        |  JOIN k ON md5(p.text) = k.h AND p.doc_id = k.keep
        |)
        |SELECT cast(count(*) AS bigint) AS n_docs,
        |  cast(count(DISTINCT h) AS bigint) AS n_distinct,
        |  cast(sum(octet_length(encode(text))) AS bigint) AS total_bytes,
        |  (SELECT cast(count(*) AS bigint) FROM p) - count(*) AS n_deleted
        |FROM s""".stripMargin,
    // containment replays the SAME df cap the operator contracts
    // (candidates from capped shingles, exact verify from full sets)
    "dedup_containment" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), df AS (
        |  SELECT shingle, count(*) AS df FROM sh GROUP BY 1
        |), kept AS (
        |  SELECT sh.doc_id, sh.shingle FROM sh JOIN df USING (shingle) WHERE df <= 50
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS inner_id, b.doc_id AS outer_id
        |  FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        |), inter AS (
        |  SELECT c.inner_id, c.outer_id, count(*) AS i
        |  FROM cand c
        |  JOIN sh x ON x.doc_id = c.inner_id
        |  JOIN sh y ON y.doc_id = c.outer_id AND y.shingle = x.shingle
        |  GROUP BY 1, 2
        |)
        |SELECT inner_id, outer_id, round(i / sa.sz, 4) AS containment
        |FROM inter JOIN sizes sa ON inner_id = sa.doc_id
        |WHERE round(i / sa.sz, 4) >= 0.8
        |ORDER BY inner_id, outer_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT doc_a, doc_b,
        |  round(i / (sa.sz + sb.sz - i), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.5
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), walk(src, reach) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, w.reach FROM edges e JOIN walk w ON e.dst = w.src
        |), lbl AS (
        |  SELECT src AS id, min(reach) AS cluster_id FROM walk GROUP BY 1
        |)
        |SELECT cluster_id, count(*) AS n_members
        |FROM lbl GROUP BY 1 ORDER BY 1""".stripMargin,
    // kNN label vote: A1's exact ranking + (cnt desc, label) argmax
    "ann_knn_eval" ->
      """WITH sims AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id, c.label,
        |    round(list_cosine_similarity(
        |      list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 50 AND c.vec_id <> q.vec_id
        |), nn AS (
        |  SELECT q_id, label FROM (
        |    SELECT q_id, label,
        |      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        |    FROM sims) WHERE rnk <= 5
        |), votes AS (
        |  SELECT q_id, label AS pred_label FROM (
        |    SELECT q_id, label,
        |      row_number() OVER (PARTITION BY q_id ORDER BY cnt DESC, label) AS r
        |    FROM (SELECT q_id, label, count(*) AS cnt FROM nn GROUP BY 1, 2))
        |  WHERE r = 1
        |)
        |SELECT e.label AS true_label, count(*) AS n_eval,
        |  CAST(sum(CASE WHEN v.pred_label = e.label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |  (1000000 * CAST(sum(CASE WHEN v.pred_label = e.label THEN 1 ELSE 0 END) AS BIGINT)) // count(*)
        |    AS acc_micro
        |FROM votes v JOIN embeddings e ON e.vec_id = v.q_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // observe: the in-flight counters must equal a direct aggregate
    "dq_observe" ->
      """WITH g AS (
        |  SELECT count(*) AS observed_rows,
        |    CAST(coalesce(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS observed_null_price,
        |    CAST(coalesce(sum(CAST(round(o_totalprice * 1000000) AS BIGINT)), 0)
        |      AS BIGINT) AS observed_sum_micro
        |  FROM orders
        |)
        |SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  g.observed_rows, g.observed_null_price, g.observed_sum_micro
        |FROM orders CROSS JOIN g
        |GROUP BY 1, g.observed_rows, g.observed_null_price, g.observed_sum_micro
        |ORDER BY month""".stripMargin,
    // FPE: the same keyed per-position digit shift on both engines
    "t_fpe" ->
      """SELECT c_custkey, acct,
        |  array_to_string(list_transform(generate_series(1, 10),
        |    j -> CAST((CAST(substr(acct, j, 1) AS INT) + (j*7 + 3) % 10) % 10 AS VARCHAR)),
        |    '') AS token
        |FROM (SELECT c_custkey, lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS acct
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    // key-sentence: per-doc sentence graph, 0-based positions both sides
    "text_summary" ->
      """WITH s AS (
        |  SELECT doc_id, i - 1 AS pos, trim(a[i]) AS sent
        |  FROM (SELECT doc_id, string_split_regex(text, '\.\s+') AS a FROM documents)
        |  CROSS JOIN unnest(generate_series(1, len(a))) AS u(i)
        |  WHERE length(trim(a[i])) > 0
        |), t AS (
        |  SELECT doc_id, pos, unnest(list_distinct(list_filter(
        |    string_split(trim(regexp_replace(lower(sent), '[^a-z0-9]+', ' ', 'g')), ' '),
        |    x -> length(x) > 0))) AS tok
        |  FROM s
        |), ov AS (
        |  SELECT a.doc_id, a.pos, count(*) AS score
        |  FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok = b.tok AND a.pos <> b.pos
        |  GROUP BY 1, 2
        |), sc AS (
        |  SELECT s.doc_id, s.pos, s.sent, coalesce(ov.score, 0) AS score
        |  FROM s LEFT JOIN ov ON s.doc_id = ov.doc_id AND s.pos = ov.pos
        |), best AS (
        |  SELECT doc_id, pos, sent, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, pos) AS r,
        |    count(*) OVER (PARTITION BY doc_id) AS n_sents
        |  FROM sc
        |)
        |SELECT doc_id, CAST(n_sents AS BIGINT) AS n_sents, CAST(pos AS INT) AS best_pos,
        |  CAST(score AS BIGINT) AS score, md5(sent) AS sent_md5
        |FROM best WHERE r = 1 ORDER BY doc_id""".stripMargin,
    // gram decay: contribution lands at each gram's FIRST occurrence
    "text_gram_decay" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), gd AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS g
        |  FROM t
        |), f AS (
        |  SELECT g, min(doc_id) AS fd FROM gd GROUP BY g
        |), b AS (
        |  SELECT fd // 50 AS bucket, count(*) AS new_grams FROM f GROUP BY 1
        |)
        |SELECT bucket, new_grams,
        |  CAST(sum(new_grams) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_grams
        |FROM b ORDER BY bucket""".stripMargin,
    // point-in-time features: the strictly-before frame on both sides
    "t_feature_asof" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    CAST(round(o_totalprice * 1e6) AS BIGINT) AS spend_micro
        |  FROM orders
        |)
        |SELECT o_orderkey, o_custkey,
        |  CAST(count(*) OVER f AS BIGINT) AS prior_orders,
        |  CAST(coalesce(sum(spend_micro) OVER f, 0) AS BIGINT) AS prior_spend_micro,
        |  CAST(datediff('day', lag(d) OVER w, d) AS INT) AS days_since_prev
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey),
        |  f AS (PARTITION BY o_custkey ORDER BY d, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |ORDER BY o_orderkey""".stripMargin,
    // embedding drift: micro-quantized component sums, cosine on the
    // summed integer vectors (scale-invariant — no centroid division)
    "emb_drift" ->
      """WITH e AS (
        |  SELECT label, CAST(vec_id % 2 = 0 AS INT) AS snapshot,
        |    i AS pos, CAST(round(embedding[i] * 1e6) AS BIGINT) AS q
        |  FROM embeddings
        |  CROSS JOIN unnest(generate_series(1, len(embedding))) AS u(i)
        |), s AS (
        |  SELECT label, snapshot, pos, CAST(sum(q) AS BIGINT) AS s
        |  FROM e GROUP BY 1, 2, 3
        |), n AS (
        |  SELECT label, CAST(vec_id % 2 = 0 AS INT) AS snapshot, count(*) AS n
        |  FROM embeddings GROUP BY 1, 2
        |), dots AS (
        |  SELECT a.label,
        |    sum(CAST(a.s AS HUGEINT) * b.s) AS dot,
        |    sum(CAST(a.s AS HUGEINT) * a.s) AS na,
        |    sum(CAST(b.s AS HUGEINT) * b.s) AS nb
        |  FROM (SELECT * FROM s WHERE snapshot = 0) a
        |  JOIN (SELECT * FROM s WHERE snapshot = 1) b
        |    ON a.label = b.label AND a.pos = b.pos
        |  GROUP BY a.label
        |)
        |SELECT d.label,
        |  (SELECT n FROM n WHERE n.label = d.label AND snapshot = 0) AS n_a,
        |  (SELECT n FROM n WHERE n.label = d.label AND snapshot = 1) AS n_b,
        |  CAST(round(CAST(dot AS DOUBLE) /
        |    (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))) * 1e6) AS BIGINT)
        |    AS centroid_cos_micro
        |FROM dots d ORDER BY d.label""".stripMargin,
    // bounded funnel: the e_funnel oracle with the 1h gap predicate
    // inside each stage's conditional min
    "e_funnel_window" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), v AS (
        |  SELECT user_id, min(us) AS v_us FROM e
        |  WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(us) AS c_us FROM e
        |  JOIN v ON e.user_id = v.user_id AND us > v_us AND us <= v_us + 3600000000
        |  WHERE event_type = 'click' GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, min(us) AS p_us FROM e
        |  JOIN c ON e.user_id = c.user_id AND us > c_us AND us <= c_us + 3600000000
        |  WHERE event_type = 'purchase' GROUP BY 1
        |)
        |SELECT '1_view' AS stage, cast(count(*) AS bigint) AS n_users FROM v
        |UNION ALL
        |SELECT '2_click_within_1h', cast(count(*) AS bigint) FROM c
        |UNION ALL
        |SELECT '3_purchase_within_1h', cast(count(*) AS bigint) FROM p
        |ORDER BY stage""".stripMargin,
    // langid confusion: the X1 oracle's scoring grouped by
    // (truth, predicted)
    "text_langid_eval" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit'))) AS s_de,
        |    len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','it'))) AS s_en,
        |    len(list_filter(toks, x -> x IN ('el','la','los','las','que','y','por','como'))) AS s_es,
        |    len(list_filter(toks, x -> x IN ('le','les','des','et','une','est','dans','pour'))) AS s_fr,
        |    len(list_filter(toks, x -> x IN ('的','是','不','我','了','在'))) AS s_zh
        |  FROM scored
        |), pred AS (
        |  SELECT lang,
        |    CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
        |         WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
        |         WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
        |         WHEN s_fr >= s_zh THEN 'fr'
        |         ELSE 'zh' END AS pred_lang
        |  FROM s
        |)
        |SELECT lang, pred_lang, cast(count(*) AS bigint) AS n
        |FROM pred GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin,
    // gzip JSONL: oracle aggregates the same fields from parquet —
    // a match proves the compressed round-trip field-exact
    "src_jsonl_gz" ->
      """SELECT lang, count(*) AS n,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,
    // local clustering: G2's oriented wedge join, each triangle
    // credits its three corners
    "g_clustering" ->
      """WITH pp AS (
        |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
        |  FROM lineitem x JOIN lineitem y
        |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
        |), deg AS (
        |  SELECT n, count(*) AS d FROM (
        |    SELECT a AS n FROM pp UNION ALL SELECT b AS n FROM pp
        |  ) GROUP BY n
        |), o AS (
        |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND pp.a < pp.b)
        |           THEN pp.a ELSE pp.b END AS src,
        |         CASE WHEN da.d < db.d OR (da.d = db.d AND pp.a < pp.b)
        |           THEN pp.b ELSE pp.a END AS dst
        |  FROM pp JOIN deg da ON da.n = pp.a JOIN deg db ON db.n = pp.b
        |), tri AS (
        |  SELECT n, count(*) AS tri FROM (
        |    SELECT unnest([e1.src, e1.dst, e2.dst]) AS n
        |    FROM o e1 JOIN o e2 ON e1.dst = e2.src
        |      JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst
        |  ) GROUP BY n
        |)
        |SELECT deg.n AS node, CAST(deg.d AS BIGINT) AS degree,
        |  CAST(coalesce(tri.tri, 0) AS BIGINT) AS n_triangles,
        |  (2000000 * CAST(coalesce(tri.tri, 0) AS BIGINT)) // (deg.d * (deg.d - 1))
        |    AS cc_micro
        |FROM deg LEFT JOIN tri ON tri.n = deg.n
        |WHERE deg.d >= 2
        |ORDER BY cc_micro DESC, node LIMIT 25""".stripMargin,
    // fixed-width: oracle projects the fields straight from parquet —
    // hash match proves the render→parse cycle field-exact
    "src_fixed_width" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        |  CAST(round(o_totalprice * 1e6) AS BIGINT) AS price_micro,
        |  CAST(o_orderdate AS DATE) AS d
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // variable binding must be invisible: literal-inlined equivalent
    "q_sql_script" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_quantity >= 45.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // vacuum: the oracle checks the survivors; which files died is
    // spec-pinned (exactly the unreferenced set)
    "sink_vacuum" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total, true AS vacuumed
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_cdf" ->
      """WITH v1 AS (
        |  SELECT o_orderkey AS k, o_totalprice AS p FROM orders
        |  WHERE strftime(o_orderdate, '%Y-%m') < '1997-01'
        |), v2 AS (
        |  SELECT k, CASE WHEN k % 5 = 1 THEN round(p + 100.0, 2) ELSE p END AS p
        |  FROM v1 WHERE k % 5 <> 2
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE strftime(o_orderdate, '%Y-%m') >= '1997-01'
        |), j AS (
        |  SELECT coalesce(v1.k, v2.k) AS o_orderkey, v1.p AS pre_price, v2.p AS post_price
        |  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
        |)
        |SELECT CASE WHEN post_price IS NULL THEN 'delete'
        |         WHEN pre_price IS NULL THEN 'insert'
        |         ELSE 'update' END AS "_change_type",
        |  o_orderkey, pre_price, post_price
        |FROM j
        |WHERE post_price IS NULL OR pre_price IS NULL OR pre_price <> post_price
        |ORDER BY 1, o_orderkey""".stripMargin,
    "sink_clone" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  (SELECT count(*) FROM orders WHERE strftime(o_orderdate, '%Y-%m') < '1997-01')
        |    AS source_rows
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // T39: the KS argmax is exact cross-multiplied integers; only the
    // final per-source scalar divides (micro-rounded, IEEE-identical)
    "dq_ks_drift" ->
      """WITH vals AS (
        |  SELECT source, n_chars AS v FROM documents
        |), tot AS (
        |  SELECT source, count(*) AS ns FROM vals GROUP BY 1
        |), grand AS (
        |  SELECT count(*) AS n FROM vals
        |), grid AS (
        |  SELECT DISTINCT v FROM vals
        |), pv AS (
        |  SELECT source, v, count(*) AS c FROM vals GROUP BY 1, 2
        |), gv AS (
        |  SELECT v, count(*) AS g FROM vals GROUP BY 1
        |), ggrid AS (
        |  SELECT g1.v, sum(coalesce(gv.g, 0)) OVER (ORDER BY g1.v) AS gcs
        |  FROM grid g1 LEFT JOIN gv ON g1.v = gv.v
        |), cum AS (
        |  SELECT t.source, t.ns, g.v,
        |    sum(coalesce(pv.c, 0)) OVER (PARTITION BY t.source ORDER BY g.v) AS cs
        |  FROM tot t CROSS JOIN grid g
        |  LEFT JOIN pv ON pv.source = t.source AND pv.v = g.v
        |), d AS (
        |  SELECT c.source, c.ns, gr.n,
        |    abs(c.cs * (gr.n - c.ns) - (gg.gcs - c.cs) * c.ns) AS num
        |  FROM cum c JOIN ggrid gg ON c.v = gg.v CROSS JOIN grand gr
        |), m AS (
        |  SELECT source, min(ns) AS ns, min(n) AS n, max(num) AS mx
        |  FROM d GROUP BY source
        |)
        |SELECT source, CAST(ns AS BIGINT) AS n_src,
        |  CAST(round(CAST(mx AS DOUBLE) /
        |    (CAST(ns AS DOUBLE) * (n - ns)) * 1e6) AS BIGINT) AS ks_micro
        |FROM m WHERE ns < n ORDER BY source""".stripMargin,
    // T38: the hole rule and per-month counts replay from the raw
    // table; the landed flag derives from the planted i%7==3 drops
    "dq_completeness" ->
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
        |  FROM orders GROUP BY 1
        |), idx AS (
        |  SELECT month, n, row_number() OVER (ORDER BY month) - 1 AS i FROM m
        |), span AS (
        |  SELECT min(month) AS lo, max(month) AS hi FROM m
        |), exp AS (
        |  SELECT strftime(t.m, '%Y-%m') AS month FROM span,
        |    unnest(generate_series(CAST(lo || '-01' AS DATE),
        |      CAST(hi || '-01' AS DATE), INTERVAL 1 MONTH)) AS t(m)
        |)
        |SELECT e.month,
        |  coalesce(i.i % 7 <> 3, false) AS landed,
        |  CASE WHEN coalesce(i.i % 7 <> 3, false) THEN i.n ELSE 0 END AS n_rows
        |FROM exp e LEFT JOIN idx i USING (month) ORDER BY month""".stripMargin,
    // K28: the straddling query's answer must equal the raw table's —
    // both layouts pruned from the manifest, old files' priority
    // filter applied as a residual row predicate
    "sink_part_evolve" ->
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  true AS pruned, CAST(2 AS BIGINT) AS n_specs
        |FROM orders
        |WHERE strftime(o_orderdate, '%Y-%m') >= '1996-10'
        |  AND strftime(o_orderdate, '%Y-%m') <= '1997-03'
        |  AND o_orderpriority = '1-URGENT'""".stripMargin,
    // K26: a restored table must be indistinguishable from never
    // having lost data; the metadata-only mechanics are spec-pinned
    "sink_restore" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  CAST(1 AS BIGINT) AS restored_from_version,
        |  CAST(3 AS BIGINT) AS current_version
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // K27: post-purge table ≡ source projected without the dropped
    // column; zero-write drop + bounded rewrite set are spec-pinned
    "sink_drop_column" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total,
        |  true AS purged, CAST(4 AS BIGINT) AS current_version
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_optimize" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total, true AS optimized
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sink_dyn_overwrite" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n,
        |  round(sum(CASE WHEN strftime(o_orderdate, '%Y-%m') = '1997-03'
        |    THEN round(o_totalprice + 10.0, 2) ELSE o_totalprice END), 2) AS total,
        |  strftime(o_orderdate, '%Y-%m') = '1997-03' AS corrected
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // the streaming twin: restart + exactly-once + evolution all sit
    // under the same raw-table replay hash
    "e_stream_evolve" ->
      """WITH u AS (
        |  SELECT o_totalprice,
        |    CASE WHEN strftime(o_orderdate, '%Y-%m') >= '1997-01'
        |      THEN (CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE 'store' END)
        |    END AS channel
        |  FROM orders
        |)
        |SELECT coalesce(channel, 'pre_evolution') AS channel,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM u GROUP BY 1 ORDER BY channel""".stripMargin,
    // evolution replayed from the raw table: batch-1 months carry a
    // NULL channel (the column predates them), batch-2 months derive it
    "sink_schema_evolve" ->
      """WITH u AS (
        |  SELECT o_totalprice,
        |    CASE WHEN strftime(o_orderdate, '%Y-%m') >= '1997-01'
        |      THEN (CASE WHEN o_orderkey % 3 = 0 THEN 'web' ELSE 'store' END)
        |    END AS channel
        |  FROM orders
        |)
        |SELECT coalesce(channel, 'pre_evolution') AS channel,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total, true AS evolved
        |FROM u GROUP BY 1 ORDER BY channel""".stripMargin,
    // TTL: the oracle sees the surviving aggregate; the by-reference
    // carry (no rewrite) is spec-pinned where the oracle can't reach
    "sink_ttl" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total, true AS pruned
        |FROM orders WHERE strftime(o_orderdate, '%Y-%m') >= '1997-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // RAKE: identical gaps-and-islands segmentation (pos − rank is
    // base-offset-invariant), word scores micro-rounded before sums
    "text_rake" ->
      """WITH toks AS (
        |  SELECT doc_id, i AS pos, t[i] AS tok
        |  FROM (SELECT doc_id,
        |          string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
        |        FROM documents)
        |  CROSS JOIN unnest(generate_series(1, len(t))) AS u(i)
        |  WHERE length(t[i]) > 0
        |), ns AS (
        |  SELECT doc_id, pos, tok,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS run
        |  FROM toks
        |  WHERE tok NOT IN ('the','a','and','of','to','in','is','it')
        |), ph AS (
        |  SELECT doc_id, run, string_agg(tok, ' ' ORDER BY pos) AS phrase,
        |    count(*) AS plen
        |  FROM ns GROUP BY doc_id, run HAVING count(*) <= 3
        |), wx AS (
        |  SELECT plen, unnest(string_split(phrase, ' ')) AS w FROM ph
        |), ws AS (
        |  SELECT w, (1000000 * CAST(sum(plen) AS BIGINT)) // count(*) AS wscore
        |  FROM wx GROUP BY w
        |), dp AS (
        |  SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ,
        |    CAST(max(plen) AS BIGINT) AS plen
        |  FROM ph GROUP BY phrase
        |), scored AS (
        |  SELECT dp.phrase, dp.plen, dp.n_occ,
        |    CAST(sum(ws.wscore) AS BIGINT) AS score_micro
        |  FROM dp CROSS JOIN unnest(string_split(dp.phrase, ' ')) AS t(tw)
        |  JOIN ws ON ws.w = t.tw
        |  GROUP BY dp.phrase, dp.plen, dp.n_occ
        |)
        |SELECT phrase, plen, n_occ, score_micro FROM scored
        |ORDER BY score_micro DESC, phrase LIMIT 20""".stripMargin,
    // band planning: powers by left-fold multiplication (pow() differs
    // in the last ulp between JVM and libm), micro-round before sums
    "dedup_band_plan" ->
      """WITH cfg AS (
        |  SELECT * FROM (VALUES (128,1),(64,2),(32,4),(16,8),(8,16),(4,32),(2,64),(1,128))
        |    AS t(bands, rows_per_band)
        |), pts AS (
        |  SELECT (i + 0.5) / 1000 AS s FROM unnest(generate_series(0, 999)) AS u(i)
        |), curve AS (
        |  SELECT bands, rows_per_band, s,
        |    CAST(floor((1 - qb) * 1e6 + 0.5) AS BIGINT) AS p_micro
        |  FROM (
        |    SELECT bands, rows_per_band, s,
        |      list_reduce(list_prepend(1.0, list_transform(generate_series(1, bands), x -> q)),
        |        (a, b) -> a * b) AS qb
        |    FROM (
        |      SELECT bands, rows_per_band, s,
        |        1 - list_reduce(list_prepend(1.0, list_transform(generate_series(1, rows_per_band), x -> s)),
        |          (a, b) -> a * b) AS q
        |      FROM cfg CROSS JOIN pts))
        |), areas AS (
        |  SELECT bands, rows_per_band,
        |    CAST(floor(sum(CASE WHEN s < 0.5 THEN p_micro ELSE 0 END) / 1000) AS BIGINT) AS fp_area_micro,
        |    CAST(floor(sum(CASE WHEN s >= 0.5 THEN 1000000 - p_micro ELSE 0 END) / 1000) AS BIGINT) AS fn_area_micro
        |  FROM curve GROUP BY 1, 2
        |), wt AS (
        |  SELECT *, fp_area_micro + fn_area_micro AS total_err_micro FROM areas
        |), best AS (
        |  SELECT total_err_micro AS be, bands AS bb FROM wt
        |  ORDER BY total_err_micro, bands LIMIT 1
        |)
        |SELECT wt.bands, wt.rows_per_band, fp_area_micro, fn_area_micro, total_err_micro,
        |  (total_err_micro = be AND wt.bands = bb) AS is_chosen
        |FROM wt CROSS JOIN best ORDER BY wt.bands DESC""".stripMargin,
    // cross-source matrix: the dedup_clusters pair CTE + source labels
    "dedup_cross_source" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.5
        |), lab AS (
        |  SELECT least(da.source, db.source) AS source_a,
        |    greatest(da.source, db.source) AS source_b, p.doc_a, p.doc_b
        |  FROM pairs p
        |  JOIN documents da ON da.doc_id = p.doc_a
        |  JOIN documents db ON db.doc_id = p.doc_b
        |), np AS (
        |  SELECT source_a, source_b, count(*) AS n_pairs FROM lab GROUP BY 1, 2
        |), nd AS (
        |  SELECT source_a, source_b, count(DISTINCT d) AS n_docs
        |  FROM (SELECT source_a, source_b, doc_a AS d FROM lab
        |        UNION ALL SELECT source_a, source_b, doc_b FROM lab)
        |  GROUP BY 1, 2
        |)
        |SELECT np.source_a, np.source_b, np.n_pairs, nd.n_docs
        |FROM np JOIN nd USING (source_a, source_b)
        |ORDER BY source_a, source_b""".stripMargin,
    // SNM: replay both sort passes + the window-offset adjacency and
    // exact-verify with string shingles (the D2 hash-vs-string contract)
    "dedup_snm" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    substr(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), 1, 32) AS k1,
        |    substr(regexp_replace(lower(reverse(text)), '[^a-z0-9]+', ' ', 'g'), 1, 32) AS k2,
        |    list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
        |  FROM (SELECT doc_id, text,
        |          string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |        FROM documents)
        |  WHERE len(toks) >= 3
        |), r1 AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY k1, doc_id) AS rn FROM t
        |), p1 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM r1 a CROSS JOIN unnest(generate_series(1, 4)) AS u(d)
        |  JOIN r1 b ON b.rn = a.rn + u.d
        |), r2 AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY k2, doc_id) AS rn FROM t
        |), p2 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM r2 a CROSS JOIN unnest(generate_series(1, 4)) AS u(d)
        |  JOIN r2 b ON b.rn = a.rn + u.d
        |), cand AS (
        |  SELECT DISTINCT least(id_a, id_b) AS doc_a, greatest(id_a, id_b) AS doc_b
        |  FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
        |), sel AS (
        |  SELECT c.doc_a, c.doc_b,
        |    len(list_filter(ta.sh, x -> list_contains(tb.sh, x))) AS i,
        |    len(ta.sh) AS sa, len(tb.sh) AS sb
        |  FROM cand c
        |  JOIN t ta ON ta.doc_id = c.doc_a
        |  JOIN t tb ON tb.doc_id = c.doc_b
        |)
        |SELECT doc_a, doc_b, round(i / (sa + sb - i), 4) AS jaccard
        |FROM sel WHERE round(i / (sa + sb - i), 4) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,
    // k-core: 8 unrolled synchronous peel stages replay the loop
    "g_kcore" -> {
      val base =
        """WITH pp AS (
          |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |), e0 AS (
          |  SELECT src, dst FROM pp UNION ALL SELECT dst, src FROM pp
          |)""".stripMargin
      // MATERIALIZED: each stage references its predecessor three
      // times — default CTE inlining makes that 3^8 scans of the base
      // tables ("too many open files"), materialization keeps it 8
      val stages = (1 to 8).map { i =>
        s""",
           |k$i AS MATERIALIZED (SELECT src FROM e${i - 1} GROUP BY src HAVING count(*) >= 3),
           |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
           |        JOIN k$i a ON a.src = e.src JOIN k$i b ON b.src = e.dst)""".stripMargin
      }.mkString
      base + stages +
        "\nSELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree" +
        "\nFROM e8 GROUP BY 1 ORDER BY 1"
    },
    // DAG: waves are a pure function of the declared edges
    "p_dag" ->
      """SELECT 'scan' AS task, 1 AS wave, (SELECT count(*) FROM lineitem) AS value
        |UNION ALL SELECT 'orders_agg', 2, (SELECT count(*) FROM orders)
        |UNION ALL SELECT 'customer_agg', 2, (SELECT count(*) FROM customer)
        |UNION ALL SELECT 'report', 3,
        |  (SELECT count(*) FROM orders) + (SELECT count(*) FROM customer)
        |ORDER BY wave, task""".stripMargin,
    // CDC: the identical polynomial fold ((acc·31+code) mod 2^20,
    // prepended-zero seed) finds the same content-defined boundaries
    "dedup_cdc" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |      THEN text || '. Subscribe to our newsletter for the latest updates. All rights reserved'
        |      ELSE text END AS text
        |  FROM documents
        |), ch AS (
        |  SELECT doc_id, text, string_split(text, '') AS cs, length(text) AS n FROM docs
        |), cut AS (
        |  SELECT doc_id, text, n,
        |    list_prepend(0, list_append(
        |      list_filter(
        |        list_filter(generate_series(16, n),
        |          i -> list_reduce(
        |                 list_prepend(CAST(0 AS BIGINT),
        |                   list_transform(generate_series(i - 15, i),
        |                     j -> CAST(ascii(cs[j]) AS BIGINT))),
        |                 (acc, c) -> (acc * 31 + c) % 1048576) % 64 = 0),
        |        x -> x < n),
        |      n)) AS b
        |  FROM ch
        |), chunks AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(b) - 1),
        |      j -> md5(substr(text, b[j] + 1, b[j + 1] - b[j])))) AS h,
        |    unnest(list_transform(generate_series(1, len(b) - 1),
        |      j -> b[j + 1] - b[j])) AS clen
        |  FROM cut
        |)
        |SELECT h AS chunk_hash, CAST(count(*) AS BIGINT) AS n_occ,
        |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keep_doc,
        |  CAST(min(clen) AS BIGINT) AS chunk_len
        |FROM chunks GROUP BY h HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY chunk_hash""".stripMargin,
    // D15: the same recursive-CTE components as dedup_clusters, then
    // per-doc actions — min-id exemplar keeps, size >= 4 quarantines
    "dedup_quarantine" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.5
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), walk(src, reach) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, w.reach FROM edges e JOIN walk w ON e.dst = w.src
        |), lbl AS (
        |  SELECT src AS id, min(reach) AS cluster_id FROM walk GROUP BY 1
        |), csize AS (
        |  SELECT cluster_id, count(*) AS sz FROM lbl GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  coalesce(l.cluster_id, d.doc_id) AS cluster_id,
        |  CAST(coalesce(s.sz, 1) AS BIGINT) AS cluster_size,
        |  CASE WHEN l.cluster_id IS NULL THEN 'keep'
        |       WHEN s.sz >= 4 THEN 'quarantine'
        |       WHEN d.doc_id = l.cluster_id THEN 'keep'
        |       ELSE 'drop' END AS action
        |FROM documents d
        |LEFT JOIN lbl l ON l.id = d.doc_id
        |LEFT JOIN csize s ON s.cluster_id = l.cluster_id
        |ORDER BY d.doc_id""".stripMargin,
    "dedup_keep_best" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
        |  FROM documents
        |), q AS (
        |  SELECT doc_id, len(toks) AS n_tokens FROM t
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM t WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), nd AS (
        |  SELECT doc_a, doc_b FROM pairs
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.5
        |), losers AS (
        |  SELECT DISTINCT CASE WHEN qa.n_tokens < qb.n_tokens THEN doc_a
        |                       WHEN qb.n_tokens < qa.n_tokens THEN doc_b
        |                       ELSE greatest(doc_a, doc_b) END AS doc_id
        |  FROM nd
        |  JOIN q qa ON doc_a = qa.doc_id
        |  JOIN q qb ON doc_b = qb.doc_id
        |)
        |SELECT doc_id, n_tokens FROM q
        |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
        |ORDER BY doc_id""".stripMargin,
    "emb_decontaminate" ->
      """WITH b AS (
        |  SELECT vec_id AS bench_id, embedding FROM embeddings WHERE vec_id < 20
        |), c AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20
        |), sims AS (
        |  SELECT c.vec_id, b.bench_id,
        |    round(list_cosine_similarity(
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM c CROSS JOIN b
        |), r AS (
        |  SELECT vec_id, sim, bench_id,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, bench_id) AS rk
        |  FROM sims
        |)
        |SELECT vec_id, sim AS max_sim, bench_id, sim >= 0.4 AS contaminated
        |FROM r WHERE rk = 1 ORDER BY vec_id""".stripMargin,
    // dedup_embedding has NO oracle: LSH band candidate generation is
    // probabilistic (rows-only check; recall spec in Round8Spec). The
    // old all-pairs SQL survives as the spec's oracle via
    // Dedup.embeddingCosineExact.
    // A1: exact top-5 neighbors for the 10 lowest vec_ids. A2/A3 are
    // probabilistic (seeded hyperplanes / k-means cells not replayable
    // in SQL) → rows-only + recall specs vs A1.
    // same fold order + float->double widening as the codegen'd kernel
    "ann_mips" ->
      """WITH sims AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |    round(list_inner_product(
        |      list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |)
        |SELECT q_id, rnk, vec_id, sim FROM (
        |  SELECT q_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        |  FROM sims
        |) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "ann_bruteforce" ->
      """WITH sims AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |    round(list_cosine_similarity(
        |      list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |)
        |SELECT q_id, rnk, vec_id, sim FROM (
        |  SELECT q_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rnk
        |  FROM sims
        |) WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // A27: ball membership compares the 4dp-ROUNDED sim (A1's
    // contract), so the count and argmax replay exactly; empty balls
    // surface as (-1, -1.0) sentinels, never NULLs
    "ann_range" ->
      """WITH sims AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
        |    round(list_cosine_similarity(
        |      list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
        |      list_transform(c.embedding, x -> CAST(x AS DOUBLE))), 4) AS sim
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 16 AND c.vec_id <> q.vec_id
        |), agg AS (
        |  SELECT q_id,
        |    CAST(sum(CASE WHEN sim >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_within
        |  FROM sims GROUP BY 1
        |), best AS (
        |  SELECT q_id, vec_id AS best_vec_id, sim AS best_sim,
        |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
        |  FROM sims WHERE sim >= 0.2
        |)
        |SELECT a.q_id, a.n_within,
        |  coalesce(b.best_vec_id, -1) AS best_vec_id,
        |  coalesce(b.best_sim, -1.0) AS best_sim
        |FROM agg a LEFT JOIN best b ON b.q_id = a.q_id AND b.rn = 1
        |ORDER BY a.q_id""".stripMargin,
    "mm_schema" ->
      """SELECT doc_id, 'utf8' AS format,
        |  octet_length(encode(text)) AS n_bytes,
        |  cast(n_chars % 640 AS int) AS width
        |FROM documents ORDER BY doc_id""".stripMargin,
    // every header field recomputed arithmetically — a hash match
    // proves the binary encode→parse round-trip is field-exact
    "mm_probe" ->
      """SELECT doc_id, true AS magic_ok,
        |  cast(64 + doc_id % 1856 AS bigint) AS width,
        |  cast(64 + (doc_id * 7) % 1024 AS bigint) AS height,
        |  cast(1 + doc_id % 4 AS bigint) AS channels,
        |  cast(octet_length(encode(text)) AS bigint) AS body_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // M11: ASCII corpus ⇒ codepoint ops ≡ byte ops, so the oracle
    // replays the plant + block digests on text; NULL-on-absent
    // list_position matches the Spark side's mapped array_position
    "mm_integrity" ->
      """WITH m AS (
        |  SELECT doc_id, text AS p, length(text) AS len FROM documents
        |), c AS (
        |  SELECT doc_id, p, len, 1 + (doc_id % greatest(len, 1)) AS pos FROM m
        |), r AS (
        |  SELECT doc_id, p, len,
        |    CASE WHEN doc_id % 23 = 0 AND len > 0 THEN
        |      substr(p, 1, CAST(pos - 1 AS INT)) ||
        |      (CASE WHEN substr(p, CAST(pos AS INT), 1) = '#'
        |        THEN '@' ELSE '#' END) ||
        |      substr(p, CAST(pos + 1 AS INT), CAST(len - pos AS INT))
        |    ELSE p END AS recv
        |  FROM c
        |), h AS (
        |  SELECT doc_id,
        |    list_transform(range(0, (len + 63) // 64),
        |      i -> md5(substr(p, CAST(i * 64 + 1 AS INT), 64))) AS ho,
        |    list_transform(range(0, (len + 63) // 64),
        |      i -> md5(substr(recv, CAST(i * 64 + 1 AS INT), 64))) AS hr
        |  FROM r
        |)
        |SELECT doc_id, CAST(len(ho) AS BIGINT) AS n_blocks,
        |  md5(array_to_string(ho, '')) AS root_md5,
        |  (md5(array_to_string(ho, '')) <> md5(array_to_string(hr, '')))
        |    AS is_corrupted,
        |  CAST(coalesce(list_position(list_transform(range(1, len(ho) + 1),
        |    i -> ho[CAST(i AS INT)] <> hr[CAST(i AS INT)]), true), 0) AS BIGINT)
        |    AS first_bad_block
        |FROM h ORDER BY doc_id""".stripMargin,
    // block ids are md5 over the block's HEX rendering (injective →
    // byte-exact identity) because this engine has no BLOB md5; the
    // hex text slices at byte boundaries (2 chars/byte)
    "mm_block_dedup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      substring(repeat('HDR' || CAST((doc_id // 7) % 2 AS VARCHAR) || 'abcdefghijk', 40), 1, 512)
        |        || 'tail_' || CAST(doc_id AS VARCHAR)
        |    ELSE text END AS p
        |  FROM documents
        |), hx AS (
        |  SELECT doc_id, hex(encode(p)) AS h, octet_length(encode(p)) AS nbytes FROM m
        |  WHERE octet_length(encode(p)) > 0
        |), b AS (
        |  SELECT md5(substring(h, i * 512 + 1, 512)) AS block_md5,
        |    least(256, nbytes - i * 256) AS block_bytes
        |  FROM hx, LATERAL unnest(generate_series(0,
        |    CAST(ceil(nbytes / 256.0) AS INT) - 1)) AS u(i)
        |)
        |SELECT block_md5, CAST(count(*) AS BIGINT) AS n_copies,
        |  CAST(max(block_bytes) AS BIGINT) AS block_bytes,
        |  CAST((count(*) - 1) * max(block_bytes) AS BIGINT) AS bytes_reclaimed
        |FROM b GROUP BY 1 HAVING count(*) > 1
        |ORDER BY block_md5""".stripMargin,
    "mm_dedup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 9 = 0 THEN 'MEDIA_' || CAST((doc_id // 9) % 3 AS VARCHAR)
        |         ELSE text END AS p
        |  FROM documents
        |)
        |SELECT md5(p) AS payload_md5,
        |  cast(count(*) AS bigint) AS n_copies,
        |  min(doc_id) AS keep_id,
        |  cast(sum(octet_length(encode(p))) - min(octet_length(encode(p))) AS bigint)
        |    AS bytes_reclaimed
        |FROM m GROUP BY 1 HAVING count(*) > 1
        |ORDER BY payload_md5""".stripMargin,
    "mm_features" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  round(list_aggregate(list_transform(string_split(text, ' '),
        |    t -> length(t)), 'avg'), 4) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // shard round-trip is byte-exact: every payload's md5 must match
    // the md5 of the source text's UTF-8 bytes
    "mm_shards" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // byte-exact sampling oracle: hex() the UTF-8 blob and decode each
    // sampled hex pair to its integer byte value (no charset round-trip)
    "mm_binary_files" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id < 50
        |)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
        |  cast(list_aggregate(list_transform(range(1, n + 1),
        |    i -> 16 * (strpos('0123456789ABCDEF', substring(h, CAST(2*i-1 AS INT), 1)) - 1)
        |       + (strpos('0123456789ABCDEF', substring(h, CAST(2*i AS INT), 1)) - 1)), 'sum') AS bigint) AS byte_sum
        |FROM b ORDER BY doc_id""".stripMargin,
    "mm_sample" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS n
        |  FROM documents
        |)
        |SELECT doc_id,
        |  len(range(1, n + 1, 16)) AS n_sampled,
        |  cast(16 * (strpos('0123456789ABCDEF', substring(h, 1, 1)) - 1)
        |     + (strpos('0123456789ABCDEF', substring(h, 2, 1)) - 1) AS bigint) AS first_byte,
        |  cast(list_aggregate(list_transform(range(1, n + 1, 16),
        |    i -> 16 * (strpos('0123456789ABCDEF', substring(h, CAST(2*i-1 AS INT), 1)) - 1)
        |       + (strpos('0123456789ABCDEF', substring(h, CAST(2*i AS INT), 1)) - 1)), 'sum') AS bigint) AS checksum
        |FROM b ORDER BY doc_id""".stripMargin,
    "e_window_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the pseudonym-space join must reproduce the raw-key rollup
    // exactly — DuckDB replays the same salted-hash surrogates
    "t_pseudonym" ->
      """WITH c AS (
        |  SELECT substr(md5('graft_s1' || CAST(c_custkey AS VARCHAR)), 1, 16) AS cust_sid,
        |         c_nationkey
        |  FROM customer
        |), o AS (
        |  SELECT substr(md5('graft_s1' || CAST(o_custkey AS VARCHAR)), 1, 16) AS cust_sid,
        |         o_totalprice
        |  FROM orders
        |)
        |SELECT c_nationkey,
        |  CAST(count(DISTINCT cust_sid) AS BIGINT) AS n_customers,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM c JOIN o USING (cust_sid)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_lateral" ->
      """SELECT c_custkey, t.o_orderkey,
        |       round(t.o_totalprice, 2) AS o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_acctbal > 9000
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "t_kanon" ->
      """WITH c AS (
        |  SELECT c_acctbal, n_name FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |), l0 AS (SELECT min(cnt) m FROM (
        |    SELECT count(*) cnt FROM c GROUP BY n_name, floor(c_acctbal/100))),
        |l1 AS (SELECT min(cnt) m FROM (
        |    SELECT count(*) cnt FROM c GROUP BY n_name, floor(c_acctbal/1000))),
        |l2 AS (SELECT min(cnt) m FROM (
        |    SELECT count(*) cnt FROM c GROUP BY n_name)),
        |lv AS (SELECT CASE WHEN (SELECT m FROM l0) >= 5 THEN 0
        |                   WHEN (SELECT m FROM l1) >= 5 THEN 1
        |                   WHEN (SELECT m FROM l2) >= 5 THEN 2
        |                   ELSE 3 END AS lvl)
        |SELECT CASE WHEN lvl >= 3 THEN 'ALL' ELSE n_name END AS geo,
        |  CASE lvl
        |    WHEN 0 THEN CAST(CAST(floor(c_acctbal/100) AS BIGINT) AS VARCHAR)
        |    WHEN 1 THEN CAST(CAST(floor(c_acctbal/1000) AS BIGINT) AS VARCHAR)
        |    ELSE 'ALL' END AS band,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(lvl AS INT) AS level
        |FROM c CROSS JOIN lv
        |GROUP BY 1, 2, lvl ORDER BY geo, band""".stripMargin,
    "q_recursive" ->
      """WITH RECURSIVE pc AS (
        |  SELECT DISTINCT l_partkey AS part, o_custkey AS cust
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), edges AS (
        |  SELECT a.cust AS src, b.cust AS dst
        |  FROM pc a JOIN pc b ON a.part = b.part AND a.cust <> b.cust
        |  GROUP BY 1, 2 HAVING count(*) >= 4
        |), seeds AS (
        |  SELECT c_custkey AS cust FROM customer WHERE c_acctbal > 9900
        |), hops (cust, hop) AS (
        |  SELECT cust, 0 FROM seeds
        |  UNION ALL
        |  SELECT e.dst, h.hop + 1
        |  FROM hops h JOIN edges e ON e.src = h.cust
        |  WHERE h.hop < 2
        |)
        |SELECT cust, CAST(min(hop) AS INT) AS hop
        |FROM hops GROUP BY cust ORDER BY cust""".stripMargin,
    // the windowed-coverage explosion must equal the direct per-day
    // windowed distinct
    "q_rolling_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
        |), days AS (SELECT DISTINCT d FROM du)
        |SELECT days.d, CAST(count(DISTINCT du.user_id) AS BIGINT) AS n_active_7d
        |FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
        |GROUP BY days.d ORDER BY days.d""".stripMargin,
    // the stream-maintained rollup must equal a from-scratch daily
    // rollup — integer-micro partials make the merge order irrelevant
    "e_stream_incr_rollup" ->
      """SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
        |        / 1000000.0, 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY d""".stripMargin,
    "e_stream_timer_sessions" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        |x AS (
        |  SELECT user_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |           OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
        |), s AS (
        |  SELECT user_id, tus,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY tus
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM x
        |)
        |SELECT user_id, min(tus) AS session_start_us,
        |  count(*) AS n_events, max(tus) - min(tus) AS duration_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin,
    "e_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        |x AS (
        |  SELECT user_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |           OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
        |), s AS (
        |  SELECT user_id, tus,
        |    cast(sum(brk) OVER (PARTITION BY user_id ORDER BY tus
        |      ROWS UNBOUNDED PRECEDING) AS bigint) AS session_id
        |  FROM x
        |)
        |SELECT user_id, session_id, min(tus) AS session_start_us,
        |  count(*) AS n_events, max(tus) - min(tus) AS duration_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "e_stream_parity" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e_stream_dedup" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // E33: two disjoint feeds with misaligned watermarks must still
    // aggregate to the batch rollup of their union — every event once
    "e_stream_union" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        |x AS (
        |  SELECT user_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |           OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
        |), s AS (
        |  SELECT user_id, tus,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY tus
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x
        |)
        |SELECT user_id, min(tus) AS session_start_us, count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,
    "e_stream_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        |x AS (
        |  SELECT user_id, tus,
        |    CASE WHEN lag(tus) OVER w IS NULL
        |           OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)
        |), s AS (
        |  SELECT user_id, tus,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY tus
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x
        |)
        |SELECT user_id, min(tus) AS session_start_us,
        |  count(*) AS n_events, max(tus) - min(tus) AS duration_us
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,
    "p_backfill" ->
      """SELECT year(o_orderdate) AS yr, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE year(o_orderdate) IN (1995, 1996, 1997)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p_flow_e2e" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty,
        |  'this is an artificial transformation just to practice prefect' AS note
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "p_flow_cache" ->
      """WITH m AS (
        |  SELECT month(o_orderdate) AS mo, cast(count(*) AS bigint) AS n,
        |    round(sum(o_totalprice), 2) AS total
        |  FROM orders GROUP BY 1
        |)
        |SELECT 1 AS call_idx, 1 AS month, n, total, 1 AS body_runs FROM m WHERE mo = 1
        |UNION ALL
        |SELECT 2 AS call_idx, 2 AS month, n, total, 2 AS body_runs FROM m WHERE mo = 2
        |UNION ALL
        |SELECT 3 AS call_idx, 1 AS month, n, total, 2 AS body_runs FROM m WHERE mo = 1
        |ORDER BY call_idx""".stripMargin,
    "p_corpus_e2e" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, source,
        |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks,
        |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS h
        |  FROM documents
        |), q AS (
        |  SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_toks, toks, h
        |  FROM t WHERE len(toks) BETWEEN 20 AND 1000
        |), ke AS (
        |  SELECT min(doc_id) AS doc_id FROM q GROUP BY h
        |), qe AS (
        |  SELECT q.* FROM q JOIN ke USING (doc_id)
        |), sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
        |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS shingle
        |  FROM qe WHERE len(toks) >= 3
        |), sizes AS (
        |  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
        |), inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sizes sa ON doc_a = sa.doc_id
        |  JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE round(i / (sa.sz + sb.sz - i), 4) >= 0.5
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), walk(src, reach) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT e.src, w.reach FROM edges e JOIN walk w ON e.dst = w.src
        |), lbl AS (
        |  SELECT src AS id, min(reach) AS cluster_id FROM walk GROUP BY 1
        |), fin AS (
        |  SELECT * FROM qe
        |  WHERE doc_id NOT IN (SELECT id FROM lbl WHERE id != cluster_id)
        |)
        |SELECT source, cast(count(*) AS bigint) AS n_docs,
        |  cast(sum(CAST(floor((n_toks - 1) / 48) AS BIGINT) + 1) AS bigint) AS n_chunks,
        |  cast(sum(n_toks) AS bigint) AS n_tokens
        |FROM fin GROUP BY 1 ORDER BY source""".stripMargin
  )
}
