package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The §2 query inventory: name → (spark, sfDir) → DataFrame, plus the
  * DuckDB oracle SQL for every SQL-expressible entry. */
object Catalog {
  type QueryFn = (SparkSession, String) => DataFrame

  private def rel(f: Tables => DataFrame): QueryFn = (s, dir) => f(Tables(s, dir))

  val relational: Map[String, QueryFn] = Map(
    "q01_filter_project" -> rel(Relational.q01FilterProject),
    "q02_agg"            -> rel(Relational.q02Agg),
    "q03_join_agg"       -> rel(Relational.q03JoinAgg),
    "q04_multijoin"      -> rel(Relational.q04Multijoin),
    "q05_scan_agg"       -> rel(Relational.q05ScanAgg),
    "q06_topk"           -> rel(Relational.q06Topk),
    "q07_distinct"       -> rel(Relational.q07Distinct),
    "q08_window"         -> rel(Relational.q08Window),
    "q09_semijoin"       -> rel(Relational.q09Semijoin),
    "q10_antijoin"       -> rel(Relational.q10Antijoin),
    "q11_outer_join"     -> rel(Relational.q11OuterJoin),
    "q12_set_ops"        -> rel(Relational.q12SetOps),
    "q13_having"         -> rel(Relational.q13Having),
    "q14_expr"           -> rel(Relational.q14Expr),
    "q15_subquery"       -> rel(Relational.q15Subquery),
    "q16_rollup"         -> rel(Relational.q16Rollup),
    "q17_cte"            -> rel(Relational.q17Cte),
    "q18_latest_per_key" -> rel(Relational.q18LatestPerKey),
    "q19_pivot"          -> rel(Relational.q19Pivot),
    "q45_percentiles"    -> rel(Relational.q45Percentiles),
    "q63_approx_percentile" -> rel(Relational.q63ApproxPercentile),
    "q56_date_spine"     -> rel(Relational.q56DateSpine),
    "q57_string_agg"     -> rel(Relational.q57StringAgg),
    "q72_window_frames"  -> rel(Relational.q72WindowFrames),
    "q77_cube"           -> rel(Relational.q77Cube),
    "q73_lateral_explode" -> rel(Relational.q73LateralExplode),
    "q79_full_outer"     -> rel(Relational.q79FullOuter),
    "q80_gap_fill"       -> rel(Relational.q80GapFill),
    "q92_grouping_sets"  -> rel(Relational.q92GroupingSets),
    "q94_unpivot"        -> rel(Relational.q94Unpivot),
    "q95_histogram"      -> rel(Relational.q95Histogram),
    "q108_multi_distinct" -> rel(Relational.q108MultiDistinct),
    "q112_correlation"    -> rel(Relational.q112Correlation),
    "q121_winsorize"      -> rel(Relational.q121Winsorize)
  )

  val reverseEtl: Map[String, QueryFn] = Map(
    "q20_cursor_incremental" -> rel(ReverseEtl.q20CursorIncremental),
    "q21_max_cursor"         -> rel(ReverseEtl.q21MaxCursor),
    "q22_snapshot_diff"      -> rel(ReverseEtl.q22SnapshotDiff),
    "q23_deleted_keys"       -> rel(ReverseEtl.q23DeletedKeys),
    "q24_audience_hash"      -> rel(ReverseEtl.q24AudienceHash),
    "q25_validate_split"     -> rel(ReverseEtl.q25ValidateSplit),
    "q26_column_map"         -> rel(ReverseEtl.q26ColumnMap),
    "q27_batcher"            -> rel(ReverseEtl.q27Batcher),
    "q28_enrich"             -> rel(ReverseEtl.q28Enrich),
    "q29_upsert_keys"        -> rel(ReverseEtl.q29UpsertKeys),
    "q47_column_profile"     -> rel(ReverseEtl.q47ColumnProfile),
    "q61_schema_validate"    -> rel(ReverseEtl.q61SchemaValidate),
    "q66_bloom_prefilter"    -> rel(ReverseEtl.q66BloomPrefilter),
    "q89_audience_diff"      -> rel(ReverseEtl.q89AudienceDiff),
    "q90_incremental_agg"    -> rel(ReverseEtl.q90IncrementalAgg),
    "q104_skew_profile"      -> rel(ReverseEtl.q104SkewProfile),
    "q105_scd2"              -> rel(ReverseEtl.q105Scd2),
    "q113_expectations"      -> rel(ReverseEtl.q113Expectations),
    "q118_three_way_merge"   -> rel(ReverseEtl.q118ThreeWayMerge)
  )

  val trainingData: Map[String, QueryFn] = Map(
    "q30_dedup_exact"   -> rel(TrainingData.q30DedupExact),
    "q31_dedup_minhash" -> rel(TrainingData.q31DedupMinhash),
    "q32_dedup_simhash" -> rel(TrainingData.q32DedupSimhash),
    "q33_ngram_jaccard" -> rel(TrainingData.q33NgramJaccard),
    "q34_ann_brute"     -> rel(TrainingData.q34AnnBrute),
    "q35_ann_lsh"       -> rel(TrainingData.q35AnnLsh),
    "q36_embed_neardup" -> rel(TrainingData.q36EmbedNeardup),
    "q37_lang_id"       -> rel(TrainingData.q37LangId),
    "q38_quality_score" -> rel(TrainingData.q38QualityScore),
    "q39_token_count"   -> rel(TrainingData.q39TokenCount),
    "q40_fingerprint"   -> rel(TrainingData.q40Fingerprint),
    "q41_split"         -> rel(TrainingData.q41Split),
    "q42_pii_redact"    -> rel(TrainingData.q42PiiRedact),
    "q43_tfidf"         -> rel(TrainingData.q43Tfidf),
    "q46_approx_distinct" -> rel(TrainingData.q46ApproxDistinct),
    "q60_hll_merge"     -> rel(TrainingData.q60HllMerge),
    "q64_quantile_rollup" -> rel(TrainingData.q64QuantileRollup),
    "q62_ann_ivf"       -> rel(TrainingData.q62AnnIvf),
    "q52_minhash_portable" -> rel(TrainingData.q52MinhashPortable),
    "q53_simhash_portable" -> rel(TrainingData.q53SimhashPortable),
    "q54_fingerprint_portable" -> rel(TrainingData.q54FingerprintPortable),
    "q55_training_pipeline" -> rel(TrainingData.q55TrainingPipeline),
    "q65_topk_sketch"       -> rel(TrainingData.q65TopkSketch),
    "q69_quantized_ann"     -> rel(TrainingData.q69QuantizedAnn),
    "q76_pq_ann"            -> rel(TrainingData.q76PqAnn),
    "q70_contamination"     -> rel(TrainingData.q70Contamination),
    "q74_dedup_clusters"    -> rel(TrainingData.q74DedupClusters),
    "q75_incremental_neardup" -> rel(TrainingData.q75IncrementalNeardup),
    "q78_mixture_sample"    -> rel(TrainingData.q78MixtureSample),
    "q71_repetition"        -> rel(TrainingData.q71Repetition),
    "q67_stratified_sample" -> rel(TrainingData.q67StratifiedSample),
    "q68_reservoir_sample"  -> rel(TrainingData.q68ReservoirSample),
    "q135_priority_sample"  -> rel(TrainingData.q135PrioritySample),
    "q81_domain_cap"        -> rel(TrainingData.q81DomainCap),
    "q82_canonical_dedup"   -> rel(TrainingData.q82CanonicalDedup),
    "q83_chunking"          -> rel(TrainingData.q83Chunking),
    "q84_packing"           -> rel(TrainingData.q84Packing),
    "q85_rarity"            -> rel(TrainingData.q85Rarity),
    "q86_semantic_dedup"    -> rel(TrainingData.q86SemanticDedup),
    "q87_dup_spans"         -> rel(TrainingData.q87DupSpans),
    "q88_edit_neardup"      -> rel(TrainingData.q88EditNeardup),
    "q91_inverted_index"    -> rel(TrainingData.q91InvertedIndex),
    "q93_line_dedup"        -> rel(TrainingData.q93LineDedup),
    "q133_span_removal"     -> rel(TrainingData.q133SpanRemoval),
    "q96_ann_recall"        -> rel(TrainingData.q96AnnRecall),
    "q97_cms_merge"         -> rel(TrainingData.q97CmsMerge),
    "q98_line_dedup_intra"  -> rel(TrainingData.q98LineDedupIntra),
    "q100_filter_funnel"    -> rel(TrainingData.q100FilterFunnel),
    "q101_oov_rate"         -> rel(TrainingData.q101OovRate),
    "q102_budget_select"    -> rel(TrainingData.q102BudgetSelect),
    "q103_canonical_quality" -> rel(TrainingData.q103CanonicalQuality),
    "q106_bpe_pairs"         -> rel(TrainingData.q106BpePairs),
    "q107_kmeans_step"       -> rel(TrainingData.q107KmeansStep),
    "q109_importance"        -> rel(TrainingData.q109Importance),
    "q134_lm_score"          -> rel(TrainingData.q134LmScore),
    "q136_quality_classifier" -> rel(TrainingData.q136QualityClassifier),
    "q110_dataset_card"      -> rel(TrainingData.q110DatasetCard),
    "q111_source_overlap"    -> rel(TrainingData.q111SourceOverlap),
    "q114_embedding_profile" -> rel(TrainingData.q114EmbeddingProfile),
    "q115_minhash_accuracy"  -> rel(TrainingData.q115MinhashAccuracy),
    "q116_coverage_curve"    -> rel(TrainingData.q116CoverageCurve),
    "q117_temperature_mix"   -> rel(TrainingData.q117TemperatureMix),
    "q119_contrastive_pairs" -> rel(TrainingData.q119ContrastivePairs),
    "q122_cell_profile"      -> rel(TrainingData.q122CellProfile),
    "q123_curation_report"   -> rel(TrainingData.q123CurationReport),
    "q125_shard_layout"      -> rel(TrainingData.q125ShardLayout),
    "q126_leakage_split"     -> rel(TrainingData.q126LeakageSplit),
    "q127_suffix_spans"      -> rel(TrainingData.q127SuffixSpans),
    "q130_image_meta"        -> rel(TrainingData.q130ImageMeta),
    "q131_audio_meta"        -> rel(TrainingData.q131AudioMeta),
    "q132_video_meta"        -> rel(TrainingData.q132VideoMeta)
  )

  val events: Map[String, QueryFn] = Map(
    "q44_asof_attrib" -> rel(Events.q44AsofAttrib),
    "q48_range_join"  -> rel(Events.q48RangeJoin),
    "q49_json_extract" -> rel(Events.q49JsonExtract),
    "q58_funnel"       -> rel(Events.q58Funnel),
    "q59_retention"    -> rel(Events.q59Retention),
    "q50_window_agg"  -> rel(Events.q50WindowAgg),
    "q51_sessionize"  -> rel(Events.q51Sessionize),
    "q99_transitions" -> rel(Events.q99Transitions),
    "q120_anomaly_flags" -> rel(Events.q120AnomalyFlags),
    "q124_top_paths" -> rel(Events.q124TopPaths),
    "q128_asof_forward" -> rel(Events.q128AsofForward),
    "q129_asof_nearest" -> rel(Events.q129AsofNearest)
  )

  def queries: Map[String, QueryFn] = relational ++ reverseEtl ++ trainingData ++ events

  def oracleSql: Map[String, String] =
    RelationalOracle.sql ++ ReverseEtlOracle.sql ++ TrainingOracle.sql ++ EventsOracle.sql
}
