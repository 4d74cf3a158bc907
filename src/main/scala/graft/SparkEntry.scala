package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see SURVEY.md §2 for the operator inventory and §7
  * for the build plan. Every implemented operator appears in `queries`;
  * SQL-expressible ones carry a DuckDB oracle in `oracleSql` with
  * identical output column names.
  */
object SparkEntry {

  /** Flagship query on sf=0.001 (driver smoke-checks rows > 0): the
    * 3-way-join usage/win-rate aggregation (reference usp_card_usage_wins,
    * sql/db_creation_script.sql:224-242) — exercises two joins (one
    * broadcast), aggregation, a window total, and ordering.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.q22UsageRate(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project" -> (RelationalOps.q01ScanProject _),
    "q02_filter" -> (RelationalOps.q02Filter _),
    "q03_derived_flag" -> (RelationalOps.q03DerivedFlag _),
    "q04_concat_key" -> (RelationalOps.q04ConcatKey _),
    "q05_ts_parse" -> (RelationalOps.q05TsParse _),
    "q06_season_assign" -> (RelationalOps.q06SeasonAssign _),
    "q07_union_dedup" -> (RelationalOps.q07UnionDedup _),
    "q08_insert_new_only" -> (RelationalOps.q08InsertNewOnly _),
    "q09_semi_join" -> (RelationalOps.q09SemiJoin _),
    "q10_blocklist" -> (RelationalOps.q10Blocklist _),
    "q11_inner_join" -> (RelationalOps.q11InnerJoin _),
    "q12_upsert_last_wins" -> (RelationalOps.q12UpsertLastWins _),
    "q13_purge_keys" -> (RelationalOps.q13PurgeKeys _),
    "q14_distinct" -> (RelationalOps.q14Distinct _),
    "q15_json_flatten" -> (RelationalOps.q15JsonFlatten _),
    "q16_array_guard" -> (RelationalOps.q16ArrayGuard _),
    "q17_explode" -> (RelationalOps.q17Explode _),
    "q18_cast_null" -> (RelationalOps.q18CastNull _),
    "q19_recent_topk" -> (RelationalOps.q19RecentTopK _),
    "q20_dim_join" -> (RelationalOps.q20DimJoin _),
    "q21_win_rate" -> (RelationalOps.q21WinRate _),
    "q22_usage_rate" -> (RelationalOps.q22UsageRate _),
    "q23_exact_dedup" -> (DedupOps.q23ExactDedup _),
    "q24_text_stats" -> (TextOps.q24TextStats _),
    "q25_token_count" -> (TextOps.q25TokenCount _),
    "q26_quality_score" -> (TextOps.q26QualityScore _),
    "q27_lang_id" -> (TextOps.q27LangId _),
    "q28_fingerprint" -> (TextOps.q28Fingerprint _),
    "q29_minhash_lsh" -> (DedupOps.q29MinhashLsh _),
    "q30_simhash" -> (DedupOps.q30Simhash _),
    "q31_ngram_jaccard" -> (DedupOps.q31NgramJaccard _),
    "q32_knn_bruteforce" -> (SimilarityOps.q32KnnBruteforce _),
    "q33_ann_lsh" -> (SimilarityOps.q33AnnLsh _),
    "q34_vector_ops" -> (SimilarityOps.q34VectorOps _),
    "q35_multimodal" -> (MultimodalOps.q35Multimodal _),
    "q36_embed_neardup" -> (SimilarityOps.q36EmbedNearDup _),
    "q37_json_ingest" -> (graft.sources.JsonIngest.q37JsonIngest _),
    "q38_topk_per_key" -> ((s, d) => graft.plans.TopK.perKey(
      Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
      keys = Seq("o_custkey"),
      order = Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)),
    "q39_asof_join" -> (AsOfJoin.q39AsOfJoin _),
    "q40_ann_ivf" -> (IvfAnn.q40AnnIvf _),
    "q41_table_stats" -> (RelationalOps.q41TableStats _),
    "q42_running_total" -> (RelationalOps.q42RunningTotal _),
    "q43_rollup" -> (RelationalOps.q43Rollup _),
    "q44_pivot" -> (RelationalOps.q44Pivot _),
    "q45_percentiles" -> (RelationalOps.q45Percentiles _),
    "q46_seasons_table" -> (RelationalOps.q46SeasonsTable _),
    "q47_top_ngrams" -> (TextOps.q47TopNgrams _),
    "q48_fk_check" -> (RelationalOps.q48FkCheck _),
    "q49_doc_embedding" -> (SimilarityOps.q49DocEmbedding _),
    "q50_sample_per_group" -> (TextOps.q50SamplePerGroup _),
    "q51_simhash_neardup" -> (DedupOps.q51SimhashNearDup _),
    "q52_repetition_filters" -> (TextOps.q52RepetitionFilters _),
    "q53_quantize" -> (SimilarityOps.q53Quantize _),
    "q54_text_clean" -> (TextOps.q54TextClean _),
    "q55_full_outer" -> (RelationalOps.q55FullOuter _),
    "q56_set_ops" -> (RelationalOps.q56SetOps _),
    "q57_surrogate_keys" -> (SurrogateKeys.q57SurrogateKeys _),
    "q58_tfidf_terms" -> (TextOps.q58TfIdfTerms _),
    "q59_token_histogram" -> (TextOps.q59TokenHistogram _),
    "q60_sketch_stats" -> (RelationalOps.q60SketchStats _),
    "q61_dedup_clusters" -> (DedupOps.q61DedupClusters _),
    "q62_contamination" -> (DedupOps.q62Contamination _),
    "q63_source_mix" -> (TextOps.q63SourceMix _),
    "q64_pii_scrub" -> (TextOps.q64PiiScrub _),
    "q65_chunking" -> (TextOps.q65Chunking _),
    "q66_seq_packing" -> (TextOps.q66SequencePacking _),
    "q67_boilerplate" -> (TextOps.q67Boilerplate _),
    "q68_shuffle_order" -> (TextOps.q68ShuffleOrder _),
    "q69_split" -> (TextOps.q69Split _),
    "q70_domain_cap" -> (TextOps.q70DomainCap _),
    "q71_mix_weights" -> (TextOps.q71MixWeights _),
    "q72_user_seq" -> (RelationalOps.q72UserSeq _),
    "q73_snap_diff" -> (RelationalOps.q73SnapDiff _),
    "q74_bigram_cov" -> (TextOps.q74BigramCov _),
    "q75_semdedup" -> (SimilarityOps.q75SemDedup _),
    "q76_bpe" -> (BpeTrain.q76Bpe _),
    "q77_hh" -> (TextOps.q77Hh _),
    "q78_winsor" -> (RelationalOps.q78Winsor _),
    "q79_sessions" -> (RelationalOps.q79Sessions _),
    "q80_funnel" -> (RelationalOps.q80Funnel _),
    "q81_retention" -> (RelationalOps.q81Retention _),
    "q82_token_budget" -> (TextOps.q82TokenBudget _),
    "q83_outliers" -> (RelationalOps.q83Outliers _),
    "q84_neardup_contam" -> (DedupOps.q84NearDupContam _),
    "q85_bloom_join" -> (BloomJoin.q85BloomJoin _),
    "q86_salted_join" -> (SkewJoin.q86SaltedJoin _),
    "q87_quantized_ann" -> (SimilarityOps.q87QuantizedAnn _),
    "q88_span_scrub" -> (DedupOps.q88SpanScrub _),
    "q89_interval_join" -> (RangeJoin.q89IntervalJoin _),
    "q90_funnel4" -> (RelationalOps.q90Funnel4 _),
    "q91_fuzzy_join" -> (FuzzyJoin.q91FuzzyJoin _),
    "q92_scd2" -> (RelationalOps.q92Scd2 _),
    "q93_corr_matrix" -> (StatsOps.q93CorrMatrix _),
    "q94_sliding_window" -> (RelationalOps.q94SlidingWindow _),
    "q95_dq_report" -> (StatsOps.q95DqReport _),
    "q96_setsim_join" -> (DedupOps.q96SetSimJoin _),
    "q97_incr_agg" -> (RelationalOps.q97IncrAgg _),
    "q98_pit_join" -> (RelationalOps.q98PitJoin _),
    "q99_gap_fill" -> (RelationalOps.q99GapFill _),
    "q100_grouping_sets" -> (RelationalOps.q100GroupingSets _),
    "q101_zorder" -> (graft.sources.ZOrderLayout.q101Zorder _),
    "q102_incr_scd2" -> (RelationalOps.q102IncrScd2 _),
    "q103_pmi" -> (TextOps.q103Pmi _),
    "q104_inverted_index" -> (TextOps.q104InvertedIndex _),
    "q105_pagerank" -> (GraphOps.q105PageRank _),
    "q106_bpe_encode" -> (BpeTrain.q106BpeEncode _),
    "q107_triangles" -> (GraphOps.q107Triangles _),
    "q108_containment" -> (DedupOps.q108ContainmentJoin _),
    "q109_kcore" -> (GraphOps.q109KCore _),
    "q110_bfs_hops" -> (GraphOps.q110BfsHops _),
    "q111_lm_score" -> (TextOps.q111LmScore _),
    "q112_bm25" -> (TextOps.q112Bm25 _),
    "q113_markov" -> (RelationalOps.q113Markov _),
    "q114_weighted_sample" -> (TextOps.q114WeightedSample _),
    "q115_equidepth_bins" -> (RelationalOps.q115EquidepthBins _),
    "q116_ppr" -> (GraphOps.q116Ppr _),
    "q117_cube" -> (RelationalOps.q117Cube _),
    "q118_incr_index" -> (TextOps.q118IncrIndex _),
    "q119_flow_score" -> (RelationalOps.q119FlowScore _),
    "q120_pq_ann" -> (PqAnn.q120PqAnn _),
    "q121_ivfpq" -> (IvfPq.q121IvfPq _),
    "q122_skyline" -> (RelationalOps.q122Skyline _),
    "q123_attribution" -> (RelationalOps.q123Attribution _),
    "q124_source_drift" -> (TextOps.q124SourceDrift _),
    "q125_item_sim" -> (SimilarityOps.q125ItemSim _),
    "q126_label_prop" -> (GraphOps.q126LabelProp _),
    "q127_convert_latency" -> (RelationalOps.q127ConvertLatency _),
    "q128_neg_sampling" -> (RelationalOps.q128NegativeSampling _),
    "q129_peak_concurrency" -> (RelationalOps.q129PeakConcurrency _),
    "q130_ols_trend" -> (StatsOps.q130OlsTrend _),
    "q131_assoc_rules" -> (SimilarityOps.q131AssocRules _),
    "q132_ab_test" -> (StatsOps.q132AbTest _),
    "q133_seasonal_anomaly" -> (StatsOps.q133SeasonalAnomaly _),
    "q134_cusum" -> (StatsOps.q134Cusum _),
    "q135_ks_test" -> (StatsOps.q135KsTest _),
    "q136_winnow_repeats" -> (DedupOps.q136WinnowRepeats _),
    "q137_skew_profile" -> (StatsOps.q137SkewProfile _),
    "q138_bootstrap_ci" -> (StatsOps.q138BootstrapCi _),
    "q139_textrank" -> (TextOps.q139TextRank _),
    "q140_trigram_motifs" -> (RelationalOps.q140TrigramMotifs _),
    "q141_behavior_diversity" -> (RelationalOps.q141BehaviorDiversity _),
    "q142_weighted_median" -> (StatsOps.q142WeightedMedian _),
    "q143_mann_whitney" -> (StatsOps.q143MannWhitney _),
    "q144_benford" -> (StatsOps.q144Benford _),
    "q145_join_cardinality" -> (StatsOps.q145JoinCardinality _),
    "q146_pareto_abc" -> (RelationalOps.q146ParetoAbc _),
    "q147_proration" -> (RelationalOps.q147Proration _),
    "q148_acf" -> (StatsOps.q148Acf _),
    "q149_survival" -> (StatsOps.q149Survival _),
    "q150_rrf_fusion" -> (SimilarityOps.q150RrfFusion _),
    "q151_link_predict" -> (GraphOps.q151LinkPredict _),
    "q152_strat_sample" -> (TextOps.q152StratSample _),
    "q153_theil_sen" -> (StatsOps.q153TheilSen _),
    "q154_wilson_lcb" -> (StatsOps.q154WilsonLcb _),
    "q155_cramers_v" -> (StatsOps.q155CramersV _),
    "q156_mmr" -> (SimilarityOps.q156MmrDiversify _),
    "q157_incr_cc" -> (GraphOps.q157IncrCc _),
    "q158_trunc_ann" -> (SimilarityOps.q158TruncatedAnn _),
    "q159_moments" -> (StatsOps.q159Moments _),
    "q160_ewma" -> (StatsOps.q160Ewma _),
    "q161_bitmap_distinct" -> (RelationalOps.q161BitmapDistinct _),
    "q162_sketch_rollup" -> (RelationalOps.q162SketchRollup _),
    "q163_business_days" -> (RelationalOps.q163BusinessDays _),
    "q164_asof_snapshot" -> (RelationalOps.q164AsOfSnapshot _),
    "q165_decile_lift" -> (StatsOps.q165DecileLift _),
    "q166_rfm" -> (StatsOps.q166Rfm _),
    "q167_modularity" -> (GraphOps.q167Modularity _),
    "q168_quantile_norm" -> (TextOps.q168QuantileNorm _),
    "q169_overlap_matrix" -> (RelationalOps.q169OverlapMatrix _),
    "q170_cosine_allpairs" -> (SimilarityOps.q170CosineAllPairs _),
    "q171_tv_matrix" -> (TextOps.q171TvMatrix _),
    "q172_rolling_median" -> (StatsOps.q172RollingMedian _),
    "q173_mann_kendall" -> (StatsOps.q173MannKendall _),
    "q174_assortativity" -> (GraphOps.q174Assortativity _),
    "q175_key_gaps" -> (RelationalOps.q175KeyGaps _),
    "q176_quantile_rollup" -> (RelationalOps.q176QuantileRollup _),
    "q177_price_volume_mix" -> (RelationalOps.q177PriceVolumeMix _),
    "q178_repeat_decay" -> (RelationalOps.q178RepeatDecay _),
    "q179_purchase_gaps" -> (RelationalOps.q179PurchaseGaps _),
    "q180_tier_migration" -> (RelationalOps.q180TierMigration _),
    "q181_rolling_distinct" -> (RelationalOps.q181RollingDistinct _),
    "q182_concentration" -> (RelationalOps.q182Concentration _),
    "q183_absorption" -> (RelationalOps.q183Absorption _),
    "q184_dup_payments" -> (RelationalOps.q184DupPayments _),
    "q185_cohort_ltv" -> (RelationalOps.q185CohortLtv _),
    "q186_mutual_nn" -> (SimilarityOps.q186MutualNn _),
    "q187_knn_purity" -> (SimilarityOps.q187KnnPurity _),
    "q188_seasonal_decomp" -> (StatsOps.q188SeasonalDecomp _),
    "q189_lead_lag" -> (StatsOps.q189LeadLag _),
    "q190_golden_record" -> (RelationalOps.q190GoldenRecord _),
    "q191_fd_discovery" -> (RelationalOps.q191FdDiscovery _),
    "q192_unpivot" -> (RelationalOps.q192Unpivot _),
    "q193_sssp" -> (GraphOps.q193Sssp _),
    "q194_kmeans" -> (SimilarityOps.q194Kmeans _),
    "q195_gini_rank" -> (StatsOps.q195GiniRank _),
    "q196_interp_fill" -> (RelationalOps.q196InterpFill _),
    "q197_table_checksum" -> (RelationalOps.q197TableChecksum _),
    "q198_medoid" -> (SimilarityOps.q198Medoid _),
    "q199_vocab_growth" -> (TextOps.q199VocabGrowth _),
    "q200_holt_smoothing" -> (StatsOps.q200HoltSmoothing _),
    "q201_rev_rec" -> (RelationalOps.q201RevenueRecognition _),
    "q202_dwell_time" -> (RelationalOps.q202DwellTime _),
    "q203_share_of_parent" -> (RelationalOps.q203ShareOfParent _),
    "q204_transition_latency" -> (RelationalOps.q204TransitionLatency _),
    "q205_k_anonymity" -> (RelationalOps.q205KAnonymity _),
    "q206_entry_paths" -> (RelationalOps.q206EntryPaths _),
    "q207_term_screen" -> (TextOps.q207TermScreen _),
    "q208_twap" -> (RelationalOps.q208Twap _),
    "q209_format_census" -> (MultimodalOps.q209FormatCensus _),
    "q210_spend_gini" -> (StatsOps.q210SpendGini _),
    "q211_isotonic" -> (StatsOps.q211IsotonicCalibration _),
    "q212_shapley" -> (RelationalOps.q212ShapleyAttribution _),
    "q213_rec_eval" -> (RelationalOps.q213RecEval _),
    "q214_hits" -> (GraphOps.q214Hits _),
    "q215_top_movers" -> (RelationalOps.q215TopMovers _),
    "q216_growth_accounting" -> (RelationalOps.q216GrowthAccounting _),
    "q217_kcenter" -> (SimilarityOps.q217KcenterCoreset _),
    "q218_dup_source_matrix" -> (DedupOps.q218DupSourceMatrix _),
    "q219_tokenizer_fertility" -> (TextOps.q219TokenizerFertility _),
    "q220_interval_coverage" -> (RelationalOps.q220IntervalCoverage _),
    "q221_spearman" -> (StatsOps.q221Spearman _),
    "q222_changelog_compact" -> (RelationalOps.q222ChangelogCompact _),
    "q223_clustering_coef" -> (GraphOps.q223ClusteringCoef _),
    "q224_forecast_backtest" -> (StatsOps.q224ForecastBacktest _),
    "q225_outlier_screen" -> (SimilarityOps.q225OutlierScreen _),
    "q226_dedup_yield" -> (DedupOps.q226DedupYield _),
    "q227_ann_index_search" -> (graft.sources.AnnIndexStore.q227AnnIndexSearch _),
    "q228_rate_limit" -> (RelationalOps.q228RateLimitReplay _),
    "q229_epsilon_join" -> (SimilarityOps.q229EpsilonJoin _),
    "q230_ndcg_eval" -> (RelationalOps.q230NdcgEval _),
    "q231_two_hop_reach" -> (GraphOps.q231TwoHopReach _),
    "q232_seq_patterns" -> (RelationalOps.q232SeqPatterns _),
    "q233_holt_winters" -> (StatsOps.q233HoltWinters _),
    "q234_rbo" -> (SimilarityOps.q234Rbo _),
    "q235_conformal" -> (StatsOps.q235ConformalCalibration _),
    "q236_interval_overlap" -> (RelationalOps.q236IntervalOverlapJoin _),
    "q237_countmin" -> (StatsOps.q237CountMin _),
    "q238_feature_hashing" -> (TextOps.q238FeatureHashing _),
    "q239_dbscan" -> (SimilarityOps.q239Dbscan _),
    "q240_ktruss" -> (GraphOps.q240KTruss _),
    "q241_user_growth" -> (RelationalOps.q241UserGrowth _),
    "q242_conformance" -> (RelationalOps.q242Conformance _),
    "q243_simpson" -> (StatsOps.q243SimpsonScreen _),
    "q244_woe_iv" -> (StatsOps.q244WoeIv _),
    "q245_js_matrix" -> (TextOps.q245JsMatrix _),
    "q246_doc_entropy" -> (TextOps.q246DocEntropy _),
    "q247_quality_classifier" -> (TextOps.q247QualityClassifier _),
    "q248_softmax_mix" -> (TextOps.q248SoftmaxMix _),
    "q249_perplexity" -> (TextOps.q249Perplexity _),
    "q250_calibration" -> (StatsOps.q250Calibration _),
    "q251_decayed_engagement" -> (RelationalOps.q251DecayedEngagement _),
    "q252_roc_auc" -> (StatsOps.q252RocAuc _),
    "q253_l_diversity" -> (RelationalOps.q253LDiversity _),
    "q254_t_closeness" -> (RelationalOps.q254TCloseness _),
    "q255_fifo_costing" -> (RelationalOps.q255FifoCosting _),
    "q256_sprt" -> (StatsOps.q256Sprt _),
    "q257_naive_bayes" -> (TextOps.q257NaiveBayes _),
    "q258_zipf_fit" -> (TextOps.q258ZipfFit _),
    "q259_readability" -> (TextOps.q259Readability _),
    "q260_cuped" -> (StatsOps.q260Cuped _),
    "q261_hill_tail" -> (StatsOps.q261HillTail _),
    "q262_jl_projection" -> (SimilarityOps.q262JlProjection _),
    "q263_bradley_terry" -> (StatsOps.q263BradleyTerry _),
    "q264_rendezvous" -> (RelationalOps.q264RendezvousShards _),
    "q265_scan_cluster" -> (GraphOps.q265Scan _),
    "q266_als_rank1" -> (SimilarityOps.q266AlsRank1 _),
    "q267_sax" -> (StatsOps.q267Sax _),
    "q268_mutual_info" -> (StatsOps.q268MutualInfo _),
    "q269_perm_test" -> (StatsOps.q269PermutationTest _),
    "q270_dp_release" -> (RelationalOps.q270DpRelease _),
    "q271_partial_corr" -> (StatsOps.q271PartialCorr _),
    "q272_elasticity" -> (StatsOps.q272Elasticity _),
    "q273_ams_sketch" -> (StatsOps.q273AmsSketch _),
    "q274_fano_factor" -> (StatsOps.q274FanoFactor _),
    "q275_single_linkage" -> (SimilarityOps.q275SingleLinkage _),
    "q276_rolling_ols" -> (StatsOps.q276RollingOls _),
    "q277_retention_halflife" -> (RelationalOps.q277RetentionHalflife _),
    "q278_srm_check" -> (StatsOps.q278SrmCheck _),
    "q279_seasonality_strength" -> (StatsOps.q279SeasonalityStrength _),
    "q280_segmental_ttr" -> (TextOps.q280SegmentalTtr _),
    "q281_diff_in_diff" -> (StatsOps.q281DiffInDiff _),
  )

  /** q29's generated oracle (r13): the q31 md5-MinHash replay widened
    * to the full 32-hash / 8-band family — 32 `list_min(md5('j|'||x))`
    * minima, comma-joined 4-minima band keys, the bucket-join distinct
    * pairs, and the signature-agreement estimate as 32 exact equality
    * terms; the 0.5 threshold is the integer compare agree·2 ≥ 32 and
    * est_jaccard = ROUND(agree/32, 3) rounds an exact dyadic on both
    * engines. `sigs` is MATERIALIZED (read by the band explode and both
    * pair-side joins — the q263 CTE-inlining rule).
    */
  private def minhashLshOracleSql: String = {
    val minima = (0 until 32).map(j =>
      s"list_min(list_transform(sh, x -> md5('$j|' || x))) AS m$j")
      .mkString(",\n                  ")
    val bandIds = (0 until 8).mkString(", ")
    val bandKeys = (0 until 8).map(b =>
      s"m${4 * b} || ',' || m${4 * b + 1} || ',' || " +
        s"m${4 * b + 2} || ',' || m${4 * b + 3}")
      .mkString(",\n                          ")
    val agree = (0 until 32).map(j =>
      s"CASE WHEN sa.m$j = sb.m$j THEN 1 ELSE 0 END")
      .mkString("\n                    + ")
    s"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, substr(text, strpos(text, ' ') + 1)
           FROM documents
         ), base AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
           FROM corpus
         ), shs AS (
           SELECT doc_id,
                  CASE WHEN len(tk) >= 3 THEN
                    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                   for i in range(1, len(tk) - 1)])
                  ELSE [array_to_string(tk, ' ')] END AS sh
           FROM base
         ), sigs AS MATERIALIZED (
           SELECT doc_id,
                  $minima
           FROM shs
         ), banded AS (
           SELECT doc_id,
                  unnest([$bandIds]) AS band_id,
                  unnest([$bandKeys]) AS band_key
           FROM sigs
         ), pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM banded a JOIN banded b
             ON a.band_id = b.band_id AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
         ), ag AS (
           SELECT p.doc_a, p.doc_b,
                  ($agree) AS agree
           FROM pairs p
           JOIN sigs sa ON sa.doc_id = p.doc_a
           JOIN sigs sb ON sb.doc_id = p.doc_b
         )
         SELECT doc_a, doc_b, ROUND(agree / 32.0, 3) AS est_jaccard
         FROM ag WHERE agree * 2 >= 32"""
  }

  /** q51's generated oracle (r13; r14 footer-adaptive): the md5-SimHash
    * bit family replayed in ANSI SQL — per token, 16 hex-nibble values
    * of md5(t); per doc, 64 ±1 vote sums; per bit, sign (tie → 1).
    * Candidates come from the simhashBandPlan integer rule replayed on
    * `2·count(*)`: (4 bands × 16 bits) ≤ 2²¹ corpus rows,
    * (3 × 21) ≤ 2²⁶, else (2 × 32) — the CASE picks the matching
    * bit-string key list, so the oracle survives any corpus size
    * instead of assuming the 4×16 pin. Exact Hamming as 64
    * sign-disagreement terms, ≤ 12. All-integer end to end.
    */
  private def simhashNearDupOracleSql: String = {
    val nibs = (0 until 16).map(p =>
      s"strpos('0123456789abcdef', substr(hx, ${p + 1}, 1)) - 1 AS n$p")
      .mkString(",\n                  ")
    val votes = (0 until 64).map { b =>
      val p = b / 4
      val m = 1 << (b % 4)
      s"SUM(CASE WHEN ((n$p // $m) % 2) = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(",\n                  ")
    val signs = (0 until 64).map(b =>
      s"CASE WHEN v$b >= 0 THEN 1 ELSE 0 END AS s$b")
      .mkString(",\n                  ")
    def keys(bands: Int, bits: Int): String = (0 until bands).map(t =>
      s"concat(${(bits * t until bits * t + bits).map(b => s"s$b")
        .mkString(", ")})")
      .mkString(",\n                            ")
    val ham = (0 until 64).map(b =>
      s"CASE WHEN sa.s$b <> sb.s$b THEN 1 ELSE 0 END")
      .mkString("\n                    + ")
    s"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, substr(text, strpos(text, ' ') + 1)
           FROM documents
         ), plan AS (
           SELECT CASE WHEN 2 * count(*) <= 2097152 THEN 4
                       WHEN 2 * count(*) <= 67108864 THEN 3
                       ELSE 2 END AS bands
           FROM documents
         ), tkn AS (
           SELECT doc_id,
                  unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
           FROM corpus
         ), hxs AS (
           SELECT doc_id, md5(t) AS hx FROM tkn
         ), nib AS (
           SELECT doc_id,
                  $nibs
           FROM hxs
         ), votes AS (
           SELECT doc_id,
                  $votes
           FROM nib GROUP BY doc_id
         ), sigs AS MATERIALIZED (
           SELECT doc_id,
                  $signs
           FROM votes
         ), banded AS (
           SELECT doc_id,
                  unnest(CASE p.bands
                    WHEN 4 THEN [0, 1, 2, 3]
                    WHEN 3 THEN [0, 1, 2]
                    ELSE [0, 1] END) AS band_id,
                  unnest(CASE p.bands
                    WHEN 4 THEN [${keys(4, 16)}]
                    WHEN 3 THEN [${keys(3, 21)}]
                    ELSE [${keys(2, 32)}] END) AS band_key
           FROM sigs, plan p
         ), pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM banded a JOIN banded b
             ON a.band_id = b.band_id AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
         )
         SELECT p.doc_a, p.doc_b,
                CAST($ham AS BIGINT) AS hamming
         FROM pairs p
         JOIN sigs sa ON sa.doc_id = p.doc_a
         JOIN sigs sb ON sb.doc_id = p.doc_b
         WHERE ($ham) <= 12"""
  }

  /** q76/q106's shared merge-round CTE chain (r14, VERDICT r13 #3):
    * the 12-round BPE training recursion unrolled as MATERIALIZED
    * per-round CTEs (the q217/q156/q263 pattern). Round state
    * st_r = (word, cnt, pos, sym); each round's OVERLAPPING adjacent
    * pair count takes its argmax under the total order
    * (weight DESC, l ASC, r ASC) — exactly trainLocal's queue order —
    * and the leftmost-non-overlapping rewrite is run-parity selection:
    * consecutive candidate positions (possible only when l = r) keep
    * odd ranks, selected positions fuse with their right neighbor,
    * consumed ones drop via NOT EXISTS. Caveat (documented, shared
    * with every char-indexing oracle here): DuckDB subscripts by
    * codepoint, Spark's split("") by UTF-16 code unit — identical on
    * BMP-only corpora like the testdata.
    */
  private def bpeMergeCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """wc AS MATERIALIZED (
           SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM (SELECT unnest(string_split_regex(lower(trim(text)),
                          '\s+')) AS tok
                 FROM documents WHERE text IS NOT NULL)
           WHERE len(tok) > 0 GROUP BY 1
         ), st0 AS MATERIALIZED (
           SELECT word, cnt, CAST(i AS BIGINT) AS pos, word[i] AS sym
           FROM (SELECT word, cnt,
                        unnest(generate_series(1, length(word))) AS i
                 FROM wc)
         )""")
    for (r <- 0 until rounds) sb.append(s""", pc$r AS (
           SELECT a.sym AS l, b.sym AS r, SUM(a.cnt) AS w
           FROM st$r a JOIN st$r b
             ON b.word = a.word AND b.pos = a.pos + 1
           GROUP BY 1, 2
         ), top$r AS MATERIALIZED (
           SELECT l, r, CAST(w AS BIGINT) AS w FROM pc$r
           ORDER BY w DESC, l ASC, r ASC LIMIT 1
         ), sel$r AS MATERIALIZED (
           SELECT word, pos FROM (
             SELECT word, pos,
                    ROW_NUMBER() OVER (PARTITION BY word, pos - rn
                                       ORDER BY pos) AS k
             FROM (SELECT a.word, a.pos,
                          ROW_NUMBER() OVER (PARTITION BY a.word
                                             ORDER BY a.pos) AS rn
                   FROM st$r a JOIN st$r b
                     ON b.word = a.word AND b.pos = a.pos + 1
                   JOIN top$r t ON a.sym = t.l AND b.sym = t.r)
           ) WHERE k % 2 = 1
         ), st${r + 1} AS MATERIALIZED (
           SELECT word, cnt,
                  CAST(ROW_NUMBER() OVER (PARTITION BY word
                                          ORDER BY pos) AS BIGINT) AS pos,
                  sym
           FROM (
             SELECT s.word, s.cnt, s.pos,
                    CASE WHEN x.pos IS NOT NULL THEN s.sym || nx.sym
                         ELSE s.sym END AS sym
             FROM st$r s
             LEFT JOIN sel$r x ON x.word = s.word AND x.pos = s.pos
             LEFT JOIN st$r nx ON nx.word = s.word AND nx.pos = s.pos + 1
             WHERE NOT EXISTS (SELECT 1 FROM sel$r c
                               WHERE c.word = s.word
                                 AND c.pos = s.pos - 1)
           )
         )""")
    sb.toString
  }

  private val BpeRounds = 12

  /** q76 oracle: the merge rows themselves — one per unrolled round. */
  private def bpeTrainOracleSql: String = {
    val rows = (0 until BpeRounds).map(r =>
      s"""SELECT CAST($r AS BIGINT) AS step, l AS "left", r AS "right",
                l || r AS merged, w AS weight FROM top$r""")
      .mkString("\n         UNION ALL\n         ")
    s"""WITH ${bpeMergeCtes(BpeRounds)}
         $rows"""
  }

  /** q106 oracle: encode the corpus under q76's learned table — the
    * canonical min-rank loop (per word: fuse ALL leftmost
    * non-overlapping occurrences of the LOWEST-RANK applicable pair,
    * repeat), unrolled to $BpeEncodeRounds fixed rounds over the
    * DISTINCT-word state (a round with no applicable pair is the
    * identity, so extra rounds are free). SOUNDNESS GUARD: if any
    * word still has an applicable pair after the last round, a
    * sentinel row (doc_id −1) is emitted — the driver's compare then
    * fails LOUDLY instead of silently passing a truncated replay.
    */
  private val BpeEncodeRounds = 24

  private def bpeEncodeOracleSql: String = {
    val sb = new StringBuilder
    sb.append(s"""WITH ${bpeMergeCtes(BpeRounds)}, mg AS MATERIALIZED (
           SELECT * FROM (
             SELECT step, l, r,
                    ROW_NUMBER() OVER (PARTITION BY l, r
                                       ORDER BY step) AS dup
             FROM (${(0 until BpeRounds).map(r =>
               s"SELECT CAST($r AS BIGINT) AS step, l, r FROM top$r")
               .mkString("\n                   UNION ALL\n                   ")})
           ) WHERE dup = 1
         ), est0 AS MATERIALIZED (
           SELECT word, pos, sym FROM st0
         )""")
    for (t <- 0 until BpeEncodeRounds) sb.append(s""", bs$t AS MATERIALIZED (
           SELECT a.word, MIN(m.step) AS step
           FROM est$t a JOIN est$t b
             ON b.word = a.word AND b.pos = a.pos + 1
           JOIN mg m ON m.l = a.sym AND m.r = b.sym
           GROUP BY 1
         ), es$t AS MATERIALIZED (
           SELECT a.word, a.pos FROM (
             SELECT a.word, a.pos,
                    ROW_NUMBER() OVER (PARTITION BY a.word
                                       ORDER BY a.pos) AS rn
             FROM est$t a JOIN est$t b
               ON b.word = a.word AND b.pos = a.pos + 1
             JOIN bs$t x ON x.word = a.word
             JOIN mg m ON m.step = x.step
                      AND m.l = a.sym AND m.r = b.sym) a
           QUALIFY ROW_NUMBER() OVER (PARTITION BY a.word, a.pos - a.rn
                                      ORDER BY a.pos) % 2 = 1
         ), est${t + 1} AS MATERIALIZED (
           SELECT word,
                  CAST(ROW_NUMBER() OVER (PARTITION BY word
                                          ORDER BY pos) AS BIGINT) AS pos,
                  sym
           FROM (
             SELECT s.word, s.pos,
                    CASE WHEN x.pos IS NOT NULL THEN s.sym || nx.sym
                         ELSE s.sym END AS sym
             FROM est$t s
             LEFT JOIN es$t x ON x.word = s.word AND x.pos = s.pos
             LEFT JOIN est$t nx ON nx.word = s.word AND nx.pos = s.pos + 1
             WHERE NOT EXISTS (SELECT 1 FROM es$t c
                               WHERE c.word = s.word
                                 AND c.pos = s.pos - 1)
           )
         )""")
    val T = BpeEncodeRounds
    sb.append(s""", enc AS MATERIALIZED (
           SELECT word, CAST(COUNT(*) AS BIGINT) AS n_sub,
                  string_agg(sym, ' ' ORDER BY pos) AS esub
           FROM est$T GROUP BY word
         ), dtok AS (
           SELECT doc_id, i AS tpos, tk[i] AS word
           FROM (SELECT doc_id, tk,
                        unnest(generate_series(1, len(tk))) AS i
                 FROM (SELECT doc_id,
                              string_split_regex(lower(trim(text)),
                                '\\s+') AS tk
                       FROM documents WHERE text IS NOT NULL))
           WHERE len(tk[i]) > 0
         ), leftover AS (
           SELECT COUNT(*) AS n
           FROM est$T a JOIN est$T b
             ON b.word = a.word AND b.pos = a.pos + 1
           JOIN mg m ON m.l = a.sym AND m.r = b.sym
         )
         SELECT d.doc_id,
                CAST(COALESCE(SUM(e.n_sub), 0) AS BIGINT) AS n_subtok,
                COALESCE(string_agg(e.esub, ' ' ORDER BY t.tpos), '')
                  AS subtoks
         FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
         LEFT JOIN dtok t ON t.doc_id = d.doc_id
         LEFT JOIN enc e ON e.word = t.word
         GROUP BY 1
         UNION ALL
         SELECT CAST(-1 AS BIGINT), n, 'ENCODE UNCONVERGED AFTER $T'
         FROM leftover WHERE n > 0""")
    sb.toString
  }

  /** q33's oracle (r13): the sign-LSH replay from first principles —
    * bits from the same integer rule (smallest b ∈ [4,24] with
    * 2^b·32 ≥ count(*)), ±1 planes regenerated by md5("t:i:k") over a
    * range unnest, signatures as sign bits of exact integer dots on
    * the floor-e6 lattice, bucket-mate candidates, and the q32 ROUND-4
    * cosine re-rank. `sigs` is MATERIALIZED (both candidate sides).
    */
  private def annLshOracleSql: String =
    s"""WITH nn AS (SELECT count(*) AS n FROM embeddings),
         bb AS (SELECT MIN(b) AS bits FROM range(4, 25) t(b), nn
                WHERE b = 24 OR (1::BIGINT << b) * 32 >= nn.n),
         planes AS (
           SELECT CAST(t.range AS INT) AS t, CAST(i.range AS INT) AS i,
                  CAST(k.range AS INT) AS k,
                  CASE WHEN substr(md5(t.range || ':' || i.range || ':'
                                       || k.range), 1, 1) < '8'
                    THEN 1 ELSE -1 END AS s
           FROM range(8) t, bb, range(24) i, range(64) k
           WHERE i.range < bb.bits
         ), q6 AS (
           SELECT vec_id,
                  CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS k,
                  CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                    AS BIGINT) AS qv
           FROM embeddings
         ), dots AS (
           SELECT v.vec_id, p.t, p.i, SUM(p.s * v.qv) AS dot
           FROM q6 v JOIN planes p ON p.k = v.k
           GROUP BY 1, 2, 3
         ), sigs AS MATERIALIZED (
           SELECT vec_id, t,
                  CAST(SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << i)
                    ELSE 0 END) AS BIGINT) AS sig
           FROM dots GROUP BY 1, 2
         ), cand AS (
           SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
           FROM sigs q JOIN sigs c ON q.t = c.t AND q.sig = c.sig
           WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
         ), pairs AS (
           SELECT cand.qid, cand.nid, a.embedding AS qe, b2.embedding AS ne
           FROM cand JOIN embeddings a ON a.vec_id = cand.qid
                     JOIN embeddings b2 ON b2.vec_id = cand.nid
         ), un AS (
           SELECT qid, nid, CAST(unnest(qe) AS DOUBLE) AS x,
                  CAST(unnest(ne) AS DOUBLE) AS y
           FROM pairs
         ), dd AS (
           SELECT qid, nid, SUM(x*y) AS dot, SUM(x*x) AS na,
                  SUM(y*y) AS nb
           FROM un GROUP BY qid, nid
         ), scored AS (
           SELECT qid, nid, ROUND(dot / (sqrt(na) * sqrt(nb)), 4)
                    AS cos_sim
           FROM dd
         ), ranked AS (
           SELECT qid, nid, cos_sim,
                  CAST(row_number() OVER (PARTITION BY qid
                    ORDER BY cos_sim DESC, nid) AS BIGINT) AS rank
           FROM scored
         )
         SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= 5"""

  /** q30's generated oracle (r13): the md5-SimHash vote/sign replay of
    * q51's (over the raw documents table, no planted corpus), with the
    * SIGNED 64-bit signature rebuilt entirely in BIGINT as
    * Σ_{b<63} s_b·2^b − s63·2^63 (−2⁶³ is representable; no HUGEINT
    * in the output path). Docs whose text is NULL never reach the
    * token unnest, so the final LEFT JOIN restores them with a NULL
    * signature — matching Spark's null-in/null-out expression.
    */
  private def simhashSigOracleSql: String = {
    val nibs = (0 until 16).map(p =>
      s"strpos('0123456789abcdef', substr(hx, ${p + 1}, 1)) - 1 AS n$p")
      .mkString(",\n                  ")
    val votes = (0 until 64).map { b =>
      val p = b / 4
      val m = 1 << (b % 4)
      s"SUM(CASE WHEN ((n$p // $m) % 2) = 1 THEN 1 ELSE -1 END) AS v$b"
    }.mkString(",\n                  ")
    val low = (0 until 63).map(b =>
      s"CASE WHEN v$b >= 0 THEN ${1L << b} ELSE 0 END")
      .mkString("\n                    + ")
    s"""WITH tkn AS (
           SELECT doc_id,
                  unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
           FROM documents
         ), hxs AS (
           SELECT doc_id, md5(t) AS hx FROM tkn
         ), nib AS (
           SELECT doc_id,
                  $nibs
           FROM hxs
         ), votes AS (
           SELECT doc_id,
                  $votes
           FROM nib GROUP BY doc_id
         ), sigs AS (
           SELECT doc_id,
                  CAST(($low)
                    + CASE WHEN v63 >= 0
                        THEN (-9223372036854775807 - 1) ELSE 0 END
                    AS BIGINT)
                    AS simhash
           FROM votes
         )
         SELECT d.doc_id, s.simhash
         FROM documents d LEFT JOIN sigs s ON s.doc_id = d.doc_id"""
  }

  /** The q217 oracle's unrolled greedy farthest-point traversal — the
    * same e6 lattice, seed rule and (md DESC, vec_id) tie order as the
    * operator, one (pick, running-min) CTE pair per round so DuckDB
    * replays the exact integer selection sequence.
    */
  private def kcenterOracleSql: String = {
    val sb = new StringBuilder(
      """WITH base AS (
           SELECT vec_id,
                  [CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                   for x in embedding] AS e6
           FROM embeddings
         ), pdim AS (
           SELECT vec_id, i, e6[i] AS e
           FROM (SELECT vec_id, e6,
                        unnest(generate_series(1, len(e6))) AS i
                 FROM base)
         ), c1 AS (SELECT vec_id FROM base ORDER BY vec_id LIMIT 1
         ), m1 AS (
           SELECT p.vec_id, SUM((p.e - c.e) * (p.e - c.e)) AS md
           FROM pdim p JOIN (SELECT i, e FROM pdim
             WHERE vec_id = (SELECT vec_id FROM c1)) c ON p.i = c.i
           GROUP BY 1)""")
    for (i <- 2 to 8) {
      sb ++= s""", c$i AS (SELECT vec_id, md FROM m${i - 1}
           ORDER BY md DESC, vec_id LIMIT 1)"""
      if (i < 8) sb ++= s""", m$i AS (
           SELECT m.vec_id, LEAST(m.md, d.d2) AS md
           FROM m${i - 1} m JOIN (
             SELECT p.vec_id, SUM((p.e - c.e) * (p.e - c.e)) AS d2
             FROM pdim p JOIN (SELECT i, e FROM pdim
               WHERE vec_id = (SELECT vec_id FROM c$i)) c ON p.i = c.i
             GROUP BY 1) d USING (vec_id))"""
    }
    sb ++= """
         SELECT CAST(1 AS BIGINT) AS pick_rank,
                (SELECT vec_id FROM c1) AS vec_id,
                CAST(NULL AS BIGINT) AS radius_d2"""
    for (i <- 2 to 8)
      sb ++= s"""
         UNION ALL SELECT CAST($i AS BIGINT),
                (SELECT vec_id FROM c$i),
                CAST((SELECT md FROM c$i) AS BIGINT)"""
    sb.toString
  }

  /** The q112 oracle: the SAME integer BM25 pipeline as the plan —
    * [[graft.operators.TextOps.bm25LnSteps]] emits the identical e9
    * fixed-point ln steps for both engines (DuckDB lateral column
    * aliases resolve them left-to-right, exactly like the chained
    * withColumn fold), idf·tf products run in HUGEINT where Spark uses
    * DECIMAL(38,0), and every division is non-negative so `//` ≡ DIV.
    */
  private def bm25OracleSql: String = {
    val steps = graft.operators.TextOps.bm25LnSteps("//")
      .map { case (n, e) => s"$e AS $n" }.mkString(",\n                  ")
    s"""WITH base AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+')
                    AS tk
           FROM documents WHERE text IS NOT NULL
         ), post AS (
           SELECT term, doc_id, dl, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
                        unnest(tk) AS term
                 FROM base)
           GROUP BY term, doc_id, dl
         ), dfreq AS (
           SELECT term, CAST(COUNT(*) AS BIGINT) AS df
           FROM post GROUP BY term
         ), stats AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(len(tk)) AS BIGINT) AS total_len
           FROM base
         ), seeds AS (
           SELECT doc_id AS query_id FROM base ORDER BY doc_id LIMIT 8
         ), qt AS (
           SELECT query_id, term, df FROM (
             SELECT s.query_id, p.term, d.df,
                    row_number() OVER (PARTITION BY s.query_id
                      ORDER BY d.df, p.term) AS rn
             FROM post p
             JOIN seeds s ON p.doc_id = s.query_id
             JOIN dfreq d ON p.term = d.term)
           WHERE rn <= 3
         ), idf AS (
           SELECT q.query_id, p.doc_id, p.tf, p.dl, n_docs, total_len,
                  2 * n_docs + 2 AS _p, 2 * q.df + 1 AS _q,
                  $steps
           FROM post p JOIN qt q ON p.term = q.term, stats
         ), contrib AS (
           SELECT query_id, doc_id,
                  88 * total_len * tf AS _num,
                  40 * total_len * tf + 12 * total_len
                    + 36 * dl * n_docs AS _den,
                  CAST((2 * CAST(idf_e9 AS HUGEINT) * _num + _den)
                       // (2 * _den) AS BIGINT) AS c9
           FROM idf
         ), scored AS (
           SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
                  CAST(SUM(c9) AS BIGINT) AS score_e9
           FROM contrib GROUP BY query_id, doc_id
         )
         SELECT query_id, doc_id, n_terms, score_e9 FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY score_e9 DESC, doc_id) AS rn
           FROM scored) WHERE rn <= 10"""
  }

  /** Lateral-alias select fragment for the shared fixed-point ln —
    * "<expr> AS <name>, …" in step order; DuckDB resolves the aliases
    * left-to-right exactly like Spark's chained withColumn fold.
    */
  private def lnSelect(out: String): String =
    graft.functions.FixedLn.steps("//", out)
      .map { case (n, e) => s"$e AS $n" }
      .mkString(",\n                  ")

  /** q244 oracle: the identical ppm-quantize → signed fixed-point ln →
    * integer IV pipeline in DuckDB (FixedLn emits both engines' steps
    * from one definition).
    */
  private def woeIvOracleSql: String =
    s"""WITH byb AS (
           SELECT o_orderpriority AS bucket,
                  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0
                           END) AS BIGINT) AS n_good,
                  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1
                           END) AS BIGINT) AS n_bad
           FROM orders GROUP BY 1
         ), tot AS (
           SELECT CAST(SUM(n_good) AS BIGINT) AS _gt,
                  CAST(SUM(n_bad) AS BIGINT) AS _bt
           FROM byb
         ), ppm AS (
           SELECT bucket, n_good, n_bad,
                  (2000000 * n_good + _gt) // (2 * _gt) AS pg_ppm,
                  (2000000 * n_bad + _bt) // (2 * _bt) AS pb_ppm
           FROM byb, tot
         ), ppmf AS (
           SELECT * FROM ppm WHERE pg_ppm > 0 AND pb_ppm > 0
         ), lnr AS (
           SELECT bucket, n_good, n_bad, pg_ppm, pb_ppm,
                  GREATEST(pg_ppm, pb_ppm) AS _p,
                  LEAST(pg_ppm, pb_ppm) AS _q,
                  CASE WHEN pg_ppm >= pb_ppm THEN 1 ELSE -1 END AS _sgn,
                  ${lnSelect("_ln9")}
           FROM ppmf
         )
         SELECT bucket, n_good, n_bad, pg_ppm, pb_ppm,
                CAST(_sgn * _ln9 AS BIGINT) AS woe_e9,
                CAST((2 * SUM((pg_ppm - pb_ppm) * _sgn * _ln9) OVER ()
                      + 1000000) // (2 * 1000000) AS BIGINT) AS iv_e9
         FROM lnr"""

  /** q245 oracle: shared-vocab pair rows exploded to one signed
    * fixed-point ln per side, single-source mass closed with +ppm·ln2
    * from the per-source totals — the plan's algebra verbatim.
    */
  private def jsMatrixOracleSql: String =
    s"""WITH tok AS (
           SELECT d.source, t.term
           FROM (SELECT source,
                        string_split_regex(lower(trim(text)), '\\s+')
                          AS toks
                 FROM documents) d,
                LATERAL unnest(d.toks) AS t(term)
           WHERE len(t.term) > 0
         ), st AS (
           SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n_st
           FROM tok GROUP BY 1, 2
         ), stot AS (
           SELECT source, CAST(SUM(n_st) AS BIGINT) AS n_s
           FROM st GROUP BY 1
         ), ppm0 AS (
           SELECT source, term,
                  (2000000 * n_st + n_s) // (2 * n_s) AS ppm
           FROM st JOIN stot USING (source)
         ), ppmf AS (
           SELECT * FROM ppm0 WHERE ppm > 0
         ), tot AS (
           SELECT source, CAST(SUM(ppm) AS BIGINT) AS tot_ppm
           FROM ppmf GROUP BY 1
         ), pr AS (
           SELECT a.source AS src_a, b.source AS src_b,
                  a.ppm AS a, b.ppm AS b
           FROM ppmf a JOIN ppmf b
             ON a.term = b.term AND a.source < b.source
         ), er AS (
           SELECT src_a, src_b, a, b,
                  unnest([a, b]) AS w,
                  unnest([2 * a, 2 * b]) AS num,
                  a + b AS den
           FROM pr
         ), lnr AS (
           SELECT src_a, src_b, a, b, w,
                  GREATEST(num, den) AS _p, LEAST(num, den) AS _q,
                  CASE WHEN num >= den THEN 1 ELSE -1 END AS _sgn,
                  ${lnSelect("_ln9")}
           FROM er
         ), sh AS (
           SELECT src_a, src_b,
                  CAST(COUNT(*) // 2 AS BIGINT) AS n_common,
                  SUM(w * _sgn * _ln9) AS _inner,
                  CAST(SUM(a) // 2 AS BIGINT) AS _sa,
                  CAST(SUM(b) // 2 AS BIGINT) AS _sb
           FROM lnr GROUP BY 1, 2
         )
         SELECT ta.source AS src_a, tb.source AS src_b,
                CAST(COALESCE(sh.n_common, 0) AS BIGINT) AS n_common,
                CAST((2 * (COALESCE(sh._inner, 0)
                        + ${graft.functions.FixedLn.Ln2E9} *
                          ((ta.tot_ppm - COALESCE(sh._sa, 0))
                           + (tb.tot_ppm - COALESCE(sh._sb, 0))))
                      + 2000000) // (2 * 2000000) AS BIGINT) AS js_e9
         FROM tot ta
         JOIN tot tb ON ta.source < tb.source
         LEFT JOIN sh ON sh.src_a = ta.source AND sh.src_b = tb.source"""

  /** q246 oracle: ln computed once per vocab term (1e6/ppm, ppm
    * clamped ≥ 1), per-doc exact integer Σ tf·(−ln p) with one
    * round-half-up division by the doc length.
    */
  private def docEntropyOracleSql: String =
    s"""WITH tok AS (
           SELECT d.doc_id, t.term
           FROM (SELECT doc_id,
                        string_split_regex(lower(trim(text)), '\\s+')
                          AS toks
                 FROM documents WHERE text IS NOT NULL) d,
                LATERAL unnest(d.toks) AS t(term)
           WHERE len(t.term) > 0
         ), tf AS (
           SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2
         ), nc AS (
           SELECT CAST(SUM(tf) AS BIGINT) AS n_c FROM tf
         ), tp AS (
           SELECT term,
                  1000000 AS _p,
                  GREATEST((2000000 * CAST(SUM(tf) AS BIGINT) + n_c)
                           // (2 * n_c), 1) AS _q
           FROM tf, nc GROUP BY term, n_c
         ), lnt AS (
           SELECT term,
                  ${lnSelect("_nl9")}
           FROM tp
         )
         SELECT f.doc_id, CAST(SUM(f.tf) AS BIGINT) AS n_tokens,
                CAST((2 * SUM(f.tf * l._nl9) + SUM(f.tf))
                     // (2 * SUM(f.tf)) AS BIGINT) AS xent_e9
         FROM tf f JOIN lnt l ON f.term = l.term
         GROUP BY f.doc_id"""

  /** Lateral-alias select fragment for the shared fixed-point exp. */
  private def expSelect(out: String): String =
    graft.functions.FixedExp.steps("//", out)
      .map { case (n, e) => s"$e AS $n" }
      .mkString(",\n                  ")

  /** The q247 feature+logit CTE chain shared textually by the q247 and
    * q248 oracles (q248 carries `source` through for the mixing stage).
    */
  private def logitCtes: String =
    s"""f AS (
           SELECT doc_id, source,
                  CAST(len(tk) AS BIGINT) AS t,
                  CAST(len(list_filter(tk, x -> list_contains(
                         ['the','a','of','and','to','in'], x)))
                       AS BIGINT) AS stop_cnt,
                  CAST(len(list_distinct(tk)) AS BIGINT) AS dct,
                  CAST(length(regexp_replace(lower(trim(text)), '\\s+',
                       '', 'g')) AS BIGINT) AS nonspace
           FROM (SELECT doc_id, source, text,
                        string_split_regex(lower(trim(text)), '\\s+')
                          AS tk
                 FROM documents WHERE text IS NOT NULL)
         ), feats AS (
           SELECT doc_id, source, t,
                  (2000000 * stop_cnt + t) // (2 * t) AS stop_ppm,
                  (2000000 * dct + t) // (2 * t) AS dist_ppm,
                  (200 * nonspace + t) // (2 * t) AS len_e2
           FROM f
         ), lg AS (
           SELECT doc_id, source, t,
                  -6000000000 + 4000 * stop_ppm + 3000 * dist_ppm
                    + 8000000 * LEAST(t, 400)
                    - 2000000 * LEAST(GREATEST(t - 400, 0), 2000)
                    + 1000000 * LEAST(len_e2, 800) AS z_e9
           FROM feats
         ), ex AS (
           SELECT doc_id, source, t, z_e9,
                  LEAST(ABS(z_e9), 20000000000) AS _x,
                  ${expSelect("_a")}
           FROM lg
         ), sc AS (
           SELECT doc_id, source, t, z_e9,
                  CASE WHEN z_e9 >= 0 THEN _pos
                       ELSE 1000000000 - _pos END AS score_e9
           FROM (SELECT *,
                   CAST((2 * 1000000000 * CAST(_a AS HUGEINT)
                          + (_a + 1000000000))
                        // (2 * (CAST(_a AS HUGEINT) + 1000000000))
                        AS BIGINT) AS _pos
                 FROM ex)
         )"""

  private def qualityClassifierOracleSql: String =
    s"""WITH $logitCtes
         SELECT doc_id, t AS n_tokens, z_e9, score_e9,
                score_e9 >= 500000000 AS kept
         FROM sc"""

  private def softmaxMixOracleSql: String =
    s"""WITH $logitCtes, bysrc AS (
           SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST((2 * SUM(score_e9) + COUNT(*))
                       // (2 * COUNT(*)) AS BIGINT) AS q_e9
           FROM sc GROUP BY 1
         ), zx AS (
           SELECT source, n_docs, q_e9,
                  LEAST(MAX(q_e9 * 20) OVER () - q_e9 * 20,
                        20000000000) AS _x
           FROM bysrc
         ), ez AS (
           SELECT source, n_docs, q_e9,
                  ${expSelect("_a")}
           FROM zx
         ), u AS (
           SELECT source, n_docs, q_e9,
                  CAST((2 * CAST(1000000000000000000 AS HUGEINT) + _a)
                       // (2 * CAST(_a AS HUGEINT)) AS BIGINT) AS _u
           FROM ez
         )
         SELECT source, n_docs, q_e9,
                CAST((2 * 1000000 * _u + SUM(_u) OVER ())
                     // (2 * SUM(_u) OVER ()) AS BIGINT) AS weight_ppm
         FROM u"""

  /** q250 oracle: the q247 score chain + equal-width bins + exact
    * integer Brier in HUGEINT.
    */
  private def calibrationOracleSql: String =
    s"""WITH $logitCtes, lab AS (
           SELECT sc.doc_id, sc.score_e9,
                  CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS _y,
                  LEAST(sc.score_e9 // 100000000, 9) AS bin,
                  (sc.score_e9 - (CASE WHEN d.lang = 'en' THEN 1 ELSE 0
                                  END) * 1000000000)
                  * (sc.score_e9 - (CASE WHEN d.lang = 'en' THEN 1 ELSE 0
                                    END) * 1000000000) AS _sq
           FROM sc JOIN documents d ON d.doc_id = sc.doc_id
         ), byb AS (
           SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST((2 * SUM(score_e9) + COUNT(*) * 1000)
                       // (2 * COUNT(*) * 1000) AS BIGINT) AS pred_ppm,
                  CAST((2 * 1000000 * SUM(_y) + COUNT(*))
                       // (2 * COUNT(*)) AS BIGINT) AS emp_ppm,
                  SUM(CAST(_sq AS HUGEINT)) AS _sqs
           FROM lab GROUP BY 1
         )
         SELECT bin, n_docs, pred_ppm, emp_ppm,
                ABS(pred_ppm - emp_ppm) AS gap_ppm,
                CAST((2 * SUM(_sqs) OVER ()
                      + SUM(n_docs) OVER () * CAST(1000000000 AS HUGEINT))
                     // (2 * SUM(n_docs) OVER ()
                         * CAST(1000000000 AS HUGEINT)) AS BIGINT)
                  AS brier_e9
         FROM byb"""

  /** q251 oracle: per-event exact integer decay weight (gap µs DIV
    * 2592 → e9 argument, clamp, exp steps, long 1e18-inverse), grouped
    * per user.
    */
  private def decayedEngagementOracleSql: String =
    s"""WITH ev AS (
           SELECT user_id, epoch_us(ts) AS us
           FROM events WHERE user_id IS NOT NULL
         ), mx AS (SELECT MAX(us) AS _mx FROM ev
         ), b AS (
           SELECT user_id, us, _mx,
                  LEAST((_mx - us) // 2592, 20000000000) AS _x
           FROM ev, mx
         ), e AS (
           SELECT user_id, us, _mx,
                  ${expSelect("_a")}
           FROM b
         ), w AS (
           SELECT user_id, us, _mx,
                  (2000000000000000000 + _a) // (2 * _a) AS _w
           FROM e
         )
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                CAST(SUM(_w) AS BIGINT) AS engagement_e9,
                CAST(MIN(_mx - us) // 86400000000 AS BIGINT)
                  AS days_since_last
         FROM w GROUP BY user_id"""

  private def perplexityOracleSql: String =
    s"""WITH tok AS (
           SELECT d.doc_id, t.term
           FROM (SELECT doc_id,
                        string_split_regex(lower(trim(text)), '\\s+')
                          AS toks
                 FROM documents WHERE text IS NOT NULL) d,
                LATERAL unnest(d.toks) AS t(term)
           WHERE len(t.term) > 0
         ), tf AS (
           SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2
         ), nc AS (
           SELECT CAST(SUM(tf) AS BIGINT) AS n_c FROM tf
         ), tp AS (
           SELECT term,
                  1000000 AS _p,
                  GREATEST((2000000 * CAST(SUM(tf) AS BIGINT) + n_c)
                           // (2 * n_c), 1) AS _q
           FROM tf, nc GROUP BY term, n_c
         ), lnt AS (
           SELECT term,
                  ${lnSelect("_nl9")}
           FROM tp
         ), ent AS (
           SELECT f.doc_id, CAST(SUM(f.tf) AS BIGINT) AS n_tokens,
                  CAST((2 * SUM(f.tf * l._nl9) + SUM(f.tf))
                       // (2 * SUM(f.tf)) AS BIGINT) AS xent_e9
           FROM tf f JOIN lnt l ON f.term = l.term
           GROUP BY f.doc_id
         ), pex AS (
           SELECT doc_id, n_tokens, xent_e9, xent_e9 AS _x,
                  ${expSelect("_a")}
           FROM ent
         )
         SELECT doc_id, n_tokens, xent_e9,
                CAST((2 * _a + 1000000) // (2 * 1000000) AS BIGINT)
                  AS ppl_e3,
                CASE WHEN (2 * _a + 1000000) // (2 * 1000000) < 30000
                       THEN 'head'
                     WHEN (2 * _a + 1000000) // (2 * 1000000) < 31500
                       THEN 'middle'
                     ELSE 'tail' END AS band
         FROM pex"""

  /** q252 oracle: the q247 score chain + per-(source, score) counts,
    * exclusive-prefix negatives by window, exact HUGEINT 2U products
    * and the same round-half-up ppm division.
    */
  private def rocAucOracleSql: String =
    s"""WITH $logitCtes, lab AS (
           SELECT sc.source, sc.score_e9,
                  CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
           FROM sc JOIN documents d ON d.doc_id = sc.doc_id
         ), cnt AS (
           SELECT source, score_e9,
                  CAST(SUM(y) AS BIGINT) AS c1,
                  CAST(SUM(1 - y) AS BIGINT) AS c0
           FROM lab GROUP BY 1, 2
         ), cum AS (
           SELECT source, c1, c0,
                  COALESCE(SUM(c0) OVER (PARTITION BY source
                    ORDER BY score_e9
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS e0
           FROM cnt
         ), agg AS (
           SELECT source, CAST(SUM(c1) AS BIGINT) AS n_pos,
                  CAST(SUM(c0) AS BIGINT) AS n_neg,
                  SUM(CAST(c1 AS HUGEINT) * (2 * e0 + c0)) AS u2
           FROM cum GROUP BY 1
         ), res AS (
           SELECT source, n_pos, n_neg, CAST(u2 AS BIGINT) AS u_x2,
                  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                    CAST((2 * 1000000 * u2
                          + 2 * CAST(n_pos AS HUGEINT) * n_neg)
                         // (4 * CAST(n_pos AS HUGEINT) * n_neg)
                         AS BIGINT)
                  END AS auc_ppm
           FROM agg
         )
         SELECT source, n_pos, n_neg, u_x2, auc_ppm,
                auc_ppm * 2 - 1000000 AS gini_ppm
         FROM res"""

  /** The q253/q254 shared (QI class, balance band) cell CTE — exact
    * DECIMAL threshold cuts, identical to the Spark side.
    */
  private def acctBandCellsCte: String =
    """cells AS (
           SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
                  c_mktsegment AS mktsegment,
                  CASE WHEN CAST(c_acctbal AS DECIMAL(18,4)) < 0
                         THEN 'neg'
                       WHEN CAST(c_acctbal AS DECIMAL(18,4)) < 2500
                         THEN 'low'
                       WHEN CAST(c_acctbal AS DECIMAL(18,4)) < 7500
                         THEN 'mid'
                       ELSE 'high' END AS band,
                  CAST(COUNT(*) AS BIGINT) AS n_band
           FROM customer GROUP BY 1, 2, 3
         )"""

  /** q253 oracle: the identical ppm-share → fixed-point entropy →
    * fixed-point exp pipeline on the bounded class×band cells.
    */
  private def lDiversityOracleSql: String =
    s"""WITH $acctBandCellsCte, byc AS (
           SELECT nationkey, mktsegment,
                  CAST(SUM(n_band) AS BIGINT) AS n_rows,
                  CAST(COUNT(*) AS BIGINT) AS distinct_l
           FROM cells GROUP BY 1, 2
         ), pp AS (
           SELECT c.nationkey, c.mktsegment,
                  GREATEST((2000000 * c.n_band + b.n_rows)
                           // (2 * b.n_rows), 1) AS _ppm
           FROM cells c JOIN byc b USING (nationkey, mktsegment)
         ), lnr AS (
           SELECT nationkey, mktsegment, _ppm,
                  1000000 AS _p, _ppm AS _q,
                  ${lnSelect("_nl9")}
           FROM pp
         ), ent AS (
           SELECT nationkey, mktsegment,
                  CAST((2 * SUM(_ppm * _nl9) + 1000000)
                       // (2 * 1000000) AS BIGINT) AS entropy_e9
           FROM lnr GROUP BY 1, 2
         ), ex AS (
           SELECT nationkey, mktsegment, entropy_e9,
                  entropy_e9 AS _x,
                  ${expSelect("_a")}
           FROM ent
         )
         SELECT b.nationkey, b.mktsegment, b.n_rows, b.distinct_l,
                e.entropy_e9,
                (2 * e._a + 1000000) // (2 * 1000000) AS eff_classes_e3,
                b.distinct_l >= 3 AS ok_l3
         FROM byc b JOIN ex e USING (nationkey, mktsegment)"""

  /** q254 oracle: same cells, global band ppm, the zero-filled class
    * × band grid and the round-half-up TV/2.
    */
  private def tClosenessOracleSql: String =
    s"""WITH $acctBandCellsCte, byc AS (
           SELECT nationkey, mktsegment,
                  CAST(SUM(n_band) AS BIGINT) AS n_rows
           FROM cells GROUP BY 1, 2
         ), gl AS (
           SELECT band, CAST(SUM(n_band) AS BIGINT) AS _ng
           FROM cells GROUP BY 1
         ), gt AS (SELECT CAST(SUM(_ng) AS BIGINT) AS _nt FROM gl
         ), gp AS (
           SELECT band, (2000000 * _ng + _nt) // (2 * _nt) AS g_ppm
           FROM gl, gt
         ), j AS (
           SELECT b.nationkey, b.mktsegment, b.n_rows, g.g_ppm,
                  (2000000 * COALESCE(c.n_band, 0) + b.n_rows)
                    // (2 * b.n_rows) AS c_ppm
           FROM byc b CROSS JOIN gp g
           LEFT JOIN cells c
             ON c.nationkey = b.nationkey
            AND c.mktsegment = b.mktsegment AND c.band = g.band
         )
         SELECT nationkey, mktsegment,
                CAST(MAX(n_rows) AS BIGINT) AS n_rows,
                CAST((SUM(ABS(c_ppm - g_ppm)) + 1) // 2 AS BIGINT)
                  AS t_ppm,
                CAST((SUM(ABS(c_ppm - g_ppm)) + 1) // 2 AS BIGINT)
                  > 200000 AS breach_t02
         FROM j GROUP BY 1, 2"""

  /** q255 oracle: the identical lot cumsum + clamp-against-demand
    * consumption — same ordering keys, same e4/e8 integer money.
    */
  private def fifoCostingOracleSql: String =
    """WITH li AS (
           SELECT l_partkey AS partkey, l_linestatus AS st,
                  l_shipdate AS sd, l_orderkey AS ok,
                  l_linenumber AS ln,
                  CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000
                       AS BIGINT) AS qty_e4,
                  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
                       AS BIGINT) AS price_e4
           FROM lineitem
         ), lots AS (
           SELECT partkey, qty_e4,
                  SUM(qty_e4) OVER (PARTITION BY partkey
                    ORDER BY sd, ok, ln, qty_e4, price_e4
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum_end,
                  (2 * price_e4 * 10000 + qty_e4) // (2 * qty_e4)
                    AS unit_e4
           FROM li WHERE st = 'F'
         ), demand AS (
           SELECT partkey, CAST(COUNT(*) AS BIGINT) AS n_issues,
                  CAST(SUM(qty_e4) AS BIGINT) AS issued_qty_e4
           FROM li WHERE st = 'O' GROUP BY 1
         ), cons AS (
           SELECT l.partkey, d.n_issues, d.issued_qty_e4, l.qty_e4,
                  l.unit_e4,
                  LEAST(l.cum_end, d.issued_qty_e4)
                    - LEAST(l.cum_end - l.qty_e4, d.issued_qty_e4)
                    AS c
           FROM lots l JOIN demand d USING (partkey)
         )
         SELECT partkey, CAST(COUNT(*) AS BIGINT) AS n_lots,
                CAST(MAX(n_issues) AS BIGINT) AS n_issues,
                CAST(MAX(issued_qty_e4) AS BIGINT) AS issued_qty_e4,
                CAST(SUM(c) AS BIGINT) AS consumed_qty_e4,
                CAST((2 * SUM(CAST(c AS HUGEINT) * unit_e4) + 10000)
                     // (2 * 10000) AS BIGINT) AS cogs_e4,
                CAST((2 * SUM(CAST(qty_e4 - c AS HUGEINT) * unit_e4)
                      + 10000)
                     // (2 * 10000) AS BIGINT) AS end_inventory_e4
         FROM cons GROUP BY 1"""

  /** q256 oracle: same FixedLn increment constants (generated from the
    * one Scala definition), same window cumsum and first-crossing
    * selection via FILTERed arg_min.
    */
  private def sprtOracleSql: String = {
    val l1 = graft.functions.FixedLn.lnE9(5, 3)
    val l0 = -graft.functions.FixedLn.lnE9(7, 5)
    val a = graft.functions.FixedLn.lnE9(19, 1)
    s"""WITH ev AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                    AS x
           FROM events WHERE user_id IS NOT NULL
         ), c AS (
           SELECT user_id, x,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY us, event_id) AS rn,
                  SUM(CASE WHEN x = 1 THEN $l1 ELSE $l0 END)
                    OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS llr
           FROM ev
         )
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
                CAST(SUM(x) AS BIGINT) AS n_hits,
                CASE WHEN MIN(CASE WHEN llr >= $a THEN rn END)
                       IS NOT NULL
                      AND (MIN(CASE WHEN llr <= -$a THEN rn END) IS NULL
                        OR MIN(CASE WHEN llr >= $a THEN rn END)
                         < MIN(CASE WHEN llr <= -$a THEN rn END))
                  THEN 'accept_h1'
                WHEN MIN(CASE WHEN llr <= -$a THEN rn END) IS NOT NULL
                  THEN 'accept_h0'
                ELSE 'continue' END AS decision,
                CAST(LEAST(MIN(CASE WHEN llr >= $a THEN rn END),
                           MIN(CASE WHEN llr <= -$a THEN rn END))
                     AS BIGINT) AS n_at_decision,
                CAST(COALESCE(
                       arg_min(llr, rn)
                         FILTER (WHERE llr >= $a OR llr <= -$a),
                       arg_max(llr, rn)) AS BIGINT) AS llr_e9
         FROM c GROUP BY user_id"""
  }

  /** q257 oracle: the identical train/score split, Laplace-smoothed
    * FixedLn log-probs at vocab×class scale, and (s DESC, cls) argmax.
    */
  private def naiveBayesOracleSql: String =
    s"""WITH tok AS (
           SELECT d.doc_id, d.lang, t.term
           FROM (SELECT doc_id, lang,
                        string_split_regex(lower(trim(text)), '\\s+')
                          AS toks
                 FROM documents WHERE text IS NOT NULL) d,
                LATERAL unnest(d.toks) AS t(term)
           WHERE len(t.term) > 0
         ), train AS (SELECT * FROM tok WHERE doc_id % 2 = 0
         ), tst AS (SELECT * FROM tok WHERE doc_id % 2 = 1
         ), tdoc AS (
           SELECT doc_id, lang FROM documents
           WHERE text IS NOT NULL AND doc_id % 2 = 0
         ), cls AS (
           SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS n_docs_c
           FROM tdoc GROUP BY 1
         ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM tdoc
         ), pri AS (
           SELECT cls, n_docs AS _p, n_docs_c AS _q,
                  ${lnSelect("_pl9")}
           FROM cls, tot
         ), priors AS (SELECT cls, -_pl9 AS prior_e9 FROM pri
         ), ct AS (
           SELECT lang AS cls, term, CAST(COUNT(*) AS BIGINT) AS tf_c
           FROM train GROUP BY 1, 2
         ), nc AS (
           SELECT cls, CAST(SUM(tf_c) AS BIGINT) AS n_c
           FROM ct GROUP BY 1
         ), vv AS (
           SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM train
         ), lnp0 AS (
           SELECT c.cls, c.term, n.n_c + vv.v AS _p, c.tf_c + 1 AS _q,
                  ${lnSelect("_l9")}
           FROM ct c JOIN nc n USING (cls), vv
         ), lnpt AS (SELECT cls, term, -_l9 AS lnp_e9 FROM lnp0
         ), un0 AS (
           SELECT n.cls, n.n_c + vv.v AS _p, 1 AS _q,
                  ${lnSelect("_u9")}
           FROM nc n, vv
         ), unseen AS (SELECT cls, -_u9 AS lnp0_e9 FROM un0
         ), td AS (
           SELECT doc_id, lang AS actual, term,
                  CAST(COUNT(*) AS BIGINT) AS tf
           FROM tst GROUP BY 1, 2, 3
         ), sc AS (
           SELECT t.doc_id, t.actual, u.cls,
                  MAX(p.prior_e9)
                    + SUM(t.tf * COALESCE(l.lnp_e9, u.lnp0_e9)) AS s
           FROM td t
           CROSS JOIN unseen u
           LEFT JOIN lnpt l ON l.cls = u.cls AND l.term = t.term
           JOIN priors p ON p.cls = u.cls
           GROUP BY t.doc_id, t.actual, u.cls
         ), win AS (
           SELECT doc_id, actual, cls AS predicted
           FROM (SELECT doc_id, actual, cls,
                        row_number() OVER (PARTITION BY doc_id
                          ORDER BY s DESC, cls) AS rn
                 FROM sc)
           WHERE rn = 1
         ), conf AS (
           SELECT actual AS actual_lang, predicted AS predicted_lang,
                  CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM win GROUP BY 1, 2
         )
         SELECT actual_lang, predicted_lang, n_docs,
                CAST((2000000 * n_docs
                      + SUM(n_docs) OVER (PARTITION BY actual_lang))
                     // (2 * SUM(n_docs) OVER (PARTITION BY actual_lang))
                     AS BIGINT) AS share_ppm
         FROM conf"""

  /** q258 oracle: vocab-scale ranked counts, two fixed-point ln
    * chains, exact HUGEINT OLS moments, signed round-half-up output.
    */
  private def zipfFitOracleSql: String =
    s"""WITH tok AS (
           SELECT d.source, t.term
           FROM (SELECT source,
                        string_split_regex(lower(trim(text)), '\\s+')
                          AS toks
                 FROM documents WHERE text IS NOT NULL) d,
                LATERAL unnest(d.toks) AS t(term)
           WHERE len(t.term) > 0
         ), cnt AS (
           SELECT source, term, CAST(COUNT(*) AS BIGINT) AS freq
           FROM tok GROUP BY 1, 2
         ), top AS (
           SELECT source, freq,
                  CAST(rnk AS BIGINT) AS rank
           FROM (SELECT source, term, freq,
                        row_number() OVER (PARTITION BY source
                          ORDER BY freq DESC, term) AS rnk
                 FROM cnt)
           WHERE rnk <= 300
         ), lx0 AS (
           SELECT source, freq, rank AS _p, 1 AS _q,
                  ${lnSelect("x")}
           FROM top
         ), lx AS (
           -- prune the first chain's step columns: the second chain's
           -- lateral _p/_q aliases must not collide with base columns
           -- (DuckDB resolves the BASE column on conflict)
           SELECT source, freq, x FROM lx0
         ), ly0 AS (
           SELECT source, x, freq AS _p, 1 AS _q,
                  ${lnSelect("y")}
           FROM lx
         ), ly AS (
           SELECT source, x, y FROM ly0
         ), m AS (
           SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
                  SUM(CAST(x AS HUGEINT)) AS sx,
                  SUM(CAST(y AS HUGEINT)) AS sy,
                  SUM(CAST(x AS HUGEINT) * y) AS sxy,
                  SUM(CAST(x AS HUGEINT) * x) AS sxx
           FROM ly GROUP BY 1
         ), f AS (
           SELECT source, n_terms,
                  n_terms * sxy - sx * sy AS num,
                  n_terms * sxx - sx * sx AS den, sx, sy
           FROM m
         ), sl AS (
           SELECT source, n_terms, sx, sy,
                  CASE WHEN num >= 0
                    THEN CAST((2 * 1000000 * num + den)
                              // (2 * den) AS BIGINT)
                    ELSE -CAST((2 * 1000000 * (-num) + den)
                               // (2 * den) AS BIGINT) END AS slope_e6
           FROM f WHERE den > 0
         )
         SELECT source, n_terms, slope_e6,
                CASE WHEN 1000000 * sy - slope_e6 * sx >= 0
                  THEN CAST((2 * (1000000 * sy - slope_e6 * sx)
                             + 1000000 * n_terms)
                            // (2 * 1000000 * n_terms) AS BIGINT)
                  ELSE -CAST((2 * (-(1000000 * sy - slope_e6 * sx))
                              + 1000000 * n_terms)
                             // (2 * 1000000 * n_terms) AS BIGINT) END
                  AS intercept_e9
         FROM sl"""

  /** q259 oracle: the same three surface counts from the same POSIX
    * regex semantics, rhu e3 formula terms, exact subtraction.
    */
  private def readabilityOracleSql: String =
    """WITH base AS (
           SELECT doc_id,
                  CAST(len(list_filter(tk, x -> len(x) > 0))
                       AS BIGINT) AS n_words,
                  CAST(GREATEST(len(regexp_extract_all(nt, '[.!?]+')),
                       1) AS BIGINT) AS n_sents,
                  CAST(len(regexp_extract_all(nt, '[aeiou]+'))
                       + len(list_filter(tk, x -> len(x) > 0
                           AND NOT regexp_matches(x, '[aeiou]')))
                       AS BIGINT) AS n_syll
           FROM (SELECT doc_id, lower(trim(text)) AS nt,
                        string_split_regex(lower(trim(text)), '\s+')
                          AS tk
                 FROM documents WHERE text IS NOT NULL)
         ), f AS (
           SELECT doc_id, n_words, n_sents, n_syll,
                  206835
                    - (2 * 1015 * n_words + n_sents) // (2 * n_sents)
                    - (2 * 84600 * n_syll + n_words) // (2 * n_words)
                    AS fre_e3,
                  (2 * 390 * n_words + n_sents) // (2 * n_sents)
                    + (2 * 11800 * n_syll + n_words) // (2 * n_words)
                    - 15590 AS fk_e3
           FROM base WHERE n_words > 0
         )
         SELECT doc_id, n_words, n_sents, n_syll,
                CAST(fre_e3 AS BIGINT) AS fre_e3,
                CAST(fk_e3 AS BIGINT) AS fk_e3,
                CASE WHEN fre_e3 >= 70000 THEN 'easy'
                     WHEN fre_e3 >= 50000 THEN 'standard'
                     ELSE 'difficult' END AS band
         FROM f"""

  /** q260 oracle: same midpoint split, md5 arms, HUGEINT moments,
    * signed rhu θ/adjusted mean, double ρ² on the 1-row moments.
    */
  private def cupedOracleSql: String =
    """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS us,
                  CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
                    AS v_e4
           FROM events
           WHERE user_id IS NOT NULL AND event_type = 'purchase'
         ), mid AS (
           SELECT (MIN(us) + MAX(us)) // 2 AS _mid FROM ev
         ), pu AS (
           SELECT user_id,
                  CAST(SUM(CASE WHEN us < _mid THEN v_e4 ELSE 0 END)
                       AS BIGINT) AS x,
                  CAST(SUM(CASE WHEN us >= _mid THEN v_e4 ELSE 0 END)
                       AS BIGINT) AS y,
                  CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 'A' ELSE 'B' END AS arm
           FROM ev, mid GROUP BY user_id, _mid
         ), pool AS (
           SELECT CAST(COUNT(*) AS HUGEINT) AS _n,
                  CAST(SUM(x) AS HUGEINT) AS _sx,
                  CAST(SUM(y) AS HUGEINT) AS _sy,
                  SUM(CAST(x AS HUGEINT) * y) AS _sxy,
                  SUM(CAST(x AS HUGEINT) * x) AS _sxx,
                  SUM(CAST(y AS HUGEINT) * y) AS _syy
           FROM pu
         ), th AS (
           SELECT _n, _sx,
                  _n * _sxy - _sx * _sy AS _num,
                  _n * _sxx - _sx * _sx AS _dx,
                  _n * _syy - _sy * _sy AS _dy
           FROM pool
         ), tr AS (
           SELECT _n, _sx,
                  CASE WHEN _dx > 0 THEN
                    CASE WHEN _num >= 0
                      THEN CAST((2 * 1000000 * _num + _dx)
                                // (2 * _dx) AS BIGINT)
                      ELSE -CAST((2 * 1000000 * (-_num) + _dx)
                                 // (2 * _dx) AS BIGINT) END
                  END AS theta_e6,
                  CASE WHEN _dx > 0 AND _dy > 0 THEN
                    ROUND(CAST(_num AS DOUBLE) * CAST(_num AS DOUBLE)
                          / (CAST(_dx AS DOUBLE) * CAST(_dy AS DOUBLE)),
                          4)
                  END AS rho2
           FROM th
         ), byarm AS (
           SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
                  CAST(SUM(x) AS HUGEINT) AS _sxa,
                  CAST(SUM(y) AS HUGEINT) AS _sya
           FROM pu GROUP BY 1
         ), j AS (
           SELECT b.arm, b.n_users, b._sxa, b._sya,
                  t._n, t._sx, t.theta_e6, t.rho2,
                  1000000 * b._sya * t._n - t.theta_e6 * b._sxa * t._n
                    + t.theta_e6 * t._sx * b.n_users AS _t
           FROM byarm b, tr t
         )
         SELECT arm, n_users,
                CAST((2 * _sya + n_users) // (2 * n_users) AS BIGINT)
                  AS mean_y_e4,
                CASE WHEN theta_e6 IS NOT NULL THEN
                  CASE WHEN _t >= 0
                    THEN CAST((2 * _t + 1000000 * n_users * _n)
                              // (2 * 1000000 * n_users * _n) AS BIGINT)
                    ELSE -CAST((2 * (-_t) + 1000000 * n_users * _n)
                               // (2 * 1000000 * n_users * _n)
                               AS BIGINT) END
                END AS mean_adj_e4,
                theta_e6, rho2
         FROM j"""

  /** q261 oracle: row_number top-(k+1) per nation, same e3 quantize
    * and ln fold.
    */
  private def hillTailOracleSql: String =
    s"""WITH vals AS (
           SELECT n.n_name, o.o_orderkey,
                  (2 * CAST(CAST(o.o_totalprice AS DECIMAL(18,4))
                        * 10000 AS BIGINT) + 10) // (2 * 10) AS v_e3
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
         ), top AS (
           SELECT n_name, v_e3
           FROM (SELECT n_name, v_e3,
                        row_number() OVER (PARTITION BY n_name
                          ORDER BY v_e3 DESC, o_orderkey) AS rn
                 FROM vals)
           WHERE rn <= 101
         ), thr AS (
           SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_top,
                  CAST(MIN(v_e3) AS BIGINT) AS thr_e3
           FROM top GROUP BY 1
         ), lnr AS (
           SELECT t.n_name, h.n_top, h.thr_e3,
                  t.v_e3 AS _p, h.thr_e3 AS _q,
                  ${lnSelect("_l9")}
           FROM top t JOIN thr h USING (n_name)
         ), agg AS (
           SELECT n_name, MAX(n_top) AS n_top, MAX(thr_e3) AS thr_e3,
                  CAST(SUM(_l9) AS BIGINT) AS _sl
           FROM lnr GROUP BY 1
         )
         SELECT n_name, n_top, n_top - 1 AS k, thr_e3,
                CASE WHEN _sl > 0 THEN
                  CAST((2000000000000000 * (n_top - 1) + _sl)
                       // (2 * _sl) AS BIGINT)
                END AS alpha_e6
         FROM agg WHERE n_top >= 2"""

  /** q262 oracle: same e6 lattice, md5-parity sign matrix from the
    * distinct element indices, exact integer projections.
    */
  private def jlProjectionOracleSql: String =
    """WITH base AS (
           SELECT vec_id,
                  [CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                   for x in embedding] AS e6
           FROM embeddings
         ), el AS (
           SELECT vec_id, CAST(i AS BIGINT) AS i, e6[i] AS e
           FROM (SELECT vec_id, e6,
                        unnest(generate_series(1, len(e6))) AS i
                 FROM base)
         ), dims AS (
           SELECT unnest(generate_series(0, 15)) AS dim
         ), signs AS (
           SELECT ii.i, d.dim,
                  CASE WHEN substr(md5(CAST(d.dim AS VARCHAR) || '_'
                         || CAST(ii.i AS VARCHAR)), 1, 1) < '8'
                       THEN 1 ELSE -1 END AS sgn
           FROM (SELECT DISTINCT i FROM el) ii, dims d
         )
         SELECT el.vec_id, CAST(s.dim AS BIGINT) AS dim,
                CAST(SUM(s.sgn * el.e) AS BIGINT) AS proj_e6
         FROM el JOIN signs s ON s.i = el.i
         GROUP BY 1, 2"""

  /** q263 oracle: the identical duel construction, then the 15 MM
    * rounds UNROLLED as generated CTE triples (Sᵢ / p'ᵢ / normalize)
    * replaying the exact HUGEINT round-half-up recursion — the
    * q217/q156 iterative-oracle pattern.
    */
  private def bradleyTerryOracleSql: String = {
    val sb = new StringBuilder(
      """WITH spend AS (
           SELECT l.l_orderkey AS ok, p.p_brand AS brand,
                  CAST(SUM(CAST(CAST(l.l_extendedprice
                        AS DECIMAL(18,4)) * 10000 AS BIGINT))
                       AS BIGINT) AS sp
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY 1, 2
         ), rk AS (
           SELECT ok, brand,
                  row_number() OVER (PARTITION BY ok
                    ORDER BY sp DESC, brand) AS rn,
                  COUNT(*) OVER (PARTITION BY ok) AS nb
           FROM spend
         ), duels AS (
           SELECT w.brand AS winner, l2.brand AS loser
           FROM rk w JOIN rk l2 ON w.ok = l2.ok
           WHERE w.rn = 1 AND l2.rn = 2 AND w.nb >= 2
         ), wmat AS (
           SELECT winner, loser, CAST(COUNT(*) AS BIGINT) AS w
           FROM duels GROUP BY 1, 2
         ), wns AS (
           SELECT winner AS b, CAST(SUM(w) AS BIGINT) AS wn
           FROM wmat GROUP BY 1
         ), lss AS (
           SELECT loser AS b, CAST(SUM(w) AS BIGINT) AS ls
           FROM wmat GROUP BY 1
         ), items AS MATERIALIZED (
           SELECT b, wn, ls FROM wns JOIN lss USING (b)
         ), kk AS MATERIALIZED (
           SELECT CAST(COUNT(*) AS HUGEINT) AS k FROM items
         ), prs AS MATERIALIZED (
           SELECT t.i, t.j, CAST(SUM(t.w) AS BIGINT) AS n
           FROM (SELECT winner AS i, loser AS j, w FROM wmat
                 UNION ALL SELECT loser, winner, w FROM wmat) t
           WHERE t.i IN (SELECT b FROM items)
             AND t.j IN (SELECT b FROM items)
           GROUP BY 1, 2
         ), p0 AS MATERIALIZED (
           SELECT b, CAST(1000000000 AS HUGEINT) AS p FROM items
         )""")
    for (r <- 1 to 15) {
      sb.append(s""", s$r AS MATERIALIZED (
           SELECT pr.i AS b,
                  SUM((2 * CAST(pr.n AS HUGEINT) * 1000000000000000000
                       + (pi.p + pj.p)) // (2 * (pi.p + pj.p))) AS sv
           FROM prs pr
           JOIN p${r - 1} pi ON pi.b = pr.i
           JOIN p${r - 1} pj ON pj.b = pr.j
           GROUP BY 1
         ), r$r AS MATERIALIZED (
           SELECT it.b,
                  (2 * CAST(it.wn AS HUGEINT) * 1000000000000000000
                   + s.sv) // (2 * s.sv) AS praw
           FROM items it JOIN s$r s ON s.b = it.b
         ), t$r AS MATERIALIZED (SELECT SUM(praw) AS tp FROM r$r
         ), p$r AS MATERIALIZED (
           SELECT b, (2 * k * 1000000000 * praw + tp)
                       // (2 * tp) AS p
           FROM r$r, t$r, kk
         )""")
    }
    sb.append("""
         SELECT it.b AS brand, it.wn AS n_wins, it.ls AS n_losses,
                CAST(p.p AS BIGINT) AS strength_e9,
                CAST(row_number() OVER (ORDER BY p.p DESC, it.b)
                     AS BIGINT) AS bt_rank
         FROM items it JOIN p15 p ON p.b = it.b""")
    sb.toString
  }

  /** q264 oracle: same md5 weights, FILTERed arg_max assignments. */
  private def rendezvousOracleSql: String =
    """WITH shl AS (SELECT unnest(generate_series(0, 8)) AS sh
         ), sc AS (
           SELECT c_custkey AS key, sh,
                  md5(CAST(c_custkey AS VARCHAR) || ':'
                      || CAST(sh AS VARCHAR)) AS h
           FROM customer, shl
         ), asg AS (
           SELECT key,
                  arg_max(sh, h) FILTER (WHERE sh <= 7) AS old_shard,
                  arg_max(sh, h) AS new_shard
           FROM sc GROUP BY 1
         )
         SELECT CAST(old_shard AS BIGINT) AS shard,
                CAST(COUNT(*) AS BIGINT) AS n_keys,
                CAST(SUM(CASE WHEN new_shard <> old_shard THEN 1
                         ELSE 0 END) AS BIGINT) AS n_moved,
                CAST(SUM(CASE WHEN new_shard <> old_shard
                           AND new_shard <> 8 THEN 1
                         ELSE 0 END) AS BIGINT) AS n_moved_elsewhere,
                CAST((2000000 * SUM(CASE WHEN new_shard <> old_shard
                                    THEN 1 ELSE 0 END) + COUNT(*))
                     // (2 * COUNT(*)) AS BIGINT) AS moved_ppm
         FROM asg GROUP BY 1"""

  /** q265 oracle: list-intersect structural similarity on the same
    * pruned graph, recursive-closure clusters, min-core borders, the
    * ≥2-cluster hub test.
    */
  private def scanClusterOracleSql: String =
    """WITH RECURSIVE li AS (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem
         ), pr AS (
           SELECT a.pk AS s1, b.pk AS s2
           FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING COUNT(*) >= 2
         ), e AS (
           SELECT s1 AS src, s2 AS dst FROM pr
           UNION ALL SELECT s2, s1 FROM pr
         ), adj AS (
           SELECT src, list_sort(list(dst)) AS nb FROM e GROUP BY 1
         ), deg AS (
           SELECT src AS node, CAST(len(nb) AS BIGINT) AS deg FROM adj
         ), sup AS (
           SELECT p.s1 AS u, p.s2 AS v,
                  CAST(len(list_intersect(a.nb, b.nb)) AS BIGINT)
                    AS support,
                  da.deg AS du, db.deg AS dv
           FROM pr p
           JOIN adj a ON a.src = p.s1 JOIN adj b ON b.src = p.s2
           JOIN deg da ON da.node = p.s1 JOIN deg db ON db.node = p.s2
         ), eps AS (
           SELECT u, v FROM sup
           WHERE 4 * (support + 2) * (support + 2)
                 >= (du + 1) * (dv + 1)
         ), es AS (SELECT u, v FROM eps UNION ALL SELECT v, u FROM eps
         ), neps AS (
           SELECT u AS node, CAST(COUNT(*) + 1 AS BIGINT) AS n_eps
           FROM es GROUP BY 1
         ), nodes AS (
           SELECT d.node, d.deg,
                  CAST(COALESCE(n.n_eps, 1) AS BIGINT) AS n_eps
           FROM deg d LEFT JOIN neps n ON n.node = d.node
         ), core AS (SELECT node FROM nodes WHERE n_eps >= 4
         ), ce AS (
           SELECT s.u AS a, s.v AS b FROM es s
           WHERE s.u IN (SELECT node FROM core)
             AND s.v IN (SELECT node FROM core)
         ), reach(a, b) AS (
           SELECT a, b FROM ce
           UNION
           SELECT r.a, ce.b FROM reach r JOIN ce ON ce.a = r.b
         ), clab AS (
           SELECT c.node,
                  LEAST(c.node, COALESCE(MIN(r.b), c.node)) AS cluster
           FROM core c LEFT JOIN reach r ON r.a = c.node
           GROUP BY c.node
         ), bord AS (
           SELECT s.u AS node, MIN(l.cluster) AS cluster
           FROM es s JOIN clab l ON l.node = s.v
           WHERE s.u NOT IN (SELECT node FROM core)
           GROUP BY 1
         ), labeled AS (
           SELECT node, cluster FROM clab
           UNION ALL SELECT node, cluster FROM bord
         ), nbc AS (
           SELECT e.src AS node,
                  CAST(COUNT(DISTINCT l.cluster) AS BIGINT) AS ncl
           FROM e JOIN labeled l ON l.node = e.dst GROUP BY 1
         )
         SELECT n.node, n.deg, n.n_eps,
                CASE WHEN cl.node IS NOT NULL THEN 'core'
                     WHEN b.node IS NOT NULL THEN 'border'
                     WHEN COALESCE(nbc.ncl, 0) >= 2 THEN 'hub'
                     ELSE 'outlier' END AS role,
                CAST(CASE WHEN cl.node IS NOT NULL THEN cl.cluster
                          WHEN b.node IS NOT NULL THEN b.cluster
                     END AS BIGINT) AS cluster
         FROM nodes n
         LEFT JOIN clab cl ON cl.node = n.node
         LEFT JOIN bord b ON b.node = n.node
         LEFT JOIN nbc ON nbc.node = n.node"""

  /** q266 oracle: the 8 alternating half-rounds unrolled as
    * MATERIALIZED CTE pairs replaying the identical HUGEINT
    * round-half-up updates (the q263 rule).
    */
  private def alsRank1OracleSql: String = {
    val sb = new StringBuilder(
      """WITH cells AS MATERIALIZED (
           SELECT o.o_custkey AS cust, p.p_brand AS brand,
                  (2 * SUM(CAST(CAST(l.l_extendedprice
                        AS DECIMAL(18,4)) * 10000 AS BIGINT)) + 100)
                    // (2 * 100) AS r
           FROM orders o
           JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY 1, 2
         ), v0 AS MATERIALIZED (
           SELECT DISTINCT brand, CAST(1000000 AS HUGEINT) AS v
           FROM cells
         )""")
    for (r <- 1 to 8) {
      sb.append(s""", u$r AS MATERIALIZED (
           SELECT c.cust,
                  LEAST((2 * 1000000000000 *
                         SUM(CAST(c.r AS HUGEINT) * v.v)
                         + SUM(v.v * v.v))
                        // (2 * SUM(v.v * v.v)),
                        1000000000000000) AS u
           FROM cells c JOIN v${r - 1} v ON v.brand = c.brand
           GROUP BY 1
         ), v$r AS MATERIALIZED (
           SELECT c.brand,
                  LEAST((2 * 1000000000000 *
                         SUM(CAST(c.r AS HUGEINT) * u.u)
                         + SUM(u.u * u.u))
                        // (2 * SUM(u.u * u.u)),
                        1000000000000000) AS v
           FROM cells c JOIN u$r u ON u.cust = c.cust
           GROUP BY 1
         )""")
    }
    sb.append("""
         SELECT v.brand, n.n_raters, CAST(v.v AS BIGINT) AS v_e6,
                CAST(row_number() OVER (ORDER BY v.v DESC, v.brand)
                     AS BIGINT) AS brand_rank
         FROM v8 v
         JOIN (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_raters
               FROM cells GROUP BY 1) n USING (brand)""")
    sb.toString
  }

  /** q267 oracle: same integer day grid, PAA windows, sorted-list
    * quartile breakpoints and ordered string_agg.
    */
  private def saxOracleSql: String =
    """WITH ev AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day
           FROM events
         ), span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev
         ), daily AS (
           SELECT event_type, day - d0 AS idx,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM ev, span GROUP BY 1, 2
         ), grid AS (
           SELECT t.event_type, g.idx, s.d1 - s.d0 + 1 AS n_days
           FROM (SELECT DISTINCT event_type FROM ev) t, span s,
                LATERAL (SELECT unnest(generate_series(0, s.d1 - s.d0))
                         AS idx) g
         ), paa AS (
           SELECT g.event_type, g.n_days,
                  g.idx * 16 // g.n_days AS w,
                  CAST((2 * 100 * SUM(COALESCE(d.cnt, 0)) + COUNT(*))
                       // (2 * COUNT(*)) AS BIGINT) AS paa_e2
           FROM grid g
           LEFT JOIN daily d ON d.event_type = g.event_type
                            AND d.idx = g.idx
           GROUP BY 1, 2, 3
         ), brk AS (
           SELECT event_type, lst[4] AS q1, lst[8] AS q2, lst[12] AS q3
           FROM (SELECT event_type, list_sort(list(paa_e2)) AS lst
                 FROM paa GROUP BY 1)
         )
         SELECT p.event_type, CAST(MAX(p.n_days) AS BIGINT) AS n_days,
                string_agg(CASE WHEN p.paa_e2 < b.q1 THEN 'a'
                                WHEN p.paa_e2 < b.q2 THEN 'b'
                                WHEN p.paa_e2 < b.q3 THEN 'c'
                                ELSE 'd' END, '' ORDER BY p.w) AS sax
         FROM paa p JOIN brk b USING (event_type)
         GROUP BY 1"""

  /** q268 oracle: same three cell aggregates, same ppm/e3-quantized
    * signed ln terms, same entropies and NMI.
    */
  private def mutualInfoOracleSql: String =
    s"""WITH cells AS (
           SELECT 'returnflag_linestatus' AS pair, l_returnflag AS a,
                  l_linestatus AS b
           FROM lineitem
           UNION ALL
           SELECT 'priority_status', o_orderpriority, o_orderstatus
           FROM orders
           UNION ALL
           SELECT 'segment_nation', c_mktsegment, n_name
           FROM customer JOIN nation ON c_nationkey = n_nationkey
         ), cab AS (
           SELECT pair, a, b, CAST(COUNT(*) AS BIGINT) AS n_ab
           FROM cells GROUP BY 1, 2, 3
         ), tot AS (
           SELECT pair, CAST(SUM(n_ab) AS BIGINT) AS n
           FROM cab GROUP BY 1
         ), pma AS (
           SELECT pair, a, CAST(SUM(n_ab) AS BIGINT) AS n_a
           FROM cab GROUP BY 1, 2
         ), pmb AS (
           SELECT pair, b, CAST(SUM(n_ab) AS BIGINT) AS n_b
           FROM cab GROUP BY 1, 2
         ), pp AS (
           SELECT c.pair, t.n,
                  GREATEST((2000000 * c.n_ab + t.n) // (2 * t.n), 1)
                    AS pab,
                  GREATEST((2000000 * a.n_a + t.n) // (2 * t.n), 1)
                    AS pav,
                  GREATEST((2000000 * b.n_b + t.n) // (2 * t.n), 1)
                    AS pbv
           FROM cab c JOIN tot t USING (pair)
           JOIN pma a ON a.pair = c.pair AND a.a = c.a
           JOIN pmb b ON b.pair = c.pair AND b.b = c.b
         ), lnr AS (
           SELECT pair, n, pab,
                  GREATEST(pab * 1000,
                    GREATEST((2 * pav * pbv + 1000) // 2000, 1)) AS _p,
                  LEAST(pab * 1000,
                    GREATEST((2 * pav * pbv + 1000) // 2000, 1)) AS _q,
                  CASE WHEN pab * 1000
                         >= GREATEST((2 * pav * pbv + 1000) // 2000, 1)
                       THEN 1 ELSE -1 END AS _sgn,
                  ${lnSelect("_l9")}
           FROM pp
         ), mis AS (
           SELECT pair, MAX(n) AS n_rows,
                  SUM(pab * _sgn * _l9) AS _mi
           FROM lnr GROUP BY 1
         ), mi AS (
           SELECT pair, CAST(n_rows AS BIGINT) AS n_rows,
                  CASE WHEN _mi >= 0
                    THEN CAST((2 * _mi + 1000000) // (2 * 1000000)
                              AS BIGINT)
                    ELSE -CAST((2 * (-_mi) + 1000000) // (2 * 1000000)
                               AS BIGINT) END AS mi_e9
           FROM mis
         ), ha1 AS (
           SELECT p.pair,
                  GREATEST((2000000 * p.n_a + t.n) // (2 * t.n), 1)
                    AS _ppm
           FROM pma p JOIN tot t USING (pair)
         ), ha2 AS (
           SELECT pair, _ppm, 1000000 AS _p, _ppm AS _q,
                  ${lnSelect("_nl9")}
           FROM ha1
         ), ha AS (
           SELECT pair, CAST((2 * SUM(_ppm * _nl9) + 1000000)
                        // (2 * 1000000) AS BIGINT) AS h_a_e9
           FROM ha2 GROUP BY 1
         ), hb1 AS (
           SELECT p.pair,
                  GREATEST((2000000 * p.n_b + t.n) // (2 * t.n), 1)
                    AS _ppm
           FROM pmb p JOIN tot t USING (pair)
         ), hb2 AS (
           SELECT pair, _ppm, 1000000 AS _p, _ppm AS _q,
                  ${lnSelect("_nl9")}
           FROM hb1
         ), hb AS (
           SELECT pair, CAST((2 * SUM(_ppm * _nl9) + 1000000)
                        // (2 * 1000000) AS BIGINT) AS h_b_e9
           FROM hb2 GROUP BY 1
         )
         SELECT m.pair, m.n_rows, m.mi_e9, ha.h_a_e9, hb.h_b_e9,
                CASE WHEN LEAST(ha.h_a_e9, hb.h_b_e9) > 0 THEN
                  CAST((2 * 1000000 * GREATEST(m.mi_e9, 0)
                        + LEAST(ha.h_a_e9, hb.h_b_e9))
                       // (2 * LEAST(ha.h_a_e9, hb.h_b_e9)) AS BIGINT)
                END AS nmi_ppm
         FROM mi m JOIN ha USING (pair) JOIN hb USING (pair)"""

  /** q269 oracle: per-user sums, md5 arms, 200 md5(u#b)
    * pseudo-permutations, HUGEINT cross-multiplied extremeness.
    */
  private def permTestOracleSql: String =
    """WITH pu AS (
           SELECT user_id,
                  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                           ELSE 0 END) AS BIGINT) AS y
           FROM events WHERE user_id IS NOT NULL GROUP BY 1
         ), obs AS (
           SELECT CAST(SUM(CASE WHEN arm THEN y ELSE 0 END) AS HUGEINT)
                    AS sa,
                  CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS HUGEINT)
                    AS na,
                  CAST(SUM(CASE WHEN NOT arm THEN y ELSE 0 END)
                       AS HUGEINT) AS sb,
                  CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END)
                       AS HUGEINT) AS nb
           FROM (SELECT y, substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
                          < '8' AS arm
                 FROM pu)
         ), ob AS (
           SELECT sa * nb - sb * na AS onum, na * nb AS oden,
                  CAST(na + nb AS BIGINT) AS n_users
           FROM obs
         ), bs AS (SELECT unnest(generate_series(1, 200)) AS b
         ), pm AS (
           SELECT b,
                  CAST(SUM(CASE WHEN arm THEN y ELSE 0 END) AS HUGEINT)
                    AS sa,
                  CAST(SUM(CASE WHEN arm THEN 1 ELSE 0 END) AS HUGEINT)
                    AS na,
                  CAST(SUM(CASE WHEN NOT arm THEN y ELSE 0 END)
                       AS HUGEINT) AS sb,
                  CAST(SUM(CASE WHEN NOT arm THEN 1 ELSE 0 END)
                       AS HUGEINT) AS nb
           FROM (SELECT pu.y, bs.b,
                        substr(md5(CAST(pu.user_id AS VARCHAR) || '#'
                          || CAST(bs.b AS VARCHAR)), 1, 1) < '8' AS arm
                 FROM pu, bs)
           GROUP BY 1
         ), pb2 AS (
           SELECT b, sa * nb - sb * na AS num, na * nb AS den FROM pm
         )
         SELECT o.n_users, CAST(COUNT(*) AS BIGINT) AS n_perms,
                CAST(SUM(CASE WHEN ABS(p.num) * o.oden
                                >= ABS(o.onum) * p.den
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
                CASE WHEN o.onum >= 0
                  THEN CAST((2 * 1000000 * o.onum + o.oden)
                            // (2 * o.oden) AS BIGINT)
                  ELSE -CAST((2 * 1000000 * (-o.onum) + o.oden)
                             // (2 * o.oden) AS BIGINT)
                END AS obs_diff_e6,
                CAST((2 * 1000000 *
                      (1 + SUM(CASE WHEN ABS(p.num) * o.oden
                                      >= ABS(o.onum) * p.den
                               THEN 1 ELSE 0 END))
                      + (COUNT(*) + 1))
                     // (2 * (COUNT(*) + 1)) AS BIGINT) AS p_ppm
         FROM pb2 p, ob o
         GROUP BY o.n_users, o.onum, o.oden"""

  /** q270 oracle: same md5-hex positional decode, same two pruned
    * FixedLn chains for ⌊−ln U⌋, same clamped release.
    */
  private def dpReleaseOracleSql: String = {
    def hexDecode(c: String): String =
      (1 to 6).map(i =>
        s"(instr('0123456789abcdef', substr($c, $i, 1)) - 1) " +
          s"* ${1L << (4 * (6 - i))}")
        .mkString("CAST((", " + ", ") % 999999 + 1 AS BIGINT)")
    s"""WITH counts AS (
           SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
                  c_mktsegment AS mktsegment,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM customer GROUP BY 1, 2
         ), us AS (
           SELECT nationkey, mktsegment, n,
                  ${hexDecode("md5(CAST(nationkey AS VARCHAR) || ':' " +
                    "|| mktsegment || ':1')")} AS u1,
                  ${hexDecode("md5(CAST(nationkey AS VARCHAR) || ':' " +
                    "|| mktsegment || ':2')")} AS u2
           FROM counts
         ), l1c AS (
           SELECT nationkey, mktsegment, n, u2,
                  1000000 AS _p, u1 AS _q,
                  ${lnSelect("_l1")}
           FROM us
         ), l1p AS (
           SELECT nationkey, mktsegment, n, u2,
                  _l1 // 1000000000 AS g1
           FROM l1c
         ), l2c AS (
           SELECT nationkey, mktsegment, n, g1,
                  1000000 AS _p, u2 AS _q,
                  ${lnSelect("_l2")}
           FROM l1p
         )
         SELECT nationkey, mktsegment,
                CAST(g1 - (_l2 // 1000000000) AS BIGINT) AS noise,
                CAST(GREATEST(n + g1 - (_l2 // 1000000000), 0)
                     AS BIGINT) AS noisy_n
         FROM l2c"""
  }

  /** q271 oracle: exact HUGEINT moments, the identical double IEEE
    * tree for the three r's and the partial, ROUND 4 last.
    */
  private def partialCorrOracleSql: String =
    """WITH m AS (
           SELECT l_returnflag,
                  CAST(COUNT(*) AS HUGEINT) AS n,
                  CAST(SUM(x) AS HUGEINT) AS sx,
                  CAST(SUM(y) AS HUGEINT) AS sy,
                  CAST(SUM(z) AS HUGEINT) AS sz,
                  SUM(CAST(x AS HUGEINT) * y) AS sxy,
                  SUM(CAST(x AS HUGEINT) * z) AS sxz,
                  SUM(CAST(y AS HUGEINT) * z) AS syz,
                  SUM(CAST(x AS HUGEINT) * x) AS sxx,
                  SUM(CAST(y AS HUGEINT) * y) AS syy,
                  SUM(CAST(z AS HUGEINT) * z) AS szz
           FROM (SELECT l_returnflag,
                        CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                             * 10000 AS BIGINT) AS x,
                        CAST(CAST(l_quantity AS DECIMAL(18,4))
                             * 10000 AS BIGINT) AS y,
                        CAST(CAST(l_discount AS DECIMAL(18,4))
                             * 10000 AS BIGINT) AS z
                 FROM lineitem)
           GROUP BY 1
         ), r AS (
           SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
                  CAST(n * sxy - sx * sy AS DOUBLE)
                    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                           * CAST(n * syy - sy * sy AS DOUBLE)) AS rxy,
                  CAST(n * sxz - sx * sz AS DOUBLE)
                    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                           * CAST(n * szz - sz * sz AS DOUBLE)) AS rxz,
                  CAST(n * syz - sy * sz AS DOUBLE)
                    / sqrt(CAST(n * syy - sy * sy AS DOUBLE)
                           * CAST(n * szz - sz * sz AS DOUBLE)) AS ryz
           FROM m
         )
         SELECT l_returnflag, n_rows,
                ROUND(rxy, 4) AS r_xy, ROUND(rxz, 4) AS r_xz,
                ROUND(ryz, 4) AS r_yz,
                ROUND(CASE WHEN ABS(rxz) < 1.0 AND ABS(ryz) < 1.0 THEN
                        (rxy - rxz * ryz)
                        / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
                      END, 4) AS r_xy_given_z
         FROM r"""

  /** q272 oracle: same rhu e4 unit price, two pruned ln chains (the
    * q258 rule), HUGEINT moments, signed rhu outputs.
    */
  private def elasticityOracleSql: String =
    s"""WITH base AS (
           SELECT p.p_brand,
                  CAST(CAST(l.l_quantity AS DECIMAL(18,4)) AS BIGINT)
                    AS qty,
                  (2 * CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * 10000 AS BIGINT)
                   + CAST(CAST(l.l_quantity AS DECIMAL(18,4))
                          AS BIGINT))
                    // (2 * CAST(CAST(l.l_quantity AS DECIMAL(18,4))
                            AS BIGINT)) AS unit_e4
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         ), fy0 AS (
           SELECT p_brand, unit_e4, qty AS _p, 1 AS _q,
                  ${lnSelect("y")}
           FROM base WHERE qty >= 1 AND unit_e4 >= 1
         ), fy AS (SELECT p_brand, unit_e4, y FROM fy0
         ), fx0 AS (
           SELECT p_brand, y, unit_e4 AS _p, 1 AS _q,
                  ${lnSelect("x")}
           FROM fy
         ), fx AS (SELECT p_brand, x, y FROM fx0
         ), mm AS (
           SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_obs,
                  SUM(CAST(x AS HUGEINT)) AS sx,
                  SUM(CAST(y AS HUGEINT)) AS sy,
                  SUM(CAST(x AS HUGEINT) * y) AS sxy,
                  SUM(CAST(x AS HUGEINT) * x) AS sxx
           FROM fx GROUP BY 1
         ), ff AS (
           SELECT p_brand, n_obs, sx, sy,
                  n_obs * sxy - sx * sy AS num,
                  n_obs * sxx - sx * sx AS den
           FROM mm
         ), sl AS (
           SELECT p_brand, n_obs, sx, sy,
                  CASE WHEN num >= 0
                    THEN CAST((2 * 1000000 * num + den)
                              // (2 * den) AS BIGINT)
                    ELSE -CAST((2 * 1000000 * (-num) + den)
                               // (2 * den) AS BIGINT)
                  END AS elasticity_e6
           FROM ff WHERE den > 0
         )
         SELECT p_brand, n_obs, elasticity_e6,
                CASE WHEN 1000000 * sy - elasticity_e6 * sx >= 0
                  THEN CAST((2 * (1000000 * sy - elasticity_e6 * sx)
                             + 1000000 * n_obs)
                            // (2 * 1000000 * n_obs) AS BIGINT)
                  ELSE -CAST((2 * (-(1000000 * sy
                                     - elasticity_e6 * sx))
                              + 1000000 * n_obs)
                             // (2 * 1000000 * n_obs) AS BIGINT)
                END AS intercept_e9
         FROM sl"""

  /** q273 oracle: same md5-parity signs, exact Z sums, sorted-16
    * round-half-up median.
    */
  private def amsSketchOracleSql: String =
    """WITH freq AS (
           SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS f
           FROM lineitem GROUP BY 1
         ), ex AS (
           SELECT CAST(SUM(f) AS BIGINT) AS n_rows,
                  CAST(COUNT(*) AS BIGINT) AS n_keys,
                  CAST(SUM(CAST(f AS HUGEINT) * f) AS BIGINT)
                    AS f2_exact
           FROM freq
         ), js AS (SELECT unnest(generate_series(1, 16)) AS j
         ), z AS (
           SELECT j,
                  CAST(SUM(CASE WHEN substr(md5(CAST(j AS VARCHAR)
                             || ':' || CAST(l_partkey AS VARCHAR)),
                             1, 1) < '8'
                           THEN f ELSE -f END) AS BIGINT) AS zv
           FROM freq, js GROUP BY 1
         ), zz AS (
           SELECT list_sort(list(zv * zv)) AS srt FROM z
         ), est AS (
           SELECT CAST((2 * (srt[8] + srt[9]) + 2) // (2 * 2)
                       AS BIGINT) AS f2_est
           FROM zz
         )
         SELECT e.n_rows, e.n_keys, e.f2_exact, s.f2_est,
                CAST((2 * 1000000 * ABS(s.f2_est - e.f2_exact)
                      + e.f2_exact)
                     // (2 * e.f2_exact) AS BIGINT) AS err_ppm
         FROM ex e, est s"""

  /** q274 oracle: the q267 day grid, exact HUGEINT moment Fano. */
  private def fanoFactorOracleSql: String =
    """WITH ev AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day
           FROM events
         ), span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev
         ), daily AS (
           SELECT event_type, day - d0 AS idx,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM ev, span GROUP BY 1, 2
         ), grid AS (
           SELECT t.event_type, g.idx
           FROM (SELECT DISTINCT event_type FROM ev) t, span s,
                LATERAL (SELECT unnest(generate_series(0, s.d1 - s.d0))
                         AS idx) g
         ), agg AS (
           SELECT g.event_type,
                  CAST(COUNT(*) AS BIGINT) AS n_days,
                  CAST(SUM(COALESCE(d.cnt, 0)) AS BIGINT) AS sx,
                  SUM(CAST(COALESCE(d.cnt, 0) AS HUGEINT)
                      * COALESCE(d.cnt, 0)) AS sxx
           FROM grid g
           LEFT JOIN daily d ON d.event_type = g.event_type
                            AND d.idx = g.idx
           GROUP BY 1
         ), f AS (
           SELECT event_type, n_days,
                  CAST((2 * 100 * sx + n_days) // (2 * n_days)
                       AS BIGINT) AS mean_e2,
                  CAST((2 * 1000000 * (n_days * sxx - sx * sx)
                        + n_days * sx)
                       // (2 * n_days * sx) AS BIGINT) AS fano_e6
           FROM agg WHERE sx > 0
         )
         SELECT event_type, n_days, mean_e2, fano_e6,
                CASE WHEN fano_e6 > 1200000 THEN 'overdispersed'
                     WHEN fano_e6 >= 800000 THEN 'poisson-like'
                     ELSE 'underdispersed' END AS regime
         FROM f"""

  /** q275 oracle: same ppm grid and edge lattice; the 24 Kruskal
    * picks unrolled as MATERIALIZED (pick, relabel, emit) CTE
    * triples — the q263 iterative-oracle rule.
    */
  private def singleLinkageOracleSql: String = {
    val sb = new StringBuilder(
      """WITH cells AS MATERIALIZED (
           SELECT p.p_brand, o.o_orderpriority AS prio,
                  CAST(SUM(CAST(CAST(l.l_extendedprice
                        AS DECIMAL(18,4)) * 10000 AS BIGINT))
                       AS HUGEINT) AS sp
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY 1, 2
         ), tot AS (
           SELECT p_brand, SUM(sp) AS tt FROM cells GROUP BY 1
         ), grid AS MATERIALIZED (
           SELECT b.p_brand, pr.prio,
                  CAST((2000000 * COALESCE(c.sp, 0) + t.tt)
                       // (2 * t.tt) AS BIGINT) AS ppm
           FROM (SELECT DISTINCT p_brand FROM cells) b
           CROSS JOIN (SELECT DISTINCT prio FROM cells) pr
           LEFT JOIN cells c ON c.p_brand = b.p_brand
                            AND c.prio = pr.prio
           JOIN tot t ON t.p_brand = b.p_brand
         ), edges AS MATERIALIZED (
           SELECT ga.p_brand AS a, gb.p_brand AS b,
                  CAST(SUM((ga.ppm - gb.ppm) * (ga.ppm - gb.ppm))
                       AS BIGINT) AS d2
           FROM grid ga JOIN grid gb
             ON ga.prio = gb.prio AND ga.p_brand < gb.p_brand
           GROUP BY 1, 2
         ), l0 AS MATERIALIZED (
           SELECT DISTINCT p_brand AS brand, p_brand AS label
           FROM cells
         )""")
    for (k <- 1 to 24) {
      sb.append(s""", pk$k AS MATERIALIZED (
           SELECT la.label AS lla, lb.label AS llb, e.d2
           FROM edges e
           JOIN l${k - 1} la ON la.brand = e.a
           JOIN l${k - 1} lb ON lb.brand = e.b
           WHERE la.label <> lb.label
           ORDER BY e.d2, e.a, e.b LIMIT 1
         ), l$k AS MATERIALIZED (
           SELECT brand,
                  CASE WHEN label = (SELECT GREATEST(lla, llb)
                                     FROM pk$k)
                       THEN (SELECT LEAST(lla, llb) FROM pk$k)
                       ELSE label END AS label
           FROM l${k - 1}
         ), o$k AS MATERIALIZED (
           SELECT CAST($k AS BIGINT) AS step,
                  p.d2 AS d2_units,
                  LEAST(p.lla, p.llb) AS left_brand,
                  GREATEST(p.lla, p.llb) AS right_brand,
                  (SELECT CAST(COUNT(*) AS BIGINT) FROM l$k
                   WHERE label = LEAST(p.lla, p.llb)) AS merged_size
           FROM pk$k p
         )""")
    }
    sb.append("\n         ")
    sb.append((1 to 24).map(k => s"SELECT * FROM o$k")
      .mkString("", "\n         UNION ALL ", ""))
    sb.toString
  }

  /** q276 oracle: same gap-filled grid, HUGEINT window moments,
    * signed rhu slope.
    */
  private def rollingOlsOracleSql: String =
    """WITH ev AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
                  CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
                    AS v
           FROM events WHERE event_type = 'purchase'
         ), span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev
         ), daily AS (
           SELECT day - d0 AS idx, CAST(SUM(v) AS BIGINT) AS rev
           FROM ev, span GROUP BY 1
         ), grid AS (
           SELECT g.idx, COALESCE(d.rev, 0) AS rev_e4
           FROM (SELECT unnest(generate_series(0, d1 - d0)) AS idx
                 FROM span) g
           LEFT JOIN daily d ON d.idx = g.idx
         ), wsum AS (
           SELECT idx, rev_e4,
                  COUNT(*) OVER w AS n, SUM(idx) OVER w AS sx,
                  SUM(rev_e4) OVER w AS sy,
                  SUM(idx * rev_e4) OVER w AS sxy,
                  SUM(idx * idx) OVER w AS sxx
           FROM grid
           WINDOW w AS (ORDER BY idx
             ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
         ), f AS (
           SELECT idx AS day_idx, rev_e4,
                  CAST(n AS HUGEINT) * sxy
                    - CAST(sx AS HUGEINT) * sy AS num,
                  CAST(n AS HUGEINT) * sxx
                    - CAST(sx AS HUGEINT) * sx AS den
           FROM wsum WHERE n = 30
         )
         SELECT day_idx, CAST(rev_e4 AS BIGINT) AS rev_e4,
                CASE WHEN num >= 0
                  THEN CAST((2 * 10000 * num + den) // (2 * den)
                            AS BIGINT)
                  ELSE -CAST((2 * 10000 * (-num) + den) // (2 * den)
                             AS BIGINT)
                END AS slope30_e4
         FROM f"""

  /** q277 oracle: integer epoch weeks, distinct cohort activity,
    * FixedLn retention logs, per-cohort HUGEINT OLS, half-life from
    * the e9 ln 2 constant.
    */
  private def retentionHalflifeOracleSql: String =
    s"""WITH wk AS (
           SELECT user_id, epoch_us(ts) // 604800000000 AS week
           FROM events WHERE user_id IS NOT NULL
         ), coh AS (
           SELECT user_id, MIN(week) AS cw FROM wk GROUP BY 1
         ), act AS (
           SELECT DISTINCT c.cw AS cohort_week, w.week - c.cw AS off,
                  w.user_id
           FROM wk w JOIN coh c ON c.user_id = w.user_id
         ), sz AS (
           SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
           FROM act WHERE off = 0 GROUP BY 1
         ), ret AS (
           SELECT a.cohort_week, s.n_users, a.off,
                  CAST(COUNT(*) AS BIGINT) AS n_active
           FROM act a JOIN sz s USING (cohort_week)
           WHERE a.off BETWEEN 1 AND 8 GROUP BY 1, 2, 3
         ), pp AS (
           SELECT cohort_week, n_users, off,
                  GREATEST((2000000 * n_active + n_users)
                           // (2 * n_users), 1) AS _ppm
           FROM ret
         ), lnr AS (
           SELECT cohort_week, n_users, off,
                  GREATEST(_ppm, 1000000) AS _p,
                  LEAST(_ppm, 1000000) AS _q,
                  CASE WHEN _ppm >= 1000000 THEN 1 ELSE -1 END AS _sgn,
                  ${lnSelect("_l9")}
           FROM pp
         ), ys AS (
           SELECT cohort_week, n_users, off, _sgn * _l9 AS y FROM lnr
         ), mm AS (
           SELECT cohort_week, MAX(n_users) AS n_users,
                  CAST(COUNT(*) AS BIGINT) AS n_points,
                  CAST(SUM(off) AS HUGEINT) AS sx,
                  CAST(SUM(y) AS HUGEINT) AS sy,
                  SUM(CAST(off AS HUGEINT) * y) AS sxy,
                  SUM(CAST(off AS HUGEINT) * off) AS sxx
           FROM ys GROUP BY 1 HAVING COUNT(*) >= 3
         ), ff AS (
           SELECT cohort_week, n_users, n_points,
                  n_points * sxy - sx * sy AS num,
                  n_points * sxx - sx * sx AS den
           FROM mm
         ), sl AS (
           SELECT cohort_week, CAST(n_users AS BIGINT) AS n_users,
                  n_points,
                  CASE WHEN num >= 0
                    THEN CAST((2 * num + den) // (2 * den) AS BIGINT)
                    ELSE -CAST((2 * (-num) + den) // (2 * den)
                               AS BIGINT)
                  END AS slope_e9
           FROM ff WHERE den > 0
         )
         SELECT cohort_week, n_users, n_points, slope_e9,
                CASE WHEN slope_e9 < 0 THEN
                  CAST((2 * 100 * ${graft.functions.FixedLn.Ln2E9}
                        + (-slope_e9))
                       // (2 * (-slope_e9)) AS BIGINT)
                END AS halflife_weeks_e2
         FROM sl"""

  /** q278 oracle: same distinct users, salted md5 arms, two-cell χ²
    * identity and literal critical values.
    */
  private def srmCheckOracleSql: String =
    """WITH users AS (
           SELECT DISTINCT user_id FROM events
           WHERE user_id IS NOT NULL
         ), arms AS (
           SELECT s.salt AS experiment,
                  CAST(SUM(CASE WHEN substr(md5(
                         CAST(u.user_id AS VARCHAR) || ':' || s.salt),
                         1, 1) < '8' THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_a,
                  CAST(SUM(CASE WHEN substr(md5(
                         CAST(u.user_id AS VARCHAR) || ':' || s.salt),
                         1, 1) < '8' THEN 0 ELSE 1 END) AS BIGINT)
                    AS n_b
           FROM users u,
                (SELECT unnest(['exp1', 'exp2', 'exp3']) AS salt) s
           GROUP BY 1
         )
         SELECT experiment, n_a, n_b,
                CAST((2 * 1000000 * (n_a - n_b) * (n_a - n_b)
                      + (n_a + n_b))
                     // (2 * (n_a + n_b)) AS BIGINT) AS chi2_e6,
                CAST((2 * 1000000 * (n_a - n_b) * (n_a - n_b)
                      + (n_a + n_b))
                     // (2 * (n_a + n_b)) AS BIGINT) > 3841459
                  AS suspicious_05,
                CAST((2 * 1000000 * (n_a - n_b) * (n_a - n_b)
                      + (n_a + n_b))
                     // (2 * (n_a + n_b)) AS BIGINT) > 10827566
                  AS srm_alert_001
         FROM arms"""

  /** q279 oracle: the q267 day lattice, e2 dow/overall means, HUGEINT
    * residual SSEs, row_number peak/trough ties.
    */
  private def seasonalityStrengthOracleSql: String =
    """WITH ev AS (
           SELECT event_type, epoch_us(ts) // 86400000000 AS day
           FROM events
         ), span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev
         ), daily AS (
           SELECT event_type, day - d0 AS idx,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM ev, span GROUP BY 1, 2
         ), grid0 AS (
           SELECT t.event_type, g.idx
           FROM (SELECT DISTINCT event_type FROM ev) t, span s,
                LATERAL (SELECT unnest(generate_series(0, s.d1 - s.d0))
                         AS idx) g
         ), grid AS (
           SELECT g.event_type, g.idx, COALESCE(d.cnt, 0) AS cnt,
                  g.idx % 7 AS dow
           FROM grid0 g
           LEFT JOIN daily d ON d.event_type = g.event_type
                            AND d.idx = g.idx
         ), dm AS (
           SELECT event_type, dow,
                  CAST((2 * 100 * SUM(cnt) + COUNT(*))
                       // (2 * COUNT(*)) AS BIGINT) AS dm_e2
           FROM grid GROUP BY 1, 2
         ), am AS (
           SELECT event_type,
                  CAST((2 * 100 * SUM(cnt) + COUNT(*))
                       // (2 * COUNT(*)) AS BIGINT) AS am_e2
           FROM grid GROUP BY 1
         ), sse AS (
           SELECT g.event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                  MAX(a.am_e2) AS mean_e2,
                  SUM(CAST(100 * g.cnt - d.dm_e2 AS HUGEINT)
                      * (100 * g.cnt - d.dm_e2)) AS sr,
                  SUM(CAST(100 * g.cnt - a.am_e2 AS HUGEINT)
                      * (100 * g.cnt - a.am_e2)) AS st
           FROM grid g JOIN dm d USING (event_type, dow)
           JOIN am a USING (event_type)
           GROUP BY 1
         ), pk AS (
           SELECT event_type, CAST(dow AS BIGINT) AS peak_dow
           FROM (SELECT event_type, dow,
                        row_number() OVER (PARTITION BY event_type
                          ORDER BY dm_e2 DESC, dow) AS rn
                 FROM dm) WHERE rn = 1
         ), tr AS (
           SELECT event_type, CAST(dow AS BIGINT) AS trough_dow
           FROM (SELECT event_type, dow,
                        row_number() OVER (PARTITION BY event_type
                          ORDER BY dm_e2, dow) AS rn
                 FROM dm) WHERE rn = 1
         )
         SELECT s.event_type, s.n_days, s.mean_e2,
                CASE WHEN s.st > 0 THEN
                  GREATEST(1000000 - CAST((2 * 1000000 * s.sr + s.st)
                           // (2 * s.st) AS BIGINT), 0)
                END AS strength_ppm,
                pk.peak_dow, tr.trough_dow
         FROM sse s JOIN pk USING (event_type)
         JOIN tr USING (event_type)"""

  /** q280 oracle: raw-array subscript positions (filtered AFTER — so
    * positions agree with Spark's posexplode), same segment cuts and
    * rhu ppm chain.
    */
  private def segmentalTtrOracleSql: String =
    """WITH tok AS (
           SELECT doc_id, tk[i] AS term, i - 1 AS p
           FROM (SELECT doc_id, tk,
                        unnest(generate_series(1, len(tk))) AS i
                 FROM (SELECT doc_id,
                              string_split_regex(lower(trim(text)),
                                '\s+') AS tk
                       FROM documents WHERE text IS NOT NULL))
           WHERE len(tk[i]) > 0
         ), ds AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                  CAST(COUNT(DISTINCT term) AS BIGINT) AS n_types
           FROM tok GROUP BY 1
         ), st AS (
           SELECT doc_id, p // 50 AS seg,
                  CAST(COUNT(*) AS BIGINT) AS _n,
                  CAST(COUNT(DISTINCT term) AS BIGINT) AS _t
           FROM tok GROUP BY 1, 2
         ), ms AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
                  CAST((2 * SUM((2000000 * _t + 50) // (2 * 50))
                        + COUNT(*))
                       // (2 * COUNT(*)) AS BIGINT) AS msttr_ppm
           FROM st WHERE _n = 50 GROUP BY 1
         )
         SELECT d.doc_id, d.n_tokens, d.n_types,
                CAST((2000000 * d.n_types + d.n_tokens)
                     // (2 * d.n_tokens) AS BIGINT) AS ttr_ppm,
                CAST(COALESCE(m.n_segments, 0) AS BIGINT) AS n_segments,
                m.msttr_ppm
         FROM ds d LEFT JOIN ms m USING (doc_id)"""

  /** q281 oracle: same midpoints, md5 arms, HUGEINT cell sums and
    * signed rhu rational DiD/placebo.
    */
  private def diffInDiffOracleSql: String = {
    def did(a: String, b: String, c: String, e: String) =
      s"""CASE WHEN nt = 0 OR nc = 0 THEN NULL
             WHEN (($a - $b) * nc - ($c - $e) * nt) >= 0
             THEN CAST((2 * (($a - $b) * nc - ($c - $e) * nt)
                        + nt * nc)
                       // (2 * nt * nc) AS BIGINT)
             ELSE -CAST((2 * (-(($a - $b) * nc - ($c - $e) * nt))
                         + nt * nc)
                        // (2 * nt * nc) AS BIGINT) END"""
    s"""WITH ev AS (
           SELECT user_id, epoch_us(ts) AS us,
                  CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
                    AS v
           FROM events
           WHERE user_id IS NOT NULL AND event_type = 'purchase'
         ), mids AS (
           SELECT (MIN(us) + MAX(us)) // 2 AS mid,
                  (3 * MIN(us) + MAX(us)) // 4 AS pmid
           FROM ev
         ), pu AS (
           SELECT user_id,
                  CAST(SUM(CASE WHEN us < mid THEN v ELSE 0 END)
                       AS BIGINT) AS pre,
                  CAST(SUM(CASE WHEN us >= mid THEN v ELSE 0 END)
                       AS BIGINT) AS post,
                  CAST(SUM(CASE WHEN us < pmid THEN v ELSE 0 END)
                       AS BIGINT) AS pre1,
                  CAST(SUM(CASE WHEN us >= pmid AND us < mid THEN v
                           ELSE 0 END) AS BIGINT) AS pre2,
                  substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
                    AS treated
           FROM ev, mids GROUP BY user_id, mid, pmid
         ), cells AS (
           SELECT
             CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS HUGEINT)
               AS nt,
             CAST(SUM(CASE WHEN treated THEN 0 ELSE 1 END) AS HUGEINT)
               AS nc,
             CAST(SUM(CASE WHEN treated THEN pre ELSE 0 END)
                  AS HUGEINT) AS tpre,
             CAST(SUM(CASE WHEN treated THEN post ELSE 0 END)
                  AS HUGEINT) AS tpost,
             CAST(SUM(CASE WHEN treated THEN 0 ELSE pre END)
                  AS HUGEINT) AS cpre,
             CAST(SUM(CASE WHEN treated THEN 0 ELSE post END)
                  AS HUGEINT) AS cpost,
             CAST(SUM(CASE WHEN treated THEN pre1 ELSE 0 END)
                  AS HUGEINT) AS tp1,
             CAST(SUM(CASE WHEN treated THEN pre2 ELSE 0 END)
                  AS HUGEINT) AS tp2,
             CAST(SUM(CASE WHEN treated THEN 0 ELSE pre1 END)
                  AS HUGEINT) AS cp1,
             CAST(SUM(CASE WHEN treated THEN 0 ELSE pre2 END)
                  AS HUGEINT) AS cp2
           FROM pu
         )
         SELECT CAST(nt AS BIGINT) AS n_treated,
                CAST(nc AS BIGINT) AS n_control,
                CASE WHEN nt > 0 THEN
                  CAST((2 * tpre + nt) // (2 * nt) AS BIGINT) END
                  AS t_pre_e4,
                CASE WHEN nt > 0 THEN
                  CAST((2 * tpost + nt) // (2 * nt) AS BIGINT) END
                  AS t_post_e4,
                CASE WHEN nc > 0 THEN
                  CAST((2 * cpre + nc) // (2 * nc) AS BIGINT) END
                  AS c_pre_e4,
                CASE WHEN nc > 0 THEN
                  CAST((2 * cpost + nc) // (2 * nc) AS BIGINT) END
                  AS c_post_e4,
                ${did("tpost", "tpre", "cpost", "cpre")} AS did_e4,
                ${did("tp2", "tp1", "cp2", "cp1")} AS placebo_e4
         FROM cells"""
  }

  /** The q156 oracle's unrolled greedy MMR replay: the same e4-integer
    * rounded cosines (the q32 recipe — sums over the unnested vector in
    * index order, ROUND 4-equivalent ×10000), the same 50-deep
    * (rel_e4 DESC, did) shortlist, then one (score, pick, pick-set) CTE
    * triple per round so DuckDB replays the exact integer greedy:
    * score₂ = rel − max sim(c, selected), argmax ties by did. Every
    * shortlist pair has a sim row, so the step-i score join is inner.
    */
  private def mmrOracleSql: String = {
    val sb = new StringBuilder(
      """WITH q AS (
           SELECT vec_id AS qid, embedding AS qe
           FROM embeddings ORDER BY vec_id LIMIT 8
         ), cand AS (
           SELECT q.qid, e.vec_id AS did, q.qe, e.embedding AS ne
           FROM q, embeddings e WHERE e.vec_id <> q.qid
         ), un AS (
           SELECT qid, did, CAST(unnest(qe) AS DOUBLE) AS x,
                  CAST(unnest(ne) AS DOUBLE) AS y
           FROM cand
         ), dots AS (
           SELECT qid, did, SUM(x*y) AS dot, SUM(x*x) AS na,
                  SUM(y*y) AS nb
           FROM un GROUP BY qid, did
         ), rel AS (
           SELECT qid, did,
                  CAST(ROUND(dot / (sqrt(na) * sqrt(nb)) * 10000, 0)
                       AS BIGINT) AS rel_e4
           FROM dots
         ), short AS MATERIALIZED (
           SELECT qid, did, rel_e4 FROM (
             SELECT qid, did, rel_e4,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY rel_e4 DESC, did) AS rn
             FROM rel) WHERE rn <= 50
         ), sp AS (
           SELECT s1.qid, s1.did AS a, s2.did AS b,
                  ea.embedding AS va, eb.embedding AS vb
           FROM short s1
           JOIN short s2 ON s1.qid = s2.qid AND s1.did < s2.did
           JOIN embeddings ea ON ea.vec_id = s1.did
           JOIN embeddings eb ON eb.vec_id = s2.did
         ), spu AS (
           SELECT qid, a, b, CAST(unnest(va) AS DOUBLE) AS x,
                  CAST(unnest(vb) AS DOUBLE) AS y
           FROM sp
         ), sd AS (
           SELECT qid, a, b, SUM(x*y) AS dot, SUM(x*x) AS na,
                  SUM(y*y) AS nb
           FROM spu GROUP BY qid, a, b
         ), simb AS MATERIALIZED (
           SELECT qid, a, b,
                  CAST(ROUND(dot / (sqrt(na) * sqrt(nb)) * 10000, 0)
                       AS BIGINT) AS sim_e4
           FROM sd
           UNION ALL
           SELECT qid, b, a,
                  CAST(ROUND(dot / (sqrt(na) * sqrt(nb)) * 10000, 0)
                       AS BIGINT)
           FROM sd
         ), p1 AS MATERIALIZED (
           SELECT qid, did, rel_e4, rel_e4 AS score2 FROM (
             SELECT qid, did, rel_e4,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY rel_e4 DESC, did) AS rn
             FROM short) WHERE rn = 1
         ), pset1 AS MATERIALIZED (SELECT qid, did FROM p1)""")
    for (i <- 2 to 10) {
      sb ++= s""", s$i AS MATERIALIZED (
           SELECT c.qid, c.did, c.rel_e4,
                  c.rel_e4 - MAX(sb.sim_e4) AS score2
           FROM short c
           JOIN simb sb ON sb.qid = c.qid AND sb.a = c.did
           JOIN pset${i - 1} p ON p.qid = sb.qid AND p.did = sb.b
           WHERE NOT EXISTS (SELECT 1 FROM pset${i - 1} x
                             WHERE x.qid = c.qid AND x.did = c.did)
           GROUP BY c.qid, c.did, c.rel_e4
         ), p$i AS MATERIALIZED (
           SELECT qid, did, rel_e4, score2 FROM (
             SELECT qid, did, rel_e4, score2,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY score2 DESC, did) AS rn
             FROM s$i) WHERE rn = 1
         ), pset$i AS MATERIALIZED (
           SELECT qid, did FROM pset${i - 1}
           UNION ALL SELECT qid, did FROM p$i
         )"""
    }
    sb ++= (1 to 10).map(i =>
      s"""SELECT qid, did, CAST($i AS BIGINT) AS mmr_rank, rel_e4,
                CAST(score2 AS BIGINT) AS score2_e4 FROM p$i""")
      .mkString("\n         ", "\n         UNION ALL ", "")
    sb.toString
  }

  /** The q176 oracle's literal DDSketch range table: one (pos, lo, hi,
    * est) row per REACHABLE bucket — bucket pos covers integer units in
    * (lo, hi], est is the exact-rational midpoint estimate. Generated
    * from [[graft.functions.DdSketch.BoundaryUnits]] so the oracle and
    * the engine share one definition; ~1.9k rows (buckets whose ⌊γ^i⌋
    * ties its predecessor are unreachable and skipped), the top bucket
    * clamps everything above the last boundary.
    */
  private def ddSketchRangesSql: String = {
    val b = graft.functions.DdSketch.BoundaryUnits
    val e = graft.functions.DdSketch.EstimateUnits
    val rows = scala.collection.mutable.ArrayBuffer("(0, -1, 0, 0)")
    for (i <- 1 until b.length - 1 if b(i) > b(i - 1))
      rows += s"($i, ${b(i - 1)}, ${b(i)}, ${e(i)})"
    rows += s"(${b.length - 1}, ${b(b.length - 2)}, ${Long.MaxValue}, " +
      s"${e(b.length - 1)})"
    rows.mkString(", ")
  }

  /** DuckDB-runnable equivalents over the same parquet tables. Output
    * column names match the Spark results exactly (the driver sorts
    * columns by name before hashing).
    */
  /** q40's generated oracle (r12): the IntKMeans CTE chain (k=16,
    * THREE Lloyd rounds, md5-capped sample — bit-identical to the
    * Spark trainer) + full-corpus exact integer assignment + per-query
    * nProbe=8 cell probe (rn <= 8 below) + the q32 ROUND-4 cosine
    * re-rank. aa holds exact long d² for EVERY (vector, centroid)
    * pair, so assignment (rn=1) and probing (rn≤8 over the query rows)
    * read one table.
    */
  private def ivfExactOracleSql: String = {
    val km = graft.operators.IntKMeans
      .kmeansCtes("base", "vec_id", k = 16, rounds = 3, cap = 4096, p = "k")
    val rr = graft.operators.IntKMeans.cosineRerankCtes("cand", "r")
    s"""WITH base AS MATERIALIZED (
           SELECT vec_id,
                  ${graft.operators.IntKMeans.e6Sql("embedding")} AS e6
           FROM embeddings
         ), $km, ad AS (
           SELECT vec_id, i, e6[i] AS e
           FROM (SELECT vec_id, e6,
                        unnest(generate_series(1, len(e6))) AS i
                 FROM base)
         ), aa AS MATERIALIZED (
           SELECT p.vec_id, c.cid, SUM((p.e - c.e) * (p.e - c.e)) AS d2
           FROM ad p JOIN kcd3 c ON p.i = c.i GROUP BY 1, 2
         ), asg AS (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY d2, cid) AS rn FROM aa)
           WHERE rn = 1
         ), probe AS (
           SELECT vec_id AS qid, cid FROM (
             SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY d2, cid) AS rn FROM aa WHERE vec_id < 10)
           WHERE rn <= 8
         ), cand AS (
           SELECT pr.qid, a.vec_id AS nid
           FROM probe pr JOIN asg a USING (cid)
           WHERE a.vec_id <> pr.qid
         ), $rr
         SELECT qid, nid, cos_sim, CAST(rn AS BIGINT) AS rank
         FROM (SELECT qid, nid, cos_sim, row_number() OVER (
                 PARTITION BY qid ORDER BY cos_sim DESC, nid) AS rn
               FROM rscored)
         WHERE rn <= 5"""
  }

  /** q120's generated oracle (r12): one shared md5-capped sample, one
    * IntKMeans CTE chain PER SUBSPACE over the e6 slices (16 centroids,
    * 2 rounds), exact integer encode of the full corpus, an ADC sum
    * that joins codes to the per-query distance tables on (m, code),
    * the (adist, nid) shortlist cut at 96, and the q32 ROUND-4 cosine
    * re-rank. ca$m holds exact long d² for every (vector, sub-centroid)
    * pair, so corpus codes (rn=1) and query tables (vec_id<10) read
    * one table per subspace.
    */
  private def pqExactOracleSql: String = {
    val m8 = graft.operators.PqAnn.M
    val subDim = 64 / m8
    val sb = new StringBuilder
    sb.append(s"""WITH base AS MATERIALIZED (
           SELECT vec_id,
                  ${graft.operators.IntKMeans.e6Sql("embedding")} AS e6
           FROM embeddings
         )""")
    for (m <- 0 until m8) {
      val lo = m * subDim + 1; val hi = (m + 1) * subDim
      sb.append(s""", sl$m AS (
           SELECT vec_id, e6[$lo:$hi] AS e6 FROM base
         ), """)
      sb.append(graft.operators.IntKMeans.kmeansCtes(
        s"sl$m", "vec_id", k = graft.operators.PqAnn.SubK,
        rounds = graft.operators.PqAnn.PqRounds, cap = 4096, p = s"p$m"))
      sb.append(s""", ced$m AS (
           SELECT vec_id, i, e6[i] AS e
           FROM (SELECT vec_id, e6,
                        unnest(generate_series(1, len(e6))) AS i
                 FROM sl$m)
         ), ca$m AS MATERIALIZED (
           SELECT p.vec_id, c.cid, SUM((p.e - c.e) * (p.e - c.e)) AS d2
           FROM ced$m p JOIN p${m}cd${graft.operators.PqAnn.PqRounds} c
             ON p.i = c.i
           GROUP BY 1, 2
         ), code$m AS (
           SELECT vec_id, cid AS code FROM (
             SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY d2, cid) AS rn FROM ca$m)
           WHERE rn = 1
         )""")
    }
    val codesUnion = (0 until m8)
      .map(m => s"SELECT vec_id, $m AS m, code FROM code$m")
      .mkString(" UNION ALL ")
    val dtabUnion = (0 until m8)
      .map(m => s"""SELECT vec_id AS qid, $m AS m, cid AS code, d2
                    FROM ca$m WHERE vec_id < 10""")
      .mkString(" UNION ALL ")
    sb.append(s""", codes AS MATERIALIZED ($codesUnion
         ), dtab AS MATERIALIZED ($dtabUnion
         ), adc AS (
           SELECT t.qid, c.vec_id AS nid, SUM(t.d2) AS adist
           FROM codes c JOIN dtab t ON t.m = c.m AND t.code = c.code
           WHERE c.vec_id <> t.qid GROUP BY 1, 2
         ), shortc AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY adist, nid) AS rn FROM adc)
           WHERE rn <= 96
         ), ${graft.operators.IntKMeans.cosineRerankCtes("shortc", "r")}
         SELECT qid, nid, cos_sim FROM (
           SELECT qid, nid, cos_sim, row_number() OVER (PARTITION BY qid
             ORDER BY cos_sim DESC, nid) AS rn FROM rscored)
         WHERE rn <= 5""")
    sb.toString
  }

  /** q121's generated oracle (r12), also q227's (the persisted-index
    * search runs the identical exact-integer kernel with the same
    * parameters, so the DuckDB replay recomputes from the base table
    * what the artifact caches): the q40 coarse chain (k=16, 3 rounds)
    * + exact corpus assignment, per-subspace residual sub-codebook
    * chains trained on the SAMPLE residuals, exact residual codes,
    * per-(query, probed-cell) residual distance tables (nProbe=8), the
    * cell-pruned ADC join, the (adist, nid) shortlist cut at 64, and
    * the ROUND-4 cosine re-rank.
    */
  private def ivfPqExactOracleSql: String = {
    val m8 = graft.operators.IvfPq.M
    val subDim = 64 / m8
    val km = graft.operators.IntKMeans.kmeansCtes(
      "base", "vec_id", k = 16,
      rounds = graft.operators.IvfPq.CoarseRounds, cap = 4096, p = "k")
    val kcd = s"kcd${graft.operators.IvfPq.CoarseRounds}"
    val sb = new StringBuilder
    sb.append(s"""WITH base AS MATERIALIZED (
           SELECT vec_id,
                  ${graft.operators.IntKMeans.e6Sql("embedding")} AS e6
           FROM embeddings
         ), $km, ad AS MATERIALIZED (
           SELECT vec_id, i, e6[i] AS e
           FROM (SELECT vec_id, e6,
                        unnest(generate_series(1, len(e6))) AS i
                 FROM base)
         ), aa AS MATERIALIZED (
           SELECT p.vec_id, c.cid, SUM((p.e - c.e) * (p.e - c.e)) AS d2
           FROM ad p JOIN $kcd c ON p.i = c.i GROUP BY 1, 2
         ), asg AS MATERIALIZED (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY d2, cid) AS rn FROM aa)
           WHERE rn = 1
         ), probe AS (
           SELECT vec_id AS qid, cid FROM (
             SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY d2, cid) AS rn FROM aa WHERE vec_id < 10)
           WHERE rn <= 8
         ), rd AS MATERIALIZED (
           SELECT p.vec_id, g.cid AS cell, p.i, p.e - c.e AS e
           FROM ad p JOIN asg g USING (vec_id)
           JOIN $kcd c ON c.cid = g.cid AND c.i = p.i
         ), qrd AS MATERIALIZED (
           SELECT p.vec_id AS qid, pr.cid AS pcell, p.i, p.e - c.e AS e
           FROM ad p JOIN probe pr ON pr.qid = p.vec_id
           JOIN $kcd c ON c.cid = pr.cid AND c.i = p.i
         )""")
    for (m <- 0 until m8) {
      val lo = m * subDim + 1; val hi = (m + 1) * subDim
      sb.append(s""", srl$m AS (
           SELECT s.sid, list(r.e ORDER BY r.i) AS e6
           FROM ksamp s JOIN rd r ON r.vec_id = s.sid
           WHERE r.i BETWEEN $lo AND $hi GROUP BY s.sid
         ), """)
      sb.append(graft.operators.IntKMeans.kmeansCtes(
        s"srl$m", "sid", k = graft.operators.IvfPq.SubK,
        rounds = graft.operators.PqAnn.PqRounds, cap = 4096, p = s"p$m"))
      sb.append(s""", ra$m AS (
           SELECT r.vec_id, c.cid, SUM((r.e - c.e) * (r.e - c.e)) AS d2
           FROM rd r JOIN p${m}cd${graft.operators.PqAnn.PqRounds} c
             ON c.i = r.i - $lo + 1
           WHERE r.i BETWEEN $lo AND $hi GROUP BY 1, 2
         ), code$m AS (
           SELECT vec_id, cid AS code FROM (
             SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY d2, cid) AS rn FROM ra$m)
           WHERE rn = 1
         ), dt$m AS (
           SELECT q.qid, q.pcell, c.cid AS code,
                  SUM((q.e - c.e) * (q.e - c.e)) AS d2
           FROM qrd q JOIN p${m}cd${graft.operators.PqAnn.PqRounds} c
             ON c.i = q.i - $lo + 1
           WHERE q.i BETWEEN $lo AND $hi GROUP BY 1, 2, 3
         )""")
    }
    val codesUnion = (0 until m8)
      .map(m => s"SELECT vec_id, $m AS m, code FROM code$m")
      .mkString(" UNION ALL ")
    val dtabUnion = (0 until m8)
      .map(m => s"SELECT qid, pcell, $m AS m, code, d2 FROM dt$m")
      .mkString(" UNION ALL ")
    sb.append(s""", codes AS MATERIALIZED ($codesUnion
         ), dtab AS MATERIALIZED ($dtabUnion
         ), adc AS (
           SELECT t.qid, c.vec_id AS nid, SUM(t.d2) AS adist
           FROM codes c
           JOIN asg g ON g.vec_id = c.vec_id
           JOIN dtab t ON t.m = c.m AND t.code = c.code
             AND t.pcell = g.cid
           WHERE c.vec_id <> t.qid GROUP BY 1, 2
         ), shortc AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY adist, nid) AS rn FROM adc)
           WHERE rn <= 64
         ), ${graft.operators.IntKMeans.cosineRerankCtes("shortc", "r")}
         SELECT qid, nid, cos_sim FROM (
           SELECT qid, nid, cos_sim, row_number() OVER (PARTITION BY qid
             ORDER BY cos_sim DESC, nid) AS rn FROM rscored)
         WHERE rn <= 5""")
    sb.toString
  }

  /** q75's generated oracle (r12): the IntKMeans chain (k=32, 2
    * rounds), exact corpus assignment, then each vector's ROUND-4
    * cosine against its own integer centroid and the rn=1 cut per
    * cell — the SemDeDup representative pick replayed exactly.
    */
  private def semDedupOracleSql: String = {
    val km = graft.operators.IntKMeans
      .kmeansCtes("base", "vec_id", k = 32, rounds = 2, cap = 4096, p = "k")
    s"""WITH base AS MATERIALIZED (
           SELECT vec_id, embedding,
                  ${graft.operators.IntKMeans.e6Sql("embedding")} AS e6
           FROM embeddings
         ), $km, ad AS (
           SELECT vec_id, i, e6[i] AS e
           FROM (SELECT vec_id, e6,
                        unnest(generate_series(1, len(e6))) AS i
                 FROM base)
         ), aa AS (
           SELECT p.vec_id, c.cid, SUM((p.e - c.e) * (p.e - c.e)) AS d2
           FROM ad p JOIN kcd2 c ON p.i = c.i GROUP BY 1, 2
         ), asg AS (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY d2, cid) AS rn FROM aa)
           WHERE rn = 1
         ), un AS (
           SELECT b.vec_id, g.cid AS cell,
                  CAST(b.embedding[c.i] AS DOUBLE) AS x,
                  CAST(c.e AS DOUBLE) AS y
           FROM base b JOIN asg g USING (vec_id)
           JOIN kcd2 c ON c.cid = g.cid
         ), dots AS (
           SELECT vec_id, cell, SUM(x*y) AS dot, SUM(x*x) AS na,
                  SUM(y*y) AS nb
           FROM un GROUP BY 1, 2
         ), scored AS (
           SELECT vec_id, cell,
                  ROUND(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_r
           FROM dots
         )
         SELECT vec_id, cell, cos_r FROM (
           SELECT vec_id, cell, cos_r, ROW_NUMBER() OVER (
             PARTITION BY cell ORDER BY cos_r DESC, vec_id) AS rn
           FROM scored)
         WHERE rn = 1"""
  }

  def oracleSql: Map[String, String] = Map(
    "q40_ann_ivf" -> ivfExactOracleSql,
    "q75_semdedup" -> semDedupOracleSql,
    "q120_pq_ann" -> pqExactOracleSql,
    "q121_ivfpq" -> ivfPqExactOracleSql,
    "q227_ann_index_search" -> ivfPqExactOracleSql,
    // q60 gated like q162: the sketch VALUES have no cross-engine
    // oracle, so the output carries exact row counts plus booleans
    // asserting the sketch claims (HLL within 3·rsd + slack; approx
    // median inside its ±0.001 rank-guarantee window). Same COUPLING
    // WARNING as q162: the TRUEs depend on Spark's sketch
    // implementations and the driver's scale factor — if this entry
    // goes red, check RelationalOpsSpec's q60 test first (same claims,
    // per-flag messages).
    "q60_sketch_stats" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
                TRUE AS orders_ndv_ok, TRUE AS parts_ndv_ok,
                TRUE AS p50_rank_ok
         FROM lineitem GROUP BY 1""",
    // full DDSketch replay from the shared exact-rational range table:
    // identical bucket assignment (integer (lo, hi] ranges), identical
    // integer nearest-rank rule (100·cum ≥ p·n), identical exact
    // estimates — engine-exact end to end, no libm on either side
    "q176_quantile_rollup" ->
      s"""WITH r(pos, lo, hi, est) AS (VALUES $ddSketchRangesSql),
         u AS (
           SELECT event_type, date_trunc('day', ts) AS day,
                  CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
                    AS u
           FROM events WHERE value IS NOT NULL
         ), pb AS (
           SELECT event_type, day, r.pos, r.est
           FROM u JOIN r ON u.u > r.lo AND u.u <= r.hi
         ), merged AS (
           SELECT event_type, pos, MIN(est) AS est,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM pb GROUP BY 1, 2
         ), tot AS (
           SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_events
           FROM merged GROUP BY 1
         ), days AS (
           SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT)
                    AS n_days
           FROM u GROUP BY 1
         ), cum AS (
           SELECT event_type, pos, est,
                  SUM(c) OVER (PARTITION BY event_type ORDER BY pos)
                    AS cum
           FROM merged
         )
         SELECT c.event_type, d.n_days, t.n_events,
                CAST(MIN(CASE WHEN cum * 100 >= 50 * t.n_events
                              THEN est END) AS BIGINT) AS p50_units,
                CAST(MIN(CASE WHEN cum * 100 >= 95 * t.n_events
                              THEN est END) AS BIGINT) AS p95_units,
                CAST(MIN(CASE WHEN cum * 100 >= 99 * t.n_events
                              THEN est END) AS BIGINT) AS p99_units
         FROM cum c
         JOIN tot t USING (event_type) JOIN days d USING (event_type)
         GROUP BY 1, 2, 3""",
    "q01_scan_project" ->
      "SELECT o_orderkey, o_custkey, o_orderpriority FROM orders",
    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate
         FROM lineitem
         WHERE l_returnflag = 'R' AND l_shipdate < TIMESTAMP '1998-01-01'""",
    "q03_derived_flag" ->
      """SELECT l_orderkey, l_linenumber,
                (l_extendedprice * (1 - l_discount) > 30000) AS high_value
         FROM lineitem""",
    "q04_concat_key" ->
      """SELECT event_id,
                strftime(ts, '%Y%m%d%H%M%S') || '_' || CAST(user_id AS VARCHAR)
                  AS match_key
         FROM events""",
    "q05_ts_parse" ->
      """SELECT event_id,
                try_strptime(
                  CASE WHEN event_type = 'error' THEN 'not-a-timestamp'
                       ELSE strftime(ts, '%Y%m%dT%H%M%S.%fZ') END,
                  '%Y%m%dT%H%M%S.%fZ') AS parsed_ts
         FROM events""",
    "q06_season_assign" ->
      """WITH e AS (
           SELECT event_id, ts, date_trunc('month', ts) AS m0 FROM events
         ), s AS (
           SELECT event_id, ts, m0,
                  m0 + ((8 - isodow(m0)) % 7) * INTERVAL '1 day'
                     + INTERVAL '9 hours' + INTERVAL '5 minutes' AS sstart
           FROM e
         )
         SELECT event_id,
                CASE WHEN ts >= sstart THEN strftime(m0, '%Y-%m')
                     ELSE strftime(m0 - INTERVAL '1 month', '%Y-%m') END
                  AS season_id
         FROM s""",
    "q07_union_dedup" ->
      """SELECT DISTINCT * FROM (
           SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'
           UNION ALL
           SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         )""",
    "q08_insert_new_only" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders o
         WHERE NOT EXISTS (
           SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""",
    "q09_semi_join" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
         FROM lineitem l
         WHERE EXISTS (SELECT 1 FROM part p
                       WHERE p.p_partkey = l.l_partkey AND p.p_size > 45)""",
    "q10_blocklist" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_custkey NOT IN (1, 7, 13, 42, 99)""",
    "q11_inner_join" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, o_custkey, o_orderdate
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""",
    "q12_upsert_last_wins" ->
      """SELECT user_id, ts AS last_ts, event_type AS last_event_type,
                "value" AS last_value
         FROM events
         QUALIFY row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""",
    "q13_purge_keys" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem l
         WHERE NOT EXISTS (
           SELECT 1 FROM supplier s
           WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)""",
    "q14_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q15_json_flatten" ->
      """SELECT event_id, event_type,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
         FROM events""",
    "q16_array_guard" ->
      """SELECT vec_id,
                CAST(CASE WHEN len(embedding) >= 1 THEN embedding[1]
                          ELSE 0 END AS DOUBLE) AS e1,
                CAST(CASE WHEN len(embedding) >= 2 THEN embedding[2]
                          ELSE 0 END AS DOUBLE) AS e2
         FROM embeddings""",
    "q17_explode" ->
      """SELECT vec_id, CAST(ord - 1 AS INTEGER) AS pos,
                CAST(v AS DOUBLE) AS val
         FROM (SELECT vec_id, unnest(embedding) AS v,
                      generate_subscripts(embedding, 1) AS ord
               FROM embeddings)""",
    "q18_cast_null" ->
      """SELECT p_partkey, CAST(p_partkey AS VARCHAR) AS pk_str,
                CAST(CASE WHEN p_size > 40 THEN NULL ELSE p_size END
                     AS BIGINT) AS size_masked,
                CAST(round(p_retailprice * 100) AS BIGINT) AS retail_cents
         FROM part""",
    "q19_recent_topk" ->
      """WITH o AS (
           SELECT *, date_trunc('month', o_orderdate) AS period_m FROM orders
         ), latest AS (SELECT max(period_m) AS m FROM o),
         ranked AS (
           SELECT strftime(l.m, '%Y-%m') AS period, o.o_orderkey, c.c_name,
                  o.o_totalprice,
                  CAST(row_number() OVER (
                    ORDER BY o.o_totalprice DESC, o.o_orderkey) AS BIGINT)
                    AS rank
           FROM o, latest l
           JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE o.period_m = l.m
         )
         SELECT * FROM ranked WHERE rank <= 100""",
    "q20_dim_join" ->
      """SELECT c_custkey, c_name, n_name, r_name
         FROM customer c
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey""",
    "q21_win_rate" ->
      """SELECT o_custkey,
                CASE WHEN COUNT(*) = 0 THEN NULL
                     ELSE ROUND(100.0 * SUM(CASE WHEN o_orderstatus = 'F'
                                                 THEN 1 ELSE 0 END)
                                / COUNT(*), 2) END AS win_rate,
                CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         GROUP BY o_custkey""",
    "q22_usage_rate" ->
      """WITH j AS (
           SELECT l.l_returnflag, p.p_brand
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN part p ON l.l_partkey = p.p_partkey
           WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
         ), b AS (
           SELECT p_brand, COUNT(*) AS n_uses,
                  SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS wins
           FROM j GROUP BY p_brand
         ), t AS (SELECT SUM(n_uses) AS total FROM b)
         SELECT p_brand,
                ROUND(100.0 * n_uses / total, 2) AS usage_rate,
                ROUND(100.0 * wins / n_uses, 2) AS win_rate,
                CAST(n_uses AS BIGINT) AS n_uses
         FROM b, t""",
    "q23_exact_dedup" ->
      """SELECT md5(lower(trim(text))) AS content_hash,
                CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
                CAST(COUNT(*) AS BIGINT) AS dup_count
         FROM documents GROUP BY 1""",
    "q24_text_stats" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                CAST(MIN(n_chars) AS BIGINT) AS min_chars,
                CAST(MAX(n_chars) AS BIGINT) AS max_chars,
                CAST((2 * 100 * SUM(n_chars) + COUNT(*))
                  // (2 * COUNT(*)) AS BIGINT) / 100.0 AS avg_chars
         FROM documents GROUP BY lang, source""",
    "q25_token_count" ->
      """SELECT doc_id,
                CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                     AS BIGINT) AS n_tokens,
                CAST(len(regexp_extract_all(lower(trim(text)), '[a-z]+'))
                     AS BIGINT) AS n_subtokens,
                CAST(len(list_distinct(
                       string_split_regex(lower(trim(text)), '\s+')))
                     AS BIGINT) AS n_distinct_tokens
         FROM documents""",
    "q26_quality_score" ->
      """WITH t AS (
           SELECT doc_id,
                  CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                       AS BIGINT) AS n_tokens,
                  CAST(len(list_filter(
                         string_split_regex(lower(trim(text)), '\s+'),
                         t -> list_contains(
                           ['the','a','of','and','to','in'], t)))
                       AS BIGINT) AS stop_cnt,
                  CAST(length(regexp_replace(lower(trim(text)), '\s+', '',
                       'g')) AS BIGINT) AS nonspace
           FROM documents
         )
         SELECT doc_id, n_tokens,
                ((stop_cnt * 2000 + n_tokens) // (2 * n_tokens)) / 1000.0
                  AS stop_ratio,
                ((nonspace * 200 + n_tokens) // (2 * n_tokens)) / 100.0
                  AS avg_token_len,
                (n_tokens >= 20 AND n_tokens <= 1000) AS length_ok
         FROM t""",
    // marker-count heuristic; tie-break priority zh>fr>es>de>en mirrors
    // the Spark foldLeft (later langs overwrite on equal score)
    "q27_lang_id" ->
      """WITH t AS (
           SELECT doc_id, text,
                  string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents
         ), s AS (
           SELECT doc_id,
                  CAST(len(list_filter(toks, x -> list_contains(
                    ['the','a','of','and','is','to','in','that','it'], x)))
                    AS DOUBLE) AS sc_en,
                  CAST(len(list_filter(toks, x -> list_contains(
                    ['der','die','das','und','ist','nicht','ein','zu'], x)))
                    AS DOUBLE) AS sc_de,
                  CAST(len(list_filter(toks, x -> list_contains(
                    ['el','la','los','las','es','y','un','una','que'], x)))
                    AS DOUBLE) AS sc_es,
                  CAST(len(list_filter(toks, x -> list_contains(
                    ['le','la','les','est','et','un','une','dans','ce'], x)))
                    AS DOUBLE) AS sc_fr,
                  CAST((length(text) - length(regexp_replace(text, '的', '', 'g')))
                     + (length(text) - length(regexp_replace(text, '是', '', 'g')))
                     + (length(text) - length(regexp_replace(text, '了', '', 'g')))
                     + (length(text) - length(regexp_replace(text, '在', '', 'g')))
                     + (length(text) - length(regexp_replace(text, '我', '', 'g')))
                     + (length(text) - length(regexp_replace(text, '有', '', 'g')))
                     + (length(text) - length(regexp_replace(text, '和', '', 'g')))
                     + (length(text) - length(regexp_replace(text, '不', '', 'g')))
                    AS DOUBLE) AS sc_zh
           FROM t
         ), g AS (
           SELECT doc_id, sc_en, sc_de, sc_es, sc_fr, sc_zh,
                  greatest(sc_en, sc_de, sc_es, sc_fr, sc_zh) AS best
           FROM s
         )
         SELECT doc_id,
                CASE WHEN best > 0 AND sc_zh = best THEN 'zh'
                     WHEN best > 0 AND sc_fr = best THEN 'fr'
                     WHEN best > 0 AND sc_es = best THEN 'es'
                     WHEN best > 0 AND sc_de = best THEN 'de'
                     WHEN best > 0 AND sc_en = best THEN 'en'
                     ELSE 'und' END AS predicted_lang
         FROM g""",
    // r14: the default md5 position-tagged family — token t at 1-based
    // position i contributes its first-13-hex-digit md5 int; Σ mod 10¹⁸.
    // Spark folds with a per-step mod (bounded long), the oracle sums in
    // HUGEINT then mods once — equal because every term is non-negative.
    "q28_fingerprint" ->
      """WITH tok AS (
           SELECT doc_id,
                  CAST(('0x' || substr(md5(tk[i] || ':'
                         || CAST(i AS VARCHAR)), 1, 13)) AS BIGINT) AS h
           FROM (SELECT doc_id, tk,
                        unnest(generate_series(1, len(tk))) AS i
                 FROM (SELECT doc_id,
                              string_split_regex(lower(trim(text)),
                                '\s+') AS tk
                       FROM documents WHERE text IS NOT NULL))
         )
         SELECT doc_id,
                CAST(SUM(CAST(h AS HUGEINT))
                     % 1000000000000000000 AS BIGINT) AS fingerprint
         FROM tok GROUP BY 1""",
    // full LSH-candidates → exact-verify pipeline: md5 minhash minima are
    // engine-identical hex strings, so DuckDB reproduces the candidate
    // set exactly — never all-pairs on either side
    "q29_minhash_lsh" -> minhashLshOracleSql,
    "q30_simhash" -> simhashSigOracleSql,
    "q33_ann_lsh" -> annLshOracleSql,
    "q51_simhash_neardup" -> simhashNearDupOracleSql,
    "q31_ngram_jaccard" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, substr(text, strpos(text, ' ') + 1)
           FROM documents
         ), base AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM corpus
         ), sh AS (
           SELECT doc_id, list_distinct(tk) AS toks,
                  CASE WHEN len(tk) >= 3 THEN
                    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                   for i in range(1, len(tk) - 1)])
                  ELSE [array_to_string(tk, ' ')] END AS sh
           FROM base
         ), sigs AS (
           SELECT doc_id, toks,
                  list_min(list_transform(sh, x -> md5('0|' || x))) AS m0,
                  list_min(list_transform(sh, x -> md5('1|' || x))) AS m1,
                  list_min(list_transform(sh, x -> md5('2|' || x))) AS m2,
                  list_min(list_transform(sh, x -> md5('3|' || x))) AS m3,
                  list_min(list_transform(sh, x -> md5('4|' || x))) AS m4,
                  list_min(list_transform(sh, x -> md5('5|' || x))) AS m5,
                  list_min(list_transform(sh, x -> md5('6|' || x))) AS m6,
                  list_min(list_transform(sh, x -> md5('7|' || x))) AS m7
           FROM sh
         ), banded AS (
           SELECT doc_id,
                  unnest([0, 1, 2, 3]) AS band_id,
                  unnest([m0 || ',' || m1, m2 || ',' || m3,
                          m4 || ',' || m5, m6 || ',' || m7]) AS band_key
           FROM sigs
         ), pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM banded a JOIN banded b
             ON a.band_id = b.band_id AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
         ), iv AS (
           SELECT p.doc_a, p.doc_b,
                  len(list_intersect(ta.toks, tb.toks)) AS inter,
                  len(ta.toks) AS na, len(tb.toks) AS nb
           FROM pairs p
           JOIN sh ta ON ta.doc_id = p.doc_a
           JOIN sh tb ON tb.doc_id = p.doc_b
         )
         SELECT doc_a, doc_b,
                ROUND(CAST(inter AS DOUBLE) / (na + nb - inter), 3) AS jaccard
         FROM iv""",
    "q32_knn_bruteforce" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                    WHERE vec_id < 10),
         pairs AS (SELECT q.qid, e.vec_id AS nid, q.qe, e.embedding AS ne
                   FROM q, embeddings e WHERE e.vec_id <> q.qid),
         un AS (SELECT qid, nid, CAST(unnest(qe) AS DOUBLE) AS x,
                       CAST(unnest(ne) AS DOUBLE) AS y
                FROM pairs),
         dots AS (SELECT qid, nid, SUM(x*y) AS dot, SUM(x*x) AS na,
                         SUM(y*y) AS nb
                  FROM un GROUP BY qid, nid),
         scored AS (SELECT qid, nid,
                           ROUND(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim
                    FROM dots),
         ranked AS (SELECT qid, nid, cos_sim,
                           CAST(row_number() OVER (PARTITION BY qid
                             ORDER BY cos_sim DESC, nid) AS BIGINT) AS rank
                    FROM scored)
         SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= 5""",
    "q34_vector_ops" ->
      """WITH un AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                            CAST(unnest(list_reverse(embedding)) AS DOUBLE)
                              AS y
                     FROM embeddings)
         SELECT vec_id,
                ROUND(sqrt(SUM(x*x)), 4) AS l2_norm,
                ROUND(SUM(x*y), 4) AS dot_rev
         FROM un GROUP BY vec_id""",
    // the synthesis→decode composition has a closed form over
    // (doc_id, text): format by md5 digit (the q209 recipe), image
    // geometry/strides from the byte length, pixel/sample statistics
    // from per-character code sums (the corpus is ASCII — one byte per
    // char). The Spark side REALLY decodes the synthesized container;
    // this replays what that decode must yield.
    "q35_multimodal" ->
      """WITH d AS (
           SELECT doc_id, CAST(length(text) AS BIGINT) AS L,
                  CAST(list_sum(list_transform(
                    string_split_regex(text, ''), c -> ascii(c)))
                    AS BIGINT) AS bsum,
                  CAST(list_sum(list_transform(
                    string_split_regex(text, ''),
                    c -> abs(ascii(c) - 128))) AS BIGINT) AS asum,
                  (strpos('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 3
                    AS pick
           FROM documents
           WHERE text IS NOT NULL AND length(text) > 0
             AND strlen(text) = length(text)
         ), g AS (
           SELECT doc_id, L, bsum, asum, pick,
                  (L % 31) + 1 AS w,
                  (L + 3 * ((L % 31) + 1) - 1)
                    // (3 * ((L % 31) + 1)) AS h
           FROM d
         )
         SELECT doc_id,
                CASE pick WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
                  ELSE 'wav' END AS fmt,
                CAST(CASE pick
                  WHEN 0 THEN 54 + ((3 * w + 3) // 4) * 4 * h
                  WHEN 1 THEN 9 + length(CAST(w AS VARCHAR))
                    + length(CAST(h AS VARCHAR)) + 3 * w * h
                  ELSE 44 + 2 * L END AS BIGINT) AS byte_len,
                CAST(CASE WHEN pick < 2 THEN w END AS INTEGER) AS width,
                CAST(CASE WHEN pick < 2 THEN h END AS INTEGER)
                  AS height,
                CAST(CASE WHEN pick = 2 THEN 8000 END AS INTEGER)
                  AS rate,
                CAST(CASE WHEN pick < 2 THEN w * h ELSE L END AS BIGINT)
                  AS n_units,
                CAST(CASE WHEN pick < 2
                  THEN (2 * 100 * bsum + 3 * w * h) // (2 * 3 * w * h)
                  ELSE (2 * 100 * asum * 256 + L) // (2 * L) END
                  AS BIGINT) AS mean_e2
         FROM g""",
    "q36_embed_neardup" ->
      """WITH c AS (
           SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
                    AS e
           FROM embeddings
           UNION ALL
           SELECT vec_id + 1000000,
                  list_transform(embedding, x -> CAST(x AS DOUBLE) + 0.02)
           FROM embeddings
         ), pairs AS (
           SELECT a.vec_id AS va, b.vec_id AS vb, a.e AS ea, b.e AS eb
           FROM c a, c b WHERE a.vec_id < b.vec_id
         ), un AS (
           SELECT va, vb, unnest(ea) AS x, unnest(eb) AS y FROM pairs
         ), d AS (
           SELECT va, vb, SUM(x*y) AS dot, SUM(x*x) AS na, SUM(y*y) AS nb
           FROM un GROUP BY va, vb
         )
         SELECT va AS vec_a, vb AS vec_b,
                ROUND(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim
         FROM d
         WHERE ROUND(dot / (sqrt(na) * sqrt(nb)), 4) >= 0.9""",
    "q37_json_ingest" ->
      """WITH e AS (
           SELECT event_id, ts, user_id, event_type, "value",
                  CAST(json_extract_string(props, '$.k') AS INT) AS k
           FROM events
         )
         SELECT strftime(ts, '%Y%m%dT%H%M%S.%gZ') || '_#P' || user_id
                  AS match_key,
                try_strptime(strftime(ts, '%Y%m%dT%H%M%S.%gZ'),
                  '%Y%m%dT%H%M%S.%gZ') AS battle_time,
                (event_id % 4) > ((event_id + 1) % 4) AS is_win,
                CAST(user_id % 7 + 1 AS INT) AS league,
                '#P' || user_id AS player_id,
                '#O' || user_id AS opponent_id,
                CAST(event_id % 100 AS INT) AS current_global_rank,
                CAST(1000 + event_id % 500 AS INT) AS starting_rating,
                CAST(event_id % 60 - 30 AS INT) AS rating_change,
                CAST(event_id % 4 AS INT) AS crowns,
                CAST((event_id + 1) % 4 AS INT) AS opp_crowns,
                CAST(5000 + event_id % 1000 AS INT) AS king_tower_hp,
                CAST(k * 10 AS INT) AS princess_tower1_hp,
                CAST(CASE WHEN event_id % 3 = 0 THEN 0 ELSE k * 5 END AS INT)
                  AS princess_tower2_hp,
                "value" AS elixir_leaked
         FROM e WHERE event_type <> 'error'""",
    "q38_topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
         QUALIFY row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey) <= 3""",
    "q39_asof_join" ->
      """SELECT e.event_id, e.user_id, e.ts, p.purchase_ts AS last_purchase_ts
         FROM events e
         ASOF LEFT JOIN (SELECT user_id, ts, ts AS purchase_ts FROM events
                         WHERE event_type = 'purchase') p
           ON e.user_id = p.user_id AND e.ts >= p.ts""",
    "q41_table_stats" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
                MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
                MIN(l_shipdate) AS min_shipdate,
                MAX(l_shipdate) AS max_shipdate,
                SUM(l_quantity) AS sum_qty
         FROM lineitem""",
    "q42_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) AS running_spend,
                CAST(date_diff('day',
                  lag(o_orderdate) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS BIGINT) AS days_since_prev
         FROM orders""",
    "q43_rollup" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY ROLLUP (lang, source)""",
    "q44_pivot" ->
      """SELECT user_id,
                CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_click,
                CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_view,
                CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_purchase,
                CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_signup,
                CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_error
         FROM events GROUP BY user_id""",
    "q45_percentiles" ->
      """SELECT l_returnflag,
                ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95
         FROM lineitem GROUP BY l_returnflag""",
    "q46_seasons_table" ->
      """WITH m0 AS (SELECT DISTINCT date_trunc('month', ts) AS m0
                     FROM events),
         ms AS (SELECT DISTINCT unnest([m0 - INTERVAL '1 month', m0,
                                        m0 + INTERVAL '1 month']) AS m
                FROM m0)
         SELECT strftime(m, '%Y-%m') AS season_id,
                m + ((8 - isodow(m)) % 7) * INTERVAL '1 day'
                  + INTERVAL '9 hours' + INTERVAL '5 minutes'
                  AS sn_start_date,
                (m + INTERVAL '1 month')
                  + ((8 - isodow(m + INTERVAL '1 month')) % 7)
                    * INTERVAL '1 day'
                  + INTERVAL '9 hours' + INTERVAL '5 minutes'
                  - INTERVAL '1 second' AS sn_end_date
         FROM ms""",
    "q47_top_ngrams" ->
      """WITH t AS (
           SELECT string_split_regex(lower(trim(text)), '\s+') AS toks
           FROM documents
         ), g AS (
           SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS trigram
           FROM t, LATERAL unnest(range(1, len(toks) - 1)) AS u(i)
           WHERE len(toks) >= 3
         )
         SELECT trigram, CAST(COUNT(*) AS BIGINT) AS n
         FROM g GROUP BY trigram
         ORDER BY n DESC, trigram ASC LIMIT 20""",
    "q48_fk_check" ->
      """SELECT 'lineitem_orders' AS fk, CAST(COUNT(*) AS BIGINT)
                  AS n_orphans
         FROM lineitem l WHERE NOT EXISTS (
           SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
         UNION ALL
         SELECT 'orders_customer', CAST(COUNT(*) AS BIGINT)
         FROM orders o WHERE NOT EXISTS (
           SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
         UNION ALL
         SELECT 'customer_nation', CAST(COUNT(*) AS BIGINT)
         FROM customer c WHERE NOT EXISTS (
           SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
         UNION ALL
         SELECT 'nation_region', CAST(COUNT(*) AS BIGINT)
         FROM nation n WHERE NOT EXISTS (
           SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey)""",
    "q49_doc_embedding" ->
      """WITH norms AS (
           SELECT vec_id, label, ROUND(sqrt(SUM(x * x)), 4) AS l2_norm
           FROM (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x
                 FROM embeddings)
           GROUP BY vec_id, label
         )
         SELECT d.doc_id, d.lang, d.n_chars, n.label, n.l2_norm
         FROM documents d JOIN norms n ON d.doc_id = n.vec_id""",
    "q50_sample_per_group" ->
      """SELECT doc_id, lang, source,
                md5(CAST(doc_id AS VARCHAR)) AS sample_key
         FROM documents
         QUALIFY row_number() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))) <= 5""",
    "q52_repetition_filters" ->
      """WITH perTok AS (
           SELECT doc_id, tok, COUNT(*) AS c
           FROM (SELECT doc_id,
                        unnest(string_split_regex(lower(trim(text)), '\s+'))
                          AS tok
                 FROM documents)
           GROUP BY doc_id, tok
         ), agg AS (
           SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                  CAST(MAX(c) AS BIGINT) AS top_token_freq,
                  CAST(COUNT(*) AS BIGINT) AS n_distinct
           FROM perTok GROUP BY doc_id
         )
         SELECT doc_id, n_tokens, top_token_freq,
                ((top_token_freq * 2000 + n_tokens) // (2 * n_tokens))
                  / 1000.0 AS top_token_share,
                ((n_distinct * 2000 + n_tokens) // (2 * n_tokens))
                  / 1000.0 AS distinct_ratio
         FROM agg""",
    "q53_quantize" ->
      """WITH e AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings
         ), b AS (
           SELECT vec_id, emb, list_min(emb) AS lo, list_max(emb) AS hi
           FROM e
         ), u AS (
           SELECT vec_id, lo, hi,
                  CAST(generate_subscripts(emb, 1) - 1 AS INTEGER) AS pos,
                  unnest(emb) AS x
           FROM b
         )
         SELECT vec_id, pos,
                CAST(floor((x - lo) * 254 / (hi - lo) + 0.5) AS INTEGER)
                  - 127 AS code
         FROM u""",
    "q54_text_clean" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS len_raw,
                lower(trim(regexp_replace(regexp_replace(text,
                  '[^\x20-\x7e]', ' ', 'g'), '\s+', ' ', 'g')))
                  AS text_clean,
                CAST(length(lower(trim(regexp_replace(regexp_replace(text,
                  '[^\x20-\x7e]', ' ', 'g'), '\s+', ' ', 'g'))))
                  AS BIGINT) AS len_clean
         FROM documents""",
    "q55_full_outer" ->
      """WITH perCust AS (
           SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_recent
           FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
           GROUP BY o_custkey
         )
         SELECT c.c_custkey, c.c_mktsegment,
                COALESCE(p.n_recent, 0) AS n_recent
         FROM customer c FULL OUTER JOIN perCust p
           ON c.c_custkey = p.o_custkey""",
    "q56_set_ops" ->
      """SELECT o_custkey, 'both' AS bucket FROM (
           SELECT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01'
           INTERSECT
           SELECT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1998-01-01'
             AND o_orderdate < TIMESTAMP '1999-01-01')
         UNION ALL
         SELECT o_custkey, 'only_1997' AS bucket FROM (
           SELECT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01'
           EXCEPT
           SELECT o_custkey FROM orders
           WHERE o_orderdate >= TIMESTAMP '1998-01-01'
             AND o_orderdate < TIMESTAMP '1999-01-01')""",
    // dense ids in key order == dense_rank over the fact by that key
    "q57_surrogate_keys" ->
      """WITH e AS (
           SELECT event_id,
                  strftime(ts, '%Y%m%d%H%M%S') || '_'
                    || CAST(user_id AS VARCHAR) AS match_key
           FROM events
         )
         SELECT event_id, match_key,
                CAST(dense_rank() OVER (ORDER BY match_key) AS BIGINT)
                  AS match_id
         FROM e""",
    // integer-exact df-weighted score — ln-based idf is not bit-stable
    // across engines; tf * (N+1) * 1000 div (df+1) is
    "q58_tfidf_terms" ->
      """WITH tf AS (
           SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM (SELECT doc_id,
                        unnest(string_split_regex(lower(trim(text)), '\s+'))
                          AS tok
                 FROM documents)
           GROUP BY doc_id, tok
         ), dfreq AS (
           SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok
         ), n AS (SELECT COUNT(*) AS n FROM documents)
         SELECT doc_id, tok, tf, df,
                CAST(tf * (n + 1) * 1000 // (df + 1) AS BIGINT) AS score
         FROM tf JOIN dfreq USING (tok), n
         QUALIFY row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, tok) <= 3""",
    "q59_token_histogram" ->
      """SELECT CAST(len(string_split_regex(lower(trim(text)), '\s+')) // 10
                     * 10 AS BIGINT) AS bucket_lo,
                CAST(COUNT(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY 1""",
    // connected components over the SAME md5-LSH verified pairs as q31
    // (threshold 0.5): transitive closure + component-min — equals the
    // engine's min-label propagation fixpoint
    "q61_dedup_clusters" ->
      """WITH RECURSIVE corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, substr(text, strpos(text, ' ') + 1)
           FROM documents
         ), base AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM corpus
         ), sh AS (
           SELECT doc_id, list_distinct(tk) AS toks,
                  CASE WHEN len(tk) >= 3 THEN
                    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                   for i in range(1, len(tk) - 1)])
                  ELSE [array_to_string(tk, ' ')] END AS sh
           FROM base
         ), sigs AS (
           SELECT doc_id, toks,
                  list_min(list_transform(sh, x -> md5('0|' || x))) AS m0,
                  list_min(list_transform(sh, x -> md5('1|' || x))) AS m1,
                  list_min(list_transform(sh, x -> md5('2|' || x))) AS m2,
                  list_min(list_transform(sh, x -> md5('3|' || x))) AS m3,
                  list_min(list_transform(sh, x -> md5('4|' || x))) AS m4,
                  list_min(list_transform(sh, x -> md5('5|' || x))) AS m5,
                  list_min(list_transform(sh, x -> md5('6|' || x))) AS m6,
                  list_min(list_transform(sh, x -> md5('7|' || x))) AS m7
           FROM sh
         ), banded AS (
           SELECT doc_id,
                  unnest([0, 1, 2, 3]) AS band_id,
                  unnest([m0 || ',' || m1, m2 || ',' || m3,
                          m4 || ',' || m5, m6 || ',' || m7]) AS band_key
           FROM sigs
         ), pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM banded a JOIN banded b
             ON a.band_id = b.band_id AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
         ), strong AS (
           SELECT p.doc_a, p.doc_b
           FROM pairs p
           JOIN sh ta ON ta.doc_id = p.doc_a
           JOIN sh tb ON tb.doc_id = p.doc_b
           WHERE ROUND(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
                 / (len(ta.toks) + len(tb.toks)
                    - len(list_intersect(ta.toks, tb.toks))), 3) >= 0.5
         ), edges AS (
           SELECT doc_a AS src, doc_b AS dst FROM strong
           UNION
           SELECT doc_b, doc_a FROM strong
         ), reach AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
         )
         SELECT src AS doc_id,
                least(src, MIN(dst)) AS canonical_id
         FROM reach GROUP BY src""",
    // contamination: corpus docs sharing any word trigram with the
    // doc_id%20==0 benchmark slice (same shingle family as q31/q61)
    "q62_contamination" ->
      """WITH tk AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents
         ), sh AS (
           SELECT doc_id,
                  CASE WHEN len(tk) >= 3 THEN
                    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                   for i in range(1, len(tk) - 1)])
                  ELSE [array_to_string(tk, ' ')] END AS sh
           FROM tk
         ), ex AS (
           SELECT doc_id, unnest(sh) AS s FROM sh
         ), bench AS (
           SELECT DISTINCT s FROM ex WHERE doc_id % 20 = 0
         )
         SELECT e.doc_id, CAST(COUNT(DISTINCT e.s) AS BIGINT) AS n_shared
         FROM ex e JOIN bench b ON e.s = b.s
         WHERE e.doc_id % 20 <> 0
         GROUP BY e.doc_id""",
    // deterministic md5-threshold sampling to the smallest language's
    // count; equal-length lowercase-hex compare == top-32-bit compare
    "q63_source_mix" ->
      """WITH counts AS (
           SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang
         ), thr AS (
           SELECT lang,
                  printf('%08x', CAST(floor(
                    CAST((SELECT MIN(cnt) FROM counts) AS DOUBLE)
                      / CAST(cnt AS DOUBLE) * 4294967295.0) AS BIGINT))
                    AS thr
           FROM counts
         )
         SELECT d.doc_id, d.lang
         FROM documents d JOIN thr USING (lang)
         WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <= thr.thr""",
    // deterministic contact-line injection, then regex redaction —
    // patterns are RE2-safe and behave identically in both engines
    "q64_pii_scrub" ->
      """WITH raw AS (
           SELECT doc_id,
                  text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@mail.example tel '
                       || CAST(doc_id * 37 + 10000000 AS VARCHAR) AS raw
           FROM documents
         )
         SELECT doc_id,
                CAST(len(regexp_extract_all(raw,
                  '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT)
                  AS n_emails,
                CAST(len(regexp_extract_all(raw, '[0-9]{7,}')) AS BIGINT)
                  AS n_numbers,
                regexp_replace(regexp_replace(raw,
                  '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                  '[0-9]{7,}', '<NUM>', 'g') AS clean_text
         FROM raw""",
    // 64-token windows, 16-token overlap (step 48); list slice is
    // end-inclusive in DuckDB, so [start+1 : start+64] is 64 tokens
    "q65_chunking" ->
      """WITH tk AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents WHERE text IS NOT NULL
         ), n AS (
           SELECT doc_id, tk,
                  GREATEST(1, CAST(ceil((len(tk) - 16) / 48.0) AS BIGINT))
                    AS n_chunks
           FROM tk
         ), c AS (
           SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_id, tk FROM n
         )
         SELECT doc_id, chunk_id,
                array_to_string(tk[chunk_id*48 + 1 : chunk_id*48 + 64], ' ')
                  AS chunk_text,
                CAST(len(string_split(
                  array_to_string(tk[chunk_id*48 + 1 : chunk_id*48 + 64],
                                  ' '), ' ')) AS BIGINT) AS n_tokens
         FROM c""",
    // concat-then-chunk packing: exclusive running token sum per lang
    // in doc_id order; integer window sum is exact (HUGEINT → BIGINT)
    "q66_seq_packing" ->
      """WITH t AS (
           SELECT doc_id, lang,
                  CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                    AS BIGINT) AS n_tokens
           FROM documents WHERE text IS NOT NULL
         ), r AS (
           SELECT doc_id, lang, n_tokens,
                  CAST(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS tok_offset
           FROM t
         )
         SELECT doc_id, lang, n_tokens, tok_offset,
                tok_offset // 2048 AS bin_first,
                (tok_offset + n_tokens - 1) // 2048 AS bin_last
         FROM r""",
    // tokens in > 50% of docs are corpus boilerplate; hot set is a
    // broadcastable list, membership via list_contains
    "q67_boilerplate" ->
      """WITH base AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents WHERE text IS NOT NULL
         ), d AS (
           SELECT doc_id, unnest(list_distinct(tk)) AS tok FROM base
         ), dfq AS (
           SELECT tok, COUNT(*) AS df FROM d GROUP BY tok
         ), n AS (SELECT COUNT(*) AS n_docs FROM base),
         hot AS (
           SELECT COALESCE(list(tok), []) AS hotl
           FROM dfq, n WHERE df > n_docs * 0.5
         )
         SELECT doc_id,
                COALESCE(array_to_string(
                  list_filter(tk, t -> NOT list_contains(hotl, t)), ' '), '')
                  AS clean_text,
                CAST(len(tk) - len(
                  list_filter(tk, t -> NOT list_contains(hotl, t)))
                  AS BIGINT) AS n_removed
         FROM base, hot""",
    // md5-keyed permutation — reproducible global shuffle order
    "q68_shuffle_order" ->
      """SELECT doc_id,
                md5(CAST(doc_id AS VARCHAR)) AS h,
                CAST(row_number() OVER (
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                  AS BIGINT) AS shuffle_pos
         FROM documents""",
    // hash-split on md5 hex prefix: 'e666'/'f333' ≈ 0.9/0.95 of 16^4
    "q69_split" ->
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
                CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'e666' THEN 'train'
                     WHEN md5(CAST(doc_id AS VARCHAR)) < 'f333' THEN 'val'
                     ELSE 'test' END AS split
         FROM documents""",
    "q70_domain_cap" ->
      """SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS cap_key
         FROM documents
         QUALIFY row_number() OVER (PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 8""",
    // sqrt is IEEE-correctly-rounded in every engine; the weight is
    // fixed as an integer and the share is integer round-half-up
    "q71_mix_weights" ->
      """WITH c AS (
           SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(floor(sqrt(COUNT(*)) * 1e6) AS BIGINT) AS w_fixed
           FROM documents GROUP BY lang, source
         ), t AS (SELECT CAST(SUM(w_fixed) AS BIGINT) AS w_total FROM c)
         SELECT lang, source, n_docs, w_fixed,
                (w_fixed * 1000000 * 2 + w_total) // (2 * w_total)
                  AS share_ppm
         FROM c, t""",
    "q72_user_seq" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                array_to_string(
                  (list(event_type ORDER BY ts, event_id))[1:50], ' ')
                  AS seq
         FROM events GROUP BY user_id""",
    "q73_snap_diff" ->
      """WITH o AS (
           SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
         ), a AS (
           SELECT o_orderkey AS k, o_orderstatus AS a_st,
                  o_orderpriority AS a_pr
           FROM o WHERE o_orderkey % 97 <> 0
         ), b AS (
           SELECT o_orderkey AS k, o_orderstatus AS b_st,
                  CASE WHEN o_orderkey % 31 = 0 THEN 'X-' || o_orderpriority
                       ELSE o_orderpriority END AS b_pr
           FROM o WHERE o_orderkey % 89 <> 0
         ), j AS (
           SELECT COALESCE(a.k, b.k) AS o_orderkey,
                  CASE WHEN a.k IS NULL THEN 'added'
                       WHEN b.k IS NULL THEN 'removed'
                       WHEN a_st <> b_st OR a_pr <> b_pr THEN 'changed'
                  END AS change_type
           FROM a FULL OUTER JOIN b ON a.k = b.k
         )
         SELECT o_orderkey, change_type FROM j
         WHERE change_type IS NOT NULL""",
    "q74_bigram_cov" ->
      """WITH base AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents WHERE text IS NOT NULL
         ), bgs AS (
           SELECT doc_id,
                  list_transform(range(1, len(tk)),
                    i -> tk[i] || ' ' || tk[i+1]) AS bg
           FROM base
         ), flat AS (SELECT unnest(bg) AS b FROM bgs),
         hotk AS (
           SELECT b, COUNT(*) AS cnt FROM flat GROUP BY b
           ORDER BY cnt DESC, b LIMIT 1000
         ), hot AS (SELECT COALESCE(list(b), []) AS hotbg FROM hotk)
         SELECT doc_id,
                CAST(len(bg) AS BIGINT) AS n_bigrams,
                CAST(len(list_filter(bg, x -> list_contains(hotbg, x)))
                  AS BIGINT) AS n_hot,
                CASE WHEN len(bg) = 0 THEN 0
                     ELSE (CAST(len(list_filter(bg,
                              x -> list_contains(hotbg, x))) AS BIGINT)
                           * 1000 * 2 + len(bg)) // (2 * len(bg))
                END AS cov_ppt
         FROM bgs, hot""",
    // r14 (VERDICT r13 #3): the 12 merge rounds unrolled as
    // MATERIALIZED CTEs — see bpeMergeCtes. Flips the BPE family from
    // no-oracle to full oracle.
    "q76_bpe" -> bpeTrainOracleSql,
    "q106_bpe_encode" -> bpeEncodeOracleSql,
    // the sketch-pruned output is EXACT heavy hitters (> n/64), so the
    // oracle is the plain groupBy it avoids at scale
    "q77_hh" ->
      """WITH base AS (
           SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
           FROM documents WHERE text IS NOT NULL
         ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base)
         SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM base, tot GROUP BY tok, n HAVING COUNT(*) * 64 > n""",
    // quantile_cont = the engine's lo/hi interpolation (q45-validated);
    // ROUND-4 pins the clip comparison cross-engine
    "q78_winsor" ->
      """WITH p AS (
           SELECT l_returnflag,
                  ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95
           FROM lineitem GROUP BY l_returnflag
         )
         SELECT l_orderkey, l_linenumber, l.l_returnflag,
                ROUND(LEAST(l_extendedprice, p95), 4) AS price_w,
                l_extendedprice > p95 AS clipped
         FROM lineitem l JOIN p USING (l_returnflag)""",
    // 4-h gap sessionization; order pinned by (ts, event_id), gap math
    // in integer µs, SUM(int) cast (DuckDB returns HUGEINT)
    "q79_sessions" ->
      """WITH e AS (
           SELECT user_id, ts, epoch_us(ts) AS us,
                  CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id)
                         > 14400000000
                       OR lag(epoch_us(ts)) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) IS NULL
                       THEN 1 ELSE 0 END AS new_s,
                  event_id
           FROM events
         ), s AS (
           SELECT user_id, ts, us,
                  CAST(SUM(new_s) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS session_id
           FROM e
         )
         SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                MIN(ts) AS session_start, MAX(ts) AS session_end,
                (MAX(us) - MIN(us)) // 1000000 AS duration_sec
         FROM s GROUP BY user_id, session_id""",
    // ordered-step funnel: each step's min ts strictly after the prior
    // step's; per-step converted-user counts
    "q80_funnel" ->
      """WITH s1 AS (
           SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY 1
         ), s2 AS (
           SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
         ), s3 AS (
           SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
         )
         SELECT 1 AS step_ord, 'signup' AS step,
                CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
         UNION ALL
         SELECT 2, 'click_after_signup',
                CAST((SELECT count(*) FROM s2) AS BIGINT)
         UNION ALL
         SELECT 3, 'purchase_after_click',
                CAST((SELECT count(*) FROM s3) AS BIGINT)""",
    // cohort = first-seen ISO week; offset in whole weeks
    "q81_retention" ->
      """WITH f AS (
           SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE)
                    AS cohort_week
           FROM events GROUP BY 1
         ), act AS (
           SELECT DISTINCT f.cohort_week,
                  CAST(datediff('day', f.cohort_week,
                    CAST(date_trunc('week', e.ts) AS DATE)) // 7
                    AS BIGINT) AS week_offset,
                  e.user_id
           FROM events e JOIN f USING (user_id)
         )
         SELECT cohort_week, week_offset,
                CAST(count(*) AS BIGINT) AS n_users
         FROM act GROUP BY 1, 2""",
    // per-language token-budget fill in md5 order; exclusive prefix sum
    "q82_token_budget" ->
      """WITH t AS (
           SELECT doc_id, lang,
                  CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                       AS BIGINT) AS n_tokens,
                  md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents
         ), c AS (
           SELECT doc_id, lang, n_tokens,
                  COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY lang
                    ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS tokens_before
           FROM t
         )
         SELECT doc_id, lang, n_tokens, tokens_before
         FROM c WHERE tokens_before < 2500""",
    // robust z outliers: exact median/MAD, integer fixed-point boundary
    "q83_outliers" ->
      """WITH med AS (
           SELECT event_type, quantile_cont(value, 0.5) AS med
           FROM events GROUP BY 1
         ), devs AS (
           SELECT e.event_type, e.event_id, e.value, m.med,
                  abs(e.value - m.med) AS dev
           FROM events e JOIN med m USING (event_type)
         ), mad AS (
           SELECT event_type, quantile_cont(dev, 0.5) AS mad
           FROM devs GROUP BY 1
         )
         SELECT d.event_type, d.event_id, d.value,
                ROUND(d.med, 4) AS med, ROUND(m.mad, 4) AS mad
         FROM devs d JOIN mad m USING (event_type)
         WHERE CAST(ROUND(d.dev * 10000) AS BIGINT) * 6745
             > CAST(ROUND(m.mad * 10000) AS BIGINT) * 35000""",
    // cross-corpus near-dup: md5-MinHash bands train ⋈ eval, exact
    // verify, best match per train doc (ppt score, eval-id tie-break)
    "q84_neardup_contam" ->
      """WITH train AS (
           SELECT doc_id, text FROM documents
         ), eval AS (
           SELECT doc_id + 1000000 AS doc_id,
                  substr(text, strpos(text, ' ') + 1) AS text
           FROM documents WHERE doc_id % 10 = 0
         ), corpus AS (
           SELECT 't' AS side, doc_id, text FROM train
           UNION ALL
           SELECT 'e', doc_id, text FROM eval
         ), base AS (
           SELECT side, doc_id,
                  string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM corpus
         ), sh AS (
           SELECT side, doc_id, list_distinct(tk) AS toks,
                  CASE WHEN len(tk) >= 3 THEN
                    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                   for i in range(1, len(tk) - 1)])
                  ELSE [array_to_string(tk, ' ')] END AS sh
           FROM base
         ), sigs AS (
           SELECT side, doc_id, toks,
                  list_min(list_transform(sh, x -> md5('0|' || x))) AS m0,
                  list_min(list_transform(sh, x -> md5('1|' || x))) AS m1,
                  list_min(list_transform(sh, x -> md5('2|' || x))) AS m2,
                  list_min(list_transform(sh, x -> md5('3|' || x))) AS m3,
                  list_min(list_transform(sh, x -> md5('4|' || x))) AS m4,
                  list_min(list_transform(sh, x -> md5('5|' || x))) AS m5,
                  list_min(list_transform(sh, x -> md5('6|' || x))) AS m6,
                  list_min(list_transform(sh, x -> md5('7|' || x))) AS m7
           FROM sh
         ), banded AS (
           SELECT side, doc_id,
                  unnest([0, 1, 2, 3]) AS band_id,
                  unnest([m0 || ',' || m1, m2 || ',' || m3,
                          m4 || ',' || m5, m6 || ',' || m7]) AS band_key
           FROM sigs
         ), pairs AS (
           SELECT DISTINCT a.doc_id AS train_doc, b.doc_id AS eval_doc
           FROM banded a JOIN banded b
             ON a.band_id = b.band_id AND a.band_key = b.band_key
           WHERE a.side = 't' AND b.side = 'e'
         ), iv AS (
           SELECT p.train_doc, p.eval_doc,
                  len(list_intersect(ta.toks, tb.toks)) AS inter,
                  len(ta.toks) AS na, len(tb.toks) AS nb
           FROM pairs p
           JOIN sh ta ON ta.side = 't' AND ta.doc_id = p.train_doc
           JOIN sh tb ON tb.side = 'e' AND tb.doc_id = p.eval_doc
         ), scored AS (
           SELECT train_doc, eval_doc,
                  (inter * 2000 + (na + nb - inter))
                    // (2 * (na + nb - inter)) AS jac_ppt
           FROM iv
         ), best AS (
           SELECT train_doc, eval_doc, jac_ppt,
                  row_number() OVER (PARTITION BY train_doc
                    ORDER BY jac_ppt DESC, eval_doc) AS rn
           FROM scored WHERE jac_ppt >= 500
         )
         SELECT train_doc, eval_doc, jac_ppt / 1000.0 AS jaccard
         FROM best WHERE rn = 1""",
    // bloom-prefiltered join ≡ the plain inner join by definition
    // (false positives die at the exact join)
    "q85_bloom_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, o_custkey,
                o_totalprice
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000""",
    // salted join ≡ the plain inner join by definition (the salt must
    // agree, so matched rows join exactly once)
    "q86_salted_join" ->
      """SELECT l_orderkey, l_linenumber, p_partkey, p_brand
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size <= 10""",
    // two-stage quantized ANN: the shortlist cut is a CENTERED integer
    // code dot (64·Σqn − Σq·Σn — exact BIGINT in both engines), so the
    // whole pipeline, re-rank included, is deterministic and
    // hash-checkable
    "q87_quantized_ann" ->
      """WITH e AS (
           SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
           FROM embeddings
         ), b AS (
           SELECT vec_id, emb, list_min(emb) AS lo, list_max(emb) AS hi
           FROM e
         ), c AS (
           SELECT vec_id, emb,
                  list_transform(emb, x ->
                    CAST(floor((x - lo) * 254 / (hi - lo) + 0.5) AS BIGINT)
                      - 127) AS codes
           FROM b
         ), pairs AS (
           SELECT q.vec_id AS qid, n.vec_id AS nid,
                  q.codes AS qc, n.codes AS nc
           FROM c q, c n WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id
         ), un AS (
           SELECT qid, nid, unnest(qc) AS cx, unnest(nc) AS cy FROM pairs
         ), scores AS (
           SELECT qid, nid,
                  64 * CAST(SUM(cx * cy) AS BIGINT)
                    - CAST(SUM(cx) AS BIGINT) * CAST(SUM(cy) AS BIGINT)
                    AS score
           FROM un GROUP BY qid, nid
         ), short AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (PARTITION BY qid
               ORDER BY score DESC, nid) AS srn
             FROM scores) WHERE srn <= 20
         ), sun AS (
           SELECT s.qid, s.nid,
                  CAST(unnest(eq.emb) AS DOUBLE) AS x,
                  CAST(unnest(en.emb) AS DOUBLE) AS y
           FROM short s
           JOIN e eq ON eq.vec_id = s.qid
           JOIN e en ON en.vec_id = s.nid
         ), resc AS (
           SELECT qid, nid,
                  ROUND(SUM(x*y) / (sqrt(SUM(x*x)) * sqrt(SUM(y*y))), 4)
                    AS cos_sim
           FROM sun GROUP BY qid, nid
         ), ranked AS (
           SELECT qid, nid, cos_sim,
                  CAST(row_number() OVER (PARTITION BY qid
                    ORDER BY cos_sim DESC, nid) AS BIGINT) AS rank
           FROM resc
         )
         SELECT qid, nid, cos_sim, rank FROM ranked WHERE rank <= 5""",
    // duplicated-span scrub: keep the first corpus-wide occurrence of
    // each exact 32-token span, reassemble docs from survivors
    "q88_span_scrub" ->
      """WITH tk AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents WHERE text IS NOT NULL
         ), n AS (
           SELECT doc_id, tk,
                  GREATEST(1, CAST(ceil(len(tk) / 32.0) AS BIGINT))
                    AS n_spans
           FROM tk
         ), sp AS (
           SELECT doc_id, unnest(range(0, n_spans)) AS span_ix, tk FROM n
         ), spans AS (
           SELECT doc_id, span_ix,
                  array_to_string(tk[span_ix*32 + 1 : span_ix*32 + 32], ' ')
                    AS span_text
           FROM sp
         ), ranked AS (
           SELECT doc_id, span_ix, span_text,
                  row_number() OVER (PARTITION BY md5(span_text)
                    ORDER BY doc_id, span_ix) AS rn
           FROM spans
         )
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans_kept,
                string_agg(span_text, ' ' ORDER BY span_ix)
                  AS scrubbed_text
         FROM ranked WHERE rn = 1
         GROUP BY doc_id""",
    // interval join: DuckDB's native inequality join computes the same
    // containment matches the bucketed equi-join produces
    "q89_interval_join" ->
      """WITH top AS (
           SELECT event_id, ts,
                  row_number() OVER (ORDER BY value DESC, event_id) AS rn
           FROM events WHERE event_type = 'purchase'
         ), w AS (
           SELECT event_id AS window_id,
                  epoch_us(ts) - 7200000000 AS lo,
                  epoch_us(ts) + 7200000000 AS hi
           FROM top WHERE rn <= 20
         )
         SELECT w.window_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
         FROM w JOIN events e ON epoch_us(e.ts) BETWEEN w.lo AND w.hi
         GROUP BY w.window_id""",
    // the k=4 funnel: same nested conditional-min chain as q80, one
    // step longer
    "q90_funnel4" ->
      """WITH s1 AS (
           SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY 1
         ), s2 AS (
           SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1
         ), s3 AS (
           SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s2.t2 GROUP BY 1
         ), s4 AS (
           SELECT e.user_id, min(e.ts) AS t4
           FROM events e JOIN s3 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s3.t3 GROUP BY 1
         )
         SELECT 1 AS step_ord, 'signup' AS step,
                CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
         UNION ALL
         SELECT 2, 'view_after_signup',
                CAST((SELECT count(*) FROM s2) AS BIGINT)
         UNION ALL
         SELECT 3, 'click_after_view',
                CAST((SELECT count(*) FROM s3) AS BIGINT)
         UNION ALL
         SELECT 4, 'purchase_after_click',
                CAST((SELECT count(*) FROM s4) AS BIGINT)""",
    // fuzzy join: the oracle is the naive n² inequality join the
    // delete-1 blocking exists to avoid — same output by construction
    "q91_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                a.c_name AS name_a, b.c_name AS name_b,
                CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
         FROM customer a JOIN customer b
           ON a.c_custkey < b.c_custkey
          AND levenshtein(a.c_name, b.c_name) <= 1""",
    // SCD2: the same lag/sum/lead gaps-and-islands chain; lag IS
    // DISTINCT FROM curr is DuckDB's null-safe spelling of Spark's <=>
    "q92_scd2" ->
      """WITH marked AS (
           SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
                  CASE WHEN lag(o_orderpriority) OVER w
                            IS DISTINCT FROM o_orderpriority
                       THEN 1 ELSE 0 END AS chg
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey)
         ), runs AS (
           SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS run_id
           FROM marked
         ), collapsed AS (
           SELECT o_custkey AS custkey, run_id,
                  min(o_orderpriority) AS priority,
                  min(o_orderdate) AS valid_from,
                  CAST(count(*) AS BIGINT) AS n_orders
           FROM runs GROUP BY custkey, run_id
         )
         SELECT custkey, priority, valid_from,
                lead(valid_from) OVER w2 AS valid_to,
                (lead(valid_from) OVER w2 IS NULL) AS is_current, n_orders
         FROM collapsed
         WINDOW w2 AS (PARTITION BY custkey ORDER BY run_id)""",
    // correlation matrix: identical HUGEINT moments (corr is
    // scale-invariant, values ×10⁴ are exact integers), identical
    // double expression tree, ROUND last
    "q93_corr_matrix" ->
      """WITH s AS (
           SELECT CAST(CAST(l_quantity AS DECIMAL(18,4))*10000 AS HUGEINT) AS x0,
                  CAST(CAST(l_extendedprice AS DECIMAL(18,4))*10000 AS HUGEINT) AS x1,
                  CAST(CAST(l_discount AS DECIMAL(18,4))*10000 AS HUGEINT) AS x2,
                  CAST(CAST(l_tax AS DECIMAL(18,4))*10000 AS HUGEINT) AS x3
           FROM lineitem
         ), m AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
                  CAST(SUM(x0) AS DOUBLE) AS s0, CAST(SUM(x1) AS DOUBLE) AS s1,
                  CAST(SUM(x2) AS DOUBLE) AS s2, CAST(SUM(x3) AS DOUBLE) AS s3,
                  CAST(SUM(x0*x0) AS DOUBLE) AS s00, CAST(SUM(x0*x1) AS DOUBLE) AS s01,
                  CAST(SUM(x0*x2) AS DOUBLE) AS s02, CAST(SUM(x0*x3) AS DOUBLE) AS s03,
                  CAST(SUM(x1*x1) AS DOUBLE) AS s11, CAST(SUM(x1*x2) AS DOUBLE) AS s12,
                  CAST(SUM(x1*x3) AS DOUBLE) AS s13, CAST(SUM(x2*x2) AS DOUBLE) AS s22,
                  CAST(SUM(x2*x3) AS DOUBLE) AS s23, CAST(SUM(x3*x3) AS DOUBLE) AS s33
           FROM s
         )
         SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
                ROUND((n*s01 - s0*s1) / (sqrt(n*s00 - s0*s0) * sqrt(n*s11 - s1*s1)), 4) AS corr FROM m
         UNION ALL
         SELECT 'l_quantity', 'l_discount',
                ROUND((n*s02 - s0*s2) / (sqrt(n*s00 - s0*s0) * sqrt(n*s22 - s2*s2)), 4) FROM m
         UNION ALL
         SELECT 'l_quantity', 'l_tax',
                ROUND((n*s03 - s0*s3) / (sqrt(n*s00 - s0*s0) * sqrt(n*s33 - s3*s3)), 4) FROM m
         UNION ALL
         SELECT 'l_extendedprice', 'l_discount',
                ROUND((n*s12 - s1*s2) / (sqrt(n*s11 - s1*s1) * sqrt(n*s22 - s2*s2)), 4) FROM m
         UNION ALL
         SELECT 'l_extendedprice', 'l_tax',
                ROUND((n*s13 - s1*s3) / (sqrt(n*s11 - s1*s1) * sqrt(n*s33 - s3*s3)), 4) FROM m
         UNION ALL
         SELECT 'l_discount', 'l_tax',
                ROUND((n*s23 - s2*s3) / (sqrt(n*s22 - s2*s2) * sqrt(n*s33 - s3*s3)), 4) FROM m""",
    // RANGE frame over event-time µs; DECIMAL sums so the segment-tree
    // and frame-slide accumulations agree exactly; output as e4 longs
    // (never DECIMAL — driver hashes DECIMAL differently per engine)
    "q94_sliding_window" ->
      """SELECT event_id, user_id,
                CAST(count(*) OVER w AS BIGINT) AS n_hour,
                CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w * 10000
                     AS BIGINT) AS sum_hour_e4
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
    // expectation suite: integer-ppm metrics, floor division in both
    // engines; referential via EXISTS = the semi-join
    "q95_dq_report" ->
      """WITH m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(count(o_custkey) AS BIGINT) AS m_comp,
                  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS m_uniq,
                  CAST(count(*) FILTER (WHERE o_totalprice > 0) AS BIGINT)
                    AS m_range,
                  CAST(count(*) FILTER (WHERE o_orderstatus IN
                    ('O','F','P')) AS BIGINT) AS m_dom
           FROM orders
         ), r AS (
           SELECT CAST(count(*) AS BIGINT) AS m_ref FROM orders o
           WHERE EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey)
         )
         SELECT 'completeness_o_custkey' AS check_name,
                CAST((m_comp * 1000000) // n AS BIGINT) AS metric_ppm,
                m_comp = n AS pass FROM m, r
         UNION ALL SELECT 'uniqueness_o_orderkey',
                CAST((m_uniq * 1000000) // n AS BIGINT), m_uniq = n FROM m, r
         UNION ALL SELECT 'range_o_totalprice_positive',
                CAST((m_range * 1000000) // n AS BIGINT), m_range = n FROM m, r
         UNION ALL SELECT 'domain_o_orderstatus',
                CAST((m_dom * 1000000) // n AS BIGINT), m_dom = n FROM m, r
         UNION ALL SELECT 'referential_o_custkey',
                CAST((m_ref * 1000000) // n AS BIGINT), m_ref = n FROM m, r""",
    // exact set-similarity join: the oracle is the naive n²
    // list-intersect join the prefix filter exists to avoid; same
    // shingle construction as q31's oracle
    "q96_setsim_join" ->
      """WITH base AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents WHERE text IS NOT NULL
         ), sh AS (
           SELECT doc_id,
                  CASE WHEN len(tk) >= 3 THEN
                    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                   for i in range(1, len(tk) - 1)])
                  ELSE [array_to_string(tk, ' ')] END AS s
           FROM base
         )
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
                CAST(len(a.s) AS BIGINT) AS size_a,
                CAST(len(b.s) AS BIGINT) AS size_b
         FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         WHERE len(a.s) > 0 AND len(b.s) > 0
           AND 3 * len(list_intersect(a.s, b.s)) >= len(a.s) + len(b.s)""",
    // incremental maintenance oracle = the FULL recompute the merge
    // must equal; money in 4-decimal fixed-point longs, avg by integer
    // round-half-up
    "q97_incr_agg" ->
      """WITH a AS (
           SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_orders,
                  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                    AS BIGINT)) AS BIGINT) AS total_i
           FROM orders GROUP BY 1
         )
         SELECT custkey, n_orders, total_i,
                CAST((2 * total_i + n_orders) // (2 * n_orders) AS BIGINT)
                  AS avg_i
         FROM a""",
    // point-in-time join: interval containment against the SCD2
    // version table (empty same-instant intervals can never match)
    "q98_pit_join" ->
      """WITH marked AS (
           SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
                  CASE WHEN lag(o_orderpriority) OVER w
                            IS DISTINCT FROM o_orderpriority
                       THEN 1 ELSE 0 END AS chg
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey)
         ), runs AS (
           SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS run_id
           FROM marked
         ), collapsed AS (
           SELECT o_custkey AS custkey, run_id,
                  min(o_orderpriority) AS priority,
                  min(o_orderdate) AS valid_from
           FROM runs GROUP BY custkey, run_id
         ), vers AS (
           SELECT custkey, priority, valid_from,
                  lead(valid_from) OVER w2 AS valid_to
           FROM collapsed
           WINDOW w2 AS (PARTITION BY custkey ORDER BY run_id)
         )
         SELECT l.l_orderkey, l.l_linenumber, o.o_custkey AS custkey,
                v.priority AS priority_at_ship
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         LEFT JOIN vers v ON v.custkey = o.o_custkey
           AND v.valid_from <= l.l_shipdate
           AND (v.valid_to IS NULL OR l.l_shipdate < v.valid_to)""",
    // dense daily spine per user; gap days n=0/null value; LOCF carries
    // the last active day's DECIMAL sum (IGNORE NULLS = Spark's
    // last(_, ignoreNulls) over the same running frame); output as e4
    // longs (never DECIMAL — driver hashes DECIMAL per-engine)
    "q99_gap_fill" ->
      """WITH daily AS (
           SELECT user_id, CAST(ts AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS n_events,
                  CAST(SUM(CAST(value AS DECIMAL(18,4)))
                       AS DECIMAL(18,4)) AS day_value
           FROM events GROUP BY 1, 2
         ), bounds AS (
           SELECT user_id, min(day) AS d0, max(day) AS d1
           FROM daily GROUP BY 1
         ), spine AS (
           SELECT b.user_id, CAST(g.d AS DATE) AS day
           FROM bounds b,
                unnest(generate_series(CAST(b.d0 AS TIMESTAMP),
                  CAST(b.d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS g(d)
         )
         SELECT s.user_id, s.day,
                COALESCE(d.n_events, 0) AS n_events,
                CAST(d.day_value * 10000 AS BIGINT) AS day_value_e4,
                CAST(last_value(d.day_value IGNORE NULLS) OVER (
                  PARTITION BY s.user_id ORDER BY s.day
                  ROWS UNBOUNDED PRECEDING) * 10000 AS BIGINT)
                  AS filled_value_e4
         FROM spine s LEFT JOIN daily d
           ON s.user_id = d.user_id AND s.day = d.day""",
    // explicit non-hierarchical set list; GROUPING bit order matches
    // Spark's grouping_id() (bit i set = column i aggregated away)
    "q100_grouping_sets" ->
      """SELECT lang, source,
                CAST(GROUPING(lang, source) AS BIGINT) AS gid,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS total_chars
         FROM documents
         GROUP BY GROUPING SETS ((lang, source), (source), ())""",
    // Morton curve in pure integer math: 16-bit affine scale then the
    // mask-cascade bit spread (masks 0x00FF00FF / 0x0F0F0F0F /
    // 0x33333333 / 0x55555555), a on even bits, b on odd
    "q101_zorder" ->
      """WITH b AS (
           SELECT min(o_custkey) AS amn, max(o_custkey) AS amx,
                  min(date_diff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE))) AS bmn,
                  max(date_diff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE))) AS bmx
           FROM orders
         ), s AS (
           SELECT o_orderkey,
                  CASE WHEN amx = amn THEN 0
                       ELSE ((o_custkey - amn) * 65535) // (amx - amn)
                  END AS xa,
                  CASE WHEN bmx = bmn THEN 0
                       ELSE ((date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) - bmn) * 65535)
                            // (bmx - bmn)
                  END AS xb
           FROM orders, b
         ), t1 AS (
           SELECT o_orderkey, (xa | (xa << 8)) & 16711935 AS xa,
                  (xb | (xb << 8)) & 16711935 AS xb FROM s
         ), t2 AS (
           SELECT o_orderkey, (xa | (xa << 4)) & 252645135 AS xa,
                  (xb | (xb << 4)) & 252645135 AS xb FROM t1
         ), t3 AS (
           SELECT o_orderkey, (xa | (xa << 2)) & 858993459 AS xa,
                  (xb | (xb << 2)) & 858993459 AS xb FROM t2
         ), t4 AS (
           SELECT o_orderkey, (xa | (xa << 1)) & 1431655765 AS xa,
                  (xb | (xb << 1)) & 1431655765 AS xb FROM t3
         )
         SELECT o_orderkey, CAST(xa | (xb << 1) AS BIGINT) AS zval
         FROM t4""",
    // incremental refresh oracle = the FULL history recompute it must
    // equal (the q92 chain, minus run row counts)
    "q102_incr_scd2" ->
      """WITH marked AS (
           SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
                  CASE WHEN lag(o_orderpriority) OVER w
                            IS DISTINCT FROM o_orderpriority
                       THEN 1 ELSE 0 END AS chg
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey)
         ), runs AS (
           SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS run_id
           FROM marked
         ), collapsed AS (
           SELECT o_custkey AS custkey, run_id,
                  min(o_orderpriority) AS priority,
                  min(o_orderdate) AS valid_from
           FROM runs GROUP BY custkey, run_id
         )
         SELECT custkey, priority, valid_from,
                lead(valid_from) OVER w2 AS valid_to,
                (lead(valid_from) OVER w2 IS NULL) AS is_current
         FROM collapsed
         WINDOW w2 AS (PARTITION BY custkey ORDER BY run_id)""",
    // PMI ratio in round-half-up fixed-point (HUGEINT = the DECIMAL(38,0)
    // Spark side); ln is monotone so ratio order IS PMI order
    "q103_pmi" ->
      """WITH tk AS (
           SELECT string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents WHERE text IS NOT NULL
         ), uni AS (
           SELECT w, count(*) AS c_w
           FROM (SELECT unnest(tk) AS w FROM tk) GROUP BY w
         ), tot AS (
           SELECT CAST(sum(c_w) AS BIGINT) AS n_total FROM uni
         ), bi AS (
           SELECT p[1] AS x, p[2] AS y, count(*) AS n_pair
           FROM (SELECT unnest([[tk[i], tk[i+1]]
                                for i in range(1, len(tk))]) AS p
                 FROM tk WHERE len(tk) >= 2)
           GROUP BY 1, 2
           HAVING count(*) >= 20
         ), sc AS (
           SELECT x, y, n_pair,
                  CAST((CAST(n_pair AS HUGEINT) * n_total * 2000
                        + CAST(ux.c_w AS HUGEINT) * uy.c_w)
                       // (2 * CAST(ux.c_w AS HUGEINT) * uy.c_w)
                       AS BIGINT) AS milli
           FROM bi
           JOIN uni ux ON bi.x = ux.w
           JOIN uni uy ON bi.y = uy.w
           CROSS JOIN tot
         )
         SELECT x, y, CAST(n_pair AS BIGINT) AS n_pair,
                milli / 1000.0 AS score
         FROM sc
         ORDER BY milli DESC, x ASC, y ASC
         LIMIT 50""",
    // blocked postings: per-term doc rank → 64-doc blocks; postings are
    // doc_id:tf runs in doc_id order (engine-exact strings)
    "q104_inverted_index" ->
      """WITH tf AS (
           SELECT term, doc_id, count(*) AS tf
           FROM (SELECT doc_id,
                        unnest(string_split_regex(lower(trim(text)), '\s+'))
                          AS term
                 FROM documents WHERE text IS NOT NULL)
           GROUP BY 1, 2
         ), rk AS (
           SELECT term, doc_id, tf,
                  (row_number() OVER (PARTITION BY term ORDER BY doc_id)
                   - 1) // 64 AS block_id
           FROM tf
         )
         SELECT term, CAST(block_id AS BIGINT) AS block_id,
                CAST(count(*) AS BIGINT) AS n_docs,
                string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)
                  AS postings
         FROM rk GROUP BY term, block_id""",
    // integer fixed-point PageRank: long sums are order-independent, so
    // the 15-iteration recursion is engine-exact (// == Spark div on
    // positives)
    "q105_pagerank" ->
      """WITH RECURSIVE pairs AS (
           SELECT DISTINCT a.l_partkey AS s1, b.l_partkey AS s2
           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey < b.l_partkey
         ), edges AS (
           SELECT s1 AS src, s2 AS dst FROM pairs
           UNION ALL SELECT s2, s1 FROM pairs
         ), deg AS (
           SELECT src, count(*) AS od FROM edges GROUP BY src
         ), n AS (SELECT count(*) AS nn FROM deg),
         it AS (
           SELECT 0 AS i, src AS node, 1000000000000 // nn AS r
           FROM deg, n
           UNION ALL
           SELECT i + 1, e.dst,
                  CAST((15 * (1000000000000 // (SELECT nn FROM n))) // 100
                       + (85 * SUM(r // d.od)) // 100 AS BIGINT)
           FROM it
           JOIN edges e ON it.node = e.src
           JOIN deg d ON it.node = d.src
           WHERE i < 15
           GROUP BY i + 1, e.dst
         )
         SELECT node AS partkey, CAST(r AS BIGINT) AS rank_ppt
         FROM it WHERE i = 15""",
    // per-node triangle counts by direct a<b<c enumeration — the
    // degree-oriented Spark plan provably finds the same triangle set
    "q107_triangles" ->
      """WITH pairs AS (
           SELECT DISTINCT a.l_partkey AS s1, b.l_partkey AS s2
           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey < b.l_partkey
         ), tri AS (
           SELECT p1.s1 AS a, p2.s1 AS b, p2.s2 AS c
           FROM pairs p1
           JOIN pairs p2 ON p1.s2 = p2.s1 AND p1.s1 < p2.s1
           JOIN pairs p3 ON p3.s1 = p1.s1 AND p3.s2 = p2.s2
         )
         SELECT node AS partkey, CAST(count(*) AS BIGINT) AS n_tri
         FROM (SELECT unnest([a, b, c]) AS node FROM tri)
         GROUP BY node""",
    // directional containment: naive n² intersect join over the same
    // corpus ∪ quote-docs derivation (drop the first word, id+1e6)
    "q108_containment" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents WHERE text IS NOT NULL
           UNION ALL
           SELECT doc_id + 1000000, substr(text, strpos(text, ' ') + 1)
           FROM documents WHERE text IS NOT NULL
         ), tk AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM corpus
         ), sh AS (
           SELECT doc_id,
                  CASE WHEN len(tk) >= 3 THEN
                    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                   for i in range(1, len(tk) - 1)])
                  ELSE [array_to_string(tk, ' ')] END AS sh
           FROM tk
         ), pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
                  CAST(len(a.sh) AS BIGINT) AS size_a
           FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
         )
         SELECT id_a, id_b, inter, size_a,
                CAST((inter * 2000 + size_a) // (2 * size_a) AS BIGINT)
                  AS cont_ppt
         FROM pairs WHERE inter * 10 >= size_a * 9""",
    // 80-core by 15 fixed peeling rounds (converged by round 5 at
    // sf0.01, so capped ≡ converged); surviving edges carry the
    // recursion, in-core degree read off the final level
    "q109_kcore" ->
      """WITH RECURSIVE pairs AS (
           SELECT DISTINCT a.l_partkey AS s1, b.l_partkey AS s2
           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey < b.l_partkey
         ), edges AS (
           SELECT s1 AS src, s2 AS dst FROM pairs
           UNION ALL SELECT s2, s1 FROM pairs
         ), it(i, src, dst) AS (
           SELECT 0, src, dst FROM edges
           UNION ALL
           SELECT i + 1, src, dst FROM it
           WHERE i < 15
             AND src IN (SELECT src FROM it
                         GROUP BY src HAVING count(*) >= 80)
             AND dst IN (SELECT src FROM it
                         GROUP BY src HAVING count(*) >= 80)
         )
         SELECT src AS partkey, CAST(count(*) AS BIGINT) AS core_deg
         FROM it WHERE i = 15 GROUP BY src""",
    // min-hop BFS from the 3 highest-degree hubs: the UNION (not UNION
    // ALL) recursion dedups (node, hops) rows, so the working table
    // stays node-scale per level instead of enumerating walks; min()
    // over the ≤8-hop closure equals the visited-set BFS distance
    "q110_bfs_hops" ->
      """WITH RECURSIVE pairs AS (
           SELECT DISTINCT a.l_partkey AS s1, b.l_partkey AS s2
           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey < b.l_partkey
         ), edges AS (
           SELECT s1 AS src, s2 AS dst FROM pairs
           UNION ALL SELECT s2, s1 FROM pairs
         ), seeds AS (
           SELECT src AS node FROM edges
           GROUP BY src ORDER BY count(*) DESC, src LIMIT 3
         ), bfs AS (
           SELECT node, 0 AS hops FROM seeds
           UNION
           SELECT e.dst, b.hops + 1
           FROM bfs b JOIN edges e ON b.node = e.src
           WHERE b.hops < 8
         )
         SELECT node AS partkey, CAST(min(hops) AS BIGINT) AS hops
         FROM bfs GROUP BY node""",
    // add-one-smoothed bigram LM, all-integer round-half-up ppm: per
    // bigram type ppm = (2e6*(c_xy+1) + (c_x+V)) // (2*(c_x+V)), per doc
    // the k-weighted mean of ppms rounded the same way (no ln anywhere —
    // the q58/q103 libm rule)
    "q111_lm_score" ->
      """WITH tk AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents WHERE text IS NOT NULL
         ), db AS (
           SELECT doc_id, p[1] AS x, p[2] AS y, count(*) AS k
           FROM (SELECT doc_id,
                        unnest([[tk[i], tk[i+1]]
                                for i in range(1, len(tk))]) AS p
                 FROM tk WHERE len(tk) >= 2)
           GROUP BY 1, 2, 3
         ), bi AS (
           SELECT x, y, CAST(sum(k) AS BIGINT) AS c_xy
           FROM db GROUP BY 1, 2
         ), ctx AS (
           SELECT x, CAST(sum(c_xy) AS BIGINT) AS c_x FROM bi GROUP BY 1
         ), voc AS (
           SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
           FROM (SELECT unnest(tk) AS w FROM tk)
         ), sc AS (
           SELECT bi.x, bi.y,
                  CAST((2000000 * (CAST(c_xy AS HUGEINT) + 1) + (c_x + v))
                       // (2 * (CAST(c_x AS HUGEINT) + v)) AS BIGINT)
                    AS ppm
           FROM bi JOIN ctx ON bi.x = ctx.x CROSS JOIN voc
         )
         SELECT db.doc_id, CAST(sum(db.k) AS BIGINT) AS n_bigrams,
                CAST((2 * sum(CAST(db.k AS HUGEINT) * sc.ppm) + sum(db.k))
                     // (2 * sum(CAST(db.k AS HUGEINT))) AS BIGINT)
                  AS score_ppm
         FROM db JOIN sc ON db.x = sc.x AND db.y = sc.y
         GROUP BY db.doc_id""",
    "q112_bm25" -> bm25OracleSql,

    // per-user consecutive-event transitions; probability in
    // round-half-up integer ppm over the from-state row total
    "q113_markov" ->
      """WITH pairs AS (
           SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS to_type
           FROM events
         ), t AS (
           SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
           FROM pairs WHERE to_type IS NOT NULL
           GROUP BY 1, 2
         )
         SELECT from_type, to_type, n,
                CAST((2000000 * CAST(n AS HUGEINT)
                      + sum(n) OVER (PARTITION BY from_type))
                     // (2 * sum(n) OVER (PARTITION BY from_type))
                     AS BIGINT) AS p_ppm
         FROM t""",
    // sequential-Poisson draw key h DIV w: h = first 13 md5 hex digits
    // (engine-identical hash family), integer division (non-negative →
    // Spark DIV == DuckDB //); k smallest per lang, ties by doc_id
    "q114_weighted_sample" ->
      """WITH w AS (
           SELECT doc_id, lang,
                  CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                       AS BIGINT) AS weight
           FROM documents WHERE text IS NOT NULL
         ), keyed AS (
           SELECT doc_id, lang, weight,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                        || '|' || '42'), 1, 13)) AS BIGINT)
                    // weight AS sp_key
           FROM w
         ), rk AS (
           SELECT *, row_number() OVER (PARTITION BY lang
                       ORDER BY sp_key, doc_id) AS rn
           FROM keyed
         )
         SELECT doc_id, lang, weight, sp_key FROM rk WHERE rn <= 10""",
    // global 16-quantile equi-depth bin per row: floor((rank-1)*B/n)
    // over the (price, orderkey, linenumber) total order
    "q115_equidepth_bins" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
                CAST(((row_number() OVER (ORDER BY l_extendedprice,
                                          l_orderkey, l_linenumber) - 1)
                      * 16)
                     // (SELECT count(*) FROM lineitem) AS BIGINT) AS bin
         FROM lineitem""",
    // personalized PageRank from the 3 hub seeds: identical integer
    // fixed-point update as q105, teleport UNIONed with contributions
    // (a seed keeps its teleport even with no inbound flow that round)
    "q116_ppr" ->
      """WITH RECURSIVE pairs AS (
           SELECT DISTINCT a.l_partkey AS s1, b.l_partkey AS s2
           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey < b.l_partkey
         ), edges AS (
           SELECT s1 AS src, s2 AS dst FROM pairs
           UNION ALL SELECT s2, s1 FROM pairs
         ), deg AS (
           SELECT src, count(*) AS od FROM edges GROUP BY src
         ), seedtab AS (
           SELECT src AS node FROM edges
           GROUP BY src ORDER BY count(*) DESC, src LIMIT 3
         ), it AS (
           SELECT 0 AS i, node, 1000000000000 // 3 AS r FROM seedtab
           UNION ALL
           SELECT j, node, CAST(SUM(v) AS BIGINT) AS r
           FROM (
             SELECT i + 1 AS j, e.dst AS node,
                    (85 * SUM(it.r // d.od)) // 100 AS v
             FROM it
             JOIN edges e ON it.node = e.src
             JOIN deg d ON it.node = d.src
             WHERE i < 10
             GROUP BY 1, 2
             UNION ALL
             SELECT DISTINCT i + 1, s.node,
                    (15 * (1000000000000 // 3)) // 100
             FROM it CROSS JOIN seedtab s
             WHERE i < 10
           )
           GROUP BY j, node
         )
         SELECT node AS partkey, CAST(r AS BIGINT) AS ppr_ppt
         FROM it WHERE i = 10""",
    // the full 2^k grouping lattice; GROUPING(lang, source) bit order
    // matches Spark's grouping_id()
    "q117_cube" ->
      """SELECT lang, source,
                CAST(GROUPING(lang, source) AS BIGINT) AS gid,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS total_chars
         FROM documents
         GROUP BY CUBE (lang, source)""",
    // the delta-maintained index is DEFINED to equal the full rebuild,
    // so the oracle is q104's full-corpus index verbatim
    "q118_incr_index" ->
      """WITH tf AS (
           SELECT term, doc_id, count(*) AS tf
           FROM (SELECT doc_id,
                        unnest(string_split_regex(lower(trim(text)), '\s+'))
                          AS term
                 FROM documents WHERE text IS NOT NULL)
           GROUP BY 1, 2
         ), rk AS (
           SELECT term, doc_id, tf,
                  (row_number() OVER (PARTITION BY term ORDER BY doc_id)
                   - 1) // 64 AS block_id
           FROM tf
         )
         SELECT term, CAST(block_id AS BIGINT) AS block_id,
                CAST(count(*) AS BIGINT) AS n_docs,
                string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id)
                  AS postings
         FROM rk GROUP BY term, block_id""",
    // per-user mean transition ppm under the q113 model — two-stage
    // round-half-up integer ppm, engine-exact
    "q119_flow_score" ->
      """WITH pairs AS (
           SELECT user_id, event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS to_type
           FROM events
         ), p2 AS (
           SELECT user_id, from_type, to_type FROM pairs
           WHERE to_type IS NOT NULL
         ), t AS (
           SELECT from_type, to_type, count(*) AS n
           FROM p2 GROUP BY 1, 2
         ), m AS (
           SELECT from_type, to_type,
                  CAST((2000000 * CAST(n AS HUGEINT)
                        + sum(n) OVER (PARTITION BY from_type))
                       // (2 * sum(n) OVER (PARTITION BY from_type))
                       AS BIGINT) AS p_ppm
           FROM t
         )
         SELECT p2.user_id, CAST(count(*) AS BIGINT) AS n_transitions,
                CAST((2 * sum(CAST(m.p_ppm AS HUGEINT)) + count(*))
                     // (2 * count(*)) AS BIGINT) AS flow_ppm
         FROM p2 JOIN m ON p2.from_type = m.from_type
                       AND p2.to_type = m.to_type
         GROUP BY p2.user_id""",
    "q122_skyline" ->
      """SELECT p.p_partkey, p.p_size,
                CAST(CAST(p.p_retailprice AS DECIMAL(18,4)) * 10000
                     AS BIGINT) AS price_e4
         FROM part p
         WHERE NOT EXISTS (
           SELECT 1 FROM part q
           WHERE q.p_size >= p.p_size
             AND q.p_retailprice <= p.p_retailprice
             AND (q.p_size > p.p_size
                  OR q.p_retailprice < p.p_retailprice))""",
    "q123_attribution" ->
      """WITH p AS (
           SELECT event_id AS pid, user_id, ts AS pts,
                  CAST(CAST(COALESCE(value, 0) AS DECIMAL(18,4)) * 10000
                       AS BIGINT) AS v
           FROM events WHERE event_type = 'purchase'),
         t AS (
           SELECT event_id AS tid, user_id, ts AS tts,
                  event_type AS channel
           FROM events WHERE event_type IN ('view', 'click')),
         pt AS (
           SELECT p.pid, p.v, t.tid, t.channel, t.tts,
                  row_number() OVER (PARTITION BY p.pid
                    ORDER BY t.tts ASC, t.tid ASC) AS rn_f,
                  row_number() OVER (PARTITION BY p.pid
                    ORDER BY t.tts DESC, t.tid DESC) AS rn_l,
                  COUNT(*) OVER (PARTITION BY p.pid) AS n
           FROM p JOIN t ON p.user_id = t.user_id
            AND t.tts <= p.pts AND t.tts >= p.pts - INTERVAL 7 DAY),
         credits AS (
           SELECT channel, 'linear' AS model, (v*2 + n) // (2*n) AS credit
           FROM pt
           UNION ALL
           SELECT channel, 'first', v FROM pt WHERE rn_f = 1
           UNION ALL
           SELECT channel, 'last', v FROM pt WHERE rn_l = 1
           UNION ALL
           SELECT 'direct', m.model, p.v
           FROM p CROSS JOIN (VALUES ('first'), ('last'), ('linear'))
                AS m(model)
           WHERE NOT EXISTS (SELECT 1 FROM pt WHERE pt.pid = p.pid))
         SELECT channel, model, CAST(SUM(credit) AS BIGINT) AS credit_e4,
                CAST(COUNT(*) AS BIGINT) AS n_credits
         FROM credits GROUP BY channel, model""",
    "q124_source_drift" ->
      """WITH tok AS (
           SELECT d.source, t.term
           FROM (SELECT source,
                        string_split_regex(lower(trim(text)), '\s+') AS toks
                 FROM documents) d,
                LATERAL unnest(d.toks) AS t(term)
           WHERE len(t.term) > 0),
         st AS (SELECT source, term, COUNT(*) AS n_st
                FROM tok GROUP BY 1, 2),
         s AS (SELECT source, SUM(n_st) AS n_s FROM st GROUP BY 1),
         t AS (SELECT term, SUM(n_st) AS n_t FROM st GROUP BY 1),
         c AS (SELECT SUM(n_t) AS n_c FROM t),
         tp AS (SELECT term, (2000000 * n_t + n_c) // (2 * n_c) AS t_ppm
                FROM t, c),
         tot AS (SELECT SUM(t_ppm) AS tot_ppm FROM tp),
         j AS (
           SELECT st.source, s.n_s,
                  (2000000 * st.n_st + s.n_s) // (2 * s.n_s) AS s_ppm,
                  tp.t_ppm
           FROM st JOIN s USING (source) JOIN tp USING (term))
         SELECT j.source, CAST(MAX(j.n_s) AS BIGINT) AS n_tokens,
                CAST(COUNT(*) AS BIGINT) AS n_terms,
                CAST((SUM(ABS(j.s_ppm - j.t_ppm)) + MAX(tot.tot_ppm)
                      - SUM(j.t_ppm)) // 2 AS BIGINT) AS tv_ppm
         FROM j, tot GROUP BY j.source""",
    "q125_item_sim" ->
      """WITH li AS (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
         n AS (SELECT pk, COUNT(*) AS n FROM li GROUP BY 1),
         p AS (SELECT a.pk AS i, b.pk AS j, COUNT(*) AS cij
               FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
               GROUP BY 1, 2),
         sc AS (
           SELECT p.i, p.j, p.cij,
                  (2000000 * p.cij * p.cij + ni.n * nj.n)
                    // (2 * ni.n * nj.n) AS score_ppm
           FROM p JOIN n ni ON p.i = ni.pk JOIN n nj ON p.j = nj.pk),
         r AS (SELECT *, row_number() OVER (PARTITION BY i
                 ORDER BY score_ppm DESC, j ASC) AS rk FROM sc)
         SELECT i, j, CAST(cij AS BIGINT) AS cij,
                CAST(score_ppm AS BIGINT) AS score_ppm
         FROM r WHERE rk <= 5""",
    "q126_label_prop" ->
      """WITH RECURSIVE li AS (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem
         ), pairs AS (
           SELECT a.pk AS s1, b.pk AS s2
           FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING COUNT(*) >= 2
         ), edges AS (
           SELECT s1 AS src, s2 AS dst FROM pairs
           UNION ALL SELECT s2, s1 FROM pairs
         ), nodes AS (SELECT src FROM edges GROUP BY src),
         it AS (
           SELECT 0 AS i, src AS node, src AS lbl FROM nodes
           UNION ALL
           SELECT i, node, lbl FROM (
             SELECT it.i + 1 AS i, e.dst AS node, it.lbl AS lbl,
                    COUNT(*) AS c
             FROM it JOIN edges e ON it.node = e.src
             WHERE it.i < 5
             GROUP BY 1, 2, 3
           ) QUALIFY row_number() OVER (PARTITION BY i, node
               ORDER BY c DESC, lbl ASC) = 1
         )
         SELECT node AS partkey, CAST(lbl AS BIGINT) AS community
         FROM it WHERE i = 5""",
    "q127_convert_latency" ->
      """WITH t1 AS (
           SELECT user_id, MIN(ts) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY 1),
         t2 AS (
           SELECT e.user_id, MIN(e.ts) AS t2
           FROM events e JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = 'click' AND e.ts > t1.t1 GROUP BY 1),
         t3 AS (
           SELECT e.user_id, MIN(e.ts) AS t3
           FROM events e JOIN t2 ON e.user_id = t2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > t2.t2 GROUP BY 1),
         conv AS (
           SELECT t3.user_id,
                  (epoch_us(t3.t3) - epoch_us(t1.t1)) // 1000000 AS lat_s
           FROM t3 JOIN t1 ON t3.user_id = t1.user_id),
         r AS (SELECT lat_s,
                      row_number() OVER (ORDER BY lat_s, user_id) AS rn
               FROM conv),
         n AS (SELECT COUNT(*) AS n FROM conv)
         SELECT CAST(ps.p AS BIGINT) AS p,
                CAST(n.n AS BIGINT) AS n_converted, r.lat_s AS latency_s
         FROM (VALUES (50), (90), (99)) AS ps(p), r, n
         WHERE r.rn = (ps.p * n.n + 99) // 100""",
    "q128_neg_sampling" ->
      """WITH pos AS (
           SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS item
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         np AS (SELECT COUNT(*) AS np FROM part),
         cand AS (
           SELECT c.cust, u.attempt,
                  CAST(('0x' || substr(md5(CAST(c.cust AS VARCHAR) || '|'
                    || CAST(u.attempt AS VARCHAR)), 1, 15)) AS BIGINT)
                    % np.np AS item
           FROM (SELECT DISTINCT cust FROM pos) c, np,
                LATERAL unnest(range(0, 6)) AS u(attempt)),
         neg AS (
           SELECT cand.cust, cand.item, MIN(cand.attempt) AS attempt
           FROM cand ANTI JOIN pos
             ON cand.cust = pos.cust AND cand.item = pos.item
           GROUP BY 1, 2),
         r AS (SELECT *, row_number() OVER (PARTITION BY cust
                 ORDER BY attempt, item) AS rk FROM neg)
         SELECT cust, item, CAST(attempt AS BIGINT) AS attempt
         FROM r WHERE rk <= 2""",
    "q129_peak_concurrency" ->
      """WITH e AS (
           SELECT user_id, ts, event_id, epoch_us(ts) AS us,
                  CASE WHEN epoch_us(ts)
                         - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id)
                         > 14400000000
                       OR lag(epoch_us(ts)) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) IS NULL
                       THEN 1 ELSE 0 END AS new_s
           FROM events
         ), se AS (
           SELECT user_id, us,
                  SUM(new_s) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                    AS session_id
           FROM e
         ), sess AS (
           SELECT user_id, session_id,
                  MIN(us) AS sus, MAX(us) AS eus
           FROM se GROUP BY 1, 2
         ), deltas AS (
           SELECT user_id, session_id, sus AS us, 1 AS delta FROM sess
           UNION ALL
           SELECT user_id, session_id, eus AS us, -1 AS delta FROM sess
         ), run AS (
           SELECT us,
                  CAST(SUM(delta) OVER (ORDER BY us, delta, user_id,
                    session_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
           FROM deltas
         )
         SELECT CAST(make_timestamp(us) AS DATE) AS day,
                MAX(conc) AS peak_concurrent
         FROM run GROUP BY 1""",
    "q130_ols_trend" ->
      """WITH b AS (
           SELECT o_orderpriority AS g,
                  CAST(epoch_us(o_orderdate) // 86400000000
                    AS DECIMAL(19,0)) AS x,
                  CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                    AS DECIMAL(19,0)) AS y
           FROM orders
           WHERE o_orderpriority IS NOT NULL
             AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
         ), m AS (
           SELECT g, CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(x) AS DOUBLE) AS sx,
                  CAST(SUM(y) AS DOUBLE) AS sy,
                  CAST(SUM(x*x) AS DOUBLE) AS sxx,
                  CAST(SUM(x*y) AS DOUBLE) AS sxy,
                  CAST(SUM(y*y) AS DOUBLE) AS syy
           FROM b GROUP BY 1
         )
         SELECT g AS o_orderpriority, CAST(n AS BIGINT) AS n,
                CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 THEN
                  ROUND((n*sxy - sx*sy)/(n*sxx - sx*sx)/10000, 6)
                END AS slope,
                CASE WHEN n >= 2 AND n*sxx - sx*sx > 0 THEN
                  ROUND((sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n
                    /10000, 4)
                END AS intercept,
                CASE WHEN n >= 2 AND n*sxx - sx*sx > 0
                       AND n*syy - sy*sy > 0 THEN
                  ROUND((n*sxy - sx*sy)*(n*sxy - sx*sy)
                    /((n*sxx - sx*sx)*(n*syy - sy*sy)), 6)
                END AS r2
         FROM m""",
    "q131_assoc_rules" ->
      """WITH b AS (
           SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS item
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         ), n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM b),
         c AS (
           SELECT item, CAST(COUNT(*) AS BIGINT) AS cnt FROM b
           GROUP BY 1 HAVING COUNT(*) >= 5
         ), p2 AS (
           SELECT x.item AS ia, y.item AS ib,
                  CAST(COUNT(*) AS BIGINT) AS cab
           FROM b x JOIN b y ON x.ok = y.ok AND x.item < y.item
           JOIN c cx ON cx.item = x.item
           JOIN c cy ON cy.item = y.item
           GROUP BY 1, 2 HAVING COUNT(*) >= 5
         ), dir AS (
           SELECT ia AS antecedent, ib AS consequent, cab FROM p2
           UNION ALL
           SELECT ib AS antecedent, ia AS consequent, cab FROM p2
         ), r AS (
           SELECT d.antecedent, d.consequent, d.cab AS n_pair,
                  (2000*d.cab + ca.cnt) // (2*ca.cnt) AS conf_ppt,
                  (2000000*d.cab*n.n + ca.cnt*cb.cnt)
                    // (2*ca.cnt*cb.cnt) AS lift_ppm
           FROM dir d
           JOIN c ca ON ca.item = d.antecedent
           JOIN c cb ON cb.item = d.consequent
           CROSS JOIN n
         ), rk AS (
           SELECT *, row_number() OVER (ORDER BY lift_ppm DESC,
             antecedent, consequent) AS rk FROM r
         )
         SELECT antecedent, consequent, n_pair, conf_ppt, lift_ppm
         FROM rk WHERE rk <= 20""",
    "q132_ab_test" ->
      """WITH u AS (
           SELECT user_id,
                  MAX(CASE WHEN event_type = 'purchase' AND value > 100
                    THEN 1 ELSE 0 END) AS conv,
                  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                    1, 15)) AS BIGINT) % 2 AS variant
           FROM events GROUP BY user_id
         ), g AS (
           SELECT
             CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END)
               AS BIGINT) AS conv_a,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END)
               AS BIGINT) AS conv_b
           FROM u
         ), z AS (
           SELECT *,
             ((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 - (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
               / sqrt(((CAST(conv_a + conv_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 - (CAST(conv_a + conv_b AS DOUBLE)
                     / CAST(n_a + n_b AS DOUBLE))))
                 * ((1.0 / CAST(n_a AS DOUBLE))
                   + (1.0 / CAST(n_b AS DOUBLE)))) AS z_raw
           FROM g
         )
         SELECT n_a, conv_a, n_b, conv_b,
                (2000 * conv_a + n_a) // (2 * n_a) AS rate_a_ppt,
                (2000 * conv_b + n_b) // (2 * n_b) AS rate_b_ppt,
                CASE WHEN conv_a + conv_b > 0
                       AND conv_a + conv_b < n_a + n_b
                     THEN ROUND(z_raw, 4) END AS z,
                CASE WHEN conv_a + conv_b > 0
                       AND conv_a + conv_b < n_a + n_b
                     THEN ABS(z_raw) > 1.96 END AS significant
         FROM z""",
    "q133_seasonal_anomaly" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(SUM(CAST(value AS DECIMAL(18,4)))
                    AS DECIMAL(18,4)) AS total
           FROM events GROUP BY 1, 2
         ), dailyd AS (
           SELECT *, isodow(day) AS dow FROM daily
         ), st AS (
           SELECT event_type, dow,
                  CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(total) AS DOUBLE) AS sx,
                  CAST(SUM(CAST(total AS DECIMAL(30,4)) * total)
                    AS DOUBLE) AS sxx
           FROM dailyd GROUP BY 1, 2
         ), j AS (
           SELECT d.event_type, d.day,
                  CAST(d.total AS DOUBLE) AS total_d,
                  (CAST(d.total AS DOUBLE) - st.sx / st.n) AS dev,
                  sqrt((st.n * st.sxx - st.sx * st.sx)
                    / (st.n * (st.n - 1.0))) AS std,
                  st.n AS n
           FROM dailyd d JOIN st
             ON d.event_type = st.event_type AND d.dow = st.dow
         )
         SELECT event_type, day, ROUND(total_d, 4) AS total,
                ROUND(dev / std, 4) AS z
         FROM j
         WHERE n >= 5 AND std > 0 AND ABS(dev) > 1.5 * std""",

    "q134_cusum" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(SUM(CAST(value AS DECIMAL(18,4)))
                    AS DECIMAL(18,4)) AS total
           FROM events GROUP BY 1, 2
         ), st AS (
           SELECT event_type,
                  CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(total) AS DOUBLE) AS sx,
                  CAST(SUM(CAST(total AS DECIMAL(30,4)) * total)
                    AS DOUBLE) AS sxx
           FROM daily GROUP BY 1
         ), seq AS (
           SELECT d.event_type, d.day,
                  st.sx / st.n AS mean,
                  sqrt((st.n * st.sxx - st.sx * st.sx)
                    / (st.n * (st.n - 1.0))) AS std,
                  CAST(ROW_NUMBER() OVER (PARTITION BY d.event_type
                    ORDER BY d.day) AS BIGINT) AS rn,
                  CAST(SUM(d.total) OVER (PARTITION BY d.event_type
                    ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS DECIMAL(28,4)) AS cum
           FROM daily d JOIN st ON d.event_type = st.event_type
           WHERE st.n >= 10
         ), p AS (
           SELECT event_type, day, std,
                  CAST(cum AS DOUBLE)
                    - CAST(rn AS DOUBLE) * (mean + 0.25 * std) AS pup,
                  CAST(rn AS DOUBLE) * (mean - 0.25 * std)
                    - CAST(cum AS DOUBLE) AS pdn
           FROM seq WHERE std > 0
         ), sc AS (
           SELECT event_type, day, std,
                  pup - LEAST(0.0, MIN(pup) OVER w) AS s_up,
                  pdn - LEAST(0.0, MIN(pdn) OVER w) AS s_dn
           FROM p
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         )
         SELECT event_type, day,
                CASE WHEN s_up > 2.0 * std THEN 'up'
                     ELSE 'down' END AS direction,
                ROUND(CASE WHEN s_up > 2.0 * std THEN s_up
                           ELSE s_dn END / std, 4) AS stat_sigma
         FROM sc
         WHERE s_up > 2.0 * std OR s_dn > 2.0 * std""",

    "q135_ks_test" ->
      """WITH counts AS (
           SELECT CAST(value AS DECIMAL(18,4)) AS v,
                  CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                  CAST(SUM(CASE WHEN event_type = 'click'
                    THEN 1 ELSE 0 END) AS BIGINT) AS c2
           FROM events
           WHERE event_type IN ('purchase', 'click')
           GROUP BY 1
         ), cum AS (
           SELECT CAST(SUM(c1) OVER w AS HUGEINT) AS f1,
                  CAST(SUM(c2) OVER w AS HUGEINT) AS f2
           FROM counts
           WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)
         ), tot AS (
           SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                  CAST(SUM(c2) AS BIGINT) AS n2
           FROM counts
         ), m AS (
           SELECT n1, n2, MAX(ABS(f1 * n2 - f2 * n1)) AS dmax
           FROM cum, tot GROUP BY n1, n2
         )
         SELECT n1, n2,
                CASE WHEN n1 > 0 AND n2 > 0 THEN
                  CAST((dmax * 2000000 + CAST(n1 AS HUGEINT) * n2)
                    // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT)
                END AS d_ppm,
                CASE WHEN n1 > 0 AND n2 > 0 THEN
                  CAST(dmax AS DOUBLE)
                      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                    > 1.3581 * sqrt((CAST(n1 AS DOUBLE)
                        + CAST(n2 AS DOUBLE))
                      / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
                END AS significant
         FROM m""",

    "q136_winnow_repeats" ->
      """WITH base AS (
           SELECT doc_id, text, length(text) - 29 AS np
           FROM documents
           WHERE text IS NOT NULL AND length(text) >= 37
         ), pos AS (
           SELECT CAST(p AS INT) AS p FROM generate_series(1, 4096) AS g(p)
         ), grams AS (
           SELECT b.doc_id, b.np, pos.p,
                  md5(substr(b.text, pos.p, 30)) AS h
           FROM base b JOIN pos ON pos.p <= b.np
         ), enc AS (
           SELECT doc_id, np, p,
                  h || lpad(CAST(10000000 - p AS VARCHAR), 8, '0') AS enc
           FROM grams
         ), sel0 AS (
           SELECT doc_id, np, p,
                  MIN(enc) OVER (PARTITION BY doc_id ORDER BY p
                    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS mn
           FROM enc
         ), sel AS (
           SELECT DISTINCT doc_id,
                  substr(mn, 1, 32) AS fp,
                  10000000 - CAST(substr(mn, 33, 8) AS INT) AS pos
           FROM sel0 WHERE p <= np - 7
         ), c AS (
           SELECT fp, COUNT(DISTINCT doc_id) AS nd FROM sel GROUP BY 1
         ), per AS (
           SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sel,
                  CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rep
           FROM sel JOIN c USING (fp) GROUP BY 1
         )
         SELECT doc_id, n_sel, n_rep,
                (n_rep * 2000 + n_sel) // (2 * n_sel) AS rep_ppt
         FROM per WHERE n_rep > 0""",

    "q137_skew_profile" ->
      """WITH f1 AS (
           SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS f
           FROM events WHERE user_id IS NOT NULL GROUP BY 1
         ), r1 AS (
           SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f, k) AS BIGINT)
             AS i FROM f1
         ), a1 AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                  CAST(SUM(f) AS BIGINT) AS n_rows,
                  CAST(MAX(f) AS BIGINT) AS max_freq,
                  SUM(CAST(i AS HUGEINT) * f) AS s1
           FROM r1
         ), f2 AS (
           SELECT event_type AS k, CAST(COUNT(*) AS BIGINT) AS f
           FROM events WHERE event_type IS NOT NULL GROUP BY 1
         ), r2 AS (
           SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f, k) AS BIGINT)
             AS i FROM f2
         ), a2 AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                  CAST(SUM(f) AS BIGINT) AS n_rows,
                  CAST(MAX(f) AS BIGINT) AS max_freq,
                  SUM(CAST(i AS HUGEINT) * f) AS s1
           FROM r2
         ), f3 AS (
           SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS f
           FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1
         ), r3 AS (
           SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f, k) AS BIGINT)
             AS i FROM f3
         ), a3 AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                  CAST(SUM(f) AS BIGINT) AS n_rows,
                  CAST(MAX(f) AS BIGINT) AS max_freq,
                  SUM(CAST(i AS HUGEINT) * f) AS s1
           FROM r3
         )
         SELECT 'user_id' AS key_col, n_rows, n_keys, max_freq,
                CAST((CAST(max_freq AS HUGEINT) * 2000000 + n_rows)
                  // (2 * CAST(n_rows AS HUGEINT)) AS BIGINT)
                  AS top_share_ppm,
                CAST(((2 * s1 - (CAST(n_keys AS HUGEINT) + 1) * n_rows)
                    * 2000000 + CAST(n_keys AS HUGEINT) * n_rows)
                  // (2 * CAST(n_keys AS HUGEINT) * n_rows) AS BIGINT)
                  AS gini_ppm
         FROM a1
         UNION ALL
         SELECT 'event_type', n_rows, n_keys, max_freq,
                CAST((CAST(max_freq AS HUGEINT) * 2000000 + n_rows)
                  // (2 * CAST(n_rows AS HUGEINT)) AS BIGINT),
                CAST(((2 * s1 - (CAST(n_keys AS HUGEINT) + 1) * n_rows)
                    * 2000000 + CAST(n_keys AS HUGEINT) * n_rows)
                  // (2 * CAST(n_keys AS HUGEINT) * n_rows) AS BIGINT)
         FROM a2
         UNION ALL
         SELECT 'l_partkey', n_rows, n_keys, max_freq,
                CAST((CAST(max_freq AS HUGEINT) * 2000000 + n_rows)
                  // (2 * CAST(n_rows AS HUGEINT)) AS BIGINT),
                CAST(((2 * s1 - (CAST(n_keys AS HUGEINT) + 1) * n_rows)
                    * 2000000 + CAST(n_keys AS HUGEINT) * n_rows)
                  // (2 * CAST(n_keys AS HUGEINT) * n_rows) AS BIGINT)
         FROM a3""",

    "q138_bootstrap_ci" ->
      """WITH o AS (
           SELECT o_orderkey,
                  CAST(o_totalprice AS DECIMAL(18,4)) AS price
           FROM orders
         ), reps AS (
           SELECT r.rep, o.price,
                  CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)
                    || '_' || CAST(r.rep AS VARCHAR)), 1, 15)) AS BIGINT)
                    AS hx
           FROM o, range(0, 64) AS r(rep)
         ), w AS (
           SELECT rep, price,
                  CASE WHEN hx < 424136118829305329 THEN 0
                       WHEN hx < 848272237658610659 THEN 1
                       WHEN hx < 1060340297073263324 THEN 2
                       WHEN hx < 1131029650211480879 THEN 3
                       WHEN hx < 1148701988496035267 THEN 4
                       WHEN hx < 1152236456152946145 THEN 5
                       WHEN hx < 1152825534095764625 THEN 6
                       WHEN hx < 1152909688087595836 THEN 7
                       WHEN hx < 1152920207336574738 THEN 8
                       ELSE 9 END AS w
           FROM reps
         ), m AS (
           SELECT rep,
                  CAST(CAST(SUM(price * w) AS DECIMAL(28,4)) AS DOUBLE)
                    / CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) AS mean_b
           FROM w GROUP BY rep HAVING SUM(w) > 0
         ), rk AS (
           SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b) AS r
           FROM m
         ), ci AS (
           SELECT MAX(CASE WHEN r = 2 THEN mean_b END) AS lo,
                  MAX(CASE WHEN r = 63 THEN mean_b END) AS hi
           FROM rk
         ), p AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(CAST(SUM(price) AS DECIMAL(28,4)) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE) AS m
           FROM o
         )
         SELECT n, ROUND(m, 4) AS mean, ROUND(lo, 4) AS ci_lo,
                ROUND(hi, 4) AS ci_hi
         FROM p, ci""",

    "q139_textrank" ->
      """WITH RECURSIVE toks AS (
           SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                    x -> length(x) >= 4) AS tk
           FROM documents WHERE text IS NOT NULL
         ), tk2 AS (
           SELECT tk FROM toks WHERE len(tk) >= 2
         ), pairs0 AS (
           SELECT u.p[1] AS w1, u.p[2] AS w2
           FROM (SELECT unnest(list_zip(tk[1:len(tk)-1], tk[2:len(tk)]))
                   AS p FROM tk2) u
         ), pairs AS (
           SELECT w1, w2 FROM pairs0 WHERE w1 <> w2
         ), edges AS (
           SELECT w1 AS src, w2 AS dst FROM pairs
           UNION ALL SELECT w2, w1 FROM pairs
         ), deg AS (
           SELECT src, count(*) AS od FROM edges GROUP BY src
         ), n AS (SELECT count(*) AS nn FROM deg),
         it AS (
           SELECT 0 AS i, src AS node, 1000000000000 // nn AS r
           FROM deg, n
           UNION ALL
           SELECT i + 1, e.dst,
                  CAST((15 * (1000000000000 // (SELECT nn FROM n))) // 100
                       + (85 * SUM(r // d.od)) // 100 AS BIGINT)
           FROM it
           JOIN edges e ON it.node = e.src
           JOIN deg d ON it.node = d.src
           WHERE i < 10
           GROUP BY i + 1, e.dst
         )
         SELECT node AS word, CAST(r AS BIGINT) AS rank_ppt
         FROM it WHERE i = 10
         ORDER BY rank_ppt DESC, word LIMIT 20""",

    "q140_trigram_motifs" ->
      """WITH seq AS (
           SELECT user_id, event_type AS e1,
                  LEAD(event_type, 1) OVER w AS e2,
                  LEAD(event_type, 2) OVER w AS e3
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), bi AS (
           SELECT e1 AS b1, e2 AS b2, CAST(COUNT(*) AS BIGINT) AS nb
           FROM seq WHERE e2 IS NOT NULL GROUP BY 1, 2
         ), ft AS (
           SELECT b1, CAST(SUM(nb) AS BIGINT) AS cb FROM bi GROUP BY 1
         ), tri AS (
           SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
           FROM seq WHERE e3 IS NOT NULL GROUP BY 1, 2, 3
         )
         SELECT t.e1, t.e2, t.e3, t.n,
                CAST((2 * CAST(t.n AS HUGEINT) * f.cb * 1000000
                      + CAST(b12.nb AS HUGEINT) * b23.nb)
                  // (2 * CAST(b12.nb AS HUGEINT) * b23.nb) AS BIGINT)
                  AS lift_ppm
         FROM tri t
         JOIN bi b12 ON b12.b1 = t.e1 AND b12.b2 = t.e2
         JOIN bi b23 ON b23.b1 = t.e2 AND b23.b2 = t.e3
         JOIN ft f ON f.b1 = t.e2
         ORDER BY t.n DESC, t.e1, t.e2, t.e3 LIMIT 25""",

    "q141_behavior_diversity" ->
      """WITH c AS (
           SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2
         ), u AS (
           SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
                  CAST(COUNT(*) AS BIGINT) AS n_types,
                  SUM(CAST(c AS HUGEINT) * c) AS s2
           FROM c GROUP BY 1
         )
         SELECT user_id, n_events, n_types,
                CAST((2 * (CAST(n_events AS HUGEINT) * n_events - s2)
                      * 1000000 + CAST(n_events AS HUGEINT) * n_events)
                  // (2 * CAST(n_events AS HUGEINT) * n_events)
                  AS BIGINT) AS diversity_ppm
         FROM u""",

    "q142_weighted_median" ->
      """WITH b AS (
           SELECT l_returnflag AS g,
                  CAST(l_extendedprice AS DECIMAL(18,4)) AS v,
                  CAST(CAST(l_quantity AS DECIMAL(18,4)) AS BIGINT) AS w,
                  l_orderkey, l_linenumber
           FROM lineitem
         ), c AS (
           SELECT g, v, w,
                  SUM(w) OVER (PARTITION BY g
                    ORDER BY v, l_orderkey, l_linenumber
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cw,
                  SUM(w) OVER (PARTITION BY g) AS wt
           FROM b
         )
         SELECT g AS l_returnflag, CAST(MAX(wt) AS BIGINT) AS w_total,
                ROUND(CAST(MIN(v) AS DOUBLE), 4) AS median_v
         FROM c WHERE 2 * cw >= wt GROUP BY g""",

    "q143_mann_whitney" ->
      """WITH counts AS (
           SELECT CAST(value AS DECIMAL(18,4)) AS v,
                  CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                  CAST(SUM(CASE WHEN event_type = 'click'
                    THEN 1 ELSE 0 END) AS BIGINT) AS c2
           FROM events
           WHERE event_type IN ('purchase', 'click')
           GROUP BY 1
         ), cum AS (
           SELECT c1, c2,
                  2 * COALESCE(SUM(c1 + c2) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    + c1 + c2 + 1 AS mr2,
                  c1 + c2 AS ct
           FROM counts
         ), m AS (
           SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                  CAST(SUM(c2) AS BIGINT) AS n2,
                  SUM(CAST(c1 AS HUGEINT) * mr2) AS r1x2,
                  SUM(CAST(ct AS HUGEINT) * ct * ct - ct) AS tsum
           FROM cum
         ), zz AS (
           SELECT n1, n2,
                  r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1x2,
                  CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE)
                    / 2.0 AS u1,
                  CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0 AS mu,
                  (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                    * (((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0)
                      - CAST(tsum AS DOUBLE)
                        / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                          * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                            - 1.0))) AS va
           FROM m
         )
         SELECT n1, n2, CAST(u1x2 AS BIGINT) AS u1_x2,
                CASE WHEN n1 > 0 AND n2 > 0 AND va > 0
                  THEN ROUND((u1 - mu) / sqrt(va), 4) END AS z,
                CASE WHEN n1 > 0 AND n2 > 0 AND va > 0
                  THEN ABS((u1 - mu) / sqrt(va)) > 1.96 END AS significant
         FROM zz""",

    "q144_benford" ->
      """WITH d AS (
           SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,4))
                    AS VARCHAR), 1, 1) AS INT) AS digit,
                  CAST(COUNT(*) AS BIGINT) AS n_obs
           FROM orders
           WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
           GROUP BY 1
         ), e AS (
           SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
             (4, 96910), (5, 79181), (6, 66947), (7, 57992),
             (8, 51153), (9, 45757)) AS t(digit, exp_ppm)
         ), tt AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM d)
         SELECT d.digit, d.n_obs,
                (2 * d.n_obs * 1000000 + n) // (2 * n) AS obs_ppm,
                CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
                ROUND((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE)
                        * (CAST(e.exp_ppm AS DOUBLE) / 1000000.0))
                      * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE)
                        * (CAST(e.exp_ppm AS DOUBLE) / 1000000.0))
                      / (CAST(n AS DOUBLE)
                        * (CAST(e.exp_ppm AS DOUBLE) / 1000000.0)), 4)
                  AS chi2_contrib
         FROM d JOIN e ON d.digit = e.digit, tt""",

    "q145_join_cardinality" ->
      """WITH fa AS (
           SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS fa
           FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
         ), fb AS (
           SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS fb
           FROM events WHERE user_id IS NOT NULL GROUP BY 1
         ), j AS (
           SELECT CAST(fa.fa AS HUGEINT) * fb.fb AS contrib
           FROM fa JOIN fb ON fa.k = fb.k
         )
         SELECT CAST(COUNT(*) AS BIGINT) AS n_matching_keys,
                CAST(SUM(contrib) AS BIGINT) AS est_rows,
                CAST(MAX(contrib) AS BIGINT) AS max_key_contrib,
                CAST((2 * MAX(contrib) * 1000000 + SUM(contrib))
                  // (2 * SUM(contrib)) AS BIGINT) AS top_contrib_ppm
         FROM j""",

    "q146_pareto_abc" ->
      """WITH rev AS (
           SELECT l_partkey,
                  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                    AS DECIMAL(28,4)) * 100 AS BIGINT) AS r100
           FROM lineitem GROUP BY 1
         ), c AS (
           SELECT l_partkey, r100,
                  COALESCE(SUM(r100) OVER (ORDER BY r100 DESC, l_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS cum_excl,
                  SUM(r100) OVER () AS t100
           FROM rev
         ), cl AS (
           SELECT CASE
                    WHEN CAST(cum_excl AS HUGEINT) * 100
                      < CAST(t100 AS HUGEINT) * 80 THEN 'A'
                    WHEN CAST(cum_excl AS HUGEINT) * 100
                      < CAST(t100 AS HUGEINT) * 95 THEN 'B'
                    ELSE 'C' END AS cls,
                  r100, t100
           FROM c
         )
         SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
                ROUND(CAST(SUM(r100) AS DOUBLE) / 100.0, 2) AS revenue,
                CAST((2 * CAST(SUM(r100) AS HUGEINT) * 1000000
                    + MAX(t100))
                  // (2 * CAST(MAX(t100) AS HUGEINT)) AS BIGINT)
                  AS share_ppm
         FROM cl GROUP BY cls""",

    "q147_proration" ->
      """WITH li AS (
           SELECT l_orderkey, l_linenumber,
                  CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100
                    AS BIGINT) AS w
           FROM lineitem
           WHERE l_orderkey IS NOT NULL AND l_extendedprice IS NOT NULL
             AND CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100
                   AS BIGINT) > 0
         ), o AS (
           SELECT o_orderkey,
                  CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100
                    AS BIGINT) AS t
           FROM orders
           WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
         ), j AS (
           SELECT l_orderkey, l_linenumber, w, t,
                  SUM(w) OVER (PARTITION BY l_orderkey) AS ww
           FROM li JOIN o ON li.l_orderkey = o.o_orderkey
         ), b AS (
           SELECT l_orderkey, l_linenumber, t, w,
                  (t * w) // ww AS base, (t * w) % ww AS rem
           FROM j
         ), r AS (
           SELECT l_orderkey, l_linenumber, base,
                  t - SUM(base) OVER (PARTITION BY l_orderkey)
                    AS leftover,
                  ROW_NUMBER() OVER (PARTITION BY l_orderkey
                    ORDER BY rem DESC, l_linenumber, w) AS rk
           FROM b
         )
         SELECT l_orderkey, l_linenumber,
                CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                  AS BIGINT) AS alloc_cents
         FROM r""",

    "q148_acf" ->
      """WITH daily AS (
           SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100
                    AS BIGINT)) AS x
           FROM orders
           WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
           GROUP BY 1
         ), m AS (
           SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                  CAST(SUM(x) AS HUGEINT) AS sx
           FROM daily
         ), c AS (
           SELECT day, n * x - sx AS c FROM daily, m
         ), den AS (
           SELECT SUM(c * c) AS den FROM c
         ), lags AS (
           SELECT CAST(range AS BIGINT) AS lag FROM range(1, 8)
         ), p AS (
           SELECT l.lag, a.c AS ca, b.c AS cb
           FROM c a CROSS JOIN lags l
           JOIN c b ON b.day = a.day + l.lag
         ), num AS (
           SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                  SUM(ca * cb) AS num
           FROM p GROUP BY 1
         )
         SELECT lag, n_pairs,
                CASE WHEN den > 0 THEN CAST(CASE WHEN num >= 0
                    THEN (2 * num * 1000000 + den) // (2 * den)
                    ELSE -((2 * (-num) * 1000000 + den) // (2 * den))
                    END AS BIGINT) END AS acf_ppm
         FROM num, den""",

    "q149_survival" ->
      """WITH RECURSIVE per AS (
           SELECT user_id, MIN(epoch_us(ts)) AS m0, MAX(epoch_us(ts)) AS m1
           FROM events
           WHERE user_id IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1
         ), hz AS (SELECT MAX(m1) AS hz FROM per),
         spans AS (
           SELECT (m1 - m0) // 86400000000 AS t,
                  CASE WHEN m1 < hz - 86400000000 THEN 1 ELSE 0 END AS ev
           FROM per, hz
         ), hist AS (
           SELECT t, CAST(COUNT(*) AS BIGINT) AS c,
                  CAST(SUM(ev) AS BIGINT) AS d
           FROM spans WHERE t >= 0 GROUP BY 1
         ), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
         lt AS (
           SELECT t, c, d,
                  CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS i,
                  n - COALESCE(SUM(c) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS n_risk
           FROM hist, tot
         ), km(i, s) AS (
           SELECT CAST(0 AS BIGINT), CAST(1000000 AS HUGEINT)
           UNION ALL
           SELECT lt.i,
                  CASE WHEN lt.d > 0
                       THEN km.s * (lt.n_risk - lt.d) // lt.n_risk
                       ELSE km.s END
           FROM km JOIN lt ON lt.i = km.i + 1
         )
         SELECT lt.t AS t_days, CAST(lt.n_risk AS BIGINT) AS n_risk,
                lt.d AS n_events, CAST(km.s AS BIGINT) AS surv_ppm
         FROM lt JOIN km ON km.i = lt.i
         WHERE lt.d > 0""",

    "q150_rrf_fusion" ->
      """WITH docs AS (
           SELECT doc_id,
                  list_distinct(string_split_regex(lower(trim(text)),
                    '\s+')) AS tk
           FROM documents WHERE text IS NOT NULL
         ), seeds AS (
           SELECT d.doc_id AS qid FROM docs d
           JOIN embeddings e ON d.doc_id = e.vec_id
           ORDER BY qid LIMIT 8
         ), qtok AS (
           SELECT qid, unnest(tk) AS term
           FROM docs JOIN seeds ON doc_id = qid
         ), qsize AS (
           SELECT qid, CAST(COUNT(*) AS BIGINT) AS qn
           FROM qtok GROUP BY 1
         ), dtok AS (
           SELECT doc_id AS did, CAST(len(tk) AS BIGINT) AS dn,
                  unnest(tk) AS term
           FROM docs
         ), inter AS (
           SELECT qid, did, dn, CAST(COUNT(*) AS BIGINT) AS inter
           FROM dtok JOIN qtok USING (term)
           WHERE did <> qid
           GROUP BY 1, 2, 3
         ), lex AS (
           SELECT qid, did,
                  (2 * inter * 1000000 + (qn + dn - inter))
                    // (2 * (qn + dn - inter)) AS jac_ppm
           FROM inter JOIN qsize USING (qid)
         ), lexr AS (
           SELECT qid, did, lrank FROM (
             SELECT qid, did,
                    CAST(ROW_NUMBER() OVER (PARTITION BY qid
                      ORDER BY jac_ppm DESC, did) AS BIGINT) AS lrank
             FROM lex)
           WHERE lrank <= 50
         ), qv AS (
           SELECT qid, embedding AS qe
           FROM seeds JOIN embeddings ON vec_id = qid
         ), pairs AS (
           SELECT qid, vec_id AS did, qe, embedding AS ne
           FROM qv, embeddings WHERE vec_id <> qid
         ), un AS (
           SELECT qid, did, CAST(unnest(qe) AS DOUBLE) AS x,
                  CAST(unnest(ne) AS DOUBLE) AS y
           FROM pairs
         ), dots AS (
           SELECT qid, did, SUM(x*y) AS dot, SUM(x*x) AS na,
                  SUM(y*y) AS nb
           FROM un GROUP BY 1, 2
         ), semr AS (
           SELECT qid, did, srank FROM (
             SELECT qid, did,
                    CAST(ROW_NUMBER() OVER (PARTITION BY qid
                      ORDER BY ROUND(dot / (sqrt(na) * sqrt(nb)), 4) DESC,
                        did) AS BIGINT) AS srank
             FROM dots)
           WHERE srank <= 50
         ), fused AS (
           SELECT COALESCE(l.qid, s.qid) AS qid,
                  COALESCE(l.did, s.did) AS did,
                  l.lrank AS lex_rank, s.srank AS sem_rank,
                  COALESCE(1000000 // (60 + l.lrank), 0)
                    + COALESCE(1000000 // (60 + s.srank), 0) AS rrf
           FROM lexr l FULL OUTER JOIN semr s
             ON l.qid = s.qid AND l.did = s.did
         )
         SELECT qid, did, lex_rank, sem_rank,
                CAST(rrf AS BIGINT) AS rrf_score
         FROM (
           SELECT qid, did, lex_rank, sem_rank, rrf,
                  ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY rrf DESC, did) AS rn
           FROM fused)
         WHERE rn <= 10""",

    "q151_link_predict" ->
      """WITH li AS (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem
         ), pairs AS (
           SELECT a.pk AS s1, b.pk AS s2
           FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING COUNT(*) >= 2
         ), edges AS (
           SELECT s1 AS src, s2 AS dst FROM pairs
           UNION ALL SELECT s2, s1 FROM pairs
         ), deg AS (
           SELECT src AS n, CAST(COUNT(*) AS BIGINT) AS deg
           FROM edges GROUP BY 1
         ), cand AS (
           SELECT e1.src AS a, e2.dst AS b, CAST(COUNT(*) AS BIGINT) AS cn
           FROM edges e1 JOIN edges e2 ON e1.dst = e2.src
           WHERE e1.src < e2.dst
           GROUP BY 1, 2
         ), ne AS (
           SELECT c.a, c.b, c.cn FROM cand c
           WHERE NOT EXISTS (SELECT 1 FROM edges e
                             WHERE e.src = c.a AND e.dst = c.b)
         ), scored AS (
           SELECT a, b, cn,
                  (2 * cn * 1000000 + (da.deg + db.deg - cn))
                    // (2 * (da.deg + db.deg - cn)) AS jac_ppm
           FROM ne JOIN deg da ON ne.a = da.n JOIN deg db ON ne.b = db.n
         ), bidir AS (
           SELECT a AS node, b AS other, cn, jac_ppm FROM scored
           UNION ALL
           SELECT b, a, cn, jac_ppm FROM scored
         )
         SELECT node, other, cn, CAST(jac_ppm AS BIGINT) AS jac_ppm
         FROM (
           SELECT node, other, cn, jac_ppm,
                  ROW_NUMBER() OVER (PARTITION BY node
                    ORDER BY jac_ppm DESC, cn DESC, other) AS rn
           FROM bidir)
         WHERE rn <= 5""",

    "q152_strat_sample" ->
      """WITH c AS (
           SELECT lang AS s, CAST(COUNT(*) AS BIGINT) AS n
           FROM documents WHERE lang IS NOT NULL GROUP BY 1
         ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c),
         alloc AS (
           SELECT s, n, (2 * t * 1 + 10) // (2 * 10) AS K,
                  ((2 * t * 1 + 10) // (2 * 10) * n) // t AS base,
                  ((2 * t * 1 + 10) // (2 * 10) * n) % t AS rem
           FROM c, tot
         ), r AS (
           SELECT s, base,
                  K - SUM(base) OVER () AS leftover,
                  ROW_NUMBER() OVER (ORDER BY rem DESC, s) AS rk
           FROM alloc
         ), ks AS (
           SELECT s, base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                    AS k_s
           FROM r
         ), h AS (
           SELECT lang AS s, doc_id,
                  md5(CAST(doc_id AS VARCHAR)) AS hh
           FROM documents WHERE lang IS NOT NULL
         ), rr AS (
           SELECT s, doc_id,
                  CAST(ROW_NUMBER() OVER (PARTITION BY s
                    ORDER BY hh, doc_id) AS BIGINT) AS rk
           FROM h
         )
         SELECT rr.s AS lang, rr.doc_id, rr.rk AS sample_rank
         FROM rr JOIN ks ON rr.s = ks.s
         WHERE rr.rk <= ks.k_s""",

    "q153_theil_sen" ->
      """WITH daily AS (
           SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100
                    AS BIGINT)) AS x
           FROM orders
           WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
           GROUP BY 1
         ), aa AS (SELECT day AS t1, x AS v1 FROM daily),
         bb AS (SELECT day AS t2, x AS v2 FROM daily),
         sl AS (
           SELECT CAST(CASE WHEN v2 >= v1
               THEN (2 * (CAST(v2 AS HUGEINT) - v1) * 1000000 + (t2 - t1))
                    // (2 * (t2 - t1))
               ELSE -((2 * (CAST(v1 AS HUGEINT) - v2) * 1000000
                       + (t2 - t1)) // (2 * (t2 - t1)))
               END AS BIGINT) AS slope_e6
           FROM aa JOIN bb ON t1 < t2
         ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM sl),
         med AS (
           SELECT slope_e6 FROM (
             SELECT slope_e6,
                    ROW_NUMBER() OVER (ORDER BY slope_e6) AS rk
             FROM sl), n
           WHERE rk = (n_pairs + 1) // 2
         ), res AS (
           SELECT CAST(x AS HUGEINT) * 1000000 - slope_e6 * day AS r
           FROM daily, med
         ), rn AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM res),
         rmed AS (
           SELECT r FROM (
             SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rk FROM res), rn
           WHERE rk = (c + 1) // 2
         )
         SELECT n.n_pairs, med.slope_e6, CAST(rmed.r AS BIGINT) AS icept_e6
         FROM n, med, rmed""",

    // full-recompute CC over the combined co-purchase graph — the
    // incremental maintenance is DEFINED to equal it. Self-loops fold
    // each node's own label into the per-round MIN so the recursive
    // term references `it` exactly once; 15 synchronous rounds >> the
    // dense co-purchase graph's min-label convergence depth.
    "q157_incr_cc" ->
      """WITH RECURSIVE li AS (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem
         ), pairs AS (
           SELECT DISTINCT a.pk AS s1, b.pk AS s2
           FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
         ), nodes AS (
           SELECT s1 AS n FROM pairs UNION SELECT s2 FROM pairs
         ), edges AS (
           SELECT s1 AS src, s2 AS dst FROM pairs
           UNION SELECT s2, s1 FROM pairs
           UNION SELECT n, n FROM nodes
         ), it AS (
           SELECT 0 AS i, n AS node, n AS lbl FROM nodes
           UNION ALL
           SELECT it.i + 1, e.dst, MIN(it.lbl)
           FROM it JOIN edges e ON it.node = e.src
           WHERE it.i < 15
           GROUP BY 1, 2
         )
         SELECT node AS partkey, CAST(lbl AS BIGINT) AS component
         FROM it WHERE i = 15""",

    "q154_wilson_lcb" ->
      """WITH g AS (
           SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
           FROM lineitem JOIN part ON l_partkey = p_partkey
           GROUP BY 1
         )
         SELECT p_brand, n, k,
                ROUND((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                       + 1.96 * 1.96 / (2.0 * CAST(n AS DOUBLE))
                       - 1.96 * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                           * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                           / CAST(n AS DOUBLE)
                         + 1.96 * 1.96 / (4.0 * CAST(n AS DOUBLE)
                           * CAST(n AS DOUBLE))))
                      / (1.0 + 1.96 * 1.96 / CAST(n AS DOUBLE)), 6)
                  AS wilson_lcb
         FROM g""",

    "q156_mmr" -> mmrOracleSql,

    // two-stage truncated-dim ANN is deterministic end to end (ROUND-4
    // prefix cosines cut at rank 100 with nid tie-breaks, then ROUND-4
    // full-vector re-rank — the q32 cosine recipe twice), so the oracle
    // replays the exact pipeline: no float-library internals anywhere
    "q158_trunc_ann" ->
      """WITH pre AS (
           SELECT vec_id, embedding[1:32] AS pe FROM embeddings
         ), q AS (
           SELECT vec_id AS qid, pe AS qp FROM pre WHERE vec_id < 10
         ), cand AS (
           SELECT q.qid, p.vec_id AS nid, q.qp, p.pe AS np
           FROM q, pre p WHERE p.vec_id <> q.qid
         ), un AS (
           SELECT qid, nid, CAST(unnest(qp) AS DOUBLE) AS x,
                  CAST(unnest(np) AS DOUBLE) AS y
           FROM cand
         ), dots AS (
           SELECT qid, nid, SUM(x*y) AS dot, SUM(x*x) AS na,
                  SUM(y*y) AS nb
           FROM un GROUP BY qid, nid
         ), pres AS (
           SELECT qid, nid,
                  ROUND(dot / (sqrt(na) * sqrt(nb)), 4) AS pre_cos
           FROM dots
         ), short AS (
           SELECT qid, nid FROM (
             SELECT qid, nid, row_number() OVER (PARTITION BY qid
               ORDER BY pre_cos DESC, nid) AS rn FROM pres)
           WHERE rn <= 100
         ), fu AS (
           SELECT s.qid, s.nid, eq.embedding AS qe, en.embedding AS ne
           FROM short s
           JOIN embeddings eq ON eq.vec_id = s.qid
           JOIN embeddings en ON en.vec_id = s.nid
         ), un2 AS (
           SELECT qid, nid, CAST(unnest(qe) AS DOUBLE) AS x,
                  CAST(unnest(ne) AS DOUBLE) AS y
           FROM fu
         ), dots2 AS (
           SELECT qid, nid, SUM(x*y) AS dot, SUM(x*x) AS na,
                  SUM(y*y) AS nb
           FROM un2 GROUP BY qid, nid
         ), scored AS (
           SELECT qid, nid,
                  ROUND(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim
           FROM dots2
         )
         SELECT qid, nid, cos_sim FROM (
           SELECT qid, nid, cos_sim, row_number() OVER (PARTITION BY qid
             ORDER BY cos_sim DESC, nid) AS rn FROM scored)
         WHERE rn <= 5""",

    "q155_cramers_v" ->
      """WITH base AS (
           SELECT lang AS a, source AS b FROM documents
           WHERE lang IS NOT NULL AND source IS NOT NULL
         ), cont AS (
           SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o
           FROM base GROUP BY 1, 2
         ), ra AS (
           SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM cont GROUP BY 1
         ), cb AS (
           SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM cont GROUP BY 1
         ), tot AS (
           SELECT CAST(SUM(o) AS BIGINT) AS n,
                  CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
                  CAST(COUNT(DISTINCT c2.b) AS BIGINT) AS c
           FROM cont c2
         ), s12 AS (
           SELECT SUM((2 * CAST(o AS HUGEINT) * o * 1000000000000
                       + CAST(ra.ra AS HUGEINT) * cb.cb)
                      // (2 * CAST(ra.ra AS HUGEINT) * cb.cb)) AS s12
           FROM cont JOIN ra USING (a) JOIN cb USING (b)
         ), f AS (
           SELECT n, r, c,
                  CAST(n AS HUGEINT) * (s12 - 1000000000000) AS chi2_e12
           FROM s12, tot
         )
         SELECT n, r, c,
                ROUND(CAST(chi2_e12 AS DOUBLE) / 1e12, 6) AS chi2,
                CASE WHEN r > 1 AND c > 1 THEN
                  ROUND(sqrt(CAST(chi2_e12 AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(least(r, c) - 1 AS DOUBLE)
                       * 1e12)), 6)
                END AS cramers_v
         FROM f""",

    "q159_moments" ->
      """WITH scaled AS (
           SELECT l_returnflag, l_linestatus,
                  CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000
                       AS HUGEINT) AS x
           FROM lineitem WHERE l_quantity IS NOT NULL
         ), m AS (
           SELECT l_returnflag, l_linestatus,
                  CAST(COUNT(*) AS BIGINT) AS n_rows,
                  CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(x) AS DOUBLE) AS s1,
                  CAST(SUM(x*x) AS DOUBLE) AS s2,
                  CAST(SUM(x*x*x) AS DOUBLE) AS s3,
                  CAST(SUM(x*x*x*x) AS DOUBLE) AS s4
           FROM scaled GROUP BY 1, 2
         ), c AS (
           SELECT l_returnflag, l_linestatus, n_rows,
                  s2/n - (s1/n)*(s1/n) AS m2,
                  s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n) AS m3,
                  s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                    - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4
           FROM m
         )
         SELECT l_returnflag, l_linestatus, n_rows,
                CASE WHEN m2 > 0
                  THEN ROUND(m3/(sqrt(m2)*m2), 4) END AS skewness,
                CASE WHEN m2 > 0
                  THEN ROUND(m4/(m2*m2) - 3, 4) END AS kurtosis_excess
         FROM c""",

    "q160_ewma" ->
      """WITH daily AS (
           SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
                  SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
                           AS HUGEINT)) AS rev
           FROM lineitem
           WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
           GROUP BY 1, 2
         ), lagged AS (
           SELECT l_returnflag, day, rev,
                  lag(rev, 1) OVER w AS r1, lag(rev, 2) OVER w AS r2,
                  lag(rev, 3) OVER w AS r3, lag(rev, 4) OVER w AS r4,
                  lag(rev, 5) OVER w AS r5, lag(rev, 6) OVER w AS r6,
                  lag(rev, 7) OVER w AS r7
           FROM daily
           WINDOW w AS (PARTITION BY l_returnflag ORDER BY day)
         ), f AS (
           SELECT l_returnflag, day, rev,
                  128*rev + 64*COALESCE(r1,0) + 32*COALESCE(r2,0)
                    + 16*COALESCE(r3,0) + 8*COALESCE(r4,0)
                    + 4*COALESCE(r5,0) + 2*COALESCE(r6,0)
                    + COALESCE(r7,0) AS num,
                  128 + CASE WHEN r1 IS NULL THEN 0 ELSE 64 END
                      + CASE WHEN r2 IS NULL THEN 0 ELSE 32 END
                      + CASE WHEN r3 IS NULL THEN 0 ELSE 16 END
                      + CASE WHEN r4 IS NULL THEN 0 ELSE 8 END
                      + CASE WHEN r5 IS NULL THEN 0 ELSE 4 END
                      + CASE WHEN r6 IS NULL THEN 0 ELSE 2 END
                      + CASE WHEN r7 IS NULL THEN 0 ELSE 1 END AS den
           FROM lagged
         )
         SELECT l_returnflag, day, CAST(rev AS BIGINT) AS rev_units,
                CAST((2*num + den) // (2*den) AS BIGINT) AS ewma_units
         FROM f""",

    "q161_bitmap_distinct" ->
      """SELECT event_type,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
                CAST(COUNT(*) AS BIGINT) AS n_events
         FROM events WHERE user_id IS NOT NULL
         GROUP BY event_type""",

    // the NDV estimate has no ANSI oracle (different sketch), so the
    // output carries the operator's claims as engine-exact fields: the
    // oracle asserts the exact counts and that merge-invariance and
    // the 2% accuracy bound HOLD (booleans TRUE) — sketches are
    // deterministic, so these are reproducible facts.
    // COUPLING WARNING: the hardcoded TRUEs depend on (a) Spark's
    // DataSketches HLL giving bit-identical union-vs-direct estimates
    // and (b) the 2% bound holding at the driver's scale factor — a
    // Spark/DataSketches version bump or data change flips them and
    // hash-fails the gate here. RelationalOpsSpec's q162 test asserts
    // the same two claims with a per-type message, so diagnose THERE
    // first: if the suite test is red, this oracle is stale, not the
    // engine.
    "q162_sketch_rollup" ->
      """WITH daily AS (
           SELECT event_type, date_trunc('day', ts) AS day,
                  count(*) AS n
           FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
                CAST(sum(n) AS BIGINT) AS n_events,
                TRUE AS merge_invariant, TRUE AS est_within_2pct
         FROM daily GROUP BY 1""",

    "q163_business_days" ->
      """WITH span AS (
           SELECT CAST(min(o_orderdate) AS DATE) AS lo,
                  CAST(max(o_orderdate) AS DATE) AS hi
           FROM orders WHERE o_orderdate IS NOT NULL
         ), days AS (
           SELECT CAST(unnest(generate_series(lo, hi + 40,
                    INTERVAL 1 DAY)) AS DATE) AS day
           FROM span
         ), cal AS (
           SELECT day,
                  dayofweek(day) BETWEEN 1 AND 5
                    AND NOT (dayofweek(day) = 1
                             AND dayofmonth(day) <= 7) AS bday
           FROM days
         ), counted AS (
           SELECT day, bday,
                  SUM(CASE WHEN bday THEN 1 ELSE 0 END)
                    OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                    AS bd_count
           FROM cal
         ), ranks AS (
           SELECT bd_count AS target, CAST(day AS TIMESTAMP) AS sla_due
           FROM counted WHERE bday
         )
         SELECT o.o_orderkey, o.o_orderdate, r.sla_due
         FROM orders o
         JOIN counted c ON CAST(o.o_orderdate AS DATE) = c.day
         JOIN ranks r ON r.target = c.bd_count + 3
         WHERE o.o_orderdate IS NOT NULL""",

    "q164_asof_snapshot" ->
      """WITH marked AS (
           SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
                  CASE WHEN lag(o_orderpriority) OVER w
                            IS DISTINCT FROM o_orderpriority
                       THEN 1 ELSE 0 END AS chg
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey)
         ), runs AS (
           SELECT *, SUM(chg) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS run_id
           FROM marked
         ), collapsed AS (
           SELECT o_custkey AS custkey, run_id,
                  min(o_orderpriority) AS priority,
                  min(o_orderdate) AS valid_from
           FROM runs GROUP BY custkey, run_id
         ), hist AS (
           SELECT custkey, priority, valid_from,
                  lead(valid_from) OVER w2 AS valid_to
           FROM collapsed
           WINDOW w2 AS (PARTITION BY custkey ORDER BY run_id)
         )
         SELECT custkey, priority, valid_from, valid_to
         FROM hist
         WHERE valid_from <= TIMESTAMP '1995-06-01'
           AND (valid_to IS NULL OR valid_to > TIMESTAMP '1995-06-01')""",

    "q165_decile_lift" ->
      """WITH cust AS (
           SELECT c_custkey,
                  CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 100 AS BIGINT)
                    AS score
           FROM customer
         ), resp AS (
           SELECT DISTINCT o_custkey FROM orders
           WHERE o_orderpriority = '1-URGENT'
         ), lab AS (
           SELECT c.c_custkey, c.score,
                  CASE WHEN r.o_custkey IS NULL THEN 0 ELSE 1 END AS label
           FROM cust c LEFT JOIN resp r ON c.c_custkey = r.o_custkey
         ), tot AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
                  CAST(SUM(label) AS BIGINT) AS t_resp
           FROM lab
         ), rk AS (
           SELECT label,
                  CAST(row_number() OVER (ORDER BY -score, c_custkey)
                       AS BIGINT) AS rn
           FROM lab
         ), dec AS (
           SELECT ((rn - 1) * 10) // (SELECT n_total FROM tot) + 1
                    AS decile,
                  label
           FROM rk
         ), g AS (
           SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
                  CAST(SUM(label) AS BIGINT) AS responders
           FROM dec GROUP BY 1
         ), c AS (
           SELECT *,
                  CAST(SUM(n_customers) OVER (ORDER BY decile
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
                  CAST(SUM(responders) OVER (ORDER BY decile
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_resp
           FROM g
         )
         SELECT decile, n_customers, responders,
                CAST((2 * CAST(responders AS HUGEINT) * 1000000
                  + n_customers) // (2 * CAST(n_customers AS HUGEINT))
                  AS BIGINT) AS resp_rate_ppm,
                CASE WHEN (SELECT t_resp FROM tot) > 0 THEN
                  CAST((2 * CAST(cum_resp AS HUGEINT)
                        * (SELECT n_total FROM tot) * 1000000
                      + CAST(cum_n AS HUGEINT) * (SELECT t_resp FROM tot))
                    // (2 * CAST(cum_n AS HUGEINT)
                        * (SELECT t_resp FROM tot))
                  AS BIGINT) END AS cum_lift_ppm
         FROM c""",

    "q166_rfm" ->
      """WITH per AS (
           SELECT o_custkey,
                  max(o_orderdate) AS last_order,
                  CAST(COUNT(*) AS BIGINT) AS f_raw,
                  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100
                    AS BIGINT)) AS BIGINT) AS m_raw
           FROM orders WHERE o_orderdate IS NOT NULL
           GROUP BY 1
         ), tot AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_cust FROM per
         ), rk AS (
           SELECT o_custkey, f_raw, m_raw,
                  CAST(row_number() OVER (ORDER BY last_order, o_custkey)
                       AS BIGINT) AS rn_r,
                  CAST(row_number() OVER (ORDER BY f_raw, o_custkey)
                       AS BIGINT) AS rn_f,
                  CAST(row_number() OVER (ORDER BY m_raw, o_custkey)
                       AS BIGINT) AS rn_m
           FROM per
         ), sc AS (
           SELECT o_custkey AS custkey, f_raw, m_raw,
                  ((rn_r - 1) * 5) // (SELECT n_cust FROM tot) + 1
                    AS r_score,
                  ((rn_f - 1) * 5) // (SELECT n_cust FROM tot) + 1
                    AS f_score,
                  ((rn_m - 1) * 5) // (SELECT n_cust FROM tot) + 1
                    AS m_score
           FROM rk
         )
         SELECT custkey, f_raw, m_raw, r_score, f_score, m_score,
                CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                  || CAST(m_score AS VARCHAR) AS segment
         FROM sc""",

    "q167_modularity" ->
      """WITH RECURSIVE li AS (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem
         ), pairs AS (
           SELECT a.pk AS s1, b.pk AS s2
           FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING COUNT(*) >= 2
         ), edges AS (
           SELECT s1 AS src, s2 AS dst FROM pairs
           UNION ALL SELECT s2, s1 FROM pairs
         ), nodes AS (SELECT src FROM edges GROUP BY src),
         it AS (
           SELECT 0 AS i, src AS node, src AS lbl FROM nodes
           UNION ALL
           SELECT i, node, lbl FROM (
             SELECT it.i + 1 AS i, e.dst AS node, it.lbl AS lbl,
                    COUNT(*) AS c
             FROM it JOIN edges e ON it.node = e.src
             WHERE it.i < 5
             GROUP BY 1, 2, 3
           ) QUALIFY row_number() OVER (PARTITION BY i, node
               ORDER BY c DESC, lbl ASC) = 1
         ), comm AS (
           SELECT node, lbl AS community FROM it WHERE i = 5
         ), m2t AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM edges
         ), deg AS (
           SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
           FROM edges GROUP BY 1
         ), dsum AS (
           SELECT c.community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
                  CAST(SUM(d.deg) AS BIGINT) AS degree_sum
           FROM comm c JOIN deg d ON c.node = d.node
           GROUP BY 1
         ), intra AS (
           SELECT a.community,
                  CAST(COUNT(*) AS BIGINT) AS intra2
           FROM edges e
           JOIN comm a ON e.src = a.node
           JOIN comm b ON e.dst = b.node AND b.community = a.community
           GROUP BY 1
         ), f AS (
           SELECT ds.community, ds.n_nodes,
                  COALESCE(i.intra2, 0) AS intra2, ds.degree_sum,
                  CAST(m2t.m2 AS HUGEINT) * COALESCE(i.intra2, 0)
                    - CAST(ds.degree_sum AS HUGEINT) * ds.degree_sum
                    AS num,
                  CAST(m2t.m2 AS HUGEINT) * m2t.m2 AS den
           FROM dsum ds LEFT JOIN intra i ON ds.community = i.community,
                m2t
         )
         SELECT community, n_nodes, intra2 // 2 AS intra_edges,
                degree_sum,
                CASE WHEN num >= 0
                  THEN CAST((2 * num * 1000000 + den) // (2 * den)
                       AS BIGINT)
                  ELSE -CAST((2 * (-num) * 1000000 + den) // (2 * den)
                       AS BIGINT) END AS q_ppm
         FROM f
         ORDER BY n_nodes DESC, community
         LIMIT 25""",

    "q168_quantile_norm" ->
      """WITH docs AS (
           SELECT doc_id, source, n_chars FROM documents
           WHERE n_chars IS NOT NULL
         ), tot AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM docs
         ), wr AS (
           SELECT doc_id, source, n_chars,
                  CAST(row_number() OVER (PARTITION BY source
                    ORDER BY n_chars, doc_id) AS BIGINT) AS rn_s,
                  CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
                    AS n_s
           FROM docs
         ), gr AS (
           SELECT CAST(row_number() OVER (ORDER BY n_chars, doc_id)
                       AS BIGINT) AS rn_g,
                  n_chars AS norm_chars
           FROM docs
         )
         SELECT w.doc_id, w.source, w.n_chars, g.norm_chars
         FROM wr w
         JOIN gr g ON g.rn_g =
           (w.rn_s * (SELECT n_total FROM tot) + w.n_s - 1) // w.n_s""",

    "q169_overlap_matrix" ->
      """WITH u AS (
           SELECT DISTINCT event_type, user_id FROM events
           WHERE user_id IS NOT NULL
         ), s AS (
           SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM u GROUP BY 1
         ), ov AS (
           SELECT a.event_type AS type_a, b.event_type AS type_b,
                  CAST(COUNT(*) AS BIGINT) AS overlap
           FROM u a JOIN u b ON a.user_id = b.user_id
                 AND a.event_type < b.event_type
           GROUP BY 1, 2
         )
         SELECT sa.event_type AS type_a, sb.event_type AS type_b,
                COALESCE(o.overlap, 0) AS overlap,
                sa.n AS n_a, sb.n AS n_b,
                CAST((2 * CAST(COALESCE(o.overlap, 0) AS HUGEINT)
                      * 1000000
                    + (sa.n + sb.n - COALESCE(o.overlap, 0)))
                  // (2 * CAST(sa.n + sb.n - COALESCE(o.overlap, 0)
                      AS HUGEINT))
                  AS BIGINT) AS jaccard_ppm
         FROM s sa
         JOIN s sb ON sa.event_type < sb.event_type
         LEFT JOIN ov o ON o.type_a = sa.event_type
                       AND o.type_b = sb.event_type""",

    "q170_cosine_allpairs" ->
      """WITH base AS (
           SELECT doc_id,
                  string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM documents WHERE text IS NOT NULL
         ), shing AS (
           SELECT doc_id,
                  CASE WHEN len(tk) >= 3 THEN
                    list_distinct([tk[i] || ' ' || tk[i+1] || ' '
                                   || tk[i+2]
                                   for i in range(1, len(tk) - 1)])
                  ELSE [array_to_string(tk, ' ')] END AS sh
           FROM base
         ), toks AS (
           SELECT DISTINCT doc_id AS id, tok
           FROM (SELECT doc_id, unnest(sh) AS tok FROM shing)
           WHERE tok <> ''
         ), nt AS (
           SELECT CAST(COUNT(DISTINCT id) AS BIGINT) AS n FROM toks
         ), freq AS (
           SELECT tok,
                  LEAST((2 * (SELECT n FROM nt)
                         + CAST(COUNT(*) AS BIGINT))
                        // (2 * CAST(COUNT(*) AS BIGINT)), 1000000)
                    AS w
           FROM toks GROUP BY tok
         ), feat AS (
           SELECT t.id, t.tok, f.w, CAST(f.w AS HUGEINT) * f.w AS w2
           FROM toks t JOIN freq f ON t.tok = f.tok
         ), norms AS (
           SELECT id, CAST(SUM(w2) AS HUGEINT) AS n2
           FROM feat GROUP BY id
         ), dot AS (
           SELECT a.id AS id_a, b.id AS id_b,
                  CAST(SUM(a.w2) AS HUGEINT) AS dt
           FROM feat a JOIN feat b
             ON a.tok = b.tok AND a.id < b.id
           GROUP BY 1, 2
         )
         SELECT d.id_a, d.id_b, CAST(d.dt AS BIGINT) AS dot_w,
                ROUND(CAST(d.dt AS DOUBLE)
                  / (sqrt(CAST(na.n2 AS DOUBLE))
                     * sqrt(CAST(nb.n2 AS DOUBLE))), 4) AS cosine
         FROM dot d
         JOIN norms na ON d.id_a = na.id
         JOIN norms nb ON d.id_b = nb.id
         WHERE d.dt * d.dt * 4 >= na.n2 * nb.n2""",

    "q171_tv_matrix" ->
      """WITH binned AS (
           SELECT source, LEAST(n_chars // 500, 20) AS bin
           FROM documents WHERE n_chars IS NOT NULL
         ), counts AS (
           SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c
           FROM binned GROUP BY 1, 2
         ), sizes AS (
           SELECT source, CAST(SUM(c) AS BIGINT) AS n
           FROM counts GROUP BY 1
         ), grid AS (
           SELECT s.source, b.bin, COALESCE(c.c, 0) AS c
           FROM sizes s
           CROSS JOIN (SELECT DISTINCT bin FROM counts) b
           LEFT JOIN counts c ON c.source = s.source AND c.bin = b.bin
         )
         SELECT a.source AS source_a, b.source AS source_b,
                sa.n AS n_a, sb.n AS n_b,
                CAST((SUM(ABS(CAST(a.c AS HUGEINT) * sb.n
                        - CAST(b.c AS HUGEINT) * sa.n)) * 1000000
                    + CAST(sa.n AS HUGEINT) * sb.n)
                  // (2 * CAST(sa.n AS HUGEINT) * sb.n) AS BIGINT)
                  AS tv_ppm
         FROM grid a
         JOIN grid b ON a.bin = b.bin AND a.source < b.source
         JOIN sizes sa ON sa.source = a.source
         JOIN sizes sb ON sb.source = b.source
         GROUP BY 1, 2, 3, 4""",

    "q172_rolling_median" ->
      """WITH daily AS (
           SELECT l_returnflag, date_trunc('day', l_shipdate) AS day,
                  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                    * 10000 AS HUGEINT)) AS BIGINT) AS rev_units
           FROM lineitem
           WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
           GROUP BY 1, 2
         ), w AS (
           SELECT l_returnflag, day, rev_units,
                  list_sort(list(rev_units) OVER (
                    PARTITION BY l_returnflag ORDER BY day
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
           FROM daily
         )
         SELECT l_returnflag, day, rev_units,
                win[(len(win) + 1) // 2] AS med7_units
         FROM w""",

    "q173_mann_kendall" ->
      """WITH daily AS (
           SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP))
                    // 86400000000 AS day,
                  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4))
                    * 100 AS BIGINT)) AS BIGINT) AS x
           FROM orders
           WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
           GROUP BY 1
         ), st AS (
           SELECT CAST(SUM(CAST(sign(b.x - a.x) AS BIGINT)) AS BIGINT)
                    AS s
           FROM daily a JOIN daily b ON a.day < b.day
         ), nt AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily
         ), ties AS (
           SELECT COALESCE(SUM(CAST(tc AS HUGEINT) * (tc - 1)
                    * (2 * tc + 5)), 0) AS tsum
           FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tc
                 FROM daily GROUP BY x)
         ), f AS (
           SELECT n, s,
                  CAST(n AS HUGEINT) * (n - 1) * (2 * n + 5) - tsum
                    AS var18
           FROM st, nt, ties
         )
         SELECT n AS n_days, s, CAST(var18 AS BIGINT) AS var18,
                CASE WHEN var18 > 0 THEN
                  ROUND((CAST(s AS DOUBLE) - sign(CAST(s AS DOUBLE)))
                    / sqrt(CAST(var18 AS DOUBLE) / 18.0), 4) END AS z
         FROM f""",

    "q174_assortativity" ->
      """WITH li AS (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem
         ), pairs AS (
           SELECT a.pk AS s1, b.pk AS s2
           FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING COUNT(*) >= 2
         ), edges AS (
           SELECT s1 AS src, s2 AS dst FROM pairs
           UNION ALL SELECT s2, s1 FROM pairs
         ), deg AS (
           SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
           FROM edges GROUP BY 1
         ), m AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS m2,
                  CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(CAST(dx.deg AS HUGEINT)) AS DOUBLE) AS sx,
                  CAST(SUM(CAST(dy.deg AS HUGEINT)) AS DOUBLE) AS sy,
                  CAST(SUM(CAST(dx.deg AS HUGEINT) * dy.deg) AS DOUBLE)
                    AS sxy,
                  CAST(SUM(CAST(dx.deg AS HUGEINT) * dx.deg) AS DOUBLE)
                    AS sxx,
                  CAST(SUM(CAST(dy.deg AS HUGEINT) * dy.deg) AS DOUBLE)
                    AS syy
           FROM edges e
           JOIN deg dx ON e.src = dx.node
           JOIN deg dy ON e.dst = dy.node
         ), c AS (
           SELECT m2, n*sxx - sx*sx AS vx, n*syy - sy*sy AS vy,
                  n*sxy - sx*sy AS cov
           FROM m
         )
         SELECT m2,
                CASE WHEN vx > 0 AND vy > 0
                  THEN ROUND(cov / (sqrt(vx) * sqrt(vy)), 4)
                END AS assortativity
         FROM c""",

    "q175_key_gaps" ->
      """WITH keys AS (
           SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS k
           FROM lineitem WHERE l_orderkey IS NOT NULL
         ), nxt AS (
           SELECT k, lead(k) OVER (ORDER BY k) AS k2 FROM keys
         )
         SELECT k + 1 AS gap_start, k2 - 1 AS gap_end,
                k2 - k - 1 AS n_missing
         FROM nxt WHERE k2 - k > 1""",

    "q177_price_volume_mix" ->
      """WITH li AS (
           SELECT p.p_brand,
                  year(l.l_shipdate) AS yr,
                  CAST(CAST(l.l_extendedprice AS DECIMAL(18,4)) * 100
                       AS BIGINT) AS cents,
                  CAST(CAST(l.l_quantity AS DECIMAL(18,4)) * 10000
                       AS BIGINT) AS qu
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE l.l_shipdate IS NOT NULL
             AND year(l.l_shipdate) IN (1995, 1996)
         ), agg AS (
           SELECT p_brand,
                  CAST(SUM(CASE WHEN yr = 1995 THEN cents ELSE 0 END)
                       AS HUGEINT) AS r1,
                  CAST(SUM(CASE WHEN yr = 1996 THEN cents ELSE 0 END)
                       AS HUGEINT) AS r2,
                  CAST(SUM(CASE WHEN yr = 1995 THEN qu ELSE 0 END)
                       AS HUGEINT) AS q1,
                  CAST(SUM(CASE WHEN yr = 1996 THEN qu ELSE 0 END)
                       AS HUGEINT) AS q2
           FROM li GROUP BY 1
         )
         SELECT p_brand,
                CAST(r1 AS BIGINT) AS rev1_cents,
                CAST(r2 AS BIGINT) AS rev2_cents,
                CAST(r2 - r1 AS BIGINT) AS delta_cents,
                CASE WHEN q1 > 0 AND q2 > 0 THEN
                  CASE WHEN r2 * q1 - r1 * q2 >= 0
                    THEN CAST((2 * (r2 * q1 - r1 * q2) + q1)
                         // (2 * q1) AS BIGINT)
                    ELSE -CAST((2 * (-(r2 * q1 - r1 * q2)) + q1)
                         // (2 * q1) AS BIGINT)
                  END
                END AS price_eff_cents,
                CASE WHEN q1 > 0 AND q2 > 0 THEN
                  CASE WHEN r1 * (q2 - q1) >= 0
                    THEN CAST((2 * (r1 * (q2 - q1)) + q1)
                         // (2 * q1) AS BIGINT)
                    ELSE -CAST((2 * (-(r1 * (q2 - q1))) + q1)
                         // (2 * q1) AS BIGINT)
                  END
                END AS volume_eff_cents
         FROM agg""",

    "q178_repeat_decay" ->
      """WITH per AS (
           SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS c
           FROM orders GROUP BY 1
         ), tot AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_cust FROM per
         ), spine AS (
           SELECT unnest(range(1, 13)) AS depth
         ), reached AS (
           SELECT s.depth, CAST(COUNT(*) AS BIGINT) AS n_reached
           FROM per p JOIN spine s ON p.c >= s.depth
           GROUP BY 1
         ), nx AS (
           SELECT depth, n_reached,
                  lead(n_reached) OVER (ORDER BY depth) AS nxt
           FROM reached
         )
         SELECT CAST(depth AS BIGINT) AS depth, n_reached,
                CAST((2 * CAST(n_reached AS HUGEINT) * 1000000
                    + (SELECT n_cust FROM tot))
                  // (2 * CAST((SELECT n_cust FROM tot) AS HUGEINT))
                  AS BIGINT) AS share_ppm,
                CASE WHEN nxt IS NOT NULL THEN
                  CAST((2 * CAST(nxt AS HUGEINT) * 1000000 + n_reached)
                    // (2 * CAST(n_reached AS HUGEINT)) AS BIGINT)
                END AS continue_ppm
         FROM nx""",

    "q179_purchase_gaps" ->
      """WITH lagged AS (
           SELECT o_orderdate,
                  lag(o_orderdate) OVER w AS prev
           FROM orders
           WHERE o_orderdate IS NOT NULL
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey)
         ), g AS (
           -- filter BEFORE the clamp: DuckDB's LEAST skips NULLs, so
           -- LEAST(NULL, 52) = 52 would leak first orders into the tail
           SELECT LEAST((epoch_us(o_orderdate) - epoch_us(prev))
                    // 604800000000, 52) AS week_bucket
           FROM lagged WHERE prev IS NOT NULL
         ), hist AS (
           SELECT week_bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps
           FROM g GROUP BY 1
         ), tot AS (
           SELECT CAST(SUM(n_gaps) AS BIGINT) AS n_total FROM hist
         )
         SELECT week_bucket, n_gaps,
                CAST((2 * CAST(n_gaps AS HUGEINT) * 1000000
                    + (SELECT n_total FROM tot))
                  // (2 * CAST((SELECT n_total FROM tot) AS HUGEINT))
                  AS BIGINT) AS share_ppm
         FROM hist""",

    "q180_tier_migration" ->
      """WITH per AS (
           SELECT o_custkey,
                  CAST(SUM(CASE WHEN year(o_orderdate) = 1995
                    THEN 1 ELSE 0 END) AS BIGINT) AS c1,
                  CAST(SUM(CASE WHEN year(o_orderdate) = 1996
                    THEN 1 ELSE 0 END) AS BIGINT) AS c2
           FROM orders
           WHERE o_orderdate IS NOT NULL
             AND year(o_orderdate) IN (1995, 1996)
           GROUP BY 1
         ), tiers AS (
           SELECT CASE WHEN c1 = 0 THEN 'none'
                       WHEN c1 = 1 THEN 'one_time'
                       WHEN c1 <= 3 THEN 'repeat'
                       ELSE 'loyal' END AS tier_from,
                  CASE WHEN c2 = 0 THEN 'none'
                       WHEN c2 = 1 THEN 'one_time'
                       WHEN c2 <= 3 THEN 'repeat'
                       ELSE 'loyal' END AS tier_to
           FROM per
         ), cells AS (
           SELECT tier_from, tier_to,
                  CAST(COUNT(*) AS BIGINT) AS n_customers
           FROM tiers GROUP BY 1, 2
         ), ft AS (
           SELECT tier_from, CAST(SUM(n_customers) AS BIGINT) AS t
           FROM cells GROUP BY 1
         )
         SELECT c.tier_from, c.tier_to, c.n_customers,
                CAST((2 * CAST(c.n_customers AS HUGEINT) * 1000000
                    + ft.t) // (2 * CAST(ft.t AS HUGEINT)) AS BIGINT)
                  AS share_ppm
         FROM cells c JOIN ft ON c.tier_from = ft.tier_from""",

    // the naive sliding-distinct: re-scan the 7-day band per output
    // day — exactly the corpus re-read the bitmap rollup avoids
    "q181_rolling_distinct" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day, count(*) AS n
           FROM events WHERE user_id IS NOT NULL GROUP BY 1)
         SELECT d.day, CAST(d.n AS BIGINT) AS n_events,
                CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users_7d
         FROM daily d JOIN events e
           ON e.user_id IS NOT NULL
          AND CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
         GROUP BY 1, 2""",

    // Gini / HHI / top-1 share per segment — exact HUGEINT rationals,
    // round-half-up ppm, non-negative numerators (no DIV sign trap)
    "q182_concentration" ->
      """WITH spend AS (
           SELECT o_custkey,
                  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4))
                      * 10000 AS BIGINT)) AS BIGINT) AS x
           FROM orders GROUP BY 1
         ), seg AS (
           SELECT c.c_mktsegment AS segment, s.x, s.o_custkey,
                  row_number() OVER (PARTITION BY c.c_mktsegment
                    ORDER BY s.x, s.o_custkey) AS i
           FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey
         ), m AS (
           SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
                  SUM(CAST(x AS HUGEINT)) AS sx,
                  SUM(CAST(x AS HUGEINT) * i) AS six,
                  SUM(CAST(x AS HUGEINT) * x) AS sxx,
                  MAX(x) AS xmax
           FROM seg GROUP BY 1
         )
         SELECT segment, n_customers,
                CAST((2 * (2*six - (n_customers+1)*sx) * 1000000
                    + n_customers*sx)
                  // (2 * n_customers * sx) AS BIGINT) AS gini_ppm,
                CAST((2 * sxx * 1000000 + sx*sx)
                  // (2 * sx * sx) AS BIGINT) AS hhi_ppm,
                CAST((2 * CAST(xmax AS HUGEINT) * 1000000 + sx)
                  // (2 * sx) AS BIGINT) AS top1_ppm
         FROM m""",

    // 8-step absorption into 'purchase': q113's ppm matrix, purchase
    // row dropped (modeled absorbing, value pinned to 1e6), then 8
    // UNROLLED integer matrix-vector steps — per-term (p*a)//1e6 on
    // non-negative longs, the exact Spark DIV replay
    "q183_absorption" ->
      """WITH pairs AS (
           SELECT event_type AS from_type,
                  lead(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS to_type
           FROM events
         ), t0 AS (
           SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
           FROM pairs WHERE to_type IS NOT NULL
           GROUP BY 1, 2
         ), m AS (
           SELECT from_type, to_type,
                  CAST((2000000 * CAST(n AS HUGEINT)
                        + sum(n) OVER (PARTITION BY from_type))
                       // (2 * sum(n) OVER (PARTITION BY from_type))
                       AS BIGINT) AS p_ppm
           FROM t0
         ), states AS (
           SELECT DISTINCT state FROM (
             SELECT from_type AS state FROM m
             UNION SELECT to_type FROM m)
         ), t AS (
           SELECT * FROM m WHERE from_type <> 'purchase'
         ), a0 AS (
           SELECT state,
                  CASE WHEN state = 'purchase' THEN 1000000
                       ELSE 0 END AS a
           FROM states
         ), a1 AS (
           SELECT st.state, CASE WHEN st.state = 'purchase' THEN 1000000
                  ELSE COALESCE(x.v, 0) END AS a
           FROM states st LEFT JOIN (
             SELECT t.from_type, SUM((t.p_ppm * p.a) // 1000000) AS v
             FROM t JOIN a0 p ON p.state = t.to_type GROUP BY 1) x
           ON x.from_type = st.state
         ), a2 AS (
           SELECT st.state, CASE WHEN st.state = 'purchase' THEN 1000000
                  ELSE COALESCE(x.v, 0) END AS a
           FROM states st LEFT JOIN (
             SELECT t.from_type, SUM((t.p_ppm * p.a) // 1000000) AS v
             FROM t JOIN a1 p ON p.state = t.to_type GROUP BY 1) x
           ON x.from_type = st.state
         ), a3 AS (
           SELECT st.state, CASE WHEN st.state = 'purchase' THEN 1000000
                  ELSE COALESCE(x.v, 0) END AS a
           FROM states st LEFT JOIN (
             SELECT t.from_type, SUM((t.p_ppm * p.a) // 1000000) AS v
             FROM t JOIN a2 p ON p.state = t.to_type GROUP BY 1) x
           ON x.from_type = st.state
         ), a4 AS (
           SELECT st.state, CASE WHEN st.state = 'purchase' THEN 1000000
                  ELSE COALESCE(x.v, 0) END AS a
           FROM states st LEFT JOIN (
             SELECT t.from_type, SUM((t.p_ppm * p.a) // 1000000) AS v
             FROM t JOIN a3 p ON p.state = t.to_type GROUP BY 1) x
           ON x.from_type = st.state
         ), a5 AS (
           SELECT st.state, CASE WHEN st.state = 'purchase' THEN 1000000
                  ELSE COALESCE(x.v, 0) END AS a
           FROM states st LEFT JOIN (
             SELECT t.from_type, SUM((t.p_ppm * p.a) // 1000000) AS v
             FROM t JOIN a4 p ON p.state = t.to_type GROUP BY 1) x
           ON x.from_type = st.state
         ), a6 AS (
           SELECT st.state, CASE WHEN st.state = 'purchase' THEN 1000000
                  ELSE COALESCE(x.v, 0) END AS a
           FROM states st LEFT JOIN (
             SELECT t.from_type, SUM((t.p_ppm * p.a) // 1000000) AS v
             FROM t JOIN a5 p ON p.state = t.to_type GROUP BY 1) x
           ON x.from_type = st.state
         ), a7 AS (
           SELECT st.state, CASE WHEN st.state = 'purchase' THEN 1000000
                  ELSE COALESCE(x.v, 0) END AS a
           FROM states st LEFT JOIN (
             SELECT t.from_type, SUM((t.p_ppm * p.a) // 1000000) AS v
             FROM t JOIN a6 p ON p.state = t.to_type GROUP BY 1) x
           ON x.from_type = st.state
         ), a8 AS (
           SELECT st.state, CASE WHEN st.state = 'purchase' THEN 1000000
                  ELSE COALESCE(x.v, 0) END AS a
           FROM states st LEFT JOIN (
             SELECT t.from_type, SUM((t.p_ppm * p.a) // 1000000) AS v
             FROM t JOIN a7 p ON p.state = t.to_type GROUP BY 1) x
           ON x.from_type = st.state
         )
         SELECT state, CAST(a AS BIGINT) AS p_convert_ppm FROM a8""",

    // custkey-blocked near-duplicate pairs; amount band in integer e4
    "q184_dup_payments" ->
      """WITH o AS (
           SELECT o_custkey, o_orderkey,
                  CAST(o_orderdate AS DATE) AS day,
                  CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                       AS BIGINT) AS amt
           FROM orders)
         SELECT a.o_custkey AS custkey, a.o_orderkey AS orderkey_a,
                b.o_orderkey AS orderkey_b,
                CAST(abs(a.day - b.day) AS BIGINT) AS day_gap,
                a.amt AS amt_a_e4, b.amt AS amt_b_e4
         FROM o a JOIN o b ON a.o_custkey = b.o_custkey
           AND a.o_orderkey < b.o_orderkey
           AND abs(a.day - b.day) <= 7
           AND abs(a.amt - b.amt) * 100 <= least(a.amt, b.amt) * 5""",

    // integer y*12+m month arithmetic on both engines; HUGEINT window
    // cumsum (integer segment tree is exact); truncating LTV division
    "q185_cohort_ltv" ->
      """WITH o AS (
           SELECT o_custkey,
                  CAST(EXTRACT(year FROM o_orderdate) * 12
                       + EXTRACT(month FROM o_orderdate) - 1
                       AS BIGINT) AS ym,
                  CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                       AS BIGINT) AS amt
           FROM orders
         ), coh AS (
           SELECT o_custkey, min(ym) AS cym FROM o GROUP BY 1
         ), sizes AS (
           SELECT cym, CAST(count(*) AS BIGINT) AS n_customers
           FROM coh GROUP BY 1
         ), cells AS (
           SELECT c.cym, o.ym - c.cym AS age_months,
                  CAST(count(*) AS BIGINT) AS n_orders,
                  SUM(CAST(amt AS HUGEINT)) AS rev
           FROM o JOIN coh c ON o.o_custkey = c.o_custkey GROUP BY 1, 2
         ), cum AS (
           SELECT cym, age_months, n_orders,
                  SUM(rev) OVER (PARTITION BY cym ORDER BY age_months
                                 ROWS UNBOUNDED PRECEDING) AS cumrev
           FROM cells)
         SELECT CAST(c.cym // 12 AS BIGINT) AS cohort_year,
                CAST(c.cym % 12 + 1 AS BIGINT) AS cohort_month,
                c.age_months, s.n_customers, c.n_orders,
                CAST(c.cumrev // s.n_customers AS BIGINT) AS ltv_e4
         FROM cum c JOIN sizes s ON c.cym = s.cym""",

    // full-corpus top-1 (the q32 ROUND-4 cosine pattern) then the
    // reciprocity self-join; each mutual pair emitted once (id_a<id_b)
    // q186/q187 ORACLE CEILING (r12 advice): these replay the EXACT
    // all-pairs branch, which annCandidateScores selects only while the
    // embeddings footer count ≤ spark.graft.ann.exactMaxRows (100k —
    // every tested SF qualifies; the ScaleUp sf1 world is 8k). Beyond
    // that the Spark side switches to the IVF candidate stage BY DESIGN
    // and these oracles no longer apply — `graft.AnnIvfCheck` is the
    // certification for that branch (conf-forced IVF vs exact on the
    // same world; r13 at sf1: recall@5 0.886, mutual-pair recall 0.84,
    // rounded-cos disagreements 0).
    "q186_mutual_nn" ->
      """WITH pairs AS (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
                  a.embedding AS qe, b.embedding AS ne
           FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id
         ), un AS (
           SELECT qid, nid, CAST(unnest(qe) AS DOUBLE) AS x,
                  CAST(unnest(ne) AS DOUBLE) AS y
           FROM pairs
         ), dots AS (
           SELECT qid, nid, SUM(x*y) AS dot, SUM(x*x) AS na,
                  SUM(y*y) AS nb
           FROM un GROUP BY qid, nid
         ), scored AS (
           SELECT qid, nid,
                  ROUND(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim
           FROM dots
         ), top1 AS (
           SELECT qid, nid, cos_sim FROM (
             SELECT qid, nid, cos_sim,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY cos_sim DESC, nid) AS rk
             FROM scored) WHERE rk = 1
         )
         SELECT x.qid AS id_a, x.nid AS id_b, x.cos_sim AS mutual_cos
         FROM top1 x JOIN top1 y
           ON x.nid = y.qid AND y.nid = x.qid AND x.qid < y.qid""",

    // top-5 by the q32 ROUND-4 cosine recipe, then label agreement in
    // round-half-up ppm over the constant k = 5
    "q187_knn_purity" ->
      """WITH pairs AS (
           SELECT a.vec_id AS qid, a.label AS qlabel,
                  b.vec_id AS nid, b.label AS nlabel,
                  a.embedding AS qe, b.embedding AS ne
           FROM embeddings a, embeddings b WHERE a.vec_id <> b.vec_id
         ), un AS (
           SELECT qid, qlabel, nid, nlabel,
                  CAST(unnest(qe) AS DOUBLE) AS x,
                  CAST(unnest(ne) AS DOUBLE) AS y
           FROM pairs
         ), dots AS (
           SELECT qid, qlabel, nid, nlabel, SUM(x*y) AS dot,
                  SUM(x*x) AS na, SUM(y*y) AS nb
           FROM un GROUP BY qid, qlabel, nid, nlabel
         ), ranked AS (
           SELECT qid, qlabel, nid, nlabel,
                  row_number() OVER (PARTITION BY qid ORDER BY
                    ROUND(dot / (sqrt(na) * sqrt(nb)), 4) DESC, nid)
                    AS rk
           FROM dots
         )
         SELECT qid AS vec_id, qlabel AS label,
                CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_same,
                CAST((2000000 * SUM(CASE WHEN nlabel = qlabel
                                    THEN 1 ELSE 0 END) + 5)
                     // 10 AS BIGINT) AS purity_ppm
         FROM ranked WHERE rk <= 5
         GROUP BY 1, 2""",

    // centered 7-day MA trend (full windows only), per-isodow seasonal
    // mean with the sign split out of the round-half-up division
    // (detrended values go negative; // floors, DIV truncates)
    "q188_seasonal_decomp" ->
      """WITH daily AS (
           SELECT CAST(o_orderdate AS DATE) AS day,
                  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4))
                      * 10000 AS BIGINT)) AS BIGINT) AS value_e4
           FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
         ), t AS (
           SELECT day, value_e4,
                  SUM(value_e4) OVER w AS s7, COUNT(*) OVER w AS n7
           FROM daily
           WINDOW w AS (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
         ), tr AS (
           SELECT day, value_e4,
                  CAST((2 * s7 + 7) // 14 AS BIGINT) AS trend_e4,
                  CAST(value_e4 - (2 * s7 + 7) // 14 AS BIGINT) AS d,
                  CAST(isodow(day) AS BIGINT) AS dow
           FROM t WHERE n7 = 7
         ), se AS (
           SELECT dow,
                  CAST(CASE WHEN SUM(d) >= 0
                    THEN (2 * SUM(d) + COUNT(*)) // (2 * COUNT(*))
                    ELSE -((2 * (-SUM(d)) + COUNT(*)) // (2 * COUNT(*)))
                  END AS BIGINT) AS seasonal_e4
           FROM tr GROUP BY 1
         )
         SELECT tr.day, tr.value_e4, tr.trend_e4, tr.dow,
                se.seasonal_e4,
                CAST(tr.d - se.seasonal_e4 AS BIGINT) AS remainder_e4
         FROM tr JOIN se ON tr.dow = se.dow""",
    // lead-lag OLS slope in pure integer rationals (no sqrt — the
    // correlation denominator is libm; the slope form is exact), with
    // the signed round-half-up sign split (Spark DIV truncates,
    // DuckDB // floors; identical on non-negatives only)
    "q189_lead_lag" ->
      """WITH daily AS (
           SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  CAST(COUNT(*) AS BIGINT) AS x,
                  SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100
                    AS BIGINT)) AS y
           FROM orders
           WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
           GROUP BY 1
         ), lags AS (
           SELECT CAST(range AS BIGINT) AS lag FROM range(-7, 8)
         ), p AS (
           SELECT l.lag, CAST(a.x AS HUGEINT) AS x, CAST(b.y AS HUGEINT) AS y
           FROM daily a CROSS JOIN lags l
           JOIN daily b ON b.day = a.day + l.lag
         ), agg AS (
           SELECT lag, CAST(COUNT(*) AS HUGEINT) AS n,
                  SUM(x) AS sx, SUM(y) AS sy,
                  SUM(x * y) AS sxy, SUM(x * x) AS sxx
           FROM p GROUP BY 1
         )
         SELECT lag, CAST(n AS BIGINT) AS n_pairs,
                CASE WHEN n * sxx - sx * sx > 0 THEN
                  CAST(CASE WHEN n * sxy - sx * sy >= 0
                    THEN (2 * (n * sxy - sx * sy) * 1000000
                          + (n * sxx - sx * sx))
                         // (2 * (n * sxx - sx * sx))
                    ELSE -((2 * (sx * sy - n * sxy) * 1000000
                            + (n * sxx - sx * sx))
                           // (2 * (n * sxx - sx * sx)))
                  END AS BIGINT) END AS beta_ppm
         FROM agg""",
    // survivorship rules replayed as windows: MODE = highest count,
    // smallest value; LATEST = max (day, orderkey)
    "q190_golden_record" ->
      """WITH obs AS (
           SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS day,
                  o_orderstatus, o_orderpriority,
                  CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                    AS BIGINT) AS amt_e4
           FROM orders
         ), md AS (
           SELECT o_custkey, o_orderstatus,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY COUNT(*) DESC, o_orderstatus) AS rn
           FROM obs GROUP BY o_custkey, o_orderstatus
         ), lt AS (
           SELECT o_custkey, o_orderpriority,
                  ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY day DESC, o_orderkey DESC) AS rn
           FROM obs
         ), f AS (
           SELECT o_custkey, MAX(amt_e4) AS max_amount_e4,
                  MIN(day) AS first_seen_day,
                  CAST(COUNT(*) AS BIGINT) AS n_obs
           FROM obs GROUP BY o_custkey
         )
         SELECT f.o_custkey AS custkey,
                md.o_orderstatus AS mode_status,
                lt.o_orderpriority AS latest_priority,
                f.max_amount_e4, f.first_seen_day, f.n_obs,
                COALESCE(c.c_mktsegment, 'UNKNOWN') AS segment
         FROM f
         JOIN md ON md.o_custkey = f.o_custkey AND md.rn = 1
         JOIN lt ON lt.o_custkey = f.o_custkey AND lt.rn = 1
         LEFT JOIN customer c ON c.c_custkey = f.o_custkey""",
    "q191_fd_discovery" ->
      """WITH c1 AS (SELECT l_orderkey AS a, CAST(l_returnflag AS VARCHAR) AS b, COUNT(*) AS c FROM lineitem GROUP BY 1,2),
         g1 AS (SELECT CAST(SUM(mc) AS BIGINT) AS keep_rows, CAST(SUM(n) AS BIGINT) AS n_rows FROM (SELECT a, MAX(c) AS mc, SUM(c) AS n FROM c1 GROUP BY a)),
         c2 AS (SELECT l_orderkey AS a, CAST(l_linestatus AS VARCHAR) AS b, COUNT(*) AS c FROM lineitem GROUP BY 1,2),
         g2 AS (SELECT CAST(SUM(mc) AS BIGINT) AS keep_rows, CAST(SUM(n) AS BIGINT) AS n_rows FROM (SELECT a, MAX(c) AS mc, SUM(c) AS n FROM c2 GROUP BY a)),
         c3 AS (SELECT l_partkey AS a, CAST(l_suppkey AS VARCHAR) AS b, COUNT(*) AS c FROM lineitem GROUP BY 1,2),
         g3 AS (SELECT CAST(SUM(mc) AS BIGINT) AS keep_rows, CAST(SUM(n) AS BIGINT) AS n_rows FROM (SELECT a, MAX(c) AS mc, SUM(c) AS n FROM c3 GROUP BY a)),
         c4 AS (SELECT l_suppkey AS a, CAST(l_returnflag AS VARCHAR) AS b, COUNT(*) AS c FROM lineitem GROUP BY 1,2),
         g4 AS (SELECT CAST(SUM(mc) AS BIGINT) AS keep_rows, CAST(SUM(n) AS BIGINT) AS n_rows FROM (SELECT a, MAX(c) AS mc, SUM(c) AS n FROM c4 GROUP BY a)),
         c5 AS (SELECT l_partkey AS a, CAST(l_returnflag AS VARCHAR) AS b, COUNT(*) AS c FROM lineitem GROUP BY 1,2),
         g5 AS (SELECT CAST(SUM(mc) AS BIGINT) AS keep_rows, CAST(SUM(n) AS BIGINT) AS n_rows FROM (SELECT a, MAX(c) AS mc, SUM(c) AS n FROM c5 GROUP BY a)),
         u AS (
           SELECT 'l_orderkey' AS lhs, 'l_returnflag' AS rhs, n_rows, keep_rows FROM g1
           UNION ALL SELECT 'l_orderkey', 'l_linestatus', n_rows, keep_rows FROM g2
           UNION ALL SELECT 'l_partkey', 'l_suppkey', n_rows, keep_rows FROM g3
           UNION ALL SELECT 'l_suppkey', 'l_returnflag', n_rows, keep_rows FROM g4
           UNION ALL SELECT 'l_partkey', 'l_returnflag', n_rows, keep_rows FROM g5
         )
         SELECT lhs, rhs, n_rows, keep_rows,
                CAST((2 * (n_rows - keep_rows) * 10000 + n_rows)
                     // (2 * n_rows) AS BIGINT) AS g3_e4
         FROM u""",
    // melt replayed as the ANSI UNION-ALL stack
    "q192_unpivot" ->
      """WITH wide AS (
           SELECT n.n_name,
                  CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,4))
                    * 10000 AS BIGINT)) AS BIGINT) AS revenue_e4,
                  CAST(COUNT(*) AS BIGINT) AS n_orders,
                  CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           GROUP BY 1
         )
         SELECT n_name, 'revenue_e4' AS metric, revenue_e4 AS value FROM wide
         UNION ALL
         SELECT n_name, 'n_orders', n_orders FROM wide
         UNION ALL
         SELECT n_name, 'n_customers', n_customers FROM wide""",
    // hop-bounded Bellman–Ford: after k relaxations dist = cheapest
    // cost over ≤k-hop paths, so the bounded run replays as k
    // unrolled min-plus CTEs (NOT a recursive CTE — weighted label
    // states explode; the unroll is the exact mirror of the loop)
    "q193_sssp" ->
      """WITH pr AS (
           SELECT a.l_partkey AS s1, b.l_partkey AS s2, COUNT(*) AS c
           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey < b.l_partkey
           GROUP BY 1, 2
         ), wp AS (
           SELECT s1, s2, CAST((1000 + c - 1) // c AS BIGINT) AS w FROM pr
         ), edges AS (
           SELECT s1 AS src, s2 AS dst, w FROM wp
           UNION ALL SELECT s2, s1, w FROM wp
         ), seeds AS (
           SELECT src AS node FROM edges
           GROUP BY src ORDER BY COUNT(*) DESC, src LIMIT 3
         ), d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seeds),
         d1 AS (SELECT node, MIN(dist) AS dist FROM (
           SELECT node, dist FROM d0 UNION ALL
           SELECT e.dst, p.dist + e.w FROM d0 p
           JOIN edges e ON p.node = e.src) GROUP BY node),
         d2 AS (SELECT node, MIN(dist) AS dist FROM (
           SELECT node, dist FROM d1 UNION ALL
           SELECT e.dst, p.dist + e.w FROM d1 p
           JOIN edges e ON p.node = e.src) GROUP BY node),
         d3 AS (SELECT node, MIN(dist) AS dist FROM (
           SELECT node, dist FROM d2 UNION ALL
           SELECT e.dst, p.dist + e.w FROM d2 p
           JOIN edges e ON p.node = e.src) GROUP BY node),
         d4 AS (SELECT node, MIN(dist) AS dist FROM (
           SELECT node, dist FROM d3 UNION ALL
           SELECT e.dst, p.dist + e.w FROM d3 p
           JOIN edges e ON p.node = e.src) GROUP BY node),
         d5 AS (SELECT node, MIN(dist) AS dist FROM (
           SELECT node, dist FROM d4 UNION ALL
           SELECT e.dst, p.dist + e.w FROM d4 p
           JOIN edges e ON p.node = e.src) GROUP BY node),
         d6 AS (SELECT node, MIN(dist) AS dist FROM (
           SELECT node, dist FROM d5 UNION ALL
           SELECT e.dst, p.dist + e.w FROM d5 p
           JOIN edges e ON p.node = e.src) GROUP BY node),
         d7 AS (SELECT node, MIN(dist) AS dist FROM (
           SELECT node, dist FROM d6 UNION ALL
           SELECT e.dst, p.dist + e.w FROM d6 p
           JOIN edges e ON p.node = e.src) GROUP BY node),
         d8 AS (SELECT node, MIN(dist) AS dist FROM (
           SELECT node, dist FROM d7 UNION ALL
           SELECT e.dst, p.dist + e.w FROM d7 p
           JOIN edges e ON p.node = e.src) GROUP BY node)
         SELECT node AS partkey, CAST(dist AS BIGINT) AS cost FROM d8""",
    // exact integer-lattice Lloyd rounds: floor-e6 points (floor, not
    // CAST — DuckDB CAST rounds, ANSI Spark truncates), squared-long
    // distances, smallest-cid ties, signed round-half-up means; three
    // unrolled assign/update rounds mirror the loop exactly
    "q194_kmeans" ->
      """WITH base AS (
           SELECT vec_id,
                  [CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                   for x in embedding] AS e6
           FROM embeddings
         ), pdim AS (
           SELECT vec_id, i, e6[i] AS e
           FROM (SELECT vec_id, e6,
                        unnest(generate_series(1, len(e6))) AS i
                 FROM base)
         ), c0 AS (
           SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                    AS cid, vec_id
           FROM (SELECT vec_id FROM base ORDER BY vec_id LIMIT 8)
         ), cd0 AS (
           SELECT c0.cid, p.i, p.e FROM c0 JOIN pdim p USING (vec_id)
         ), a1 AS (
           SELECT p.vec_id, c.cid, SUM((p.e - c.e) * (p.e - c.e)) AS d2
           FROM pdim p JOIN cd0 c ON p.i = c.i GROUP BY 1, 2
         ), asg1 AS (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY d2, cid) AS rn FROM a1) WHERE rn = 1
         ), cd1 AS (
           SELECT a.cid, p.i,
                  CASE WHEN SUM(p.e) >= 0
                    THEN (2 * SUM(p.e) + COUNT(*)) // (2 * COUNT(*))
                    ELSE -((2 * (-SUM(p.e)) + COUNT(*)) // (2 * COUNT(*)))
                  END AS e
           FROM pdim p JOIN asg1 a USING (vec_id) GROUP BY 1, 2
         ), a2 AS (
           SELECT p.vec_id, c.cid, SUM((p.e - c.e) * (p.e - c.e)) AS d2
           FROM pdim p JOIN cd1 c ON p.i = c.i GROUP BY 1, 2
         ), asg2 AS (
           SELECT vec_id, cid FROM (
             SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY d2, cid) AS rn FROM a2) WHERE rn = 1
         ), cd2 AS (
           SELECT a.cid, p.i,
                  CASE WHEN SUM(p.e) >= 0
                    THEN (2 * SUM(p.e) + COUNT(*)) // (2 * COUNT(*))
                    ELSE -((2 * (-SUM(p.e)) + COUNT(*)) // (2 * COUNT(*)))
                  END AS e
           FROM pdim p JOIN asg2 a USING (vec_id) GROUP BY 1, 2
         ), a3 AS (
           SELECT p.vec_id, c.cid, SUM((p.e - c.e) * (p.e - c.e)) AS d2
           FROM pdim p JOIN cd2 c ON p.i = c.i GROUP BY 1, 2
         )
         SELECT vec_id, CAST(cid AS BIGINT) AS cid,
                CAST(d2 AS BIGINT) AS d2
         FROM (SELECT vec_id, cid, d2, ROW_NUMBER() OVER (
                 PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM a3)
         WHERE rn = 1""",
    // Gini is a pure rational in counts (entropy needs ln — libm);
    // per-value e9 terms round-half-up THEN sum exactly (q155 rule)
    "q195_gini_rank" ->
      """WITH root AS (
           SELECT CAST((2 * (n * n - s2) * 1000000000 + n * n)
                  // (2 * n * n) AS BIGINT) AS root_e9
           FROM (SELECT CAST(SUM(k) AS HUGEINT) AS n,
                        CAST(SUM(CAST(k AS HUGEINT) * k) AS HUGEINT) AS s2
                 FROM (SELECT COUNT(*) AS k FROM orders
                       GROUP BY o_orderstatus))
         ), pv1 AS (
           SELECT v, CAST(SUM(k) AS HUGEINT) AS nv,
                  CAST(SUM(CAST(k AS HUGEINT) * k) AS HUGEINT) AS s2
           FROM (SELECT COALESCE(o_orderpriority, '∅') AS v,
                        COALESCE(o_orderstatus, '∅') AS c, COUNT(*) AS k
                 FROM orders GROUP BY 1, 2)
           GROUP BY v
         ), f1 AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
                  CAST(SUM(CAST((2 * (nv * nv - s2) * 1000000000 + n * nv)
                    // (2 * n * nv) AS BIGINT)) AS BIGINT) AS split_e9
           FROM (SELECT v, nv, s2, SUM(nv) OVER () AS n FROM pv1)
         ), pv2 AS (
           SELECT v, CAST(SUM(k) AS HUGEINT) AS nv,
                  CAST(SUM(CAST(k AS HUGEINT) * k) AS HUGEINT) AS s2
           FROM (SELECT COALESCE(CAST(year(o_orderdate) AS VARCHAR), '∅')
                          AS v,
                        COALESCE(o_orderstatus, '∅') AS c, COUNT(*) AS k
                 FROM orders GROUP BY 1, 2)
           GROUP BY v
         ), f2 AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
                  CAST(SUM(CAST((2 * (nv * nv - s2) * 1000000000 + n * nv)
                    // (2 * n * nv) AS BIGINT)) AS BIGINT) AS split_e9
           FROM (SELECT v, nv, s2, SUM(nv) OVER () AS n FROM pv2)
         ), pv3 AS (
           SELECT v, CAST(SUM(k) AS HUGEINT) AS nv,
                  CAST(SUM(CAST(k AS HUGEINT) * k) AS HUGEINT) AS s2
           FROM (SELECT COALESCE(c.c_mktsegment, '∅') AS v,
                        COALESCE(o.o_orderstatus, '∅') AS c, COUNT(*) AS k
                 FROM orders o JOIN customer c
                   ON o.o_custkey = c.c_custkey GROUP BY 1, 2)
           GROUP BY v
         ), f3 AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
                  CAST(SUM(CAST((2 * (nv * nv - s2) * 1000000000 + n * nv)
                    // (2 * n * nv) AS BIGINT)) AS BIGINT) AS split_e9
           FROM (SELECT v, nv, s2, SUM(nv) OVER () AS n FROM pv3)
         )
         SELECT 'o_orderpriority' AS feature, n_values, split_e9,
                root_e9 - split_e9 AS gain_e9 FROM f1, root
         UNION ALL
         SELECT 'order_year', n_values, split_e9,
                root_e9 - split_e9 FROM f2, root
         UNION ALL
         SELECT 'c_mktsegment', n_values, split_e9,
                root_e9 - split_e9 FROM f3, root""",
    // anchors via IGNORE NULLS frames; the increment rounds with the
    // sign split and the division runs on the increment so both
    // engines round the identical rational
    "q196_interp_fill" ->
      """WITH daily AS (
           SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
                  CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,4))
                    * 10000 AS BIGINT)) AS BIGINT) AS v
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           WHERE o.o_orderdate IS NOT NULL
           GROUP BY 1, 2
         ), spine AS (
           SELECT n_name,
                  CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                    AS DATE) AS day
           FROM (SELECT n_name, MIN(day) AS d0, MAX(day) AS d1
                 FROM daily GROUP BY 1)
         ), w AS (
           SELECT s.n_name, s.day, d.v,
             last_value(d.v IGNORE NULLS) OVER
               (PARTITION BY s.n_name ORDER BY s.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN d.v IS NOT NULL THEN s.day END
               IGNORE NULLS) OVER
               (PARTITION BY s.n_name ORDER BY s.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
             first_value(d.v IGNORE NULLS) OVER
               (PARTITION BY s.n_name ORDER BY s.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN d.v IS NOT NULL THEN s.day END
               IGNORE NULLS) OVER
               (PARTITION BY s.n_name ORDER BY s.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
           FROM spine s LEFT JOIN daily d
             ON s.n_name = d.n_name AND s.day = d.day
         )
         SELECT n_name, day,
           CAST(CASE WHEN v IS NOT NULL THEN v
             ELSE pv + CASE WHEN (nv - pv) >= 0
               THEN (2 * (nv - pv) * (day - pd) + (nd - pd))
                    // (2 * (nd - pd))
               ELSE -((2 * (pv - nv) * (day - pd) + (nd - pd))
                      // (2 * (nd - pd))) END
           END AS BIGINT) AS value_e4,
           (v IS NULL) AS is_interp
         FROM w""",
    // 60-bit row hash from the md5 hex prefix (engine-identical), then
    // BIT_XOR per month — commutative/associative/self-inverse, so the
    // checksum is order-free and map-side combinable
    "q197_table_checksum" ->
      """WITH h AS (
           SELECT COALESCE(strftime(o_orderdate, '%Y-%m'), 'unknown')
                    AS month,
                  md5(concat_ws('|',
                    CAST(o_orderkey AS VARCHAR),
                    CAST(o_custkey AS VARCHAR),
                    COALESCE(o_orderstatus, '∅'),
                    CAST(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                      AS BIGINT) AS VARCHAR),
                    COALESCE(CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
                      '∅'),
                    COALESCE(o_orderpriority, '∅'))) AS hx
           FROM orders
         )
         SELECT month, CAST(COUNT(*) AS BIGINT) AS n_rows,
                CAST(bit_xor(list_sum(
                  [(CAST(strpos('0123456789abcdef', hx[i]) AS BIGINT) - 1)
                   << ((15 - i) * 4) for i in range(1, 16)]))
                  AS BIGINT) AS cksum
         FROM h GROUP BY month""",
    // exact medoid replay: brute-force all-pairs squared distance per
    // label in HUGEINT on the same e6 lattice — equals the engine's
    // centroid decomposition exactly (both are Σ_j |p_i − p_j|² in
    // exact integer arithmetic)
    "q198_medoid" ->
      """WITH pts AS (
           SELECT vec_id, CAST(label AS BIGINT) AS label,
                  [CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                   for x in embedding] AS e6
           FROM embeddings
         ), dims AS (
           SELECT vec_id, label, i, e6[i] AS e
           FROM (SELECT vec_id, label, e6,
                        unnest(generate_series(1, len(e6))) AS i
                 FROM pts)
         ), pd AS (
           SELECT a.label, a.vec_id AS vid, b.vec_id AS oid,
                  SUM(CAST(a.e - b.e AS HUGEINT)
                      * CAST(a.e - b.e AS HUGEINT)) AS d2
           FROM dims a JOIN dims b
             ON a.label = b.label AND a.i = b.i
           GROUP BY a.label, a.vec_id, b.vec_id
         ), score AS (
           SELECT label, vid AS vec_id,
                  CAST(SUM(d2) AS HUGEINT) AS s,
                  CAST(COUNT(*) AS HUGEINT) AS n
           FROM pd GROUP BY label, vid
         ), ranked AS (
           SELECT label, vec_id AS medoid_id, CAST(n AS BIGINT) AS n,
                  CAST((2 * s + n) // (2 * n) AS BIGINT) AS mean_d2,
                  ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY s, vec_id) AS rk
           FROM score
         )
         SELECT label, medoid_id, n, mean_d2 FROM ranked WHERE rk = 1""",
    // vocab-growth replay: same whitespace tokens, per-source doc rank
    // by doc_id, power-of-two checkpoints ∪ {n_docs}, cumulative token
    // count + first-position distinct count — all integer-exact
    "q199_vocab_growth" ->
      """WITH docs AS (
           SELECT doc_id, source,
                  list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    t -> t <> '') AS tk,
                  CAST(ROW_NUMBER() OVER (PARTITION BY source
                                          ORDER BY doc_id) AS BIGINT)
                    AS pos
           FROM documents WHERE text IS NOT NULL
         ), ns AS (
           SELECT source, MAX(pos) AS _n FROM docs GROUP BY source
         ), cps AS (
           SELECT source, CAST(power(2, k) AS BIGINT) AS checkpoint
           FROM ns, (SELECT unnest(generate_series(0, 40)) AS k)
           WHERE CAST(power(2, k) AS BIGINT) <= _n
           UNION
           SELECT source, _n AS checkpoint FROM ns
         ), perdoc AS (
           SELECT source, pos, CAST(len(tk) AS BIGINT) AS _ntk FROM docs
         ), firstpos AS (
           SELECT source, _tok, MIN(pos) AS _fp
           FROM (SELECT source, pos, unnest(tk) AS _tok FROM docs)
           GROUP BY source, _tok
         ), cumtok AS (
           SELECT d.source, c.checkpoint,
                  CAST(SUM(d._ntk) AS BIGINT) AS n_tokens
           FROM perdoc d JOIN cps c
             ON d.source = c.source AND d.pos <= c.checkpoint
           GROUP BY 1, 2
         ), cumdist AS (
           SELECT f.source, c.checkpoint,
                  CAST(COUNT(*) AS BIGINT) AS n_distinct
           FROM firstpos f JOIN cps c
             ON f.source = c.source AND f._fp <= c.checkpoint
           GROUP BY 1, 2
         )
         SELECT t.source, t.checkpoint, t.n_tokens, d.n_distinct
         FROM cumtok t JOIN cumdist d
           ON t.source = d.source AND t.checkpoint = d.checkpoint""",
    // Holt replay: identical integer recursion as a lockstep recursive
    // CTE — the round-half-away-from-zero CASE arithmetic is expanded
    // inline (l₁ appears twice inside b₁'s sign split)
    "q200_holt_smoothing" ->
      """WITH RECURSIVE daily AS (
           SELECT n.n_name AS nation,
                  date_trunc('day', o.o_orderdate) AS day,
                  CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,4))
                    * 10000 AS BIGINT)) AS BIGINT) AS y
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           WHERE o.o_orderdate IS NOT NULL
             AND o.o_totalprice IS NOT NULL
           GROUP BY 1, 2
         ), seq AS (
           SELECT nation, day, y,
                  CAST(ROW_NUMBER() OVER (PARTITION BY nation
                                          ORDER BY day) AS BIGINT) AS rn
           FROM daily
         ), ns AS (
           SELECT nation, MAX(rn) AS n_days FROM seq GROUP BY 1
         ), hw(nation, rn, l, b) AS (
           SELECT nation, rn, y, CAST(0 AS BIGINT) FROM seq WHERE rn = 1
           UNION ALL
           SELECT s.nation, s.rn,
             CASE WHEN s.y + h.l + h.b >= 0
                  THEN ((s.y + h.l + h.b) * 2 + 2) // 4
                  ELSE -(((-(s.y + h.l + h.b)) * 2 + 2) // 4) END,
             CASE WHEN (CASE WHEN s.y + h.l + h.b >= 0
                        THEN ((s.y + h.l + h.b) * 2 + 2) // 4
                        ELSE -(((-(s.y + h.l + h.b)) * 2 + 2) // 4) END)
                       - h.l + 3 * h.b >= 0
               THEN (((CASE WHEN s.y + h.l + h.b >= 0
                       THEN ((s.y + h.l + h.b) * 2 + 2) // 4
                       ELSE -(((-(s.y + h.l + h.b)) * 2 + 2) // 4) END)
                      - h.l + 3 * h.b) * 2 + 4) // 8
               ELSE -(((-((CASE WHEN s.y + h.l + h.b >= 0
                        THEN ((s.y + h.l + h.b) * 2 + 2) // 4
                        ELSE -(((-(s.y + h.l + h.b)) * 2 + 2) // 4) END)
                       - h.l + 3 * h.b)) * 2 + 4) // 8) END
           FROM hw h JOIN seq s
             ON s.nation = h.nation AND s.rn = h.rn + 1
         )
         SELECT h.nation, ns.n_days, h.l AS level_units,
                h.b AS trend_units,
                h.l + 7 * h.b AS forecast7_units
         FROM hw h JOIN ns
           ON ns.nation = h.nation AND h.rn = ns.n_days""",
    "q201_rev_rec" ->
      """WITH ship AS (
           SELECT l_orderkey,
                  date_trunc('month', MAX(l_shipdate)) AS m_end
           FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1
         ), o AS (
           SELECT o_orderkey, date_trunc('month', o_orderdate) AS m_start,
                  CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
                    AS BIGINT) AS total
           FROM orders
           WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
         ), spans AS (
           SELECT o.total, o.m_start,
                  GREATEST(CAST(date_diff('month', o.m_start, s.m_end)
                    AS BIGINT), 0) + 1 AS k
           FROM o JOIN ship s ON o.o_orderkey = s.l_orderkey
         ), alloc AS (
           SELECT CAST(m_start + jj * INTERVAL 1 MONTH AS DATE) AS month,
                  total // k + CASE WHEN jj < total % k THEN 1 ELSE 0 END
                    AS a
           FROM spans,
                unnest(generate_series(0, CAST(k - 1 AS INT))) t(jj)
         )
         SELECT month, CAST(SUM(a) AS BIGINT) AS recognized_units,
                CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM alloc GROUP BY 1""",
    // the null next-event rows filter BEFORE the cap on BOTH sides —
    // LEAST skips NULLs in both engines, so a NULL gap would silently
    // become the cap (the q179 rule)
    "q202_dwell_time" ->
      """WITH raw AS (
           SELECT event_type,
                  CAST(epoch_us(LEAD(ts) OVER w) - epoch_us(ts)
                    AS BIGINT) AS gap0
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), g AS (
           SELECT event_type, LEAST(gap0, 1800000000) AS gap_us
           FROM raw WHERE gap0 IS NOT NULL
         )
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
                CAST(SUM(gap_us) AS BIGINT) AS total_dwell_us,
                CAST((2 * SUM(gap_us) + 1000 * COUNT(*))
                     // (2000 * COUNT(*)) AS BIGINT) AS mean_dwell_ms
         FROM g GROUP BY 1""",
    "q204_transition_latency" ->
      """WITH g AS (
           SELECT event_type AS from_type,
                  LEAD(event_type) OVER w AS to_type,
                  CAST(epoch_us(LEAD(ts) OVER w) - epoch_us(ts)
                    AS BIGINT) AS gap_us,
                  user_id, event_id
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), r AS (
           SELECT from_type, to_type, gap_us,
                  CAST(ROW_NUMBER() OVER (PARTITION BY from_type, to_type
                    ORDER BY gap_us, user_id, event_id) AS BIGINT) AS rk,
                  CAST(COUNT(*) OVER (PARTITION BY from_type, to_type)
                    AS BIGINT) AS n
           FROM g WHERE to_type IS NOT NULL
         )
         SELECT from_type, to_type, n,
                CAST((2 * MIN(CASE WHEN rk = (n + 1) // 2
                                   THEN gap_us END) + 1000) // 2000
                  AS BIGINT) AS median_gap_ms,
                CAST((2 * MIN(CASE WHEN rk = (9 * n + 9) // 10
                                   THEN gap_us END) + 1000) // 2000
                  AS BIGINT) AS p90_gap_ms
         FROM r
         WHERE rk = (n + 1) // 2 OR rk = (9 * n + 9) // 10
         GROUP BY 1, 2, 3""",
    "q205_k_anonymity" ->
      """WITH sizes AS (
           SELECT c_nationkey, c_mktsegment,
                  CAST(COUNT(*) AS BIGINT) AS g
           FROM customer GROUP BY 1, 2
         ), tot AS (
           SELECT CAST(SUM(g) AS BIGINT) AS n,
                  CAST(COUNT(*) AS BIGINT) AS n_groups,
                  CAST(MIN(g) AS BIGINT) AS min_group_size
           FROM sizes
         ), ks AS (
           SELECT CAST(unnest([2, 5, 10, 25]) AS BIGINT) AS k
         )
         SELECT ks.k, tot.n_groups, tot.min_group_size,
                CAST(COALESCE(COUNT(CASE WHEN s.g < ks.k THEN 1 END), 0)
                  AS BIGINT) AS n_groups_below,
                CAST(COALESCE(SUM(CASE WHEN s.g < ks.k THEN s.g END), 0)
                  AS BIGINT) AS rows_at_risk,
                CAST((2000000 * COALESCE(SUM(CASE WHEN s.g < ks.k
                       THEN s.g END), 0) + tot.n) // (2 * tot.n)
                  AS BIGINT) AS risk_ppm
         FROM ks CROSS JOIN tot LEFT JOIN sizes s ON TRUE
         GROUP BY 1, 2, 3, tot.n""",
    "q203_share_of_parent" ->
      """WITH natrev AS (
           SELECT r.r_name AS region, n.n_name AS nation,
                  CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,4))
                    * 10000 AS BIGINT)) AS HUGEINT) AS rev
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           WHERE o.o_totalprice IS NOT NULL
           GROUP BY 1, 2
         ), regtot AS (
           SELECT region, CAST(SUM(rev) AS HUGEINT) AS rr
           FROM natrev GROUP BY 1
         ), gtot AS (
           SELECT CAST(SUM(rr) AS HUGEINT) AS g FROM regtot
         )
         SELECT nv.region, nv.nation,
                CAST(nv.rev AS BIGINT) AS rev_units,
                CAST((2000000 * nv.rev + rt.rr) // (2 * rt.rr)
                  AS BIGINT) AS nation_share_ppm,
                CAST(rt.rr AS BIGINT) AS region_rev_units,
                CAST((2000000 * rt.rr + gl.g) // (2 * gl.g)
                  AS BIGINT) AS region_share_ppm
         FROM natrev nv
         JOIN regtot rt ON nv.region = rt.region
         CROSS JOIN gtot gl""",
    "q206_entry_paths" ->
      """WITH e AS (
           SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us
           FROM events
         ), s1 AS (
           SELECT *, CASE WHEN us - LAG(us) OVER w IS NULL
                            OR us - LAG(us) OVER w > 14400000000
                          THEN 1 ELSE 0 END AS nw
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), s2 AS (
           SELECT *, SUM(nw) OVER (PARTITION BY user_id
             ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM s1
         ), s3 AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
             ORDER BY ts, event_id) AS rn
           FROM s2
         ), p AS (
           SELECT user_id, sid,
                  string_agg(event_type, ' > ' ORDER BY rn) AS path
           FROM s3 WHERE rn <= 3 GROUP BY 1, 2
         )
         SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
         FROM p GROUP BY 1
         ORDER BY n_sessions DESC, path LIMIT 20""",
    "q207_term_screen" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(h) AS BIGINT) AS total_hits,
                CAST(SUM(CASE WHEN h >= 3 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_flagged,
                CAST((2000000 * SUM(CASE WHEN h >= 3 THEN 1 ELSE 0 END)
                      + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
                  AS flag_rate_ppm
         FROM (
           SELECT source,
                  CAST(len(list_filter(
                    string_split_regex(lower(trim(text)), '\s+'),
                    t -> list_contains(['slow', 'dup', 'big'], t)))
                    AS BIGINT) AS h
           FROM documents WHERE text IS NOT NULL
         ) GROUP BY 1""",
    "q208_twap" ->
      """WITH obs AS (
           SELECT p.p_brand,
                  epoch_us(date_trunc('day', l.l_shipdate)) AS us,
                  CAST(CAST(l.l_extendedprice AS DECIMAL(18,4)) * 10000
                    AS BIGINT) AS pr,
                  l.l_orderkey, l.l_linenumber
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE l.l_shipdate IS NOT NULL
             AND l.l_extendedprice IS NOT NULL
         ), seg AS (
           SELECT p_brand, us, pr, LEAD(us) OVER w AS nus
           FROM obs
           WINDOW w AS (PARTITION BY p_brand
                        ORDER BY us, pr, l_orderkey, l_linenumber)
         )
         SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_segments,
                CASE WHEN SUM(nus - us) > 0
                  THEN CAST((2 * SUM(CAST(pr AS HUGEINT) * (nus - us))
                             + SUM(nus - us)) // (2 * SUM(nus - us))
                    AS BIGINT) END AS twap_units
         FROM seg WHERE nus IS NOT NULL GROUP BY 1""",
    // same magic choice (md5 first hex digit mod 3), same sniff on the
    // leading bytes; DuckDB hex() is uppercase like Spark's
    "q209_format_census" ->
      """WITH blobs AS (
           SELECT source,
                  unhex(CASE (strpos('0123456789abcdef',
                           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                         - 1) % 3
                        WHEN 0 THEN 'FFD8' WHEN 1 THEN '8950'
                        ELSE '5249' END)
                    || encode(text) AS media
           FROM documents WHERE text IS NOT NULL
         ), sniffed AS (
           SELECT source,
                  CASE substr(hex(media), 1, 4)
                    WHEN 'FFD8' THEN 'jpeg' WHEN '8950' THEN 'png'
                    WHEN '5249' THEN 'riff' ELSE 'unknown' END AS format,
                  CAST(octet_length(media) AS BIGINT) AS b
           FROM blobs
         ), census AS (
           SELECT source, format, CAST(COUNT(*) AS BIGINT) AS n_blobs,
                  CAST(SUM(b) AS BIGINT) AS total_bytes
           FROM sniffed GROUP BY 1, 2
         ), tot AS (
           SELECT source, CAST(SUM(n_blobs) AS BIGINT) AS n
           FROM census GROUP BY 1
         )
         SELECT c.source, c.format, c.n_blobs, c.total_bytes,
                CAST((2000000 * c.n_blobs + t.n) // (2 * t.n) AS BIGINT)
                  AS mix_ppm
         FROM census c JOIN tot t ON c.source = t.source""",
    "q210_spend_gini" ->
      """WITH spend AS (
           SELECT n.n_name AS nation, o.o_custkey,
                  CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,4))
                    * 10000 AS BIGINT)) AS BIGINT) AS x
           FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           WHERE o.o_totalprice IS NOT NULL
           GROUP BY 1, 2
         ), r AS (
           SELECT nation, x,
                  CAST(ROW_NUMBER() OVER (PARTITION BY nation
                    ORDER BY x, o_custkey) AS HUGEINT) AS i
           FROM spend
         ), a AS (
           SELECT nation, CAST(COUNT(*) AS HUGEINT) AS n,
                  CAST(SUM(x) AS HUGEINT) AS sx,
                  CAST(SUM(i * x) AS HUGEINT) AS six
           FROM r GROUP BY 1
         )
         SELECT nation, CAST(n AS BIGINT) AS n_customers,
                CAST(sx AS BIGINT) AS total_spend_units,
                CAST((2 * ((2 * six - (n + 1) * sx) * 1000000)
                      + (n * sx)) // (2 * (n * sx)) AS BIGINT)
                  AS gini_ppm
         FROM a""",
    // same minimax closed form fitted(i) = max_{j<=i} min_{k>=i}
    // wavg(j..k); rational argmin/argmax picked by double division —
    // exact-decision here because distinct rationals with den ≤ cells
    // differ by ≥ 1/(d1·d2) ≫ ulp — and the e4 emission is integer
    // round-half-up from the picked (num, den), which is invariant
    // under representation scaling
    "q211_isotonic" ->
      """WITH cells AS (
           SELECT p.p_brand AS brand,
                  CAST(CAST(l.l_discount AS DECIMAL(18,4)) * 100
                    AS BIGINT) AS dpct,
                  CAST(COUNT(*) AS BIGINT) AS w,
                  CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(18,4))
                    AS BIGINT)) AS BIGINT) AS sy
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE l.l_quantity IS NOT NULL AND l.l_discount IS NOT NULL
           GROUP BY 1, 2
         ), idx AS (
           SELECT brand, dpct, w, sy,
                  ROW_NUMBER() OVER (PARTITION BY brand
                    ORDER BY dpct) AS i,
                  CAST(SUM(w) OVER (PARTITION BY brand ORDER BY dpct)
                    AS BIGINT) AS pw,
                  CAST(SUM(sy) OVER (PARTITION BY brand ORDER BY dpct)
                    AS BIGINT) AS psy
           FROM cells
         ), tri AS (
           SELECT a.brand, a.i, a.dpct, a.w, a.sy, j.i AS j,
                  k.psy - (j.psy - j.sy) AS num,
                  k.pw - (j.pw - j.w) AS den
           FROM idx a
           JOIN idx j ON j.brand = a.brand AND j.i <= a.i
           JOIN idx k ON k.brand = a.brand AND k.i >= a.i
         ), mn AS (
           SELECT brand, i, dpct, w, sy, j,
                  arg_min(struct_pack(num := num, den := den),
                          num / CAST(den AS DOUBLE)) AS r
           FROM tri GROUP BY 1, 2, 3, 4, 5, 6
         ), mx AS (
           SELECT brand, i, dpct, w, sy,
                  arg_max(r, r['num'] / CAST(r['den'] AS DOUBLE)) AS r
           FROM mn GROUP BY 1, 2, 3, 4, 5
         )
         SELECT brand, dpct AS disc_pct, w AS n_rows,
                CAST((20000 * sy + w) // (2 * w) AS BIGINT)
                  AS raw_avg_qty_e4,
                CAST((20000 * r['num'] + r['den']) // (2 * r['den'])
                  AS BIGINT) AS iso_avg_qty_e4
         FROM mx""",
    // same user-day journeys, v(S) by subset containment on the 2^n
    // lattice, factorial weights in HUGEINT; φ stays n!-scaled until
    // the integer round-half-up emission
    "q212_shapley" ->
      """WITH RECURSIVE base AS (
           SELECT user_id, date_trunc('day', ts) AS day, event_type
           FROM events WHERE user_id IS NOT NULL
         ), chans AS (
           SELECT event_type AS ch,
                  CAST(1 AS BIGINT) << CAST(ROW_NUMBER() OVER
                    (ORDER BY event_type) - 1 AS INT) AS bit
           FROM (SELECT DISTINCT event_type FROM base
                 WHERE event_type IS NOT NULL
                   AND event_type != 'purchase')
         ), nn AS (SELECT CAST(COUNT(*) AS INT) AS n FROM chans),
         j AS (
           SELECT b.user_id, b.day,
                  COALESCE(bit_or(c.bit), 0) AS mask,
                  MAX(CASE WHEN b.event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS conv
           FROM base b LEFT JOIN chans c ON b.event_type = c.ch
           GROUP BY 1, 2
         ), jm AS (
           SELECT mask, CAST(SUM(conv) AS BIGINT) AS c
           FROM j GROUP BY 1
         ), ms AS (
           SELECT CAST(0 AS BIGINT) AS vmask
           UNION ALL
           SELECT vmask + 1 FROM ms
           WHERE vmask + 1 < (SELECT 1 << n FROM nn)
         ), v AS (
           SELECT m.vmask, CAST(COALESCE(SUM(jm.c), 0) AS BIGINT) AS v
           FROM ms m LEFT JOIN jm ON (jm.mask & m.vmask) = jm.mask
           GROUP BY 1
         ), phi AS (
           SELECT c.ch AS channel,
                  CAST(SUM(CAST(factorial(CAST(bit_count(s.vmask)
                        AS INT)) AS HUGEINT)
                    * CAST(factorial((SELECT n FROM nn) - 1
                        - CAST(bit_count(s.vmask) AS INT)) AS HUGEINT)
                    * (t.v - s.v)) AS HUGEINT) AS phi
           FROM chans c
           JOIN v s ON (s.vmask & c.bit) = 0
           JOIN v t ON t.vmask = s.vmask + c.bit
           GROUP BY 1
         ), tot AS (
           SELECT CAST(SUM(phi) AS HUGEINT) AS tot,
                  CAST(factorial((SELECT n FROM nn)) AS HUGEINT) AS nf
           FROM phi
         )
         SELECT p.channel,
                CAST((2 * 10000 * p.phi + t.nf) // (2 * t.nf)
                  AS BIGINT) AS phi_users_e4,
                CASE WHEN t.tot = 0 THEN NULL
                     ELSE CAST((2 * 1000000 * p.phi + t.tot)
                       // (2 * t.tot) AS BIGINT) END AS share_ppm
         FROM phi p, tot t""",
    // same 80%-span day split, same popularity top-10 (count desc,
    // partkey tie-break), reciprocal ranks in 1/2520 units and AP
    // terms in 1/2520^2 units — every division is exact (2520^2 is
    // divisible by any rank*min(m,10) product, both factors <= 10)
    "q213_rec_eval" ->
      """WITH o AS (
           SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE)
             AS day
           FROM orders WHERE o_orderdate IS NOT NULL
         ), sp AS (
           SELECT MIN(day) + CAST((4 * date_diff('day', MIN(day),
             MAX(day))) // 5 AS INT) AS split
           FROM o
         ), top10 AS (
           SELECT rec, rnk FROM (
             SELECT l.l_partkey AS rec,
                    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
                      l.l_partkey) AS BIGINT) AS rnk
             FROM o CROSS JOIN sp
             JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             WHERE o.day < sp.split
             GROUP BY l.l_partkey
           ) WHERE rnk <= 10
         ), test AS (
           SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
           FROM o CROSS JOIN sp
           JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           WHERE o.day >= sp.split
         ), pu AS (
           SELECT t.cust, CAST(COUNT(*) AS BIGINT) AS m,
                  MIN(r.rnk) AS minr
           FROM test t LEFT JOIN top10 r ON t.part = r.rec GROUP BY 1
         ), hits AS (
           SELECT t.cust, r.rnk,
                  CAST(ROW_NUMBER() OVER (PARTITION BY t.cust
                    ORDER BY r.rnk) AS BIGINT) AS j
           FROM test t JOIN top10 r ON t.part = r.rec
         ), apu AS (
           SELECT h.cust,
                  SUM(6350400 * h.j // (h.rnk * LEAST(p.m, 10))) AS ap
           FROM hits h JOIN pu p ON h.cust = p.cust GROUP BY 1
         ), fin AS (
           SELECT CAST(COUNT(*) AS HUGEINT) AS u,
                  CAST(SUM(CASE WHEN p.minr IS NOT NULL THEN 1 ELSE 0
                    END) AS HUGEINT) AS h,
                  CAST(SUM(COALESCE(2520 // p.minr, 0)) AS HUGEINT)
                    AS srr,
                  CAST(SUM(COALESCE(a.ap, 0)) AS HUGEINT) AS sap
           FROM pu p LEFT JOIN apu a ON p.cust = a.cust
         )
         SELECT CAST(u AS BIGINT) AS n_users,
                CAST((2 * 1000000 * h + u) // (2 * u) AS BIGINT)
                  AS hit_rate_ppm,
                CAST((2 * 1000000 * srr + 2520 * u)
                  // (2 * 2520 * u) AS BIGINT) AS mrr_ppm,
                CAST((2 * 1000000 * sap + 6350400 * u)
                  // (2 * 6350400 * u) AS BIGINT) AS map_ppm
         FROM fin""",
    // same M = EᵀE contraction and the same 4 L1-normalized integer
    // rounds, unrolled as chained CTEs (floor division in HUGEINT)
    "q214_hits" ->
      """WITH e AS (
           SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         ), m AS (
           SELECT x.p AS p1, y.p AS p2, CAST(COUNT(*) AS HUGEINT) AS w
           FROM e x JOIN e y ON x.c = y.c GROUP BY 1, 2
         ), n0 AS (
           SELECT CAST(COUNT(DISTINCT p1) AS HUGEINT) AS n FROM m
         ), a0 AS (
           SELECT p1 AS node, 1000000000000 // (SELECT n FROM n0) AS a
           FROM (SELECT DISTINCT p1 FROM m)
         ), r1 AS (
           SELECT m.p1, SUM(m.w * a.a) AS araw
           FROM m JOIN a0 a ON m.p2 = a.node GROUP BY 1
         ), a1 AS (
           SELECT p1 AS node, (araw * 1000000000000)
             // (SELECT SUM(araw) FROM r1) AS a FROM r1
         ), r2 AS (
           SELECT m.p1, SUM(m.w * a.a) AS araw
           FROM m JOIN a1 a ON m.p2 = a.node GROUP BY 1
         ), a2 AS (
           SELECT p1 AS node, (araw * 1000000000000)
             // (SELECT SUM(araw) FROM r2) AS a FROM r2
         ), r3 AS (
           SELECT m.p1, SUM(m.w * a.a) AS araw
           FROM m JOIN a2 a ON m.p2 = a.node GROUP BY 1
         ), a3 AS (
           SELECT p1 AS node, (araw * 1000000000000)
             // (SELECT SUM(araw) FROM r3) AS a FROM r3
         ), r4 AS (
           SELECT m.p1, SUM(m.w * a.a) AS araw
           FROM m JOIN a3 a ON m.p2 = a.node GROUP BY 1
         ), a4 AS (
           SELECT p1 AS node, (araw * 1000000000000)
             // (SELECT SUM(araw) FROM r4) AS a FROM r4
         ), deg AS (
           SELECT p, CAST(COUNT(*) AS BIGINT) AS n_buyers
           FROM e GROUP BY 1
         )
         SELECT d.p AS partkey, d.n_buyers, CAST(a4.a AS BIGINT)
           AS auth_ppt
         FROM deg d JOIN a4 ON d.p = a4.node""",
    "q215_top_movers" ->
      """WITH agg AS (
           SELECT p.p_brand,
                  CAST(SUM(CASE WHEN year(l.l_shipdate) = 1995
                    THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * 10000 AS BIGINT) ELSE 0 END) AS HUGEINT) AS r1,
                  CAST(SUM(CASE WHEN year(l.l_shipdate) = 1996
                    THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * 10000 AS BIGINT) ELSE 0 END) AS HUGEINT) AS r2
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE l.l_shipdate IS NOT NULL
             AND year(l.l_shipdate) IN (1995, 1996)
           GROUP BY 1
         ), tot AS (
           SELECT CAST(SUM(abs(r2 - r1)) AS HUGEINT) AS ta FROM agg
         )
         SELECT p_brand, CAST(r1 AS BIGINT) AS rev1_units,
                CAST(r2 AS BIGINT) AS rev2_units,
                CAST(r2 - r1 AS BIGINT) AS delta_units,
                CASE WHEN r2 - r1 >= 0
                  THEN CAST((2000000 * (r2 - r1) + ta) // (2 * ta)
                    AS BIGINT)
                  ELSE -CAST((2000000 * (r1 - r2) + ta) // (2 * ta)
                    AS BIGINT) END AS contrib_ppm
         FROM agg CROSS JOIN tot
         ORDER BY abs(r2 - r1) DESC, p_brand LIMIT 15""",

    "q216_growth_accounting" ->
      """WITH bc AS (
           SELECT o_custkey,
                  CAST(SUM(CASE WHEN year(o_orderdate) = 1995
                    THEN CAST(CAST(o_totalprice AS DECIMAL(18,4))
                      * 10000 AS BIGINT) ELSE 0 END) AS BIGINT) AS r1,
                  CAST(SUM(CASE WHEN year(o_orderdate) = 1996
                    THEN CAST(CAST(o_totalprice AS DECIMAL(18,4))
                      * 10000 AS BIGINT) ELSE 0 END) AS BIGINT) AS r2
           FROM orders
           WHERE o_orderdate IS NOT NULL
             AND year(o_orderdate) IN (1995, 1996)
           GROUP BY 1
         ), cl AS (
           SELECT n_name,
                  CASE WHEN r1 = 0 THEN 'new'
                       WHEN r2 = 0 THEN 'churned'
                       WHEN r2 > r1 THEN 'expansion'
                       WHEN r2 < r1 THEN 'contraction'
                       ELSE 'flat' END AS cls,
                  r1, r2
           FROM bc
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey)
         SELECT n_name,
                CAST(SUM(CASE WHEN cls = 'new' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_new,
                CAST(SUM(CASE WHEN cls = 'expansion' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_expanded,
                CAST(SUM(CASE WHEN cls = 'contraction' THEN 1 ELSE 0
                  END) AS BIGINT) AS n_contracted,
                CAST(SUM(CASE WHEN cls = 'churned' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_churned,
                CAST(SUM(CASE WHEN cls = 'new' THEN r2 - r1 ELSE 0 END)
                  AS BIGINT) AS new_units,
                CAST(SUM(CASE WHEN cls = 'expansion' THEN r2 - r1
                  ELSE 0 END) AS BIGINT) AS expansion_units,
                CAST(SUM(CASE WHEN cls = 'contraction' THEN r2 - r1
                  ELSE 0 END) AS BIGINT) AS contraction_units,
                CAST(SUM(CASE WHEN cls = 'churned' THEN r2 - r1
                  ELSE 0 END) AS BIGINT) AS churn_units,
                CAST(SUM(r2 - r1) AS BIGINT) AS net_units
         FROM cl GROUP BY 1""",

    "q217_kcenter" -> kcenterOracleSql,

    "q218_dup_source_matrix" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, substr(text, strpos(text, ' ') + 1)
           FROM documents
         ), base AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM corpus
         ), sh AS (
           SELECT doc_id, list_distinct(tk) AS toks,
                  CASE WHEN len(tk) >= 3 THEN
                    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                   for i in range(1, len(tk) - 1)])
                  ELSE [array_to_string(tk, ' ')] END AS sh
           FROM base
         ), sigs AS (
           SELECT doc_id, toks,
                  list_min(list_transform(sh, x -> md5('0|' || x))) AS m0,
                  list_min(list_transform(sh, x -> md5('1|' || x))) AS m1,
                  list_min(list_transform(sh, x -> md5('2|' || x))) AS m2,
                  list_min(list_transform(sh, x -> md5('3|' || x))) AS m3,
                  list_min(list_transform(sh, x -> md5('4|' || x))) AS m4,
                  list_min(list_transform(sh, x -> md5('5|' || x))) AS m5,
                  list_min(list_transform(sh, x -> md5('6|' || x))) AS m6,
                  list_min(list_transform(sh, x -> md5('7|' || x))) AS m7
           FROM sh
         ), banded AS (
           SELECT doc_id,
                  unnest([0, 1, 2, 3]) AS band_id,
                  unnest([m0 || ',' || m1, m2 || ',' || m3,
                          m4 || ',' || m5, m6 || ',' || m7]) AS band_key
           FROM sigs
         ), pairs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM banded a JOIN banded b
             ON a.band_id = b.band_id AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
         ), iv AS (
           SELECT p.doc_a, p.doc_b,
                  len(list_intersect(ta.toks, tb.toks)) AS inter,
                  len(ta.toks) AS na, len(tb.toks) AS nb
           FROM pairs p
           JOIN sh ta ON ta.doc_id = p.doc_a
           JOIN sh tb ON tb.doc_id = p.doc_b
         ), flt AS (
           SELECT doc_a % 1000000 AS ba, doc_b % 1000000 AS bb,
                  (2 * 1000 * inter + (na + nb - inter))
                    // (2 * (na + nb - inter)) AS jm
           FROM iv WHERE 10 * inter >= 7 * (na + nb - inter)
         )
         SELECT least(sa.source, sb.source) AS source_a,
                greatest(sa.source, sb.source) AS source_b,
                CAST(COUNT(*) AS BIGINT) AS n_pairs,
                CAST(MAX(jm) AS BIGINT) AS max_j_mills
         FROM flt
         JOIN documents sa ON sa.doc_id = flt.ba
         JOIN documents sb ON sb.doc_id = flt.bb
         GROUP BY 1, 2""",

    "q219_tokenizer_fertility" ->
      """WITH per AS (
           SELECT lang,
                  CAST(len(string_split_regex(lower(trim(text)), '\s+'))
                       AS BIGINT) AS w,
                  CAST(len(regexp_extract_all(lower(trim(text)),
                       '[a-z]+')) AS BIGINT) AS st,
                  CAST(length(regexp_replace(lower(trim(text)), '\s+',
                       '', 'g')) AS BIGINT) AS ch
           FROM documents
         ), ag AS (
           SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(w) AS BIGINT) AS ws_tokens,
                  CAST(SUM(st) AS BIGINT) AS subtokens,
                  CAST(SUM(ch) AS BIGINT) AS chars
           FROM per GROUP BY 1
         ), tp AS (
           SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_types
           FROM (SELECT lang,
                        unnest(regexp_extract_all(lower(trim(text)),
                          '[a-z]+')) AS tok
                 FROM documents)
           GROUP BY 1
         )
         SELECT ag.lang, n_docs, ws_tokens, subtokens, chars, n_types,
                CAST((2 * 1000000 * subtokens + ws_tokens)
                  // (2 * ws_tokens) AS BIGINT) AS fertility_ppm,
                CAST((2 * 1000 * chars + subtokens)
                  // (2 * subtokens) AS BIGINT)
                  AS chars_per_subtoken_mills,
                CAST((2 * 1000000 * n_types + subtokens)
                  // (2 * subtokens) AS BIGINT) AS ttr_ppm
         FROM ag JOIN tp ON ag.lang = tp.lang""",

    "q220_interval_coverage" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS us, event_id
           FROM events WHERE user_id IS NOT NULL
         ), sw AS (
           SELECT user_id, us,
                  MAX(us + 1800000000) OVER (
                    PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS pme
           FROM ev
         ), contrib AS (
           SELECT user_id, us,
                  CASE WHEN pme IS NULL THEN 1800000000
                       WHEN us >= pme THEN 1800000000
                       WHEN us + 1800000000 > pme
                         THEN us + 1800000000 - pme
                       ELSE 0 END AS cov,
                  CASE WHEN pme IS NULL OR us > pme THEN 1
                       ELSE 0 END AS seg
           FROM sw
         )
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                CAST(SUM(seg) AS BIGINT) AS n_segments,
                CAST(SUM(cov) AS BIGINT) AS covered_us,
                CAST(MAX(us) + 1800000000 - MIN(us) AS BIGINT)
                  AS span_us,
                CAST((2 * 1000000 * SUM(cov)
                      + (MAX(us) + 1800000000 - MIN(us)))
                  // (2 * (MAX(us) + 1800000000 - MIN(us))) AS BIGINT)
                  AS util_ppm
         FROM contrib GROUP BY 1""",

    "q221_spearman" ->
      """WITH spend AS (
           SELECT o_custkey,
                  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4))
                    * 10000 AS BIGINT)) AS BIGINT) AS x
           FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
         ), base AS (
           SELECT n_name AS nation, c_custkey,
                  CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000
                    AS BIGINT) AS bal,
                  COALESCE(x, 0) AS x
           FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           LEFT JOIN spend ON o_custkey = c_custkey
         ), rk AS (
           SELECT nation,
                  ROW_NUMBER() OVER (PARTITION BY nation
                    ORDER BY bal, c_custkey) AS r,
                  ROW_NUMBER() OVER (PARTITION BY nation
                    ORDER BY x, c_custkey) AS sr
           FROM base
         ), ag AS (
           SELECT nation, CAST(COUNT(*) AS HUGEINT) AS n,
                  CAST(SUM((r - sr) * (r - sr)) AS HUGEINT) AS sd2
           FROM rk GROUP BY 1
         )
         SELECT nation, CAST(n AS BIGINT) AS n_customers,
                CASE WHEN (n * n * n - n) - 6 * sd2 >= 0
                  THEN CAST((2 * 1000000 * ((n * n * n - n) - 6 * sd2)
                    + (n * n * n - n)) // (2 * (n * n * n - n))
                    AS BIGINT)
                  ELSE -CAST((2 * 1000000 * (6 * sd2 - (n * n * n - n))
                    + (n * n * n - n)) // (2 * (n * n * n - n))
                    AS BIGINT) END AS rho_ppm
         FROM ag WHERE n >= 2""",

    "q222_changelog_compact" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS us, event_id,
                  CASE event_type WHEN 'signup' THEN 'I'
                       WHEN 'error' THEN 'D' ELSE 'U' END AS op,
                  CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
                    AS v
           FROM events WHERE user_id IS NOT NULL
         ), rk AS (
           SELECT user_id, us, event_id, op, v,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY us, event_id) AS rn
           FROM ev
         ), ag AS (
           SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ops,
                  MIN(us) AS first_us, MAX(us) AS last_us,
                  arg_min(op, rn) AS fop,
                  arg_max(op, rn) AS lop,
                  arg_max(v, CASE WHEN op <> 'D' THEN rn END) AS lnd
           FROM rk GROUP BY 1
         )
         SELECT user_id,
                CASE WHEN lop = 'D' THEN
                       CASE WHEN fop = 'I' THEN 'none' ELSE 'delete'
                       END
                     WHEN fop = 'I' THEN 'insert'
                     ELSE 'upsert' END AS net_op,
                n_ops, first_us, last_us,
                CASE WHEN lop <> 'D' THEN lnd END AS value_units
         FROM ag""",

    "q223_clustering_coef" ->
      """WITH pairs AS (
           SELECT DISTINCT a.l_partkey AS s1, b.l_partkey AS s2
           FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
           WHERE a.l_partkey < b.l_partkey
         ), sym AS (
           SELECT s1 AS src, s2 AS dst FROM pairs
           UNION ALL
           SELECT s2, s1 FROM pairs
         ), deg AS (
           SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
           FROM sym GROUP BY 1
         ), tri AS (
           SELECT p1.s1 AS a, p2.s1 AS b, p2.s2 AS c
           FROM pairs p1
           JOIN pairs p2 ON p1.s2 = p2.s1 AND p1.s1 < p2.s1
           JOIN pairs p3 ON p3.s1 = p1.s1 AND p3.s2 = p2.s2
         ), tcnt AS (
           SELECT node, CAST(count(*) AS BIGINT) AS n_tri
           FROM (SELECT unnest([a, b, c]) AS node FROM tri)
           GROUP BY node
         )
         SELECT d.node AS partkey, d.degree,
                COALESCE(t.n_tri, 0) AS n_tri,
                CAST((2 * 2000000 * CAST(COALESCE(t.n_tri, 0)
                      AS HUGEINT) + d.degree * (d.degree - 1))
                  // (2 * d.degree * (d.degree - 1)) AS BIGINT)
                  AS cc_ppm
         FROM deg d LEFT JOIN tcnt t ON d.node = t.node
         WHERE d.degree >= 2""",

    "q224_forecast_backtest" ->
      """WITH daily AS (
           SELECT event_type, date_trunc('day', ts) AS day,
                  CAST(COUNT(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2
         ), scored AS (
           SELECT d.event_type,
                  abs(d.y - s.y) AS es, abs(d.y - n.y) AS en
           FROM daily d
           JOIN daily s ON s.event_type = d.event_type
                       AND s.day + INTERVAL 7 DAY = d.day
           JOIN daily n ON n.event_type = d.event_type
                       AND n.day + INTERVAL 1 DAY = d.day
         ), ag AS (
           SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
                  CAST(SUM(es) AS HUGEINT) AS ses,
                  CAST(SUM(en) AS HUGEINT) AS sen
           FROM scored GROUP BY 1
         )
         SELECT event_type, n_days,
                CAST((2 * ses + n_days) // (2 * n_days) AS BIGINT)
                  AS mae_snaive,
                CAST((2 * sen + n_days) // (2 * n_days) AS BIGINT)
                  AS mae_naive,
                CAST((2 * 1000000 * ses + sen) // (2 * sen) AS BIGINT)
                  AS mase_ppm
         FROM ag WHERE sen > 0""",

    "q225_outlier_screen" ->
      """WITH base AS (
           SELECT vec_id, CAST(label AS BIGINT) AS label,
                  [CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                   for x in embedding] AS e6
           FROM embeddings
         ), pdim AS (
           SELECT vec_id, label, i, e6[i] AS e
           FROM (SELECT vec_id, label, e6,
                        unnest(generate_series(1, len(e6))) AS i
                 FROM base)
         ), cent AS (
           SELECT label, i,
                  CASE WHEN SUM(e) >= 0
                    THEN (2 * SUM(e) + COUNT(*)) // (2 * COUNT(*))
                    ELSE -((2 * (-SUM(e)) + COUNT(*)) // (2 * COUNT(*)))
                  END AS c
           FROM pdim GROUP BY 1, 2
         ), dd AS (
           SELECT p.vec_id, p.label,
                  CAST(SUM((p.e - c.c) * (p.e - c.c)) AS BIGINT) AS d2
           FROM pdim p
           JOIN cent c ON p.label = c.label AND p.i = c.i
           GROUP BY 1, 2
         ), lab AS (
           SELECT label, CAST(COUNT(*) AS HUGEINT) AS n,
                  CAST(SUM(d2) AS HUGEINT) AS sd2
           FROM dd GROUP BY 1
         ), rk AS (
           SELECT vec_id, label, d2,
                  ROW_NUMBER() OVER (PARTITION BY label
                    ORDER BY d2 DESC, vec_id) AS rn
           FROM dd
         )
         SELECT r.label, r.vec_id, r.d2,
                CAST((2 * 1000000 * l.n * CAST(r.d2 AS HUGEINT)
                  + l.sd2) // (2 * l.sd2) AS BIGINT) AS ratio_ppm
         FROM rk r JOIN lab l ON r.label = l.label
         WHERE r.rn <= 3 AND l.sd2 > 0""",

    "q226_dedup_yield" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, substr(text, strpos(text, ' ') + 1)
           FROM documents
         ), base AS (
           SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
           FROM corpus
         ), sh AS (
           SELECT doc_id, list_distinct(tk) AS toks,
                  CASE WHEN len(tk) >= 3 THEN
                    list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                                   for i in range(1, len(tk) - 1)])
                  ELSE [array_to_string(tk, ' ')] END AS sh
           FROM base
         ), sigs AS (
           SELECT doc_id, toks,
                  list_min(list_transform(sh, x -> md5('0|' || x))) AS m0,
                  list_min(list_transform(sh, x -> md5('1|' || x))) AS m1,
                  list_min(list_transform(sh, x -> md5('2|' || x))) AS m2,
                  list_min(list_transform(sh, x -> md5('3|' || x))) AS m3,
                  list_min(list_transform(sh, x -> md5('4|' || x))) AS m4,
                  list_min(list_transform(sh, x -> md5('5|' || x))) AS m5,
                  list_min(list_transform(sh, x -> md5('6|' || x))) AS m6,
                  list_min(list_transform(sh, x -> md5('7|' || x))) AS m7
           FROM sh
         ), banded AS (
           SELECT doc_id,
                  unnest([0, 1, 2, 3]) AS band_id,
                  unnest([m0 || ',' || m1, m2 || ',' || m3,
                          m4 || ',' || m5, m6 || ',' || m7]) AS band_key
           FROM sigs
         ), prs AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM banded a JOIN banded b
             ON a.band_id = b.band_id AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
         ), iv AS (
           SELECT p.doc_a, p.doc_b,
                  1000 * len(list_intersect(ta.toks, tb.toks)) AS sc,
                  len(ta.toks) + len(tb.toks)
                    - len(list_intersect(ta.toks, tb.toks)) AS den
           FROM prs p
           JOIN sh ta ON ta.doc_id = p.doc_a
           JOIN sh tb ON tb.doc_id = p.doc_b
         ), th AS (
           SELECT unnest([500, 700, 900]) AS t
         ), fl AS (
           SELECT t, doc_a, doc_b
           FROM th CROSS JOIN iv WHERE sc >= t * den
         ), pc AS (
           SELECT t, CAST(COUNT(*) AS BIGINT) AS n_pairs
           FROM fl GROUP BY 1
         ), dc AS (
           SELECT t, CAST(COUNT(DISTINCT d) AS BIGINT)
                    AS n_docs_involved
           FROM (SELECT t, unnest([doc_a, doc_b]) AS d FROM fl)
           GROUP BY 1
         )
         SELECT CAST(th.t AS BIGINT) AS threshold_mills,
                CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
                CAST(COALESCE(n_docs_involved, 0) AS BIGINT)
                  AS n_docs_involved
         FROM th LEFT JOIN pc ON pc.t = th.t
                 LEFT JOIN dc ON dc.t = th.t""",

    // q228: lockstep recursive replay of the same integer token-bucket
    // recursion (capacity 3e6 µtok, cost 1e6, refill Δµs // 86400 —
    // all operands non-negative, so DuckDB's flooring // equals
    // Spark's truncating DIV)
    "q228_rate_limit" ->
      """WITH RECURSIVE ev AS (
           SELECT user_id, epoch_us(ts) AS us, event_id,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS rn
           FROM events WHERE user_id IS NOT NULL
         ), nn AS (
           SELECT user_id, CAST(MAX(rn) AS BIGINT) AS n_events
           FROM ev GROUP BY 1
         ), st AS (
           SELECT user_id, rn, us AS lu,
                  CAST(2000000 AS BIGINT) AS tk,
                  CAST(1 AS BIGINT) AS ad, CAST(0 AS BIGINT) AS dn
           FROM ev WHERE rn = 1
           UNION ALL
           SELECT e.user_id, e.rn, e.us,
                  CASE WHEN least(3000000, st.tk + (e.us - st.lu) // 86400)
                            >= 1000000
                       THEN least(3000000, st.tk + (e.us - st.lu) // 86400)
                            - 1000000
                       ELSE least(3000000, st.tk + (e.us - st.lu) // 86400)
                  END,
                  st.ad + CASE WHEN least(3000000,
                      st.tk + (e.us - st.lu) // 86400) >= 1000000
                    THEN 1 ELSE 0 END,
                  st.dn + CASE WHEN least(3000000,
                      st.tk + (e.us - st.lu) // 86400) >= 1000000
                    THEN 0 ELSE 1 END
           FROM st JOIN ev e
             ON e.user_id = st.user_id AND e.rn = st.rn + 1
         )
         SELECT st.user_id, nn.n_events,
                st.ad AS n_admitted, st.dn AS n_denied,
                st.tk AS final_units
         FROM st JOIN nn ON nn.user_id = st.user_id
         WHERE st.rn = nn.n_events""",

    // q229: naive n² inequality join — same integer coordinates and
    // exact dist² cut, quadratically more work (the q96/q108
    // deliberately-quadratic-oracle class)
    "q229_epsilon_join" ->
      """WITH pts AS (
           SELECT p_partkey,
                  CAST(CAST(p_retailprice AS DECIMAL(18,4)) * 100
                       AS BIGINT) AS x,
                  CAST(p_size AS BIGINT) * 100 AS y
           FROM part
           WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
         )
         SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b,
                (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                  AS dist2_units
         FROM pts a JOIN pts b ON a.p_partkey < b.p_partkey
         WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
               <= 10000""",

    // q230: same split/top10/holdout CTEs as q213; discounts and ideal
    // prefix sums are the SAME e6 integer literals as the Spark side
    // (round(1e6/log2(r+1)) — fixed table, no libm in either engine)
    "q230_ndcg_eval" ->
      """WITH o AS (
           SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE)
             AS day
           FROM orders WHERE o_orderdate IS NOT NULL
         ), sp AS (
           SELECT MIN(day) + CAST((4 * date_diff('day', MIN(day),
             MAX(day))) // 5 AS INT) AS split
           FROM o
         ), top10 AS (
           SELECT rec, rnk FROM (
             SELECT l.l_partkey AS rec,
                    CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
                      l.l_partkey) AS BIGINT) AS rnk
             FROM o CROSS JOIN sp
             JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             WHERE o.day < sp.split
             GROUP BY l.l_partkey
           ) WHERE rnk <= 10
         ), test AS (
           SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
           FROM o CROSS JOIN sp
           JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           WHERE o.day >= sp.split
         ), dtab AS (
           SELECT * FROM (VALUES (1, 1000000), (2, 630930), (3, 500000),
             (4, 430677), (5, 386853), (6, 356207), (7, 333333),
             (8, 315465), (9, 301030), (10, 289065)) AS t(rnk, disc)
         ), itab AS (
           SELECT * FROM (VALUES (1, 1000000), (2, 1630930),
             (3, 2130930), (4, 2561607), (5, 2948460), (6, 3304667),
             (7, 3638000), (8, 3953465), (9, 4254495),
             (10, 4543560)) AS t(k, idcg)
         ), pu AS (
           SELECT t.cust, CAST(COUNT(*) AS BIGINT) AS m,
                  CAST(SUM(CASE WHEN r.rnk IS NOT NULL THEN 1 ELSE 0
                    END) AS BIGINT) AS h,
                  CAST(SUM(COALESCE(dt.disc, 0)) AS BIGINT) AS dcg
           FROM test t
           LEFT JOIN top10 r ON t.part = r.rec
           LEFT JOIN dtab dt ON dt.rnk = r.rnk
           GROUP BY 1
         ), pm AS (
           SELECT p.cust,
                  (2 * 1000000 * p.dcg + it.idcg) // (2 * it.idcg)
                    AS ndcg,
                  p.h * 100000 AS prec,
                  (2 * 1000000 * p.h + p.m) // (2 * p.m) AS rec
           FROM pu p JOIN itab it ON it.k = LEAST(p.m, 10)
         ), fin AS (
           SELECT CAST(COUNT(*) AS HUGEINT) AS u,
                  CAST(SUM(ndcg) AS HUGEINT) AS sn,
                  CAST(SUM(prec) AS HUGEINT) AS sp2,
                  CAST(SUM(rec) AS HUGEINT) AS sr
           FROM pm
         )
         SELECT CAST(u AS BIGINT) AS n_users,
                CAST((2 * sn + u) // (2 * u) AS BIGINT) AS ndcg_ppm,
                CAST((2 * sp2 + u) // (2 * u) AS BIGINT)
                  AS precision_ppm,
                CAST((2 * sr + u) // (2 * u) AS BIGINT) AS recall_ppm
         FROM fin""",

    // q231: same ≥2-shared-orders symmetric graph (q151's), exact
    // distance-2 census via wedge join + distinct + adjacency
    // anti-filter
    "q231_two_hop_reach" ->
      """WITH li AS (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem
         ), pr AS (
           SELECT a.pk AS s1, b.pk AS s2
           FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
           GROUP BY 1, 2 HAVING COUNT(*) >= 2
         ), e AS (
           SELECT s1 AS src, s2 AS dst FROM pr
           UNION ALL
           SELECT s2, s1 FROM pr
         ), deg AS (
           SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
           FROM e GROUP BY 1
         ), two AS (
           SELECT DISTINCT a.src AS a, b.dst AS c
           FROM e a JOIN e b ON a.dst = b.src
           WHERE a.src <> b.dst
         ), nonadj AS (
           SELECT t.a, t.c FROM two t
           WHERE NOT EXISTS (SELECT 1 FROM e
                             WHERE e.src = t.a AND e.dst = t.c)
         ), r2 AS (
           SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS reach2
           FROM nonadj GROUP BY 1
         )
         SELECT d.node, d.deg,
                CAST(COALESCE(r2.reach2, 0) AS BIGINT) AS reach2,
                CAST((2 * 1000000 * COALESCE(r2.reach2, 0) + d.deg)
                  // (2 * d.deg) AS BIGINT) AS amp_ppm
         FROM deg d LEFT JOIN r2 ON r2.node = d.node""",

    // q232: same 4-h-gap sessions (LAG + running SUM), containment as
    // DISTINCT inequality self-joins within the session — subsequence
    // existence i<j(<k), quadratic per session by design
    "q232_seq_patterns" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS rn
           FROM events WHERE user_id IS NOT NULL
         ), gap AS (
           SELECT *, CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                    ORDER BY rn) > 14400000000
                  THEN 1 ELSE 0 END AS brk
           FROM ev
         ), s AS (
           SELECT user_id, rn, event_type,
                  SUM(brk) OVER (PARTITION BY user_id ORDER BY rn)
                    AS sid
           FROM gap
         ), tot AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n FROM
             (SELECT DISTINCT user_id, sid FROM s)
         ), c1 AS (
           SELECT event_type AS pattern, user_id, sid
           FROM s GROUP BY 1, 2, 3
         ), c2 AS (
           SELECT a.event_type || '>' || b.event_type AS pattern,
                  a.user_id, a.sid
           FROM s a JOIN s b ON a.user_id = b.user_id
             AND a.sid = b.sid AND a.rn < b.rn
           GROUP BY 1, 2, 3
         ), c3 AS (
           SELECT a.event_type || '>' || b.event_type || '>'
                    || c.event_type AS pattern,
                  a.user_id, a.sid
           FROM s a
           JOIN s b ON a.user_id = b.user_id AND a.sid = b.sid
                   AND a.rn < b.rn
           JOIN s c ON b.user_id = c.user_id AND b.sid = c.sid
                   AND b.rn < c.rn
           GROUP BY 1, 2, 3
         ), allc AS (
           SELECT pattern, 1 AS k, user_id, sid FROM c1
           UNION ALL SELECT pattern, 2, user_id, sid FROM c2
           UNION ALL SELECT pattern, 3, user_id, sid FROM c3
         )
         SELECT pattern, CAST(k AS BIGINT) AS k,
                CAST(COUNT(*) AS BIGINT) AS n_sessions,
                CAST((2 * 1000000 * COUNT(*) + MAX(tot.n))
                  // (2 * MAX(tot.n)) AS BIGINT) AS support_ppm
         FROM allc CROSS JOIN tot
         GROUP BY pattern, k""",

    // q233: lockstep Holt-Winters replay — the same integer recursion
    // with the 7 seasonal slots carried as columns s1..s7; layered
    // derived tables in the recursive term keep each sign-split
    // formula written once (l1 in the inner layer, b1/snew next, the
    // slot CASE assembly outermost)
    "q233_holt_winters" ->
      """WITH RECURSIVE daily AS (
           SELECT event_type, date_trunc('day', ts) AS day,
                  CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000
                    AS BIGINT)) AS BIGINT) AS y
           FROM events WHERE value IS NOT NULL
           GROUP BY 1, 2
         ), seq AS (
           SELECT event_type, y,
                  CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                          ORDER BY day) AS BIGINT) AS rn
           FROM daily
         ), ns AS (
           SELECT event_type, MAX(rn) AS n_days FROM seq GROUP BY 1
         ), init AS (
           SELECT event_type,
                  CAST(CASE WHEN SUM(y) >= 0
                            THEN (2 * SUM(y) + 7) // 14
                            ELSE -((2 * (-SUM(y)) + 7) // 14) END
                       AS BIGINT) AS l,
                  MAX(CASE WHEN rn = 1 THEN y END) AS y1,
                  MAX(CASE WHEN rn = 2 THEN y END) AS y2,
                  MAX(CASE WHEN rn = 3 THEN y END) AS y3,
                  MAX(CASE WHEN rn = 4 THEN y END) AS y4,
                  MAX(CASE WHEN rn = 5 THEN y END) AS y5,
                  MAX(CASE WHEN rn = 6 THEN y END) AS y6,
                  MAX(CASE WHEN rn = 7 THEN y END) AS y7
           FROM seq WHERE rn <= 7 GROUP BY 1
         ), hw(event_type, rn, l, b, s1, s2, s3, s4, s5, s6, s7) AS (
           SELECT event_type, CAST(7 AS BIGINT), l, CAST(0 AS BIGINT),
                  y1 - l, y2 - l, y3 - l, y4 - l, y5 - l, y6 - l,
                  y7 - l
           FROM init
           UNION ALL
           SELECT event_type, rn, l1, b1,
                  CASE WHEN slot = 1 THEN snew ELSE s1 END,
                  CASE WHEN slot = 2 THEN snew ELSE s2 END,
                  CASE WHEN slot = 3 THEN snew ELSE s3 END,
                  CASE WHEN slot = 4 THEN snew ELSE s4 END,
                  CASE WHEN slot = 5 THEN snew ELSE s5 END,
                  CASE WHEN slot = 6 THEN snew ELSE s6 END,
                  CASE WHEN slot = 7 THEN snew ELSE s7 END
           FROM (
             SELECT *,
                    CASE WHEN l1 - l0 + 3 * b0 >= 0
                         THEN ((l1 - l0 + 3 * b0) * 2 + 4) // 8
                         ELSE -(((-(l1 - l0 + 3 * b0)) * 2 + 4) // 8)
                    END AS b1,
                    CASE WHEN y - l1 + sold >= 0
                         THEN ((y - l1 + sold) * 2 + 2) // 4
                         ELSE -(((-(y - l1 + sold)) * 2 + 2) // 4)
                    END AS snew
             FROM (
               SELECT *,
                      CASE WHEN y - sold + l0 + b0 >= 0
                           THEN ((y - sold + l0 + b0) * 2 + 2) // 4
                           ELSE -(((-(y - sold + l0 + b0)) * 2 + 2)
                                  // 4)
                      END AS l1
               FROM (
                 SELECT h.event_type, s.rn, h.l AS l0, h.b AS b0,
                        h.s1, h.s2, h.s3, h.s4, h.s5, h.s6, h.s7,
                        CAST(((s.rn - 1) % 7) + 1 AS BIGINT) AS slot,
                        CASE CAST(((s.rn - 1) % 7) + 1 AS BIGINT)
                             WHEN 1 THEN h.s1 WHEN 2 THEN h.s2
                             WHEN 3 THEN h.s3 WHEN 4 THEN h.s4
                             WHEN 5 THEN h.s5 WHEN 6 THEN h.s6
                             ELSE h.s7 END AS sold,
                        s.y
                 FROM hw h JOIN seq s
                   ON s.event_type = h.event_type AND s.rn = h.rn + 1
               )
             )
           )
         )
         SELECT h.event_type, ns.n_days, h.l AS level_units,
                h.b AS trend_units,
                h.l + 7 * h.b +
                  CASE ((ns.n_days + 6) % 7) + 1
                       WHEN 1 THEN h.s1 WHEN 2 THEN h.s2
                       WHEN 3 THEN h.s3 WHEN 4 THEN h.s4
                       WHEN 5 THEN h.s5 WHEN 6 THEN h.s6
                       ELSE h.s7 END AS forecast7_units
         FROM hw h JOIN ns
           ON ns.event_type = h.event_type AND h.rn = ns.n_days
         WHERE ns.n_days >= 8""",

    // q234: q150's ranking CTEs at depth 10 + the same 10 exact RBO
    // weight literals W_m = Σ_{d=m..10} (2520/d)·10^(10−d)·9^d
    // (p = 9/10; 2520 = lcm(1..10)); D = 9·2520·10^10
    "q234_rbo" ->
      """WITH docs AS (
           SELECT doc_id,
                  list_distinct(string_split_regex(lower(trim(text)),
                    '\s+')) AS tk
           FROM documents WHERE text IS NOT NULL
         ), seeds AS (
           SELECT d.doc_id AS qid FROM docs d
           JOIN embeddings e ON d.doc_id = e.vec_id
           ORDER BY qid LIMIT 8
         ), qtok AS (
           SELECT qid, unnest(tk) AS term
           FROM docs JOIN seeds ON doc_id = qid
         ), qsize AS (
           SELECT qid, CAST(COUNT(*) AS BIGINT) AS qn
           FROM qtok GROUP BY 1
         ), dtok AS (
           SELECT doc_id AS did, CAST(len(tk) AS BIGINT) AS dn,
                  unnest(tk) AS term
           FROM docs
         ), inter AS (
           SELECT qid, did, dn, CAST(COUNT(*) AS BIGINT) AS inter
           FROM dtok JOIN qtok USING (term)
           WHERE did <> qid
           GROUP BY 1, 2, 3
         ), lex AS (
           SELECT qid, did,
                  (2 * inter * 1000000 + (qn + dn - inter))
                    // (2 * (qn + dn - inter)) AS jac_ppm
           FROM inter JOIN qsize USING (qid)
         ), lexr AS (
           SELECT qid, did, lrank FROM (
             SELECT qid, did,
                    CAST(ROW_NUMBER() OVER (PARTITION BY qid
                      ORDER BY jac_ppm DESC, did) AS BIGINT) AS lrank
             FROM lex)
           WHERE lrank <= 10
         ), qv AS (
           SELECT qid, embedding AS qe
           FROM seeds JOIN embeddings ON vec_id = qid
         ), pairs AS (
           SELECT qid, vec_id AS did, qe, embedding AS ne
           FROM qv, embeddings WHERE vec_id <> qid
         ), un AS (
           SELECT qid, did, CAST(unnest(qe) AS DOUBLE) AS x,
                  CAST(unnest(ne) AS DOUBLE) AS y
           FROM pairs
         ), dots AS (
           SELECT qid, did, SUM(x*y) AS dot, SUM(x*x) AS na,
                  SUM(y*y) AS nb
           FROM un GROUP BY 1, 2
         ), semr AS (
           SELECT qid, did, srank FROM (
             SELECT qid, did,
                    CAST(ROW_NUMBER() OVER (PARTITION BY qid
                      ORDER BY ROUND(dot / (sqrt(na) * sqrt(nb)), 4) DESC,
                        did) AS BIGINT) AS srank
             FROM dots)
           WHERE srank <= 10
         ), wt AS (
           SELECT * FROM (VALUES
             (1, 53392439389752), (2, 30712439389752),
             (3, 20506439389752), (4, 14382839389752),
             (5, 10249409389752), (6, 7273339789752),
             (7, 5041287589752), (8, 3319418749752),
             (9, 1963447038252), (10, 878669669052)) AS t(m, w)
         ), com AS (
           SELECT l.qid, GREATEST(l.lrank, s.srank) AS m
           FROM lexr l JOIN semr s ON l.qid = s.qid AND l.did = s.did
         ), agg AS (
           SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_common,
                  CAST(SUM(w) AS HUGEINT) AS sw
           FROM com JOIN wt ON wt.m = com.m GROUP BY 1
         )
         SELECT s.qid, CAST(COALESCE(a.n_common, 0) AS BIGINT)
                  AS n_common,
                CAST((2 * 1000000 * COALESCE(a.sw, 0)
                  + 226800000000000)
                  // (2 * 226800000000000) AS BIGINT) AS rbo_ppm
         FROM seeds s LEFT JOIN agg a ON a.qid = s.qid""",

    // q235: same daily series, lag-7 residuals, exact nearest-rank
    // q-hat at ceil(4(n+1)/5) = (4n+8)//5 clamped to n_cal, integer
    // coverage ppm
    "q235_conformal" ->
      """WITH daily AS (
           SELECT event_type, date_trunc('day', ts) AS day,
                  CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000
                    AS BIGINT)) AS BIGINT) AS y
           FROM events WHERE value IS NOT NULL
           GROUP BY 1, 2
         ), seq AS (
           SELECT event_type, y,
                  CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY day) AS BIGINT) AS rn,
                  LAG(y, 7) OVER (PARTITION BY event_type
                    ORDER BY day) AS p
           FROM daily
         ), ns AS (
           SELECT event_type, (4 * MAX(rn)) // 5 AS split
           FROM seq GROUP BY 1
         ), res AS (
           SELECT s.event_type, s.rn, ns.split, ABS(s.y - s.p) AS r
           FROM seq s JOIN ns ON ns.event_type = s.event_type
           WHERE s.rn > 7
         ), calr AS (
           SELECT event_type, r,
                  CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY r) AS BIGINT) AS rr
           FROM res WHERE rn <= split
         ), nc AS (
           SELECT event_type, CAST(MAX(rr) AS BIGINT) AS n_cal
           FROM calr GROUP BY 1
         ), qh AS (
           SELECT c.event_type, nc.n_cal, c.r AS qhat_units
           FROM calr c JOIN nc ON nc.event_type = c.event_type
           WHERE c.rr = LEAST((4 * nc.n_cal + 8) // 5, nc.n_cal)
         ), tst AS (
           SELECT res.event_type,
                  CAST(COUNT(*) AS BIGINT) AS n_test,
                  CAST(SUM(CASE WHEN res.r <= qh.qhat_units THEN 1
                    ELSE 0 END) AS BIGINT) AS cov
           FROM res JOIN qh ON qh.event_type = res.event_type
           WHERE res.rn > res.split
           GROUP BY 1
         )
         SELECT q.event_type, q.n_cal, t.n_test, q.qhat_units,
                CAST((2 * 1000000 * t.cov + t.n_test)
                  // (2 * t.n_test) AS BIGINT) AS coverage_ppm
         FROM qh q JOIN tst t ON t.event_type = q.event_type""",

    // q236: same sessions/incidents, direct inequality overlap join
    // (no banding — quadratic candidates, same output)
    "q236_interval_overlap" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS us, event_id, event_type
           FROM events WHERE user_id IS NOT NULL
         ), gap AS (
           SELECT *, CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                    ORDER BY us, event_id) > 14400000000
                  THEN 1 ELSE 0 END AS brk
           FROM ev
         ), sess AS (
           SELECT user_id, MIN(us) AS s_start, MAX(us) AS s_end
           FROM (SELECT user_id, us,
                        SUM(brk) OVER (PARTITION BY user_id
                          ORDER BY us, event_id) AS sid
                 FROM gap)
           GROUP BY user_id, sid
         ), egap AS (
           SELECT us, event_id,
                  CASE WHEN us - LAG(us) OVER (ORDER BY us, event_id)
                         > 300000000
                       THEN 1 ELSE 0 END AS brk
           FROM ev WHERE event_type = 'error'
         ), inc AS (
           SELECT MIN(us) AS i_start, MAX(us) AS i_end
           FROM (SELECT us,
                        SUM(brk) OVER (ORDER BY us, event_id) AS iid
                 FROM egap)
           GROUP BY iid HAVING COUNT(*) >= 3
         )
         SELECT s.user_id, s.s_start AS sess_start_us,
                i.i_start AS inc_start_us,
                LEAST(s.s_end, i.i_end)
                  - GREATEST(s.s_start, i.i_start) AS overlap_us
         FROM sess s JOIN inc i
           ON s.s_start <= i.i_end AND i.i_start <= s.s_end""",

    // q237: identical md5-prefix Count-Min — same 4×256 bucket keys
    // (first two hex chars of md5(j || '|' || key)), same min-of-rows
    // estimate, same top-20 probe set
    "q237_countmin" ->
      """WITH li AS (
           SELECT l_partkey FROM lineitem
         ), keyed AS (
           SELECT l_partkey, j,
                  substr(md5(CAST(j AS VARCHAR) || '|'
                    || CAST(l_partkey AS VARCHAR)), 1, 2) AS bucket
           FROM li CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
         ), sketch AS (
           SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS c
           FROM keyed GROUP BY 1, 2
         ), top AS (
           SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS true_cnt
           FROM li GROUP BY 1
           ORDER BY true_cnt DESC, l_partkey ASC LIMIT 20
         ), probes AS (
           SELECT t.l_partkey, t.true_cnt, j,
                  substr(md5(CAST(j AS VARCHAR) || '|'
                    || CAST(t.l_partkey AS VARCHAR)), 1, 2) AS bucket
           FROM top t CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
         )
         SELECT p.l_partkey, p.true_cnt,
                CAST(MIN(s.c) AS BIGINT) AS est_cnt,
                CAST(MIN(s.c) - p.true_cnt AS BIGINT) AS overcount
         FROM probes p JOIN sketch s
           ON s.j = p.j AND s.bucket = p.bucket
         GROUP BY 1, 2""",

    // q238: same whitespace tokenization and md5-prefix dimension
    "q238_feature_hashing" ->
      """SELECT doc_id, substr(md5(tok), 1, 2) AS dim,
                CAST(COUNT(*) AS BIGINT) AS weight
         FROM (SELECT doc_id,
                      unnest(string_split_regex(lower(trim(text)),
                        '\s+')) AS tok
               FROM documents WHERE text IS NOT NULL)
         WHERE len(tok) > 0
         GROUP BY 1, 2""",

    // q239: naive n² ε-neighbors + recursive-CTE transitive closure on
    // the core-core graph (UNION dedup terminates on cycles); cluster
    // = min core id in the component, borders adopt the min core-
    // neighbor cluster, noise = -1
    "q239_dbscan" ->
      """WITH RECURSIVE pts AS (
           SELECT p_partkey AS pid,
                  CAST(CAST(p_retailprice AS DECIMAL(18,4)) * 100
                       AS BIGINT) AS x,
                  CAST(p_size AS BIGINT) * 100 AS y
           FROM part
           WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
         ), nb AS (
           SELECT a.pid AS pa, b.pid AS pb
           FROM pts a JOIN pts b ON a.pid <> b.pid
           WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                 <= 10000
         ), core AS (
           SELECT pa AS pid FROM nb GROUP BY 1 HAVING COUNT(*) >= 3
         ), ce AS (
           SELECT pa, pb FROM nb
           WHERE pa IN (SELECT pid FROM core)
             AND pb IN (SELECT pid FROM core)
         ), reach(a, b) AS (
           SELECT pa, pb FROM ce
           UNION
           SELECT r.a, ce.pb FROM reach r JOIN ce ON ce.pa = r.b
         ), lab AS (
           SELECT c.pid,
                  LEAST(c.pid, COALESCE(MIN(r.b), c.pid)) AS cluster
           FROM core c LEFT JOIN reach r ON r.a = c.pid
           GROUP BY c.pid
         ), bord AS (
           SELECT n.pa AS pid, MIN(l.cluster) AS cluster
           FROM nb n JOIN lab l ON n.pb = l.pid
           WHERE n.pa NOT IN (SELECT pid FROM core)
           GROUP BY 1
         )
         SELECT p.pid,
                CAST(CASE WHEN l.pid IS NOT NULL THEN 1 ELSE 0 END
                     AS BIGINT) AS is_core,
                CAST(COALESCE(l.cluster, b.cluster, -1) AS BIGINT)
                  AS cluster
         FROM pts p
         LEFT JOIN lab l ON l.pid = p.pid
         LEFT JOIN bord b ON b.pid = p.pid""",

    // q240: fixed-8-round recursive peel; per-level support is the
    // direct u<v<w triangle enumeration credited to all 3 edges (the
    // Spark side early-exits at the fixpoint, which the cascade
    // reaches well inside 8 rounds)
    "q240_ktruss" ->
      """WITH RECURSIVE e0 AS (
           SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
         ), it(i, u, v) AS (
           SELECT 0, u, v FROM e0
           UNION ALL
           SELECT i + 1, t.u, t.v
           FROM it t JOIN (
             SELECT u, v, COUNT(*) AS sup FROM (
               SELECT e1.u AS u, e1.v AS v FROM it e1
                 JOIN it e2 ON e1.u = e2.u AND e1.v < e2.v
                 JOIN it e3 ON e3.u = e1.v AND e3.v = e2.v
               UNION ALL
               SELECT e1.u, e2.v FROM it e1
                 JOIN it e2 ON e1.u = e2.u AND e1.v < e2.v
                 JOIN it e3 ON e3.u = e1.v AND e3.v = e2.v
               UNION ALL
               SELECT e1.v, e2.v FROM it e1
                 JOIN it e2 ON e1.u = e2.u AND e1.v < e2.v
                 JOIN it e3 ON e3.u = e1.v AND e3.v = e2.v
             ) GROUP BY 1, 2
           ) s ON s.u = t.u AND s.v = t.v AND s.sup >= 4
           WHERE t.i < 8
         ), fin AS (
           SELECT u, v FROM it WHERE i = 8
         ), sup AS (
           SELECT u, v, CAST(COUNT(*) AS BIGINT) AS support FROM (
             SELECT e1.u AS u, e1.v AS v FROM fin e1
               JOIN fin e2 ON e1.u = e2.u AND e1.v < e2.v
               JOIN fin e3 ON e3.u = e1.v AND e3.v = e2.v
             UNION ALL
             SELECT e1.u, e2.v FROM fin e1
               JOIN fin e2 ON e1.u = e2.u AND e1.v < e2.v
               JOIN fin e3 ON e3.u = e1.v AND e3.v = e2.v
             UNION ALL
             SELECT e1.v, e2.v FROM fin e1
               JOIN fin e2 ON e1.u = e2.u AND e1.v < e2.v
               JOIN fin e3 ON e3.u = e1.v AND e3.v = e2.v
           ) GROUP BY 1, 2
         )
         SELECT f.u, f.v, COALESCE(s.support, 0) AS support
         FROM fin f LEFT JOIN sup s ON s.u = f.u AND s.v = f.v""",

    // q241: same Monday weeks, same lag classification, churn via
    // NOT EXISTS restricted to observed weeks
    "q241_user_growth" ->
      """WITH uw AS (
           SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
           FROM events WHERE user_id IS NOT NULL
         ), cl AS (
           SELECT user_id, wk,
                  LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS pv
           FROM uw
         ), agg AS (
           SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_active,
                  CAST(SUM(CASE WHEN pv IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_new,
                  CAST(SUM(CASE WHEN pv = wk - INTERVAL 7 DAY
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
                  CAST(SUM(CASE WHEN pv IS NOT NULL
                         AND pv < wk - INTERVAL 7 DAY
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
           FROM cl GROUP BY 1
         ), ch AS (
           SELECT a.wk + INTERVAL 7 DAY AS wk,
                  CAST(COUNT(*) AS BIGINT) AS n_churned
           FROM uw a
           WHERE NOT EXISTS (SELECT 1 FROM uw b
                             WHERE b.user_id = a.user_id
                               AND b.wk = a.wk + INTERVAL 7 DAY)
             AND a.wk + INTERVAL 7 DAY IN (SELECT wk FROM uw)
           GROUP BY 1
         )
         SELECT epoch_us(a.wk) AS week_us, a.n_active, a.n_new,
                a.n_retained, a.n_resurrected,
                CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
         FROM agg a LEFT JOIN ch c ON c.wk = a.wk""",

    // q242: same 4-h sessions, first-letter traces capped at 20,
    // DuckDB's unit-cost levenshtein (identical DP to Spark's)
    "q242_conformance" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts), event_id) AS rn
           FROM events WHERE user_id IS NOT NULL
         ), gap AS (
           SELECT *, CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                    ORDER BY rn) > 14400000000
                  THEN 1 ELSE 0 END AS brk
           FROM ev
         ), s AS (
           SELECT user_id, rn, event_type,
                  SUM(brk) OVER (PARTITION BY user_id ORDER BY rn)
                    AS sid
           FROM gap
         ), sr AS (
           SELECT user_id, sid, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id, sid
                    ORDER BY rn) AS k
           FROM s
         ), tr AS (
           SELECT string_agg(substr(event_type, 1, 1), ''
                    ORDER BY k) AS trace
           FROM sr WHERE k <= 20 GROUP BY user_id, sid
         )
         SELECT CAST(len(trace) AS BIGINT) AS trace_len,
                CAST(levenshtein(trace, 'vcp') AS BIGINT) AS dist,
                CAST(COUNT(*) AS BIGINT) AS n_sessions
         FROM tr GROUP BY 1, 2""",

    // q243: same (brand, year) moment cells in HUGEINT; the slope
    // sign is the q130 numerator — no division anywhere
    "q243_simpson" ->
      """WITH base AS (
           SELECT p.p_brand, year(l.l_shipdate) AS yr,
                  CAST(CAST(l.l_discount AS DECIMAL(18,4)) * 10000
                       AS BIGINT) AS x,
                  CAST(CAST(l.l_quantity AS DECIMAL(18,4)) * 10000
                       AS BIGINT) AS y
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE l.l_discount IS NOT NULL AND l.l_quantity IS NOT NULL
             AND l.l_shipdate IS NOT NULL
         ), cells AS (
           SELECT p_brand, yr, CAST(COUNT(*) AS HUGEINT) AS n,
                  CAST(SUM(x) AS HUGEINT) AS sx,
                  CAST(SUM(y) AS HUGEINT) AS sy,
                  CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
           FROM base GROUP BY 1, 2
         ), seg AS (
           SELECT p_brand,
                  CASE WHEN n * sxy - sx * sy > 0 THEN 1
                       WHEN n * sxy - sx * sy < 0 THEN -1
                       ELSE 0 END AS s
           FROM cells
         ), pooled AS (
           SELECT p_brand,
                  CASE WHEN SUM(n) * SUM(sxy) - SUM(sx) * SUM(sy) > 0
                         THEN 1
                       WHEN SUM(n) * SUM(sxy) - SUM(sx) * SUM(sy) < 0
                         THEN -1
                       ELSE 0 END AS overall_sign
           FROM cells GROUP BY 1
         ), segs AS (
           SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_segments,
                  CAST(SUM(CASE WHEN s > 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_pos,
                  CAST(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_neg
           FROM seg GROUP BY 1
         )
         SELECT g.p_brand, CAST(p.overall_sign AS BIGINT)
                  AS overall_sign,
                g.n_segments, g.n_pos, g.n_neg,
                CAST(CASE WHEN (p.overall_sign > 0
                                AND g.n_neg > g.n_pos)
                            OR (p.overall_sign < 0
                                AND g.n_pos > g.n_neg)
                     THEN 1 ELSE 0 END AS BIGINT) AS simpson_flag
         FROM segs g JOIN pooled p ON p.p_brand = g.p_brand""",

    "q244_woe_iv" -> woeIvOracleSql,
    "q245_js_matrix" -> jsMatrixOracleSql,
    "q246_doc_entropy" -> docEntropyOracleSql,
    "q247_quality_classifier" -> qualityClassifierOracleSql,
    "q248_softmax_mix" -> softmaxMixOracleSql,
    "q249_perplexity" -> perplexityOracleSql,
    "q250_calibration" -> calibrationOracleSql,
    "q251_decayed_engagement" -> decayedEngagementOracleSql,
    "q252_roc_auc" -> rocAucOracleSql,
    "q253_l_diversity" -> lDiversityOracleSql,
    "q254_t_closeness" -> tClosenessOracleSql,
    "q255_fifo_costing" -> fifoCostingOracleSql,
    "q256_sprt" -> sprtOracleSql,
    "q257_naive_bayes" -> naiveBayesOracleSql,
    "q258_zipf_fit" -> zipfFitOracleSql,
    "q259_readability" -> readabilityOracleSql,
    "q260_cuped" -> cupedOracleSql,
    "q261_hill_tail" -> hillTailOracleSql,
    "q262_jl_projection" -> jlProjectionOracleSql,
    "q263_bradley_terry" -> bradleyTerryOracleSql,
    "q264_rendezvous" -> rendezvousOracleSql,
    "q265_scan_cluster" -> scanClusterOracleSql,
    "q266_als_rank1" -> alsRank1OracleSql,
    "q267_sax" -> saxOracleSql,
    "q268_mutual_info" -> mutualInfoOracleSql,
    "q269_perm_test" -> permTestOracleSql,
    "q270_dp_release" -> dpReleaseOracleSql,
    "q271_partial_corr" -> partialCorrOracleSql,
    "q272_elasticity" -> elasticityOracleSql,
    "q273_ams_sketch" -> amsSketchOracleSql,
    "q274_fano_factor" -> fanoFactorOracleSql,
    "q275_single_linkage" -> singleLinkageOracleSql,
    "q276_rolling_ols" -> rollingOlsOracleSql,
    "q277_retention_halflife" -> retentionHalflifeOracleSql,
    "q278_srm_check" -> srmCheckOracleSql,
    "q279_seasonality_strength" -> seasonalityStrengthOracleSql,
    "q280_segmental_ttr" -> segmentalTtrOracleSql,
    "q281_diff_in_diff" -> diffInDiffOracleSql,
  )
}
