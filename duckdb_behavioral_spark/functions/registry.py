"""Extension query/oracle registry (training-data pipeline + host surface)."""

from __future__ import annotations

from duckdb_behavioral_spark.functions import chunking as CH
from duckdb_behavioral_spark.functions import compositions as C
from duckdb_behavioral_spark.functions import corpus as CO
from duckdb_behavioral_spark.functions import dedup as D
from duckdb_behavioral_spark.functions import embeddings as E
from duckdb_behavioral_spark.functions import multimodal as M
from duckdb_behavioral_spark.functions import sampling as SA
from duckdb_behavioral_spark.functions import similarity as S
from duckdb_behavioral_spark.functions import sketches as SK
from duckdb_behavioral_spark.functions import cms as CM
from duckdb_behavioral_spark.functions import bloom as BL
from duckdb_behavioral_spark.functions import mixing as MX
from duckdb_behavioral_spark.functions import passages as PG
from duckdb_behavioral_spark.functions import reports as RP
from duckdb_behavioral_spark.functions import search as SE
from duckdb_behavioral_spark.functions import text as TX
from duckdb_behavioral_spark.functions import tpch_extra as TE
from duckdb_behavioral_spark.functions import tpch_subqueries as TS
from duckdb_behavioral_spark.functions import tpch_final as TF
from duckdb_behavioral_spark.functions import experiments as EX
from duckdb_behavioral_spark.functions import sliding as SL
from duckdb_behavioral_spark.operators import attribution as AT
from duckdb_behavioral_spark.operators import scd2 as SC
from duckdb_behavioral_spark.operators import concurrency as CCY
from duckdb_behavioral_spark.operators import graph as GR
from duckdb_behavioral_spark.operators import cohorts as CHT
from duckdb_behavioral_spark.operators import temporal_joins as TJ
from duckdb_behavioral_spark.operators import cdc as CDC
from duckdb_behavioral_spark.operators import skew as SKW
from duckdb_behavioral_spark.operators import zorder as ZO
from duckdb_behavioral_spark.functions import rollup_cascade as RC
from duckdb_behavioral_spark.functions import gapfill as GF
from duckdb_behavioral_spark.functions import profiling as PF
from duckdb_behavioral_spark.functions import ngram_lm as NL
from duckdb_behavioral_spark.functions import histogram as HG
from duckdb_behavioral_spark.functions import inverted as IV
from duckdb_behavioral_spark.functions import hll_sliding as HS
from duckdb_behavioral_spark.functions import fuzzy as FZ
from duckdb_behavioral_spark.functions import timeweight as TW
from duckdb_behavioral_spark.functions import cusum as CU
from duckdb_behavioral_spark.functions import churn as CN
from duckdb_behavioral_spark.functions import compaction as CPN
from duckdb_behavioral_spark.functions import dq as DQ
from duckdb_behavioral_spark.functions import basket as BK
from duckdb_behavioral_spark.operators import triangles as TRI
from duckdb_behavioral_spark.functions import stats as ST
from duckdb_behavioral_spark.functions import dimcov as DC
from duckdb_behavioral_spark.functions import phrase as PH
from duckdb_behavioral_spark.functions import distribution as DSB
from duckdb_behavioral_spark.operators import snapshot_diff as SD
from duckdb_behavioral_spark.functions import lm_score as LS
from duckdb_behavioral_spark.operators import path_mining as PM
from duckdb_behavioral_spark.functions import ann_eval as AE
from duckdb_behavioral_spark.operators import ltv as LT
from duckdb_behavioral_spark.functions import abc as ABC
from duckdb_behavioral_spark.functions import concentration as HH
from duckdb_behavioral_spark.functions import corpus_growth as CG
from duckdb_behavioral_spark.functions import bloom_join as BJ
from duckdb_behavioral_spark.functions import leakage as LK
from duckdb_behavioral_spark.functions import feathash as FH
from duckdb_behavioral_spark.functions import encoding as EN
from duckdb_behavioral_spark.functions import seasonal as SN
from duckdb_behavioral_spark.functions import chi2 as C2
from duckdb_behavioral_spark.functions import containment as CT
from duckdb_behavioral_spark.functions import rrf as RF
from duckdb_behavioral_spark.functions import oov as OV
from duckdb_behavioral_spark.functions import deciles as DL
from duckdb_behavioral_spark.functions import ann_filtered as AF
from duckdb_behavioral_spark.functions import canonical as CNP
from duckdb_behavioral_spark.functions import wow as WW
from duckdb_behavioral_spark.functions import curriculum as CUR
from duckdb_behavioral_spark.functions import lifecycle as LC
from duckdb_behavioral_spark.functions import novelty as NV
from duckdb_behavioral_spark.operators import session_cap as SHC
from duckdb_behavioral_spark.functions import drift as DR
from duckdb_behavioral_spark.functions import repeat as RPT
from duckdb_behavioral_spark.functions import sweep as SW
from duckdb_behavioral_spark.functions import backlog as BLG
from duckdb_behavioral_spark.functions import brandshare as BS
from duckdb_behavioral_spark.functions import norm_deciles as ND
from duckdb_behavioral_spark.functions import streaks as STK
from duckdb_behavioral_spark.functions import mad as MAD
from duckdb_behavioral_spark.functions import stickiness as STY
from duckdb_behavioral_spark.functions import gaphist as GH
from duckdb_behavioral_spark.functions import reorder as RO
from duckdb_behavioral_spark.functions import hamming as HM
from duckdb_behavioral_spark.functions import confusion as CF
from duckdb_behavioral_spark.functions import sessfunnel as SFN
from duckdb_behavioral_spark.functions import lang_deciles as LD
from duckdb_behavioral_spark.functions import kmv_sliding as KS
from duckdb_behavioral_spark.functions import sla as SLA
from duckdb_behavioral_spark.functions import funneltiming as FT
from duckdb_behavioral_spark.functions import league as LG
from duckdb_behavioral_spark.functions import burstiness as BU
from duckdb_behavioral_spark.functions import pq_error as PE
from duckdb_behavioral_spark.functions import dedup_eval as DE
from duckdb_behavioral_spark.functions import ann_sweep as ASW
from duckdb_behavioral_spark.functions import ann_health as AH
from duckdb_behavioral_spark.functions import waterfall as WF
from duckdb_behavioral_spark.functions import survival as SV
from duckdb_behavioral_spark.functions import minhash_calibration as MC
from duckdb_behavioral_spark.functions import zipf as ZF
from duckdb_behavioral_spark.functions import poweruser as PU
from duckdb_behavioral_spark.functions import source_overlap as SO
from duckdb_behavioral_spark.functions import prototypes as PR
from duckdb_behavioral_spark.functions import split_drift as SDR
from duckdb_behavioral_spark.functions import label_noise as LN
from duckdb_behavioral_spark.functions import hubness as HB
from duckdb_behavioral_spark.functions import df_profile as DFP
from duckdb_behavioral_spark.functions import boilerplate as BP
from duckdb_behavioral_spark.functions import rfm_migration as RM
from duckdb_behavioral_spark.functions import reorder_trend as RT
from duckdb_behavioral_spark.functions import pad_waste as PW
from duckdb_behavioral_spark.functions import audience as AU
from duckdb_behavioral_spark.functions import pq_transfer as PT

EXT_QUERIES = {
    # text analysis
    "text_token_stats": TX.q_text_token_stats,
    "text_token_count_bpe": TX.q_token_count_bpe,
    "text_lang_id": TX.q_text_lang_id,
    "text_fingerprint": TX.q_text_fingerprint,
    "text_winnow_fingerprints": TX.q_winnow_fingerprints,
    "text_quality": TX.q_text_quality,
    "text_quality_filter": TX.q_text_quality_filter,
    "text_scrub_pii": TX.q_text_scrub_pii,
    # corpus-level text statistics
    "corpus_decontaminate": CO.q_decontaminate,
    "text_repetition": CO.q_text_repetition,
    "corpus_topk_terms": CO.q_topk_terms,
    "corpus_doc_rarity": CO.q_doc_rarity,
    "corpus_term_cooccurrence": CO.q_term_cooccurrence,
    "corpus_decontaminate_attr": CO.q_decontaminate_attributed,
    "chunk_documents": CH.q_chunk_documents,
    "pack_sequences": CH.q_pack_sequences,
    "mix_corpus": MX.q_mix_corpus,
    # embeddings utilities
    "embedding_quantize": E.q_embedding_quantize,
    "embedding_label_coherence": E.q_label_coherence,
    # dedup
    "dedup_exact": D.q_dedup_exact,
    "dedup_ngram_jaccard": D.q_dedup_ngram_jaccard,
    "dedup_clusters": D.q_dedup_clusters,
    "dedup_minhash_sigs": D.q_dedup_minhash_sigs,
    "dedup_minhash_pairs": D.q_dedup_minhash_pairs,
    "dedup_simhash": D.q_dedup_simhash,
    "dedup_embedding_cosine": D.q_dedup_embedding_cosine,
    "dedup_winnow_pairs": D.q_dedup_winnow_pairs,
    "dedup_lsh_recall_eval": DE.q_dedup_lsh_recall_eval,
    "dedup_incremental_newdocs": DE.q_dedup_incremental_newdocs,
    # sketches
    "sketch_hll": SK.q_sketch_hll,
    "sketch_kmv_overlap": SK.q_sketch_kmv_overlap,
    "sketch_quantile_sample": SK.q_quantile_sample,
    # sampling
    "sample_stratified": SA.q_sample_stratified,
    "sample_per_stratum_topk": SA.q_sample_per_stratum_topk,
    "sample_weighted": SA.q_sample_weighted,
    "sample_negatives": SA.q_sample_negatives,
    "dataset_split": SA.q_dataset_split,
    # similarity search
    "ann_cosine_topk": S.q_ann_cosine_topk,
    "ann_lsh_buckets": S.q_ann_lsh_buckets,
    "ann_ivf_topk": S.q_ann_ivf_topk,
    "ann_ivf_kmeans_topk": S.q_ann_ivf_kmeans_topk,
    "ann_pq_topk": S.q_ann_pq_topk,
    "ann_ivfpq_topk": S.q_ann_ivfpq_topk,
    # multimodal
    "multimodal_features": M.q_multimodal_features,
    "multimodal_frames": M.q_multimodal_frames,
    "multimodal_bmp_decode": M.q_multimodal_bmp_decode,
    "multimodal_wav_decode": M.q_multimodal_wav_decode,
    "multimodal_ppm_decode": M.q_multimodal_ppm_decode,
    # cohort / attribution reporting layer
    "cohort_retention": CHT.q_cohort_retention,
    "rolling_active_users": CHT.q_rolling_active,
    "cohort_funnel": CHT.q_cohort_funnel,
    "attribution_last_touch": AT.q_attribution_last_touch,
    "attribution_time_decay": AT.q_attribution_time_decay,
    "user_state_scd2": SC.q_user_state_scd2,
    "cdc_merge_users": CDC.q_cdc_merge_users,
    "scd2_point_in_time": SC.q_scd2_point_in_time,
    "events_salted_join": SKW.q_events_salted_join,
    "events_rollup_cascade": RC.q_events_rollup_cascade,
    "events_zorder_cells": ZO.q_events_zorder_cells,
    "multimodal_binaryfile_ingest": M.q_multimodal_binaryfile_ingest,
    "dedup_fuzzy_titles": FZ.q_dedup_fuzzy_titles,
    "events_time_weighted_avg": TW.q_events_time_weighted_avg,
    "events_cusum_daily": CU.q_events_cusum_daily,
    "events_user_churn": CN.q_events_user_churn,
    "events_gapfill_locf": GF.q_events_gapfill_locf,
    "files_compaction_bins": CPN.q_files_compaction_bins,
    "dq_constraint_audit": DQ.q_dq_constraint_audit,
    "orders_market_basket": BK.q_orders_market_basket,
    "graph_triangle_count": TRI.q_graph_triangle_count,
    "lineitem_price_qty_ols": ST.q_lineitem_price_qty_ols,
    "events_daily_acf": ST.q_events_daily_acf,
    "embedding_dim_covariance": DC.q_embedding_dim_covariance,
    "search_phrase_match": PH.q_search_phrase_match,
    "events_median_gap": DSB.q_events_median_gap,
    "customer_revenue_gini": DSB.q_customer_revenue_gini,
    "scd2_snapshot_diff": SD.q_scd2_snapshot_diff,
    "text_lm_likelihood": LS.q_text_lm_likelihood,
    "session_trigrams_topk": PM.q_session_trigrams_topk,
    "ann_recall_eval": AE.q_ann_recall_eval,
    "user_ltv_cohort_curve": LT.q_user_ltv_cohort_curve,
    "lineitem_abc_classes": ABC.q_lineitem_abc_classes,
    "events_type_hhi": HH.q_events_type_hhi,
    "corpus_vocab_growth": CG.q_corpus_vocab_growth,
    "dedup_cluster_sizes": CG.q_dedup_cluster_sizes,
    # round 7: ML-prep / warehouse additions
    "bloom_semijoin_pushdown": BJ.q_bloom_semijoin_pushdown,
    "split_leakage_audit": LK.q_split_leakage_audit,
    "feature_hashing": FH.q_feature_hashing,
    "target_encoding": EN.q_target_encoding,
    "dow_seasonal_profile": SN.q_dow_seasonal_profile,
    "corpus_slice_chi2": C2.q_corpus_slice_chi2,
    "dedup_containment": CT.q_dedup_containment,
    "search_rrf_fusion": RF.q_search_rrf_fusion,
    "corpus_oov_rate": OV.q_corpus_oov_rate,
    "lineitem_price_deciles": DL.q_lineitem_price_deciles,
    "dedup_rate_by_source": D.q_dedup_rate_by_source,
    "ann_filtered_topk": AF.q_ann_filtered_topk,
    "dedup_canonical_pick": CNP.q_dedup_canonical_pick,
    "events_wow_growth": WW.q_events_wow_growth,
    "corpus_curriculum_phases": CUR.q_curriculum_phases,
    "user_lifecycle_ledger": LC.q_user_lifecycle_ledger,
    "session_hard_cap": SHC.q_session_hard_cap,
    "corpus_ngram_novelty": NV.q_corpus_ngram_novelty,
    "dq_schema_drift": DR.q_dq_schema_drift,
    "orders_repeat_rate": RPT.q_orders_repeat_rate,
    "corpus_langid_confusion": CF.q_corpus_langid_confusion,
    "dedup_threshold_sweep": SW.q_dedup_threshold_sweep,
    "orders_backlog_daily": BLG.q_orders_backlog_daily,
    "part_brand_share_top_other": BS.q_part_brand_share_top_other,
    "embedding_norm_deciles": ND.q_embedding_norm_deciles,
    "user_visit_streaks": STK.q_user_visit_streaks,
    "events_anomaly_mad": MAD.q_events_anomaly_mad,
    "events_dau_mau_stickiness": STY.q_events_dau_mau_stickiness,
    "events_gap_digits_histogram": GH.q_events_gap_digits_histogram,
    "orders_reorder_quartiles": RO.q_orders_reorder_quartiles,
    "dedup_simhash_hamming_hist": HM.q_dedup_simhash_hamming_hist,
    # round 9: flagship composition (sessionize + window_funnel + cohort)
    "cohort_sessionized_funnel": SFN.q_cohort_sessionized_funnel,
    "doc_length_deciles_by_lang": LD.q_doc_length_deciles_by_lang,
    "sketch_kmv_sliding": KS.q_sketch_kmv_sliding,
    "orders_ship_sla_bands": SLA.q_orders_ship_sla_bands,
    "cohort_conversion_time_quartiles": FT.q_cohort_conversion_time_quartiles,
    "supplier_weekly_rank_delta": LG.q_supplier_weekly_rank_delta,
    # round 10: vocabulary-shape diagnostics + PQ codebook health
    "corpus_token_burstiness": BU.q_corpus_token_burstiness,
    "corpus_heaps_residual": BU.q_corpus_heaps_residual,
    "ann_pq_quantization_error": PE.q_ann_pq_quantization_error,
    "ann_ivf_nprobe_sweep": ASW.q_ann_ivf_nprobe_sweep,
    "ann_ivf_cluster_balance": AH.q_ann_ivf_cluster_balance,
    "orders_fill_rate_waterfall": WF.q_orders_fill_rate_waterfall,
    "user_purchase_survival": SV.q_user_purchase_survival,
    "dedup_minhash_calibration": MC.q_dedup_minhash_calibration,
    "corpus_zipf_tail_share": ZF.q_corpus_zipf_tail_share,
    "events_power_user_curve": PU.q_events_power_user_curve,
    "dedup_source_overlap": SO.q_dedup_source_overlap,
    "embedding_cluster_prototypes": PR.q_embedding_cluster_prototypes,
    "embedding_split_drift": SDR.q_embedding_split_drift,
    "embedding_label_noise": LN.q_embedding_label_noise,
    "embedding_knn_hubness": HB.q_embedding_knn_hubness,
    "dedup_shingle_df_profile": DFP.q_dedup_shingle_df_profile,
    "corpus_boilerplate_passages": BP.q_corpus_boilerplate_passages,
    "user_rfm_migration": RM.q_user_rfm_migration,
    "orders_reorder_gap_trend": RT.q_orders_reorder_gap_trend,
    "training_pad_waste_curve": PW.q_training_pad_waste_curve,
    "events_audience_overlap": AU.q_events_audience_overlap,
    "embedding_pq_transfer": PT.q_embedding_pq_transfer,
    "table_profile": PF.q_table_profile,
    "text_bigram_lm": NL.q_text_bigram_lm,
    "events_value_histogram": HG.q_events_value_histogram,
    "search_inverted_postings": IV.q_search_inverted_postings,
    "sketch_hll_sliding": HS.q_sketch_hll_sliding,
    "ab_funnel_significance": EX.q_ab_funnel_significance,
    "ab_funnel_steps": EX.q_ab_funnel_steps,
    "session_transitions": AT.q_session_transitions,
    "funnel_step_timings": AT.q_funnel_step_timings,
    "user_burstiness": AT.q_user_burstiness,
    "session_concurrency": CCY.q_session_concurrency,
    "transition_pagerank": GR.q_transition_pagerank,
    # corpus search / passage dedup / frequency sketch
    "search_bm25_topk": SE.q_bm25_topk,
    "dedup_passage": PG.q_passage_dup,
    "sketch_cms_heavy_hitters": CM.q_cms_heavy_hitters,
    "sketch_bloom_membership": BL.q_sketch_bloom_membership,
    # operational reports
    "events_hourly_anomaly": RP.q_hourly_anomalies,
    "user_rfm_segments": RP.q_user_rfm,
    "events_hourly_ohlc": RP.q_hourly_ohlc,
    "events_daily_trend": RP.q_daily_trend,
    # temporal joins
    "asof_view_before_purchase": TJ.q_asof_view_before_purchase,
    "range_views_after_error": TJ.q_range_views_after_error,
    # host-surface compositions
    "tpch_pricing_flags": C.q_tpch_pricing_flags,
    "orders_by_nation": C.q_orders_by_nation,
    "tpch_q3_topk": C.q_tpch_q3_topk,
    "tpch_q5_region_revenue": C.q_tpch_q5_region_revenue,
    "tpch_q6_revenue": C.q_tpch_q6_revenue,
    "tpch_q10_returned_topk": C.q_tpch_q10_returned_topk,
    "tpch_q14_promo": TE.q_tpch_q14_promo,
    "tpch_q18_large_orders": TE.q_tpch_q18_large_orders,
    "tpch_q4_late_orders": TE.q_tpch_q4_late_orders,
    "customers_inactive_antijoin": TE.q_customers_inactive,
    "tpch_q19_disjunctive": TE.q_tpch_q19_disjunctive,
    "tpch_q2_min_cost_supplier": TS.q_tpch_q2_min_cost_supplier,
    "tpch_q11_important_stock": TS.q_tpch_q11_important_stock,
    "tpch_q15_top_supplier": TS.q_tpch_q15_top_supplier,
    "tpch_q21_waiting_suppliers": TS.q_tpch_q21_waiting_suppliers,
    "tpch_q7_volume_shipping": TS.q_tpch_q7_volume_shipping,
    "tpch_q8_market_share": TS.q_tpch_q8_market_share,
    "tpch_q13_order_counts": TS.q_tpch_q13_order_counts,
    "tpch_q22_idle_balances": TS.q_tpch_q22_idle_balances,
    "tpch_q9_profit": TF.q_tpch_q9_profit,
    "tpch_q12_late_lines": TF.q_tpch_q12_late_lines,
    "tpch_q16_supplier_counts": TF.q_tpch_q16_supplier_counts,
    "tpch_q17_small_qty_revenue": TF.q_tpch_q17_small_qty_revenue,
    "tpch_q20_promotion_suppliers": TF.q_tpch_q20_promotion_suppliers,
    "order_fulfillment_lag": TE.q_order_fulfillment_lag,
    "events_hourly_rollup": C.q_events_hourly_rollup,
    "events_sliding_rollup": SL.q_events_sliding_rollup,
    "events_rollup_cube": C.q_events_rollup_cube,
    "events_type_pivot": C.q_events_type_pivot,
    "users_setops": C.q_users_setops,
    "events_props_json": C.q_events_props_json,
    "retention_report": C.q_retention_report,
    "retention_report_salted": C.q_retention_report_salted,
    "events_pct_of_total": C.q_events_pct_of_total,
    "training_set_select": C.q_training_set_select,
    "training_pipeline_pack": C.q_training_pipeline_pack,
}

EXT_ORACLES = {
    "text_token_stats": TX.TOKEN_STATS_SQL,
    "text_token_count_bpe": TX.TOKEN_BPE_SQL,
    "text_lang_id": TX.LANG_ID_SQL,
    "text_fingerprint": TX.FINGERPRINT_SQL,
    "text_winnow_fingerprints": TX.WINNOW_SQL,
    "text_quality": TX.QUALITY_SQL,
    "text_quality_filter": TX.QUALITY_FILTER_SQL,
    "text_scrub_pii": TX.SCRUB_PII_SQL,
    "corpus_decontaminate": CO.DECONTAMINATE_SQL,
    "text_repetition": CO.REPETITION_SQL,
    "corpus_topk_terms": CO.TOPK_TERMS_SQL,
    "corpus_doc_rarity": CO.DOC_RARITY_SQL,
    "corpus_term_cooccurrence": CO.TERM_COOC_SQL,
    "corpus_decontaminate_attr": CO.DECONTAMINATE_ATTR_SQL,
    "chunk_documents": CH.CHUNK_DOCUMENTS_SQL,
    "pack_sequences": CH.PACK_SEQUENCES_SQL,
    "mix_corpus": MX.MIX_CORPUS_SQL,
    "embedding_quantize": E.QUANTIZE_SQL,
    "embedding_label_coherence": E.LABEL_COHERENCE_SQL,
    "dedup_exact": D.DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": D.DEDUP_JACCARD_SQL,
    "dedup_clusters": D.DEDUP_CLUSTERS_SQL,
    "dedup_minhash_sigs": D.MINHASH_SIG_SQL,
    "dedup_minhash_pairs": D.MINHASH_PAIRS_SQL,
    "dedup_simhash": D.SIMHASH_SQL,
    "dedup_embedding_cosine": D.COSINE_DUP_SQL,
    "dedup_winnow_pairs": D.WINNOW_PAIRS_SQL,
    "dedup_lsh_recall_eval": DE.LSH_RECALL_EVAL_SQL,
    "dedup_incremental_newdocs": DE.INCREMENTAL_NEWDOCS_SQL,
    "sketch_hll": SK.SKETCH_HLL_SQL,
    "sketch_kmv_overlap": SK.SKETCH_KMV_SQL,
    "sketch_quantile_sample": SK.QUANTILE_SAMPLE_SQL,
    "sample_stratified": SA.SAMPLE_STRATIFIED_SQL,
    "sample_per_stratum_topk": SA.SAMPLE_PER_STRATUM_SQL,
    "sample_weighted": SA.SAMPLE_WEIGHTED_SQL,
    "sample_negatives": SA.SAMPLE_NEGATIVES_SQL,
    "dataset_split": SA.DATASET_SPLIT_SQL,
    "ann_cosine_topk": S.ANN_TOPK_SQL,
    "ann_lsh_buckets": S.LSH_BUCKETS_SQL,
    "ann_ivf_topk": S.ANN_IVF_SQL,
    "ann_ivf_kmeans_topk": S.ANN_IVF_KMEANS_SQL,
    "ann_pq_topk": S.ANN_PQ_SQL,
    "ann_ivfpq_topk": S.ANN_IVFPQ_SQL,
    "multimodal_features": M.MULTIMODAL_SQL,
    "multimodal_frames": M.MULTIMODAL_FRAMES_SQL,
    "multimodal_bmp_decode": M.BMP_DECODE_SQL,
    "multimodal_wav_decode": M.WAV_DECODE_SQL,
    "multimodal_ppm_decode": M.PPM_DECODE_SQL,
    "cohort_retention": CHT.COHORT_RETENTION_SQL,
    "rolling_active_users": CHT.ROLLING_ACTIVE_SQL,
    "cohort_funnel": CHT.COHORT_FUNNEL_SQL,
    "attribution_last_touch": AT.ATTRIBUTION_SQL,
    "attribution_time_decay": AT.TIME_DECAY_SQL,
    "user_state_scd2": SC.USER_STATE_SCD2_SQL,
    "cdc_merge_users": CDC.CDC_MERGE_SQL,
    "scd2_point_in_time": SC.SCD2_POINT_IN_TIME_SQL,
    "events_salted_join": SKW.SALTED_JOIN_SQL,
    "events_rollup_cascade": RC.ROLLUP_CASCADE_SQL,
    "events_zorder_cells": ZO.ZORDER_CELLS_SQL,
    "multimodal_binaryfile_ingest": M.BINARYFILE_INGEST_SQL,
    "dedup_fuzzy_titles": FZ.FUZZY_TITLES_SQL,
    "events_time_weighted_avg": TW.TIME_WEIGHTED_AVG_SQL,
    "events_cusum_daily": CU.CUSUM_DAILY_SQL,
    "events_user_churn": CN.USER_CHURN_SQL,
    "events_gapfill_locf": GF.GAPFILL_LOCF_SQL,
    "files_compaction_bins": CPN.FILES_COMPACTION_SQL,
    "dq_constraint_audit": DQ.DQ_AUDIT_SQL,
    "orders_market_basket": BK.MARKET_BASKET_SQL,
    "graph_triangle_count": TRI.GRAPH_TRIANGLES_SQL,
    "lineitem_price_qty_ols": ST.PRICE_QTY_OLS_SQL,
    "events_daily_acf": ST.DAILY_ACF_SQL,
    "embedding_dim_covariance": DC.DIM_COV_SQL,
    "search_phrase_match": PH.PHRASE_MATCH_SQL,
    "events_median_gap": DSB.MEDIAN_GAP_SQL,
    "customer_revenue_gini": DSB.REVENUE_GINI_SQL,
    "scd2_snapshot_diff": SD.SNAPSHOT_DIFF_SQL,
    "text_lm_likelihood": LS.LM_LIKELIHOOD_SQL,
    "session_trigrams_topk": PM.SESSION_TRIGRAMS_SQL,
    "ann_recall_eval": AE.ANN_RECALL_SQL,
    "user_ltv_cohort_curve": LT.LTV_CURVE_SQL,
    "lineitem_abc_classes": ABC.ABC_CLASSES_SQL,
    "events_type_hhi": HH.TYPE_HHI_SQL,
    "corpus_vocab_growth": CG.VOCAB_GROWTH_SQL,
    "dedup_cluster_sizes": CG._cluster_sizes_sql(),
    "bloom_semijoin_pushdown": BJ.BLOOM_SEMIJOIN_SQL,
    "split_leakage_audit": LK._leakage_sql(),
    "feature_hashing": FH.FEATURE_HASHING_SQL,
    "target_encoding": EN.TARGET_ENCODING_SQL,
    "dow_seasonal_profile": SN.DOW_SEASONAL_SQL,
    "corpus_slice_chi2": C2.CORPUS_SLICE_CHI2_SQL,
    "dedup_containment": CT._containment_sql(),
    "search_rrf_fusion": RF._rrf_sql(),
    "corpus_oov_rate": OV.CORPUS_OOV_SQL,
    "lineitem_price_deciles": DL.PRICE_DECILES_SQL,
    "dedup_rate_by_source": D.DEDUP_RATE_BY_SOURCE_SQL,
    "ann_filtered_topk": AF.ANN_FILTERED_SQL,
    "dedup_canonical_pick": CNP.CANONICAL_PICK_SQL,
    "events_wow_growth": WW.WOW_GROWTH_SQL,
    "corpus_curriculum_phases": CUR.CURRICULUM_SQL,
    "user_lifecycle_ledger": LC.LIFECYCLE_SQL,
    "session_hard_cap": SHC.SESSION_CAP_SQL,
    "corpus_ngram_novelty": NV.NOVELTY_SQL,
    "dq_schema_drift": DR.SCHEMA_DRIFT_SQL,
    "orders_repeat_rate": RPT.REPEAT_RATE_SQL,
    "corpus_langid_confusion": CF.LANGID_CONFUSION_SQL,
    "dedup_threshold_sweep": SW._sweep_sql(),
    "orders_backlog_daily": BLG.BACKLOG_SQL,
    "part_brand_share_top_other": BS.BRAND_SHARE_SQL,
    "embedding_norm_deciles": ND.NORM_DECILES_SQL,
    "user_visit_streaks": STK.STREAKS_SQL,
    "events_anomaly_mad": MAD.ANOMALY_MAD_SQL,
    "events_dau_mau_stickiness": STY.STICKINESS_SQL,
    "events_gap_digits_histogram": GH.GAP_DIGITS_SQL,
    "orders_reorder_quartiles": RO.REORDER_QUARTILES_SQL,
    "dedup_simhash_hamming_hist": HM._hamming_sql(),
    "cohort_sessionized_funnel": SFN.SESSIONIZED_FUNNEL_SQL,
    "doc_length_deciles_by_lang": LD.LANG_DECILES_SQL,
    "sketch_kmv_sliding": KS.KMV_SLIDING_SQL,
    "orders_ship_sla_bands": SLA.SLA_BANDS_SQL,
    "cohort_conversion_time_quartiles": FT.CONVERSION_TIME_SQL,
    "supplier_weekly_rank_delta": LG.LEAGUE_SQL,
    "corpus_token_burstiness": BU.BURSTINESS_SQL,
    "corpus_heaps_residual": BU.HEAPS_RESIDUAL_SQL,
    "ann_pq_quantization_error": PE.PQ_ERROR_SQL,
    "ann_ivf_nprobe_sweep": ASW.ANN_NPROBE_SWEEP_SQL,
    "ann_ivf_cluster_balance": AH.ANN_CLUSTER_BALANCE_SQL,
    "orders_fill_rate_waterfall": WF.FILL_WATERFALL_SQL,
    "user_purchase_survival": SV.PURCHASE_SURVIVAL_SQL,
    "dedup_minhash_calibration": MC.MINHASH_CALIBRATION_SQL,
    "corpus_zipf_tail_share": ZF.ZIPF_TAIL_SQL,
    "events_power_user_curve": PU.POWER_USER_SQL,
    "dedup_source_overlap": SO.SOURCE_OVERLAP_SQL,
    "embedding_cluster_prototypes": PR.CLUSTER_PROTOTYPES_SQL,
    "embedding_split_drift": SDR.SPLIT_DRIFT_SQL,
    "embedding_label_noise": LN.LABEL_NOISE_SQL,
    "embedding_knn_hubness": HB.KNN_HUBNESS_SQL,
    "dedup_shingle_df_profile": DFP.SHINGLE_DF_PROFILE_SQL,
    "corpus_boilerplate_passages": BP.BOILERPLATE_SQL,
    "user_rfm_migration": RM.RFM_MIGRATION_SQL,
    "orders_reorder_gap_trend": RT.REORDER_TREND_SQL,
    "training_pad_waste_curve": PW.PAD_WASTE_SQL,
    "events_audience_overlap": AU.AUDIENCE_OVERLAP_SQL,
    "embedding_pq_transfer": PT.PQ_TRANSFER_SQL,
    "table_profile": PF.TABLE_PROFILE_SQL,
    "text_bigram_lm": NL.BIGRAM_LM_SQL,
    "events_value_histogram": HG.VALUE_HISTOGRAM_SQL,
    "search_inverted_postings": IV.INVERTED_POSTINGS_SQL,
    "sketch_hll_sliding": HS.HLL_SLIDING_SQL,
    "ab_funnel_significance": EX.AB_FUNNEL_SQL,
    "ab_funnel_steps": EX.AB_FUNNEL_STEPS_SQL,
    "session_transitions": AT.SESSION_TRANSITIONS_SQL,
    "funnel_step_timings": AT.FUNNEL_TIMINGS_SQL,
    "user_burstiness": AT.BURSTINESS_SQL,
    "session_concurrency": CCY.SESSION_CONCURRENCY_SQL,
    "transition_pagerank": GR.TRANSITION_PAGERANK_SQL,
    "search_bm25_topk": SE.BM25_TOPK_SQL,
    "dedup_passage": PG.PASSAGE_DUP_SQL,
    "sketch_cms_heavy_hitters": CM.CMS_HEAVY_HITTERS_SQL,
    "sketch_bloom_membership": BL.BLOOM_MEMBERSHIP_SQL,
    "events_hourly_anomaly": RP.HOURLY_ANOMALY_SQL,
    "user_rfm_segments": RP.USER_RFM_SQL,
    "events_hourly_ohlc": RP.HOURLY_OHLC_SQL,
    "events_daily_trend": RP.DAILY_TREND_SQL,
    "asof_view_before_purchase": TJ.ASOF_SQL,
    "range_views_after_error": TJ.RANGE_SQL,
    "tpch_pricing_flags": C.TPCH_PRICING_SQL,
    "orders_by_nation": C.ORDERS_BY_NATION_SQL,
    "tpch_q3_topk": C.TPCH_Q3_SQL,
    "tpch_q5_region_revenue": C.TPCH_Q5_SQL,
    "tpch_q6_revenue": C.TPCH_Q6_SQL,
    "tpch_q10_returned_topk": C.TPCH_Q10_SQL,
    "tpch_q14_promo": TE.TPCH_Q14_SQL,
    "tpch_q18_large_orders": TE.TPCH_Q18_SQL,
    "tpch_q4_late_orders": TE.TPCH_Q4_SQL,
    "customers_inactive_antijoin": TE.CUSTOMERS_INACTIVE_SQL,
    "tpch_q19_disjunctive": TE.TPCH_Q19_SQL,
    "tpch_q2_min_cost_supplier": TS.TPCH_Q2_SQL,
    "tpch_q11_important_stock": TS.TPCH_Q11_SQL,
    "tpch_q15_top_supplier": TS.TPCH_Q15_SQL,
    "tpch_q21_waiting_suppliers": TS.TPCH_Q21_SQL,
    "tpch_q7_volume_shipping": TS.TPCH_Q7_SQL,
    "tpch_q8_market_share": TS.TPCH_Q8_SQL,
    "tpch_q13_order_counts": TS.TPCH_Q13_SQL,
    "tpch_q22_idle_balances": TS.TPCH_Q22_SQL,
    "tpch_q9_profit": TF.TPCH_Q9_SQL,
    "tpch_q12_late_lines": TF.TPCH_Q12_SQL,
    "tpch_q16_supplier_counts": TF.TPCH_Q16_SQL,
    "tpch_q17_small_qty_revenue": TF.TPCH_Q17_SQL,
    "tpch_q20_promotion_suppliers": TF.TPCH_Q20_SQL,
    "order_fulfillment_lag": TE.FULFILLMENT_LAG_SQL,
    "events_hourly_rollup": C.EVENTS_HOURLY_SQL,
    "events_sliding_rollup": SL.SLIDING_ROLLUP_SQL,
    "events_rollup_cube": C.EVENTS_ROLLUP_CUBE_SQL,
    "events_type_pivot": C.EVENTS_TYPE_PIVOT_SQL,
    "users_setops": C.USERS_SETOPS_SQL,
    "events_props_json": C.EVENTS_PROPS_JSON_SQL,
    "retention_report": C.RETENTION_REPORT_SQL,
    "retention_report_salted": C.RETENTION_REPORT_SQL,
    "events_pct_of_total": C.EVENTS_PCT_SQL,
    "training_set_select": C.TRAINING_SET_SQL,
    "training_pipeline_pack": C.TRAINING_PIPELINE_SQL,
}
