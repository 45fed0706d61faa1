"""Empty-input robustness sweep (found the x28/a33 None-crash class).

Every operator family must behave sanely on ZERO-row tables — the empty
ingest day every production pipeline eventually meets.  Sane = returns an
empty (or summary) frame, or raises a DOCUMENTED, intentional error.
Silent nonsense and accidental NoneType crashes fail here.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_etl_scripts_showcase__spark.queries import load_all

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# One representative per family/shape, weighted toward operators with
# driver-side scalar handling (the empty-input crash surface).
SAMPLE = [
    "flagship_active_customer_snapshot", "q1_pricing_summary",
    "j7_asof_join", "j11_not_in_null_aware", "a1_count_by_group",
    "a14_quantiles", "a25_hll_distinct_sketch", "a28_histogram_quantile_audit",
    "a29_hll_set_ops", "a30_time_decayed_counts", "a31_cooccurrence_lift",
    "a32_rolling_distinct_hll", "a34_benford_audit", "w1_topk_per_group",
    "w24_seasonal_anomaly", "w26_missing_periods", "w27_cusum_drift",
    "d1_exact_dedup", "d3_lsh_candidate_pairs", "d9_neardup_components",
    "pr4_cc_alternating", "pr5_bfs_hops", "pr6_khop_neighbor_sample",
    "v1_knn_bruteforce", "v14_matryoshka_retrieval",
    "v16_binary_quantized_retrieval", "t1_token_stats", "t20_bpe_merge_rank",
    "t22_vocab_overlap", "t23_chunk_windows", "x47_dataset_card",
    "mm10_phash_neardup", "mm11_vad_segments", "m10_map_higher_order",
    "x38_zone_map_pruning", "x39_global_row_ids", "x40_join_size_estimate",
    "x41_weighted_sample", "x42_zone_map_maintenance",
    "x43_temperature_mixture", "x44_distributed_deciles",
    "x46_ab_test_analysis", "x28_observed_metrics", "e3_enrichment_request_dedup",
    "f_regexp_surface", "u3_except_all", "c1_status_cascade",
    "t25_content_defined_chunks", "t26_chat_turns_audit",
    "x48_chunk_dedup_ratio", "u5_symmetric_difference",
    "m11_struct_field_surgery", "d22_lsh_scurve_audit",
    "j13_bitemporal_asof", "w25_target_encoding_loo",
    # round-3 additions
    "t27_hashed_linear_quality", "v17_ivf_adc_rerank",
    "pr7_partition_modularity", "x50_l_diversity_audit",
    "x51_dsir_importance_resample", "x52_curriculum_phases",
    "st19_stream_exact_dedup", "st20_stream_neardup_gate",
    "d23_chunk_contamination", "a35_ks_drift", "x53_negative_samples",
    "x54_column_profiler", "x55_shard_manifest", "d24_dedup_savings_report",
    "st21_stream_shard_manifest", "x56_cdc_apply", "t28_rule_filter_report",
    "v18_nprobe_recall_curve", "j14_nearest_asof_join",
    "w29_multitouch_attribution",
]

# Documented raisers on empty input: exact selection has no k-th element;
# empty partitioned writes leave schema-less dirs the read-back cannot
# infer (the caller's pipeline gates on non-empty ingest first).
EXPECTED_RAISE = {
    "a33_exact_median_bisect": ValueError,
}


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        sch = pq.ParquetFile(f"{src}/{t}.parquet").schema_arrow
        pq.write_table(
            pa.table({f.name: pa.array([], type=f.type) for f in sch}),
            str(dst / f"{t}.parquet"),
        )
    return str(dst)


@pytest.mark.parametrize("name", SAMPLE)
def test_query_survives_empty_tables(spark, empty_dir, name):
    reg = load_all()
    if name in EXPECTED_RAISE:
        with pytest.raises(EXPECTED_RAISE[name]):
            reg[name].fn(spark, empty_dir).count()
        return
    n = reg[name].fn(spark, empty_dir).count()
    assert n >= 0
