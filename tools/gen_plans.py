"""Regenerate PLANS.md: physical-plan evidence for the headline queries.

SCALE.md makes claims (broadcast joins, pushdown, partial aggregation,
zero-exchange bucketed joins); `tests/test_plans.py` asserts them; this
file makes them REVIEWABLE — the actual `explain("formatted")` output of
each headline query at sf0.001, annotated with what to look for.

Run after changing any query plan:  python tools/gen_plans.py
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_etl_scripts_showcase__spark.queries import load_all  # noqa: E402
from data_etl_scripts_showcase__spark.session import get_session  # noqa: E402

SF = "/root/testdata/sf0.001"

# (query, what the plan proves)
SHOWCASE = [
    (
        "flagship_active_customer_snapshot",
        "J1 id-list semi-join as BroadcastHashJoin LeftSemi — no collect, no IN-string",
    ),
    (
        "q1_pricing_summary",
        "partial_sum/partial_count under one Exchange — map-side combine; "
        "shipdate filter in PushedFilters; ReadSchema pruned to 7 columns",
    ),
    (
        "q14_promo_revenue_share",
        "month range pushed to the lineitem scan; part dimension broadcast",
    ),
    (
        "q18_large_volume_orders",
        "lineitem aggregated (partial_sum) and HAVING-filtered BEFORE any join",
    ),
    (
        "q4_order_priority_check",
        "correlated EXISTS compiled to LeftSemi join — no DISTINCT, no row blowup",
    ),
    (
        "j7_asof_join",
        "as-of join = union + window: one hash shuffle, no range-explosion",
    ),
    (
        "d2_minhash_signature",
        "one hashpartitioning exchange for the whole signature (partial_min)",
    ),
    (
        "x5_profile_columns",
        "unpivot profile: ONE parquet scan feeds all per-column stats",
    ),
    (
        "w5_order_limit",
        "global top-k as TakeOrderedAndProject — no full sort",
    ),
    (
        "x1_salted_agg_hot_keys",
        "two-stage salted aggregation: (key, salt) partial then key final",
    ),
    (
        "d10_ngram_contamination",
        "benchmark side broadcast — the corpus shingle stream never shuffles",
    ),
    (
        "x9_scd2_history",
        "change-detect lag + interval-close lead share ONE Exchange + Sort",
    ),
    (
        "x14_incremental_agg_maintenance",
        "incremental maintenance: base and delta scans are PARTITION-PRUNED "
        "date slices (PushedFilters on o_orderdate), merged by one keyed "
        "full-outer join — history is never rescanned",
    ),
    (
        "w16_activity_streaks",
        "gaps-and-islands: distinct, window, and both aggregates all ride "
        "user-keyed exchanges — no data-volume-dependent state",
    ),
    (
        "t14_bigram_lm_score",
        "bigram LM: partial_count under both count aggregates (map-side "
        "combine on the exploded stream); vocab count broadcast",
    ),
    (
        "d14_lsh_capped_pairs",
        "hot-bucket skew guard: bucket-size aggregate filters oversized "
        "buckets BEFORE the candidate self-join — the quadratic pair "
        "blow-up never reaches the join",
    ),
    (
        "x18_bucketed_colocated_join",
        "bucketed catalog tables: SortMergeJoin with NO Exchange and no "
        "Sort on either side (bucket sort honored); the only shuffle in "
        "the query is the final 5-group aggregate",
    ),
    (
        "a24_countmin_frequency",
        "count-min sketch: per-key partials first (|keys| rows), 4x256 "
        "grid via one explode+aggregate, sketch side broadcast at probe",
    ),
    (
        "io2_json_archive_roundtrip",
        "partitioned JSON archive replay: run_ds/endpoint filters prune "
        "at the PartitionFilters level — one (run, endpoint) read back",
    ),
    (
        "pr1_pagerank_neardup",
        "iterative graph algorithm: each PageRank iteration is one "
        "edge-list join + one keyed aggregate (Pregel schedule as "
        "DataFrames); edge list persisted once, integer rank arithmetic",
    ),
    (
        "v10_quantized_topk",
        "int8 quantization: one broadcast scale scalar, integer dot "
        "products in codegen — the corpus scan carries 4x fewer bytes",
    ),
    (
        "x27_bloom_prejoin",
        "bloom pre-join: build side collapses to ≤8Ki distinct bit rows "
        "(two partial aggregates) and BROADCASTS; probe is a broadcast "
        "left join + conditional count — no shuffle of either key set",
    ),
    (
        "x26_zorder_layout",
        "Z-order layout: Morton interleave is pure shift/and codegen in "
        "the scan projection; each layout is exactly one hash aggregate "
        "on its file id",
    ),
    (
        "d17_duplicate_spans",
        "duplicated spans: window hashes from one explode, duplicate "
        "detection one partial-combined aggregate on the hash, join back "
        "by the same key — suffix-array semantics in shuffle-native form",
    ),
    (
        "a25_hll_distinct_sketch",
        "HLL sketch: partial_max register aggregate (≤64 rows/group "
        "leave every task); estimate is scalar arithmetic on the tiny "
        "register relation",
    ),
    (
        "j11_not_in_null_aware",
        "NOT IN compiled to a null-aware anti join: BroadcastHashJoin "
        "LeftAnti with condition None (single-column NAAJ) — ANSI "
        "three-valued NOT IN semantics with no cartesian fallback",
    ),
    (
        "io7_python_datasource_pages",
        "custom Python DataSource: BatchScanExec over restpages with one "
        "input partition per page — pagination parallelised by the "
        "scheduler, not a driver loop",
    ),
    (
        "x35_geo_radius_join",
        "geo radius join: 2-D grid-cell equality join (3x3 neighbor "
        "explode) with exact haversine only on co-cell candidates — no "
        "cartesian/nested-loop node anywhere",
    ),
    (
        "j12_band_join",
        "|a-b|<=eps theta join as an eps-bucket equality join with 3x "
        "left fan-out — hash join, not BroadcastNestedLoopJoin",
    ),
    (
        "x39_global_row_ids",
        "distributed zipWithIndex: the only unpartitioned window runs on "
        "the |buckets|-row offsets relation (broadcast back); the data "
        "window is partitioned by bucket — no Exchange SinglePartition "
        "over the table itself",
    ),
    (
        "mm10_phash_neardup",
        "multi-index hamming search: 4-byte band explode then equality "
        "self-join on (band, byte) — hash join on the bucket key, exact "
        "hamming only on co-bucket candidates, no all-pairs node",
    ),
    (
        "x40_join_size_estimate",
        "join-size estimation: both inputs collapse to 4x256 sketch "
        "grids (partial-combined aggregates) before the tiny cell join; "
        "the exact-audit join runs on per-key count relations, never raw "
        "rows x raw rows",
    ),
    (
        "v14_matryoshka_retrieval",
        "Matryoshka retrieval: corpus pass projects slice(embedding,1,16) "
        "only (head dims), queries broadcast; full-dim cosine appears "
        "solely in the 10-row-per-query rerank join",
    ),
    (
        "v16_binary_quantized_retrieval",
        "binary quantization: 64 dims collapse to one BIGINT of sign bits "
        "in the scan projection; the corpus-wide stage ranks by "
        "xor+bit_count — no float math until the 10-row rerank",
    ),
    (
        "x44_distributed_deciles",
        "exact ntile without the single-reducer window: ranks from "
        "bucket-partitioned row ids, decile via ntile's front-loaded "
        "remainder rule in closed form; at most one SinglePartition "
        "exchange and it feeds the tiny offsets aggregate",
    ),
    (
        "x42_zone_map_maintenance",
        "incremental manifest: base-manifest UNION delta-stats then one "
        "merge aggregate on file_id — history is never rescanned, both "
        "inputs are already-aggregated relations",
    ),
    # round-3 flagships
    (
        "t27_hashed_linear_quality",
        "hashed-linear quality classifier: ZERO Exchange, zero Generate — "
        "the whole model is per-row array expressions in codegen; scoring "
        "is one embarrassingly parallel scan",
    ),
    (
        "v17_ivf_adc_rerank",
        "composed ANN ladder: probe cells / codebook / distance table / "
        "query vector all broadcast; the only big-big join (codes x cell "
        "assignment) sort-merges co-partitioned on vec_id; cosine floats "
        "appear only in the 20-row rerank",
    ),
    (
        "a35_ks_drift",
        "distributed ECDF: per-value counts hash-aggregate, running "
        "totals via bucket offsets — the data-sized window partitions by "
        "bucket; SinglePartition exchanges feed only the |buckets|-row "
        "offsets and the 1-row totals",
    ),
    (
        "x55_shard_manifest",
        "token-budget shard assignment from the same bucketed prefix-sum "
        "primitive (operators/prefix.py) — O(shards) manifest, corpus "
        "never globally sorted",
    ),
    (
        "x51_dsir_importance_resample",
        "DSIR selection: 4096-row distributions broadcast back onto the "
        "exploded token stream; Gumbel-top-k lands as "
        "TakeOrderedAndProject; integer micro-unit log-ratios keep the "
        "per-doc sum order-independent",
    ),
    (
        "d23_chunk_contamination",
        "substring decontamination: benchmark chunk table broadcast; the "
        "corpus chunk stream joins map-side on the content digest — no "
        "corpus shuffle for the overlap",
    ),
    (
        "j15_interval_join_numeric",
        "interval join's NUMERIC contract (bigint epoch seconds): same "
        "banded equality-join plan as j8 — hash join on (key, bucket) + "
        "containment refilter, integer-division bucketing, no "
        "nested-loop and no timestamp cast anywhere",
    ),
]


def plan_of(spark, name: str) -> str:
    df = load_all()[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().rstrip()


def bucketed_join_plan(spark) -> str:
    """Build two co-bucketed tables in a temp dir and explain their join —
    the zero-Exchange evidence for `sinks/bucketed.py`."""
    import tempfile

    from data_etl_scripts_showcase__spark.sinks import (
        cobucketed_join,
        write_bucketed,
    )
    from data_etl_scripts_showcase__spark.sources import load_table

    tmp = tempfile.mkdtemp(prefix="plans_bucketed_")
    o = load_table(spark, SF, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    c = (
        load_table(spark, SF, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    write_bucketed(o, "plans_b_orders", ["o_custkey"], 8, path=f"{tmp}/bo")
    write_bucketed(c, "plans_b_cust", ["o_custkey"], 8, path=f"{tmp}/bc")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = cobucketed_join(spark, "plans_b_orders", "plans_b_cust", on=["o_custkey"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        return buf.getvalue().rstrip()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS plans_b_orders")
        spark.sql("DROP TABLE IF EXISTS plans_b_cust")


def source_hash() -> str:
    """The same working-tree content hash .fullpytest_ok is stamped with
    (tools/source_hash.sh) — lets the pre-commit hook refuse a source
    commit whose PLANS.md predates the shipped plans (VERDICT r9 #1:
    round 9 shipped a PLANS.md whose t14 section still showed the
    auto-broadcast plan that round had just eliminated)."""
    import subprocess

    return subprocess.run(
        ["bash", os.path.join(REPO, "tools", "source_hash.sh")],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()


def main() -> None:
    spark = get_session("gen_plans")
    out = [
        "# PLANS — physical-plan evidence (generated by tools/gen_plans.py)",
        "",
        f"<!-- source_hash: {source_hash()} -->",
        "",
        "`explain(\"formatted\")` at sf0.001 for the headline queries.",
        "Plan-shape guarantees are asserted in `tests/test_plans.py`; the",
        "scale rationale is in `SCALE.md`.  AQE nodes appear as",
        "`AdaptiveSparkPlan` — final shapes can improve further at runtime",
        "(broadcast promotion, skew split, partition coalescing).",
        "",
    ]
    for name, proves in SHOWCASE:
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Proves:** {proves}")
        out.append("")
        out.append("```")
        out.append(plan_of(spark, name))
        out.append("```")
        out.append("")
    out.append("## bucketed co-located join (sinks/bucketed.py)")
    out.append("")
    out.append(
        "**Proves:** both scans expose their on-disk hash partitioning — "
        "a big-big sort-merge join with ZERO Exchange operators (broadcast "
        "disabled to force the big-big path; sortBy at write time also "
        "removes the sorts)."
    )
    out.append("")
    out.append("```")
    out.append(bucketed_join_plan(spark))
    out.append("```")
    out.append("")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(SHOWCASE) + 1} plans)")


if __name__ == "__main__":
    main()
