"""Dump explain('formatted') for every round-11-touched query into
plans/r11/<name>_<tag>.txt.

Usage: python tools/dump_r11_plans.py before|after [repo_root]
'before' is meant to run inside a worktree at the r10 HEAD; 'after' at
the current HEAD.  sf0.001 (plan shape only).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

TAG = sys.argv[1]
ROOT = sys.argv[2] if len(sys.argv) > 2 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
OUT = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
)
sys.path.insert(0, ROOT)

from data_etl_scripts_showcase__spark.queries import load_all  # noqa: E402
from data_etl_scripts_showcase__spark.session import get_session  # noqa: E402

SF = "/root/testdata/sf0.001"

TOUCHED = [
    "pr1_pagerank_neardup",
    "pr2_triangle_count",
    "pr3_label_propagation",
    "pr4_cc_alternating",
    "pr5_bfs_hops",
    "pr7_partition_modularity",
    "d2_minhash_signature",
    "d3_lsh_candidate_pairs",
    "d5_simhash_signature",
    "d6_simhash_neardup_pairs",
    "d9_neardup_components",
    "d13_cross_snapshot_dedup",
    "d14_lsh_capped_pairs",
    "d16_minhash_estimator_audit",
    "d17_duplicate_spans",
    "x53_negative_samples",
    "x54_column_profiler",
    "v9_mmr_diversified_topk",
    "v11_pq_adc_topk",
    "v17_ivf_adc_rerank",
    "v18_nprobe_recall_curve",
    "mm10_phash_neardup",
    "x52_curriculum_phases",
    "t12_stopword_profile",
    "t18_perplexity_buckets",
    "st20_stream_neardup_gate",
]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_session(f"plans_r11_{TAG}")
    registry = load_all()
    for name in TOUCHED:
        if name not in registry:
            print(f"skip {name}: not registered")
            continue
        try:
            df = registry[name].fn(spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(OUT, f"{name}_{TAG}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
