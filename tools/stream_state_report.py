"""Per-micro-batch STATE curves for the three most expensive streaming
queries (VERDICT r7 #6: st7 / st15 / st9 are the registry's slowest and
the only expensive jobs with no per-batch state-size evidence at volume).

What it does, per query and per tier (1x = sf0.1, 10x = the synthetic
volume dir):

1. rewrites the tier's events table into K TIME-ORDERED slices (sorted by
   ``ts``, one contiguous time range per file, written oldest-first so the
   file source's modification-time ordering replays them in event-time
   order — the shape a production stream actually arrives in);
2. runs the query's own streaming job (the same builders the registry
   queries call) with ``maxFilesPerTrigger=1``, so the availableNow drain
   becomes K real micro-batches with advancing watermarks;
3. walks ``query.recentProgress`` and reports each batch's input rows,
   state rows, and state bytes.

The claim under test: state is WATERMARK-BOUNDED — rows buffered in the
join/agg state stores plateau once the watermark starts evicting, instead
of accumulating the whole history.  The verdict line per query compares
the final batch's state rows to the peak: bounded state ends well below
cumulative input.

Usage:
    python tools/stream_state_report.py            # 1x + 10x (if built)
    python tools/stream_state_report.py /some/dir  # one tier

Output: a table on stderr, one JSON line on stdout (goes to SCALE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_etl_scripts_showcase__spark.session import get_session  # noqa: E402

N_SLICES = int(os.environ.get("SPARK_GRAFT_STATE_SLICES", "8"))
TIERS = {
    "1x": "/root/testdata/sf0.1",
    "10x": "/tmp/spark_graft_scale/sf1_synth",
}


def build_sliced_events(spark, sf_dir: str, k: int) -> str:
    """Write events as k time-contiguous parquet slices, oldest first
    (one file per slice; increasing mtimes drive source replay order)."""
    from pyspark.sql import Window as W

    out = tempfile.mkdtemp(prefix="stream_state_events_")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # equal-count contiguous time slices via a global rank over ts (events
    # at these tiers are small enough for one exact sort; the slices must
    # partition the TIMELINE exactly or replay order breaks)
    n = ev.count()
    per = max(n // k, 1)
    ranked = ev.withColumn(
        "_slice",
        F.least(
            ((F.row_number().over(W.orderBy("ts", "event_id")) - 1) / per),
            F.lit(k - 1),
        ).cast("int"),
    )
    dst = os.path.join(out, "events.parquet")
    os.makedirs(dst, exist_ok=True)
    for i in range(k):
        part = ranked.where(F.col("_slice") == i).drop("_slice")
        tmp = os.path.join(out, f"_slice{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        files = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        assert files, f"slice {i} wrote no file"
        shutil.move(
            os.path.join(tmp, files[0]), os.path.join(dst, f"part-{i:04d}.parquet")
        )
        shutil.rmtree(tmp)
        time.sleep(0.05)  # distinct mtimes -> deterministic replay order
    return out


def progress_rows(q) -> list[dict]:
    out = []
    for p in q.recentProgress:
        if isinstance(p, str):
            p = json.loads(p)
        ops = p.get("stateOperators") or []
        out.append(
            {
                "batch": p.get("batchId"),
                "input_rows": p.get("numInputRows"),
                "state_rows": sum(o.get("numRowsTotal", 0) for o in ops),
                "state_mb": round(
                    sum(o.get("memoryUsedBytes", 0) for o in ops) / 1e6, 2
                ),
            }
        )
    return [r for r in out if r["batch"] is not None]


def run_st7(spark, sliced_dir: str):
    from data_etl_scripts_showcase__spark.streaming import (
        click_purchase_attribution,
    )
    from data_etl_scripts_showcase__spark.streaming.jobs import (
        events_stream,
        start_to_memory,
    )

    ev = lambda: events_stream(spark, sliced_dir, max_files_per_trigger=1)  # noqa: E731
    j = click_purchase_attribution(
        ev().where(F.col("event_type") == "click"),
        ev().where(F.col("event_type") == "purchase"),
    )
    q, _ = start_to_memory(j, mode="append")
    return q


def run_st15(spark, sliced_dir: str):
    from data_etl_scripts_showcase__spark.queries.streaming_like import (
        _attribution_cond,
        _attribution_projections,
    )
    from data_etl_scripts_showcase__spark.streaming.jobs import (
        events_stream,
        start_to_memory,
    )

    clicks, purch = _attribution_projections(
        events_stream(spark, sliced_dir, max_files_per_trigger=1)
    )
    clicks = clicks.withWatermark("click_ts", "1 hour")
    purch = purch.withWatermark("purchase_ts", "1 hour")
    j = clicks.join(purch, _attribution_cond(), "left_outer").select(
        "click_id", "purchase_id", "click_ts"
    )
    q, _ = start_to_memory(j, mode="append")
    return q


def run_st9(spark, sliced_dir: str):
    from data_etl_scripts_showcase__spark.streaming.jobs import (
        events_stream,
        incremental_rollup,
    )

    out = tempfile.mkdtemp(prefix="state_rollup_")
    return incremental_rollup(
        events_stream(spark, sliced_dir, max_files_per_trigger=1), out
    )


RUNNERS = {
    "st7_stream_stream_interval_join": run_st7,
    "st15_stream_left_outer_attribution": run_st15,
    "st9_incremental_rollup": run_st9,
}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tiers = {"arg": args[0]} if args else {
        k: v for k, v in TIERS.items() if os.path.exists(v)
    }
    spark = get_session("stream_state_report")
    report: dict = {}
    for tier, sf_dir in tiers.items():
        sliced = build_sliced_events(spark, sf_dir, N_SLICES)
        for name, runner in RUNNERS.items():
            q = runner(spark, sliced)
            rows = progress_rows(q)
            batches = [r for r in rows if r["input_rows"]]
            peak = max((r["state_rows"] for r in batches), default=0)
            final = batches[-1]["state_rows"] if batches else 0
            total_in = sum(r["input_rows"] or 0 for r in batches)
            report.setdefault(name, {})[tier] = {
                "n_batches": len(batches),
                "total_input_rows": total_in,
                "peak_state_rows": peak,
                "final_state_rows": final,
                "peak_state_mb": max(
                    (r["state_mb"] for r in batches), default=0.0
                ),
                "batches": batches,
            }
            print(
                f"[state] {name:38s} {tier:4s} batches={len(batches):3d} "
                f"in={total_in:9d} peak_state={peak:8d} final={final:8d} "
                f"peak_mb={report[name][tier]['peak_state_mb']:.1f}",
                file=sys.stderr,
            )
        shutil.rmtree(sliced, ignore_errors=True)
    print(json.dumps({"metric": "stream_state_curves", "slices": N_SLICES,
                      "queries": report}))


if __name__ == "__main__":
    main()
