"""Noise-aware diff of two bench detail files (BENCH_DETAIL / BENCH_FULL).

VERDICT r7 #1: round-over-round per-query numbers carried a 1.7x spread
from host load alone (v17: 4.54 s driver-measured vs 2.66 s idle-host on
the SAME tree), so a naive ratio threshold cannot tell a plan regression
from a busy host.  This tool makes the comparison mechanical:

* compares BEST-OF-2 per query (each bench run times every query twice;
  the min is far less load-sensitive than run2 alone);
* flags a query only when ratio > --ratio (default 1.3) AND absolute
  delta > --abs (default 0.5 s) — small queries jitter multiplicatively,
  big queries additively; requiring both kills most false positives;
* cross-checks each flagged query's own run1/run2 spread: if either
  file's two runs of that query disagree by more than the flagged delta,
  the flag is demoted to NOISY (the measurement cannot resolve it);
* prints both files' load_context so a loaded host is visible in the
  same place as the numbers.

Round-8 measurement: even with run1/run2 demotion, PROCESS-level variance
dominates — two back-to-back fresh-process runs of the identical tree on
an idle host measured 112.6 s and 91.3 s best-of-2 totals (±20% per
query, both directions, each internally stable to ±0.2 s).  A flag from
one process pair is therefore a hypothesis, not a verdict.  Pass a second
measurement of the SAME new tree via --confirm: a REGRESSION must
reproduce against BOTH new-tree runs or it demotes to NOISY(process).

Usage:
    python tools/bench_diff.py OLD.json NEW.json [--ratio 1.3] [--abs 0.5]
                               [--confirm NEW2.json]

Exit code 1 iff any REGRESSION survives (NOISY and IMPROVED don't fail),
so the gate can be scripted.

A flag that survives --confirm still has one escape: HOST-epoch drift
(thermal/cache state changing between the old and new recordings).  The
adjudication for a survivor is mechanical: `git worktree add` the OLD
tree and re-measure the flagged query there today — if the old tree now
reproduces the new time, the delta is the host, not the commit (round 8:
x15 survived --confirm at 1.29->2.10 s, and the r7 tree measured 1.88 s
the same hour — drift, case closed).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def best_of(detail: dict) -> dict[str, float]:
    if "queries_best_of_2" in detail:
        return detail["queries_best_of_2"]
    # pre-r4 files carry run2 only
    return detail.get("queries", {})


def spread(detail: dict, name: str) -> float:
    """|run1 - run2| for one query — the file's own noise floor there."""
    r1 = detail.get("queries_run1", {}).get(name)
    r2 = detail.get("queries", {}).get(name)
    if r1 is None or r2 is None:
        return 0.0
    return abs(r1 - r2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.3)
    ap.add_argument("--abs", dest="abs_", type=float, default=0.5)
    ap.add_argument("--confirm", help="second fresh-process run of the NEW tree")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    ob, nb = best_of(old), best_of(new)
    cb = best_of(load(args.confirm)) if args.confirm else None

    for tag, d in (("old", old), ("new", new)):
        lc = d.get("load_context", {})
        print(
            f"{tag}: total={d.get('total_best_of_2', d.get('value'))}s "
            f"n={d.get('n_queries')} "
            f"load1_before={lc.get('loadavg_before', ['?'])[0]} "
            f"procs={lc.get('runnable_procs_before', '?')} "
            f"host_busy={lc.get('host_busy', '?')}"
        )

    regressions, noisy, improved = [], [], []
    for name in sorted(set(ob) & set(nb)):
        o, n = ob[name], nb[name]
        if o <= 0:
            continue
        delta, ratio = n - o, n / o
        if ratio > args.ratio and delta > args.abs_:
            floor = max(spread(old, name), spread(new, name))
            if floor > delta:
                noisy.append(
                    (name, o, n, ratio,
                     f"run1/run2 spread {floor:.2f}s exceeds the delta")
                )
            elif cb is not None and name in cb and not (
                cb[name] / o > args.ratio and cb[name] - o > args.abs_
            ):
                # the second fresh process of the SAME tree doesn't
                # reproduce the slowdown -> process-level variance
                noisy.append(
                    (name, o, n, ratio,
                     f"same-tree re-measurement ({cb[name]:.2f}s) does not confirm")
                )
            else:
                regressions.append((name, o, n, ratio, floor))
        elif ratio < 1 / args.ratio and -delta > args.abs_:
            improved.append((name, o, n, ratio))

    for name, o, n, r, fl in regressions:
        print(f"REGRESSION {name}: {o:.2f}s -> {n:.2f}s (x{r:.2f}, noise floor {fl:.2f}s)")
    for name, o, n, r, why in noisy:
        print(f"NOISY      {name}: {o:.2f}s -> {n:.2f}s (x{r:.2f}) but {why}")
    for name, o, n, r in improved:
        print(f"improved   {name}: {o:.2f}s -> {n:.2f}s (x{r:.2f})")
    only_old = sorted(set(ob) - set(nb))
    only_new = sorted(set(nb) - set(ob))
    if only_old:
        print(f"dropped from new: {only_old}")
    if only_new:
        print(f"new queries: {only_new}")
    print(
        f"{len(regressions)} regression(s), {len(noisy)} noisy, "
        f"{len(improved)} improved, {len(set(ob) & set(nb))} compared"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
