"""Static t14-class broadcast audit (round 9).

The t14 cluster-longdocs crash established the failure class: Catalyst's
STATIC size estimate for a content-derived relation (exploded text,
shingle/bigram/edge aggregates) is a fixed ratio of the pruned source
scan, so it under-estimates arbitrarily as content grows — and a
statically-planned BroadcastExchange is a leaf query stage under AQE
(its inner shuffles materialize INSIDE the broadcast stage), so runtime
statistics never get the chance to demote it.  The result is an
executor-memory crash that no single-JVM tier can see.

This tool walks every registry query's STATIC physical plan (explain
only — nothing executes) at the given data dir and flags any
BroadcastExchange whose build subtree contains an explode (``Generate``)
or a hash aggregate over content columns (text/token/term/bigram/
shingle/gram/chunk) — the signature of a content-scaled relation riding
a size-estimate-gated broadcast.

Usage:
    python tools/broadcast_audit.py [data_dir]   # default: the 10x dir

Exit code 1 when anything is flagged.  Streaming (st*), file-io (io*)
and enrichment (e*) queries are skipped: their runtime surfaces are
drains/sinks audited by the streaming and pipeline suites, and several
cannot produce a batch plan without executing.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_etl_scripts_showcase__spark.queries import load_all  # noqa: E402
from data_etl_scripts_showcase__spark.session import get_session  # noqa: E402

CONTENT_RE = re.compile(
    r"Generate explode|unnest|"
    r"HashAggregate.*(text#|\btok|\bterm|\bbg\b|shingle|gram|chunk)"
)


#: Adjudicated whitelist: a BroadcastExchange whose broadcast KEY is the
#: LSH (band, bucket) pair is the candidate_pairs self-join.  Its build
#: side is ~4 rows × ~50 B per document, so the scan-ratio estimate
#: tracks the true size within a small per-doc constant in both
#: directions — no axis exists along which the estimate stays tiny while
#: the table grows unboundedly (the t14-class divergence needs a row
#: multiplication the estimator cannot see, e.g. an explode feeding an
#: aggregate).  See operators/dedup.py:candidate_pairs.
def _is_lsh_bucket_broadcast(header: str, subtree: str) -> bool:
    return (
        "HashedRelationBroadcastMode(List(input[0, int, false],"
        " input[1, string, false])" in header
        and re.search(r"\bband#\d+", subtree) is not None
        and re.search(r"\bbucket#\d+", subtree) is not None
    )


def broadcast_subtrees(plan: str):
    """Yield (line_no, header, subtree_text) per BroadcastExchange."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        indent = len(ln) - len(ln.lstrip(" :+-"))
        sub = []
        for l2 in lines[i + 1 :]:
            ind2 = len(l2) - len(l2.lstrip(" :+-"))
            if ind2 <= indent and l2.strip():
                break
            sub.append(l2)
        yield i, ln, "\n".join(sub)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/sf1_synth"
    spark = get_session("broadcast_audit")
    registry = load_all()
    flagged: dict[str, list[int]] = {}
    n_checked = 0
    for name, q in sorted(registry.items()):
        if name.startswith(("st", "io", "e")):
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().sparkPlan().toString()
        except Exception as ex:  # noqa: BLE001
            print(f"[audit] {name}: plan error {type(ex).__name__}: {ex}")
            flagged.setdefault(name, [])
            continue
        n_checked += 1
        for pos, header, subtxt in broadcast_subtrees(plan):
            if _is_lsh_bucket_broadcast(header, subtxt):
                continue  # adjudicated: the (band, bucket) LSH self-join
            if CONTENT_RE.search(subtxt):
                flagged.setdefault(name, []).append(pos)
    print(
        f"[broadcast-audit] {n_checked} plans checked @ {sf_dir}: "
        f"{len(flagged)} flagged"
    )
    for name, lines in sorted(flagged.items()):
        print(f"  FLAG {name}: broadcast of content-derived build side at plan line(s) {lines}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
