"""t14-class broadcast audit over the WHOLE registry (rounds 9-10).

The t14 cluster-longdocs crash established the failure class: Catalyst's
STATIC size estimate for a content-derived relation (exploded text,
shingle/bigram/edge aggregates) is a fixed ratio of the pruned source
scan, so it under-estimates arbitrarily as content grows — and a
statically-planned BroadcastExchange is a leaf query stage under AQE
(its inner shuffles materialize INSIDE the broadcast stage), so runtime
statistics never get the chance to demote it.  The result is an
executor-memory crash that no single-JVM tier can see.

Batch queries (everything but st*) are audited on their STATIC physical
plan (explain only).  NOTE: building a plan can still execute work when
the query materializes inputs at build time (file-io round-trips,
enrichment fetch stages) — those families were skipped before round 10;
now they are planned like everyone else and their side-effect cost is
simply paid.

Streaming queries (st*) have no static batch plan, so they are audited
POST-EXECUTION (VERDICT r9 #2): the tool patches
``DataStreamWriter.start`` to capture every StreamingQuery handle the
query launches, drains the query (they are all availableNow,
synchronous), and walks ``explainInternal(extended=True)`` — the last
EXECUTED micro-batch physical plan, which is where a content-keyed
stream-static join's BroadcastExchange would appear.  Limitation: a
foreachBatch sink's INNER batch writes (the ``write_batch`` body) run as
separate batch queries invisible to the handle; the stream-side plan up
to the sink is covered, which is where every content-keyed join in
streaming_like.py / streaming/jobs.py lives.

The audit flags any BroadcastExchange whose build subtree contains an
explode (``Generate``) or a hash aggregate over content columns
(text/token/term/bigram/shingle/gram/chunk) — the signature of a
content-scaled relation riding a size-estimate-gated broadcast.

SINGLE-DIR LIMITATION (ADVICE r9): the audit inspects plans at the given
data dir only; an estimate-gated broadcast that appears only at another
scale escapes that run.  The standing recipe therefore runs it at the
10x volume dir AND the longdocs ×128 dir (run_scale_sweeps.sh longdocs)
— the length axis is where the t14 class actually manifests.

Usage:
    python tools/broadcast_audit.py [data_dir]   # default: the 10x dir
    python tools/broadcast_audit.py [data_dir] --skip-streaming

Exit code 1 when anything is flagged.  Coverage is reported as
checked/registry with per-query reasons for anything not checked.
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
#:
#: Matching is on the broadcast KEY ATTRIBUTES (ADVICE r9), not a literal
#: Spark-internal mode-string prefix: a 2-key HashedRelationBroadcastMode
#: whose build subtree's join keys are the band#N/bucket#N attributes.
#: A Spark upgrade that re-words the mode header no longer silently
#: breaks the whitelist.
def _is_lsh_bucket_broadcast(header: str, subtree: str) -> bool:
    mode = re.search(r"HashedRelationBroadcastMode\(List\((.*?)\),", header)
    if not mode:
        return False
    n_keys = len(re.findall(r"input\[\d+", mode.group(1)))
    return (
        n_keys == 2
        and re.search(r"\bband#\d+", subtree) is not None
        and re.search(r"\bbucket#\d+", subtree) is not None
    )


#: Adjudicated whitelist 2 (round 10, surfaced when the audit gained the
#: e* family): the enrichment pipeline's per-merchant metrics pivot.  The
#: build side groups the exploded REST-page metric rows back DOWN to one
#: row per merchant with a FIXED 3-column pivot (CALL_CLICKS /
#: WEBSITE_CLICKS / DIRECTIONS) — the explode (×3) and the aggregate
#: (÷3) cancel, so the relation is |merchants| rows × fixed width and
#: the scan-ratio estimate tracks the true size within a constant in
#: both directions.  No axis exists along which the estimate stays tiny
#: while the table grows unboundedly: both grow linearly with the
#: merchant dimension, and a dimension large enough to matter also
#: inflates the estimate past the broadcast threshold.  This is the J2
#: broadcast-dim enrichment design working, not the t14 class.
#: See enrichment/stage.py and queries/pipelines_q.py (e1).
def _is_enrichment_merchant_pivot(header: str, subtree: str) -> bool:
    return (
        "HashedRelationBroadcastMode" in header
        and re.search(r"\bmerchant_id#\d+", subtree) is not None
        and "pivotfirst(metric#" in subtree
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


def flag_positions(plan: str) -> list[int]:
    """Plan-line positions of non-whitelisted content-derived broadcasts."""
    hits = []
    for pos, header, subtxt in broadcast_subtrees(plan):
        if _is_lsh_bucket_broadcast(header, subtxt):
            continue  # adjudicated: the (band, bucket) LSH self-join
        if _is_enrichment_merchant_pivot(header, subtxt):
            continue  # adjudicated: the e1 per-merchant fixed-width pivot
        if CONTENT_RE.search(subtxt):
            hits.append(pos)
    return hits


def streaming_executed_plans(spark, fn, sf_dir: str):
    """Run one streaming registry query; return ``(plans, result_df)`` —
    the EXECUTED physical plan of every StreamingQuery it started
    (availableNow drains are synchronous, so by the time ``fn`` returns
    each handle is terminated and ``explainInternal`` answers with its
    last micro-batch plan), plus the query's returned DataFrame so the
    caller can fall back to a static batch plan for the st queries that
    never start a stream."""
    from pyspark.sql.streaming import readwriter as srw

    captured = []
    orig = srw.DataStreamWriter.start
    def patched(self, *a, **kw):
        qh = orig(self, *a, **kw)
        captured.append(qh)
        return qh
    srw.DataStreamWriter.start = patched
    try:
        result_df = fn(spark, sf_dir)
    finally:
        srw.DataStreamWriter.start = orig
    plans = []
    for qh in captured:
        try:
            plans.append(qh._jsq.explainInternal(True))
        except Exception:  # noqa: BLE001 - handle gone; caller sees count
            pass
    return plans, result_df


def _drop_memory_sinks(spark) -> None:
    """Memory-sink tables pin their rows in the JVM heap for the session's
    life — drop them per query so a full-registry audit doesn't OOM (same
    hygiene as check_correctness.py)."""
    try:
        for t in spark.catalog.listTables():
            if t.name.startswith("mem_"):
                spark.catalog.dropTempView(t.name)
    except Exception:  # noqa: BLE001
        pass


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_streaming = "--skip-streaming" in sys.argv
    sf_dir = args[0] if args else "/tmp/spark_graft_scale/sf1_synth"
    spark = get_session("broadcast_audit")
    registry = load_all()
    flagged: dict[str, list[int]] = {}
    uncovered: dict[str, str] = {}
    n_checked = n_streaming = 0
    for name, q in sorted(registry.items()):
        if name.startswith("st"):
            if skip_streaming:
                uncovered[name] = "--skip-streaming"
                continue
            try:
                plans, batch_df = streaming_executed_plans(spark, q.fn, sf_dir)
            except Exception as ex:  # noqa: BLE001
                uncovered[name] = f"stream exec error {type(ex).__name__}: {ex}"
                continue
            finally:
                _drop_memory_sinks(spark)
            if not plans:
                # st2/st3 express their semantics on the BATCH frame
                # (session_window / sliding work identically there) and
                # never start a stream — audit the static batch plan.
                try:
                    plans = [
                        batch_df._jdf.queryExecution().sparkPlan().toString()
                    ]
                except Exception as ex:  # noqa: BLE001
                    uncovered[name] = (
                        f"no StreamingQuery handle and no batch plan: {ex}"
                    )
                    continue
            else:
                n_streaming += 1
            n_checked += 1
            for p in plans:
                hits = flag_positions(p)
                if hits:
                    flagged.setdefault(name, []).extend(hits)
            continue
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().sparkPlan().toString()
        except Exception as ex:  # noqa: BLE001
            uncovered[name] = f"plan error {type(ex).__name__}: {ex}"
            continue
        n_checked += 1
        hits = flag_positions(plan)
        if hits:
            flagged[name] = hits
    print(
        f"[broadcast-audit] {n_checked}/{len(registry)} plans checked @ "
        f"{sf_dir} ({n_streaming} streaming post-execution): "
        f"{len(flagged)} flagged, {len(uncovered)} uncovered"
    )
    for name, why in sorted(uncovered.items()):
        print(f"  UNCOVERED {name}: {why}")
    for name, lines in sorted(flagged.items()):
        print(
            f"  FLAG {name}: broadcast of content-derived build side "
            f"at plan line(s) {lines}"
        )
    hard_uncovered = {
        k: v for k, v in uncovered.items() if v != "--skip-streaming"
    }
    return 1 if (flagged or hard_uncovered) else 0


if __name__ == "__main__":
    raise SystemExit(main())
