"""Time a handful of queries with the bench.py methodology (run1 warm,
run2 timed, best-of-2 reported) without running the whole headline set.

Usage:  python tools/qbench.py pr4_cc_alternating pr5_bfs_hops [...]
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/qbench.py ...

Prints one JSON line per query: {"name": ..., "run1": s, "run2": s,
"best": s}.  A/B two code states by running this before and after a
change — same session shape, same noop sink, same warm-up discipline.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_etl_scripts_showcase__spark.queries import load_all  # noqa: E402
from data_etl_scripts_showcase__spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    spark = get_session("qbench")
    registry = load_all()
    # same JVM/footer warm-up as bench.py (first query, untimed)
    registry[names[0]].fn(spark, sf_dir).count()
    out = {}
    for name in names:
        runs = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"qbench:{name}")
            t0 = time.time()
            registry[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        rec = {"name": name, "runs": runs, "best": min(runs)}
        out[name] = rec
        print(json.dumps(rec), flush=True)
    print(
        json.dumps(
            {
                "total_best": round(sum(r["best"] for r in out.values()), 3),
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
