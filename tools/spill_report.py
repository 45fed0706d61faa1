"""Summarize spill behavior from a Spark event-log directory.

The memory-PRESSURE tier (tools/run_scale_sweeps.sh pressure) runs heavy
sort/join/agg queries at 100x volume (60 M facts) on deliberately small
executors (local-cluster[2,4,2048] — two 2g-heap executor JVMs).  The design contract at that point is
"slower, not wrong": operators must degrade by spilling sorts/aggregates
to disk, never by OOM or by changing results.  Correctness is the gate's
job; THIS script proves the pressure was real — it walks the event log's
``SparkListenerTaskEnd`` task metrics and reports total memory/disk
spill.  A pressure run whose spill is zero proves nothing (the data fit
after all), so the tier fails in that case.

Usage: python tools/spill_report.py EVENTLOG_DIR [--require-spill]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def summarize(evlog_dir: str) -> dict:
    tasks = failed = 0
    mem = disk = shuffle_write = 0
    # rolling (v2) logs are directories of events_* files; single-file (v1)
    # logs are plain files directly in the dir.
    patterns = [
        os.path.join(evlog_dir, "eventlog_v2_*", "events_*"),
        os.path.join(evlog_dir, "local-*"),
        os.path.join(evlog_dir, "app-*"),
    ]
    files = sorted(
        {
            f
            for p in patterns
            for f in glob.glob(p)
            # The tier writes uncompressed logs; skip compressed ones a
            # stray config might produce rather than crash on binary.
            if os.path.isfile(f)
            and not f.endswith((".zstd", ".lz4", ".snappy", ".gz"))
        }
    )
    for path in files:
        with open(path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if e.get("Event") != "SparkListenerTaskEnd":
                    continue
                tasks += 1
                if (e.get("Task End Reason") or {}).get("Reason") != "Success":
                    failed += 1
                tm = e.get("Task Metrics") or {}
                mem += tm.get("Memory Bytes Spilled", 0)
                disk += tm.get("Disk Bytes Spilled", 0)
                shuffle_write += (tm.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )
    return {
        "files": len(files),
        "tasks": tasks,
        "failed_tasks": failed,
        "memory_bytes_spilled": mem,
        "disk_bytes_spilled": disk,
        "shuffle_bytes_written": shuffle_write,
    }


def main() -> int:
    evlog_dir = sys.argv[1]
    require = "--require-spill" in sys.argv
    s = summarize(evlog_dir)
    gib = 1024.0**3
    print(
        f"[spill-report] {s['tasks']} tasks ({s['failed_tasks']} failed) in "
        f"{s['files']} log files: spilled "
        f"{s['memory_bytes_spilled'] / gib:.2f} GiB in-memory / "
        f"{s['disk_bytes_spilled'] / gib:.2f} GiB on disk, shuffle wrote "
        f"{s['shuffle_bytes_written'] / gib:.2f} GiB"
    )
    if s["tasks"] == 0:
        print("[spill-report] ERROR: no task events found — wrong dir?")
        return 2
    if require and s["disk_bytes_spilled"] == 0:
        print(
            "[spill-report] ERROR: zero disk spill — the pressure tier did "
            "not actually pressure anything (raise volume or shrink "
            "executor memory)"
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
