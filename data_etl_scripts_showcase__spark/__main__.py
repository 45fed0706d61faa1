"""CLI runner — the reference's ``python script.py`` usage, engine-first.

The reference ships three entry scripts run by hand or cron
(presentation.py, Gonukkad_Merchants.py, buisness_profile_etl/main.py).
Their engine equivalents are the three pipeline archetypes in
``plans/pipelines.py``; this module gives them the same one-command
surface, plus the registry and maintenance verbs:

    python -m data_etl_scripts_showcase__spark snapshot  --table customer --out /tmp/snap --ds 2026-01-01
    python -m data_etl_scripts_showcase__spark filtered  --out /tmp/fsnap --ds 2026-01-01
    python -m data_etl_scripts_showcase__spark flagship  --out /tmp/insights --ds 2026-01-01
    python -m data_etl_scripts_showcase__spark query     --name q1_pricing_summary
    python -m data_etl_scripts_showcase__spark compact   --path /tmp/snap --part-col ds
    python -m data_etl_scripts_showcase__spark forget    --path /tmp/snap --part-col ds --key-col c_custkey --keys 3,7
    python -m data_etl_scripts_showcase__spark fingerprint --table customer --against /tmp/copy

``--sf-dir`` defaults to $SPARK_GRAFT_SF_DIR (driver convention).
"""

from __future__ import annotations

import argparse
import os
import sys


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="data_etl_scripts_showcase__spark")
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="input table directory (parquet per table)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("snapshot", help="§3.1: table → cleanse → dated snapshot")
    s.add_argument("--table", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--ds", required=True)

    f = sub.add_parser("filtered", help="§3.2: id-list ⋉ fact → snapshot")
    f.add_argument("--out", required=True)
    f.add_argument("--ds", required=True)

    g = sub.add_parser("flagship", help="§3.3: enrichment pipeline → insights")
    g.add_argument("--out", default=None)
    g.add_argument("--ds", default="2026-01-01")

    q = sub.add_parser("query", help="run one registry query, print 20 rows")
    q.add_argument("--name", required=True)

    c = sub.add_parser("compact", help="compact fragmented partitions")
    c.add_argument("--path", required=True)
    c.add_argument("--part-col", required=True)
    c.add_argument("--max-files", type=int, default=1)

    d = sub.add_parser("forget", help="key-level delete (affected partitions only)")
    d.add_argument("--path", required=True)
    d.add_argument("--part-col", required=True)
    d.add_argument("--key-col", required=True)
    d.add_argument("--keys", required=True, help="comma-separated key values (ints)")

    fp = sub.add_parser(
        "fingerprint",
        help="order-independent table checksum; with --against, verify a copy",
    )
    fp.add_argument("--table", required=True, help="source table name in --sf-dir")
    fp.add_argument(
        "--against", default=None, help="parquet path of a copy to verify"
    )

    rid = sub.add_parser(
        "rowids", help="assign contiguous global row ids (distributed zipWithIndex)"
    )
    rid.add_argument("--table", required=True)
    rid.add_argument("--out", required=True)
    rid.add_argument("--order-col", required=True, help="sort column (e.g. o_orderdate)")
    rid.add_argument("--key-col", required=True, help="unique tiebreak column")

    kth = sub.add_parser(
        "kth", help="exact k-th smallest value by histogram bisection (no sort)"
    )
    kth.add_argument("--table", required=True)
    kth.add_argument("--col", required=True)
    kth.add_argument("--k", type=int, default=0, help="1-based rank; 0 = median")

    mix = sub.add_parser(
        "mixture", help="temperature-scaled per-source sampling quotas"
    )
    mix.add_argument("--budget", type=int, default=10000)

    pr = sub.add_parser(
        "profile",
        help="single-pass column profile (null/distinct/extrema per column)",
    )
    pr.add_argument("--table", required=True)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    from .session import get_session

    spark = get_session(f"cli_{args.cmd}")

    if args.cmd == "snapshot":
        from .plans import snapshot_pipeline

        snapshot_pipeline(spark, args.sf_dir, args.table, args.out, args.ds)
        print(f"snapshot written: {args.out}/ds={args.ds}")
    elif args.cmd == "filtered":
        from .plans import filtered_snapshot_pipeline

        filtered_snapshot_pipeline(spark, args.sf_dir, args.out, args.ds)
        print(f"filtered snapshot written: {args.out}/ds={args.ds}")
    elif args.cmd == "flagship":
        from .plans import enrichment_pipeline, insights_projection

        wide = enrichment_pipeline(spark, args.sf_dir, base_path=None, ds=args.ds)
        out_df = insights_projection(wide, args.ds, args.ds)
        if args.out:
            from .sources.files import write_csv

            write_csv(out_df, args.out)
            print(f"insights CSV written: {args.out} ({len(out_df.columns)} cols)")
        else:
            out_df.show(5, truncate=False)
    elif args.cmd == "query":
        from .queries import load_all

        registry = load_all()
        if args.name not in registry:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        registry[args.name].fn(spark, args.sf_dir).show(20, truncate=False)
    elif args.cmd == "compact":
        from .sinks import compact_partitions

        parts = compact_partitions(
            spark, args.path, args.part_col, max_files=args.max_files
        )
        print(f"compacted partitions: {parts or 'none needed'}")
    elif args.cmd == "forget":
        from .sinks import targeted_delete

        keys = [int(k) for k in args.keys.split(",")]
        parts = targeted_delete(
            spark, args.path, args.part_col, args.key_col, keys
        )
        print(f"rewrote partitions: {parts or 'none contained the keys'}")
    elif args.cmd == "fingerprint":
        from .sinks.quality import table_fingerprint
        from .sources import load_table

        src = load_table(spark, args.sf_dir, args.table)
        n, fp = table_fingerprint(src)
        print(f"{args.table}: rows={n} fingerprint={fp}")
        if args.against:
            copy = spark.read.parquet(args.against).select(*src.columns)
            n2, fp2 = table_fingerprint(copy)
            print(f"copy: rows={n2} fingerprint={fp2}")
            if (n, fp) != (n2, fp2):
                print("MISMATCH", file=sys.stderr)
                return 1
            print("MATCH")
    elif args.cmd == "rowids":
        from pyspark.sql import functions as F

        from .queries.scale_ops2 import global_row_ids
        from .sources import load_table

        src = load_table(spark, args.sf_dir, args.table)
        # global_row_ids' precondition: the bucket expression must sort
        # consistently with the leading order column.  A string cast does
        # NOT for numerics ('10' < '2'), so bucket by TYPE: dates by
        # month, numerics by a fixed-count native-typed range (floor over
        # a data-derived width — one 1-row aggregate), strings by prefix
        # (a prefix is order-monotone w.r.t. the full string).
        dtype = dict(src.dtypes)[args.order_col]
        col = F.col(args.order_col)
        if dtype in ("date",) or dtype.startswith("timestamp"):
            bucket = F.date_format(col, "yyyy-MM")
        elif dtype in ("tinyint", "smallint", "int", "bigint", "float", "double") or dtype.startswith("decimal"):
            lo, hi = (
                src.agg(F.min(col).cast("double"), F.max(col).cast("double"))
                .first()
            )
            width = max((hi - lo) / 256.0, 1e-12) if hi is not None else 1.0
            bucket = F.floor((col.cast("double") - float(lo or 0)) / width)
        else:
            bucket = F.substring(col, 1, 2)
        with_ids = global_row_ids(src, bucket, [args.order_col, args.key_col])
        with_ids.write.mode("overwrite").parquet(args.out)
        print(f"row ids written: {args.out}")
    elif args.cmd == "kth":
        from .operators.selection import kth_smallest
        from .sources import load_table

        src = load_table(spark, args.sf_dir, args.table)
        n = src.count()
        k = args.k or (n + 1) // 2
        v = kth_smallest(src, args.col, k)
        print(f"{args.table}.{args.col}: n={n} k={k} value={v}")
    elif args.cmd == "mixture":
        from .queries.scale_ops2 import x43_temperature_mixture

        x43_temperature_mixture(spark, args.sf_dir).show(50, truncate=False)
    elif args.cmd == "profile":
        from .operators.profile import column_profile
        from .sources import load_table

        column_profile(load_table(spark, args.sf_dir, args.table)).show(
            100, truncate=False
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
