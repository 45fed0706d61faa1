"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its oracle on DuckDB over the same
parquet tables, then compares: column-name set, row count, and values
(columns sorted by name, rows sorted by all columns — order-insensitive,
exact for non-floats, 1e-9-relative for floats).  Stricter than a value
hash: mismatches are printed with examples.

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_etl_scripts_showcase__spark.queries import load_all  # noqa: E402
from data_etl_scripts_showcase__spark.session import get_session  # noqa: E402
from data_etl_scripts_showcase__spark.sources import TABLES  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        # Driver testdata is a single file per table; the scale-probe's
        # synthetic scale-ups are Spark-written DIRECTORIES of part files
        # (tools/scale_probe.py) — glob those so the same gate verifies
        # correctness at 10x/100x volume, not just timing.
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


class NonScalarOutputError(TypeError):
    """A top-level output cell is a list/array/map/struct.

    The DRIVER's canonicalizer cannot hash such cells (it raised
    ``TypeError: unhashable type: 'list'`` on t11 in round 2), so the local
    gate must reject them too rather than silently coercing to tuples —
    driver-parity by construction.  Queries must project nested values
    through a scalar encoding (e.g. ``array_join(transform(a, x ->
    cast(x as string)), '|')``) before returning.
    """


def _assert_scalar(v, col: str):
    import numpy as np

    if isinstance(v, (np.ndarray, list, tuple, set, dict)):
        raise NonScalarOutputError(
            f"column {col!r} holds a non-scalar cell of type "
            f"{type(v).__name__}; the driver canonicalizer cannot hash it "
            f"— stringify it in the query (and mirror in the oracle)"
        )
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].map(lambda v, c=col: _assert_scalar(v, c))
    if len(df):
        key = df.apply(lambda r: tuple(repr(v) for v in r), axis=1)
        df = df.loc[key.sort_values(kind="mergesort").index]
    return df.reset_index(drop=True)


def _sort_canon(df: pd.DataFrame, float_last: list[str]) -> pd.DataFrame:
    """Vectorized canonical row order: sort by all columns, with columns
    that are FLOAT in either frame ordered LAST in the key so rows that
    agree on their exact-typed keys cannot be reordered by cross-engine
    ulp differences (the same discipline the repr path gets implicitly
    from near-unique exact keys).  Raises TypeError on columns pandas
    cannot compare (mixed incomparable types) — caller falls back to the
    repr path."""
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        # driver-parity scalar lint must survive the fast path: a
        # list/array cell is a FAIL, not a silent tuple-coercion
        if df[col].dtype == object and len(df):
            mask = df[col].map(
                lambda v: isinstance(v, (list, tuple, set, dict))
                or type(v).__name__ == "ndarray"
            )
            if mask.any():
                _assert_scalar(df[col][mask.idxmax()], col)
    if not len(df):
        return df.reset_index(drop=True)
    keys = [c for c in df.columns if c not in float_last] + [
        c for c in df.columns if c in float_last
    ]
    out = df.sort_values(by=keys, kind="mergesort", na_position="last")
    return out.reset_index(drop=True)


def _fast_mismatch_cells(s: pd.Series, o: pd.Series):
    """Vectorized accept-filter: indices that MIGHT mismatch.  A cell the
    fast check accepts always satisfies values_equal (exact equality, or
    isclose with the same tolerances); rejected cells are re-judged by
    values_equal, so the verdict is identical to the per-cell loop."""
    import numpy as np

    a_na = s.isna().to_numpy()
    b_na = o.isna().to_numpy()
    both_na = a_na & b_na
    s_f = pd.api.types.is_float_dtype(s)
    o_f = pd.api.types.is_float_dtype(o)
    s_n = pd.api.types.is_numeric_dtype(s)
    o_n = pd.api.types.is_numeric_dtype(o)
    if (s_f or o_f) and s_n and o_n:
        af = s.to_numpy(dtype="float64", na_value=np.nan)
        bf = o.to_numpy(dtype="float64", na_value=np.nan)
        ok = np.isclose(af, bf, rtol=1e-9, atol=1e-12) | both_na
    else:
        with np.errstate(all="ignore"):
            eq = s.to_numpy() == o.to_numpy()
        if not isinstance(eq, np.ndarray):  # scalar False from len mismatch
            eq = np.zeros(len(s), dtype=bool)
        ok = (eq & ~(a_na | b_na)) | both_na
    return np.nonzero(~ok)[0]


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return math.isclose(af, bf, rel_tol=1e-9, abs_tol=1e-12)
    if (a is None) != (b is None):
        return False
    return a == b


def _cell_mismatch(x, y) -> bool:
    x = None if (isinstance(x, float) and math.isnan(x)) else x
    y = None if (isinstance(y, float) and math.isnan(y)) else y
    if pd.isna(x) if not isinstance(x, (list, tuple)) else False:
        x = None
    if pd.isna(y) if not isinstance(y, (list, tuple)) else False:
        y = None
    return not values_equal(x, y)


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        return [f"columns differ: spark={scols} oracle={ocols}"]
    if len(sdf) != len(odf):
        errs.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return errs
    # Vectorized path first (the repr path is O(rows) Python and dominates
    # the sweep wall-clock at 10x/100x volume); any structural surprise
    # falls back to the proven per-cell path.  NonScalarOutputError is a
    # verdict, not a structural surprise — it must propagate from either.
    try:
        float_cols = [
            c
            for c in scols
            if pd.api.types.is_float_dtype(sdf[c])
            or pd.api.types.is_float_dtype(odf[c])
        ]
        s, o = _sort_canon(sdf, float_cols), _sort_canon(odf, float_cols)
        n_bad = 0
        for col in s.columns:
            idx = _fast_mismatch_cells(s[col], o[col])
            if len(idx):
                sv, ov = s[col].iloc[idx].tolist(), o[col].iloc[idx].tolist()
                for i, x, y in zip(idx.tolist(), sv, ov):
                    if _cell_mismatch(x, y):
                        n_bad += 1
                        if n_bad <= 3:
                            errs.append(
                                f"value mismatch col={col} row={i}: "
                                f"spark={x!r} oracle={y!r}"
                            )
        if n_bad > 3:
            errs.append(f"... {n_bad} total value mismatches")
        return errs
    except NonScalarOutputError:
        raise
    except Exception:
        errs = []
    s, o = canon(sdf), canon(odf)
    n_bad = 0
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (x, y) in enumerate(zip(sv, ov)):
            if _cell_mismatch(x, y):
                n_bad += 1
                if n_bad <= 3:
                    errs.append(f"value mismatch col={col} row={i}: spark={x!r} oracle={y!r}")
    if n_bad > 3:
        errs.append(f"... {n_bad} total value mismatches")
    return errs


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:] if args and os.path.isdir(args[0]) else args)

    registry = load_all()
    spark = get_session("check_correctness")
    con = duck_connection(sf_dir)

    n_pass = n_fail = n_rows_only = 0
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        finally:
            # Memory-sink tables from streaming queries (run_to_memory's
            # mem_* names) hold their ROWS in the JVM heap for the life of
            # the session; over a full sweep at 100x volume they accumulate
            # gigabytes and OOM the driver (found by the round-6 100x
            # sweep).  The pandas copy above is the only consumer — drop
            # them as each query finishes.
            try:
                for t in spark.catalog.listTables():
                    if t.name.startswith("mem_"):
                        spark.catalog.dropTempView(t.name)
            except Exception:  # noqa: BLE001
                pass
        t_spark = time.time() - t0
        if q.oracle is None:
            status = "ROWS" if len(sdf) >= 0 else "??"
            print(f"{status}  {name}: rows={len(sdf)} (no oracle) [{t_spark:.1f}s]")
            n_rows_only += 1
            continue
        t1 = time.time()
        try:
            odf = con.execute(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_oracle = time.time() - t1
        t2 = time.time()
        try:
            errs = compare(name, sdf, odf)
        except NonScalarOutputError as e:
            errs = [f"driver-unhashable output: {e}"]
        t_cmp = time.time() - t2
        timing = (
            f"[{time.time()-t0:.1f}s: spark {t_spark:.1f} "
            f"oracle {t_oracle:.1f} cmp {t_cmp:.1f}]"
        )
        if errs:
            print(f"FAIL  {name}: rows={len(sdf)}")
            for e in errs:
                print(f"      {e}")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(sdf)} {timing}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail @ {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
