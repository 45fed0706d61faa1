"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its oracle on DuckDB over the same
parquet tables, then compares: column-name set, row count, and values
(columns sorted by name, rows sorted by all columns — order-insensitive,
exact for non-floats, 1e-9-relative for floats).  Stricter than a value
hash: mismatches are printed with examples.

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
        python tools/check_correctness.py [sf_dir] --rotation N

``--rotation N`` (VERDICT r8 #6): run the round-N slice of the standing
independent-verification rotation — ROTATION_SLICE (25) consecutive ids
of the sorted registry starting at ((N-1)*25) mod |registry|, so the
selection is reproducible from the round number alone and every registry
id receives an independently-executed oracle pass within ~13 rounds.
The driver's fixed 50-id sample and the judge's ad-hoc picks both skew
toward the same well-trodden ids; the rotation walks the tail
mechanically.  The slice for a given N never changes unless the registry
itself gains/loses ids (which re-sorts the walk — acceptable: additions
re-enter the rotation like any other id).
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


VIA_PARQUET = os.environ.get("SPARK_GRAFT_GATE_VIA_PARQUET", "") == "1"
# Above this row count, the comparison runs ENTIRELY in DuckDB over the
# Spark-written parquet (VERDICT r6 #4): no driver collect, no pandas.
PANDAS_MAX = int(os.environ.get("SPARK_GRAFT_GATE_PANDAS_MAX", "2000000"))
GATE_TMP = os.environ.get(
    "SPARK_GRAFT_GATE_TMP", "/tmp/spark_graft_gate"
)
# Oracle materialization cache (VERDICT r7 #5): at the 100x tier the gate's
# wall-clock tail is the ORACLE side (pr5's recursive CTE ~10 min — and the
# duckdb compare path re-executes the oracle CTE for the count AND the
# paired compare).  When this env names a directory, each oracle's result
# is COPY'd to parquet ONCE, keyed by (sha256 of the oracle SQL, a
# size+mtime fingerprint of the data dir), and every later use — including
# warm re-runs of run_scale_sweeps.sh — reads the parquet.  The key makes
# staleness impossible: touching either the oracle text or any input file
# misses the cache.  The ENGINE side re-executes every run, always; unset
# (the default, and what the round driver runs) nothing is cached.
ORACLE_CACHE = os.environ.get("SPARK_GRAFT_ORACLE_CACHE", "")


def data_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of every parquet file under ``sf_dir`` (path,
    size, mtime).  scale_probe.py rewrites files when it rebuilds a tier,
    so any data change rolls the fingerprint and misses the cache."""
    import hashlib

    h = hashlib.sha256(os.path.abspath(sf_dir).encode())
    for root, dirs, files in os.walk(sf_dir):
        dirs.sort()
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(root, f)
            st = os.stat(p)
            rel = os.path.relpath(p, sf_dir)
            # st_mtime_ns, not whole seconds (ADVICE r8): a deterministic
            # writer rebuilding a tier within one second with byte-equal
            # sizes must still roll the key.
            h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def cached_oracle_sql(
    con: duckdb.DuckDBPyConnection, oracle_sql: str, fp_dir: str | None
) -> str:
    """Return the SQL to use as the oracle relation: the raw SQL when the
    cache is off, else ``SELECT * FROM '<cached parquet>'`` after
    materializing it once.  Falls back to the raw SQL on any COPY failure
    (e.g. a parquet-unsupported output type) — cold semantics unchanged."""
    if not fp_dir:
        return oracle_sql
    import hashlib

    key = hashlib.sha256(oracle_sql.encode()).hexdigest()[:24]
    path = os.path.join(fp_dir, f"{key}.parquet")
    nocache = os.path.join(fp_dir, f"{key}.nocache")
    if os.path.exists(nocache):
        return oracle_sql
    if not os.path.exists(path):
        os.makedirs(fp_dir, exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"
        try:
            con.execute(f"COPY ({oracle_sql}) TO '{tmp}' (FORMAT PARQUET)")
            # Type-fidelity check (ADVICE r8): the parquet round-trip can
            # silently retype columns with no exact parquet mapping
            # (HUGEINT, ENUM, TIMESTAMPTZ...), which would shift the float
            # classification in compare_in_duckdb — a warm run must
            # classify columns exactly like the cold run it reproduces.
            # DESCRIBE both; any type drift pins a .nocache marker and the
            # oracle runs uncached forever after.
            live = con.execute(f"DESCRIBE ({oracle_sql})").fetchall()
            # read_parquet(), not path-as-table sugar: the tmp name ends
            # .tmp<pid>, which the sugar doesn't recognize as parquet
            back = con.execute(
                f"DESCRIBE (SELECT * FROM read_parquet('{tmp}'))"
            ).fetchall()
            if [(r[0], r[1]) for r in live] != [(r[0], r[1]) for r in back]:
                os.remove(tmp)
                with open(nocache, "w") as f:
                    f.write(
                        "parquet round-trip retyped columns:\n"
                        f"live={[(r[0], r[1]) for r in live]}\n"
                        f"back={[(r[0], r[1]) for r in back]}\n"
                    )
                return oracle_sql
            os.replace(tmp, path)
        except Exception:  # noqa: BLE001 - cache miss, run uncached
            if os.path.exists(tmp):
                os.remove(tmp)
            return oracle_sql
    return f"SELECT * FROM '{path}'"


def fragment_substituter(
    con: duckdb.DuckDBPyConnection, fp_dir: str | None
):
    """Shared-oracle-fragment pre-materialization (VERDICT r8 #7).

    The dedup/graph oracles all rebuild the SAME three relations inside
    their CTE chains — the LSH candidate pairs, the Jaccard-verified edge
    set, and the recursive-CTE connected components over it (pr5's ~10 min
    tail at the 100x tier) — so a COLD tier run pays the verify join and
    the transitive closure once per consuming oracle instead of once per
    tier.  When the oracle cache is on, this materializes each fragment
    ONCE (through the same fingerprint-keyed cache, so staleness is
    impossible) and rewrites consuming oracles to read the parquet:

    - ``cand AS ({_CAND_SQL})``            → parquet read (exact f-string text)
    - the standard ``verified AS (...)``   → parquet read (whitespace-tolerant
      regex pinned to the exact body; capped/sampled cand variants — d13,
      d14, d16 — have different bodies and are never touched)
    - ``reach(id, r) AS (<transitive closure>)`` → the precomputed
      (id, component) relation.  Exact because the CTE's explicit column
      list renames to (id, r) and EVERY consumer reads reach solely as
      ``min(r) .. GROUP BY id`` (audited; min(component) per id =
      component).  The enclosing WITH RECURSIVE stays — other recursive
      CTEs (pr5's walk) still need it.

    Substitution only runs when the cache is enabled (the volume tiers);
    the driver's plain invocation executes every oracle verbatim.  A
    fragment whose COPY fails (or was .nocache-pinned) is simply not
    substituted — cold semantics unchanged.  A WRONG substitution cannot
    pass silently: the gate still value-compares Spark against the
    substituted oracle.
    """
    if not fp_dir:
        return lambda sql: sql
    import re

    from data_etl_scripts_showcase__spark.queries.dedup import (  # noqa: PLC0415
        _BANDS_CTE,
        _CAND_SQL,
        _VERIFIED_CTE,
    )

    sym_reach = """
    sym AS (
        SELECT id_a AS a, id_b AS b FROM verified
        UNION
        SELECT id_b AS a, id_a AS b FROM verified
    ),
    reach(id, r) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.b, reach.r FROM reach JOIN sym s ON s.a = reach.id
    )
    """
    frags = {
        "cand": f"WITH {_BANDS_CTE} {_CAND_SQL}",
        "verified": (
            f"WITH {_BANDS_CTE}, {_VERIFIED_CTE} "
            "SELECT id_a, id_b FROM verified"
        ),
        "comp": (
            f"WITH RECURSIVE {_BANDS_CTE}, {_VERIFIED_CTE}, {sym_reach} "
            "SELECT id, min(r) AS component FROM reach GROUP BY id"
        ),
    }
    reach_re = re.compile(
        r"reach\(id, r\) AS \(\s*SELECT a, a FROM sym\s*UNION\s*"
        r"SELECT s\.b, reach\.r FROM reach JOIN sym s "
        r"ON s\.a = reach\.id\s*\)"
    )
    verified_re = re.compile(
        r"verified AS \(\s*SELECT c\.id_a, c\.id_b\s*FROM cand c\s*"
        r"JOIN g ga ON ga\.doc_id = c\.id_a\s*"
        r"JOIN g gb ON gb\.doc_id = c\.id_b\s*"
        r"WHERE CAST\(len\(list_intersect\(ga\.grams, gb\.grams\)\)"
        r" AS DOUBLE\)\s*"
        r"/ len\(list_distinct\(ga\.grams \|\| gb\.grams\)\)"
        r" >= 0\.5\s*\)"
    )
    cand_text = f"cand AS ({_CAND_SQL})"

    # Materialize lazily, on the FIRST oracle that actually consumes a
    # fragment — a filtered gate run (e.g. the longdocs chunk-family
    # slice) must not pay the verify join + transitive closure upfront.
    state: dict = {}

    def _rels() -> dict:
        if "rels" not in state:
            rels = {}
            for key, frag in frags.items():
                rel = cached_oracle_sql(con, frag, fp_dir)
                if rel.startswith("SELECT * FROM '"):
                    rels[key] = rel
            print(f"[oracle-frags] materialized: {sorted(rels)}")
            state["rels"] = rels
        return state["rels"]

    def sub(sql: str) -> str:
        # Each substitution is tied to its actual INPUTS (ADVICE r9): the
        # precomputed closure is only exact when the reach text sits over
        # the STANDARD verified body, which in turn is only standard when
        # it consumes the STANDARD cand.  An oracle building the same
        # reach text over a variant verified (different threshold, capped
        # cand) must run verbatim — substituting the standard components
        # under it would surface as a confusing downstream gate failure
        # instead of being skipped here.
        has_cand = cand_text in sql
        has_verified = has_cand and verified_re.search(sql) is not None
        has_reach = has_verified and reach_re.search(sql) is not None
        if not has_cand:
            return sql
        rels = _rels()
        if has_reach and "comp" in rels:
            sql = reach_re.sub(
                lambda _m: f"reach(id, r) AS ({rels['comp']})", sql
            )
        if has_verified and "verified" in rels:
            sql = verified_re.sub(
                lambda _m: f"verified AS ({rels['verified']})", sql
            )
        if "cand" in rels:
            sql = sql.replace(cand_text, f"cand AS ({rels['cand']})")
        return sql

    return sub


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Spark writes adjusted-to-UTC timestamps; pin the session zone so
    # DuckDB's TIMESTAMPTZ read-back compares as the same instant.
    con.execute("SET TimeZone='UTC'")
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
        # atol=0 (ADVICE r6): np.isclose's additive atol+rtol·|b| is
        # marginally looser than values_equal's max(rel·max, abs), so a
        # nonzero atol here could accept a boundary cell the per-cell
        # path would reject.  Exact-or-rtol accept only; everything else
        # is re-judged by values_equal.
        ok = np.isclose(af, bf, rtol=1e-9, atol=0.0) | both_na
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


_FLOAT_DUCK = {"FLOAT", "DOUBLE", "REAL", "FLOAT4", "FLOAT8"}


def _strip_tz(df: pd.DataFrame) -> pd.DataFrame:
    """tz-aware → naive UTC (Spark-written parquet timestamps read back as
    TIMESTAMPTZ; oracles produce naive TIMESTAMP of the same instant)."""
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    return df


def compare_in_duckdb(
    con: duckdb.DuckDBPyConnection, spark_glob: str, oracle_sql: str
) -> list[str]:
    """The big-output compare (VERDICT r6 #4): Spark's result is read from
    ITS parquet sink and compared against the oracle entirely inside
    DuckDB — no driver collect, no pandas materialization.

    Semantics mirror :func:`compare`: column-name set, row count, then
    rows paired by rank under a canonical total order (all columns ASC
    NULLS LAST, float columns LAST in the key) and compared per column —
    IS NOT DISTINCT FROM for exact types (DuckDB treats NaN = NaN), the
    same 1e-9-relative / 1e-12-absolute tolerance for floats.
    """
    con.execute(
        f"CREATE OR REPLACE TEMP VIEW __s AS SELECT * FROM '{spark_glob}'"
    )
    con.execute(f"CREATE OR REPLACE TEMP VIEW __o AS ({oracle_sql})")
    stypes = {r[0]: r[1] for r in con.execute("DESCRIBE __s").fetchall()}
    otypes = {r[0]: r[1] for r in con.execute("DESCRIBE __o").fetchall()}
    if sorted(stypes) != sorted(otypes):
        return [
            f"columns differ: spark={sorted(stypes)} oracle={sorted(otypes)}"
        ]
    ns = con.execute("SELECT count(*) FROM __s").fetchone()[0]
    no = con.execute("SELECT count(*) FROM __o").fetchone()[0]
    if ns != no:
        return [f"row count differs: spark={ns} oracle={no}"]
    float_cols = {
        c
        for c in stypes
        if stypes[c].upper() in _FLOAT_DUCK or otypes[c].upper() in _FLOAT_DUCK
    }
    order_cols = sorted(set(stypes) - float_cols) + sorted(float_cols)
    order_sql = ", ".join(f'"{c}" ASC NULLS LAST' for c in order_cols)
    preds = []
    for c in sorted(stypes):
        eq = f's."{c}" IS NOT DISTINCT FROM o."{c}"'
        if c in float_cols:
            eq = (
                f'({eq} OR abs(s."{c}" - o."{c}") '
                f'<= 1e-12 + 1e-9 * abs(o."{c}"))'
            )
        else:
            eq = f"({eq})"
        preds.append(eq)
    paired = f"""
        WITH s AS (SELECT *, row_number() OVER (ORDER BY {order_sql}) AS __rn FROM __s),
             o AS (SELECT *, row_number() OVER (ORDER BY {order_sql}) AS __rn FROM __o)
        SELECT s.__rn AS __rn FROM s JOIN o USING (__rn)
        WHERE NOT ({" AND ".join(preds)})
    """
    bad = con.execute(
        f"SELECT count(*) FROM ({paired})"
    ).fetchone()[0]
    if not bad:
        return []
    errs = [f"{bad} paired-row mismatches (duckdb compare, {ns} rows)"]
    sel = ", ".join(
        f's."{c}" AS "s_{c}", o."{c}" AS "o_{c}"' for c in sorted(stypes)
    )
    example = con.execute(
        f"""
        WITH s AS (SELECT *, row_number() OVER (ORDER BY {order_sql}) AS __rn FROM __s),
             o AS (SELECT *, row_number() OVER (ORDER BY {order_sql}) AS __rn FROM __o)
        SELECT {sel} FROM s JOIN o USING (__rn)
        WHERE NOT ({" AND ".join(preds)})
        LIMIT 1
        """
    ).df()
    errs.append(f"example: {example.to_dict('records')[0]}")
    return errs


ROTATION_SLICE = 25


def rotation_ids(registry: dict, round_no: int) -> list[str]:
    """The deterministic round-``round_no`` verification slice (see module
    docstring): 25 consecutive ids of the sorted registry, wrapping."""
    ids = sorted(registry)
    start = ((round_no - 1) * ROTATION_SLICE) % len(ids)
    return [ids[(start + i) % len(ids)] for i in range(ROTATION_SLICE)]


def main() -> int:
    args = sys.argv[1:]
    rotation = None
    if "--rotation" in args:
        i = args.index("--rotation")
        # Guarded parse (ADVICE r9): a missing or non-integer value prints
        # the usage line instead of an IndexError/ValueError traceback.
        try:
            rotation = int(args[i + 1])
        except (IndexError, ValueError):
            print(
                "usage: check_correctness.py [sf_dir] [query ...] "
                "[--rotation N]   (N = integer round number)"
            )
            return 2
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    only = set(args[1:] if args and os.path.isdir(args[0]) else args)

    registry = load_all()
    if rotation is not None:
        sel = rotation_ids(registry, rotation)
        print(f"[rotation] round {rotation}: {' '.join(sel)}")
        only |= set(sel)
    spark = get_session("check_correctness")
    con = duck_connection(sf_dir)
    fp_dir = (
        os.path.join(ORACLE_CACHE, data_fingerprint(sf_dir))
        if ORACLE_CACHE
        else None
    )
    if fp_dir:
        print(f"[oracle-cache] {fp_dir}")
    frag_sub = fragment_substituter(con, fp_dir)

    n_pass = n_fail = n_rows_only = 0
    for name, q in sorted(registry.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = None
        glob_path = None
        try:
            if VIA_PARQUET and q.oracle is not None:
                # No driver collect (VERDICT r6 #4): results go to a
                # parquet sink and DuckDB does the reading — the 60 M-row
                # outputs at the 100x tier never touch the driver.
                path = f"{GATE_TMP}/{os.path.basename(sf_dir.rstrip('/'))}/{name}"
                q.fn(spark, sf_dir).write.mode("overwrite").parquet(path)
                glob_path = f"{path}/*.parquet"
            else:
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
        nrows = None
        oracle_sql = q.oracle
        try:
            oracle_sql = cached_oracle_sql(con, frag_sub(q.oracle), fp_dir)
            if glob_path is not None:
                try:
                    nrows = con.execute(
                        f"SELECT count(*) FROM '{glob_path}'"
                    ).fetchone()[0]
                except Exception:  # zero part files written (empty frame)
                    sdf = q.fn(spark, sf_dir).toPandas()
                    glob_path = None
            if glob_path is not None and nrows <= PANDAS_MAX:
                # small output: proven pandas compare, fed from the sink
                sdf = _strip_tz(
                    con.execute(f"SELECT * FROM '{glob_path}'").df()
                )
            if sdf is not None:
                odf = _strip_tz(con.execute(oracle_sql).df())
                nrows = len(sdf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t_oracle = time.time() - t1
        t2 = time.time()
        try:
            if sdf is not None:
                errs = compare(name, sdf, odf)
            else:
                errs = compare_in_duckdb(con, glob_path, oracle_sql)
        except NonScalarOutputError as e:
            errs = [f"driver-unhashable output: {e}"]
        except Exception as e:  # noqa: BLE001
            errs = [f"compare raised {type(e).__name__}: {e}"]
        t_cmp = time.time() - t2
        timing = (
            f"[{time.time()-t0:.1f}s: spark {t_spark:.1f} "
            f"oracle {t_oracle:.1f} cmp {t_cmp:.1f}]"
        )
        if errs:
            print(f"FAIL  {name}: rows={nrows}")
            for e in errs:
                print(f"      {e}")
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={nrows} {timing}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail @ {sf_dir}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
