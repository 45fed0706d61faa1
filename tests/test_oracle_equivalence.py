"""DuckDB-oracle equivalence for every registered query (SURVEY.md §5 t1).

This is the same comparison the driver's correctness gate performs, run at
the smoke scale factor so it stays fast enough for every pytest run.  The
full sf0.01 sweep is `python tools/check_correctness.py`.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_correctness import compare, duck_connection  # noqa: E402

from data_etl_scripts_showcase__spark.queries import load_all  # noqa: E402

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_equivalence(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    odf = duck.execute(q.oracle).df()
    errs = compare(name, sdf, odf)
    assert not errs, f"{name}: " + "; ".join(errs)
