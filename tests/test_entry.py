"""Driver-contract smoke tests: entry(), queries(), oracle_sql() wiring."""

from __future__ import annotations

import importlib

import pytest


@pytest.fixture(scope="module")
def entry_mod():
    return importlib.import_module("__spark_entry__")


def test_entry_returns_rows(spark, entry_mod):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert {"o_orderkey", "is_open", "order_ds"} <= set(df.columns)


def test_registry_shape(entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert "flagship_active_customer_snapshot" in qs
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_all_queries_run_at_smoke_sf(spark, sf_dir, entry_mod):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
