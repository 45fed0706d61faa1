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


def test_no_nested_types_in_oracle_checked_output(spark, sf_dir, entry_mod):
    """Driver-canonicalizer contract: every oracle-paired query must ship
    only scalar top-level columns — the driver's pandas hasher raises
    ``unhashable type: 'list'`` on ArrayType/MapType/StructType cells
    (round-2 red row t11).  Schema-only check: no job is launched."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    oracles = entry_mod.oracle_sql()
    offenders = []
    for name, fn in entry_mod.queries().items():
        if name not in oracles:
            continue  # rows-only queries are not value-hashed by the driver
        schema = fn(spark, sf_dir).schema
        for field in schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, (
        "oracle-paired queries with driver-unhashable top-level columns "
        "(stringify via array_join/to_json): " + "; ".join(offenders)
    )


def test_schema_lint_catches_array_output(spark, sf_dir):
    """The lint above must actually detect a raw-array projection."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import ArrayType, MapType, StructType

    from data_etl_scripts_showcase__spark.sources import load_table

    df = (
        load_table(spark, sf_dir, "region")
        .groupBy("r_regionkey")
        .agg(F.collect_list("r_name").alias("names"))
    )
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert bad == ["names"]
