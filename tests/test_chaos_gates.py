"""Chaos-test the QA gates' FAILING paths at 10x volume (VERDICT r5 #5).

The reconciliation / referential-integrity / expectation gates (a9, x15,
x17) and the observe-based telemetry (x28) were asserted passing AND
failing only at toy scale; at the 10x scale-probe dir the physical plans
differ (AQE coalescing, sort-merge vs broadcast per edge), so the error
paths deserve one exercise there too.  The corrupted fixture symlinks the
pristine 10x tables and materializes only the damage:

- one orders part file rewritten with a negative o_totalprice, a
  duplicated o_orderkey, and an out-of-domain o_orderstatus;
- nation rewritten with one referenced n_nationkey REMOVED (dangling
  customer+supplier FKs);
- one lineitem part file OMITTED (silent data loss for telemetry to see).

Skipped (not failed) when the scale-probe dir is absent — build it with
`python tools/scale_probe.py`.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_etl_scripts_showcase__spark.queries import load_all

SCALE10 = "/tmp/spark_graft_scale/sf1_synth"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(f"{SCALE10}/orders.parquet"),
    reason="10x scale-probe dir not built (python tools/scale_probe.py)",
)


def _link_table(src_dir: str, dst_dir: str, table: str) -> None:
    os.symlink(f"{src_dir}/{table}.parquet", f"{dst_dir}/{table}.parquet")


@pytest.fixture(scope="module")
def corrupt10_dir(tmp_path_factory) -> str:
    dst = str(tmp_path_factory.mktemp("sf1_synth_corrupt"))
    tables = [
        "region", "customer", "supplier", "part",
        "events", "documents", "embeddings",
    ]
    for t in tables:
        _link_table(SCALE10, dst, t)

    # nation minus one nationkey that customers actually reference
    nat = pq.read_table(f"{SCALE10}/nation.parquet")
    cust_nk = pq.read_table(
        f"{SCALE10}/customer.parquet", columns=["c_nationkey"]
    )["c_nationkey"].to_pylist()
    doomed = max(set(cust_nk))
    keep = nat.filter(
        pa.compute.not_equal(nat["n_nationkey"], pa.scalar(doomed, nat["n_nationkey"].type))
    )
    assert keep.num_rows == nat.num_rows - 1
    os.makedirs(f"{dst}/nation.parquet")
    pq.write_table(keep, f"{dst}/nation.parquet/part-00000.parquet")

    # orders: symlink all parts but one; rewrite that one with damage
    os.makedirs(f"{dst}/orders.parquet")
    parts = sorted(
        f for f in os.listdir(f"{SCALE10}/orders.parquet") if f.endswith(".parquet")
    )
    for p in parts[1:]:
        os.symlink(f"{SCALE10}/orders.parquet/{p}", f"{dst}/orders.parquet/{p}")
    o = pq.read_table(f"{SCALE10}/orders.parquet/{parts[0]}").to_pydict()
    o["o_totalprice"][0] = -1.0
    dup = {k: [v[1]] for k, v in o.items()}  # duplicate the 2nd row's key
    dup["o_totalprice"] = [-5.0]
    dup["o_orderstatus"] = ["X"]
    sch = pq.read_table(f"{SCALE10}/orders.parquet/{parts[0]}").schema
    damaged = pa.concat_tables(
        [pa.table(o, schema=sch), pa.table(dup, schema=sch)]
    )
    pq.write_table(damaged, f"{dst}/orders.parquet/{parts[0]}")

    # lineitem: omit one part file entirely (silent loss)
    os.makedirs(f"{dst}/lineitem.parquet")
    li_parts = sorted(
        f for f in os.listdir(f"{SCALE10}/lineitem.parquet") if f.endswith(".parquet")
    )
    assert len(li_parts) >= 2
    for p in li_parts[1:]:
        os.symlink(f"{SCALE10}/lineitem.parquet/{p}", f"{dst}/lineitem.parquet/{p}")
    return dst


class TestGateFailingPathsAt10x:
    def test_a9_reconciliation_detects_negative_price(self, spark, corrupt10_dir):
        row = load_all()["a9_reconciliation_gate"].fn(spark, corrupt10_dir).collect()[0]
        assert row.gate_ok is False
        assert row.output_rows == row.input_rows - 2  # the two negative rows

    def test_x15_fk_audit_detects_orphans(self, spark, corrupt10_dir):
        rows = {
            (r.child_table, r.fk_column): r
            for r in load_all()["x15_fk_orphan_audit"].fn(spark, corrupt10_dir).collect()
        }
        # dangling pointers on both nation edges
        assert rows[("customer", "c_nationkey")].n_orphans > 0
        assert rows[("supplier", "s_nationkey")].n_orphans > 0
        # dropping CHILD rows (lineitem part) creates no orphans; the dup
        # order copies a valid custkey
        assert rows[("orders", "o_custkey")].n_orphans == 0
        assert rows[("nation", "n_regionkey")].n_orphans == 0

    def test_x17_expectations_detect_each_violation(self, spark, corrupt10_dir):
        rows = {
            r.rule: r
            for r in load_all()["x17_expectations_suite"].fn(spark, corrupt10_dir).collect()
        }
        assert rows["o_orderkey_unique"].passed is False
        assert rows["o_orderkey_unique"].n_violations >= 1
        assert rows["o_totalprice_positive"].passed is False
        assert rows["o_totalprice_positive"].n_violations >= 2
        assert rows["o_orderstatus_in_domain"].passed is False
        # untouched rules still pass at volume
        assert rows["o_orderkey_not_null"].passed is True
        assert rows["o_orderpriority_pattern"].passed is True

    def test_x28_telemetry_sees_dropped_part(self, spark, corrupt10_dir):
        fn = load_all()["x28_observed_metrics"].fn
        pristine = fn(spark, SCALE10).collect()[0]
        damaged = fn(spark, corrupt10_dir).collect()[0]
        assert damaged.n_rows < pristine.n_rows
        assert damaged.qty_sum < pristine.qty_sum
        assert damaged.n_returned <= pristine.n_returned
