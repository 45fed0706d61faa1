"""Z-order (Morton) curve for multi-dimensional data layout.

A date-partitioned layout (the reference's `live/<Table>_<date>.csv`
convention, `Azure_datalake_etl/Gonukkad_Merchants.py:79-84`) prunes
perfectly on the date and not at all on any other column.  Interleaving
the bits of two (or more) bucketed columns into one sort key gives every
file a bounded range in EVERY interleaved dimension — the standard
Z-order/liquid-clustering layout trick (Delta OPTIMIZE ZORDER BY,
Iceberg sort orders) that turns min/max file statistics into effective
pruning for multi-predicate scans at 100 TB.

The z-value is pure integer bit arithmetic (shift/and/or), so it runs
inside whole-stage codegen and any SQL engine — including the DuckDB
oracle — reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of x (even positions) and y (odd):
    z = Σ_i ((x>>i & 1) << 2i) | ((y>>i & 1) << 2i+1).  Inputs must be
    non-negative; callers bucket raw columns into [0, 2^bits) first."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("bigint")


def zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    """The identical z-value as ANSI SQL (for the DuckDB oracle)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"
