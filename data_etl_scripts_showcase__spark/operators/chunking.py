"""Content-defined chunking (CDC) — the rsync/LBFS/backup-dedup primitive.

A chunk boundary falls wherever a hash of the local 8-byte window hits a
target residue (1 in 32), so boundaries are anchored to CONTENT, not byte
offsets: insert a byte and only the neighboring chunks change.  Chunks are
content-addressed with an md5 digest for the chunk store / contamination
passes (t25, x48, d23, d25).

Execution-form history (the round-7 lesson, with microbenchmarks in
SCALE.md):

* v1 (rounds ≤5) exploded one row PER CHARACTER POSITION, each carrying the
  full document text, then ran a per-doc window over the boundary rows —
  shuffle payload quadratic in document length.
* v2 (round 6) computed boundaries as a higher-order array column (zero
  Exchange) — but was STILL quadratic, now in CPU: a lambda that references
  the enclosing row's string/binary column re-evaluates that BoundReference
  on EVERY element.  ``UnsafeRow.getBinary`` copies the whole array per
  call, and ``UTF8String.substring`` seeks char boundaries from offset 0,
  so even a no-op ``filter(sequence(1, n), i -> length(substring(b, i, 8))
  = 99)`` measured 112 s at the ×128 doc-length tier vs 1.2 s for the same
  lambda without the column reference.  Per-position window scans simply
  cannot be expressed linearly with Spark higher-order functions.
* v3 (this module) runs ONE vectorized Arrow pass: ``mapInPandas`` with a
  numpy Horner scan — every byte is touched O(1) times, the pass is
  embarrassingly parallel, and the plan has ZERO Exchange, zero Window,
  zero Generate.  This is the documented ``mapInPandas`` escape hatch: the
  built-in operators genuinely cannot express a per-position rolling scan.

The boundary hash also changed in v3, from md5-of-window to a polynomial
window hash (Horner, multiplier 131, modulus 2^31−1, boundary when the
hash ≡ 0 mod 32).  A crypto digest PER BYTE POSITION is ~100× the cost of
reading the bytes — which is exactly why real CDC systems (LBFS, rsync,
FastCDC's gear hash) use cheap rolling/window hashes for boundary
detection and keep the strong digest for chunk CONTENT only.  The
polynomial form is exact integer math, reproducible bit-for-bit in numpy
(int64), in pure Python (:func:`cdc_chunks_py`, the property-test
reference), and in ANSI SQL (:func:`cdc_boundary_sql` — the DuckDB oracle
runs the same Horner chain via ``ascii(substr(...))``).  Chunk digests
remain md5.

Addressing scope: the engine is byte-addressed (UTF-8); the SQL oracle is
character-addressed.  They coincide exactly on ASCII corpora (the test
corpus is verified ASCII-pure: ``octet_length = length`` for every row).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T

CDC_WINDOW = 8
CDC_MULT = 131
CDC_MODULUS = 2_147_483_647  # 2^31 − 1; keeps Horner state < 2^39 in int64
CDC_MASK = 32  # boundary when window hash ≡ 0 (mod 32) → mean chunk ~32 B

_CHUNK_FIELDS = [
    T.StructField("chunk_idx", T.IntegerType()),
    T.StructField("start_pos", T.LongType()),
    T.StructField("chunk_len", T.LongType()),
    T.StructField("chunk_md5", T.StringType()),
]

# yield output frames at ~this many chunk rows so a long-doc batch never
# materializes one giant pandas frame (10k docs × thousands of chunks each)
_FLUSH_ROWS = 1 << 18


def cdc_boundary_sql(col: str = "text", i: str = "i") -> str:
    """The boundary window hash as an ANSI-SQL expression (1-based ``i``).

    Horner over the 8 characters at positions ``i .. i+7`` — byte-exact
    with the numpy/pure-Python forms on ASCII input.  Boundary predicate:
    ``{i} = 1 OR ({this}) % 32 = 0``.
    """
    e = f"CAST(ascii(substr({col}, {i}, 1)) AS BIGINT)"
    for k in range(1, CDC_WINDOW):
        e = (
            f"(({e}) * {CDC_MULT} + ascii(substr({col}, {i} + {k}, 1)))"
            f" % {CDC_MODULUS}"
        )
    return e


def cdc_chunks_py(data: bytes) -> list[tuple[int, int]]:
    """Pure-Python sequential reference: (start_pos, chunk_len) pairs,
    1-based, covering ``data`` exactly.  O(n·W) — property-test oracle
    only; the distributed path is :func:`cdc_chunks`."""
    n = len(data)
    bounds = [1]
    for i in range(2, max(n - CDC_WINDOW + 1, 0) + 1):
        h = 0
        for k in range(CDC_WINDOW):
            h = (h * CDC_MULT + data[i - 1 + k]) % CDC_MODULUS
        if h % CDC_MASK == 0:
            bounds.append(i)
    ends = bounds[1:] + [n + 1]
    return [(s, e - s) for s, e in zip(bounds, ends)]


def _bounds_np(data: bytes, np):  # noqa: ANN001 - numpy passed in, worker-side
    """Vectorized boundary scan: int64 Horner over all windows at once."""
    n = len(data)
    if n < CDC_WINDOW:
        return np.array([1], dtype=np.int64)
    a = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    L = n - CDC_WINDOW + 1  # window starts 1..n−7 (1-based)
    h = a[:L].copy()
    for k in range(1, CDC_WINDOW):
        h = (h * CDC_MULT + a[k : k + L]) % CDC_MODULUS
    pos = np.flatnonzero(h % CDC_MASK == 0) + 1  # → 1-based positions
    return np.union1d(pos, np.array([1], dtype=np.int64))


def cdc_chunks(df: DataFrame, keep: Sequence[str]) -> DataFrame:
    """Chunk ``df.text`` content-defined; one output row per chunk.

    Returns ``(*keep, chunk_idx, start_pos, chunk_len, chunk_md5)`` with
    ``keep`` column types preserved from the input schema.  The plan is a
    single narrow ``MapInPandas`` over a pruned ``(keep…, text)``
    projection: no Exchange, no Window, no Generate — cost is O(bytes)
    CPU and O(bytes/32) output rows, embarrassingly parallel at 100 TB.
    """
    keep = list(keep)
    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType([in_fields[c] for c in keep] + _CHUNK_FIELDS)

    def gen(batches: Iterable) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        kept: dict[str, list] = {c: [] for c in keep}
        idxs: list[int] = []
        starts: list[int] = []
        lens: list[int] = []
        digs: list[str] = []

        def flush():
            out = pd.DataFrame(
                {
                    **{c: pd.Series(kept[c]) for c in keep},
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "start_pos": pd.Series(starts, dtype="int64"),
                    "chunk_len": pd.Series(lens, dtype="int64"),
                    "chunk_md5": pd.Series(digs, dtype="object"),
                }
            )
            for c in keep:
                kept[c].clear()
            idxs.clear(), starts.clear(), lens.clear(), digs.clear()
            return out

        for pdf in batches:
            texts = pdf["text"]
            keeps = [pdf[c] for c in keep]
            for j in range(len(pdf)):
                t = texts.iloc[j]
                if t is None:
                    continue
                data = t.encode("utf-8")
                bounds = _bounds_np(data, np)
                ends = np.append(bounds[1:], len(data) + 1)
                b = bounds.tolist()
                ln = (ends - bounds).tolist()
                k = len(b)
                for c, s in zip(keep, keeps):
                    kept[c].extend([s.iloc[j]] * k)
                idxs.extend(range(1, k + 1))
                starts.extend(b)
                lens.extend(ln)
                digs.extend(
                    hashlib.md5(data[s - 1 : s - 1 + l]).hexdigest()
                    for s, l in zip(b, ln)
                )
                if len(idxs) >= _FLUSH_ROWS:
                    yield flush()
        if idxs:
            yield flush()

    return df.select(*keep, "text").mapInPandas(gen, schema=out_schema)
