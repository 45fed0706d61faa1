"""Library operators.

Composable, 100 TB-minded building blocks that go beyond the reference's own
surface (BASELINE.json north star): text analysis, deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard), and embedding similarity
search.  Everything is built from JVM-side column expressions and
shuffle-conscious DataFrame plans — no driver collects, no per-row Python.
(Where a per-position scan genuinely cannot be expressed linearly with
built-ins — CDC chunking, see ``chunking.py`` — the escape hatch is a
single vectorized Arrow pass, never row-at-a-time UDFs.)
"""
