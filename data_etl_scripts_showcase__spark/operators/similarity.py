"""Embedding similarity search: brute-force cosine top-k + sign-LSH bucketed
ANN (BASELINE.json north star — training-data pipeline ops).

Scale design:
- *Brute force* is the baseline/recall-oracle: broadcast the (small) query
  set, stream the corpus once, rank per query.  Corpus never shuffles until
  the final per-query top-k (keyed by query id — tiny).
- *Sign-LSH* is the scale path: an axis-sign bucket key computed in the scan
  stage blocks the corpus; candidate generation becomes an equality join on
  the bucket, turning O(|Q|·|C|) into O(|Q|·bucket_size).  More planes →
  smaller buckets; multiple tables → recall (standard LSH trade-off).

Dot products fold left-to-right in doubles (F.aggregate), so scores are
deterministic for a given vector — the DuckDB oracle reproduces them to
rounding precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float arrays, accumulated in double, in order."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """L2 norm (double)."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0 when either vector has zero norm."""
    na, nb = norm(a), norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 6,
    parallelism: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, neighbor_id, sim, rank).

    Broadcast the query side; rank with a deterministic tie-break
    (sim desc, neighbor id asc).  Self-matches excluded.
    ``parallelism``: repartition the corpus first (for few-file sources
    whose scan yields too few partitions to spread the dot products).
    """
    if parallelism:
        corpus = corpus.repartition(parallelism)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("q_vec", "c_vec"), round_to).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def sign_bucket(vec: Column | str, n_bits: int = 8) -> Column:
    """Axis-sign LSH bucket: bit i set iff vec[i] > 0 (first n_bits dims)."""
    v = _c(vec)
    acc = F.lit(0)
    for i in range(n_bits):
        acc = acc + F.when(
            F.element_at(v, i + 1) > 0.0, F.lit(2**i)
        ).otherwise(F.lit(0))
    return acc.cast("int")


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    n_assign: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Assign each vector to its ``n_assign`` nearest centroids by cosine.

    Returns (id, vec, cell, cell_rank).  Deterministic tie-break: sim desc
    (rounded), centroid id asc.

    Fully MAP-SIDE (round 7): the centroid table collapses to a single
    array-of-structs row (tiny by construction — nlist entries), that one
    row broadcasts, and each vector ranks its cells with higher-order
    functions: transform → (−sim, id) structs, array_sort (field order =
    the tie-break), slice(n_assign), posexplode.  The previous form
    crossJoined every vector with every centroid and ranked with a
    per-vector window — |corpus|×nlist rows each carrying the embedding
    through a hash shuffle, an nlist× payload amplification of the whole
    corpus.  This form touches each vector exactly once in its scan task:
    assignment costs zero Exchange at any corpus size.
    """
    carr = centroids.agg(
        F.sort_array(F.collect_list(F.struct("centroid_id", "cent_vec"))).alias(
            "_cents"
        )
    )
    scored = (
        vectors.select(F.col(id_col), F.col(vec_col))
        .crossJoin(F.broadcast(carr))
        .select(
            id_col,
            vec_col,
            F.slice(
                F.array_sort(
                    F.transform(
                        "_cents",
                        lambda c: F.struct(
                            (
                                -F.round(
                                    cosine(F.col(vec_col), c["cent_vec"]),
                                    round_to,
                                )
                            ).alias("negsim"),
                            c["centroid_id"].alias("centroid_id"),
                        ),
                    )
                ),
                1,
                n_assign,
            ).alias("_top"),
        )
    )
    e = scored.select(
        id_col, vec_col, F.posexplode("_top").alias("_pos", "_cs")
    )
    return e.select(
        id_col,
        vec_col,
        F.col("_cs.centroid_id").alias("cell"),
        (F.col("_pos") + 1).cast("int").alias("cell_rank"),
    )


def knn_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
    round_to: int = 6,
    parallelism: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: partition the corpus into centroid
    cells, probe only the query's ``nprobe`` nearest cells.

    Centroid choice here is deterministic (the ``n_centroids`` lowest-id
    vectors) so the DuckDB oracle can regenerate the exact index; a
    production build swaps in k-means centroids — the probe/search plan is
    identical either way.

    Scale design: each corpus vector lands in exactly ONE cell (no
    duplication), the cell id is a disk bucketing/partitioning key at
    100 TB, and a probe reads nprobe/n_centroids of the corpus instead of
    all of it.  Candidate generation is an equality join on the cell id
    with the (small) probe set broadcast.
    """
    if parallelism:
        corpus = corpus.repartition(parallelism)
    cents = (
        corpus.where(F.col(id_col) < n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cent_vec")
        )
    )
    cells = assign_cells(corpus, cents, 1, id_col, vec_col, round_to).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "cell",
    )
    probes = assign_cells(queries, cents, nprobe, id_col, vec_col, round_to).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "cell"
    )
    scored = (
        cells.join(F.broadcast(probes), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("q_vec", "c_vec"), round_to).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def knn_lsh_bucketed(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_bits: int = 8,
    round_to: int = 6,
    parallelism: int | None = None,
) -> DataFrame:
    """ANN top-k within the query's sign-LSH bucket (the scale path).

    Candidates come from an equality join on the bucket key — at 100 TB the
    corpus is written bucketed/partitioned by this key, so the probe reads
    one partition per query instead of the full corpus.
    """
    if parallelism:
        corpus = corpus.repartition(parallelism)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        sign_bucket(vec_col, n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        sign_bucket(vec_col, n_bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("q_vec", "c_vec"), round_to).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
