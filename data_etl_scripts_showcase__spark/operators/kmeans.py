"""Distributed k-means (Lloyd's algorithm) over array-typed vector columns.

The iterative-algorithm archetype for the engine (BASELINE.json north star):
each Lloyd iteration is two pure DataFrame stages —

  assign:  corpus × broadcast(centroids) → per-vector argmin cell
  update:  posexplode assigned vectors → per-(cluster, dim) mean

so a 100 TB corpus re-clusters with ONE shuffle per iteration (the
dimension-mean aggregate; the assign stage is a broadcast nested product
over k·dim centroid values, evaluated scan-side).  Nothing iterates on the
driver except the loop that unrolls plan stages.

Determinism (oracle contract): distances and centroid means are rounded to
6 dp at every iteration boundary, and argmin ties break on the lower
cluster id — the DuckDB oracle replays the identical unrolled recurrence,
so Spark and SQL converge to bit-equal centroids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sqdist(vec: Column, cvec: Column) -> Column:
    """Rounded squared euclidean distance between two double arrays."""
    return F.round(
        F.aggregate(
            F.zip_with(vec, cvec, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def _assign(corpus: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """Each vector's nearest centroid (rounded distance, id tie-break)."""
    from pyspark.sql import Window as W

    j = corpus.crossJoin(F.broadcast(cents))
    w = W.partitionBy(id_col).orderBy(
        _sqdist(F.col("_vec"), F.col("_cvec")).asc(), F.col("cluster").asc()
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "cluster", "_vec")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroid per cluster: per-dimension mean, rounded, re-packed."""
    means = (
        assigned.select("cluster", F.posexplode("_vec").alias("_pos", "_v"))
        .groupBy("cluster", "_pos")
        .agg(F.round(F.avg("_v"), 6).alias("_cv"))
    )
    return means.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_cv"))),
            lambda s: s._cv,
        ).alias("_cvec")
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Run `iters` Lloyd iterations seeded from the k lowest-id vectors.

    Returns the final model exploded for inspection/oracle comparison:
    (cluster, pos, centroid_val, n_members).  The deterministic lowest-id
    seeding mirrors the IVF index (operators/similarity.assign_cells);
    swap in k-means|| seeding for production — the iteration body is
    unchanged.
    """
    corpus = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_vec"),
    )
    cents = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).cast("int").alias("cluster"), F.col("_vec").alias("_cvec"))
    )
    assigned = None
    for _ in range(iters):
        assigned = _assign(corpus, cents, id_col)
        cents = _update(assigned)
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("n_members"))
    out = cents.select(
        "cluster", F.posexplode("_cvec").alias("pos0", "centroid_val")
    ).select("cluster", (F.col("pos0") + 1).alias("pos"), "centroid_val")
    return out.join(F.broadcast(sizes), "cluster").select(
        "cluster", "pos", "centroid_val", "n_members"
    )
