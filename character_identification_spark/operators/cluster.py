"""Lloyd's k-means over embedding columns, Spark-first and oracle-exact.

The canonical scalable formulation (MLlib's own dataflow, re-derived
relationally): centroids are a k×dim table that lives on the driver and
enters the plan as LITERALS, so the assignment step is a zero-shuffle
whole-stage-codegen projection over the corpus; the update step is one
(cluster, slot)-keyed aggregation — map-side partial sums collapse each
partition to ≤ k·dim rows before the exchange, so the shuffle is
constant-size at any corpus scale. n_iters driver rounds, like
operators/cc.py's loop discipline.

Determinism contract (what makes the DuckDB twin value-exact):
- init = the k rows with smallest (md5(id), id) — the same md5-exemplar
  codebook rule as dedup.semantic_dedup / similarity.ivf_topk;
- every working centroid is quantized to integer MICROS (round(x·1e6),
  a Spark-side round both engines reproduce — the cluster_embeddings
  precedent), so each round's assignment input is a pure integer
  function of the previous round;
- per-centroid squared distance is rounded to micros BEFORE the argmin
  and ties break on centroid index, so the winner is integer-determined;
- a cluster that loses all members keeps its previous centroid.

Reference anchor: the reference has no clustering beyond transitive
closure; this is the M1-encoder-style geometric counterpart the
curation stack needs (SemDeDup's own step 1 is exactly this k-means).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICROS = 1_000_000.0


def _dist_micros(vec_col: str, centroid: list[float]):
    """Squared L2 distance to a literal centroid, in rounded micros."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.round(d2 * MICROS).cast("long")


def _assign(base: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Argmin-by-(dist_micros, cluster) as an array_sort over structs —
    pure projection, no shuffle, no Python."""
    arr = F.array(
        *[
            F.struct(
                _dist_micros(vec_col, c).alias("dist_micros"),
                F.lit(ci).alias("cluster"),
            )
            for ci, c in enumerate(centroids)
        ]
    )
    best = F.element_at(F.array_sort(arr), 1)
    return base.withColumn("cluster", best["cluster"]).withColumn(
        "dist_micros", best["dist_micros"]
    )


def kmeans_fit_predict(
    emb: DataFrame,
    k: int = 8,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, cluster, dist_micros): Lloyd's k-means, ``n_iters`` update
    rounds from the md5-exemplar init, final assignment under the final
    centroids. Fixed iteration count (not convergence-tested) keeps the
    result a pure function of the input, exactly replayable by the
    unrolled-CTE oracle twin.
    """
    base = emb.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    # Init: k exemplars by (md5(id), id); micros-quantized in Spark so
    # the oracle's round() is the same round().
    init_rows = (
        base.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
        .limit(k)
        .select(
            F.transform(
                F.col("_v"), lambda x: F.round(x * MICROS).cast("long")
            ).alias("m")
        )
        .collect()
    )
    centroids = [[m / MICROS for m in r["m"]] for r in init_rows]
    dim = len(centroids[0])

    for _ in range(n_iters):
        assigned = _assign(base, "_v", centroids)
        new_rows = (
            assigned.select("cluster", F.posexplode(F.col("_v")).alias("slot", "val"))
            .groupBy("cluster", "slot")
            .agg(F.round(F.avg("val") * MICROS).cast("long").alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, int]] = {}
        for r in new_rows:
            by_cluster.setdefault(r["cluster"], {})[r["slot"]] = r["m"]
        centroids = [
            [by_cluster[ci][s] / MICROS for s in range(dim)]
            if ci in by_cluster
            else centroids[ci]  # empty cluster keeps its previous centroid
            for ci in range(k)
        ]

    return _assign(base, "_v", centroids).select(
        F.col("_id").alias(id_col), "cluster", "dist_micros"
    )
