"""Canonical-entity assignment per cluster (the reference's entity-linking
stage recast).

The reference pools per-cluster mention representations (elementwise max +
mean — reference: latest/model/linking.py:108-130) and classifies each
cluster to a label (latest/model/linking.py:64-80). The engine's analog:
per connected component, aggregate a canonical record — most frequent
normalized surface (ties broken lexicographically, deterministic), alias
set, member count, span provenance, optional pooled embedding (mean + max,
the A3 analog) done relationally via posexplode so it stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def canonical_entities(clustered: DataFrame) -> DataFrame:
    """clustered(cluster_id, mention_uid, norm, surface, url) →
    entities(cluster_id, canonical, n_mentions, n_aliases, aliases, n_pages).
    """
    by_name = clustered.groupBy("cluster_id", "norm").agg(
        F.count("*").alias("cnt"), F.countDistinct("url").alias("n_urls")
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("cnt"), F.asc("norm"))
    canonical = (
        by_name.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("cluster_id", F.col("norm").alias("canonical"))
    )
    stats = clustered.groupBy("cluster_id").agg(
        F.count("*").alias("n_mentions"),
        F.countDistinct("norm").alias("n_aliases"),
        F.array_sort(F.collect_set("norm")).alias("aliases"),
        F.countDistinct("url").alias("n_pages"),
    )
    return stats.join(canonical, "cluster_id")


def pooled_cluster_embeddings(
    clustered: DataFrame, emb_col: str = "embedding"
) -> DataFrame:
    """Elementwise mean AND max pooling over member embeddings per cluster
    (reference: linking.py:117-118,123-128), fully relational:
    posexplode → groupBy(cluster, slot) → re-collect ordered by slot."""
    slotted = clustered.select(
        "cluster_id", F.posexplode(emb_col).alias("slot", "val")
    )
    agg = slotted.groupBy("cluster_id", "slot").agg(
        F.avg("val").alias("mean_v"), F.max("val").alias("max_v")
    )
    return agg.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("slot", "mean_v"))), lambda s: s["mean_v"]
        ).alias("emb_mean"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("slot", "max_v"))), lambda s: s["max_v"]
        ).alias("emb_max"),
    )
