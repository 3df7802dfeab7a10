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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_entities(clustered: DataFrame) -> DataFrame:
    """clustered(cluster_id, mention_uid, norm, surface, url) →
    entities(cluster_id, canonical, n_mentions, n_aliases, aliases, n_pages).

    Round-6 perf shape: a two-level aggregation. Level 1 counts mentions
    per (cluster, norm); level 2 derives everything name-based in ONE
    aggregate — n_mentions = sum of counts, n_aliases = group size,
    aliases = sorted collect, canonical = min_by over (-cnt, norm), the
    same (most-frequent, ties lexicographic) rule the old
    row_number-window + filter + join computed. n_pages stays its own
    single-countDistinct aggregate (no collected url sets — a cluster can
    have millions of pages at scale). vs the old plan: the window
    Exchange+Sort, the multi-countDistinct Expand (3× row blowup) and one
    join are gone; values are identical."""
    by_name = clustered.groupBy("cluster_id", "norm").agg(
        F.count("*").alias("cnt")
    )
    name_stats = by_name.groupBy("cluster_id").agg(
        F.sum("cnt").alias("n_mentions"),
        F.count(F.lit(1)).alias("n_aliases"),
        F.array_sort(F.collect_list("norm")).alias("aliases"),
        F.min_by(
            "norm", F.struct((-F.col("cnt")).alias("neg"), F.col("norm").alias("nm"))
        ).alias("canonical"),
    )
    pages = clustered.groupBy("cluster_id").agg(
        F.countDistinct("url").alias("n_pages")
    )
    return name_stats.join(pages, "cluster_id").select(
        "cluster_id", "n_mentions", "n_aliases", "aliases", "n_pages", "canonical"
    )


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
