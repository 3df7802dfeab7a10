"""Cluster-quality metrics scored as labeled pairs.

Pairwise (Blanc-coreferent-cell) F1 is the BASELINE.json target metric: the
reference's Blanc evaluator builds intra-cluster link sets and a 2×2
coreferent/non-coreferent confusion matrix (reference: latest/tools/
evaluators.py:61-132, link sets :104-111, confusion :125-128); precision/
recall/F1 of the coreferent cell over pairs sharing a blocking key is
exactly what ``pairwise_f1`` computes — distributed, via joins + one agg,
no driver-side pair materialization.

B³ (reference: evaluators.py:34-58) is included for parity reporting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AMBIGUOUS = ("#other#", "#general#")


def gold_pairs_from_mentions(gold_mentions: DataFrame) -> DataFrame:
    """gold_mentions(block_key, mention_uid, gold_refs array<string>) →
    gold_pairs(block_key, m1, m2, is_match) for all intra-block pairs,
    m1 < m2.

    is_match = non-empty gold_refs intersection, excluding the ambiguous
    labels which never co-refer (reference: latest/tools/state.py:28-34 —
    #other#/#general# stay singletons).
    """
    g = gold_mentions.select("block_key", "mention_uid", "gold_refs")
    a = g.select(
        "block_key",
        F.col("mention_uid").alias("m1"),
        F.col("gold_refs").alias("refs1"),
    )
    b = g.select(
        "block_key",
        F.col("mention_uid").alias("m2"),
        F.col("gold_refs").alias("refs2"),
    )
    amb = F.array(*[F.lit(x) for x in AMBIGUOUS])
    return (
        a.join(b, "block_key")
        .filter(F.col("m1") < F.col("m2"))
        .withColumn(
            "is_match",
            F.size(
                F.array_except(F.array_intersect("refs1", "refs2"), amb)
            )
            > 0,
        )
        .select("block_key", "m1", "m2", "is_match")
        .dropDuplicates(["m1", "m2"])
    )


def pairwise_f1(assignments: DataFrame, gold_pairs: DataFrame) -> dict:
    """assignments(mention_uid, cluster_id) scored against
    gold_pairs(m1, m2, is_match). Returns dict with tp/fp/fn/precision/
    recall/f1 — the Blanc coreferent cell."""
    a1 = assignments.select(
        F.col("mention_uid").alias("m1"), F.col("cluster_id").alias("c1")
    )
    a2 = assignments.select(
        F.col("mention_uid").alias("m2"), F.col("cluster_id").alias("c2")
    )
    joined = (
        gold_pairs.join(a1, "m1").join(a2, "m2")
        .withColumn("pred", F.col("c1") == F.col("c2"))
    )
    row = joined.agg(
        F.sum(F.when(F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = row["tp"] or 0, row["fp"] or 0, row["fn"] or 0
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": p, "recall": r, "f1": f1}


def b_cubed(assignments: DataFrame, gold: DataFrame) -> dict:
    """Singular-label B³: per-mention P = |gold∩auto|/|auto|,
    R = |gold∩auto|/|gold|, averaged (reference: evaluators.py:34-58).
    gold(mention_uid, entity) single-label; assignments(mention_uid,
    cluster_id)."""
    m = assignments.join(gold, "mention_uid")
    # overlap of each (cluster, entity) cell, then per-mention ratios
    cell = m.groupBy("cluster_id", "entity").agg(F.count("*").alias("ov"))
    csz = m.groupBy("cluster_id").agg(F.count("*").alias("cn"))
    esz = m.groupBy("entity").agg(F.count("*").alias("en"))
    per = (
        m.join(cell, ["cluster_id", "entity"])
        .join(csz, "cluster_id")
        .join(esz, "entity")
        .select((F.col("ov") / F.col("cn")).alias("p"), (F.col("ov") / F.col("en")).alias("r"))
    )
    row = per.agg(F.avg("p").alias("p"), F.avg("r").alias("r")).collect()[0]
    p, r = row["p"] or 0.0, row["r"] or 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1}
