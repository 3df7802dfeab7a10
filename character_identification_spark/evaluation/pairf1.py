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


def pairwise_f1_multi(memberships: DataFrame, gold_pairs: DataFrame) -> dict:
    """M5 multi-membership consumer: memberships(mention_uid, cluster_id)
    may carry SEVERAL rows per mention (a plural mention belongs to every
    cluster in its label set — reference: latest/tools/state.py:14,31-37
    keeps a referent LIST per mention). Two mentions are predicted
    coreferent iff their cluster SETS intersect — the same rule the gold
    side applies to gold_refs (gold_pairs_from_mentions).

    One extra aggregate vs pairwise_f1: the m1×m2 membership join can
    produce several rows per pair, so pred = max(c1 == c2) per pair."""
    a1 = memberships.select(
        F.col("mention_uid").alias("m1"), F.col("cluster_id").alias("c1")
    )
    a2 = memberships.select(
        F.col("mention_uid").alias("m2"), F.col("cluster_id").alias("c2")
    )
    pairs = (
        gold_pairs.join(a1, "m1")
        .join(a2, "m2")
        .groupBy("m1", "m2", "is_match")
        .agg(F.max(F.col("c1") == F.col("c2")).alias("pred"))
    )
    row = pairs.agg(
        F.sum(F.when(F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("is_match"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = row["tp"] or 0, row["fp"] or 0, row["fn"] or 0
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": p, "recall": r, "f1": f1}


def b_cubed_multi(auto_memberships: DataFrame, gold_memberships: DataFrame) -> dict:
    """Multi-membership B³ — the reference's exact semantics (reference:
    evaluators.py:38-58): a mention's aggregated cluster is the UNION of
    members of every cluster containing it (flatten_deep of its
    mention→clusters list), on both sides; correct = |agg_gold ∩ agg_auto|
    per mention, averaged over the mentions of the auto map.

    Inputs are membership rows (mention_uid, cluster_id) / (mention_uid,
    entity), several rows per plural mention. The member-union join fans
    out by cluster size — bounded by blocking, same bound as pair
    generation."""

    def agg_sets(mem: DataFrame, cid: str) -> DataFrame:
        members = mem.select(F.col(cid).alias("c"), F.col("mention_uid").alias("m2"))
        return (
            mem.select("mention_uid", F.col(cid).alias("c"))
            .join(members, "c")
            .select("mention_uid", "m2")
            .distinct()
        )
    auto_set = agg_sets(auto_memberships, "cluster_id")
    gold_set = agg_sets(gold_memberships, "entity")
    an = auto_set.groupBy("mention_uid").agg(F.count("*").alias("an"))
    gn = gold_set.groupBy("mention_uid").agg(F.count("*").alias("gn"))
    correct = (
        auto_set.join(gold_set, ["mention_uid", "m2"])
        .groupBy("mention_uid")
        .agg(F.count("*").alias("ov"))
    )
    per = (
        an.join(gn, "mention_uid", "left")
        .join(correct, "mention_uid", "left")
        .select(
            (F.coalesce(F.col("ov"), F.lit(0)) / F.col("an")).alias("p"),
            F.when(
                F.col("gn").isNotNull(),
                F.coalesce(F.col("ov"), F.lit(0)) / F.col("gn"),
            ).otherwise(0.0).alias("r"),
        )
    )
    row = per.agg(F.avg("p").alias("p"), F.avg("r").alias("r")).collect()[0]
    p, r = row["p"] or 0.0, row["r"] or 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1}


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
