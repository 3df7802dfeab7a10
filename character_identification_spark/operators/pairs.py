"""Candidate-pair generation: the blocked self-join.

The reference enumerates all ordered intra-block mention pairs with nested
Python loops (reference: experiments/system.py:104-112, latest/tools/
batch.py:18-29). Here it is a single equi-join on block_key with an id
inequality — the one genuinely quadratic step of the pipeline, which is why
blocking.cap_block_sizes bounds block width before this join runs.

Pairs appearing in several shared blocks are deduped with a groupBy (not
dropDuplicates on the full row, which would keep an arbitrary block) so the
provenance column is deterministic (min block_key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def generate_pairs(
    mentions: DataFrame,
    assign: DataFrame,
    payload_cols: tuple[str, ...] = ("norm", "surface"),
) -> DataFrame:
    """mentions(mention_uid, …payload) × assign(mention_uid, block_key) →
    pairs(uid1, uid2, block_key, <payload>_1, <payload>_2) with uid1 < uid2.
    """
    keyed = assign.join(
        mentions.select("mention_uid", *payload_cols), "mention_uid"
    )
    a = keyed.select(
        F.col("block_key"),
        F.col("mention_uid").alias("uid1"),
        *[F.col(c).alias(f"{c}_1") for c in payload_cols],
    )
    b = keyed.select(
        F.col("block_key"),
        F.col("mention_uid").alias("uid2"),
        *[F.col(c).alias(f"{c}_2") for c in payload_cols],
    )
    pairs = a.join(b, ["block_key"]).filter(F.col("uid1") < F.col("uid2"))
    # a pair found via several blocks collapses to one row, min block_key;
    # payload columns are identical across a pair's rows, so min() (not
    # first(), which is order-dependent) keeps the output deterministic
    keep = [c for c in pairs.columns if c not in ("block_key", "uid1", "uid2")]
    return pairs.groupBy("uid1", "uid2").agg(
        F.min("block_key").alias("block_key"),
        *[F.min(c).alias(c) for c in keep],
    )
