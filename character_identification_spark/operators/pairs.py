"""Candidate-pair generation: the blocked self-join.

The reference enumerates all ordered intra-block mention pairs with nested
Python loops (reference: experiments/system.py:104-112, latest/tools/
batch.py:18-29). Here it is a single equi-join on block_key with an id
inequality — the one genuinely quadratic step of the pipeline, which is why
blocking.cap_block_sizes bounds block width before this join runs.

Shuffle discipline: the self-join runs on SKINNY rows (block_key + two
longs) and dedupes to one row per pair (min block_key — deterministic,
unlike dropDuplicates which keeps an arbitrary block); payload columns are
attached AFTER dedup with two key joins. At 10^12-doc scale the raw pair
fan-out is cap× the assignment count, so shuffling strings through it
would multiply shuffle bytes by the payload width for rows that mostly
collapse in the dedup.
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
    a = assign.select("block_key", F.col("mention_uid").alias("uid1"))
    b = assign.select("block_key", F.col("mention_uid").alias("uid2"))
    slim = (
        a.join(b, "block_key")
        .filter(F.col("uid1") < F.col("uid2"))
        .groupBy("uid1", "uid2")
        .agg(F.min("block_key").alias("block_key"))
    )
    m1 = mentions.select(
        F.col("mention_uid").alias("uid1"),
        *[F.col(c).alias(f"{c}_1") for c in payload_cols],
    )
    m2 = mentions.select(
        F.col("mention_uid").alias("uid2"),
        *[F.col(c).alias(f"{c}_2") for c in payload_cols],
    )
    return slim.join(m1, "uid1").join(m2, "uid2")
