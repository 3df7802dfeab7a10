"""Blocking: shingles, MinHash determinism, recall of the LSH family,
and the skew cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from character_identification_spark.operators.blocking import (
    assign_blocks,
    cap_block_sizes,
    char_shingles,
    minhash_lsh_blocks,
    sortkey_blocks,
)


def _mentions(spark, names):
    return spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "mention_uid long, norm string"
    )


def test_char_shingles(spark):
    df = spark.createDataFrame([("abcd",), ("ab",), ("aaaa",)], "norm string")
    out = {tuple(r["sh"]) for r in df.select(char_shingles("norm", 3).alias("sh")).collect()}
    assert ("abc", "bcd") in out
    assert ("ab",) in out  # shorter-than-n string → itself
    assert ("aaa",) in out  # distinct dedups repeats


def test_minhash_identical_strings_share_all_bands(spark):
    m = _mentions(spark, ["ross geller", "ross geller"])
    blocks = minhash_lsh_blocks(m, n_gram=3, num_hashes=12, band_size=2)
    per_key = blocks.groupBy("block_key").agg(F.countDistinct("mention_uid").alias("n"))
    assert per_key.filter(F.col("n") != 2).count() == 0


def test_minhash_similar_strings_share_some_band(spark):
    m = _mentions(spark, ["ross geller", "ross gellar", "zzzz qqqq"])
    blocks = minhash_lsh_blocks(m, n_gram=3, num_hashes=12, band_size=2)
    keys = blocks.groupBy("block_key").agg(F.collect_set("mention_uid").alias("ms"))
    together = keys.filter(
        F.array_contains("ms", 0) & F.array_contains("ms", 1)
    ).count()
    apart = keys.filter(
        F.array_contains("ms", 2) & (F.size("ms") > 1)
    ).count()
    assert together >= 1  # typo pair lands in a shared band
    assert apart == 0  # dissimilar string blocks alone


def test_minhash_deterministic_across_runs(spark):
    m = _mentions(spark, ["ross geller", "monica bing", "joey tribbiani"]).repartition(4)
    a = sorted(map(tuple, minhash_lsh_blocks(m).collect()))
    b = sorted(map(tuple, minhash_lsh_blocks(m.repartition(2)).collect()))
    assert a == b


def test_sortkey_blocks_prefix_and_phonetic(spark):
    m = _mentions(spark, ["ross geller", "ross gellar", "russ geller"])
    keys = sortkey_blocks(m, prefix_len=4).collect()
    by_m = {}
    for r in keys:
        by_m.setdefault(r["mention_uid"], set()).add(r["block_key"])
    # same prefix for the typo pair
    assert by_m[0] & by_m[1]
    # phonetic key unites ross/russ
    assert any(k.startswith("sx:") for k in by_m[0] & by_m[2])


def test_cap_block_sizes_bounds_width(spark):
    rows = [(i, "hot") for i in range(100)] + [(1000 + i, "cold") for i in range(5)]
    assign = spark.createDataFrame(rows, "mention_uid long, block_key string")
    capped = cap_block_sizes(assign, max_block_size=20)
    sizes = capped.groupBy("block_key").count().collect()
    hot = [r for r in sizes if r["block_key"].startswith("hot#")]
    cold = [r for r in sizes if r["block_key"] == "cold"]
    assert sum(r["count"] for r in hot) == 100
    assert all(r["count"] <= 20 for r in hot)  # strict cap: 5 salts × 20
    assert cold[0]["count"] == 5  # under-cap key untouched


def test_assign_blocks_deterministic_under_parallelism(spark):
    m = _mentions(spark, [f"name {i:03d}" for i in range(40)])
    a = sorted(map(tuple, assign_blocks(m.repartition(8)).collect()))
    b = sorted(map(tuple, assign_blocks(m.repartition(1)).collect()))
    assert a == b
