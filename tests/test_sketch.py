"""Sketches: HyperLogLog estimate quality + Count-Min guarantees."""

from __future__ import annotations

from pyspark.sql import functions as F

from character_identification_spark.operators.sketch import (
    HLL_M,
    cms_frequencies,
    hll_distinct,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_hll_estimate_within_standard_error(spark):
    # 500 distinct tokens, one group. HLL standard error at m=256 is
    # 1.04/sqrt(256) ≈ 6.5%; assert a loose 3-sigma band.
    text = " ".join(f"tok{i}" for i in range(500))
    out = hll_distinct(_docs(spark, [(1, "en", text)])).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_registers"] == HLL_M
    assert abs(r["est_distinct"] - 500) / 500 < 0.20
    # duplicated input must not move a distinct-count sketch at all
    out2 = hll_distinct(_docs(spark, [(1, "en", text), (2, "en", text)]))
    r2 = out2.collect()[0]
    assert r2["reg_digest"] == r["reg_digest"]
    assert r2["est_distinct"] == r["est_distinct"]


def test_hll_small_range_linear_counting(spark):
    # 3 distinct tokens → small-range branch (most registers empty);
    # linear counting is near-exact here.
    out = hll_distinct(_docs(spark, [(1, "en", "a b c a b")])).collect()[0]
    assert out["zero_registers"] == HLL_M - 3
    assert abs(out["est_distinct"] - 3) < 0.1


def test_hll_groups_independent(spark):
    rows = [(1, "en", " ".join(f"e{i}" for i in range(40))), (2, "fr", "x y")]
    out = {r["lang"]: r for r in hll_distinct(_docs(spark, rows)).collect()}
    assert set(out) == {"en", "fr"}
    assert out["fr"]["zero_registers"] == HLL_M - 2
    assert out["en"]["est_distinct"] > out["fr"]["est_distinct"]


def test_cms_never_undercounts_and_is_exact_without_collisions(spark):
    # 3 tokens with known multiplicities; w=1024 on a 4-token vocab →
    # collisions essentially impossible across all 4 rows, so the min
    # readout is exact; an absent probe reads 0 unless it collides in
    # EVERY row (assert the one-sided CM guarantee only).
    text = " ".join(["alpha"] * 7 + ["beta"] * 3 + ["gamma"] * 1)
    docs = _docs(spark, [(1, "en", text)]).select("doc_id", "text")
    out = {
        r["token"]: r["est_count"]
        for r in cms_frequencies(docs, ["alpha", "beta", "gamma", "absent"]).collect()
    }
    assert out["alpha"] >= 7 and out["beta"] >= 3 and out["gamma"] >= 1
    assert out["alpha"] == 7 and out["beta"] == 3 and out["gamma"] == 1
    assert out["absent"] >= 0


def test_cms_narrow_width_overcounts_only(spark):
    # Force collisions with width=2: estimates may exceed truth but
    # never fall below it, and column sums per row equal the stream
    # length (mass conservation).
    text = " ".join(["a"] * 5 + ["b"] * 4 + ["c"] * 3)
    docs = _docs(spark, [(1, "en", text)]).select("doc_id", "text")
    out = {
        r["token"]: r["est_count"]
        for r in cms_frequencies(docs, ["a", "b", "c"], depth=2, width=2).collect()
    }
    assert out["a"] >= 5 and out["b"] >= 4 and out["c"] >= 3
    assert max(out.values()) <= 12  # never exceeds total stream mass
