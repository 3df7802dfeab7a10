"""Bloom semi-join reduction: no false negatives, sizing behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from character_identification_spark.operators.bloom import (
    bloom_contains,
    bloom_filter_words,
    bloom_semijoin_stats,
)


def test_bloom_no_false_negatives(spark):
    # Every inserted key MUST pass the membership test — the Bloom
    # guarantee the semi-join reduction depends on.
    keys = spark.createDataFrame([(i * 7 + 3,) for i in range(50)], "k long")
    words = bloom_filter_words(keys, "k", m_bits=128, g=3)
    missed = keys.filter(~bloom_contains(F.col("k"), words, m_bits=128, g=3)).count()
    assert missed == 0


def test_bloom_words_shape_and_determinism(spark):
    keys = spark.createDataFrame([(i,) for i in range(20)], "k long")
    a = bloom_filter_words(keys, "k", m_bits=256, g=2)
    b = bloom_filter_words(keys, "k", m_bits=256, g=2)
    assert a == b
    assert len(a) == 256 // 32
    assert any(w != 0 for w in a)


def test_bloom_semijoin_stats_invariants(spark):
    build = spark.createDataFrame([(i,) for i in range(10)], "k long")
    probe = spark.createDataFrame(
        [(i % 200,) for i in range(1000)], "pk long"
    )
    row = bloom_semijoin_stats(build, probe, "k", "pk", m_bits=64, g=2).collect()[0]
    assert row["n_build_keys"] == 10
    assert row["n_probe_rows"] == 1000
    assert row["n_true"] == 50  # keys 0..9 each appear 5× in 0..199 cycled
    assert row["n_pass"] >= row["n_true"]  # no false negatives
    assert row["n_false_pos"] == row["n_pass"] - row["n_true"]


def test_bloom_more_bits_fewer_false_positives(spark):
    build = spark.createDataFrame([(i,) for i in range(30)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(2000)], "pk long")

    def fp(m_bits):
        r = bloom_semijoin_stats(build, probe, "k", "pk", m_bits=m_bits,
                                 g=3).collect()[0]
        return r["n_false_pos"]

    assert fp(2048) <= fp(128)


def test_bloom_null_keys_safe(spark):
    # Null build keys are ignored; a null probe key is never a member
    # (False, not null — it must not leak through a NOT filter either).
    keys = spark.createDataFrame([(1,), (None,), (2,)], "k long")
    words = bloom_filter_words(keys, "k", m_bits=64, g=2)
    probe = spark.createDataFrame([(1,), (None,), (99,)], "pk long")
    passed = probe.filter(bloom_contains(F.col("pk"), words, m_bits=64, g=2))
    failed = probe.filter(~bloom_contains(F.col("pk"), words, m_bits=64, g=2))
    assert passed.count() + failed.count() == 3
    assert (1,) in {tuple(r) for r in passed.collect()}
    assert (None,) in {tuple(r) for r in failed.collect()}
