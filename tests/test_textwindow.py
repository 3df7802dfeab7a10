"""W1/W2 token- and sentence-window features."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from character_identification_spark.operators.textwindow import (
    sentence_table,
    token_window_features,
)

DEV_JSON = "/root/reference/json/character-identification-dev.json"


@pytest.fixture()
def toy(spark):
    utt = spark.createDataFrame(
        [
            (
                "u1",
                [
                    ["I", "ca", "n't", "believe", "you", "said", "that", "."],
                    ["Short", "one", "."],
                ],
            )
        ],
        "utterance_id string, tokens array<array<string>>",
    )
    mentions = spark.createDataFrame(
        [
            ("m1", "u1", 0, 4, 5),  # "you": mid-sentence
            ("m2", "u1", 0, 0, 1),  # "I": sentence start
            ("m3", "u1", 1, 2, 3),  # ".": sentence end
        ],
        "mention_uid string, utterance_id string, sent_idx int, begin int, end int",
    )
    return utt, mentions


def test_windows_clip_at_sentence_bounds(spark, toy):
    utt, mentions = toy
    out = {r["mention_uid"]: r for r in
           token_window_features(mentions, utt, k=4).collect()}
    assert out["m1"]["span_tokens"] == ["you"]
    assert out["m1"]["prev_tokens"] == ["I", "ca", "n't", "believe"]
    assert out["m1"]["next_tokens"] == ["said", "that", "."]
    assert out["m2"]["prev_tokens"] == []
    assert out["m2"]["next_tokens"] == ["ca", "n't", "believe", "you"]
    assert out["m3"]["prev_tokens"] == ["Short", "one"]
    assert out["m3"]["next_tokens"] == []


@pytest.mark.skipif(not os.path.exists(DEV_JSON), reason="reference corpus absent")
def test_windows_on_reference_corpus(spark):
    """W1/W2 over the real dev set: every mention gets windows, spans
    reproduce the surface, window length ≤ k."""
    from character_identification_spark.fixtures.transcript import (
        read_transcript_utterances,
        transcript_gold_mentions,
    )

    utt = read_transcript_utterances(spark, DEV_JSON)
    gold = transcript_gold_mentions(utt)
    w = token_window_features(gold, utt, k=4)
    assert w.count() == gold.count()
    bad_span = w.filter(
        F.array_join("span_tokens", " ") != F.col("surface")
    ).count()
    assert bad_span == 0
    assert w.filter(
        (F.size("prev_tokens") > 4) | (F.size("next_tokens") > 4)
    ).count() == 0
    # sentence window (W2) always contains the span
    assert w.filter(F.size("sent_tokens") < F.size("span_tokens")).count() == 0


def test_sentence_table_shape(spark, toy):
    utt, _ = toy
    rows = sentence_table(utt).collect()
    assert len(rows) == 2
    assert rows[0]["sent_idx"] == 0 and rows[1]["sent_idx"] == 1
