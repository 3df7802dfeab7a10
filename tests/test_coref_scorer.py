"""Unit tests for the learned antecedent scorer (plans/coref_scorer.py):
candidate construction, feature semantics, pseudo-label flagging, and the
τ-thresholded argmax decode — on a tiny hand-built scene so every
expectation is checkable by eye."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from character_identification_spark.plans.coref_scorer import FEATURES, learned_best
from character_identification_spark.plans.transcript_link import (
    enriched_mention_table,
    with_antecedent_candidates,
)


@pytest.fixture(scope="module")
def toy(spark):
    utt = spark.createDataFrame(
        [
            Row(scene_id="s1", utterance_id="u0", utt_idx=0,
                speakers=["Monica Geller"]),
            Row(scene_id="s1", utterance_id="u1", utt_idx=1,
                speakers=["Rachel Green"]),
            Row(scene_id="s1", utterance_id="u2", utt_idx=2,
                speakers=["Monica Geller"]),
        ]
    )
    mentions = spark.createDataFrame(
        [
            # u0 names the cast member "rachel green" (exact) and the
            # never-speaking "Heckles" (no cast row → pseudo event)
            Row(mention_uid=1, utterance_id="u0", sent_idx=0, begin=0,
                surface="Rachel Green", block_key="s1"),
            Row(mention_uid=2, utterance_id="u0", sent_idx=0, begin=3,
                surface="Heckles", block_key="s1"),
            # u1: the pronoun under test
            Row(mention_uid=3, utterance_id="u1", sent_idx=0, begin=1,
                surface="he", block_key="s1"),
            # u2: a future (cataphoric) cast naming
            Row(mention_uid=4, utterance_id="u2", sent_idx=0, begin=0,
                surface="Monica", block_key="s1"),
        ]
    )
    m = with_antecedent_candidates(enriched_mention_table(utt, mentions))
    return {r["mention_uid"]: r for r in m.collect()}


def _w(**kv) -> list[float]:
    w = [0.0] * len(FEATURES)
    for k, v in kv.items():
        w[FEATURES.index(k)] = v
    return w


def test_candidate_structure_and_pseudo_flags(toy):
    pron = toy[3]
    assert pron["kind"] == "p3m"
    cands = {c["ref"]: c for c in pron["cands"]}
    # named cast member, unmatched surface, both speakers, future naming
    assert set(cands) == {
        "rachel green", "heckles", "monica geller",
    }, sorted(cands)
    assert cands["heckles"]["pseudo"] == 1.0
    assert cands["rachel green"]["pseudo"] == 0.0
    assert cands["monica geller"]["pseudo"] == 0.0
    fs = {r: dict(zip(FEATURES, c["fs"])) for r, c in cands.items()}
    # rachel green was named (event src 0) and is the current speaker
    assert fs["rachel green"]["was_named"] == 1.0
    assert fs["rachel green"]["is_spk"] == 1.0
    assert fs["rachel green"]["g_match"] == 0.0  # f vs p3m
    # heckles: named only as a pseudo surface; gender unknown
    assert fs["heckles"]["was_named"] == 1.0
    assert fs["heckles"]["g_unknown"] == 1.0
    # monica geller: prev distinct speaker, not yet named in the past,
    # but named in the FUTURE (cataphora)
    assert fs["monica geller"]["was_named"] == 0.0
    assert fs["monica geller"]["is_prev"] == 1.0
    assert fs["monica geller"]["fut_named"] == 1.0
    assert fs["monica geller"]["log_fut_mdist"] > 0.0


def test_learned_best_argmax_and_tau(spark, toy):
    pron = toy[3]
    df = spark.createDataFrame([Row(cands=[
        Row(ref=c["ref"], pseudo=c["pseudo"], fs=list(c["fs"]))
        for c in pron["cands"]
    ])])

    def pick(weights, tau):
        r = df.select(learned_best("cands", weights, tau).alias("b")).collect()[0]["b"]
        return None if r is None else (r["ref"], r["pseudo"])

    # weight only the prev-speaker indicator → monica geller wins
    assert pick(_w(bias=0.0, is_prev=3.0), 0.5) == ("monica geller", 0.0)
    # weight only the pseudo indicator → heckles wins, flagged pseudo
    assert pick(_w(pseudo=5.0), 0.5) == ("heckles", 1.0)
    # τ above every sigmoid → unresolved (the 'new cluster' outcome)
    assert pick(_w(is_prev=3.0), 0.999) is None
    # all-zero weights: every candidate scores 0.5 — tie breaks to the
    # lexicographically first label, deterministically
    assert pick([0.0] * len(FEATURES), 0.5) == ("heckles", 1.0)


def test_learned_members_multilabel_gate(spark, toy):
    """M5 plural gate (learned_members): a SET decode — every real
    candidate clearing τ is a member; pseudo surfaces never are
    (reference linking_joint.py:71-91, per-label sigmoid ≥ threshold)."""
    from character_identification_spark.plans.coref_scorer import learned_members

    pron = toy[3]
    df = spark.createDataFrame([Row(cands=[
        Row(ref=c["ref"], pseudo=c["pseudo"], fs=list(c["fs"]))
        for c in pron["cands"]
    ])])

    def members(weights, tau):
        r = df.select(learned_members("cands", weights, tau).alias("m")).collect()
        return sorted(r[0]["m"])

    # zero weights → every sigmoid is 0.5: τ at 0.5 admits all REAL
    # candidates (heckles is pseudo → excluded even though it scores 0.5)
    assert members([0.0] * len(FEATURES), 0.5) == [
        "monica geller", "rachel green",
    ]
    # τ just above 0.5 → empty set (the gate is conservative by default)
    assert members([0.0] * len(FEATURES), 0.51) == []
    # weight the prev-speaker indicator → only monica clears a high τ
    assert members(_w(is_prev=3.0), 0.9) == ["monica geller"]
    # a huge pseudo weight still cannot admit a pseudo surface
    assert members(_w(pseudo=9.0), 0.5) == [
        "monica geller", "rachel green",
    ]
