"""The Friends-transcript eval harness — the north-rule quality oracle run
on the REAL reference corpus (/root/reference/json/*.json), not synthetic
fixtures. Executes the adapter (SURVEY §2 S1-S4, F1-F3), the scene-scoped
deterministic linker, and the full evaluator suite; the committed
measurements live in BASELINE.md.

Honest gate: pairwise F1 ≥ 0.76 on dev (measured 0.7604, stable across
rounds 3-4; rules-only round 2: 0.7430) — still far below the 0.99
aspiration, because ~60% of real mentions are pronouns; the
deterministic logistic scorer (plans/coref_scorer.py) recovers part of
what the reference's CNN learns. Round 4 adds the M5 learned plural
membership gate (multi-membership pairwise F1 0.8083 → 0.8202 dev) and
the lexical-context/episode-prior feature ablations — the singular
heads' dev argmax keeps them masked (BASELINE.md round-4 table). All
gates re-derived from the committed measurement run, never loosened ad
hoc.
"""

from __future__ import annotations

import itertools
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from character_identification_spark.evaluation.coref import (
    blanc,
    ceaf_e,
    hungarian_max,
    linking_macro_f1,
)
from character_identification_spark.evaluation.pairf1 import (
    gold_pairs_from_mentions,
    pairwise_f1,
)
from character_identification_spark.fixtures.transcript import (
    read_transcript_utterances,
    transcript_gold_mentions,
)
from character_identification_spark.plans.transcript_link import (
    link_transcript_mentions,
    match_names_to_cast,
    speaker_context,
)

DEV_JSON = "/root/reference/json/character-identification-dev.json"

needs_ref = pytest.mark.skipif(
    not os.path.exists(DEV_JSON), reason="reference corpus not mounted"
)


@pytest.fixture(scope="module")
def dev(spark):
    utt = read_transcript_utterances(spark, DEV_JSON)
    gold = transcript_gold_mentions(utt).cache()
    gold.count()
    return utt, gold


@needs_ref
def test_adapter_parses_reference_schema(dev):
    utt, gold = dev
    assert utt.count() == 2142  # dev utterances
    assert gold.count() == 3932  # dev mentions after Non-Entity filter
    assert gold.filter("plural").count() == 415
    # plural coarsening: every plural label is either #other# or a label
    # that appears on some singular mention of the same scene
    sing = (
        gold.filter(~F.col("plural"))
        .select("block_key", F.explode("gold_refs").alias("l"))
        .distinct()
    )
    plur = (
        gold.filter("plural")
        .select("block_key", F.explode("gold_refs").alias("l"))
        .filter(F.col("l") != "#other#")
        .distinct()
    )
    assert plur.join(sing, ["block_key", "l"], "left_anti").count() == 0


@needs_ref
def test_speaker_context_windows(dev):
    utt, _ = dev
    ctx = speaker_context(utt).filter(F.col("scene_id") == "s01_e20_c01")
    rows = {r["utt_idx"]: r for r in ctx.collect()}
    # first utterance has no previous distinct speaker
    assert rows[0]["prev_spk"] is None
    assert rows[0]["next_spk"] is not None
    # alternating dialogue: prev distinct speaker differs from own
    for r in rows.values():
        if r["prev_spk"] is not None:
            assert r["prev_spk"] != r["spk"]


@needs_ref
def test_name_matching_families(spark, dev):
    utt, _ = dev
    from character_identification_spark.plans.transcript_link import cast_table

    cast = cast_table(utt)
    probe = spark.createDataFrame(
        [(1, "ross geller"), (2, "ross"), (3, "rach"), (4, "geller"), (5, "xqzt")],
        "mention_uid long, norm string",
    )
    got = {r["mention_uid"]: r["cast_ref"] for r in
           match_names_to_cast(probe, cast).collect()}
    assert got[1] == "ross geller"  # exact
    assert got[2] == "ross geller"  # unique containment
    assert got[3] == "rachel green"  # unique first-token prefix
    assert got.get(4) is None  # ambiguous containment (two gellers)
    assert 5 not in got or got[5] is None  # no family fires


@needs_ref
def test_dev_harness_pairwise_gate(dev):
    utt, gold = dev
    assign = link_transcript_mentions(utt, gold)
    ev = pairwise_f1(assign, gold_pairs_from_mentions(gold))
    assert ev["precision"] >= 0.87  # measured 0.8753 (nominal heads trade
    # a little pool precision for +0.006 F1 — the north metric)
    assert ev["f1"] >= 0.76  # measured 0.7604 — see BASELINE.md


@needs_ref
def test_dev_full_evaluator_suite(dev):
    utt, gold = dev
    assign = link_transcript_mentions(utt, gold).cache()
    gp = gold_pairs_from_mentions(gold)
    bl = blanc(assign, gp)
    # the coreferent cell of Blanc IS pairwise F1 — same confusion cell
    pw = pairwise_f1(assign, gp)
    assert abs(bl["f_coref"] - pw["f1"]) < 1e-9
    assert bl["f1"] >= 0.83  # measured 0.8327
    ce = ceaf_e(assign, gold)
    assert 0.55 <= ce["f1"] <= 1.0  # measured 0.6178 (round 2: 0.6344 —
    # pseudo-label clusters trade CEAF for the north pairwise metric)
    mac = linking_macro_f1(assign, gold)
    assert mac["f1"] >= 0.76  # measured 0.7665 pooled auto_refs view
    assign.unpersist()


@needs_ref
def test_learned_linker_plan_is_python_free(dev):
    """The learned decode is inlined literal weights in Catalyst
    expressions — the WHOLE linker plan (scorer included) must contain
    no Python evaluation nodes and only the scene-window/cast-join
    shuffles the rule linker already had."""
    import io
    from contextlib import redirect_stdout

    utt, gold = dev
    df = link_transcript_mentions(utt, gold)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="simple")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


@needs_ref
def test_linking_head_hybrid_gate(dev):
    """M4 learned linking head (reference linking.py:26-80 analog): on
    the coarsened linking task (main six + '#other#', the reference's F4
    setup) the HYBRID — rule labels where resolved, softmax head for the
    clusters the rules leave unresolved — must beat the rules alone.
    Measured (BASELINE.md round 4, nominal-aware clusters + the M5
    plural gate in the pooled view, 'nom' in the kind-fraction block):
    hybrid 0.8497 dev / 0.8286 tst vs pooled-rules 0.8117/0.7852.
    Gates = measured − margin."""
    from character_identification_spark.plans.linking_head import hybrid_link

    utt, gold = dev
    vocab = ("rachel green", "ross geller", "chandler bing",
             "monica geller", "joey tribbiani", "phoebe buffay")
    assign = link_transcript_mentions(utt, gold, label_vocab=vocab).cache()
    gold_c = gold.withColumn(
        "gold_refs",
        F.array_distinct(
            F.transform(
                "gold_refs",
                lambda x: F.when(x.isin(*vocab), x).otherwise(F.lit("#other#")),
            )
        ),
    )
    rules = linking_macro_f1(assign, gold_c, auto_refs_col="auto_ref")
    hyb = linking_macro_f1(
        hybrid_link(assign, gold), gold_c, auto_refs_col="auto_ref"
    )
    assert rules["f1"] >= 0.78, rules  # measured 0.7855
    assert hyb["f1"] >= 0.84, hyb      # measured 0.8487
    assert hyb["f1"] > rules["f1"]
    assign.unpersist()


@needs_ref
def test_ceaf_perfect_on_gold_replay(spark, dev):
    """CEAF-e must be exactly 1.0 when auto == gold clusters (replay the
    singular gold as assignments)."""
    _, gold = dev
    from character_identification_spark.evaluation.pairf1 import AMBIGUOUS

    lbl = F.element_at("gold_refs", 1)
    sing = gold.filter(~F.col("plural")).select(
        "mention_uid",
        "block_key",
        F.concat(
            "block_key",
            F.lit("|"),
            # ambiguous labels never co-refer — singleton per mention,
            # mirroring _gold_cluster_rows
            F.when(
                lbl.isin(*AMBIGUOUS), F.col("mention_uid").cast("string")
            ).otherwise(lbl),
        ).alias("cluster_id"),
    )
    sing_gold = gold.filter(~F.col("plural"))
    ce = ceaf_e(sing, sing_gold)
    assert abs(ce["f1"] - 1.0) < 1e-9


def test_hungarian_matches_brute_force():
    rng = np.random.default_rng(7)
    for _ in range(60):
        n, m = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        s = rng.random((n, m))
        k = min(n, m)
        best = 0.0
        for rsub in itertools.permutations(range(n), k):
            for csub in itertools.permutations(range(m), k):
                best = max(best, sum(s[rsub[i], csub[i]] for i in range(k)))
        assert abs(hungarian_max(s) - best) < 1e-9


@needs_ref
def test_plural_multi_membership(spark, dev):
    """M5: plural mentions ("we") carry a label SET — speaker AND
    addressee — and membership_rows emits one cluster row per label."""
    from character_identification_spark.plans.transcript_link import membership_rows
    from character_identification_spark.evaluation.pairf1 import pairwise_f1_multi

    utt, gold = dev
    assign = link_transcript_mentions(utt, gold).cache()
    ppl = assign.filter(F.col("kind") == "ppl")
    assert ppl.count() > 200
    # plurals with a known addressee have ≥ 2 memberships
    assert ppl.filter(F.size("auto_refs") >= 2).count() > 100
    mem = membership_rows(assign)
    # every mention keeps at least one membership row
    assert mem.select("mention_uid").distinct().count() == assign.count()
    # exploded rows exceed mentions (the plural fan-out)
    assert mem.count() > assign.count()
    # multi-membership scoring consumes the label sets end-to-end; the
    # extra addressee edges trade precision for recall around the same F1
    ev = pairwise_f1_multi(mem, gold_pairs_from_mentions(gold))
    # measured 0.8202 with the round-4 M5 learned plural gate (τ=0.925
    # dev argmax; rules-only 0.8083; round 2 gate: 0.70) — see BASELINE.md
    # for the split-half CV and the held-out tst numbers
    assert ev["f1"] >= 0.81
    assign.unpersist()


def test_b_cubed_multi_reference_semantics(spark):
    """Hand-computed reference check (evaluators.py:38-58): gold clusters
    {a,b},{b,c}; auto {a,b,c}. Mention b aggregates the union of both its
    gold clusters."""
    from character_identification_spark.evaluation.pairf1 import b_cubed_multi

    auto = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x")], "mention_uid string, cluster_id string"
    )
    gold = spark.createDataFrame(
        [("a", "g1"), ("b", "g1"), ("b", "g2"), ("c", "g2")],
        "mention_uid string, entity string",
    )
    out = b_cubed_multi(auto, gold)
    # per reference math: agg_gold(a)={a,b}, agg_gold(b)={a,b,c},
    # agg_gold(c)={b,c}; agg_auto(*)={a,b,c}
    # p = (2/3 + 3/3 + 2/3)/3 = 7/9 ; r = (2/2 + 3/3 + 2/2)/3 = 1
    assert abs(out["precision"] - 7 / 9) < 1e-9
    assert abs(out["recall"] - 1.0) < 1e-9


@needs_ref
def test_f4_label_vocab_coarsening(spark, dev):
    """F4 (reference system.py:189-193): predictions outside the label
    vocabulary collapse to '#other#' — and '#other#' never forms a
    cluster."""
    utt, gold = dev
    vocab = ("rachel green", "ross geller", "chandler bing",
             "monica geller", "joey tribbiani", "phoebe buffay")
    assign = link_transcript_mentions(utt, gold, label_vocab=vocab).cache()
    labels = {r["auto_ref"] for r in
              assign.select("auto_ref").distinct().collect()}
    assert labels <= set(vocab) | {"#other#", None}
    assert assign.filter(F.col("auto_ref") == "#other#").count() > 0
    # coarsening touches the LINKING label only — clustering is invariant
    base = link_transcript_mentions(utt, gold)
    diff = (
        assign.select("mention_uid", "cluster_id")
        .exceptAll(base.select("mention_uid", "cluster_id"))
        .count()
    )
    assert diff == 0
    assign.unpersist()
