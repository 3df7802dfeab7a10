"""Evaluator math on hand-computable cases (reference:
latest/tools/evaluators.py re-derived, not copied)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from character_identification_spark.evaluation.pairf1 import (
    b_cubed,
    gold_pairs_from_mentions,
    pairwise_f1,
)


def test_gold_pairs_intra_block_with_ambiguous_carveout(spark):
    gold = spark.createDataFrame(
        [
            ("b1", 1, ["ross"]),
            ("b1", 2, ["ross"]),
            ("b1", 3, ["#other#"]),
            ("b1", 4, ["#other#"]),
            ("b2", 5, ["ross"]),
        ],
        "block_key string, mention_uid long, gold_refs array<string>",
    )
    pairs = {(r["m1"], r["m2"]): r["is_match"] for r in gold_pairs_from_mentions(gold).collect()}
    assert pairs[(1, 2)] is True
    # #other# never corefers with itself (reference: state.py:28-34)
    assert pairs[(3, 4)] is False
    # no cross-block pair at all
    assert (1, 5) not in pairs and (2, 5) not in pairs
    assert len(pairs) == 6  # 4C2 within b1


def test_pairwise_f1_hand_case(spark):
    gold_pairs = spark.createDataFrame(
        [(1, 2, True), (1, 3, True), (2, 3, True), (3, 4, False)],
        "m1 long, m2 long, is_match boolean",
    )
    # predicted: {1,2} together, 3 alone, 4 alone → tp=1 (1-2), fn=2, fp=0
    assignments = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 30), (4, 40)], "mention_uid long, cluster_id long"
    )
    ev = pairwise_f1(assignments, gold_pairs)
    assert (ev["tp"], ev["fp"], ev["fn"]) == (1, 0, 2)
    assert ev["precision"] == 1.0
    assert ev["recall"] == pytest.approx(1 / 3)


def test_b_cubed_hand_case(spark):
    # gold: {1,2} e1, {3} e2 ; predicted: {1,2,3} one cluster
    gold = spark.createDataFrame(
        [(1, "e1"), (2, "e1"), (3, "e2")], "mention_uid long, entity string"
    )
    assignments = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "mention_uid long, cluster_id long"
    )
    ev = b_cubed(assignments, gold)
    # P per mention: 2/3, 2/3, 1/3 → 5/9 ; R: 1,1,1 → 1
    assert ev["precision"] == pytest.approx(5 / 9)
    assert ev["recall"] == pytest.approx(1.0)


def test_blanc_pair_counting_equals_pair_join(spark):
    """The contract's sufficient-statistics Blanc (group sizes, no pair
    materialization) must equal the general pair-join evaluator on the
    same clustering — single block, singleton gold labels."""
    from character_identification_spark.driver_contract import q_eval_blanc
    from character_identification_spark.evaluation.coref import blanc
    from character_identification_spark.evaluation.pairf1 import (
        gold_pairs_from_mentions,
    )
    from character_identification_spark.operators.similarity import sign_lsh_bucket
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        F.col("label").cast("long").alias("label"),
    )
    assign = emb.select(
        F.col("vec_id").alias("mention_uid"),
        sign_lsh_bucket("embedding", F.size(F.col("embedding")), n_planes=4)
        .cast("string")
        .alias("cluster_id"),
    )
    gold = emb.select(
        F.lit("b0").alias("block_key"),
        F.col("vec_id").alias("mention_uid"),
        F.array(F.col("label").cast("string")).alias("gold_refs"),
    )
    general = blanc(assign, gold_pairs_from_mentions(gold))
    stats = q_eval_blanc(spark, sf).collect()[0]
    for k in ("p_coref", "r_coref", "f_coref", "p_non", "r_non", "f_non"):
        assert abs(round(general[k], 6) - stats[k]) < 2e-6, k
    assert abs(round(general["f1"], 6) - stats["blanc"]) < 2e-6
