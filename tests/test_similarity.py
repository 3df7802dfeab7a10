"""Similarity search: exact top-k baseline + LSH recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from character_identification_spark.operators.similarity import (
    ann_topk,
    cosine_topk,
    sign_lsh_bucket,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(0)
    vecs = rng.randn(60, 8).astype(np.float32)
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in rows}
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cos_sim"]))
    for q in range(3):
        qv = vecs[q]
        sims = {
            i: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
            for i, v in vecs.items()
            if i != q
        }
        expect = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        ours = sorted(by_q[q])
        assert [n for _, n, _ in ours] == [i for i, _ in expect]
        for (_, _, s), (_, es) in zip(ours, expect):
            assert s == pytest.approx(es, abs=1e-5)


def test_sign_lsh_bucket_deterministic(spark, emb):
    a = sorted(
        map(
            tuple,
            emb.select("vec_id", sign_lsh_bucket("embedding", F.lit(8), 6).alias("b")).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            emb.repartition(5)
            .select("vec_id", sign_lsh_bucket("embedding", F.lit(8), 6).alias("b"))
            .collect(),
        )
    )
    assert a == b
    assert all(0 <= x[1] < 64 for x in a)


def test_ann_topk_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, queries, k=3).collect()
    approx = ann_topk(emb, queries, k=3, n_planes=4, n_tables=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, recall  # multi-table LSH at 8 dims: moderate bar
    # every reported sim must still be exact (rerank is exact)
    by_pair = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in by_pair:
            assert r["cos_sim"] == pytest.approx(by_pair[key], abs=1e-6)
