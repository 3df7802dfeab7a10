"""BM25 retrieval operator (operators/search.py)."""

from __future__ import annotations

import math

from character_identification_spark.operators.search import bm25_search


def test_bm25_known_value(spark):
    """Hand-computed BM25 on a 3-doc corpus; tf and length effects rank
    as the formula dictates."""
    docs = spark.createDataFrame(
        [
            (0, "spark spark spark engine"),       # tf=3, dl=4
            (1, "spark engine engine engine"),     # tf=1, dl=4
            (2, "other words only here"),          # no hit
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_search(docs, ["spark"], k=10).collect()}
    assert set(out) == {0, 1}  # doc 2 never matches
    assert out[0]["rank"] == 1 and out[1]["rank"] == 2
    # exact value: N=3, df=2, idf=ln((3-2+0.5)/(2+0.5)+1), avgdl=4, dl=4
    idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    for tf, did in ((3, 0), (1, 1)):
        expect = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * 1.0))
        assert abs(out[did]["score"] - round(expect, 6)) < 1e-9
        assert out[did]["n_terms_hit"] == 1


def test_bm25_multi_term_and_coordination(spark):
    docs = spark.createDataFrame(
        [
            (0, "spark vector spark vector"),  # both terms
            (1, "spark spark spark spark"),    # one term, high tf
            (2, "vector"),                     # one term, short doc
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           bm25_search(docs, ["spark", "vector"], k=10).collect()}
    assert out[0]["n_terms_hit"] == 2
    assert out[1]["n_terms_hit"] == 1 and out[2]["n_terms_hit"] == 1
    # the doc hitting both terms outranks single-term docs here
    assert out[0]["rank"] == 1


def test_bm25_topk_plan_has_no_global_rank_exchange(spark):
    """The global top-k must compile to TakeOrderedAndProject (per-
    partition top-k + driver merge), not a single-partition rank window."""
    docs = spark.createDataFrame(
        [(i, "spark engine") for i in range(20)], "doc_id long, text string"
    )
    plan = bm25_search(docs, ["spark"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
