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


def test_rrf_fuse_known_values(spark):
    from character_identification_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(20, 1), (40, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r for r in rrf_fuse(a, b, k=60, top_k=10).collect()}
    # doc 20: 1/62 + 1/61 ≈ 0.032522 → both-list docs outrank single-list
    assert out[20]["rank"] == 1
    assert out[20]["rrf_micros"] == round((1 / 62 + 1 / 61) * 1e6)
    assert out[10]["rrf_micros"] == round((1 / 61) * 1e6)
    # absent-list rank is preserved as null provenance
    assert out[10]["rank_semantic"] is None
    assert out[40]["rank_lexical"] is None
    # single-list ties (10 at 1/61 lex vs 40 at 1/62 sem) order by score
    assert out[10]["rank"] < out[40]["rank"]


def test_rrf_fuse_tiebreak_doc_id(spark):
    from character_identification_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(5, 1)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1)], "doc_id long, rank int")
    out = rrf_fuse(a, b, k=60, top_k=10).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [3, 5]
