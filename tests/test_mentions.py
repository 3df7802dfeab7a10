"""Mention extraction from raw text."""

from __future__ import annotations

from pyspark.sql import functions as F

from character_identification_spark.ingest.mentions import extract_mentions


def test_extract_mentions_spans_and_norms(spark):
    text = "yesterday Ross Geller met R. Greene near the fountain with Monica"
    pages = spark.createDataFrame([("u1", text)], "url string, text string")
    rows = sorted(
        extract_mentions(pages).collect(), key=lambda r: r["begin"]
    )
    surfaces = [r["surface"] for r in rows]
    assert surfaces == ["Ross Geller", "R. Greene", "Monica"]
    norms = [r["norm"] for r in rows]
    assert norms == ["ross geller", "r greene", "monica"]
    for r in rows:
        assert text[r["begin"]:r["end"]] == r["surface"]


def test_mention_uid_stable_and_unique(spark):
    pages = spark.createDataFrame(
        [("u1", "Ross met Monica"), ("u2", "Ross met Monica")],
        "url string, text string",
    )
    m = extract_mentions(pages)
    assert m.count() == 4
    assert m.select("mention_uid").distinct().count() == 4
    again = extract_mentions(pages)
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, again.collect()))
