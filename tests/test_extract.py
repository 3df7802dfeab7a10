"""Byte-identity invariant of the HTML extractor (BASELINE.json
input_hint: byte-identical extracted text per url vs the generator)."""

from __future__ import annotations

from pyspark.sql import functions as F

from character_identification_spark.ingest.extract import (
    extract_text,
    extracted_pages,
    wrap_html,
)

TRICKY = [
    "plain text",
    "has & ampersand < less > greater",
    "pre-escaped &amp; stays &lt;literal&gt;",
    "unicode: café — naïve 中文",
    "",
    "nested <article>inner</article> tags",
    "double && and <<>> runs &amp;&amp;",
]


def test_round_trip_byte_identical(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TRICKY)], "i int, text string")
    out = (
        df.withColumn("html", wrap_html(F.col("text")))
        .withColumn("back", extract_text(F.col("html")))
        .select("i", "text", "back")
        .collect()
    )
    for row in out:
        assert row["back"] == row["text"], f"row {row['i']}: {row['back']!r} != {row['text']!r}"
        assert row["back"].encode("utf-8") == row["text"].encode("utf-8")


def test_extracted_pages_filters_lang_and_projects(spark):
    df = spark.createDataFrame(
        [("u1", "hello world", "en"), ("u2", "hallo welt", "de")],
        "url string, text string, lang string",
    ).withColumn("warc_ts", F.current_timestamp()).withColumn(
        "html", wrap_html(F.col("text"))
    )
    out = extracted_pages(df, keep_lang="en")
    rows = out.collect()
    assert [r["url"] for r in rows] == ["u1"]
    assert rows[0]["text"] == "hello world"
    assert set(out.columns) == {"url", "warc_ts", "text", "lang"}

    all_rows = extracted_pages(df, keep_lang=None).count()
    assert all_rows == 2
