"""Curation operators: URL canonicalization/dedup, repetition stats,
PII scrubbing, keep-best-per-cluster selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from character_identification_spark.operators.curation import (
    canonical_url,
    keep_best_per_cluster,
    pii_scrub,
    repetition_stats,
    url_dedup,
)


def _canon_one(spark, url: str) -> str:
    return (
        spark.range(1).select(canonical_url(F.lit(url)).alias("c")).collect()[0]["c"]
    )


def test_canonical_url_rules(spark):
    cases = {
        # scheme+host lowering, www and default-port stripping
        "HTTPS://WWW.Example.COM:443/A/b": "https://example.com/A/b",
        "http://Example.Com:80/x": "http://example.com/x",
        # non-default port survives
        "https://example.com:8443/x": "https://example.com:8443/x",
        # fragment removed, trailing slash trimmed
        "https://example.com/a/#frag": "https://example.com/a",
        # tracking params removed; '?' re-promoted when the first param dies
        "https://example.com/a?utm_source=x&id=2": "https://example.com/a?id=2",
        "https://example.com/a?id=2&utm_campaign=y&fbclid=z": "https://example.com/a?id=2",
        "https://example.com/a?gclid=j": "https://example.com/a",
        # path case preserved (identity-bearing)
        "https://example.com/Docs/X": "https://example.com/Docs/X",
    }
    for raw, want in cases.items():
        assert _canon_one(spark, raw) == want, raw


def test_url_dedup_groups(spark):
    rows = [
        (1, "HTTPS://WWW.Example.COM:443/a?utm_source=f"),
        (2, "https://example.com/a/"),
        (3, "https://example.com/a#frag"),
        (4, "https://example.com/b"),
    ]
    out = {
        r["canonical_url"]: (r["keep_id"], r["n_copies"])
        for r in url_dedup(
            spark.createDataFrame(rows, ["doc_id", "url"])
        ).collect()
    }
    assert out == {
        "https://example.com/a": (1, 3),
        "https://example.com/b": (4, 1),
    }


def test_repetition_stats_values(spark):
    # "spam spam spam spam": top bigram "spam spam" occurs 3×, 9 chars each
    # over 19 chars; all three 5-grams (floored to one whole-doc gram) are
    # unique → dup5 0. "a b c d e f" has no repeats at all.
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "a b c d e f"), (3, "x y x y x y x y")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["top2_char_frac"] == round(3 * 9 / 19.0, 6)
    assert out[2]["top2_char_frac"] == round(3 / 11.0, 6)  # every bigram once
    assert out[2]["dup5_frac"] == 0.0
    # doc 3: 5-grams of 8 tokens = 4 occurrences, 2 distinct → dup 0.5
    assert out[3]["dup5_frac"] == 0.5


def test_pii_scrub_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org or sue@a.io now"),
            (2, "call +1 (555) 010-9921 or 555-010-8844 today"),
            (3, "host 10.0.3.44 and 192.168.0.1 up"),
            (4, "clean text only"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (2, 0, 0)
    assert (out[2]["n_emails"], out[2]["n_ipv4"], out[2]["n_phones"]) == (0, 0, 2)
    assert (out[3]["n_emails"], out[3]["n_ipv4"], out[3]["n_phones"]) == (0, 2, 0)
    assert out[4]["n_emails"] == out[4]["n_ipv4"] == out[4]["n_phones"] == 0
    # digest equals md5 of the expected redacted strings
    want1 = "mail <EMAIL> or <EMAIL> now"
    got = (
        spark.range(1).select(F.md5(F.lit(want1)).alias("h")).collect()[0]["h"]
    )
    assert out[1]["redacted_digest"] == got


def test_keep_best_picks_highest_quality(spark):
    clusters = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 1), (20, 20)], ["doc_id", "dup_group"]
    )
    quality = spark.createDataFrame(
        [(10, 0.4), (11, 0.9), (12, 0.9), (20, 0.1)], ["doc_id", "quality"]
    )
    out = {
        r["dup_group"]: r
        for r in keep_best_per_cluster(clusters, quality).collect()
    }
    # tie on quality 0.9 → lowest doc_id wins
    assert (out[1]["keep_doc_id"], out[1]["n_members"]) == (11, 3)
    assert (out[20]["keep_doc_id"], out[20]["n_members"]) == (20, 1)


def test_canonical_url_idempotent(spark):
    """canonical_url is a projection onto its own fixed points — applying
    it twice never changes the result (the invariant that lets the url
    tier run incrementally: already-canonical urls pass through)."""
    schemes = ["https://", "HTTP://", "HTTPS://WWW.", ""]
    hosts = ["Example.COM", "example.com:443", "example.com:8080", "a.b.c"]
    paths = ["", "/", "/A/b/", "/x//", "/p?utm_a=1", "/p?utm_a=1&id=2",
             "/p?id=2&utm_b=3&fbclid=z", "/p??", "/p?x=1&", "/p#f", "/p/#f?g",
             "/p&q=1", "/p?gclid=only"]
    urls = [s + h + p for s in schemes for h in hosts for p in paths]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = df.select(
        canonical_url("url").alias("c1"),
        canonical_url(canonical_url("url")).alias("c2"),
    )
    bad = out.filter(F.col("c1") != F.col("c2")).collect()
    assert not bad, bad[:5]


def test_stratified_sample_deterministic_and_allowlisted(spark):
    from character_identification_spark.operators.curation import (
        md5_uniform,
        mixing_report,
        stratified_sample,
    )

    docs = spark.range(0, 400).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 4 = 0 THEN 'en' WHEN id % 4 = 1 THEN 'de' "
        "WHEN id % 4 = 2 THEN 'fr' ELSE 'zh' END AS lang",
        "concat('src', CAST(id % 2 AS STRING)) AS source",
    )
    out = stratified_sample(docs, {"en": 1.0, "de": 0.4}, strata_col="lang")
    rows = [(r["doc_id"], r["lang"]) for r in out.collect()]
    # allowlist: unmapped strata fully dropped; fraction 1.0 keeps all
    assert all(lang in ("en", "de") for _, lang in rows)
    assert sum(1 for _, lang in rows if lang == "en") == 100
    n_de = sum(1 for _, lang in rows if lang == "de")
    assert 20 <= n_de <= 60  # ~0.4 of 100, deterministic but not exact
    # keyed draw: identical across repartitionings (df.sample is NOT)
    rows2 = [
        (r["doc_id"], r["lang"])
        for r in stratified_sample(
            docs.repartition(13), {"en": 1.0, "de": 0.4}, strata_col="lang"
        ).collect()
    ]
    assert sorted(rows) == sorted(rows2)
    # the uniform draw itself is a pure function in [0, 1)
    us = [r["u"] for r in docs.select(md5_uniform("doc_id", "strat").alias("u")).collect()]
    assert all(0.0 <= u < 1.0 for u in us)
    # mixing report covers every source, zeros for unmapped ones
    rep = {r["source"]: r for r in mixing_report(docs, {"src0": 0.5}).collect()}
    assert set(rep) == {"src0", "src1"}
    assert rep["src1"]["n_kept"] == 0
    assert rep["src0"]["n_total"] == 200
    assert abs(rep["src0"]["realized_rate"] - rep["src0"]["n_kept"] / 200) < 1e-9


def test_pack_sequences_layout(spark):
    from character_identification_spark.operators.curation import pack_sequences

    rows = [(i, " ".join(["w"] * (10 + i)), "en") for i in range(8)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = pack_sequences(docs, budget=32, n_subshards=1).collect()
    assert len(out) == 8
    # replay the packing order: start offsets are the exclusive cumsum
    ordered = sorted(out, key=lambda r: (r["seq_index"] * 32 + r["offset_in_seq"]))
    start = 0
    for r in ordered:
        assert r["seq_index"] == start // 32
        assert r["offset_in_seq"] == start % 32
        start += r["n_tokens"]
    # determinism under repartitioning: identical layout
    out2 = pack_sequences(docs.repartition(7), budget=32, n_subshards=1).collect()
    assert {(r["doc_id"], r["seq_index"], r["offset_in_seq"]) for r in out} == {
        (r["doc_id"], r["seq_index"], r["offset_in_seq"]) for r in out2
    }


def test_strip_common_chunks_flags_shared_prefix(spark):
    import hashlib

    from character_identification_spark.operators.curation import (
        strip_common_chunks,
    )

    boiler = " ".join(f"b{i}" for i in range(10))  # one exact 10-token chunk
    rows = [(d, boiler + " " + f"unique{d} tail{d}") for d in range(3)]
    rows.append((9, "totally different content here"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in strip_common_chunks(docs, 10, 3).collect()}
    for d in range(3):
        assert out[d]["n_chunks"] == 2 and out[d]["n_common"] == 1
        want = hashlib.md5(f"unique{d} tail{d}".encode()).hexdigest()
        assert out[d]["clean_digest"] == want
    # the singleton doc keeps everything
    assert out[9]["n_common"] == 0
    assert (
        out[9]["clean_digest"]
        == hashlib.md5(b"totally different content here").hexdigest()
    )


def test_domain_cap_rates(spark):
    from character_identification_spark.operators.curation import domain_cap

    rows = [(i, "big") for i in range(50)] + [(100 + i, "small") for i in range(5)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out = {r["domain"]: r for r in domain_cap(docs, cap=10).collect()}
    assert out["small"]["keep_rate"] == 1.0 and out["small"]["n_kept"] == 5
    assert out["big"]["keep_rate"] == 0.2
    assert 0 < out["big"]["n_kept"] < 50
    # md5 draw ⇒ identical kept counts on a re-run over shuffled input
    out2 = {r["domain"]: r for r in domain_cap(docs.repartition(9), cap=10).collect()}
    assert out2["big"]["n_kept"] == out["big"]["n_kept"]


def test_blocklist_filter_hits(spark):
    from character_identification_spark.operators.curation import blocklist_filter

    docs = spark.createDataFrame(
        [(1, "clean text here"), (2, "some SPAM and spam again"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in blocklist_filter(docs, ("spam",)).collect()}
    assert out[1]["keep"] and out[1]["n_blocked"] == 0
    # case-insensitive, counted with multiplicity
    assert not out[2]["keep"] and out[2]["n_blocked"] == 2
    assert out[2]["blocked_frac"] == 0.4
    assert out[3]["n_blocked"] == 0 and out[3]["keep"]
