"""canonical_entities semantics: most-frequent-norm canonical with
lexicographic tie-break, alias/page stats — pinned directly since the
round-6 rework replaced the window+multi-countDistinct plan with a
two-level aggregation (values must be unchanged)."""

from __future__ import annotations

from character_identification_spark.operators.canonicalize import (
    canonical_entities,
)


def test_canonical_entities_stats_and_tiebreak(spark):
    rows = [
        # cluster 1: 'beta' twice, 'alpha' twice → tie on cnt, 'alpha'
        # wins lexicographically; urls overlap across norms (n_pages
        # counts DISTINCT urls cluster-wide, not per norm)
        (1, 101, "beta", "Beta", "u1"),
        (1, 102, "beta", "Beta", "u2"),
        (1, 103, "alpha", "Alpha", "u2"),
        (1, 104, "alpha", "Alpha", "u3"),
        # cluster 2: clear majority 'gamma'
        (2, 201, "gamma", "Gamma", "u4"),
        (2, 202, "gamma", "Gamma", "u4"),
        (2, 203, "delta", "Delta", "u5"),
    ]
    df = spark.createDataFrame(
        rows, "cluster_id long, mention_uid long, norm string, "
        "surface string, url string"
    )
    out = {r["cluster_id"]: r for r in canonical_entities(df).collect()}

    c1 = out[1]
    assert c1["canonical"] == "alpha"  # tie → lexicographic
    assert c1["n_mentions"] == 4
    assert c1["n_aliases"] == 2
    assert c1["aliases"] == ["alpha", "beta"]  # sorted
    assert c1["n_pages"] == 3  # u1,u2,u3 — u2 shared across norms

    c2 = out[2]
    assert c2["canonical"] == "gamma"  # majority beats lexicographic
    assert c2["n_mentions"] == 3
    assert c2["n_aliases"] == 2
    assert c2["n_pages"] == 2
    # column order is part of the declared-query contract
    assert list(canonical_entities(df).columns) == [
        "cluster_id", "n_mentions", "n_aliases", "aliases", "n_pages",
        "canonical",
    ]
