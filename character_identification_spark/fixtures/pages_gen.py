"""Deterministic synthetic pages corpus with embedded gold entity clusters.

Mirrors the reference's fixture strategy (tiny end-to-end smoke configs,
reference: python/params/test-latest-coref-params.json + FIXTURES.md):
personas with string-similar aliases are planted into page text so gold
clusters exist by construction, the way Friends characters recur across
scenes. Hot-entity skew (2 entities own ~20% of mentions) exercises the
salted blocking path.

Everything is a pure function of (seed, index) — numpy RandomState gives
cross-run determinism; no wall clock, no external data. The generator emits:

  pages(url, warc_ts, html binary, text, lang)          — engine input
  gold_mentions(url, mention_uid, mention_idx, begin, end, surface,
                gold_refs, block_key)                   — never read by the
                                                          engine, only eval
"""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from character_identification_spark.functions.hashing import h_long
from character_identification_spark.ingest.extract import wrap_html

_FIRST = [
    "Ross", "Rachel", "Monica", "Chandler", "Joey", "Phoebe", "Gunther",
    "Janice", "Emily", "Carol", "Susan", "Richard", "Ursula", "Frank",
    "Alice", "Estelle", "Barry", "Mindy", "Kathy", "Tag", "Paolo", "Julie",
    "Charlie", "Emma", "Ben", "Judy", "Jack", "Nora", "Gloria", "Sandra",
    "Leonard", "Marcel", "Heckles", "Erika", "Pete", "Kate", "Joshua",
    "Bonnie", "Elizabeth", "Mona",
]
_LAST = [
    "Geller", "Green", "Bing", "Tribbiani", "Buffay", "Hosenstein",
    "Litman", "Waltham", "Willick", "Bunch", "Burke", "Hannigan",
    "Knight", "Zelner", "Stevens", "Leonard", "Mitchell", "Philange",
    "Becker", "Jones", "Caruso", "Graff", "Wheeler", "Bowmont", "Tyler",
    "Altman", "Lambert", "Morse", "Dermot", "Saunders", "Hobart",
    "Vance", "Ferraro", "Whitfield", "Ramoray", "Dwyer", "Preston",
    "Kingsley", "Sorkin", "Mayfield",
]
_FILLER = (
    "said hello at the cafe . later that day everyone talked about the "
    "news and drank coffee near the fountain ."
).split()


def _aliases(first: str, last: str) -> list[str]:
    """String-similar variants of one persona (full, first-only, initialed,
    transposed-typo) — the alias set a web corpus would surface."""
    # transposition typo in the middle of the last name ("Geller"→"Gleler")
    typo = last if len(last) < 4 else last[0] + last[2] + last[1] + last[3:]
    return [
        f"{first} {last}",
        first,
        f"{first[0]}. {last}",
        f"{first} {typo}",
    ]


def generate_corpus(
    spark: SparkSession,
    n_pages: int = 2000,
    n_entities: int = 40,
    n_blocks: int = 60,
    seed: int = 42,
    hot_fraction: float = 0.2,
    non_en_every: int = 97,
) -> tuple[DataFrame, DataFrame]:
    """Returns (pages, gold_mentions). Deterministic in all arguments."""
    assert n_entities <= len(_FIRST)
    rng = np.random.RandomState(seed)
    entities = []
    for i in range(n_entities):
        first, last = _FIRST[i], _LAST[i]
        entities.append(
            {"label": f"{first} {last}".lower(), "aliases": _aliases(first, last)}
        )
    # hot skew: first 2 entities get hot_fraction of all mention slots
    weights = np.full(n_entities, (1.0 - hot_fraction) / max(n_entities - 2, 1))
    weights[0] = weights[1] = hot_fraction / 2
    weights /= weights.sum()
    # each block hosts a fixed subset of entities (scene analog)
    block_members = [
        rng.choice(n_entities, size=min(8, n_entities), replace=False, p=weights)
        for _ in range(n_blocks)
    ]

    page_rows, gold_rows = [], []
    epoch = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    for p in range(n_pages):
        block = p % n_blocks
        url = f"https://corpus.test/b{block:04d}/p{p:06d}"
        ts = epoch + dt.timedelta(seconds=p)
        if non_en_every and p % non_en_every == 96:
            page_rows.append((url, ts, "kein englischer text auf dieser seite .", "de"))
            continue
        n_mentions = int(rng.randint(1, 5))
        members = block_members[block]
        parts: list[str] = []
        mentions = []
        pos = 0
        for m in range(n_mentions):
            ent_idx = int(members[rng.randint(0, len(members))])
            alias = entities[ent_idx]["aliases"][int(rng.randint(0, 4))]
            lead = " ".join(
                _FILLER[rng.randint(0, len(_FILLER))] for _ in range(int(rng.randint(2, 6)))
            )
            chunk_prefix = (lead + " ") if lead else ""
            begin = pos + len(chunk_prefix)
            end = begin + len(alias)
            chunk = chunk_prefix + alias + " "
            parts.append(chunk)
            pos += len(chunk)
            mentions.append((m, begin, end, alias, [entities[ent_idx]["label"]]))
        text = ("".join(parts)).rstrip() + " ."
        page_rows.append((url, ts, text, "en"))
        for m, begin, end, alias, refs in mentions:
            gold_rows.append((url, m, begin, end, alias, refs, f"b{block:04d}"))

    pages_schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    gold_schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("mention_idx", T.IntegerType(), False),
            T.StructField("begin", T.IntegerType(), False),
            T.StructField("end", T.IntegerType(), False),
            T.StructField("surface", T.StringType(), False),
            T.StructField("gold_refs", T.ArrayType(T.StringType()), False),
            T.StructField("block_key", T.StringType(), False),
        ]
    )
    pages = (
        spark.createDataFrame(page_rows, pages_schema)
        .withColumn("html", wrap_html(F.col("text")))
        .select("url", "warc_ts", "html", "text", "lang")
    )
    gold = spark.createDataFrame(gold_rows, gold_schema).withColumn(
        "mention_uid",
        h_long(F.concat_ws("#", F.col("url"), F.col("mention_idx"))),
    )
    return pages, gold
