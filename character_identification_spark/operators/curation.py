"""Corpus-curation operators a web-scale training-data pipeline runs
before/around dedup: URL canonicalization + URL-level dedup, Gopher-style
repetition statistics, PII scrubbing, and best-document selection per
duplicate cluster.

Beyond-reference components (the reference corpus is curated TV-show JSON;
a Common-Crawl-style corpus needs these to reach the same cleanliness).
All JVM-side: canonical_url/pii_scrub are chained regexp projections that
Catalyst fuses into the scan; repetition_stats is explode → two keyed
aggregations (shuffle key doc_id — uniform, linear in token count);
keep_best_per_cluster is a window over cluster ids. Every value is a pure
function of the input so the DuckDB oracles replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Scheme+host prefix of a URL (through the authority, before path/query/
# fragment). Kept identical in the DuckDB oracle — conservative regex
# syntax that Java's engine and RE2 interpret the same way.
_SCHEME_HOST = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"
# Query parameters that never change page identity (analytics trackers).
_TRACKING = r"[?&](utm_[a-z0-9]+|fbclid|gclid|msclkid)=[^&#]*"


def canonical_url(col) -> Column:
    """Canonical form of a URL: scheme+host lowercased, leading ``www.``
    and default ports (:443 https / :80 http) stripped, fragment removed,
    tracking parameters (utm_*, fbclid, gclid, msclkid) removed, dangling
    ``?``/``&`` and trailing slashes trimmed. Path/query case and order
    are preserved (they are identity-bearing)."""
    u = F.col(col) if isinstance(col, str) else col
    sh = F.lower(F.regexp_extract(u, _SCHEME_HOST, 0))
    sh = F.regexp_replace(sh, r"^(https?://)www\.", "$1")
    sh = F.regexp_replace(sh, r"^(https://[^:]*):443$", "$1")
    sh = F.regexp_replace(sh, r"^(http://[^:]*):80$", "$1")
    rest = F.regexp_replace(u, _SCHEME_HOST, "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    rest = F.regexp_replace(rest, _TRACKING, "")
    # if the '?' itself was consumed (first param was a tracker), promote
    # the first '&' back to '?'
    rest = F.regexp_replace(rest, r"^([^?&]*)&", "$1?")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.regexp_replace(rest, r"/+$", "")
    return F.concat(sh, rest)


def url_dedup(
    docs: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """→ (canonical_url, keep_id, n_copies): URL-level exact dedup after
    canonicalization — the cheapest dedup tier in a crawl pipeline (runs
    before any content hashing). One shuffle on the canonical URL; keys
    are uniform (hot hosts spread across paths)."""
    return (
        docs.select(
            F.col(id_col).alias("_id"), canonical_url(url_col).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.min("_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _grams(toks: Column, n: int) -> Column:
    """All word n-grams (with multiplicity — unlike dedup.word_shingles).
    Docs shorter than n tokens contribute one truncated gram (the whole
    doc), mirroring word_shingles' floor behavior."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, top2_char_frac, top3_char_frac, dup5_frac): Gopher-style
    repetition filters — fraction of characters covered by the most
    frequent word 2-/3-gram (count × gram length / text length) and the
    duplicate fraction of 5-gram occurrences (1 − distinct/total). High
    values flag boilerplate/spam for removal before training.

    Dataflow: a union of one explode per gram size, then two aggregations
    keyed by doc_id — linear volume, uniform keys. The union re-reads the
    pruned (doc_id, text) projection once per size; the measured
    alternative — one scan exploding a concat of size-tagged gram
    structs — is 2.2× SLOWER (4.5 s vs 10 s at sf0.1, best-of-3 warm):
    materializing ~3×|tokens| structs per row before the explode costs
    more than two extra pruned columnar scans, and the explode OUTPUT,
    not the scan, dominates bytes at any scale.
    """
    from character_identification_spark.functions.partitioning import fan_out

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.length(text_col).alias("n_chars")
    )
    # the gram build + explode is the heavy scan-stage work: spread a tiny
    # input (one file split) across the cluster first
    fanned = fan_out(docs.select(F.col(id_col), F.col(text_col)), id_col)
    ex = None
    for n in (2, 3, 5):
        part = fanned.select(
            F.col(id_col).alias("doc_id"),
            F.lit(n).alias("n"),
            F.explode(_grams(toks, n)).alias("gram"),
        )
        ex = part if ex is None else ex.unionByName(part)
    cnt = ex.groupBy("doc_id", "n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    agg = cnt.groupBy("doc_id", "n").agg(
        F.max(F.col("cnt") * F.length("gram")).alias("top_chars"),
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    piv = agg.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == 2, F.col("top_chars"))).alias("top2_chars"),
        F.max(F.when(F.col("n") == 3, F.col("top_chars"))).alias("top3_chars"),
        F.max(F.when(F.col("n") == 5, F.col("total"))).alias("g5_total"),
        F.max(F.when(F.col("n") == 5, F.col("n_distinct"))).alias("g5_distinct"),
    )
    # Degenerate docs: for empty/whitespace-only text n_chars = 0 and the
    # IEEE double division yields NaN, which coalesce does NOT replace
    # (NaN is not null) — guard the denominator explicitly so Spark matches
    # DuckDB's NULL-on-zero-division → coalesce → 0.0 behavior.
    def _frac(num, den):
        return F.round(
            F.when(den > 0, F.coalesce(num / den.cast("double"), F.lit(0.0)))
            .otherwise(0.0),
            6,
        )

    return base.join(piv, "doc_id", "left").select(
        "doc_id",
        _frac(F.col("top2_chars"), F.col("n_chars")).alias("top2_char_frac"),
        _frac(F.col("top3_chars"), F.col("n_chars")).alias("top3_char_frac"),
        F.round(
            F.when(
                F.col("g5_total") > 0,
                F.coalesce(
                    1.0 - F.col("g5_distinct") / F.col("g5_total").cast("double"),
                    F.lit(0.0),
                ),
            ).otherwise(0.0),
            6,
        ).alias("dup5_frac"),
    )


# PII patterns — conservative syntax interpreted identically by Java's
# regex engine and DuckDB's RE2. Applied in this order (emails contain
# digits; IPv4 octet runs are too short for the phone pattern either way).
EMAIL_RE = r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, n_emails, n_ipv4, n_phones, redacted_digest): count PII
    matches on the original text and emit the md5 of the redacted text
    (emails → <EMAIL>, IPv4 → <IP>, phone runs → <PHONE>, applied in that
    order). Pure narrow projection — fuses into the scan; the digest lets
    downstream stages verify redaction without re-shipping the text."""
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ipv4"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
        F.md5(red).alias("redacted_digest"),
    )


def keep_best_per_cluster(
    clusters: DataFrame,
    quality: DataFrame,
    cluster_col: str = "dup_group",
    id_col: str = "doc_id",
    quality_col: str = "quality",
) -> DataFrame:
    """→ (dup_group, keep_doc_id, quality, n_members): canonical-document
    selection — per duplicate cluster, keep the member with the highest
    quality score (ties → lowest id). The standard "which copy survives
    dedup" policy when copies differ (truncation, boilerplate). Window
    over cluster ids; cluster sizes are bounded by the dedup caps
    upstream, so no skewed partitions."""
    j = clusters.select(cluster_col, id_col).join(
        quality.select(id_col, quality_col), id_col
    )
    w = Window.partitionBy(cluster_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        j.withColumn("_rk", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(Window.partitionBy(cluster_col)))
        .filter(F.col("_rk") == 1)
        .select(
            F.col(cluster_col).alias("dup_group"),
            F.col(id_col).alias("keep_doc_id"),
            F.col(quality_col).alias("quality"),
            "n_members",
        )
    )


def md5_uniform(col: Column | str, salt: str) -> Column:
    """Deterministic uniform-[0,1) draw per row: md5(salt|key)'s 60-bit
    prefix over 2^60 — the engine's sampling primitive. A pure function
    of (salt, key): identical across runs, partitionings, and engines
    (DuckDB recomputes it bit-for-bit), so samples are exactly
    reproducible and survive resume — the property lazy RNG state can
    never give (the reference's features.py:195-197 anti-pattern)."""
    from character_identification_spark.functions.hashing import h_long

    c = F.col(col) if isinstance(col, str) else col
    return h_long(F.concat_ws("|", F.lit(salt), c.cast("string"))) / F.lit(
        float(2**60)
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-data MIXING
    primitive (language/source rebalancing at corpus scale): keep a row
    iff md5_uniform(id) < fractions[stratum]; strata absent from the map
    are DROPPED (explicit allowlist semantics). Shuffle-free: a pure
    filter that fuses into the scan, so at 100 TB it runs at read
    bandwidth and composes with predicate pushdown on the strata
    column. Unlike df.sample(), the draw is keyed by row id, not by
    partition position — adding executors or reordering files cannot
    change the sample."""
    u = md5_uniform(id_col, salt)
    frac = None
    for k, v in sorted(fractions.items()):
        cond = F.when(F.col(strata_col) == k, F.lit(float(v)))
        frac = cond if frac is None else frac.when(
            F.col(strata_col) == k, F.lit(float(v))
        )
    frac = (frac.otherwise(0.0) if frac is not None else F.lit(0.0))
    return docs.filter(u < frac)


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "lang",
    n_subshards: int = 4,
    salt: str = "pack",
) -> DataFrame:
    """→ (doc_id, shard, subshard, n_tokens, seq_index, offset_in_seq):
    deterministic concat-and-chunk sequence packing — the training-shard
    step that concatenates documents into a token stream and splits it
    into fixed-``budget`` sequences (the GPT-style packing every LLM
    pretraining pipeline runs after curation). A document's sequence is
    the one its FIRST token lands in: seq_index = ⌊start/budget⌋,
    offset_in_seq = start mod budget, where start is the exclusive
    running token total in packing order.

    Packing order inside a (shard, subshard) is the md5 draw of the doc
    id — a pure function, so the layout is identical across runs,
    partitionings, and engines (df.orderBy or RNG shuffles would not
    be), and re-packing after an upstream change moves only the docs
    whose ids changed position. Subsharding by md5(id) mod n_subshards
    bounds the window partition: at 100 TB a single 'en' shard would
    otherwise serialize through one window partition — with subshards
    the cumsum shuffle spreads over shard×subshard keys and each stays
    executor-sized (pick n_subshards ≈ shard_bytes / 1 GB).
    """
    from character_identification_spark.functions.hashing import h_long

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(shard_col).alias("shard"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_tokens"),
    ).withColumn(
        "okey", h_long(F.concat_ws("|", F.lit(salt), F.col("doc_id").cast("string")))
    ).withColumn(
        "subshard", (F.col("okey") % n_subshards).cast("int")
    )
    w = (
        Window.partitionBy("shard", "subshard")
        .orderBy("okey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    # integer DIV, not floor(double /): a 10^12-doc shard's running token
    # total exceeds 2^53 and double division would mis-bin the tail
    return d.withColumn("start", start).select(
        "doc_id",
        "shard",
        "subshard",
        "n_tokens",
        F.expr(f"start DIV {int(budget)}").cast("long").alias("seq_index"),
        (F.col("start") % budget).cast("long").alias("offset_in_seq"),
    )


def strip_common_chunks(
    docs: DataFrame,
    chunk_tokens: int = 10,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_chunks, n_common, common_frac, clean_digest):
    corpus-frequency boilerplate removal — the CCNet paragraph-hash
    step adapted to fixed token chunks: split each document into
    non-overlapping ``chunk_tokens``-token chunks, count how many
    DISTINCT documents each exact chunk appears in, and drop chunks
    shared by ≥ ``min_docs`` docs (headers, footers, nav bars, license
    blocks — text that repeats across a site is boilerplate, not
    content). ``clean_digest`` is the md5 of the surviving chunks
    re-joined in order, so downstream stages can verify the strip
    without re-shipping text.

    Dataflow: one explode (linear in tokens) → chunk-hash aggregation
    (count distinct doc per hash — uniform keys, boilerplate chunks are
    the hot ones but the agg output is one row per distinct chunk) →
    join back on the hash → per-doc reassembly agg. Two shuffles, both
    linear; no similarity search, no pairs.
    """
    from character_identification_spark.functions.hashing import h_hex

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_chunks = F.floor((F.size(toks) + chunk_tokens - 1) / chunk_tokens).cast("int")
    chunks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_chunks, F.lit(1))),
                lambda i: F.struct(
                    i.alias("idx"),
                    F.array_join(
                        F.slice(toks, (i - 1) * chunk_tokens + 1, chunk_tokens), " "
                    ).alias("chunk"),
                ),
            )
        ).alias("c"),
    ).select("doc_id", F.col("c.idx").alias("idx"), F.col("c.chunk").alias("chunk"))
    chunks = chunks.withColumn("chash", h_hex(F.col("chunk")))
    freq = chunks.groupBy("chash").agg(
        F.count_distinct("doc_id").alias("doc_freq")
    )
    flagged = chunks.join(freq, "chash").withColumn(
        "common", F.col("doc_freq") >= min_docs
    )
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.when(F.col("common"), 1).otherwise(0)).cast("long").alias("n_common"),
        F.round(
            F.sum(F.when(F.col("common"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("common_frac"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("common"),
                                F.struct(F.col("idx"), F.col("chunk")),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            )
        ).alias("clean_digest"),
    )


def domain_cap(
    docs: DataFrame,
    cap: int = 100,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "domcap",
) -> DataFrame:
    """→ (domain, n_total, keep_rate, n_kept, realized_rate): domain
    diversity cap — keep each document with probability min(1, cap/n_domain)
    so every domain contributes ≈ ``cap`` docs in expectation, the standard
    guard against a handful of giant hosts dominating a crawl-derived
    training mix. The draw is md5_uniform over the doc id (pure function —
    the kept SET is reproducible and resume-safe, unlike df.sample).

    Dataflow: per-domain count agg → join the rates back (uniform keys:
    even at 10^8 domains this is an ordinary shuffle join, no window and
    no global sort) → filter → per-domain kept agg. The filter itself is
    shuffle-free once the rate column is attached."""
    d = docs.select(
        F.col(id_col).alias("_id"), F.col(domain_col).alias("domain")
    )
    tot = d.groupBy("domain").agg(F.count(F.lit(1)).alias("n_total"))
    rate = tot.withColumn(
        "keep_rate", F.least(F.lit(1.0), F.lit(float(cap)) / F.col("n_total"))
    )
    kept = (
        d.join(rate, "domain")
        .filter(md5_uniform("_id", salt) < F.col("keep_rate"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rate.join(kept, "domain", "left")
        .select(
            "domain",
            "n_total",
            F.round("keep_rate", 6).alias("keep_rate"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.round(
                F.coalesce("n_kept", F.lit(0)) / F.col("n_total").cast("double"), 6
            ).alias("realized_rate"),
        )
    )


def mixing_report(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Dataset-mixing bookkeeping: apply stratified_sample over the
    SOURCE column (corpus-weight mixing, the standard pretraining-data
    recipe step) and report per source (n_total, n_kept,
    realized_rate) — the numbers a mixing config review needs. The
    realized rate converges to the weight at scale; at small n the
    deterministic draw makes the exact kept-set reproducible anyway."""
    kept = stratified_sample(docs, weights, source_col, id_col, salt)
    tot = docs.groupBy(source_col).agg(F.count("*").alias("n_total"))
    k = kept.groupBy(source_col).agg(F.count("*").alias("n_kept"))
    return (
        tot.join(k, source_col, "left")
        .select(
            source_col,
            "n_total",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.round(
                F.coalesce("n_kept", F.lit(0)) / F.col("n_total").cast("double"), 6
            ).alias("realized_rate"),
        )
    )


def blocklist_filter(
    docs: DataFrame,
    blocklist: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_blocked, blocked_frac, keep): C4-style blocklist
    filtering (Raffel et al. 2020's "bad words" step — docs containing
    any listed token are dropped from the training mix). Reports the
    blocked-token count and fraction so policy thresholds other than
    "any hit drops" can be applied downstream; ``keep`` is the strict
    C4 rule (zero hits).

    Pure projection over the token array (higher-order filter — the
    list compiles into the plan as literals, codegen JVM-side, no UDF
    and no join): fuses into the scan, so at 100 TB it runs at read
    bandwidth like the other narrow curation tiers."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    bl = [w.lower() for w in blocklist]
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*bl)))
    n = F.size(toks)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        hits.cast("long").alias("n_blocked"),
        F.round(
            F.when(n > 0, hits / n.cast("double")).otherwise(0.0), 6
        ).alias("blocked_frac"),
        (hits == 0).alias("keep"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, chunk_id, n_tokens, chunk_text): sliding-window document
    chunking — the context-length shaping step between curation and
    packing (a doc longer than the model context is split into
    ``chunk_tokens``-token windows advancing by ``chunk_tokens −
    overlap``; the trailing chunk keeps whatever remains).

    Pure per-row projection + bounded explode (⌈n/stride⌉ chunks per
    doc): no shuffle at all — Catalyst fuses it into the scan, and the
    fan-out is proportional to output size, the floor for any chunker.
    chunk_id = start/stride, so ids are dense per doc and independent of
    partitioning.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col), toks.alias("_t"), F.size(toks).alias("_n")
    ).select(
        id_col,
        "_t",
        F.explode(
            F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
        ).alias("_start"),
    )
    chunk = F.slice(F.col("_t"), F.col("_start") + 1, chunk_tokens)
    return base.select(
        id_col,
        (F.col("_start") / stride).cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
