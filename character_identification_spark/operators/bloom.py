"""Deterministic Bloom-filter semi-join reduction (runtime filter).

The classic big-join pruning move at 100 TB: when a selective dimension
predicate leaves a small build-side key set, compress those keys into an
m-bit Bloom filter and PRUNE the fact-side scan with a pure projection
BEFORE the join — survivors (true matches + a bounded false-positive
tail) are the only rows that ever reach the join exchange. Spark's AQE
injects this automatically in some shapes (runtime row-level filters);
this operator is the explicit, engine-replayable form for the shapes it
doesn't reach, with the false-positive rate measured rather than
guessed.

Determinism contract: the g hash functions are md5-pure
(h_long("bloom{i}|" + key) % m_bits — functions/hashing.py, the same
primitive the Count-Min sketch uses), the filter is m_bits/32 integer
words built by a bit_or aggregate (32-bit words so no shift ever
touches the sign bit in either engine), and membership is an integer
mask test — the DuckDB twin rebuilds the identical words and the
identical pass set.

Reference anchor: the reference joins dimension resources in memory
(SURVEY §2.3 J4); this is the scale analog for when the fact side is
too big to join unpruned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from character_identification_spark.functions.hashing import h_long

WORD_BITS = 32


def _positions(key: Column, m_bits: int, g: int) -> list[Column]:
    return [
        h_long(F.concat(F.lit(f"bloom{i}|"), key.cast("string"))) % m_bits
        for i in range(g)
    ]


def _mask(p: Column) -> Column:
    # shiftleft() takes a Python int for the shift amount, so a
    # column-typed bit index goes through a literal mask table instead
    # (built lazily — F.lit needs an active session)
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(WORD_BITS)])
    return F.element_at(masks, (p % WORD_BITS).cast("int") + 1)


def bloom_filter_words(
    keys: DataFrame, key_col: str = "key", m_bits: int = 2048, g: int = 3
) -> list[int]:
    """Collect the filter as m_bits/32 integer words (driver-side list,
    index = word number, missing words 0). The aggregate is (word)-keyed
    bit_or over ≤ g rows per key — map-side combined, output bounded by
    m_bits/32 rows regardless of key count."""
    if m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a multiple of {WORD_BITS}")
    pos = keys.filter(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, g))).alias("p")
    )
    rows = (
        pos.select(
            (F.col("p") / WORD_BITS).cast("int").alias("w"),
            _mask(F.col("p")).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("m"))
        .collect()
    )
    words = [0] * (m_bits // WORD_BITS)
    for r in rows:
        words[r["w"]] = r["m"]
    return words


# Above this, the literal-array form stops being viable: the plan
# carries one F.lit per 32-bit word, so m_bits=2^16 is already 2,048
# literals (fine) but a production sizing (1e7 keys × 10 bits/key ≈
# 1e8 bits ≈ 3M literals) explodes analysis/codegen long before the
# filter is useful. Past the ceiling, use bloom_contains_broadcast.
LITERAL_MAX_BITS = 1 << 16


def bloom_contains(
    key: Column, words: list[int], m_bits: int = 2048, g: int = 3
) -> Column:
    """Membership mask test as a literal-array projection — zero
    shuffle, whole-stage codegen, no broadcast variable: the filter
    ships inside the plan itself. Bounded to m_bits ≤ LITERAL_MAX_BITS
    (the plan carries m_bits/32 literals); larger filters go through
    bloom_contains_broadcast."""
    if m_bits > LITERAL_MAX_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds the literal-plan ceiling "
            f"{LITERAL_MAX_BITS}; use bloom_contains_broadcast"
        )
    lit_words = F.array(*[F.lit(int(w)) for w in words])
    cond = None
    for p in _positions(key, m_bits, g):
        word = F.element_at(lit_words, (p / WORD_BITS).cast("int") + 1)
        c = word.bitwiseAND(_mask(p)) != 0
        cond = c if cond is None else cond & c
    # a NULL key hashes to NULL → NULL cond; a null key is never a
    # member, so the test must say False, not null
    return F.coalesce(cond, F.lit(False))


def bloom_contains_broadcast(
    spark, key_col: str, words: list[int], m_bits: int, g: int = 3
) -> Column:
    """Membership test for PRODUCTION filter sizings (m_bits past the
    literal-plan ceiling): the words array rides a Spark broadcast
    variable into an Arrow-batched pandas UDF instead of the plan text,
    so plan size is O(1) in m_bits and each executor holds ONE shared
    copy of the filter (m_bits/8 bytes — a 10⁸-bit filter is 12.5 MB).

    Round-6 rework (was the repo's last per-row-Python hot path): the g
    bit positions are computed JVM-SIDE by the literal form's _positions
    expressions (one vectorized-codegen F.md5 each — identical digests by
    construction, so literal and broadcast forms stay value-identical;
    property-tested in tests/test_bloom.py) and enter the UDF as one
    array<long> column. The UDF body is a pure numpy word-gather
    ``(w[p >> 5] >> (p & 31)) & 1`` over the whole batch — no hashlib, no
    per-row loop. A NULL key hashes to NULL positions (NaN in the batch)
    and tests False, matching the literal form's coalesce."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    warr = np.array(words, dtype=np.int64)
    bc = spark.sparkContext.broadcast(warr)

    # no type hints: `from __future__ import annotations` stringifies
    # them and PySpark's hint inference then rejects the signature —
    # the hint-free form defaults to the scalar Arrow eval type
    def _test_fn(pos_batch):
        w = bc.value
        n = len(pos_batch)
        out = np.zeros(n, dtype=bool)
        if n:
            # (n, g) float64 matrix; NULL positions (NULL key) become NaN.
            # Positions are < m_bits ≪ 2^53, exact in float64.
            mat = np.array(pos_batch.tolist(), dtype="float64")
            valid = ~np.isnan(mat).any(axis=1)
            if valid.any():
                p = mat[valid].astype(np.int64)
                bits = (w[p >> 5] >> (p & 31)) & 1
                out[valid] = bits.all(axis=1)
        return pd.Series(out, dtype="bool")

    _test = pandas_udf(_test_fn, "boolean")
    pos = F.array(*_positions(F.col(key_col), m_bits, g))
    return _test(pos)


def bloom_semijoin_stats(
    build: DataFrame,
    probe: DataFrame,
    build_key: str,
    probe_key: str,
    m_bits: int = 2048,
    g: int = 3,
    use_broadcast: bool | None = None,
) -> DataFrame:
    """→ 1 row (n_build_keys, n_probe_rows, n_pass, n_true, n_false_pos):
    build the filter over the build side's distinct keys, prune the probe
    side with the projection, and measure the pruning against the exact
    broadcast semi-join — n_pass ≥ n_true always (Bloom filters have no
    false negatives; property-tested), n_false_pos is the measured FP
    tail the m_bits/g sizing buys.

    Scale shape: the build side collapses to m_bits/32 words (one
    bounded-output aggregate); the probe side is scanned ONCE with the
    pass flag and the exact-match flag (broadcast join against the
    distinct build keys) computed in the same pass — at 100 TB the
    pruned scan feeds the real join and the stats row is the monitoring
    side-channel."""
    # NULL build keys are excluded from the filter (bloom_filter_words
    # drops them) and can never equality-match — exclude them from the
    # reported key count too, so n_build_keys == keys actually encoded
    keys = (
        build.select(F.col(build_key).alias("k"))
        .where(F.col("k").isNotNull())
        .distinct()
    )
    words = bloom_filter_words(keys, "k", m_bits, g)
    if use_broadcast is None:
        use_broadcast = m_bits > LITERAL_MAX_BITS
    probe_keys = probe.select(F.col(probe_key).alias("pk"))
    test = (
        bloom_contains_broadcast(probe.sparkSession, "pk", words, m_bits, g)
        if use_broadcast
        else bloom_contains(F.col("pk"), words, m_bits, g)
    )
    flagged = (
        probe_keys
        .withColumn("pass", test)
        .join(
            F.broadcast(keys.withColumn("matched", F.lit(True))),
            F.col("pk") == F.col("k"),
            "left",
        )
    )
    n_keys = keys.count()
    return flagged.agg(
        F.lit(n_keys).cast("long").alias("n_build_keys"),
        F.count(F.lit(1)).cast("long").alias("n_probe_rows"),
        F.sum(F.col("pass").cast("long")).alias("n_pass"),
        F.sum(F.coalesce(F.col("matched"), F.lit(False)).cast("long")).alias("n_true"),
        (
            F.sum(F.col("pass").cast("long"))
            - F.sum(F.coalesce(F.col("matched"), F.lit(False)).cast("long"))
        ).alias("n_false_pos"),
    )
