"""String-similarity functions for pairwise scoring.

The reference's only string feature is an O(len^2) LCS similarity computed
per pair in Python (reference: python/util/__init__.py:57-79, used at
python/experiments/latest/model/features.py:151-155). Here the hot-path
builtin is ``F.levenshtein`` (JVM, codegen); Jaro-Winkler and LCS ratios are
Arrow-vectorized pandas UDFs — batch transfer, no per-row Python UDF serde.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def norm_text(col: Column | str) -> Column:
    """Normalize a surface form: lowercase, strip non-alphanumerics to
    spaces, collapse runs, trim. Mirrors the reference's ingest-time
    ``.lower()`` canonicalization (reference: latest/tools/mention.py:11-12)
    plus web-text punctuation stripping."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "), r"\s+", " "))


def _jaro(s1: str, s2: str) -> float:
    # empty-vs-anything (incl. empty-vs-empty) is 0.0, matching DuckDB's
    # jaro_winkler_similarity so oracle comparisons are exact
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = True
                m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1, threshold: float = 0.7) -> float:
    """Standard Jaro-Winkler similarity (prefix cap 4, boost above 0.7)."""
    j = _jaro(s1, s2)
    if j <= threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    return pd.Series(
        [jaro_winkler(a, b) if (a is not None and b is not None) else None
         for a, b in zip(s1, s2)],
        dtype="float64",
    )


def _lcs_len(a: str, b: str) -> int:
    # O(len(a)*len(b)) DP, one rolling row
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b):
            cur.append(prev[j] + 1 if ca == cb else max(prev[j + 1], cur[j]))
        prev = cur
    return prev[-1]


@F.pandas_udf(T.ArrayType(T.DoubleType()))
def lcs_ratio_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Reference's two LCS features: |lcs|/|s1| and |lcs|/|s2|
    (reference: features.py:151-155)."""
    out = []
    for a, b in zip(s1, s2):
        if a is None or b is None or not a or not b:
            out.append([0.0, 0.0])
        else:
            l = float(_lcs_len(a, b))
            out.append([l / len(a), l / len(b)])
    return pd.Series(out)
