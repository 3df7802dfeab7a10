"""Pairwise scoring: string + token + (optional) embedding features.

The reference scores pairs with a CNN over mention encodings plus discrete
pair features (reference: latest/model/coref.py:72-95); its only string
similarity is an LCS ratio (util/__init__.py:57-79). The engine's scorer is
the classic ER analog (reference: baseline/model/coref.py:78-90 — a scalar
match probability per pair): a weighted blend of

  jw          Jaro-Winkler (Arrow-vectorized pandas UDF)
  lev_ratio   1 - levenshtein/max_len (JVM builtin, codegen'd)
  tok_jaccard token-set Jaccard (JVM array ops)
  cos_sim     embedding cosine, when an embedding column is present

All but jw run fully JVM-side; jw is the designated pandas-UDF slow path.
Token containment ("ross" ⊆ "ross geller") is scored through jw/prefix
rather than a hard rule so the threshold stays a single calibration knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from character_identification_spark.functions.strings import jaro_winkler_udf
from character_identification_spark.functions.vectors import cosine_sim

DEFAULT_THRESHOLD = 0.82


def score_pairs(
    pairs: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    with_embeddings: bool = False,
    dedup_strings: bool = True,
) -> DataFrame:
    """pairs(…, norm_1, norm_2[, emb_1, emb_2]) → + jw, lev_ratio,
    tok_jaccard[, cos_sim], score, is_match.

    With ``dedup_strings`` (string-only path), features are computed once
    per DISTINCT (norm_1, norm_2) and joined back: every feature is a pure
    function of the two strings, and at corpus scale the same name pair
    recurs across millions of blocks — this keeps the pandas-UDF (jw) row
    count proportional to the vocabulary, not the pair count.
    """
    if dedup_strings and not with_embeddings:
        uniq = pairs.select("norm_1", "norm_2").distinct()
        feats = _score_strings(uniq, threshold)
        return pairs.join(feats, ["norm_1", "norm_2"])
    return _score_strings(pairs, threshold, with_embeddings)


def _score_strings(
    pairs: DataFrame, threshold: float, with_embeddings: bool = False
) -> DataFrame:
    n1, n2 = F.col("norm_1"), F.col("norm_2")
    t1, t2 = F.split(n1, " "), F.split(n2, " ")
    scored = (
        pairs.withColumn("jw", jaro_winkler_udf(n1, n2))
        .withColumn(
            "lev_ratio",
            1.0 - F.levenshtein(n1, n2) / F.greatest(F.length(n1), F.length(n2)),
        )
        .withColumn(
            "tok_jaccard",
            F.size(F.array_intersect(t1, t2))
            / F.size(F.array_union(t1, t2)).cast("double"),
        )
        .withColumn(
            "tok_contained",
            (F.size(F.array_except(t1, t2)) == 0) | (F.size(F.array_except(t2, t1)) == 0),
        )
    )
    # initial-alias rule: "c bunch" ~ "carol bunch" — token-count equal,
    # identical tails, first tokens in a prefix relation
    f1, f2 = F.element_at(t1, 1), F.element_at(t2, 1)
    scored = scored.withColumn(
        "initial_alias",
        (F.size(t1) == F.size(t2))
        & (F.size(t1) >= 2)
        & (F.slice(t1, 2, 1000) == F.slice(t2, 2, 1000))
        & (f1.startswith(f2) | f2.startswith(f1)),
    )
    if with_embeddings:
        scored = scored.withColumn("cos_sim", cosine_sim("emb_1", "emb_2"))
        score = (
            0.35 * F.col("jw")
            + 0.2 * F.col("lev_ratio")
            + 0.15 * F.col("tok_jaccard")
            + 0.3 * ((F.col("cos_sim") + 1.0) / 2.0)
        )
    else:
        score = 0.5 * F.col("jw") + 0.3 * F.col("lev_ratio") + 0.2 * F.col("tok_jaccard")
    score = score + F.when(F.col("tok_contained"), 0.12).otherwise(0.0)
    # decision: typo rule OR containment-alias rule OR initial-alias rule
    # OR blended score. Containment ("ross" ⊆ "ross geller") trades some
    # precision at open-web scale ("john" bridging "john smith"/"john doe");
    # block structure plus the jw floor keeps it safe on persona aliases.
    match = (
        (F.col("jw") >= 0.90)
        | (F.col("lev_ratio") >= 0.85)
        | (F.col("tok_contained") & (F.col("jw") >= 0.65))
        | F.col("initial_alias")
        | (score >= threshold)
    )
    return scored.withColumn("score", score).withColumn("is_match", match)
