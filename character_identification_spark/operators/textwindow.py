"""Context-window features around mention spans (SURVEY §2 W1/W2).

The reference featurizes every mention with the word embeddings of a
±k-token window and of the containing sentence (reference: latest/model/
features.py:58-62 token windows, :123-124 sentence pooling). The engine's
analog attaches the raw windows relationally — slice arithmetic on the
sentence token arrays, fully JVM-side — so any downstream featurizer
(hash embeddings, functions/vectors.py, or a learned model's tokenizer)
consumes them without re-tokenizing.

Join shape: mentions × (utterance, sentence) on (utterance_id, sent_idx) —
an equi-join keyed by the document structure, no window function needed;
skew is bounded by mentions-per-sentence (tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sentence_table(utterances: DataFrame) -> DataFrame:
    """utterances(utterance_id, tokens: array<array<string>>) → one row
    per sentence (utterance_id, sent_idx, sent_tokens)."""
    return utterances.select(
        "utterance_id", F.posexplode("tokens").alias("sent_idx", "sent_tokens")
    )


def token_window_features(
    mentions: DataFrame, utterances: DataFrame, k: int = 4
) -> DataFrame:
    """mentions(…, utterance_id, sent_idx, begin, end) → + prev_tokens
    (≤k tokens before the span, W1), next_tokens (≤k after, W1),
    sent_tokens (the containing sentence, W2), span_tokens.

    begin/end are 0-based token offsets, end exclusive (the reference's
    [begin, end) convention)."""
    sents = sentence_table(utterances)
    j = mentions.join(sents, ["utterance_id", "sent_idx"])
    n = F.size("sent_tokens")
    b, e = F.col("begin"), F.col("end")
    prev_start = F.greatest(b - k, F.lit(0))
    prev_len = b - prev_start
    next_len = F.least(F.lit(k), F.greatest(n - e, F.lit(0)))
    return (
        j.withColumn(
            "prev_tokens",
            F.when(prev_len > 0, F.slice("sent_tokens", prev_start + 1, prev_len))
            .otherwise(F.array().cast("array<string>")),
        )
        .withColumn(
            "next_tokens",
            F.when(next_len > 0, F.slice("sent_tokens", e + 1, next_len))
            .otherwise(F.array().cast("array<string>")),
        )
        .withColumn("span_tokens", F.slice("sent_tokens", b + 1, e - b))
    )
