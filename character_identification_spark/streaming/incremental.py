"""Structured-Streaming ingest: pages arrive as files, mentions and
dedup fingerprints stream out incrementally.

The reference corpus is static (SURVEY.md §2.11 — no streaming anywhere);
a web-crawl corpus is not: new WARC drops land continuously. This module
runs the pipeline's narrow prefix (extract → mentions / fingerprints) as a
streaming job with exactly-once file sinks + checkpointLocation, so the
batch ER stages (blocking → pairs → CC) can re-run over the accumulated
mention table on whatever cadence re-clustering is wanted — the standard
lambda split for ER: clustering is a global fixpoint and cannot be
incrementalized safely without cluster-repair logic, extraction can.

All transformations reuse the batch operators verbatim (same functions) —
one code path, two execution modes, which is what keeps streaming and batch
byte-identical per url.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from character_identification_spark.ingest.extract import extracted_pages
from character_identification_spark.ingest.mentions import extract_mentions

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of pages parquet drops (one WARC batch = one or
    more files appearing atomically in input_dir)."""
    r = spark.readStream.schema(PAGES_DDL)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(input_dir)


def streaming_dedup(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exact-dedup a page stream: first arrival per content digest wins.

    dropDuplicatesWithinWatermark keyed on digest bounds the dedup state
    store by the event-time watermark — duplicates arriving later than the
    watermark pass through (and are caught by the batch dedup stage
    downstream); that is the standard state-size/completeness trade for
    streaming dedup."""
    return (
        pages.withColumn("digest", F.md5(F.col("text")))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["digest"])
    )


def windowed_mention_counts(
    pages: DataFrame,
    keep_lang: str | None = "en",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window mention counts per normalized name —
    the streaming twin of the batch events_tumbling aggregation, with late
    data handled by the watermark (rows later than ``watermark`` behind
    the max event time are dropped from the open window state).

    Works in BOTH modes: on a static DataFrame it is the exact batch
    aggregation (tested equal), on a stream it maintains incremental
    window state."""
    mentions = extract_mentions(extracted_pages(pages, keep_lang), with_ts=True)
    if pages.isStreaming:
        mentions = mentions.withWatermark("warc_ts", watermark)
    return mentions.groupBy(
        F.window("warc_ts", window).alias("w"), "norm"
    ).agg(F.count("*").alias("n_mentions")).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "norm",
        "n_mentions",
    )


# output/state schemas for the custom stateful tracker
_TRACK_OUT = (
    "norm string, total long, batch_new long, first_ts timestamp, last_ts timestamp"
)
_TRACK_STATE = "total long, first_ts timestamp, last_ts timestamp"


def entity_mention_tracker(mentions: DataFrame, timeout: str = "NoTimeout"):
    """Custom stateful streaming operator via applyInPandasWithState:
    per normalized name, maintain a running mention count and
    first/last-seen event times across micro-batches, emitting one update
    row per (name, batch). This is the streaming analog of the
    reference's incrementally-updated mention statistics — state keyed by
    the same column the batch pipeline clusters on.

    Arrow-batched: each group's rows arrive as pandas DataFrames; no
    per-row Python."""
    import pandas as pd  # noqa: F401 (workers need it imported lazily)

    def track(key, pdfs, state):
        total0, first0, last0 = (
            state.get if state.exists else (0, None, None)
        )
        n = 0
        first, last = first0, last0
        for pdf in pdfs:
            n += len(pdf)
            bmin, bmax = pdf["warc_ts"].min(), pdf["warc_ts"].max()
            first = bmin if first is None or bmin < first else first
            last = bmax if last is None or bmax > last else last
        state.update((total0 + n, first, last))
        import pandas as pd

        yield pd.DataFrame(
            {
                "norm": [key[0]],
                "total": [total0 + n],
                "batch_new": [n],
                "first_ts": [first],
                "last_ts": [last],
            }
        )

    # outputMode "append": each emitted (norm, batch) row is final — the
    # running total lives in the state store, not in retracted rows —
    # which keeps file sinks (append-only) usable
    return mentions.select("norm", "warc_ts").groupBy("norm").applyInPandasWithState(
        track, _TRACK_OUT, _TRACK_STATE, "append", timeout
    )


def run_incremental_ingest(
    spark: SparkSession,
    input_dir: str,
    workdir: str,
    keep_lang: str | None = "en",
    available_now: bool = True,
):
    """Stream pages → extract (byte-identical text) → mentions → append
    parquet, with a checkpoint so a killed job resumes mid-stream (the
    streaming twin of StageStore's batch resume).

    Returns the StreamingQuery (already awaited when available_now)."""
    pages = stream_pages(spark, input_dir)
    mentions = extract_mentions(extracted_pages(pages, keep_lang))
    writer = (
        mentions.writeStream.format("parquet")
        .option("path", os.path.join(workdir, "mentions_stream"))
        .option("checkpointLocation", os.path.join(workdir, "_stream_checkpoint"))
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
