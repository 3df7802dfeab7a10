"""Structured-Streaming ingest: incremental file processing, resume via
checkpoint, parity with the batch path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from character_identification_spark.ingest.extract import extracted_pages
from character_identification_spark.ingest.mentions import extract_mentions
from character_identification_spark.streaming.incremental import run_incremental_ingest


def _write_drop(pages, path):
    pages.write.mode("append").parquet(path)


def test_incremental_ingest_matches_batch(spark, small_corpus, tmp_path):
    pages, _ = small_corpus
    in_dir = str(tmp_path / "drops")
    work = str(tmp_path / "work")
    first = pages.filter(F.crc32("url") % 2 == 0)
    second = pages.filter(F.crc32("url") % 2 == 1)

    _write_drop(first, in_dir)
    run_incremental_ingest(spark, in_dir, work)
    got1 = spark.read.parquet(os.path.join(work, "mentions_stream")).count()

    # second drop arrives; checkpoint resumes — only new files processed
    _write_drop(second, in_dir)
    run_incremental_ingest(spark, in_dir, work)
    streamed = spark.read.parquet(os.path.join(work, "mentions_stream"))

    batch = extract_mentions(extracted_pages(pages, "en"))
    assert streamed.count() > got1
    a = sorted(map(tuple, streamed.select("mention_uid", "norm").collect()))
    b = sorted(map(tuple, batch.select("mention_uid", "norm").collect()))
    assert a == b  # streaming == batch, byte-identical extraction
