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


def test_windowed_counts_stream_equals_batch(spark, small_corpus, tmp_path):
    """The watermarked tumbling aggregation produces the SAME result run
    as a stream (availableNow over file drops) and as a batch query."""
    from character_identification_spark.streaming.incremental import (
        stream_pages,
        windowed_mention_counts,
    )

    pages, _ = small_corpus
    in_dir = str(tmp_path / "drops")
    pages.write.mode("append").parquet(in_dir)

    batch = windowed_mention_counts(pages)
    # complete mode + memory sink: append mode would hold back windows the
    # watermark hasn't passed yet (correct streaming semantics, but the
    # parity check wants the full window state)
    q = (
        windowed_mention_counts(stream_pages(spark, in_dir))
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql("SELECT * FROM win_counts")
    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_entity_mention_tracker_state_accumulates(spark, small_corpus, tmp_path):
    """applyInPandasWithState custom stateful operator: totals accumulate
    across micro-batches and match the batch group counts."""
    from character_identification_spark.ingest.extract import extracted_pages
    from character_identification_spark.ingest.mentions import extract_mentions
    from character_identification_spark.streaming.incremental import (
        entity_mention_tracker,
    )

    pages, _ = small_corpus
    in_dir = str(tmp_path / "drops")
    first = pages.filter(F.crc32("url") % 2 == 0)
    second = pages.filter(F.crc32("url") % 2 == 1)
    first.write.mode("append").parquet(in_dir)

    def run_pass():
        stream = (
            spark.readStream.schema(
                "url string, warc_ts timestamp, html binary, text string, lang string"
            ).parquet(in_dir)
        )
        mentions = extract_mentions(extracted_pages(stream, "en"), with_ts=True)
        out_dir = str(tmp_path / "track_out")
        q = (
            entity_mention_tracker(mentions)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "track_ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir)

    run_pass()
    second.write.mode("append").parquet(in_dir)
    out = run_pass()

    # latest total per norm == the batch count; batch_new sums to total
    from pyspark.sql import Window

    w = Window.partitionBy("norm").orderBy(F.desc("total"))
    latest = (
        out.withColumn("rk", F.row_number().over(w)).filter("rk = 1")
        .select("norm", "total")
    )
    batch = (
        extract_mentions(extracted_pages(pages, "en"))
        .groupBy("norm").agg(F.count("*").alias("n"))
    )
    diff = (
        latest.join(batch, "norm")
        .filter(F.col("total") != F.col("n"))
        .count()
    )
    assert diff == 0
    sums = (
        out.groupBy("norm").agg(F.sum("batch_new").alias("s"))
        .join(batch, "norm").filter(F.col("s") != F.col("n")).count()
    )
    assert sums == 0


def test_curation_filters_stream_equals_batch(spark, tmp_path):
    """The curation projections (PII scrub, quality stats) are stateless —
    the SAME operator code runs unchanged on a stream (the 100-TB shape:
    filter every drop at read bandwidth, no state, no watermark)."""
    from character_identification_spark.operators.curation import pii_scrub
    from character_identification_spark.operators.textstats import text_stats

    docs = spark.createDataFrame(
        [
            (1, "write to a.b@c.io today"),
            (2, "plain words only here"),
            (3, "node 10.0.0.7 rebooted call +1 (555) 010-0000"),
        ],
        ["doc_id", "text"],
    )
    in_dir = str(tmp_path / "docs")
    docs.write.parquet(in_dir)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(in_dir)

    for name, op in (("pii_stream", pii_scrub), ("quality_stream", text_stats)):
        q = (
            op(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        a = sorted(map(tuple, spark.sql(f"SELECT * FROM {name}").collect()))
        b = sorted(map(tuple, op(docs).collect()))
        assert a == b and len(a) == 3, name


def test_streaming_attach_foreachbatch(spark, small_corpus, tmp_path):
    """Real Structured-Streaming drive of the cluster-maintenance path:
    a file stream of name drops (one file per micro-batch) runs
    incremental_attach via foreachBatch against persisted parquet state,
    and the final maintained clustering (with the deferred merge_queue
    applied) recovers the full-batch fixpoint — the streaming twin of
    tests/test_incremental_attach.py's multi-drop chain."""
    from pyspark.sql import functions as F

    from character_identification_spark.functions.hashing import h_long
    from character_identification_spark.ingest.extract import extracted_pages
    from character_identification_spark.ingest.mentions import extract_mentions
    from character_identification_spark.operators.blocking import assign_blocks
    from character_identification_spark.operators.cc import connected_components
    from character_identification_spark.operators.context import (
        name_cluster_table,
        split_name_edges,
    )
    from character_identification_spark.operators.pairs import generate_pairs
    from character_identification_spark.operators.scoring import score_pairs
    from character_identification_spark.streaming.incremental import (
        current_base,
        run_streaming_attach,
    )

    def cluster_names(names):
        blocks = assign_blocks(names)
        pairs = generate_pairs(names, blocks, payload_cols=("norm",))
        scored = score_pairs(pairs, dedup_strings=False)
        safe, amb = split_name_edges(scored)
        return name_cluster_table(names, connected_components(safe), amb)

    pages, _ = small_corpus
    names = (
        extract_mentions(extracted_pages(pages, "en"))
        .select("norm").distinct()
        .withColumn("mention_uid", h_long(F.col("norm")))
        .select("mention_uid", "norm")
        .cache()
    )
    part = F.crc32("norm") % 4
    seed = cluster_names(names.filter(part == 0))
    names_dir, state_dir = str(tmp_path / "drops"), str(tmp_path / "state")
    import os
    import time

    os.makedirs(names_dir)
    for k in (1, 2, 3):  # one file per drop → one micro-batch per drop
        names.filter(part == k).coalesce(1).write.mode("append").parquet(names_dir)
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    run_streaming_attach(
        spark, names_dir, state_dir,
        seed.select("mention_uid", "norm", "cluster_id"),
    )

    final = {
        r["mention_uid"]: r["cluster_id"]
        for r in current_base(spark, state_dir).collect()
    }
    assert set(final) == {r["mention_uid"] for r in names.collect()}
    # apply the accumulated deferred merges (the cadence step)
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    mq = spark.read.parquet(str(tmp_path / "state" / "merge_queue"))
    for r in mq.collect():
        a, b = find(r["cluster_a"]), find(r["cluster_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)

    def pairs_of(items):
        by_c: dict = {}
        for uid, cid in items:
            by_c.setdefault(cid, []).append(uid)
        out = set()
        for ms in by_c.values():
            ms = sorted(ms)
            out.update((ms[i], ms[j]) for i in range(len(ms)) for j in range(i + 1, len(ms)))
        return out

    got = pairs_of([(uid, find(cid)) for uid, cid in final.items()])
    want = pairs_of(
        (r["mention_uid"], r["cluster_id"])
        for r in cluster_names(names).select("mention_uid", "cluster_id").collect()
    )
    assert len(got & want) / max(len(want), 1) >= 0.95, (len(got & want), len(want))
    assert len(got - want) <= max(2, len(want) // 50), sorted(got - want)[:5]
    # the engine-side merge-apply (tiny cluster-graph CC + broadcast
    # relabel) must conclude exactly what the union-find replay does
    from character_identification_spark.streaming.incremental import apply_merges

    fused = apply_merges(current_base(spark, state_dir), mq)
    got2 = pairs_of(
        (r["mention_uid"], r["cluster_id"]) for r in fused.collect()
    )
    assert got2 == got
    names.unpersist()


def test_interval_join_stream_equals_batch(spark, tmp_path):
    """The watermarked stream-stream interval join (fetch → mention
    attribution) produces the SAME rows run as two availableNow file
    streams and as a static batch join."""
    import datetime as dt

    from character_identification_spark.streaming.incremental import (
        interval_join_streams,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    fetches_rows = [(f"u{i}", ts(i)) for i in range(8)]
    # mentions: within window (i+2 min), outside window (i+30 min),
    # and one url with no fetch at all
    mention_rows = (
        [(f"u{i}", ts(i + 2), f"name{i}") for i in range(8)]
        + [(f"u{i}", ts(i + 30), f"late{i}") for i in range(8)]
        + [("nofetch", ts(1), "orphan")]
    )
    fdf = spark.createDataFrame(fetches_rows, "url string, fetch_ts timestamp")
    mdf = spark.createDataFrame(
        mention_rows, "url string, mention_ts timestamp, norm string"
    )
    batch = sorted(map(tuple, interval_join_streams(fdf, mdf).collect()))
    assert len(batch) == 8  # only the in-window mentions attribute

    fdir, mdir = str(tmp_path / "f"), str(tmp_path / "m")
    out = str(tmp_path / "out")
    fdf.write.parquet(fdir)
    mdf.write.parquet(mdir)
    fs = spark.readStream.schema("url string, fetch_ts timestamp").parquet(fdir)
    ms = spark.readStream.schema(
        "url string, mention_ts timestamp, norm string"
    ).parquet(mdir)
    q = (
        interval_join_streams(fs, ms)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert streamed == batch


def test_interval_join_left_outer_stream_equals_batch(spark, tmp_path):
    """Left-outer form (round-5): fetches with NO in-window mention
    surface with NULL (mention_ts, norm) once the mention watermark
    passes their attribution deadline. Streamed as multi-batch
    availableNow file streams (1 file per source per micro-batch;
    sentinel events advance the watermark, a final nudge batch flushes
    the evictable outer state), the non-sentinel rows must equal the
    static batch left-outer join."""
    import datetime as dt
    import time

    from character_identification_spark.streaming.incremental import (
        interval_join_streams,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    fetch_rows = [(f"u{i}", ts(i)) for i in range(8)] + [
        (f"nm{i}", ts(i)) for i in range(4)  # never mentioned
    ]
    mention_rows = (
        [(f"u{i}", ts(i + 2), f"name{i}") for i in range(8)]
        + [(f"u{i}", ts(i + 30), f"late{i}") for i in range(8)]
        + [("nofetch", ts(1), "orphan")]
    )
    fdf = spark.createDataFrame(fetch_rows, "url string, fetch_ts timestamp")
    mdf = spark.createDataFrame(
        mention_rows, "url string, mention_ts timestamp, norm string"
    )
    batch = sorted(
        map(tuple, interval_join_streams(fdf, mdf, how="left_outer").collect()),
        key=str,
    )
    assert len(batch) == 12  # 8 attributed + 4 null-mention fetches
    assert sum(1 for r in batch if r[3] is None) == 4

    fdir, mdir, out = (str(tmp_path / d) for d in ("f", "m", "out"))
    sent_f = [("sentinelF", ts(600))], [("sentinelF2", ts(660))]
    sent_m = (
        [("sentinelM", ts(600), "sm")],
        [("sentinelM2", ts(660), "sm2")],
    )
    # batch 1: the data; batches 2-3: watermark sentinels + flush nudge
    fdf.coalesce(1).write.mode("append").parquet(fdir)
    mdf.coalesce(1).write.mode("append").parquet(mdir)
    for i in range(2):
        time.sleep(1.2)  # mtime-ordered file batches
        spark.createDataFrame(
            sent_f[i], "url string, fetch_ts timestamp"
        ).coalesce(1).write.mode("append").parquet(fdir)
        spark.createDataFrame(
            sent_m[i], "url string, mention_ts timestamp, norm string"
        ).coalesce(1).write.mode("append").parquet(mdir)

    fs = (
        spark.readStream.schema("url string, fetch_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(fdir)
    )
    ms = (
        spark.readStream.schema("url string, mention_ts timestamp, norm string")
        .option("maxFilesPerTrigger", 1)
        .parquet(mdir)
    )
    q = (
        interval_join_streams(fs, ms, how="left_outer")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out).filter(~F.col("url").startswith("sentinel"))
    streamed = sorted(map(tuple, got.collect()), key=str)
    assert streamed == batch
