"""End-to-end: the F1 gate, checkpoint/resume, metrics + lineage tables."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from character_identification_spark.plans.pipeline import (
    PipelineConfig,
    evaluate_pipeline,
    run_pipeline,
)


def _cfg():
    return PipelineConfig()


def test_end_to_end_f1_gate(spark, small_corpus, tmp_workdir):
    pages, gold = small_corpus
    res = run_pipeline(spark, pages, tmp_workdir, _cfg())
    ev = evaluate_pipeline(res, gold)
    assert ev["precision"] == 1.0
    assert ev["f1"] >= 0.99, ev

    # stage checkpoints + meta tables all on disk (edge_split holds both
    # safe edges and alias links as one single-pass table)
    for stage in (
        "extracted", "mentions", "names", "block_assign", "candidate_pairs",
        "scored_pairs", "edge_split", "name_clusters",
        "assignments", "entities", "_meta_metrics", "_meta_lineage",
    ):
        assert os.path.exists(os.path.join(tmp_workdir, stage)), stage

    metrics = spark.read.parquet(os.path.join(tmp_workdir, "_meta_metrics"))
    assert metrics.count() == 10
    lineage = spark.read.parquet(os.path.join(tmp_workdir, "_meta_lineage"))
    assert lineage.select("stage").distinct().count() == 10
    # lineage row counts reconcile with stage row counts
    recon = (
        lineage.groupBy("stage").agg(F.sum("rows").alias("lrows"))
        .join(metrics.select("stage", "rows"), "stage")
        .filter(F.col("lrows") != F.col("rows"))
    )
    assert recon.count() == 0


def test_resume_skips_and_is_identical(spark, small_corpus, tmp_workdir):
    pages, gold = small_corpus
    r1 = run_pipeline(spark, pages, tmp_workdir, _cfg())
    a1 = sorted(map(tuple, r1["assignments"].select("mention_uid", "cluster_id").collect()))
    metrics_rows = spark.read.parquet(os.path.join(tmp_workdir, "_meta_metrics")).count()

    r2 = run_pipeline(spark, pages, tmp_workdir, _cfg())
    a2 = sorted(map(tuple, r2["assignments"].select("mention_uid", "cluster_id").collect()))
    assert a1 == a2
    # resumed run appends no new stage metrics (all stages skipped)
    assert (
        spark.read.parquet(os.path.join(tmp_workdir, "_meta_metrics")).count()
        == metrics_rows
    )


def test_resume_mid_stage(spark, small_corpus, tmp_workdir):
    """Kill-after-stage-N simulation: delete a late checkpoint; rerun must
    rebuild only from there and reach the same answer."""
    import shutil

    pages, gold = small_corpus
    r1 = run_pipeline(spark, pages, tmp_workdir, _cfg())
    a1 = sorted(map(tuple, r1["assignments"].select("mention_uid", "cluster_id").collect()))
    shutil.rmtree(os.path.join(tmp_workdir, "assignments"))
    shutil.rmtree(os.path.join(tmp_workdir, "entities"))
    r2 = run_pipeline(spark, pages, tmp_workdir, _cfg())
    a2 = sorted(map(tuple, r2["assignments"].select("mention_uid", "cluster_id").collect()))
    assert a1 == a2


def test_entities_canonicalization(spark, small_corpus, tmp_workdir):
    pages, gold = small_corpus
    res = run_pipeline(spark, pages, tmp_workdir, _cfg())
    ents = res["entities"]
    assert ents.filter(F.col("canonical").isNull()).count() == 0
    # every cluster has exactly one canonical row
    assert ents.groupBy("cluster_id").count().filter("count > 1").count() == 0
    # mention mass is conserved
    total = res["assignments"].count()
    assert ents.agg(F.sum("n_mentions")).collect()[0][0] == total
