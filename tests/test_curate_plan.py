"""End-to-end curation pipeline: quality/lang filter → URL dedup → exact
dedup → MinHash near-dup groups → keep-best — checkpointed and resumable
like the linkage pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from character_identification_spark.plans.curate import CurationConfig, run_curation

_A = (
    "the quick brown fox jumps over the lazy dog and it is a fine day "
    "for a walk in the park with friends that we know from the old town "
    "and everyone is happy to be here for the start of a good season"
)
_B = (
    "colorless green ideas sleep furiously while the machine hums in the "
    "basement and a kettle whistles for tea as the evening settles in "
    "over the quiet street where it is calm and the lights glow softly"
)
_C = (
    "a completely different story unfolds at the harbor where the boats "
    "rock gently and the gulls argue about crumbs that the tourists drop "
    "on the pier while it is getting dark and the lighthouse blinks"
)


def _docs(spark):
    a_trunc = " ".join(_A.split()[:-3])
    rows = [
        (1, _A, "https://example.com/a"),
        (2, _A, "http://example.com/b"),  # exact copy, distinct url
        (3, a_trunc, "https://example.com/c"),  # near-dup of 1
        (4, _B, "https://example.com/b"),
        (5, _C, "HTTPS://WWW.Example.COM:443/b?utm_source=x"),  # url-dup of 4
        (6, "der hund ist auf dem tisch und das ist nicht gut f", "https://example.com/de"),
        (7, "$$$ !!! 111 ??? %%% 222 &&& 333 ***", "https://example.com/junk"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "url"])


def test_curation_pipeline_end_to_end(spark, tmp_path):
    res = run_curation(
        spark, _docs(spark), str(tmp_path / "w"), CurationConfig(url_col="url")
    )
    kept = {r["doc_id"] for r in res["kept"].select("doc_id").collect()}
    assert 6 not in kept  # german
    assert 7 not in kept  # junk quality
    # url tier drops 5 (canonical url equals doc 4's)
    url_keep = {r["keep_id"] for r in res["url_keep"].collect()}
    assert 5 not in url_keep and 4 in url_keep
    # exact tier drops 2; near-dup groups {1,3}
    curated = {r["keep_doc_id"]: r for r in res["curated"].collect()}
    assert set(curated) == {1, 4}
    assert curated[1]["n_members"] == 2  # 1 and its truncated twin 3
    assert curated[1]["text"] == _A


def test_curation_pipeline_resumes(spark, tmp_path):
    work = str(tmp_path / "w")
    first = run_curation(spark, _docs(spark), work, CurationConfig(url_col="url"))
    a = sorted(map(tuple, first["curated"].select("keep_doc_id", "n_members").collect()))
    # second run must read every stage from the checkpoint store
    second = run_curation(spark, _docs(spark), work, CurationConfig(url_col="url"))
    b = sorted(map(tuple, second["curated"].select("keep_doc_id", "n_members").collect()))
    assert a == b
    # metrics table holds one row per stage, not duplicated by the resume
    stages = (
        spark.read.parquet(str(tmp_path / "w" / "_meta_metrics"))
        .groupBy("stage")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in stages), stages
    assert {r["stage"] for r in stages} >= {
        "features", "kept", "url_keep", "exact_groups", "near_pairs",
        "dup_groups", "curated",
    }
