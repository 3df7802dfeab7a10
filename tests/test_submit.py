"""The north rule's launch contract, executed for real: package the engine
into a --py-files zip and drive the full pipeline through ``spark-submit``
in a clean process (no repo on PYTHONPATH — the zip is the only way the
driver and executors can import the package, exactly as on a
multi-executor cluster)."""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    try:
        from pyspark.find_spark_home import _find_spark_home

        cand = os.path.join(_find_spark_home(), "bin", "spark-submit")
        return cand if os.path.exists(cand) else None
    except Exception:
        return None


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not found")
def test_spark_submit_pyfiles_end_to_end(spark, small_corpus, tmp_path):
    pages, gold = small_corpus
    pages_p, gold_p = str(tmp_path / "pages"), str(tmp_path / "gold")
    pages.write.parquet(pages_p)
    gold.write.parquet(gold_p)

    zip_p = str(tmp_path / "ckspark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_pyfiles_zip.py"), zip_p],
        check=True, capture_output=True,
    )

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_p,
            os.path.join(REPO, "tools", "submit_pipeline.py"),
            "--pages", pages_p,
            "--workdir", str(tmp_path / "stages"),
            "--gold", gold_p,
            "--entities-out", str(tmp_path / "entities"),
        ],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    m = re.search(r"SUBMIT_RESULT (\{.*\})", proc.stdout)
    assert m, proc.stdout[-3000:]
    result = json.loads(m.group(1))
    assert result["eval"]["precision"] == 1.0
    assert result["eval"]["f1"] >= 0.99
    assert os.path.exists(os.path.join(str(tmp_path / "entities"), "_SUCCESS"))
