"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in character_identification_spark/driver_contract.py
(Spark) and character_identification_spark/oracles.py (DuckDB SQL); this
module is the thin registry the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from character_identification_spark.driver_contract import QUERIES  # noqa: E402
from character_identification_spark.oracles import ORACLES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full ER pipeline (mentions → blocking →
    blocked pair join → pairwise scoring → connected-components
    clustering → canonical entities) at sf0.001."""
    from character_identification_spark.driver_contract import q_er_entities

    return q_er_entities(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — full coverage: every entry in
    ``queries()`` has a value-level oracle (the md5-pure determinism rule
    makes even LSH/ANN and the fake media codec exactly replayable)."""
    return dict(ORACLES)
