"""Scale-adaptive minimum parallelism for compute-heavy projections.

The engine's hot per-row work (md5 shingle fan-outs, vectorized batch
UDFs, gram explodes) runs inside the SCAN stage when the operator is a
zero-shuffle projection — which is exactly the shape the round-5/6 perf
reworks produced. On production inputs a scan has thousands of splits and
parallelism is free; on small inputs (one or two file splits, e.g. a
sub-MB parquet) the same projection runs on a handful of tasks while the
rest of the cluster idles.

``fan_out`` hash-repartitions by a data key to the session's default
parallelism when — and only when — the input has fewer partitions than
that. At scale (splits ≫ cores) it is a no-op, so no extra shuffle is
ever paid where parallelism already exists. Hash partitioning on data
keys is deterministic (no round-robin, no RNG — see SPARK-38388 for why
that matters under task retry), so results stay partitioning-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, *key_cols: str, target: int | None = None) -> DataFrame:
    """Repartition ``df`` by ``key_cols`` to ``target`` (default: the
    session's default parallelism) iff it currently has fewer partitions.
    Use immediately before an expensive projection/batch-UDF over a
    possibly-tiny input; keep the keys high-cardinality (row ids) so the
    hash spreads evenly."""
    t = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= t:
        return df
    return df.repartition(t, *[F.col(c) for c in key_cols])
