"""As-of (last-match) join.

The reference's closest-previous-speaker resolution scans prior utterances
backwards for the nearest referent (reference: baseline/tools/ioutils.py:
139-151 with prev_speakers built at :53-54) — a textbook as-of join. Two
Spark formulations:

  asof_join        union-tag + window last(ignorenulls): one shuffle on
                   (key), linear in rows, no range-join explosion — the
                   scale path for dense right sides.
  last_prior_event same pattern specialized to a single table (the W6
                   analog: latest earlier row of a different kind).

DuckDB has native ASOF JOIN, which the oracle uses — making this one of the
few operators where engine and oracle run genuinely different algorithms
and must still agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    strict: bool = True,
) -> DataFrame:
    """For each left row: the latest right row with right.ts < left.ts
    (strict) or <= (not strict), per `on` key. Left rows with no prior
    right row keep NULL values.

    Implementation: tag both sides, union, sort within key by (ts, side)
    via a window, carry the last non-null right payload forward. One
    shuffle on `on`; rows never fan out (vs a range join's quadratic
    blow-up between checkpoints).
    """
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = (
        right.select(
            on,
            F.col(right_ts).alias("_ts"),
            *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)
    # strict: at equal ts the right row sorts after the left row (side 0
    # vs 1 — order by _side desc puts left first), so it is not visible;
    # non-strict: right first
    order = [F.col("_ts").asc(), F.col("_side").desc() if strict else F.col("_side").asc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    filled = merged
    for c in value_cols:
        filled = filled.withColumn(
            f"asof_{c}", F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w)
        )
    out_cols = [c for c in left.columns] + [f"asof_{c}" for c in value_cols]
    return filled.filter(F.col("_side") == 1).select(*out_cols)


def last_prior_event(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    kind_col: str = "event_type",
    kind: str = "click",
    value_col: str = "value",
) -> DataFrame:
    """For every event: the value of the same user's most recent earlier
    event of the given kind (NULL if none) — the reference's
    closest-previous-speaker window (W6) on a generic event log."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = F.when(F.col(kind_col) == kind, F.col(value_col))
    return events.withColumn(
        f"prev_{kind}_{value_col}", F.last(marked, ignorenulls=True).over(w)
    )
