"""Event-analytics contract queries: semantics that the sf-data oracle
sweep cannot distinguish (its event vocabulary is collision-free) are
pinned here on adversarial fixtures."""

from __future__ import annotations

import datetime

from character_identification_spark.driver_contract import q_events_funnel


def _write_events(spark, path, rows):
    t0 = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, t0 + datetime.timedelta(minutes=i), uid, et, 1.0, "{}")
            for i, (uid, et) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_funnel_steps_are_delimiter_anchored(spark, tmp_path):
    """'preview' / 'clicked' must NOT satisfy the view/click steps: the
    step regexes anchor on the '>' path delimiter (VERDICT r3 #3 — the
    substring form would silently corrupt the funnel the moment a
    colliding event type enters the vocabulary)."""
    sf = str(tmp_path)
    _write_events(
        spark,
        sf,
        [
            # u1: real view -> click -> purchase (all three steps)
            (1, "view"), (1, "click"), (1, "purchase"),
            # u2: substring traps only — zero steps
            (2, "preview"), (2, "clicked"), (2, "purchases"),
            # u3: view, then only a substring-trap click — step1 only
            (3, "view"), (3, "preclick"),
            # u4: click before view — step1 only (order matters)
            (4, "click"), (4, "view"),
        ],
    )
    row = q_events_funnel(spark, sf).collect()[0]
    assert row["n_users"] == 4
    assert row["n_view"] == 3  # u1, u3, u4
    assert row["n_view_click"] == 1  # u1 only
    assert row["n_view_click_purchase"] == 1  # u1 only
