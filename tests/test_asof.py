"""As-of join semantics (the reference's closest-previous-speaker window,
baseline/tools/ioutils.py:139-151, generalized)."""

from __future__ import annotations

import datetime as dt

from character_identification_spark.operators.asof import asof_join, last_prior_event


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_strict(spark):
    left = spark.createDataFrame(
        [("u", _ts(1), "l1"), ("u", _ts(5), "l2"), ("u", _ts(10), "l3"), ("w", _ts(3), "l4")],
        "k string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [("u", _ts(0), 10.0), ("u", _ts(5), 50.0), ("u", _ts(7), 70.0)],
        "k string, ts timestamp, value double",
    )
    out = {r["tag"]: r["asof_value"] for r in asof_join(left, right, on="k").collect()}
    assert out["l1"] == 10.0
    assert out["l2"] == 10.0  # strict: equal-ts right row not visible
    assert out["l3"] == 70.0
    assert out["l4"] is None  # no right rows for key w


def test_asof_join_inclusive(spark):
    left = spark.createDataFrame(
        [("u", _ts(5), "l2")], "k string, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [("u", _ts(5), 50.0)], "k string, ts timestamp, value double"
    )
    out = asof_join(left, right, on="k", strict=False).collect()
    assert out[0]["asof_value"] == 50.0


def test_last_prior_event(spark):
    events = spark.createDataFrame(
        [
            (1, _ts(0), 7, "click", 1.0),
            (2, _ts(1), 7, "view", 0.0),
            (3, _ts(2), 7, "click", 3.0),
            (4, _ts(3), 7, "purchase", 9.9),
            (5, _ts(0), 8, "purchase", 5.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r["event_id"]: r["prev_click_value"] for r in last_prior_event(events).collect()}
    assert out[1] is None
    assert out[2] == 1.0
    assert out[3] == 1.0  # own row not visible (strictly prior)
    assert out[4] == 3.0
    assert out[5] is None  # other user
