"""As-of join semantics on handcrafted rows (the sf0.01 oracle check
covers scale; this pins the corner cases: strictness at equal timestamps,
missing matches, per-key isolation)."""

from __future__ import annotations

import datetime as dt

from vector_database_product_recommendation_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(20)), (3, 1, _ts(5)), (4, 2, _ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(101, 1, _ts(10), 7.0), (102, 1, _ts(15), 8.0), (103, 3, _ts(1), 9.0)],
        "rid long, user_id long, ts timestamp, val double",
    )
    return left, right


def test_asof_strict_backward(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["asof_ts"], r["asof_val"])
        for r in asof_join(
            left, right, on="user_id", right_value_cols=["val"], strict=True
        ).collect()
    }
    assert out[1] == (None, None)          # right at ts=10 NOT visible (strict)
    assert out[2] == (_ts(15), 8.0)        # latest right before 20
    assert out[3] == (None, None)          # nothing before ts=5
    assert out[4] == (None, None)          # user 2 has no right rows


def test_asof_non_strict_includes_simultaneous(spark):
    left, right = _frames(spark)
    out = {
        r["event_id"]: (r["asof_ts"], r["asof_val"])
        for r in asof_join(
            left, right, on="user_id", right_value_cols=["val"], strict=False
        ).collect()
    }
    assert out[1] == (_ts(10), 7.0)        # equal ts matches when non-strict
    assert out[2] == (_ts(15), 8.0)


def test_asof_carried_columns_atomic(spark):
    left, right = _frames(spark)
    rows = asof_join(
        left, right, on="user_id", right_value_cols=["val", "rid"], strict=True
    ).collect()
    for r in rows:
        if r["asof_ts"] is not None:       # val and rid from the SAME row
            assert (r["asof_val"], r["asof_rid"]) in {(7.0, 101), (8.0, 102)}
