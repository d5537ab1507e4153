"""Unit tests for the generic as-of join (operators/asof.py):
inclusive boundary, no-match nulls, per-key isolation."""

from datetime import datetime

from pyspark.sql import functions as F

from etl_data_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_basic_and_boundary(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),  # after r1, before r2
            (2, 10, _ts("2024-01-01 11:00:00")),  # exactly at r2 (inclusive)
            (3, 10, _ts("2024-01-01 08:00:00")),  # before everything -> null
            (4, 20, _ts("2024-01-01 12:00:00")),  # other key, own rights only
        ],
        "lid long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 09:00:00")),
            (101, 10, _ts("2024-01-01 11:00:00")),
            (200, 20, _ts("2024-01-01 09:30:00")),
        ],
        "rid long, user_id long, ts timestamp",
    )
    out = asof_join(left, right, on="ts", by="user_id", value_cols=["rid"])
    got = {r.lid: r.rid for r in out.collect()}
    assert got == {1: 100, 2: 101, 3: None, 4: 200}


def test_asof_all_left_rows_survive(spark):
    left = spark.range(5).select(
        F.col("id").alias("lid"),
        (F.col("id") % 2).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60 + 1700000000).alias("ts"),
    )
    right = spark.createDataFrame([], "rid long, user_id long, ts timestamp")
    out = asof_join(left, right, on="ts", by="user_id", value_cols=["rid"])
    assert out.count() == 5
    assert all(r.rid is None for r in out.collect())


def test_asof_nearest_picks_minimum_distance(spark, sf_dir):
    """Nearest-direction semantics: the chosen view is never farther
    than either directional candidate, direction labels agree with the
    chosen side, and ties (equal back/forward distance) go backward."""
    from etl_data_pipeline_spark.operators.asof import (
        join_asof,
        join_asof_nearest,
    )

    near = {r.purchase_id: r for r in join_asof_nearest(spark, sf_dir).collect()}
    back = {r.purchase_id: r for r in join_asof(spark, sf_dir).collect()}
    assert set(near) == set(back)
    saw_fwd = saw_back = False
    for pid, n in near.items():
        b = back[pid]
        if n.direction == "back":
            saw_back = True
            assert (n.view_id, n.view_ts) == (b.view_id, b.view_ts)
            assert n.view_ts <= n.purchase_ts
        elif n.direction == "fwd":
            saw_fwd = True
            assert n.view_ts >= n.purchase_ts
            # forward won => strictly closer than the backward candidate
            if b.view_ts is not None:
                fwd_d = (n.view_ts - n.purchase_ts).total_seconds()
                back_d = (b.purchase_ts - b.view_ts).total_seconds()
                assert fwd_d < back_d
        else:
            assert n.view_id is None and b.view_id is None
    assert saw_fwd and saw_back
