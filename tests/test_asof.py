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
