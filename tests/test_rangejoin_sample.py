"""Binned range join and stratified sampling unit tests."""

import os
import tempfile
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from etl_data_pipeline_spark.operators import joins, scans


def _write_events(spark, tmp, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    ).withColumn("event_type", F.lit("t")).withColumn(
        "value", F.lit(1.0)
    ).withColumn("props", F.lit("{}")).write.parquet(
        os.path.join(tmp, "events.parquet")
    )


def test_range_binned_window_semantics(spark):
    t0 = datetime(2024, 1, 1)
    s = lambda sec: t0 + timedelta(seconds=sec)
    rows = [
        (1, s(0), 1),      # pairs with 2 (100s) — not 3 (400s > 300s)
        (2, s(100), 1),    # pairs with 3 (300s, boundary INCLUDED)
        (3, s(400), 1),
        (4, s(299), 2),    # adjacent buckets: 299s is bucket 0,
        (5, s(301), 2),    #   301s is bucket 1 — must still pair (2s gap)
        (6, s(0), 3),      # other user — never pairs with user 1/2
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write_events(spark, tmp, rows)
        got = {
            (r.event_a, r.event_b, r.gap_ms)
            for r in joins.join_range_binned(spark, tmp).collect()
        }
    assert got == {(1, 2, 100_000), (2, 3, 300_000), (4, 5, 2_000)}


def test_stratified_sample_rates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sample = scans.sample_stratified(spark, sf_dir)
    by_lang = {r["lang"]: r["n"] for r in
               sample.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "zh" not in by_lang                      # unlisted stratum dropped
    assert by_lang.get("fr") == total["fr"]         # rate 1000‰ keeps all
    assert 0 < by_lang.get("en", 0) < total["en"]   # 5% is a strict subset
    # sample is a subset of the corpus (no invented rows)
    assert sample.join(docs, "doc_id", "left_anti").count() == 0


def test_grouping_sets_shape(spark, sf_dir):
    from etl_data_pipeline_spark.operators import aggregates

    rows = aggregates.agg_grouping_sets(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    total = li.count()
    grand = [r for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    per_flag = [r for r in rows if r.l_returnflag is not None]
    assert len(grand) == 1 and grand[0].n == total
    assert sum(r.n for r in per_flag) == total
