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


def test_funnel_requires_stage_order(spark):
    """A purchase BEFORE the user's first click must not convert
    stage 3; click before first view must not convert stage 2."""
    import os
    import tempfile
    from datetime import datetime, timedelta

    from etl_data_pipeline_spark.operators import analytics

    t0 = datetime(2024, 1, 1)
    s = lambda sec: t0 + timedelta(seconds=sec)
    rows = [
        # user 1: proper view -> click -> purchase (converts all stages)
        (1, s(0), 1, "view"), (2, s(10), 1, "click"), (3, s(20), 1, "purchase"),
        # user 2: purchase precedes click (stage 3 must NOT count)
        (4, s(0), 2, "view"), (5, s(30), 2, "click"), (6, s(15), 2, "purchase"),
        # user 3: click precedes any view (stage 2 must NOT count)
        (7, s(5), 3, "click"), (8, s(50), 3, "view"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        from pyspark.sql import functions as F

        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        ).withColumn("value", F.lit(1.0)).withColumn(
            "props", F.lit("{}")
        ).write.parquet(os.path.join(tmp, "events.parquet"))
        got = {r.stage: r.n_users for r in analytics.events_funnel(spark, tmp).collect()}
    assert got == {1: 3, 2: 2, 3: 1}
