"""Round-8 hardening tests (round-7 VERDICT items + ADVICE fixes).

Covers the engine-divergence edge cases ADVICE flagged as latent —
unreachable in the shipped fixtures but real if the data model ever
changes — by constructing the exact fixtures that would have exposed
them and asserting both engines now agree (or fail loudly):

- events_attribution: duplicate (user_id, ts-at-micros) pairs now trip
  an ``assert_true`` guard instead of silently making the RANGE-frame
  first/last picks nondeterministic (ADVICE item 2).
- profile_drift_psi: NULL o_orderdate rows and a constant-price column
  (zero bin width) are handled identically by the Spark plan and the
  DuckDB oracle (ADVICE item 3).
"""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import Row, functions as F

from etl_data_pipeline_spark.operators import analytics


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_events_attribution_duplicate_ts_guard_fires(spark, tmp_path):
    """Two touches for one user at the SAME microsecond must fail the
    query with the precondition message — not silently pick one."""
    _write_events(
        spark,
        tmp_path,
        [
            (1, _ts("2024-01-01 10:00:00"), 7, "view", 0.0, None),
            (2, _ts("2024-01-01 10:00:00"), 7, "click", 0.0, None),  # dup us
            (3, _ts("2024-01-01 11:00:00"), 7, "purchase", 5.0, None),
        ],
    )
    df = analytics.events_attribution(spark, str(tmp_path))
    with pytest.raises(Exception, match="precondition violated"):
        df.collect()


def test_events_attribution_unique_ts_guard_passes(spark, tmp_path):
    """Same shape without the tie: runs green and attributes the
    purchase to the latest touch."""
    _write_events(
        spark,
        tmp_path,
        [
            (1, _ts("2024-01-01 10:00:00"), 7, "view", 0.0, None),
            (2, _ts("2024-01-01 10:30:00"), 7, "click", 0.0, None),
            (3, _ts("2024-01-01 11:00:00"), 7, "purchase", 5.0, None),
        ],
    )
    rows = {
        r.channel: r
        for r in analytics.events_attribution(spark, str(tmp_path)).collect()
    }
    assert rows["click"].conv_last == 1
    assert rows["view"].conv_first == 1
    assert rows["click"].value_linear == pytest.approx(2.5)
    assert rows["view"].value_linear == pytest.approx(2.5)


def _psi_both_engines(spark, tmp_path, orders_rows):
    """Run profile_drift_psi on a synthetic orders table through BOTH
    engines and return (spark_rows, duckdb_rows) sorted for compare."""
    df = spark.createDataFrame(
        orders_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = sorted(
        (r.column_name, r.n_bins, r.psi, r.drifted)
        for r in analytics.profile_drift_psi(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(analytics.ORACLE["profile_drift_psi"]).fetchall()))
    con.close()
    return got, want


def test_profile_drift_psi_null_orderdate_agrees(spark, tmp_path):
    """A NULL o_orderdate row must be excluded from BOTH periods on
    both engines (previously: Spark neither, naive oracle 'current')."""
    ref_d = _ts("1998-06-01 00:00:00")
    cur_d = _ts("1999-06-01 00:00:00")
    rows = [
        (i, i, "F", 100.0 + 7 * i, ref_d if i % 2 else cur_d, f"P{i % 3}")
        for i in range(1, 41)
    ] + [(99, 99, "F", 5000.0, None, "P9")]  # NULL-date outlier row
    got, want = _psi_both_engines(spark, tmp_path, rows)
    assert got == want
    # the NULL-date outlier's price (5000, far outside the rest) must
    # not have widened the bin domain: n_bins stays at the fixed count
    assert all(r[1] <= analytics.PSI_PRICE_BINS for r in got)


def test_profile_drift_psi_constant_price_agrees(spark, tmp_path):
    """Constant o_totalprice => bin width 0; both engines collapse to
    one bin instead of NaN bins, and agree."""
    ref_d = _ts("1998-06-01 00:00:00")
    cur_d = _ts("1999-06-01 00:00:00")
    rows = [
        (i, i, "F", 42.0, ref_d if i % 3 else cur_d, f"P{i % 2}")
        for i in range(1, 31)
    ]
    got, want = _psi_both_engines(spark, tmp_path, rows)
    assert got == want
    price = [r for r in got if r[0] == "o_totalprice"]
    assert price and price[0][1] == 1  # single collapsed bin
    assert price[0][2] == pytest.approx(0.0, abs=1e-9) or price[0][2] is not None
