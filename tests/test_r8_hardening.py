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


# ----------------------------------------------------- exhibit guards


def _tiny_docs(spark, tmp_path, n, lang="en", source="web"):
    rows = [
        (i, lang, source, f"tok{i} alpha beta gamma delta tok{i}", 30)
        for i in range(n)
    ]
    spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string, n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_ngram_jaccard_block_cap_guard_fires(spark, tmp_path, monkeypatch):
    """One (lang, source) block over the cap must refuse to run the
    quadratic exhibit with an actionable message."""
    from etl_data_pipeline_spark.llm import dedup

    monkeypatch.setattr(dedup, "EXHIBIT_BLOCK_CAP", 5)
    _tiny_docs(spark, tmp_path, 8)
    df = dedup.dedup_ngram_jaccard(spark, str(tmp_path))
    with pytest.raises(Exception, match="refusing to run the blocked-quadratic"):
        df.collect()


def test_ngram_jaccard_exhibit_override_bypasses_guard(spark, tmp_path, monkeypatch):
    from etl_data_pipeline_spark.llm import dedup

    monkeypatch.setattr(dedup, "EXHIBIT_BLOCK_CAP", 5)
    _tiny_docs(spark, tmp_path, 8)
    out = dedup.dedup_ngram_jaccard(spark, str(tmp_path), exhibit=True).collect()
    # every doc shares the 4 middle tokens; with distinct tok{i} ends,
    # word jaccard = 4/6 >= 0.5 for every pair: C(8,2) rows
    assert len(out) == 28


def test_ngram_jaccard_under_cap_unaffected(spark, tmp_path, monkeypatch):
    from etl_data_pipeline_spark.llm import dedup

    monkeypatch.setattr(dedup, "EXHIBIT_BLOCK_CAP", 100)
    _tiny_docs(spark, tmp_path, 8)
    assert len(dedup.dedup_ngram_jaccard(spark, str(tmp_path)).collect()) == 28


def test_levenshtein_block_cap_guard_fires(spark, tmp_path, monkeypatch):
    from etl_data_pipeline_spark.llm import dedup

    monkeypatch.setattr(dedup, "EXHIBIT_BLOCK_CAP", 4)
    rows = [(i, f"Customer#{i:09d}") for i in range(1, 10)]
    spark.createDataFrame(rows, "c_custkey long, c_name string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    df = dedup.dedup_levenshtein(spark, str(tmp_path))
    with pytest.raises(Exception, match="refusing to run the blocked-quadratic"):
        df.collect()
    # override returns the best-match graph instead
    out = dedup.dedup_levenshtein(spark, str(tmp_path), exhibit=True).collect()
    assert len(out) > 0


# ------------------------------------------- substring scrub boundedness


def test_substring_scrub_min_dup_docs_knob(spark):
    """Raising the span-frequency floor keeps low-multiplicity dup
    spans: a span in exactly 2 docs is scrubbed at the default but
    survives min_dup_docs=3; a 3-doc span is scrubbed by both."""
    from etl_data_pipeline_spark.llm.text_analysis import substring_scrub

    hot = "h1 h2 h3 h4 h5 h6 h7 h8"      # appears in docs 1,2,3
    warm = "w1 w2 w3 w4 w5 w6 w7 w8"     # appears in docs 4,5 only
    df = spark.createDataFrame(
        [
            (1, f"{hot} a1 a2 a3"),
            (2, f"{hot} b1 b2 b3"),
            (3, f"{hot} c1 c2 c3"),
            (4, f"{warm} d1 d2 d3"),
            (5, f"{warm} e1 e2 e3"),
        ],
        "doc_id long, text string",
    )
    default = {r.doc_id: r.n_removed for r in substring_scrub(df).collect()}
    bounded = {
        r.doc_id: r.n_removed
        for r in substring_scrub(df, min_dup_docs=3).collect()
    }
    # default: docs 2,3 lose the hot span; doc 5 loses the warm span
    assert default[2] > 0 and default[3] > 0 and default[5] > 0
    assert default[1] == 0 and default[4] == 0  # keepers untouched
    # bounded: the 2-doc warm span is below the floor -> doc 5 keeps it
    assert bounded[5] == 0
    assert bounded[2] == default[2] and bounded[3] == default[3]


def test_substring_scrub_rejects_degenerate_floor(spark):
    from etl_data_pipeline_spark.llm.text_analysis import substring_scrub

    df = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_dup_docs"):
        substring_scrub(df, min_dup_docs=1)
