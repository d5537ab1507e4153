"""Watermark semantics — the reference's §2.C correctness traps."""

from datetime import datetime

import pytest

from etl_data_pipeline_spark.session import spread
from etl_data_pipeline_spark.watermark import (
    WatermarkStore,
    apply_watermark,
    max_watermark,
    parse_watermark,
)


def test_spread_fans_out_partitions(spark):
    df = spark.range(1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000
    assert spread(df, 7).rdd.getNumPartitions() == 7


class TestParseWatermark:
    """Degrade paths must match app.py:96-132 exactly."""

    def test_id_parses_int(self):
        assert parse_watermark("42", "id") == 42

    def test_missing_state_is_full_load(self):
        assert parse_watermark(None, "id") is None
        assert parse_watermark("", "id") is None
        assert parse_watermark("None", "id") is None  # Airflow stores 'None' string

    def test_unparseable_id_degrades_to_full_load(self):
        assert parse_watermark("not-a-number", "id") is None  # app.py:118-122

    def test_timestamp_parses(self):
        assert parse_watermark("2024-01-02 03:04:05", "timestamp") == datetime(
            2024, 1, 2, 3, 4, 5
        )

    def test_unparseable_timestamp_degrades(self):
        assert parse_watermark("garbage", "timestamp") is None

    def test_unknown_type_degrades_to_full_load(self):
        assert parse_watermark("42", "sequence") is None  # app.py:113-117


class TestStrictGreater:
    """Boundary rows equal to the watermark are never re-read
    (util.py:156,159)."""

    def test_boundary_excluded(self, spark):
        df = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        got = sorted(r.id for r in apply_watermark(df, "id", 2).collect())
        assert got == [3]

    def test_none_value_means_full_scan(self, spark):
        df = spark.createDataFrame([(1,), (2,)], "id long")
        assert apply_watermark(df, "id", None).count() == 2

    def test_max_watermark_skips_nulls(self, spark):
        df = spark.createDataFrame([(1,), (None,), (5,)], "id long")
        assert max_watermark(df, "id") == 5

    def test_max_watermark_all_null(self, spark):
        df = spark.createDataFrame([(None,), (None,)], "id long")
        assert max_watermark(df, "id") is None


class TestStore:
    def test_roundtrip_and_keying(self, tmp_path):
        store = WatermarkStore(tmp_path / "state.json")
        assert store.get("orders") is None
        store.set("orders", 123)
        assert store.get("orders") == "123"  # stored as string, like Airflow Variables
        store.set("lineitem", "2024-01-01 00:00:00")
        assert store.get("orders") == "123"
        store.clear("orders")
        assert store.get("orders") is None

    def test_corrupt_state_file_degrades(self, tmp_path):
        p = tmp_path / "state.json"
        p.write_text("{not json")
        store = WatermarkStore(p)
        assert store.get("orders") is None  # degrade, never crash
        store.set("orders", 7)
        assert store.get("orders") == "7"

    def test_concurrent_distinct_key_sets_all_survive(self, tmp_path):
        """The fan-out runner advances DIFFERENT tables' watermarks
        from a thread pool against ONE store file. Each set() is a
        whole-file read-modify-write, so without the flock two racing
        writers would each persist a snapshot missing the other's key.
        Hammer the store from a pool and require every key to land."""
        from concurrent.futures import ThreadPoolExecutor

        store = WatermarkStore(tmp_path / "state.json")
        tables = [f"t{i}" for i in range(16)]

        def advance(table):
            for v in range(5):
                store.set(table, v)

        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(advance, tables))
        for table in tables:
            assert store.get(table) == "4", table

    def test_concurrent_set_and_clear_isolated_per_key(self, tmp_path):
        """clear(a) racing set(b) must never resurrect a or drop b."""
        from concurrent.futures import ThreadPoolExecutor

        store = WatermarkStore(tmp_path / "state.json")
        store.set("a", 1)

        def clears():
            for _ in range(50):
                store.clear("a")

        def sets():
            for v in range(50):
                store.set("b", v)

        with ThreadPoolExecutor(max_workers=2) as pool:
            f1, f2 = pool.submit(clears), pool.submit(sets)
            f1.result(), f2.result()
        assert store.get("a") is None
        assert store.get("b") == "49"
