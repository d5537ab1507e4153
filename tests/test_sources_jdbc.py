"""JDBC source contract tests — option assembly and pushdown wiring,
no live database (the sandbox has none; the only untested surface left
is the network itself). Mirrors the reference's connector factory
semantics (util.py:276-304 dispatch, util.py:132-187 read)."""

import pytest

from etl_data_pipeline_spark.sources import (
    SOURCES,
    jdbc_reader_options,
    read_source,
)

URL = "jdbc:postgresql://db:5432/warehouse"


def test_dbtable_defaults_to_table_name():
    opts = jdbc_reader_options("orders", {"url": URL})
    assert opts == {"url": URL, "dbtable": "orders"}


def test_dbtable_accepts_pushdown_subquery():
    sub = "(SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 0) t"
    opts = jdbc_reader_options("orders", {"url": URL, "dbtable": sub})
    assert opts["dbtable"] == sub


def test_partitioned_read_assembles_all_four_options():
    opts = jdbc_reader_options(
        "orders",
        {
            "url": URL,
            "partitionColumn": "o_orderkey",
            "lowerBound": 0,
            "upperBound": 1_500_000,
            "numPartitions": 32,
            "fetchsize": 10_000,
        },
    )
    # numbers are stringified for the JVM option map
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "1500000"
    assert opts["numPartitions"] == "32"
    assert opts["fetchsize"] == "10000"


def test_partial_partition_options_fail_fast():
    with pytest.raises(ValueError, match="missing.*lowerBound"):
        jdbc_reader_options(
            "orders",
            {"url": URL, "partitionColumn": "o_orderkey", "numPartitions": 8},
        )


def test_missing_url_raises_keyerror():
    with pytest.raises(KeyError):
        jdbc_reader_options("orders", {})


def test_credentials_and_driver_forwarded():
    opts = jdbc_reader_options(
        "orders",
        {"url": URL, "user": "etl", "password": "x", "driver": "org.postgresql.Driver"},
    )
    assert opts["user"] == "etl" and opts["driver"] == "org.postgresql.Driver"


def test_unknown_reader_keys_are_not_forwarded():
    opts = jdbc_reader_options("orders", {"url": URL, "bogus_option": "1"})
    assert "bogus_option" not in opts


def test_unknown_format_dispatch_raises():
    # dispatch validates the format before touching the session
    with pytest.raises(ValueError, match="Unsupported source format"):
        read_source(None, "mongodb", "orders", {})
    assert "jdbc" in SOURCES


class TestIncrementalDbtableSubquery:
    """The watermark-pushdown dbtable contract: exact assembled SQL for
    both watermark types, degrade-to-full-load parity with the scan
    side, and — since no live DBMS exists in this sandbox — execution
    of the assembled subquery against DuckDB over the real test
    parquet, proving the SQL a database would receive actually runs."""

    def test_id_watermark_renders_strict_gt_integer(self):
        from etl_data_pipeline_spark.sources import jdbc_incremental_dbtable

        sub = jdbc_incremental_dbtable("orders", "o_orderkey", "id", "1200")
        assert sub == '(SELECT * FROM orders WHERE "o_orderkey" > 1200) wm_pushdown'

    def test_timestamp_watermark_renders_ansi_literal(self):
        from etl_data_pipeline_spark.sources import jdbc_incremental_dbtable

        sub = jdbc_incremental_dbtable(
            "events", "ts", "timestamp", "2026-01-15 12:30:00"
        )
        assert sub == (
            "(SELECT * FROM events WHERE \"ts\" > "
            "TIMESTAMP '2026-01-15 12:30:00') wm_pushdown"
        )

    @pytest.mark.parametrize(
        "wm_type,raw",
        [
            ("id", None),
            ("id", "None"),
            ("id", "not_a_number"),
            ("timestamp", "garbage"),
            ("epoch_millis", "123"),  # unknown type
        ],
    )
    def test_degrades_to_full_load_bare_table(self, wm_type, raw):
        from etl_data_pipeline_spark.sources import jdbc_incremental_dbtable

        assert jdbc_incremental_dbtable("orders", "o_orderkey", wm_type, raw) == "orders"

    def test_assembled_subquery_flows_into_reader_options(self):
        from etl_data_pipeline_spark.sources import jdbc_incremental_dbtable

        sub = jdbc_incremental_dbtable("orders", "o_orderkey", "id", "7")
        opts = jdbc_reader_options("orders", {"url": URL, "dbtable": sub})
        assert opts["dbtable"] == sub

    def test_id_subquery_executes_on_duckdb(self):
        """Round-trip the id-watermark SQL through a real engine: the
        database-side result must equal strict-> row-for-row."""
        import duckdb

        from etl_data_pipeline_spark.sources import jdbc_incremental_dbtable

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/orders.parquet')"
        )
        sub = jdbc_incremental_dbtable("orders", "o_orderkey", "id", "1200")
        got = con.execute(f"SELECT count(*) FROM {sub}").fetchone()[0]
        want = con.execute(
            "SELECT count(*) FROM orders WHERE o_orderkey > 1200"
        ).fetchone()[0]
        boundary = con.execute(
            f"SELECT count(*) FROM {sub} WHERE o_orderkey = 1200"
        ).fetchone()[0]
        assert got == want and want > 0
        assert boundary == 0  # strict: the boundary row is never re-read

    def test_timestamp_subquery_executes_on_duckdb(self):
        import duckdb

        from etl_data_pipeline_spark.sources import jdbc_incremental_dbtable

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/events.parquet')"
        )
        wm = con.execute("SELECT cast(median(ts) AS VARCHAR) FROM events").fetchone()[0]
        sub = jdbc_incremental_dbtable("events", "ts", "timestamp", wm)
        got = con.execute(f"SELECT count(*) FROM {sub}").fetchone()[0]
        want = con.execute(
            "SELECT count(*) FROM events WHERE ts > ?", [wm]
        ).fetchone()[0]
        assert got == want and 0 < got

    def test_mysql_dialect_uses_backticks(self):
        """MySQL's default sql_mode reads "col" as a STRING LITERAL —
        an ANSI-quoted predicate would be constant-false (silent empty
        loads). The mysql dialect must emit backticks."""
        from etl_data_pipeline_spark.sources import jdbc_incremental_dbtable

        sub = jdbc_incremental_dbtable(
            "orders", "o_orderkey", "id", "1200", dialect="mysql"
        )
        assert sub == "(SELECT * FROM orders WHERE `o_orderkey` > 1200) wm_pushdown"
        assert '"' not in sub

    def test_unknown_dialect_raises_not_guesses(self):
        from etl_data_pipeline_spark.sources import jdbc_incremental_dbtable

        with pytest.raises(ValueError, match="unknown JDBC dialect"):
            jdbc_incremental_dbtable(
                "orders", "o_orderkey", "id", "7", dialect="mssql"
            )

    def test_offset_watermark_normalized_to_utc_naive(self):
        from etl_data_pipeline_spark.sources import jdbc_incremental_dbtable

        sub = jdbc_incremental_dbtable(
            "events", "ts", "timestamp", "2026-01-15T12:30:00+05:30"
        )
        assert sub == (
            "(SELECT * FROM events WHERE \"ts\" > "
            "TIMESTAMP '2026-01-15 07:00:00') wm_pushdown"
        )


class TestPipelineJdbcWiring:
    """incremental_source_options is the seam where the watermark
    pushdown reaches real JDBC reads — assert it fires exactly when it
    should."""

    def _spec(self, **over):
        from etl_data_pipeline_spark.spec import TableSpec

        base = dict(
            name="orders",
            source_format="jdbc",
            source_options={"url": URL},
            sink_format="parquet",
            sink_options={"dir": "/tmp/x"},
            watermark_column="o_orderkey",  # makes is_incremental true
            watermark_type="id",
        )
        base.update(over)
        return TableSpec(**base)

    def test_incremental_jdbc_embeds_subquery(self):
        from etl_data_pipeline_spark.pipeline import incremental_source_options

        opts = incremental_source_options(self._spec(), "1200")
        assert opts["dbtable"] == (
            '(SELECT * FROM orders WHERE "o_orderkey" > 1200) wm_pushdown'
        )

    def test_dialect_option_is_consumed_not_forwarded(self):
        from etl_data_pipeline_spark.pipeline import incremental_source_options

        spec = self._spec(source_options={"url": URL, "dialect": "mysql"})
        opts = incremental_source_options(spec, "7")
        assert opts["dbtable"] == (
            "(SELECT * FROM orders WHERE `o_orderkey` > 7) wm_pushdown"
        )
        assert "dialect" not in opts

    def test_caller_dbtable_wins(self):
        from etl_data_pipeline_spark.pipeline import incremental_source_options

        custom = "(SELECT * FROM orders WHERE x) q"
        spec = self._spec(source_options={"url": URL, "dbtable": custom})
        assert incremental_source_options(spec, "7")["dbtable"] == custom

    def test_degraded_watermark_reads_bare_table(self):
        from etl_data_pipeline_spark.pipeline import incremental_source_options

        opts = incremental_source_options(self._spec(), None)
        assert opts.get("dbtable", "orders") == "orders"

    def test_non_jdbc_sources_untouched(self):
        from etl_data_pipeline_spark.pipeline import incremental_source_options

        spec = self._spec(source_format="parquet", source_options={"dir": "/d"})
        assert incremental_source_options(spec, "1200") == {"dir": "/d"}
