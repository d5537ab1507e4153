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
