"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``etl_data_pipeline_spark`` package; this
module only aggregates the per-operator registries
(etl_data_pipeline_spark/operators/__init__.py:collect_registry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_data_pipeline_spark.operators import collect_registry

_QUERIES, _ORACLE = collect_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    SURVEY.md §7.1 minimum slice: incremental watermark scan over
    orders -> broadcast join customer -> groupBy c_mktsegment agg.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _QUERIES["pipeline_incremental"](spark, "/root/testdata/sf0.001")


def _pinned_tz(fn: Callable[[SparkSession, str], DataFrame]):
    """Pin the session timezone to UTC around every query: the oracle
    side (DuckDB) formats naive timestamps as stored, so Spark's
    session-TZ-dependent expressions (date_format/to_date/date_trunc)
    only agree when the session is UTC. The harness container is UTC
    today; this removes the dependence on that accident."""
    import functools

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _pinned_tz(fn) for name, fn in _QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get
    the driver's weaker rows-only check)."""
    return dict(_ORACLE)
