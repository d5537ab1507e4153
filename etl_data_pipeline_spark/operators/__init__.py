"""Operator/query library (SURVEY.md §2.B surface).

Each submodule exposes two parallel dicts:

- ``QUERIES``: name -> fn(spark, sf_dir) -> DataFrame   (the Spark impl)
- ``ORACLE``:  name -> ANSI SQL string for DuckDB        (the oracle)

Names registered here are exactly the names the driver sees through
``__spark_entry__.queries()`` / ``oracle_sql()``. A query with no
ORACLE entry gets the driver's weaker rows-only check (documented per
query).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Aggregate QUERIES/ORACLE from every operator module."""
    from etl_data_pipeline_spark.operators import (
        aggregates,
        analytics,
        asof,
        joins,
        reshape,
        scalars,
        scans,
        setops,
        udfs,
        windows,
    )
    from etl_data_pipeline_spark.streaming import batch_analogs
    from etl_data_pipeline_spark.llm import (
        curation,
        dedup,
        multimodal,
        similarity,
        text_analysis,
    )

    modules = [
        scans, joins, asof, aggregates, analytics, reshape, windows, setops,
        scalars, udfs,
        batch_analogs, text_analysis, dedup, similarity, multimodal, curation,
    ]
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for m in modules:
        dup = set(queries) & set(m.QUERIES)
        if dup:
            raise ValueError(f"duplicate query names: {dup} in {m.__name__}")
        queries.update(m.QUERIES)
        oracle.update(getattr(m, "ORACLE", {}))
    unknown = set(oracle) - set(queries)
    if unknown:
        raise ValueError(f"oracle entries without queries: {unknown}")
    return queries, oracle
